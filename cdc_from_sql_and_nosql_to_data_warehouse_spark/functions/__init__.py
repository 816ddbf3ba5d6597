from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions import exact, normalize, text, vectors

__all__ = ["exact", "normalize", "text", "vectors"]
