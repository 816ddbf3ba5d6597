from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.readers import (
    TABLES,
    load_table,
    read_csv_normalized,
    read_documents_json,
)

__all__ = ["TABLES", "load_table", "read_csv_normalized", "read_documents_json"]
