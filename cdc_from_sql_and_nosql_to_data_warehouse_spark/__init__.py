"""PySpark-native analytics engine with the query and data-processing
capabilities of ``markoortiz0718/CDC-from-SQL-and-NoSQL-to-Data-Warehouse``.

The reference (read-only at /root/reference) is a CDC pipeline that
replicates a SQL source (RDS MySQL) and a NoSQL source (DynamoDB) into a
Redshift warehouse "for easy querying for business analytics"
(reference README.md:3).  This package rebuilds that capability
Spark-first:

- ``sources``    — batch + streaming readers, change-event envelope
- ``functions``  — normalization / dialect-parse / text / vector expression
                   library (pure ``pyspark.sql.functions`` compositions)
- ``operators``  — the query surface: Tier A (CDC semantics), Tier B
                   (warehouse analytics), Tier C (LLM-data-pipeline ops),
                   registered in ``operators.REGISTRY``
- ``streaming``  — Structured Streaming CDC core (append / merge modes,
                   snapshot∪CDC, watermark dedup, windows)
- ``plans``      — plan-introspection helpers (pushdown / broadcast /
                   codegen assertions used by tests and the bench)

Everything is the DataFrame / SQL API; Catalyst + Tungsten pick physical
strategies.  No RDDs, no custom planner rules.
"""

from cdc_from_sql_and_nosql_to_data_warehouse_spark.session import get_spark

__all__ = ["get_spark"]
