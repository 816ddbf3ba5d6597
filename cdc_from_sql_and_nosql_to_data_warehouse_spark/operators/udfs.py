"""Tier C UDF surface (SURVEY.md §2.3 C7): scalar pandas UDF,
grouped-agg pandas UDF, applyInPandas, mapInPandas.

UDFs are the engine's slow path by policy: everything that CAN be a
built-in expression IS one elsewhere in this package.  These operators
exist to prove the Arrow-batched Python escape hatch works and is
correct — each computes something the oracle can also express in SQL,
so the driver's value-hash check covers the whole Arrow round trip.

(pandas_udf objects are built lazily inside the query functions because
their DDL return types need an active SparkSession to parse.)
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import register
from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.readers import load_table


@register(
    "q_udf_scalar",
    oracle="""
    SELECT doc_id,
      CAST(length(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS BIGINT)
        AS n_tokens
    FROM documents
    """,
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7 scalar pandas UDF (Arrow batch transfer, ~10-100× faster than
    row-at-a-time Python UDFs per the public Spark docs)."""

    @pandas_udf("long")
    def n_tokens(text: pd.Series) -> pd.Series:
        return text.str.split().map(len).astype("int64")

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", n_tokens("text").alias("n_tokens"))


@register(
    "q_udf_grouped_agg",
    oracle="""
    SELECT lang, CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS mean_chars
    FROM documents GROUP BY lang
    """,
)
def q_udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7 grouped-aggregate pandas UDF (int sums are exact in float64
    below 2^53, so the mean is deterministic and oracle-matchable)."""

    @pandas_udf("double")
    def mean_chars(n_chars: pd.Series) -> float:  # Series→scalar = grouped agg
        return float(n_chars.sum()) / len(n_chars)

    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(mean_chars("n_chars").alias("mean_chars"))


def _lang_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "lang": [pdf["lang"].iloc[0]],
            "n_docs": [len(pdf)],
            "total_chars": [int(pdf["n_chars"].sum())],
        }
    )


@register(
    "q_udf_apply_in_pandas",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang
    """,
)
def q_udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7 applyInPandas (grouped-map): whole-group pandas transform —
    the escape hatch for per-group logic Spark expressions can't say.
    Groups shuffle once on the key, then run in parallel."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("lang", "n_chars").groupBy("lang").applyInPandas(
        _lang_stats, schema="lang string, n_docs long, total_chars long"
    )


def _net_price_batches(it):
    for pdf in it:
        yield pd.DataFrame(
            {
                "l_orderkey": pdf["l_orderkey"],
                "l_linenumber": pdf["l_linenumber"],
                # identical IEEE ops to the SQL expression → identical bits
                "net_price": pdf["l_extendedprice"] * (1.0 - pdf["l_discount"]),
            }
        )


@register(
    "q_udf_map_in_pandas",
    oracle="""
    SELECT l_orderkey, l_linenumber,
      l_extendedprice * (1.0 - l_discount) AS net_price
    FROM lineitem
    """,
)
def q_udf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7 mapInPandas: partition-wise Arrow batch iterator — the
    multimodal decode plumbing uses the same shape (operators.multimodal)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )
    return li.mapInPandas(
        _net_price_batches, schema="l_orderkey long, l_linenumber int, net_price double"
    )
