"""Marketing-attribution operators over the event stream: last-touch
and linear multi-touch revenue attribution.

The read-side complement to the funnel/retention/transition analytics
that already live in timeseries.py: events land in the warehouse via
the reference's DynamoDB stream → S3 → COPY path
(/root/reference/source/write_dynamodb_stream_to_s3_lambda/handler.py);
the reference ships no analytics of its own, so the shapes come from
the standard product-analytics repertoire.

Engine-determinism policy (house rules): revenue sums ride DECIMAL
(functions/exact.py); every window orders by (ts, event_id) — event_id
is a unique tiebreaker, so IGNORE-NULLS last_value and preceding-touch
counts are well-defined and identical across engines; the credit split
in the linear model is computed as value/n_touches ONCE per purchase
and rounded to 6dp before the per-channel sum so both engines add
identical summands in sorted-fold order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.exact import dsum
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import register
from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.readers import load_table


@register(
    "q_last_touch_attribution",
    oracle="""
    WITH tagged AS (
      SELECT event_type, value, ts, user_id,
        last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                   IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
      FROM events
    )
    SELECT COALESCE(channel, 'direct') AS channel,
      CAST(COUNT(*) AS BIGINT) AS n_purchases,
      CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM tagged WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def q_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch revenue attribution: each purchase's value is
    credited to the channel (event type) of the user's most recent
    PRECEDING non-purchase event; purchases with no prior touch are
    'direct'.  The marketing-attribution baseline every warehouse
    grows sooner or later.

    Scale: ONE window partitioned by user_id (high cardinality — never
    a global sort) + one hash agg on the 5-value channel domain.  No
    self-join of events against events — the naive formulation is a
    per-purchase as-of join back onto the event table."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc_nulls_last("ts"), "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tagged = ev.withColumn(
        "channel",
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        ).over(w),
    )
    return (
        tagged.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("channel", F.lit("direct")).alias("channel"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            dsum("value").alias("revenue"),
        )
    )


@register(
    "q_linear_attribution",
    oracle="""
    WITH numbered AS (
      SELECT user_id, event_type, value, ts, event_id,
        COUNT(CASE WHEN event_type <> 'purchase' THEN 1 END) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS n_touches
      FROM events
    ),
    purchases AS (
      SELECT user_id, event_id AS p_id, ts AS p_ts, n_touches,
        round(CAST(CAST(value AS DECIMAL(12,2)) AS DOUBLE) / n_touches, 6)
          AS credit
      FROM numbered
      WHERE event_type = 'purchase' AND n_touches > 0
    ),
    touches AS (
      SELECT user_id, event_type AS channel, ts, event_id FROM events
      WHERE event_type <> 'purchase'
    )
    SELECT t.channel,
      CAST(COUNT(*) AS BIGINT) AS n_credits,
      CAST(SUM(CAST(CAST(p.credit AS DECIMAL(18,6)) AS DECIMAL(28,6)))
           AS DOUBLE) AS revenue
    FROM purchases p JOIN touches t
      ON t.user_id = p.user_id
     AND (t.ts < p.p_ts OR (t.ts = p.p_ts AND t.event_id < p.p_id))
    GROUP BY t.channel
    """,
)
def q_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (equal-split) multi-touch attribution: each purchase's
    value is divided equally across ALL of the user's preceding
    non-purchase touches — the other canonical attribution model,
    rewarding every step of the path instead of only the last.

    Determinism: the per-purchase credit (value / n_touches) is
    rounded to 6dp ONCE, then summed per channel as DECIMAL(28,6) —
    exact and associative, so partition order can't move the output
    (the functions/exact.py policy applied to a computed quota).

    Scale: the preceding-touch COUNT is the same user-partitioned
    window as last-touch (no self-join needed for the denominator);
    the credit fan-out joins purchases to touches per user — a
    co-partitioned range-ish join whose output is the true credit
    list (each touch earns a row; that IS the model's output size),
    then one hash agg on the channel domain.  Per-user cost is
    purchases × touches for that user — bounded by session behavior,
    not corpus size, and co-located by the user_id shuffle."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc_nulls_last("ts"), "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    numbered = ev.withColumn(
        "n_touches",
        F.count(F.when(F.col("event_type") != "purchase", 1)).over(w),
    )
    purchases = (
        numbered.filter(
            (F.col("event_type") == "purchase") & (F.col("n_touches") > 0)
        )
        .select(
            "user_id",
            F.col("event_id").alias("p_id"),
            F.col("ts").alias("p_ts"),
            F.round(
                F.col("value").cast("decimal(12,2)").cast("double")
                / F.col("n_touches"),
                6,
            ).alias("credit"),
        )
    )
    touches = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", F.col("event_type").alias("channel"), "ts", "event_id"
    )
    credited = purchases.join(touches, "user_id").filter(
        (F.col("ts") < F.col("p_ts"))
        | ((F.col("ts") == F.col("p_ts")) & (F.col("event_id") < F.col("p_id")))
    )
    return credited.groupBy("channel").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_credits"),
        F.sum(F.col("credit").cast("decimal(18,6)").cast("decimal(28,6)"))
        .cast("double")
        .alias("revenue"),
    )
