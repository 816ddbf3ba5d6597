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


_CLICK_HORIZON_US = 6 * 3600 * 1_000_000  # 6-hour attribution window


@register(
    "q_impression_click_join",
    oracle=f"""
    SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id,
      epoch_us(c.ts) - epoch_us(v.ts) AS lag_us
    FROM events v JOIN events c
      ON v.user_id = c.user_id
     AND epoch_us(c.ts) >= epoch_us(v.ts)
     AND epoch_us(c.ts) <= epoch_us(v.ts) + {_CLICK_HORIZON_US}
    WHERE v.event_type = 'view' AND c.event_type = 'click'
    """,
)
def q_impression_click_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed interval join — the oracle-checked BATCH TWIN of the
    streaming ``windows.join_streams`` shape (impression↔click
    attribution): every (view, click) pair of the same user where the
    click lands within 6 hours after the view.

    Scale decomposition (same discipline as q_range_join, but with a
    real equi key): joining on user_id alone is correct but lets one
    heavy user's entire history cross-product per view; quantizing
    time into horizon-width buckets and joining on the COMPOUND key
    (user_id, bucket) bounds each probe to two bucket-local candidate
    sets regardless of how long the user's history grows.  Views
    explode to the ≤2 buckets their window overlaps (bucket width =
    horizon, so never more); clicks land in exactly 1 bucket, so no
    pair can match twice and no distinct is needed.  The residual
    range predicate compares integer MICROSECONDS on both engines
    (unix_micros / epoch_us) — no timestamp interval arithmetic to
    diverge."""
    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.col("event_id").alias("view_id"),
            F.unix_micros("ts").alias("vu"),
        )
        .withColumn(
            "bucket",
            F.explode(
                F.array_distinct(
                    F.array(
                        F.floor(F.col("vu") / _CLICK_HORIZON_US),
                        F.floor(
                            (F.col("vu") + F.lit(_CLICK_HORIZON_US))
                            / _CLICK_HORIZON_US
                        ),
                    )
                )
            ),
        )
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.unix_micros("ts").alias("cu"),
        F.floor(F.unix_micros("ts") / _CLICK_HORIZON_US).alias("bucket"),
    )
    return (
        views.join(
            clicks,
            (F.col("user_id") == F.col("c_user_id"))
            & (views["bucket"] == clicks["bucket"]),
        )
        .filter(
            (F.col("cu") >= F.col("vu"))
            & (F.col("cu") <= F.col("vu") + F.lit(_CLICK_HORIZON_US))
        )
        .select(
            "user_id",
            "view_id",
            "click_id",
            (F.col("cu") - F.col("vu")).alias("lag_us"),
        )
    )


@register(
    "q_time_decay_attribution",
    oracle="""
    WITH purchases AS (
      SELECT user_id, event_id AS p_id, ts AS p_ts,
        CAST(CAST(value AS DECIMAL(12,2)) AS DOUBLE) AS p_value
      FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT user_id, event_type AS channel, ts, event_id FROM events
      WHERE event_type <> 'purchase'
    ),
    weighted AS (
      SELECT p.p_id, p.p_value, t.channel,
        round(power(0.5, (epoch_us(p.p_ts) - epoch_us(t.ts))
                         / 86400000000.0 / 7.0), 6) AS w
      FROM purchases p JOIN touches t
        ON t.user_id = p.user_id
       AND (t.ts < p.p_ts OR (t.ts = p.p_ts AND t.event_id < p.p_id))
    ),
    summed AS (
      SELECT channel, p_value, w,
        SUM(CAST(w AS DECIMAL(18,6))) OVER (PARTITION BY p_id) AS sw
      FROM weighted
    ),
    normed AS (
      SELECT channel,
        round(p_value * w / CAST(sw AS DOUBLE), 6) AS credit
      FROM summed
      WHERE sw <> 0
    )
    SELECT channel,
      CAST(COUNT(*) AS BIGINT) AS n_credits,
      CAST(SUM(CAST(CAST(credit AS DECIMAL(18,6)) AS DECIMAL(28,6)))
           AS DOUBLE) AS revenue
    FROM normed
    GROUP BY channel
    """,
)
def q_time_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay multi-touch attribution (the third canonical model
    next to last-touch and linear): each preceding touch earns a share
    of the purchase value proportional to 0.5^(age_days / 7) — a
    7-day half-life — normalized per purchase.

    Determinism (house float policy): the decay weight is rounded to
    6dp immediately after the one transcendental (pow), so both
    engines normalize with identical summands; the per-purchase weight
    sum rides DECIMAL(18,6) (exact, associative); the final credit is
    rounded to 6dp once and channel revenue is summed as
    DECIMAL(28,6) — partition order cannot move any output bit.

    Scale: identical join geometry to q_linear_attribution (purchases
    ⋈ preceding touches, co-partitioned on user_id — per-user cost
    bounded by that user's path length, never corpus size); the
    normalizer is a window over p_id (unique key — purchases-many
    1-group partitions, embarrassingly parallel), then one hash agg
    on the channel domain."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").cast("decimal(12,2)").cast("double").alias("p_value"),
    )
    touches = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", F.col("event_type").alias("channel"), "ts", "event_id"
    )
    weighted = (
        purchases.join(touches, "user_id")
        .filter(
            (F.col("ts") < F.col("p_ts"))
            | ((F.col("ts") == F.col("p_ts")) & (F.col("event_id") < F.col("p_id")))
        )
        .select(
            "p_id",
            "p_value",
            "channel",
            F.round(
                F.pow(
                    F.lit(0.5),
                    (F.unix_micros("p_ts") - F.unix_micros("ts"))
                    / F.lit(86400000000.0)
                    / F.lit(7.0),
                ),
                6,
            ).alias("w"),
        )
    )
    summed = weighted.withColumn(
        "sw",
        F.sum(F.col("w").cast("decimal(18,6)")).over(Window.partitionBy("p_id")),
    )
    # a purchase whose every touch is old enough that all 6dp-rounded
    # weights underflow to 0 has sw = 0 exactly (DECIMAL sum) — without
    # this guard the credit is 0/0 NaN, which Spark silently drops at
    # the decimal cast and DuckDB ERRORS on (review-caught; the 30-day
    # test corpus can't reach it, multi-year histories can).  Such a
    # purchase is unattributable under decay, like a touchless purchase
    # under the linear model.
    normed = summed.filter(F.col("sw") != 0).select(
        "channel",
        F.round(
            F.col("p_value") * F.col("w") / F.col("sw").cast("double"), 6
        ).alias("credit"),
    )
    return normed.groupBy("channel").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_credits"),
        F.sum(F.col("credit").cast("decimal(18,6)").cast("decimal(28,6)"))
        .cast("double")
        .alias("revenue"),
    )
