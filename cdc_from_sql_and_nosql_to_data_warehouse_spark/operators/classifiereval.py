"""Classifier evaluation: confusion matrix, calibration bins, decile
lift/gains (split from evalprep.py, round 7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions import vectors as V
from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.exact import dec
from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.parallelism import spread
from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.ids import (
    assign_dense_ids,
)
from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.portable_hash import (
    SQL_TOKS_EXPR,
    md5_unit,
    sql_md5_unit,
)
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import register
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.evalcommon import (
    _SQL_DOT,
    _sql_cos,
)
from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.readers import load_table

_CM_EVAL = 50  # confusion-matrix eval set: vec_id < 50
_CM_K = 5


@register(
    "q_eval_confusion",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qe, label AS true_label
      FROM embeddings WHERE vec_id < {_CM_EVAL}
    ),
    c AS (
      SELECT vec_id AS cand_id, embedding AS ce, label AS cand_label
      FROM embeddings WHERE vec_id >= {_CM_EVAL}
    ),
    scored AS (
      SELECT query_id, true_label, cand_id, cand_label,
        {_sql_cos("qe", "ce")} AS cosine
      FROM q CROSS JOIN c
    ),
    top AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rn
        FROM scored
      ) WHERE rn <= {_CM_K}
    ),
    votes AS (
      SELECT query_id, true_label, cand_label, COUNT(*) AS votes
      FROM top GROUP BY query_id, true_label, cand_label
    ),
    preds AS (
      SELECT query_id, true_label, cand_label AS pred_label FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY votes DESC, cand_label) AS rn2
        FROM votes
      ) WHERE rn2 = 1
    ),
    by_true AS (
      SELECT true_label AS label, CAST(COUNT(*) AS BIGINT) AS n_true,
        CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END) AS BIGINT)
          AS tp
      FROM preds GROUP BY true_label
    ),
    by_pred AS (
      SELECT pred_label AS label, CAST(COUNT(*) AS BIGINT) AS n_pred
      FROM preds GROUP BY pred_label
    )
    SELECT label,
      COALESCE(n_true, CAST(0 AS BIGINT)) AS n_true,
      COALESCE(n_pred, CAST(0 AS BIGINT)) AS n_pred,
      COALESCE(tp, CAST(0 AS BIGINT)) AS tp,
      CASE WHEN COALESCE(n_pred, 0) > 0
        THEN CAST(COALESCE(tp, 0) AS DOUBLE) / n_pred ELSE 0.0 END AS precision,
      CASE WHEN COALESCE(n_true, 0) > 0
        THEN CAST(COALESCE(tp, 0) AS DOUBLE) / n_true ELSE 0.0 END AS recall
    FROM by_true FULL JOIN by_pred USING (label)
    """,
)
def q_eval_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall of the k-NN auto-labeler
    (q_knn_classify's vote, widened to a 50-query eval set) — the
    confusion-matrix summary a weak-supervision pipeline publishes with
    every label release.  Classes that are predicted but never true
    (or vice versa) still appear, via the FULL join of the
    by-true/by-pred marginals with zero-fill.

    Scale: the eval set is bounded and broadcast (the q_knn_classify
    plan); the metrics stage runs entirely on the |eval|-row
    prediction frame.  All metrics are ratios of exact integers."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _CM_EVAL).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
        F.col("embedding").alias("qe"),
        V.norm2("embedding").alias("qn"),
    )
    # r13: the candidate side roots at a single-row-group scan, so the
    # |cand|×|eval| interpreted cosine folds ran on one core; spread
    # the narrow projection before the broadcast join (guide §2.5 —
    # the q_dedup_embedding fix; interleaved A/B min-of-5:
    # 1.50 → 0.85 s).
    c = spread(
        emb.filter(F.col("vec_id") >= _CM_EVAL).select(
            "vec_id", "label", "embedding"
        )
    ).select(
        F.col("vec_id").alias("cand_id"),
        F.col("label").alias("cand_label"),
        F.col("embedding").alias("ce"),
        V.norm2("embedding").alias("cn"),
    )
    scored = c.join(F.broadcast(q)).select(
        "query_id",
        "true_label",
        "cand_id",
        "cand_label",
        (V.dot("qe", "ce") / (F.col("qn") * F.col("cn"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    top = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _CM_K
    )
    votes = top.groupBy("query_id", "true_label", "cand_label").agg(
        F.count(F.lit(1)).alias("votes")
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("cand_label")
    )
    preds = (
        votes.withColumn("rn2", F.row_number().over(w2))
        .filter(F.col("rn2") == 1)
        .select("query_id", "true_label", F.col("cand_label").alias("pred_label"))
    )
    by_true = preds.groupBy(F.col("true_label").alias("label")).agg(
        F.count(F.lit(1)).alias("n_true"),
        F.sum(
            F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0)
        ).alias("tp"),
    )
    by_pred = preds.groupBy(F.col("pred_label").alias("label")).agg(
        F.count(F.lit(1)).alias("n_pred")
    )
    joined = by_true.join(by_pred, "label", "full")
    n_true = F.coalesce(F.col("n_true"), F.lit(0)).cast("bigint")
    n_pred = F.coalesce(F.col("n_pred"), F.lit(0)).cast("bigint")
    tp = F.coalesce(F.col("tp"), F.lit(0)).cast("bigint")
    return joined.select(
        "label",
        n_true.alias("n_true"),
        n_pred.alias("n_pred"),
        tp.alias("tp"),
        F.when(n_pred > 0, tp.cast("double") / n_pred).otherwise(0.0).alias(
            "precision"
        ),
        F.when(n_true > 0, tp.cast("double") / n_true).otherwise(0.0).alias("recall"),
    )


_CAL_BINS = 10


@register(
    "q_calibration_bins",
    oracle=f"""
    WITH a AS (
      SELECT embedding AS ae, label AS al FROM embeddings WHERE vec_id = 0
    ),
    s AS (
      SELECT CAST(round({_sql_cos("ae", "c.embedding")} * 1000000) AS BIGINT) AS s6,
        CASE WHEN c.label = al THEN 1 ELSE 0 END AS y
      FROM embeddings c CROSS JOIN a WHERE c.vec_id <> 0
    )
    SELECT least({_CAL_BINS - 1}, ((s6 + 1000000) * {_CAL_BINS}) // 2000000) AS bin,
      CAST(COUNT(*) AS BIGINT) AS n,
      CAST(SUM(y) AS BIGINT) AS n_pos,
      CAST(SUM(y) AS DOUBLE) / COUNT(*) AS frac_pos,
      CAST(SUM(s6) AS DOUBLE) / 1000000.0 / COUNT(*) AS mean_score
    FROM s GROUP BY 1
    """,
)
def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins for the cosine-to-anchor score: 10
    equal-width bins over [-1, 1] with observed positive rate and mean
    score per bin — the calibration audit that pairs with
    q_retrieval_auc (AUC ranks; calibration says whether the score
    MAGNITUDE is trustworthy as a probability proxy).

    Determinism: the score is fixed-pointed to an integer s6 =
    round(cos·10⁶) ONCE; bin assignment is pure integer arithmetic on
    s6, and the mean score is an exact integer sum divided once — no
    float ever accumulates across rows.

    Scale: one map pass + one hash aggregate over a 10-value key."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("ae"),
        F.col("label").alias("al"),
        V.norm2("embedding").alias("an"),
    )
    s = emb.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(a)).select(
        F.round(
            (V.dot("ae", "embedding") / (F.col("an") * V.norm2("embedding")))
            * 1000000
        )
        .cast("bigint")
        .alias("s6"),
        F.when(F.col("label") == F.col("al"), 1).otherwise(0).alias("y"),
    )
    return (
        s.withColumn(
            "bin",
            F.least(
                F.lit(_CAL_BINS - 1),
                F.expr(f"((s6 + 1000000) * {_CAL_BINS}) DIV 2000000"),
            ),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").cast("bigint").alias("n_pos"),
            (F.sum("y").cast("double") / F.count(F.lit(1))).alias("frac_pos"),
            (
                F.sum("s6").cast("double") / F.lit(1000000.0) / F.count(F.lit(1))
            ).alias("mean_score"),
        )
    )


_LIFT_DECILES = 10


@register(
    "q_lift_gains",
    oracle=f"""
    WITH a AS (
      SELECT embedding AS ae, label AS al FROM embeddings WHERE vec_id = 0
    ),
    s AS (
      SELECT CAST(round({_sql_cos("ae", "c.embedding")} * 1000000) AS BIGINT) AS s6,
        CASE WHEN c.label = al THEN 1 ELSE 0 END AS y
      FROM embeddings c CROSS JOIN a WHERE c.vec_id <> 0
    ),
    g AS (
      SELECT s6, CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(y) AS BIGINT) AS pos
      FROM s GROUP BY s6
    ),
    r AS (
      SELECT cnt, pos,
        CAST(COALESCE(SUM(cnt) OVER (ORDER BY s6 DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
          AS cum_before,
        CAST(SUM(cnt) OVER () AS BIGINT) AS total
      FROM g
    ),
    d AS (
      SELECT ({_LIFT_DECILES} * cum_before) // total AS decile,
        CAST(SUM(cnt) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS n_pos
      FROM r GROUP BY 1
    ),
    t AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(n_pos) AS BIGINT) AS pp FROM d
    )
    SELECT decile, n, n_pos,
      CASE WHEN pp > 0 THEN
        (CAST(n_pos AS DOUBLE) * CAST(nn AS DOUBLE))
          / (CAST(n AS DOUBLE) * CAST(pp AS DOUBLE)) END AS lift,
      CASE WHEN pp > 0 THEN
        CAST(CAST(SUM(n_pos) OVER (ORDER BY decile
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS DOUBLE)
          / pp END AS cum_gain
    FROM d CROSS JOIN t
    """,
)
def q_lift_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift and cumulative-gains table for the cosine-to-anchor
    score: rank the population by score, cut into 10 deciles, and
    report each decile's lift over the base positive rate plus the
    cumulative fraction of positives captured — the
    targeting/prioritization readout that pairs with AUC (how much
    better than random is the TOP of the ranking, concretely).

    Determinism: the decile cut is integer arithmetic on cumulative
    counts of the fixed-pointed score (10·cum_before // total); lift
    and gains are ratios of exact integer products.

    Scale: the descending cumulative count runs through
    `running_total`'s parallel prefix sum on the distinct-score
    AGGREGATE; the only unpartitioned window orders the ≤10-row decile
    frame (bounded domain, the Gini pattern)."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.ids import (
        running_total,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("ae"),
        F.col("label").alias("al"),
        V.norm2("embedding").alias("an"),
    )
    s = emb.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(a)).select(
        F.round(
            (V.dot("ae", "embedding") / (F.col("an") * V.norm2("embedding")))
            * 1000000
        )
        .cast("bigint")
        .alias("s6"),
        F.when(F.col("label") == F.col("al"), 1).otherwise(0).alias("y"),
    )
    g = s.groupBy("s6").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("pos")
    )
    r = running_total(g, [F.col("s6").desc()], "cnt", total_col="cum_incl")
    r = r.withColumn("cum_before", F.col("cum_incl") - F.col("cnt"))
    tot = g.agg(F.sum("cnt").alias("total"))
    d = (
        r.crossJoin(F.broadcast(tot))
        .withColumn(
            "decile", F.expr(f"({_LIFT_DECILES} * cum_before) DIV total")
        )
        .groupBy("decile")
        .agg(F.sum("cnt").alias("n"), F.sum("pos").alias("n_pos"))
    )
    t = d.agg(F.sum("n").alias("nn"), F.sum("n_pos").alias("pp"))
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        d.crossJoin(F.broadcast(t))
        .withColumn("cum_pos", F.sum("n_pos").over(w_cum).cast("bigint"))
        .select(
            "decile",
            F.col("n").cast("bigint").alias("n"),
            F.col("n_pos").cast("bigint").alias("n_pos"),
            # products as double×double, not int64×int64: n_pos·nn
            # overflows bigint at warehouse row counts (review-caught,
            # the q_retrieval_auc/q_ks_test precedent); counts < 2^53
            # make the doubles exact.  pp=0 (no candidate shares the
            # anchor's label) yields NULL in both engines, not inf.
            F.when(
                F.col("pp") > 0,
                (F.col("n_pos").cast("double") * F.col("nn").cast("double"))
                / (F.col("n").cast("double") * F.col("pp").cast("double")),
            ).alias("lift"),
            F.when(
                F.col("pp") > 0,
                F.col("cum_pos").cast("double") / F.col("pp"),
            ).alias("cum_gain"),
        )
    )




_PASS_KS = (1, 2, 5)


def _sql_pass_at_k(k: int) -> str:
    """Unbiased pass@k term: 1 − Π_{i<k} (n−c−i)/(n−i), each factor an
    explicit double division so Spark builds the IDENTICAL left-
    associated IEEE tree (same order ⇒ same bits; no integer products,
    which overflow int64 once a task has ~10⁶ attempts)."""
    prod = " * ".join(
        f"(CAST(n - c - {i} AS DOUBLE) / (n - {i}))" for i in range(k)
    )
    return f"CASE WHEN n >= {k} THEN round(1.0 - {prod}, 6) END"


@register(
    "q_pass_at_k",
    oracle=f"""
    WITH per AS (
      SELECT user_id,
        COUNT(*) AS n,
        COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS c
      FROM events GROUP BY user_id
    ),
    v AS (
      SELECT
        {", ".join(f"{_sql_pass_at_k(k)} AS p{k}" for k in _PASS_KS)}
      FROM per
    )
    {" UNION ALL ".join(
        f'''SELECT CAST({k} AS BIGINT) AS k,
          CAST(COUNT(p{k}) AS BIGINT) AS n_tasks,
          CAST(SUM(CAST(p{k} AS DECIMAL(18,6))) AS DOUBLE) / COUNT(p{k})
            AS mean_pass_at_k
        FROM v''' for k in _PASS_KS)}
    """,
)
def q_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbiased pass@k estimator (Chen et al. 2021, "Evaluating Large
    Language Models Trained on Code", public): for a task with n
    attempts of which c succeed, pass@k = 1 − C(n−c,k)/C(n,k) — the
    probability that at least one of k randomly drawn attempts
    succeeds.  The standard LLM code-eval metric, here computed over
    the event stream (task = user, attempt = event, success =
    purchase — conversion probability within k sampled interactions);
    the estimator is data-shape-agnostic.

    Determinism: the binomial ratio is a product of per-i double
    RATIOS (never integer factorials — a 10⁶-attempt task overflows
    int64 at k=5) in a fixed left-associated order, identical
    expression tree on both engines, rounded once to 6dp per task;
    task means ride DECIMAL(18,6) sums with one final double division.
    A task with fewer than k attempts is excluded from that k (NULL —
    the estimator is undefined); c = n−c crossing zero zeroes the
    product exactly, giving pass@k = 1.

    Scale: ONE scan + one (user)-keyed hash aggregate computes every
    k's term in the same pass; the three output rows unpivot from a
    single global aggregate row — nothing data-scaled crosses the
    network twice."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("c"),
    )

    def pass_k(k: int) -> F.Column:
        n, c = F.col("n"), F.col("c")
        prod = None
        for i in range(k):
            term = (n - c - F.lit(i)).cast("double") / (n - F.lit(i))
            prod = term if prod is None else prod * term
        return F.when(n >= k, F.round(F.lit(1.0) - prod, 6))

    v = per.select(*[pass_k(k).alias(f"p{k}") for k in _PASS_KS])
    agg = v.agg(
        *[
            a
            for k in _PASS_KS
            for a in (
                F.count(F.col(f"p{k}")).cast("bigint").alias(f"n{k}"),
                F.sum(F.col(f"p{k}").cast("decimal(18,6)"))
                .cast("double")
                .alias(f"s{k}"),
            )
        ]
    )
    stacked = ", ".join(
        f"CAST({k} AS BIGINT), n{k}, s{k} / n{k}" for k in _PASS_KS
    )
    return agg.selectExpr(
        f"stack({len(_PASS_KS)}, {stacked}) AS (k, n_tasks, mean_pass_at_k)"
    )


# off-policy evaluation: the target policy maps context (user_id % 4)
# to a deterministic action; rewards binarize the event value.
_IPS_POLICY = ["view", "click", "signup", "error"]

_SQL_IPS_POLICY = "CASE (user_id % 4) " + " ".join(
    f"WHEN {i} THEN '{a}'" for i, a in enumerate(_IPS_POLICY)
) + " END"


@register(
    "q_ips_policy_eval",
    oracle=f"""
    WITH logged AS (
      SELECT user_id % 4 AS x, event_type AS a,
        CASE WHEN value > 50 THEN 1 ELSE 0 END AS r,
        {_SQL_IPS_POLICY} AS pi_a
      FROM events WHERE event_type IS NOT NULL
    ),
    prop AS (
      SELECT x, a, COUNT(*) AS n_xa FROM logged GROUP BY x, a
    ),
    ctx AS (
      SELECT x, SUM(n_xa) AS n_x FROM prop GROUP BY x
    ),
    weighted AS (
      SELECT l.r,
        CASE WHEN l.a = l.pi_a
             THEN round(CAST(ctx.n_x AS DOUBLE) / prop.n_xa, 6)
             ELSE 0.0 END AS w
      FROM logged l
      JOIN prop ON prop.x = l.x AND prop.a = l.a
      JOIN ctx ON ctx.x = l.x
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
      round(CAST(SUM(CAST(r * w AS DECIMAL(18,6))) AS DOUBLE)
            / COUNT(*), 6) AS ips,
      CASE WHEN SUM(CAST(w AS DECIMAL(18,6))) > 0 THEN
        round(CAST(SUM(CAST(r * w AS DECIMAL(18,6))) AS DOUBLE)
              / CAST(SUM(CAST(w AS DECIMAL(18,6))) AS DOUBLE), 6)
      END AS snips,
      CASE WHEN SUM(CAST(w AS DECIMAL(18,6))) > 0 THEN
        round(CAST(SUM(CAST(w AS DECIMAL(18,6))) AS DOUBLE)
              * CAST(SUM(CAST(w AS DECIMAL(18,6))) AS DOUBLE)
              / CAST(SUM(CAST(round(w * w, 6) AS DECIMAL(28,6)))
                     AS DOUBLE), 6)
      END AS ess
    FROM weighted
    """,
)
def q_ips_policy_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OFF-POLICY EVALUATION via inverse propensity scoring (Horvitz &
    Thompson 1952; Dudík/Langford/Li 2011, public) — the counterfactual
    question behind every recommender/RLHF-policy change: "what reward
    WOULD the new policy have earned on the logged traffic?"  IPS
    reweights each logged (context, action, reward) by
    1[π(x)=a]/p̂(a|x); SNIPS self-normalizes (lower variance, the
    production default); ESS = (Σw)²/Σw² says how many effective
    samples survive the reweighting — the diagnostic that tells you
    when the estimate is junk.

    Context = user bucket (user_id % 4), logged action = event type,
    reward = value > 50, target policy = a fixed bucket→action map;
    the propensity is the empirical logging rate p̂(a|x) = n_xa/n_x.

    Determinism: propensities and weights are int/int divisions
    rounded 6dp; r∈{{0,1}} keeps r·w exact; all sums ride
    DECIMAL(18,6) (order-independent); w² rounds 6dp before its sum.
    Scale: one (x,a)-keyed aggregate builds the bounded propensity
    table (|contexts|·|actions| rows, broadcast back); the estimate
    folds in ONE global aggregate — no per-row state, no window."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    pi_a = F.element_at(
        F.array(*[F.lit(a) for a in _IPS_POLICY]),
        (F.col("user_id") % 4).cast("int") + 1,
    )
    logged = ev.select(
        (F.col("user_id") % 4).alias("x"),
        F.col("event_type").alias("a"),
        F.when(F.col("value") > 50, 1).otherwise(0).alias("r"),
        pi_a.alias("pi_a"),
    )
    prop = logged.groupBy("x", "a").agg(F.count(F.lit(1)).alias("n_xa"))
    ctx = prop.groupBy("x").agg(F.sum("n_xa").alias("n_x"))
    w = F.when(
        F.col("a") == F.col("pi_a"),
        F.round(F.col("n_x").cast("double") / F.col("n_xa"), 6),
    ).otherwise(F.lit(0.0))
    weighted = (
        logged.join(F.broadcast(prop), ["x", "a"])
        .join(F.broadcast(ctx), "x")
        .select("r", w.alias("w"))
    )
    sum_rw = F.sum((F.col("r") * F.col("w")).cast("decimal(18,6)")).cast(
        "double"
    )
    sum_w = F.sum(F.col("w").cast("decimal(18,6)")).cast("double")
    sum_w2 = F.sum(
        F.round(F.col("w") * F.col("w"), 6).cast("decimal(28,6)")
    ).cast("double")
    # a policy matching NO logged action zeroes Σw: 0/0 is NULL in
    # Spark, NaN in DuckDB — guard both ratios to NULL on both sides
    return weighted.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(sum_rw / F.count(F.lit(1)), 6).alias("ips"),
        F.when(sum_w > 0, F.round(sum_rw / sum_w, 6)).alias("snips"),
        F.when(sum_w > 0, F.round(sum_w * sum_w / sum_w2, 6)).alias("ess"),
    )


# split-conformal: md5-unit thirds (train / calibration / test) and a
# 90% nominal coverage level
_CONF_LEVEL = 0.9


@register(
    "q_conformal_prediction",
    oracle=f"""
    WITH o AS (
      SELECT o_orderkey, o_orderpriority,
        CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS DOUBLE) AS y,
        {sql_md5_unit("CAST(o_orderkey AS VARCHAR) || ':conf'")} AS u
      FROM orders WHERE o_orderpriority IS NOT NULL
    ),
    model AS (
      SELECT o_orderpriority,
        round(CAST(SUM(CAST(y AS DECIMAL(16,2))) AS DOUBLE) / COUNT(*), 4)
          AS pred
      FROM o WHERE u < 0.5 GROUP BY o_orderpriority
    ),
    calib AS (
      SELECT round(quantile_cont(abs(o.y - model.pred), {_CONF_LEVEL}), 4)
          AS q_hat,
        CAST(COUNT(*) AS BIGINT) AS n_calib
      FROM o JOIN model USING (o_orderpriority)
      WHERE u >= 0.5 AND u < 0.75
    )
    SELECT calib.n_calib, calib.q_hat,
      round(2 * calib.q_hat, 4) AS interval_width,
      round(CAST(SUM(CASE WHEN abs(o.y - model.pred) <= calib.q_hat
                          THEN 1 ELSE 0 END) AS DOUBLE)
            / COUNT(*), 6) AS test_coverage,
      CAST(COUNT(*) AS BIGINT) AS n_test
    FROM o JOIN model USING (o_orderpriority) CROSS JOIN calib
    WHERE u >= 0.75
    GROUP BY calib.n_calib, calib.q_hat
    """,
)
def q_conformal_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPLIT-CONFORMAL prediction intervals (Vovk et al. 2005; Lei et
    al. 2018, public) — the distribution-free uncertainty wrapper
    every deployed regressor needs: fit a (here: per-priority-mean)
    model on a TRAIN split, take the 90th percentile of absolute
    residuals on a held-out CALIBRATION split as the interval
    half-width q̂, and measure the guaranteed ~90% coverage on a TEST
    split.  Complements q_calibration_bins (classifier reliability)
    and q_bootstrap_ci (estimator uncertainty) with per-PREDICTION
    uncertainty.

    Determinism: the three splits are md5-unit thirds (the house
    rand() replacement); the model is decimal-exact means rounded 4dp;
    q̂ uses the shared (n−1)·p quantile interpolation rounded 4dp;
    coverage is an integer ratio rounded 6dp.

    Scale: one train-split aggregate produces the |priority|-row model
    (broadcast); calibration reduces to a 1-row q̂ (broadcast); the
    test pass is a scan + broadcast joins + one fold.  The exact
    calibration quantile buffers the calib split's residuals — at
    100 TB swap to approx_percentile exactly as the
    functions/quantiles.py knob family does."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isNotNull()
    ).select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(14,2)").cast("double").alias("y"),
        md5_unit(
            F.concat(F.col("o_orderkey").cast("string"), F.lit(":conf"))
        ).alias("u"),
    )
    model = (
        o.filter(F.col("u") < 0.5)
        .groupBy("o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("y").cast("decimal(16,2)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("pred")
        )
    )
    resid = F.abs(F.col("y") - F.col("pred"))
    calib = (
        o.filter((F.col("u") >= 0.5) & (F.col("u") < 0.75))
        .join(F.broadcast(model), "o_orderpriority")
        .agg(
            F.round(
                F.expr(f"percentile(abs(y - pred), {_CONF_LEVEL})"), 4
            ).alias("q_hat"),
            F.count(F.lit(1)).cast("bigint").alias("n_calib"),
        )
    )
    return (
        o.filter(F.col("u") >= 0.75)
        .join(F.broadcast(model), "o_orderpriority")
        .join(F.broadcast(calib))
        .groupBy("n_calib", "q_hat")
        .agg(
            F.round(
                F.sum(F.when(resid <= F.col("q_hat"), 1).otherwise(0))
                .cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("test_coverage"),
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
        )
        .select(
            "n_calib",
            "q_hat",
            F.round(2 * F.col("q_hat"), 4).alias("interval_width"),
            "test_coverage",
            "n_test",
        )
    )


@register(
    "q_cuped",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
        CAST(COUNT(*) FILTER (WHERE ts <  TIMESTAMP '2024-01-16')
             AS BIGINT) AS x,
        CAST(COUNT(*) FILTER (WHERE ts >= TIMESTAMP '2024-01-16')
             AS BIGINT) AS y
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
      GROUP BY user_id
    ),
    theta AS (
      SELECT
        CASE WHEN CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE)
                  - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE)
                    / COUNT(*) > 0 THEN
          round(
            (CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DOUBLE)
             - CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE) / COUNT(*))
            / (CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE)
               - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE)
                 / COUNT(*)),
            6)
        ELSE 0.0 END AS th,
        round(CAST(SUM(x) AS DOUBLE) / COUNT(*), 6) AS mean_x_all
      FROM per_user
    )
    SELECT user_id % 2 = 0 AS variant_a,
      CAST(COUNT(*) AS BIGINT) AS n_users,
      round(CAST(SUM(x) AS DOUBLE) / COUNT(*), 6) AS mean_pre,
      round(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS mean_post,
      round(
        round(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6)
        - th * (round(CAST(SUM(x) AS DOUBLE) / COUNT(*), 6) - mean_x_all),
        6) AS mean_adjusted,
      th AS theta
    FROM per_user CROSS JOIN theta
    GROUP BY user_id % 2 = 0, th, mean_x_all
    """,
)
def q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (public: Deng, Xu, Kohavi & Walker,
    WSDM'13 — Controlled-experiment Using Pre-Experiment Data): adjust
    each A/B variant's post-period metric with the pre-period
    covariate, Y' = Y − θ·(X − E[X]), θ = cov(X,Y)/var(X) fitted on
    ALL users — the standard trick that cuts experiment runtimes by
    the covariate's R².  Pre-period = activity before 2024-01-16 (the
    feed's midpoint), post-period after; variant = user parity (the
    deterministic assignment stand-in); metric = event COUNT.

    Determinism: X and Y are integers, so Σx, Σy, Σxy, Σx² are exact
    (DECIMAL(38,0) cross-products — warehouse-scale counts overflow
    int64 when squared); θ and every mean is ONE double expression
    over those exact sums, 6dp-rounded.  The adjusted mean uses
    linearity — mean(Y') = mean(Y) − θ·(mean(X|variant) − mean(X)) —
    so no per-row float is ever summed.

    Scale: one user-keyed count aggregate (the only data-scaled
    shuffle), a 1-row θ reduce broadcast back, one |variants|-row
    aggregate.  A naive per-row Y−θ(X−μ) materialization would be an
    extra full pass; the linearity form never touches fact rows
    twice."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    cut = F.lit("2024-01-16").cast("timestamp")
    per_user = ev.groupBy("user_id").agg(
        F.count_if(F.col("ts") < cut).alias("x"),
        F.count_if(F.col("ts") >= cut).alias("y"),
    )
    d38 = "decimal(38,0)"
    n = F.count(F.lit(1))
    sx = F.sum("x").cast("double")
    sy = F.sum("y").cast("double")
    # a zero pre-period variance (degenerate fixture) pins theta to 0
    # (no adjustment) instead of an ANSI divide-by-zero
    var_num = (
        F.sum(F.col("x").cast(d38) * F.col("x")).cast("double") - sx * sx / n
    )
    theta = per_user.agg(
        F.when(
            var_num > 0,
            F.round(
                (F.sum(F.col("x").cast(d38) * F.col("y")).cast("double")
                 - sx * sy / n)
                / var_num,
                6,
            ),
        ).otherwise(0.0).alias("th"),
        F.round(sx / n, 6).alias("mean_x_all"),
    )
    mean_pre = F.round(sx / n, 6)
    mean_post = F.round(sy / n, 6)
    return (
        per_user.crossJoin(F.broadcast(theta))
        .groupBy(
            (F.col("user_id") % 2 == 0).alias("variant_a"), "th", "mean_x_all"
        )
        .agg(
            n.cast("bigint").alias("n_users"),
            mean_pre.alias("mean_pre"),
            mean_post.alias("mean_post"),
            F.round(
                mean_post - F.first("th") * (mean_pre - F.first("mean_x_all")),
                6,
            ).alias("mean_adjusted"),
        )
        .select(
            "variant_a", "n_users", "mean_pre", "mean_post",
            "mean_adjusted", F.col("th").alias("theta"),
        )
    )


@register(
    "q_ab_srm",
    oracle="""
    WITH counts AS (
      SELECT
        CAST(COUNT(*) FILTER (WHERE user_id % 2 = 0) AS BIGINT) AS n_a,
        CAST(COUNT(*) FILTER (WHERE user_id % 2 <> 0) AS BIGINT) AS n_b
      FROM (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL)
    )
    SELECT n_a, n_b,
      CASE WHEN n_a + n_b > 0 THEN
        round(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b), 6)
      END AS chi2,
      CASE WHEN n_a + n_b > 0 THEN
        CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b) > 3.841
      END AS srm_detected
    FROM counts
    """,
)
def q_ab_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLE-RATIO-MISMATCH guardrail (public: Kohavi et al.,
    "Trustworthy Online Controlled Experiments" — the first check every
    experimentation platform runs): does the realized unit split match
    the designed 50/50?  For two cells the Pearson χ² collapses to
    (n_a−n_b)²/n, compared against the 1-df α=0.05 critical value
    3.841; a flagged experiment's metrics (q_cuped, q_ab_sequential)
    are untrustworthy regardless of their p-values.

    Exactness: pure integers until one final division (6dp).  Scale:
    one distinct-user aggregate — map-side partials, a 1-row result."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    users = ev.select("user_id").distinct()
    counts = users.agg(
        F.count_if(F.col("user_id") % 2 == 0).cast("bigint").alias("n_a"),
        F.count_if(F.col("user_id") % 2 != 0).cast("bigint").alias("n_b"),
    )
    diff2 = (F.col("n_a") - F.col("n_b")) * (F.col("n_a") - F.col("n_b"))
    n = F.col("n_a") + F.col("n_b")
    # empty experiment -> NULL verdict, not a divide-by-zero (ANSI)
    chi2 = F.when(n > 0, diff2.cast("double") / n)
    return counts.select(
        "n_a",
        "n_b",
        F.round(chi2, 6).alias("chi2"),
        (chi2 > 3.841).alias("srm_detected"),
    )
