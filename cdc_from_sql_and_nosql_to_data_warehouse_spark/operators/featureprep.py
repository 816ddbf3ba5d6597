"""Feature-prep operators: encodings, scalings, splits, privacy and
sequence prep from warehouse columns (split from evalprep.py, round 7
— the reference has no evaluation/feature code of its own; see
evalprep.py for family docs and /root/reference/source/*/handler.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
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
    md5_prefix_int,
    md5_unit,
    sql_md5_int,
    sql_md5_unit,
)
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import register
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.evalcommon import (
    _SQL_DOT,
    _sql_cos,
)
from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.readers import load_table

_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


@register(
    "q_one_hot_encode",
    oracle="SELECT c_custkey, "
    + ", ".join(
        f"CASE WHEN c_mktsegment = '{s}' THEN 1 ELSE 0 END AS seg_{s.lower()}"
        for s in _SEGMENTS
    )
    + ", CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END AS seg_null FROM customer",
)
def q_one_hot_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-hot encoding of a bounded categorical (c_mktsegment, 5-value
    TPC-H domain) into indicator columns, with an explicit NULL
    indicator — the feature-matrix form a downstream trainer consumes.

    Scale: a PURE PROJECTION — no shuffle, no vocabulary state, no
    pivot exchange; the category domain is fixed up front (as real
    feature pipelines pin it, so serving-time rows can't silently add
    columns).  Runs at scan speed over any input size."""
    cust = load_table(spark, sf_dir, "customer")
    cols = [
        F.when(F.col("c_mktsegment") == s, 1).otherwise(0).alias(f"seg_{s.lower()}")
        for s in _SEGMENTS
    ]
    null_ind = F.when(F.col("c_mktsegment").isNull(), 1).otherwise(0).alias("seg_null")
    return cust.select("c_custkey", *cols, null_ind)


# the exact/approx percentile knob is shared family-wide (also
# q_winsorize / q_mad_outliers, relational.py) — see
# functions/quantiles.py; these aliases keep the original import paths
from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.quantiles import (
    APPROX_ACCURACY as _ROBUST_APPROX_ACCURACY,
    EXACT_MAX_ROWS as _ROBUST_EXACT_MAX_ROWS,
    pct as _pct,
    use_exact as _use_exact,
)


@register(
    "q_robust_scale",
    oracle="""
    WITH stats AS (
      SELECT l_returnflag,
        round(quantile_cont(l_extendedprice, 0.5), 4) AS med,
        round(quantile_cont(l_extendedprice, 0.75), 4)
          - round(quantile_cont(l_extendedprice, 0.25), 4) AS iqr
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_orderkey, l_linenumber, l_returnflag,
      round((l_extendedprice - med) / iqr, 6) AS robust_price
    FROM lineitem JOIN stats USING (l_returnflag)
    WHERE iqr > 0
    """,
)
def q_robust_scale(
    spark: SparkSession, sf_dir: str, exact: bool | None = None
) -> DataFrame:
    """Robust (median/IQR) feature scaling of l_extendedprice per
    return-flag group — the outlier-insensitive sibling of
    q_zscore_normalize / q_minmax_scale (mlprep.py): one price at 10^9
    shifts a z-score's mean but moves the median not at all.

    Scale: ONE aggregate produces a 3-row stats frame (group domain is
    the returnflag enum) that broadcasts back onto the scan — fact rows
    never shuffle.  Quantiles are Spark `percentile` ↔ DuckDB
    `quantile_cont` (shared (n-1)·p interpolation, the q_percentile
    precedent), rounded to 4dp before use so the scaled output is
    engine-identical; degenerate groups (IQR 0) are filtered, not
    divided by.

    The exact/approx knob (VERDICT r6 §wrong-3): Spark's exact
    `percentile` buffers EVERY group value in its aggregation state —
    the whole 100 TB group rides the partial-merge shuffle — so above
    _ROBUST_EXACT_MAX_ROWS the stats pass swaps to `approx_percentile`
    (bounded t-digest state, identical broadcast-stats plan shape,
    pinned in tests/test_plans_round7.py).  The oracle window (sf0.01,
    60k rows) stays on the exact path so DuckDB parity is unchanged.
    Force either path with exact=True/False or
    SPARK_GRAFT_ROBUST_EXACT=1/0; the row probe is a footer-stats
    parquet count (no data pages read)."""
    li = load_table(spark, sf_dir, "lineitem")
    exact = _use_exact(li, exact, source_path=f"{sf_dir}/lineitem.parquet")
    # the exact-percentile partial buffers every group value — spread
    # the 2-column stats projection so that state splits across tasks
    # instead of riding the scan's file-layout parallelism (r12).
    # ONLY on the exact path: the approx (>50M-row / 100 TB) partial is
    # a bounded t-digest sketch, so the rebalance would ship unreduced
    # rows for nothing (the q_weighted_quantile negative result).
    proj = li.select("l_returnflag", "l_extendedprice")
    stats = (spread(proj) if exact else proj).groupBy(
        "l_returnflag"
    ).agg(
        F.round(F.expr(_pct("l_extendedprice", 0.5, exact)), 4).alias("med"),
        (
            F.round(F.expr(_pct("l_extendedprice", 0.75, exact)), 4)
            - F.round(F.expr(_pct("l_extendedprice", 0.25, exact)), 4)
        ).alias("iqr"),
    )
    return (
        li.join(F.broadcast(stats.filter(F.col("iqr") > 0)), "l_returnflag")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            F.round(
                (F.col("l_extendedprice") - F.col("med")) / F.col("iqr"), 6
            ).alias("robust_price"),
        )
    )


@register(
    "q_group_split_no_leakage",
    oracle=f"""
    SELECT source,
      CASE WHEN {sql_md5_unit("source")} < 0.8 THEN 'train' ELSE 'eval' END AS split,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY source
    """,
)
def q_group_split_no_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/eval split: the split decision hashes the
    GROUP key (source), not the row, so every document from one source
    lands on the same side — near-duplicates and templated pages within
    a crawl domain can never straddle the boundary and leak eval
    content into training.  Complements q_split_train_eval
    (curation.py), which splits per-document.

    Scale: the split is a pure projection (portable md5-unit on the
    group key — reproducible across engines, runs, and cluster sizes;
    no vocabulary state, no shuffle to decide membership); the summary
    is one hash aggregate keyed by source."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .select(
            "source",
            F.when(md5_unit(F.col("source")) < 0.8, "train")
            .otherwise("eval")
            .alias("split"),
            "n_docs",
            "sum_chars",
        )
    )


@register(
    "q_gaps_islands",
    oracle="""
    SELECT min(k) AS island_start, max(k) AS island_end,
      CAST(COUNT(*) AS BIGINT) AS n_keys
    FROM (
      SELECT o_orderkey AS k,
        o_orderkey - row_number() OVER (ORDER BY o_orderkey) AS isl
      FROM orders
      WHERE o_orderpriority = '1-URGENT' AND o_orderkey IS NOT NULL
    ) GROUP BY isl
    """,
)
def q_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands over a sparse key sequence (TPC-H order keys
    are deliberately sparse): contiguous runs collapse to
    (island_start, island_end, n_keys) — the completeness/continuity
    audit a CDC consumer runs to find dropped key ranges, and the
    numeric-key sibling of q_interval_merge's timestamp islands.

    Scale: the classic formulation needs a GLOBAL row_number (a
    single-task window — the anti-pattern this repo pins against);
    here the sequence number comes from `assign_dense_ids`
    (functions/ids.py: range-partition → per-partition numbering →
    driver-side prefix-sum of partition sizes, one long per
    partition), so island_id = key − seq is computed fully in
    parallel, then one hash aggregate per island.  The urgent-priority
    filter is the audit's subject (which urgent-order key ranges
    survived ingestion?) — the shipped keyspace is contiguous, so the
    unfiltered run would be a single island."""
    keys = (
        load_table(spark, sf_dir, "orders")
        # NULL keys are excluded explicitly: a NULL can't belong to an
        # island, and the engines disagree on NULL placement in the
        # oracle's row_number ordering (Spark NULLS FIRST, DuckDB LAST)
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & F.col("o_orderkey").isNotNull()
        )
        .select("o_orderkey")
    )
    ids = assign_dense_ids(keys, ["o_orderkey"], id_col="seq")
    return (
        ids.withColumn("isl", F.col("o_orderkey") - F.col("seq"))
        .groupBy("isl")
        .agg(
            F.min("o_orderkey").alias("island_start"),
            F.max("o_orderkey").alias("island_end"),
            F.count(F.lit(1)).alias("n_keys"),
        )
        .drop("isl")
    )


@register(
    "q_l_diversity",
    oracle="""
    SELECT c_nationkey, c_mktsegment,
      CAST(COUNT(*) AS BIGINT) AS group_size,
      CAST(COUNT(DISTINCT CAST(floor(c_acctbal / 2000.0) AS BIGINT)) AS BIGINT)
        AS l_distinct,
      COUNT(DISTINCT CAST(floor(c_acctbal / 2000.0) AS BIGINT)) >= 3 AS meets_l3
    FROM customer
    WHERE c_acctbal IS NOT NULL
    GROUP BY c_nationkey, c_mktsegment
    """,
)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit: for each quasi-identifier group
    (nation × market segment) count the DISTINCT sensitive-attribute
    values (account-balance band) — k-anonymity (q_k_anonymity,
    quality.py) only bounds group SIZE; a group of 50 people who all
    share one salary band still leaks the sensitive value, which is
    exactly what l-diversity catches (Machanavajjhala et al. 2007,
    public).

    Scale: one hash aggregate with a distinct-count over a
    domain-bounded band (the band, not the raw balance, is the
    sensitive alphabet — distinct-count state stays tiny per group);
    the QI key domain is nations × segments, so output is bounded
    regardless of input size."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_acctbal").isNotNull()
    )
    band = F.floor(F.col("c_acctbal") / 2000.0).cast("bigint")
    return cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("group_size"),
        F.countDistinct(band).alias("l_distinct"),
        (F.countDistinct(band) >= 3).alias("meets_l3"),
    )


# DuckDB twin of operators.dedup._sql_cosine, inlined over named
# embedding columns (the {a}/{b} slots take qualified column refs)


_QA_BINS = 20  # quantile-alignment bins


@register(
    "q_quantile_align",
    oracle=f"""
    WITH g AS (
      SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM documents WHERE n_chars IS NOT NULL
      GROUP BY source, n_chars
    ),
    b AS (
      SELECT source, n_chars, cnt,
        ({_QA_BINS} * CAST(COALESCE(SUM(cnt) OVER (
            PARTITION BY source ORDER BY n_chars
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT))
          // CAST(SUM(cnt) OVER (PARTITION BY source) AS BIGINT) AS bucket
      FROM g
    ),
    sb AS (
      SELECT source, bucket, CAST(SUM(cnt) AS BIGINT) AS n_docs,
        CAST(SUM(n_chars * cnt) AS BIGINT) AS schars
      FROM b GROUP BY source, bucket
    ),
    gl AS (
      SELECT bucket,
        CAST(SUM(schars) AS DOUBLE) / CAST(SUM(n_docs) AS DOUBLE) AS aligned_len
      FROM sb GROUP BY bucket
    )
    SELECT sb.source, sb.bucket, sb.n_docs, gl.aligned_len
    FROM sb JOIN gl USING (bucket)
    """,
)
def q_quantile_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of the document-length distribution
    across sources: each source's docs are ranked into 20 quantile
    buckets, and every bucket maps to the GLOBAL mean length of that
    bucket — so after alignment all sources share one length
    distribution (the classic quantile-normalize, applied the way a
    mixture builder equalizes per-source length profiles before
    sampling).

    Determinism: bucket boundaries are pure integer arithmetic
    (20·cum_before // total) over counts — ties (equal lengths) land
    in one bucket by construction, no tie-break needed; the aligned
    value is a ratio of exact integer sums.

    Scale: the Gini pattern — the per-source cumulative window runs on
    the (source × distinct-length) AGGREGATE (bounded by the length
    domain), never on document rows; the bucket remap is a broadcast
    join on ≤ 20·sources rows."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull()
    )
    g = docs.groupBy("source", "n_chars").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = (
        Window.partitionBy("source")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy("source")
    b = (
        g.withColumn(
            "cum_before", F.coalesce(F.sum("cnt").over(w_cum), F.lit(0))
        )
        .withColumn("total", F.sum("cnt").over(w_tot))
        .withColumn(
            "bucket", F.expr(f"({_QA_BINS} * cum_before) DIV total")
        )
    )
    sb = b.groupBy("source", "bucket").agg(
        F.sum("cnt").alias("n_docs"),
        F.sum(F.col("n_chars") * F.col("cnt")).alias("schars"),
    )
    glob = sb.groupBy("bucket").agg(
        (
            F.sum("schars").cast("double") / F.sum("n_docs").cast("double")
        ).alias("aligned_len")
    )
    return sb.join(F.broadcast(glob), "bucket").select(
        "source", "bucket", "n_docs", "aligned_len"
    )




_PCA_COMPONENTS = 2


@register("q_pca_project")  # rows-only: eigendecomposition is not SQL-expressible
def q_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project embeddings onto their top-2 principal components — the
    dimensionality-reduction pass a curation pipeline runs for corpus
    visualization, drift monitoring, and cheap pre-filtering before
    exact similarity.

    Scale shape (the whole point of this operator): the covariance is
    NEVER materialized per-pair in the engine.  A `mapInPandas` kernel
    folds each Arrow batch into a dim×dim partial Gram matrix + sum
    vector + count (numpy matmul, so the per-batch cost is one BLAS
    call), emitting ≤ dim·(dim+1)/2 + dim + 1 rows per PARTITION — a
    fixed ~2 k rows regardless of input size.  One hash aggregate sums
    the partials (the DataFrame form of treeAggregate), the ≤2 k-row
    result collects to the driver (bounded by dim², not data), numpy
    solves the 64×64 eigenproblem, and the two components broadcast
    back as literals for a map-only projection.  Two data passes
    total, both embarrassingly parallel.

    Determinism: eigenvector SIGN is pinned (largest-|x| element made
    positive); float partial sums vary with partition boundaries in
    the last ulps, so the operator is registered rows-only and pinned
    by tests/test_evalprep.py against an exact single-node PCA
    (|corr| > 0.999, variance ordering, orthonormality)."""
    import numpy as np
    import pandas as pd

    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.mlprep import (
        _assert_clean_embeddings,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    _assert_clean_embeddings(emb)
    dim_row = emb.select(F.size("embedding").alias("d")).first()
    if dim_row is None:
        return emb.select(
            "vec_id",
            "label",
            F.lit(0.0).alias("pc1"),
            F.lit(0.0).alias("pc2"),
        ).limit(0)
    dim = dim_row["d"]
    # _assert_clean_embeddings above pins a single uniform dimension,
    # so the one-row dim probe is safe (a ragged corpus raised already)
    iu0, iu1 = [list(x) for x in np.triu_indices(dim)]

    def partials(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            g = X.T @ X
            s = X.sum(axis=0)
            yield pd.DataFrame(
                {
                    "i": [-1] + list(range(dim)) + iu0,
                    "j": [-1] + [-1] * dim + iu1,
                    "v": [float(len(X))] + s.tolist() + g[iu0, iu1].tolist(),
                }
            )

    rows = (
        emb.select("embedding")
        .mapInPandas(partials, "i int, j int, v double")
        .groupBy("i", "j")
        .agg(F.sum("v").alias("v"))
        .collect()  # bounded: dim*(dim+1)/2 + dim + 1 ≈ 2.1k rows at dim=64
    )
    n = 0.0
    s = np.zeros(dim)
    G = np.zeros((dim, dim))
    for r in rows:
        if r["i"] == -1:
            n = r["v"]
        elif r["j"] == -1:
            s[r["i"]] = r["v"]
        else:
            G[r["i"], r["j"]] = r["v"]
            G[r["j"], r["i"]] = r["v"]
    mu = s / n
    C = G / n - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(C)  # ascending
    comps = []
    for k in range(1, _PCA_COMPONENTS + 1):
        v = vecs[:, -k]
        v = v if v[np.argmax(np.abs(v))] >= 0 else -v  # pin the sign
        comps.append(v)
    centered = F.transform(
        F.col("embedding"),
        lambda x, i: x.cast("double")
        - F.element_at(F.array(*[F.lit(float(m)) for m in mu]), i + 1),
    )
    projs = [
        F.aggregate(
            F.zip_with(
                centered,
                F.array(*[F.lit(float(x)) for x in comp]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias(f"pc{k}")
        for k, comp in enumerate(comps, start=1)
    ]
    return emb.select("vec_id", "label", *projs)




@register(
    "q_target_encoding_loo",
    oracle="""
    WITH y AS (
      SELECT c_custkey, c_mktsegment,
        CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS y
      FROM customer
    ),
    seg AS (
      SELECT c_mktsegment, CAST(SUM(y) AS BIGINT) AS sum_y,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM y GROUP BY c_mktsegment
    )
    SELECT y.c_custkey, y.c_mktsegment AS segment, CAST(y.y AS INTEGER) AS y,
      CASE WHEN seg.n > 1
           THEN round(CAST(seg.sum_y - y.y AS DOUBLE) / (seg.n - 1), 6)
      END AS enc
    FROM y JOIN seg USING (c_mktsegment)
    """,
)
def q_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out TARGET ENCODING of a categorical feature: each
    row's category is replaced by the mean of the (binary) target over
    every OTHER row of that category — the per-ROW leakage correction,
    complementing mlprep.q_target_encode's per-CATEGORY smoothed-mean
    table (shrinkage handles rare categories; leave-one-out handles
    the row's own label leaking into its feature — production
    pipelines use both).

    Exactness: the target is 0/1, so the category sums are integers;
    the only division is (sum_y − y)/(n − 1) — an int/int double
    division both engines evaluate identically — rounded once to 6dp.
    Scale: one hash agg to a |categories|-row stats table, broadcast
    back onto the scan (AQE chooses the broadcast while it fits — the
    stats side is category-bounded, not data-bounded); no window, no
    per-row state."""
    y = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.when(F.col("c_acctbal") > 0, 1).otherwise(0).alias("y"),
    )
    seg = y.groupBy("c_mktsegment").agg(
        F.sum("y").cast("bigint").alias("sum_y"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    return y.join(seg, "c_mktsegment").select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.col("y").cast("int").alias("y"),
        F.when(
            F.col("n") > 1,
            F.round((F.col("sum_y") - F.col("y")).cast("double") / (F.col("n") - 1), 6),
        ).alias("enc"),
    )


# collapse threshold: categories holding < 4% of rows fold into OTHER.
# Compared as integers (cnt * 100 < total * 4) — no float boundary to
# diverge between engines.
_RARE_PCT = 4


@register(
    "q_rare_collapse",
    oracle=f"""
    WITH counts AS (
      SELECT p_brand, COUNT(*) AS cnt FROM part GROUP BY p_brand
    ),
    total AS (SELECT SUM(cnt) AS total FROM counts),
    labeled AS (
      SELECT CASE WHEN cnt * 100 < total * {_RARE_PCT} THEN 'OTHER'
                  ELSE p_brand END AS label,
             cnt
      FROM counts CROSS JOIN total
    )
    SELECT label, CAST(SUM(cnt) AS BIGINT) AS n_rows,
      CAST(COUNT(*) AS BIGINT) AS n_categories
    FROM labeled GROUP BY label
    """,
)
def q_rare_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rare-category COLLAPSING: categories carrying under 4% of rows
    fold into a single OTHER label — the featureprep pass that keeps
    one-hot/target encodings from exploding on heavy-tailed
    categoricals (and serving-time rows from hitting unseen levels).

    Determinism: the threshold comparison is pure integer arithmetic
    (cnt·100 < total·4) — no float boundary for engines to disagree
    on.  Scale: everything after the first hash agg operates on
    |categories| rows, not data rows; the total is a 1-row broadcast
    cross join."""
    counts = (
        load_table(spark, sf_dir, "part")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").alias("total"))
    labeled = counts.crossJoin(F.broadcast(total)).select(
        F.when(
            F.col("cnt") * 100 < F.col("total") * _RARE_PCT, F.lit("OTHER")
        )
        .otherwise(F.col("p_brand"))
        .alias("label"),
        "cnt",
    )
    return labeled.groupBy("label").agg(
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_categories"),
    )


@register(
    "q_quantile_normalize",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
      round(percent_rank() OVER (
        PARTITION BY l_returnflag ORDER BY l_quantity), 6) AS qn
    FROM lineitem
    WHERE l_quantity IS NOT NULL
    """,
)
def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group QUANTILE NORMALIZATION: each value mapped to its
    percent rank within its group — rank-based feature scaling, immune
    to outliers and distribution shape.

    The oracle states the semantics directly as a percent_rank()
    window; the Spark plan REFUSES that shape — percent_rank over 3
    giant groups is 3 single-task sorts of the whole fact table.
    Instead: percent_rank's definition is (count of strictly smaller
    rows)/(n−1), so aggregate to DISTINCT (group, value) counts (tiny:
    |groups|·|distinct values|), take the EXCLUSIVE running sum over
    value within group (a window over the distinct rows, not the
    facts), broadcast-join back, and divide once.  Identical output,
    and the only per-fact work is a hash agg and a broadcast probe.

    NULL semantics (dirty-fixture-caught): the metric is defined over
    NON-NULL values only (a NULL quantity has no rank — and Spark
    orders NULLS FIRST where DuckDB orders NULLS LAST, so ranking them
    cannot be engine-portable); a NULL GROUP KEY is a real group, so
    the join back is null-SAFE on the key (plain equality silently
    dropped the NULL-flag rows the window oracle keeps).  Single-row
    groups get qn = 0 (percent_rank's convention), never 0/0."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
        .filter(F.col("l_quantity").isNotNull())
    )
    vc = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_quantity")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wn = Window.partitionBy("l_returnflag")
    ranks = vc.select(
        F.col("l_returnflag").alias("rf_r"),
        F.col("l_quantity").alias("qty_r"),
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("n_less"),
        F.sum("cnt").over(wn).alias("n"),
    )
    return li.join(
        ranks,
        li["l_returnflag"].eqNullSafe(ranks["rf_r"])
        & (li["l_quantity"] == ranks["qty_r"]),
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_quantity",
        F.when(
            F.col("n") > 1,
            F.round(F.col("n_less").cast("double") / (F.col("n") - 1), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("qn"),
    )


@register(
    "q_woe_encode",
    oracle="""
    WITH counts AS (
      SELECT o_orderpriority,
        COUNT(*) FILTER (WHERE o_orderstatus <> 'F') AS n_good,
        COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_bad
      FROM orders GROUP BY o_orderpriority
    ),
    tot AS (
      SELECT SUM(n_good) AS g_tot, SUM(n_bad) AS b_tot FROM counts
    )
    SELECT o_orderpriority AS category,
      CAST(n_good AS BIGINT) AS n_good, CAST(n_bad AS BIGINT) AS n_bad,
      CASE WHEN g_tot > 0 AND b_tot > 0 THEN
        round(ln(((n_good + 0.5) * b_tot) / ((n_bad + 0.5) * g_tot)), 6)
      END AS woe,
      CASE WHEN g_tot > 0 AND b_tot > 0 THEN
        round((CAST(n_good AS DOUBLE) / g_tot - CAST(n_bad AS DOUBLE) / b_tot)
          * round(ln(((n_good + 0.5) * b_tot) / ((n_bad + 0.5) * g_tot)), 6), 6)
      END AS iv_term
    FROM counts CROSS JOIN tot
    """,
)
def q_woe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHT-OF-EVIDENCE encoding + Information Value terms for a
    categorical feature against a binary target (credit-scoring's
    standard monotone encoding; Siddiqi 2006, public): WoE_i =
    ln(P(cat_i | good) / P(cat_i | bad)) with 0.5 Laplace smoothing so
    a one-sided category never yields ±inf, and IV_i = (g_i/G − b_i/B)
    · WoE_i — summing iv_term gives the feature's total IV, the
    classical feature-selection screen.

    Complements q_target_encoding_loo (per-row leakage-corrected mean)
    and q_one_hot_encode: WoE is the per-CATEGORY log-odds table a
    scorecard pipeline joins back onto the fact rows.

    Determinism: counts are exact integers; (n_good+0.5)·b_tot is an
    exact double (< 2^53), ONE division feeds ln, and the
    transcendental is rounded to 6dp before reuse (the
    q_time_decay_attribution policy); the iv_term product is rounded
    once more.  Scale: one hash aggregate to a |categories|-row table
    and a 1-row totals broadcast — nothing after the first shuffle is
    data-scaled."""
    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderpriority").agg(
        F.count(F.when(F.col("o_orderstatus") != "F", 1)).alias("n_good"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_bad"),
    )
    tot = counts.agg(
        F.sum("n_good").alias("g_tot"), F.sum("n_bad").alias("b_tot")
    )
    # an all-good or all-bad target zeroes a total: 0/0 is NULL in
    # Spark but NaN in DuckDB (non-ANSI division), so the degenerate
    # case is guarded to NULL on BOTH sides (the q_tokenizer_fertility
    # 0/0 precedent)
    ok = (F.col("g_tot") > 0) & (F.col("b_tot") > 0)
    woe = F.when(
        ok,
        F.round(
            F.log(
                ((F.col("n_good") + 0.5) * F.col("b_tot"))
                / ((F.col("n_bad") + 0.5) * F.col("g_tot"))
            ),
            6,
        ),
    )
    return counts.join(F.broadcast(tot)).select(
        F.col("o_orderpriority").alias("category"),
        F.col("n_good").cast("bigint").alias("n_good"),
        F.col("n_bad").cast("bigint").alias("n_bad"),
        woe.alias("woe"),
        F.when(
            ok,
            F.round(
                (
                    F.col("n_good").cast("double") / F.col("g_tot")
                    - F.col("n_bad").cast("double") / F.col("b_tot")
                )
                * woe,
                6,
            ),
        ).alias("iv_term"),
    )


# Count-min sketch geometry: 3 independent md5-derived hash rows of 256
# buckets.  Probe keys are the first 20 part keys — small enough that
# the exact truth join is cheap at any sf, large enough to exercise
# collisions (60k rows / 256 buckets ≈ 23 keys per cell at sf0.01).
_CMS_DEPTH = 3
_CMS_WIDTH = 256
_CMS_PROBE_MAX = 20


def _cms_bucket(depth: Column, key: Column) -> Column:
    """The CMS bucket hash: engine-portable md5-prefix int of
    "depth:key" mod width (one definition — the oracle fragment and
    the streaming twin must match it bit for bit)."""
    h = F.concat(depth.cast("string"), F.lit(":"), key.cast("string"))
    return md5_prefix_int(h) % _CMS_WIDTH


def cms_cells(df: DataFrame, key: str) -> DataFrame:
    """Build the depth×width CMS grid over ``df[key]`` — ONE hash
    aggregate whose map-side partials are themselves CMS grids (the
    merge operator is cell-wise sum).  Shared by q_count_min_sketch
    and the streaming maintenance twin
    (tests/test_stream_cms_round9.py), so the stream-equals-batch pin
    exercises THIS builder, not a copy."""
    depths = F.explode(
        F.array(*[F.lit(d) for d in range(_CMS_DEPTH)])
    ).alias("depth")
    return (
        df.select(F.col(key), depths)
        .select("depth", _cms_bucket(F.col("depth"), F.col(key)).alias("bucket"))
        .groupBy("depth", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "q_count_min_sketch",
    oracle=f"""
    WITH cells AS (
      SELECT d.d AS depth,
        {sql_md5_int("d.d || ':' || CAST(l_partkey AS VARCHAR)")}
          % {_CMS_WIDTH} AS bucket,
        COUNT(*) AS cnt
      FROM lineitem CROSS JOIN (SELECT unnest([0, 1, 2]) AS d) d
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT l_partkey, COUNT(*) AS true_cnt FROM lineitem
      WHERE l_partkey <= {_CMS_PROBE_MAX} GROUP BY l_partkey
    ),
    est AS (
      SELECT t.l_partkey, t.true_cnt, MIN(c.cnt) AS cms_est
      FROM truth t
      CROSS JOIN (SELECT unnest([0, 1, 2]) AS d) d
      JOIN cells c
        ON c.depth = d.d
       AND c.bucket = {sql_md5_int("d.d || ':' || CAST(t.l_partkey AS VARCHAR)")}
             % {_CMS_WIDTH}
      GROUP BY t.l_partkey, t.true_cnt
    )
    SELECT l_partkey, CAST(true_cnt AS BIGINT) AS true_cnt,
      CAST(cms_est AS BIGINT) AS cms_est,
      CAST(cms_est - true_cnt AS BIGINT) AS overestimate
    FROM est
    """,
)
def q_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT-MIN SKETCH frequency estimation (Cormode & Muthukrishnan
    2005, public): a 3×256 grid of counters where
    each key increments one md5-derived bucket per row, and a key's
    estimate is the MIN over its 3 cells — always ≥ the
    true count, within εN with high probability.  The sketch is the
    mergeable workhorse for frequency queries the exact q_heavy_hitters
    path can't afford at stream scale; `overestimate` exposes the
    collision error directly against the exact truth for the probe
    keys.

    Determinism: bucket = md5-prefix-int % width — the engine-portable
    hash (functions/portable_hash.py); every value is an exact integer
    count, no floats anywhere.  Scale/mergeability: the grid build is
    ONE hash aggregate whose map-side partial sketches ARE count-min
    sketches (cell-wise sum is the CMS merge operator — each task
    emits ≤ depth·width partials regardless of row count); everything
    downstream operates on the 768-cell grid and
    a probe-bounded truth table."""
    # spread the 1-column projection: the ×depth md5 bucket fan-out is
    # the heavy map work (r12, functions/parallelism.py); both the grid
    # and the truth table read the same exchange (ReusedExchange)
    li = spread(load_table(spark, sf_dir, "lineitem").select("l_partkey"))
    depths = F.explode(
        F.array(*[F.lit(d) for d in range(_CMS_DEPTH)])
    ).alias("depth")
    cells = cms_cells(li, "l_partkey")
    truth = (
        li.filter(F.col("l_partkey") <= _CMS_PROBE_MAX)
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
    )
    probes = truth.select("l_partkey", "true_cnt", depths).select(
        "l_partkey",
        "true_cnt",
        "depth",
        _cms_bucket(F.col("depth"), F.col("l_partkey")).alias("bucket"),
    )
    est = (
        probes.join(F.broadcast(cells), ["depth", "bucket"])
        .groupBy("l_partkey", "true_cnt")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return est.select(
        "l_partkey",
        F.col("true_cnt").cast("bigint").alias("true_cnt"),
        F.col("cms_est").cast("bigint").alias("cms_est"),
        (F.col("cms_est") - F.col("true_cnt")).cast("bigint").alias("overestimate"),
    )


# uniform-sample quantile sketch: K smallest md5-hash rows form the
# sample.  K is the sketch's bounded state; hash-order top-K is
# partition-independent, so per-partition top-K + merge (Spark's
# TakeOrdered) IS the sketch-merge operator.
_QSK_K = 2048


@register(
    "q_quantile_sample_sketch",
    oracle=f"""
    WITH sample AS (
      SELECT l_extendedprice AS v
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL
      ORDER BY {sql_md5_unit(
          "CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)"
      )}, l_orderkey, l_linenumber
      LIMIT {_QSK_K}
    ),
    est AS (
      SELECT round(quantile_cont(v, 0.5), 4) AS est_p50,
        round(quantile_cont(v, 0.9), 4) AS est_p90
      FROM sample
    ),
    exact AS (
      SELECT round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_p50,
        round(quantile_cont(l_extendedprice, 0.9), 4) AS exact_p90
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    )
    SELECT CAST({_QSK_K} AS BIGINT) AS k, est_p50, exact_p50,
      round(abs(est_p50 - exact_p50), 4) AS err_p50,
      est_p90, exact_p90,
      round(abs(est_p90 - exact_p90), 4) AS err_p90
    FROM est CROSS JOIN exact
    """,
)
def q_quantile_sample_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE QUANTILE SKETCH by deterministic uniform sampling:
    the K = 2048 rows with the smallest portable md5-hash form a
    uniform sample whose quantiles estimate the population's — the
    bounded-state companion to q_count_min_sketch for rank queries,
    and the deterministic stand-in for KLL/t-digest (whose merge
    states are engine-private and can never hash-match an oracle).

    Mergeability is STRUCTURAL: hash-order top-K is independent of
    partitioning, so Spark's TakeOrdered (per-partition top-K, then a
    K-bounded merge — exactly the sketch-merge operator) computes the
    identical sample on 1 or 1000 executors, and DuckDB's global
    ORDER-BY-LIMIT reproduces it bit-for-bit.  The (hash, orderkey,
    linenumber) sort key is a total order, so boundary ties cannot
    select different rows.

    Determinism: both engines interpolate quantiles with the shared
    (n−1)·p rule (the q_percentile precedent), rounded 4dp; the exact
    side uses the same path at oracle scale.  Scale: the sample pass
    ships K rows per partition max; the exact twin is here for the
    error columns (a production sketch would skip it)."""
    # spread the narrow projection: the per-row md5 sort key and the
    # exact-percentile partials are the heavy map work, and hash-order
    # top-K / percentile are partition-count-independent (r12)
    li = spread(
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_extendedprice").isNotNull())
        .select("l_extendedprice", "l_orderkey", "l_linenumber")
    )
    h = md5_unit(
        F.concat(
            F.col("l_orderkey").cast("string"),
            F.lit(":"),
            F.col("l_linenumber").cast("string"),
        )
    )
    sample = (
        li.select(F.col("l_extendedprice").alias("v"), h.alias("h"),
                  "l_orderkey", "l_linenumber")
        .orderBy("h", "l_orderkey", "l_linenumber")
        .limit(_QSK_K)
    )
    est = sample.agg(
        F.round(F.expr("percentile(v, 0.5)"), 4).alias("est_p50"),
        F.round(F.expr("percentile(v, 0.9)"), 4).alias("est_p90"),
    )
    exact = li.agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias(
            "exact_p50"
        ),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias(
            "exact_p90"
        ),
    )
    return est.join(F.broadcast(exact)).select(
        F.lit(_QSK_K).cast("bigint").alias("k"),
        "est_p50",
        "exact_p50",
        F.round(F.abs(F.col("est_p50") - F.col("exact_p50")), 4).alias(
            "err_p50"
        ),
        "est_p90",
        "exact_p90",
        F.round(F.abs(F.col("est_p90") - F.col("exact_p90")), 4).alias(
            "err_p90"
        ),
    )


@register(
    "q_ctr_shrinkage",
    oracle="""
    WITH li AS (
      SELECT part.p_brand, COUNT(*) AS n,
        COUNT(*) FILTER (WHERE l_returnflag = 'R') AS succ
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY part.p_brand
    ),
    rates AS (
      SELECT p_brand, n, succ,
        round(CAST(succ AS DOUBLE) / n, 12) AS r
      FROM li
    ),
    mom AS (
      SELECT
        CAST(SUM(CAST(r AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS mu,
        COUNT(*) AS k_items
      FROM rates
    ),
    var_ AS (
      SELECT mom.mu,
        CAST(SUM(CAST(round((r - mom.mu) * (r - mom.mu), 12)
                      AS DECIMAL(28,12))) AS DOUBLE) / mom.k_items AS v
      FROM rates CROSS JOIN mom GROUP BY mom.mu, mom.k_items
    ),
    prior AS (
      SELECT mu,
        CASE WHEN v > 0 AND mu * (1 - mu) / v - 1 > 0
             THEN round(mu * (1 - mu) / v - 1, 6) ELSE 1.0 END AS kk
      FROM var_
    )
    SELECT p_brand, CAST(n AS BIGINT) AS n, CAST(succ AS BIGINT) AS succ,
      round(CAST(succ AS DOUBLE) / n, 6) AS raw_rate,
      round((succ + prior.mu * prior.kk) / (n + prior.kk), 6)
        AS shrunk_rate
    FROM rates CROSS JOIN prior
    """,
)
def q_ctr_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMPIRICAL-BAYES rate shrinkage (beta-binomial,
    method-of-moments — Robbins 1956 tradition, public): per-brand
    return rates shrunk toward the cross-brand mean with a prior
    strength K = μ(1−μ)/v − 1 ESTIMATED FROM THE DATA — unlike
    q_target_encode's fixed smoothing constant, the shrinkage here is
    exactly as strong as the between-brand variance justifies (noisy
    small brands move a lot, precise big brands barely).  The CTR /
    return-rate / conversion-rate smoothing every ranking feature
    pipeline runs.

    Determinism: rates are int/int doubles rounded 12dp before the
    order-free DECIMAL(28,12) moment sums (12dp because squared
    deviations live at ~1e-4 — 6dp would zero them); K rounds 6dp
    with a positivity guard (v = 0 or underdispersion → K = 1);
    posterior means round 6dp once.

    Scale: one brand-keyed aggregate (the only data-scaled shuffle —
    the part join is dimension-side), then everything operates on the
    |brands|-row table with 1-row moment broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rates = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("succ"),
        )
        .select(
            "p_brand",
            "n",
            "succ",
            F.round(F.col("succ").cast("double") / F.col("n"), 12).alias("r"),
        )
    )
    mom = rates.agg(
        (
            F.sum(F.col("r").cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mu"),
        F.count(F.lit(1)).alias("k_items"),
    )
    var_ = (
        rates.join(F.broadcast(mom))
        .groupBy("mu", "k_items")
        .agg(
            (
                F.sum(
                    F.round(
                        (F.col("r") - F.col("mu"))
                        * (F.col("r") - F.col("mu")),
                        12,
                    ).cast("decimal(28,12)")
                ).cast("double")
                / F.col("k_items")
            ).alias("v")
        )
    )
    kk_raw = F.col("mu") * (1 - F.col("mu")) / F.col("v") - 1
    prior = var_.select(
        "mu",
        F.when((F.col("v") > 0) & (kk_raw > 0), F.round(kk_raw, 6))
        .otherwise(F.lit(1.0))
        .alias("kk"),
    )
    return rates.join(F.broadcast(prior)).select(
        "p_brand",
        F.col("n").cast("bigint").alias("n"),
        F.col("succ").cast("bigint").alias("succ"),
        F.round(F.col("succ").cast("double") / F.col("n"), 6).alias(
            "raw_rate"
        ),
        F.round(
            (F.col("succ") + F.col("mu") * F.col("kk"))
            / (F.col("n") + F.col("kk")),
            6,
        ).alias("shrunk_rate"),
    )


# Poisson(1) inverse-CDF cutoffs (cumulative e^{-1}·Σ 1/k!) — the
# deterministic per-(row, resample) weight draw of the POISSON
# BOOTSTRAP, the distributed bootstrap (each multinomial resample is
# approximated by independent Poisson(1) weights, so every resample is
# ONE pass with no coordination — the only bootstrap that scales).
# Literal doubles so both engines compare against identical values.
_POIS_CUM = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
    0.9999897508033253,
    0.999998874797402,
]
_BOOT_B = 100


def _r6(col: Column) -> Column:
    """Fixed-point HALF-UP 6dp round via floor(x*10^6 + 0.5)/10^6 — the
    q_seasonal_decompose trick: `round()` tie behavior on DOUBLE
    diverges between engines (measured: one bootstrap mean landed
    exactly on a 7th-decimal 5), while floor of the identical fp
    expression cannot."""
    return F.floor(col * 1000000 + F.lit(0.5)) / 1000000.0


def _sql_pois_weight(u: str) -> str:
    out = "CASE"
    for k, c in enumerate(_POIS_CUM):
        out += f" WHEN {u} < {c!r} THEN {k}"
    return out + f" ELSE {len(_POIS_CUM)} END"


@register(
    "q_poisson_bootstrap",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey, o_orderpriority,
        CAST(o_totalprice AS DECIMAL(12,2)) AS v
      FROM orders WHERE o_totalprice IS NOT NULL
    ),
    boot AS (
      SELECT o_orderpriority, b,
        floor(CAST(SUM(w * v) AS DOUBLE) / CAST(SUM(w) AS DOUBLE)
              * 1000000 + 0.5) / 1000000.0 AS m
      FROM (
        SELECT o_orderpriority, v, b,
          {_sql_pois_weight(sql_md5_unit(
              "CAST(o_orderkey AS VARCHAR) || ':' || CAST(b AS VARCHAR) || ':boot'"))} AS w
        FROM base CROSS JOIN (
          SELECT unnest(generate_series(1, {_BOOT_B})) AS b
        )
      )
      GROUP BY o_orderpriority, b
      HAVING SUM(w) > 0
    ),
    stats AS (
      SELECT o_orderpriority,
        list_reduce(list_prepend(CAST(0 AS DOUBLE), list_sort(list(m))),
                    (a, x) -> a + x) AS s1,
        list_reduce(list_prepend(CAST(0 AS DOUBLE),
                    list_transform(list_sort(list(m)), x -> x * x)),
                    (a, x) -> a + x) AS s2,
        COUNT(*) AS nb
      FROM boot GROUP BY o_orderpriority
    ),
    obs AS (
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
        floor(CAST(SUM(v) AS DOUBLE) / COUNT(*) * 1000000 + 0.5)
          / 1000000.0 AS mean_obs
      FROM base GROUP BY o_orderpriority
    ),
    ses AS (
      SELECT o_orderpriority,
        CASE WHEN nb > 1 THEN
          floor(sqrt((s2 - s1 * s1 / nb) / (nb - 1)) * 1000000 + 0.5)
            / 1000000.0
        END AS boot_se
      FROM stats
    )
    SELECT obs.o_orderpriority, n_orders, mean_obs, boot_se,
      floor((mean_obs - 1.96 * boot_se) * 1000000 + 0.5) / 1000000.0
        AS ci_lo,
      floor((mean_obs + 1.96 * boot_se) * 1000000 + 0.5) / 1000000.0
        AS ci_hi
    FROM obs JOIN ses USING (o_orderpriority)
    """,
)
def q_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POISSON-BOOTSTRAP confidence intervals for the mean order value
    per priority class — the distributed bootstrap (public: Kleiner et
    al.'s scalable-bootstrap line; Poisson weights approximate the
    multinomial resample so every resample is ONE data pass with no
    global coordination, the standard trick in large-scale metric
    pipelines).  B=100 resamples: each (row, b) draws a
    deterministic Poisson(1) weight by inverse-CDF over the portable
    md5-uniform, so the resample is reproducible across engines, runs
    and cluster sizes (the q_split_train_eval seeding policy).

    vs q_bootstrap_ci (operators/driftts.py): that one is the textbook
    Efron multinomial resample OVER THE BOUNDED DAY-SPINE (picks join a
    |days|-row frame — exact, but only possible because the resampled
    series is calendar-bounded).  This operator bootstraps the RAW
    ROWS, where the multinomial's "draw n indices per resample" cannot
    be materialized at 100 TB — the Poisson approximation is what makes
    row-level bootstrap a one-pass map-side computation.

    Determinism: per-resample means are exact DECIMAL sums over
    integer weights divided once as double (6dp); the bootstrap SE
    folds the B sorted means with identical fp operations on both
    engines (the q_embedding_centroids sorted-fold policy), so even
    the cancellation-prone Σm² − (Σm)²/B path is bit-identical.
    Normal-interval CI (±1.96·se) avoids cross-engine percentile
    semantics entirely; every 6dp round is the fixed-point floor form
    (_r6) because round() tie behavior on DOUBLE diverges between
    engines (measured on the NULL-measures fixture).

    Scale: the fan-out is linear in B — a map-side explode feeding a
    partial-aggregated (group, b) hash agg (≤ |groups|·B rows
    shuffled); the per-group fold touches B doubles.  No row-level
    state, no global sort: this is why the Poisson form (and not the
    sort-based multinomial) is the 100 TB bootstrap."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    )
    # spread BEFORE the ×B explode: the 15M-row md5 fan-out otherwise
    # inherits the scan's file-layout-bounded parallelism (r12
    # measured: 31.4 s on the single-row-group bench file vs 3.1 s
    # spread; the exchange moves only the narrow pre-fan-out rows)
    base = spread(
        o.select("o_orderkey", "o_orderpriority", dec("o_totalprice").alias("v"))
    )
    u = md5_unit(
        F.concat(
            F.col("o_orderkey").cast("string"),
            F.lit(":"),
            F.col("b").cast("string"),
            F.lit(":boot"),
        )
    )
    w = F.lit(len(_POIS_CUM))
    for k in range(len(_POIS_CUM) - 1, -1, -1):
        w = F.when(u < F.lit(_POIS_CUM[k]), F.lit(k)).otherwise(w)
    boot = (
        base.withColumn("b", F.explode(F.sequence(F.lit(1), F.lit(_BOOT_B))))
        .withColumn("w", w)
        .groupBy("o_orderpriority", "b")
        .agg(
            F.sum(F.col("w") * F.col("v")).alias("sv"),
            F.sum("w").alias("sw"),
        )
        .filter(F.col("sw") > 0)
        .select(
            "o_orderpriority",
            _r6(
                F.col("sv").cast("double") / F.col("sw").cast("double")
            ).alias("m"),
        )
    )
    stats = boot.groupBy("o_orderpriority").agg(
        F.array_sort(F.collect_list("m")).alias("ms"),
        F.count(F.lit(1)).alias("nb"),
    )
    s1 = F.aggregate("ms", F.lit(0.0), lambda a, x: a + x)
    s2 = F.aggregate(
        F.transform("ms", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )
    # degenerate fixture guard (ADVICE r10): a group where only one of
    # the B resamples drew positive total weight has nb=1 and the
    # sample-variance denominator (nb-1) is zero — report NULL SE/CI
    # instead of an ANSI divide-by-zero (oracle mirrors the CASE)
    se = F.when(
        F.col("nb") > 1,
        _r6(F.sqrt((s2 - s1 * s1 / F.col("nb")) / (F.col("nb") - 1))),
    )
    obs = base.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        _r6(F.sum("v").cast("double") / F.count(F.lit(1))).alias("mean_obs"),
    )
    return obs.join(stats, "o_orderpriority").select(
        "o_orderpriority",
        "n_orders",
        "mean_obs",
        se.alias("boot_se"),
        _r6(F.col("mean_obs") - 1.96 * se).alias("ci_lo"),
        _r6(F.col("mean_obs") + 1.96 * se).alias("ci_hi"),
    )


# ------------------------------------------------- weighted quantiles


@register(
    "q_weighted_quantile",
    oracle="""
    WITH w AS (
      SELECT l_returnflag AS flag,
        CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wt
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
        AND l_quantity > 0 AND l_returnflag IS NOT NULL
      GROUP BY l_returnflag, round(l_extendedprice * 100)
    ),
    cum AS (
      SELECT flag, cents, wt,
        SUM(wt) OVER (PARTITION BY flag ORDER BY cents) AS cw,
        SUM(wt) OVER (PARTITION BY flag) AS tw
      FROM w
    )
    SELECT flag AS l_returnflag,
      CAST(MIN(tw) AS BIGINT) AS total_weight,
      CAST(MIN(CASE WHEN 2 * cw >= tw + 1 THEN cents END) AS BIGINT)
        AS w_median_cents,
      CAST(MIN(CASE WHEN 10 * cw >= 9 * tw THEN cents END) AS BIGINT)
        AS w_p90_cents
    FROM cum GROUP BY flag
    """,
)
def q_weighted_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTITY-WEIGHTED price quantiles per return flag: the smallest
    price whose cumulative shipped quantity reaches 50% / 90% of the
    group's total — the "median price a unit actually sold at", which
    the unweighted q_percentile cannot answer when order sizes skew.

    Exactness: prices are cents integers, weights are integer
    quantities, and BOTH cut points compare in exact integer
    arithmetic (2·cw ≥ W+1 for the lower weighted median,
    10·cw ≥ 9·W for p90) — no float quantile interpolation, no
    boundary ulp.

    Scale: one (flag, cents) hash aggregate collapses the fact table
    to the value domain; the cumulative weight then runs per flag via
    ``functions.ids.running_total`` (range-partitioned parallel
    prefix sum — a plain per-flag window would put each flag's whole
    domain through ONE task; lineitem has 3 flags, so at 10^11 rows
    each window partition would be a third of the distinct-price
    domain); group totals broadcast back as a 3-row join.  The final
    threshold pick is one more bounded aggregate."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.ids import (
        running_total,
    )

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice").isNotNull()
        & F.col("l_quantity").isNotNull()
        & (F.col("l_quantity") > 0)
        & F.col("l_returnflag").isNotNull()
    )
    w = (
        # no spread here (r12 A/B: 3.2 → 3.9 s WITH it): the map side
        # is one cheap partial aggregate whose value is the ~4×
        # (flag, cents) domain reduction before the exchange — a
        # pre-shuffle rebalance just ships the unreduced rows
        li.select(
            F.col("l_returnflag").alias("flag"),
            F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
            F.col("l_quantity").cast("bigint").alias("q"),
        )
        .groupBy("flag", "cents")
        .agg(F.sum("q").alias("wt"))
    )
    cum = running_total(
        w, ["cents"], "wt", total_col="cw", group_cols=["flag"]
    )
    tot = w.groupBy("flag").agg(F.sum("wt").alias("tw"))
    joined = cum.join(F.broadcast(tot), "flag")
    return joined.groupBy(F.col("flag").alias("l_returnflag")).agg(
        F.min("tw").cast("bigint").alias("total_weight"),
        F.min(
            F.when(2 * F.col("cw") >= F.col("tw") + 1, F.col("cents"))
        )
        .cast("bigint")
        .alias("w_median_cents"),
        F.min(
            F.when(10 * F.col("cw") >= 9 * F.col("tw"), F.col("cents"))
        )
        .cast("bigint")
        .alias("w_p90_cents"),
    )
