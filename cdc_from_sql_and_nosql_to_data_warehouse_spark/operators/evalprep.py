"""Retrieval-evaluation and feature-prep operators (round 6).

The reference pipeline ends at the warehouse (Lambda handlers COPY/merge
into Redshift; /root/reference/lambda_functions/*, no evaluation code of
its own) — these operators cover the next stage a training-data platform
needs once the warehouse holds documents + embeddings: measuring the
retrieval stack it serves (NDCG, AUC, rank fusion) and preparing model
features from warehouse columns (one-hot, robust scaling, quantile
alignment, leakage-safe splits).

Engine-determinism policy (same as mlprep.py): cross-row float sums use
position-sorted folds or exact integer/DECIMAL arithmetic; transcendental
outputs (log2) are rounded to 6dp per-term BEFORE summation on both
engines; "randomness" is md5-derived.  Windows only ever run over
aggregates whose row count is bounded by a domain (distinct scores,
distinct lengths, calendar days), never over fact rows — the Gini
pattern from SCALE.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions import vectors as V
from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.exact import dec
from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.ids import (
    assign_dense_ids,
)
from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.portable_hash import (
    SQL_TOKS_EXPR,
    md5_unit,
    sql_md5_unit,
)
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import register
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
def q_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    divided by.  Honest caveat shared with q_percentile: Spark's exact
    `percentile` buffers each group's values in the aggregation state,
    so at true 100 TB group sizes the stats pass swaps to
    `approx_percentile` (t-digest state, same plan shape) — exact form
    kept here because the DuckDB oracle checks exact interpolation."""
    li = load_table(spark, sf_dir, "lineitem")
    stats = li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("med"),
        (
            F.round(F.expr("percentile(l_extendedprice, 0.75)"), 4)
            - F.round(F.expr("percentile(l_extendedprice, 0.25)"), 4)
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
_SQL_DOT = """
  list_reduce(
    list_prepend(CAST(0 AS DOUBLE),
      list_transform(generate_series(1, length({a})),
        i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))),
    (x, y) -> x + y)
"""


def _sql_cos(a: str, b: str) -> str:
    return (
        f"(({_SQL_DOT.format(a=a, b=b)}) / "
        f"(sqrt({_SQL_DOT.format(a=a, b=a)}) * sqrt({_SQL_DOT.format(a=b, b=b)})))"
    )


_NDCG_Q = 20  # query set: vec_id < 20
_NDCG_K = 10


@register(
    "q_retrieval_ndcg",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS qid, embedding AS qe, label AS ql
      FROM embeddings WHERE vec_id < {_NDCG_Q}
    ),
    s AS (
      SELECT qid, c.vec_id AS cid,
        CASE WHEN c.label = ql THEN 1.0 ELSE 0.0 END AS rel,
        {_sql_cos("qe", "c.embedding")} AS cos
      FROM q JOIN embeddings c ON c.vec_id <> qid
    ),
    r AS (
      SELECT qid, rel, cos,
        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
      FROM s
    )
    SELECT qid AS query_id,
      CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
      round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        list(round(rel / log2(rnk + 1.0), 6) ORDER BY rnk)
          FILTER (rnk <= {_NDCG_K})), (a, b) -> a + b), 6) AS dcg,
      round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        list_transform(
          generate_series(1, least({_NDCG_K},
            CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT))),
          i -> round(1.0 / log2(i + 1.0), 6))), (a, b) -> a + b), 6) AS idcg,
      CASE WHEN SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) > 0 THEN
        round(
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list(round(rel / log2(rnk + 1.0), 6) ORDER BY rnk)
              FILTER (rnk <= {_NDCG_K})), (a, b) -> a + b)
          / list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list_transform(
                generate_series(1, least({_NDCG_K},
                  CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT))),
                i -> round(1.0 / log2(i + 1.0), 6))), (a, b) -> a + b), 6)
      ELSE 0.0 END AS ndcg
    FROM r GROUP BY qid
    """,
)
def q_retrieval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the exact-cosine retriever against label-match
    relevance — the ranking-quality metric for the embedding index the
    warehouse serves (binary gains; ideal DCG from the query's true
    positive count).  q_sim_topk ships the ranking; this measures it.

    Determinism: each per-position contribution rel/log2(rank+1) is
    rounded to 6dp BEFORE summation (log2 is libm-dependent in its
    last ulp across engines — the BM25 precedent), and both DCG and
    ideal-DCG accumulate via rank-ordered folds, so the quotient is
    engine-identical.  The `sequence(1, least(10, n_pos))` is guarded
    on n_pos >= 1: Spark's sequence(1, 0) yields DESCENDING [1, 0]
    (measured round-2 gotcha), not an empty list.

    Scale: the query set is bounded (broadcast); candidate scoring is
    an embarrassingly parallel broadcast-nested-loop scan; the ranking
    window partitions per query.  The per-query fold state is ≤ K
    structs collected under a `rank <= K` filter — never the full
    candidate list."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _NDCG_Q).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("label").alias("ql"),
        V.norm2("embedding").alias("qn"),
    )
    c = emb.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        F.col("label").alias("cl"),
        V.norm2("embedding").alias("cn"),
    )
    scored = c.join(F.broadcast(q), F.col("cid") != F.col("qid")).select(
        "qid",
        "cid",
        F.when(F.col("cl") == F.col("ql"), 1.0).otherwise(0.0).alias("rel"),
        (V.dot("qe", "ce") / (F.col("qn") * F.col("cn"))).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid"))
    ranked = scored.withColumn("rnk", F.row_number().over(w))
    contrib = F.round(F.col("rel") / F.log2(F.col("rnk") + 1.0), 6)
    per_q = ranked.groupBy("qid").agg(
        F.sum(F.when(F.col("rel") > 0, 1).otherwise(0)).alias("n_pos"),
        F.array_sort(
            F.collect_list(
                F.when(F.col("rnk") <= _NDCG_K, F.struct("rnk", contrib.alias("c")))
            )
        ).alias("top"),
    )
    fold = lambda arr: F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)  # noqa: E731
    dcg = fold(F.transform(F.col("top"), lambda s: s["c"]))
    idcg = F.when(
        F.col("n_pos") >= 1,
        fold(
            F.transform(
                F.sequence(F.lit(1), F.least(F.lit(_NDCG_K), F.col("n_pos"))),
                lambda i: F.round(F.lit(1.0) / F.log2(i.cast("double") + 1.0), 6),
            )
        ),
    ).otherwise(0.0)
    return per_q.select(
        F.col("qid").alias("query_id"),
        F.col("n_pos").cast("bigint").alias("n_pos"),
        F.round(dcg, 6).alias("dcg"),
        F.round(idcg, 6).alias("idcg"),
        F.when(F.col("n_pos") > 0, F.round(dcg / idcg, 6)).otherwise(0.0).alias("ndcg"),
    )


@register(
    "q_retrieval_auc",
    oracle=f"""
    WITH a AS (
      SELECT embedding AS ae, label AS al FROM embeddings WHERE vec_id = 0
    ),
    s AS (
      SELECT round({_sql_cos("ae", "c.embedding")}, 6) AS score,
        CASE WHEN c.label = al THEN 1 ELSE 0 END AS y
      FROM embeddings c CROSS JOIN a WHERE c.vec_id <> 0
    ),
    g AS (
      SELECT score, CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(y) AS BIGINT) AS pos
      FROM s GROUP BY score
    ),
    r AS (
      SELECT pos, cnt,
        CAST(COALESCE(SUM(cnt) OVER (ORDER BY score
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_lt
      FROM g
    )
    SELECT
      CAST(SUM(pos) AS BIGINT) AS n_pos,
      CAST(SUM(cnt) - SUM(pos) AS BIGINT) AS n_neg,
      CAST(SUM(CAST(pos AS HUGEINT) * (2 * cum_lt + cnt + 1))
           - CAST(SUM(pos) AS HUGEINT) * (SUM(pos) + 1) AS DOUBLE)
        / (2.0 * CAST(SUM(pos) AS DOUBLE)
           * CAST(SUM(cnt) - SUM(pos) AS DOUBLE)) AS auc
    FROM r
    """,
)
def q_retrieval_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of cosine-to-anchor as a classifier score for "shares
    the anchor's label" — the Mann-Whitney rank form with proper tied-
    score handling (average ranks), the standard eval for an embedding
    space's class separation.

    Exactness: scores are rounded to 6dp to give both engines identical
    tie groups, then EVERYTHING up to the final division is integer —
    doubled average ranks make the tie midpoint (r + (cnt+1)/2) exact:
    S2 = Σ_pos (2·cum_lt + cnt + 1), AUC = (S2 − P(P+1)) / (2PN).  No
    float accumulates across rows, so no rounding tolerance is needed
    on the output.

    Scale: one hash aggregate collapses N rows to the distinct-score
    table; the cumulative count over score order runs through
    `running_total` (functions/ids.py — range-partitioned parallel
    prefix sum), NOT a single-task global window; the finale is a
    1-row aggregate."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.ids import (
        running_total,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("ae"),
        F.col("label").alias("al"),
        V.norm2("embedding").alias("an"),
    )
    scored = emb.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(a)).select(
        F.round(
            V.dot("ae", "embedding") / (F.col("an") * V.norm2("embedding")), 6
        ).alias("score"),
        F.when(F.col("label") == F.col("al"), 1).otherwise(0).alias("y"),
    )
    g = scored.groupBy("score").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("pos")
    )
    r = running_total(g, ["score"], "cnt", total_col="cum_incl")
    r = r.withColumn("cum_lt", F.col("cum_incl") - F.col("cnt"))
    # the rank products run in DECIMAL/HUGEINT: with ~3e9+ candidates
    # pos·(2·cum_lt+cnt+1) exceeds int64, where Spark (non-ANSI) would
    # wrap silently and DuckDB would raise — the q_ks_test precedent
    s2 = F.sum(
        F.col("pos").cast("decimal(19,0)")
        * (2 * F.col("cum_lt") + F.col("cnt") + 1).cast("decimal(19,0)")
    )
    p_sq = F.sum("pos").cast("decimal(19,0)") * (F.sum("pos") + 1).cast(
        "decimal(19,0)"
    )
    return r.agg(
        F.sum("pos").cast("bigint").alias("n_pos"),
        (F.sum("cnt") - F.sum("pos")).cast("bigint").alias("n_neg"),
        (
            (s2 - p_sq).cast("double")
            / (
                F.lit(2.0)
                * F.sum("pos").cast("double")
                * (F.sum("cnt") - F.sum("pos")).cast("double")
            )
        ).alias("auc"),
    )


_RRF_K = 60  # standard reciprocal-rank-fusion constant (Cormack et al. 2009)


@register(
    "q_hybrid_rrf",
    oracle=f"""
    WITH dt AS (
      SELECT doc_id, list_distinct({SQL_TOKS_EXPR}) AS toks
      FROM documents WHERE text IS NOT NULL
    ),
    cand AS (
      SELECT e.vec_id AS cid, e.embedding AS ce, dt.toks AS ct
      FROM embeddings e JOIN dt ON dt.doc_id = e.vec_id
    ),
    q AS (
      SELECT e.vec_id AS qid, e.embedding AS qe, dt.toks AS qt
      FROM embeddings e JOIN dt ON dt.doc_id = e.vec_id
      WHERE e.vec_id < 5
    ),
    s AS (
      SELECT qid, cid,
        {_sql_cos("qe", "ce")} AS cos,
        CASE WHEN length(list_distinct(list_concat(qt, ct))) > 0 THEN
          CAST(length(list_intersect(qt, ct)) AS DOUBLE)
            / CAST(length(list_distinct(list_concat(qt, ct))) AS DOUBLE)
        ELSE 0.0 END AS jac
      FROM cand JOIN q ON cid <> qid
    ),
    rr AS (
      SELECT qid, cid,
        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rv,
        row_number() OVER (PARTITION BY qid ORDER BY jac DESC, cid) AS rl
      FROM s
    ),
    f AS (
      SELECT qid AS query_id, cid AS cand_id,
        1.0 / ({_RRF_K} + rv) + 1.0 / ({_RRF_K} + rl) AS rrf
      FROM rr
    )
    SELECT query_id, cand_id, rrf, CAST(rnk AS BIGINT) AS rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY rrf DESC, cand_id) AS rnk
      FROM f
    ) WHERE rnk <= 10
    """,
)
def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion (RRF, Cormack et al.
    2009, public): fuse a dense ranking (embedding cosine) with a
    lexical ranking (distinct-token Jaccard against the query
    document) as Σ 1/(60+rank) and return the top-10 per query — the
    RAG-stack hybrid-search shape, using the testdata's aligned
    doc_id == vec_id identity.

    Determinism: ranks are integers (cosine/Jaccard order with cand-id
    tie-breaks); the fused score is one fixed two-term expression of
    exact rank reciprocals — bit-identical with no rounding.  Jaccard
    is a ratio of integer set sizes; empty-union pairs score 0 rather
    than dividing by zero.

    Scale: the query side is bounded and broadcast; both rankings are
    per-query windows (same shape as q_sim_topk); token sets travel
    pre-distincted so the join carries no duplicate tokens.  At real
    scale the lexical arm would come from the BM25 inverted list
    (q_bm25_search) — Jaccard keeps the oracle twin exact here."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.text import tokens

    dt = docs.select(
        "doc_id", F.array_distinct(tokens("text")).alias("toks")
    )
    emb = load_table(spark, sf_dir, "embeddings")
    cand = emb.join(dt, emb["vec_id"] == dt["doc_id"]).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        F.col("toks").alias("ct"),
        V.norm2("embedding").alias("cn"),
    )
    q = (
        emb.filter(F.col("vec_id") < 5)
        .join(dt, emb["vec_id"] == dt["doc_id"])
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qe"),
            F.col("toks").alias("qt"),
            V.norm2("embedding").alias("qn"),
        )
    )
    union_sz = F.size(F.array_union(F.col("qt"), F.col("ct")))
    s = cand.join(F.broadcast(q), F.col("cid") != F.col("qid")).select(
        "qid",
        "cid",
        (V.dot("qe", "ce") / (F.col("qn") * F.col("cn"))).alias("cos"),
        F.when(
            union_sz > 0,
            F.size(F.array_intersect(F.col("qt"), F.col("ct"))).cast("double")
            / union_sz.cast("double"),
        )
        .otherwise(0.0)
        .alias("jac"),
    )
    wv = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid"))
    wl = Window.partitionBy("qid").orderBy(F.col("jac").desc(), F.col("cid"))
    fused = (
        s.withColumn("rv", F.row_number().over(wv))
        .withColumn("rl", F.row_number().over(wl))
        .select(
            F.col("qid").alias("query_id"),
            F.col("cid").alias("cand_id"),
            (
                F.lit(1.0) / (F.lit(_RRF_K) + F.col("rv"))
                + F.lit(1.0) / (F.lit(_RRF_K) + F.col("rl"))
            ).alias("rrf"),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(F.col("rrf").desc(), F.col("cand_id"))
    return (
        fused.withColumn("rank", F.row_number().over(wf).cast("bigint"))
        .filter(F.col("rank") <= 10)
    )


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


_SAX_SEGMENTS = 16
# Gaussian breakpoints for a 4-letter SAX alphabet (Lin et al. 2003,
# public): P(z < -0.6745) = P(z > 0.6745) = 0.25
_SAX_BP = 0.6745


@register(
    "q_sax_encode",
    oracle=f"""
    WITH daily AS (
      SELECT o_orderdate AS d,
        CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DECIMAL(18,0))
          AS cents
      FROM orders WHERE o_orderdate IS NOT NULL GROUP BY o_orderdate
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(cents) AS DOUBLE) AS sx,
        CAST(SUM(cents * cents) AS DOUBLE) AS sxx
      FROM daily
    ),
    idx AS (
      SELECT d, cents, row_number() OVER (ORDER BY d) AS day_idx FROM daily
    ),
    seg AS (
      SELECT (({_SAX_SEGMENTS} * (day_idx - 1)) // (SELECT n FROM stats)) AS seg,
        CAST(COUNT(*) AS BIGINT) AS n_days,
        CAST(SUM(cents) AS DOUBLE) AS seg_cents
      FROM idx GROUP BY 1
    )
    SELECT seg, n_days,
      round((seg_cents / n_days - sx / n)
        / sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS seg_z,
      CASE
        WHEN (seg_cents / n_days - sx / n)
             / sqrt((sxx - sx * sx / n) / (n - 1)) < -{_SAX_BP} THEN 'a'
        WHEN (seg_cents / n_days - sx / n)
             / sqrt((sxx - sx * sx / n) / (n - 1)) < 0 THEN 'b'
        WHEN (seg_cents / n_days - sx / n)
             / sqrt((sxx - sx * sx / n) / (n - 1)) < {_SAX_BP} THEN 'c'
        ELSE 'd' END AS symbol
    FROM seg CROSS JOIN stats
    """,
)
def q_sax_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolic encoding of the daily-revenue series (Lin et al.
    2003, public): z-normalize the series, piecewise-aggregate into 16
    segments (PAA), then map each segment mean to a 4-letter alphabet
    at the Gaussian quartile breakpoints ±0.6745 — the compact motif
    representation time-series search/anomaly pipelines index.

    Determinism: daily revenue is exact integer cents; the global
    mean/std come from exact Σx/Σx² (cents fit DECIMAL(18), squares
    DECIMAL(36)) lowered to double in ONE fixed expression, and each
    segment mean is an exact-integer ratio — so z values are bitwise
    engine-identical and the breakpoint CASE can never straddle
    engines.  Output z rounded to 6dp for display only.

    Scale: one hash aggregate to the per-day series (calendar-bounded
    — the Gini pattern), a row_number window over those bounded rows,
    a 16-group aggregate, and two 1-row broadcast cross joins.  Fact
    rows are touched exactly once."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(cents).cast("decimal(18,0)").alias("cents")
    )
    stats = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").cast("double").alias("sx"),
        F.sum(F.col("cents") * F.col("cents")).cast("double").alias("sxx"),
    )
    idx = daily.withColumn(
        "day_idx", F.row_number().over(Window.orderBy("d"))
    )
    seg = (
        idx.crossJoin(F.broadcast(stats.select("n")))
        .withColumn(
            "seg", F.expr(f"({_SAX_SEGMENTS} * (day_idx - 1)) DIV n")
        )
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("cents").cast("double").alias("seg_cents"),
        )
    )
    z = (F.col("seg_cents") / F.col("n_days") - F.col("sx") / F.col("n")) / F.sqrt(
        (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1)
    )
    return seg.crossJoin(F.broadcast(stats)).select(
        "seg",
        "n_days",
        F.round(z, 6).alias("seg_z"),
        F.when(z < -_SAX_BP, "a")
        .when(z < 0, "b")
        .when(z < _SAX_BP, "c")
        .otherwise("d")
        .alias("symbol"),
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
    iu0, iu1 = [list(x) for x in __import__("numpy").triu_indices(dim)]

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


_DE_SAMPLE = 300  # dedup-eval audit sample: doc_id < 300
_DE_BANDS = 4
_DE_ROWS = 2  # same banding as q_dedup_minhash_md5


def _sql_dedup_eval() -> str:
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.dedup import (
        _sql_band_keys,
    )
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.portable_hash import (
        SQL_TOKS_EXPR,
        sql_md5_int,
    )

    return f"""
    WITH smp AS (
      SELECT doc_id, text FROM documents WHERE doc_id < {_DE_SAMPLE}
    ),
    sh AS (
      SELECT doc_id,
        list_distinct(list_transform(
          list_transform(
            generate_series(1, greatest(length(toks) - 2, 0)),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]),
          s -> {sql_md5_int('s')})) AS shingles
      FROM (SELECT doc_id, {SQL_TOKS_EXPR} AS toks FROM smp)
    ),
    shn AS (SELECT * FROM sh WHERE length(shingles) > 0),
    {_sql_band_keys(n_bands=_DE_BANDS, rows_per_band=_DE_ROWS)},
    truth AS (
      SELECT a.doc_id AS a, b.doc_id AS b
      FROM shn a JOIN shn b ON a.doc_id < b.doc_id
      WHERE length(list_intersect(a.shingles, b.shingles)) * 4
            >= length(list_distinct(list_concat(a.shingles, b.shingles)))
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
      FROM bk a JOIN bk b ON a.band = b.band AND a.key = b.key
                         AND a.doc_id < b.doc_id
    ),
    m AS (
      SELECT
        (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_candidates,
        (SELECT CAST(COUNT(*) AS BIGINT)
         FROM cand JOIN truth USING (a, b)) AS tp
    )
    SELECT n_truth, n_candidates, tp,
      CASE WHEN n_candidates > 0
        THEN CAST(tp AS DOUBLE) / n_candidates ELSE 0.0 END AS precision,
      CASE WHEN n_truth > 0
        THEN CAST(tp AS DOUBLE) / n_truth ELSE 0.0 END AS recall
    FROM m
    """


@register("q_dedup_eval", oracle=_sql_dedup_eval())
def q_dedup_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-estimator quality audit: precision/recall of the MinHash
    band candidates (the production q_dedup_minhash_md5 banding — 4
    bands × 2 rows) against exhaustive-pair ground truth at Jaccard ≥
    1/4, on a bounded audit sample (doc_id < 300).  This is the
    measurement a pipeline owner runs before trusting a banding
    config: recall says what fraction of true near-dups the buckets
    can ever surface; precision says how much verify work is wasted.

    The all-pairs ground truth is O(sample²) BY DESIGN and therefore
    runs on the bounded sample only — the production path stays the
    banded join; the audit's cost is sample-bounded regardless of
    corpus size (the same sample-audit shape as q_sim_topk's
    broadcast-bounded query set).  Everything is engine-portable
    integer arithmetic on md5-derived shingle ids (the dedup.py
    machinery), so even the bucket CONTENTS are oracle-checked, and
    the Jaccard threshold compares via integer cross-multiplication."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.dedup import (
        _md5_band_keys,
        md5_shingle_rows,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _DE_SAMPLE
    )
    ex = md5_shingle_rows(docs, 3).localCheckpoint(eager=False)
    sh = ex.groupBy("id").agg(F.collect_set("h").alias("shingles"))
    a = sh.select(F.col("id").alias("a"), F.col("shingles").alias("sa"))
    b = sh.select(F.col("id").alias("b"), F.col("shingles").alias("sb"))
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    union = F.size(F.array_union(F.col("sa"), F.col("sb")))
    truth = (
        a.join(b, F.col("a") < F.col("b"))
        .filter(inter * 4 >= union)
        .select("a", "b")
    )
    bk = _md5_band_keys(ex, n_bands=_DE_BANDS, rows_per_band=_DE_ROWS)
    ka = bk.select(F.col("id").alias("a"), "band", "key")
    kb = bk.select(F.col("id").alias("b"), "band", "key")
    cand = (
        ka.join(kb, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    tp = cand.join(truth, ["a", "b"])
    counts = (
        truth.agg(F.count(F.lit(1)).alias("n_truth"))
        .crossJoin(cand.agg(F.count(F.lit(1)).alias("n_candidates")))
        .crossJoin(tp.agg(F.count(F.lit(1)).alias("tp")))
    )
    return counts.select(
        "n_truth",
        "n_candidates",
        "tp",
        F.when(
            F.col("n_candidates") > 0,
            F.col("tp").cast("double") / F.col("n_candidates"),
        )
        .otherwise(0.0)
        .alias("precision"),
        F.when(F.col("n_truth") > 0, F.col("tp").cast("double") / F.col("n_truth"))
        .otherwise(0.0)
        .alias("recall"),
    )


_MMR_LAMBDA = 0.7
_MMR_SHORTLIST = 20
_MMR_K = 5


@register("q_mmr_diversify")  # rows-only: greedy selection is iterative
def q_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance diversification (Carbonell &
    Goldstein 1998, public): per query, greedily pick 5 of the top-20
    cosine shortlist maximizing λ·sim(q,c) − (1−λ)·max sim(c,
    selected) — the result-diversification pass a retrieval stack runs
    so near-duplicate hits don't crowd the context window.

    Scale shape: relevance shortlists come from the distributed
    exact-cosine ranking (per-query window, the q_sim_topk plan); the
    inherently SEQUENTIAL greedy step runs in an `applyInPandas`
    kernel per query group, whose input is capped at shortlist
    size × dim — bounded work per group no matter the corpus, and
    queries parallelize across groups.  Registered rows-only (greedy
    selection has no SQL twin); tests/test_evalprep.py pins that
    diversification strictly reduces intra-list similarity vs the
    plain top-5 and keeps the top-1 hit."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        V.norm2("embedding").alias("q_norm"),
    )
    c = emb.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_emb"),
        V.norm2("embedding").alias("c_norm"),
    )
    scored = c.join(F.broadcast(q), F.col("cand_id") != F.col("query_id")).select(
        "query_id",
        "cand_id",
        "c_emb",
        (V.dot("q_emb", "c_emb") / (F.col("q_norm") * F.col("c_norm"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id")
    )
    short = scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= _MMR_SHORTLIST
    )

    def mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rnk").reset_index(drop=True)
        X = np.stack(pdf["c_emb"].to_numpy()).astype(np.float64)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        sims = Xn @ Xn.T  # shortlist × shortlist — bounded
        rel = pdf["cosine"].to_numpy()
        selected: list[int] = []
        rest = list(range(len(pdf)))
        while rest and len(selected) < _MMR_K:
            if selected:
                penalty = sims[np.ix_(rest, selected)].max(axis=1)
            else:
                penalty = np.zeros(len(rest))
            score = _MMR_LAMBDA * rel[rest] - (1 - _MMR_LAMBDA) * penalty
            # deterministic tie-break: higher score, then earlier rank
            best = max(range(len(rest)), key=lambda i: (score[i], -rest[i]))
            selected.append(rest.pop(best))
        out = pdf.iloc[selected][["query_id", "cand_id", "cosine"]].copy()
        out["mmr_rank"] = range(1, len(selected) + 1)
        return out

    return short.groupBy("query_id").applyInPandas(
        mmr,
        "query_id long, cand_id long, cosine double, mmr_rank int",
    )


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
    c = emb.filter(F.col("vec_id") >= _CM_EVAL).select(
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
      (CAST(n_pos AS DOUBLE) * CAST(nn AS DOUBLE))
        / (CAST(n AS DOUBLE) * CAST(pp AS DOUBLE)) AS lift,
      CAST(CAST(SUM(n_pos) OVER (ORDER BY decile
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS DOUBLE)
        / pp AS cum_gain
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
            # make the doubles exact
            (
                (F.col("n_pos").cast("double") * F.col("nn").cast("double"))
                / (F.col("n").cast("double") * F.col("pp").cast("double"))
            ).alias("lift"),
            (F.col("cum_pos").cast("double") / F.col("pp")).alias("cum_gain"),
        )
    )


_FS_EPOCH = "1992-01-01"
_FS_LO, _FS_HI = "1997-01-01", "1997-04-01"


@register(
    "q_file_skipping_stats",
    oracle=f"""
    WITH rows_ AS (
      SELECT CAST(l_shipdate AS DATE) AS d, l_orderkey FROM lineitem
      WHERE l_shipdate IS NOT NULL AND l_orderkey IS NOT NULL
    ),
    laid AS (
      SELECT 'by_orderkey' AS layout, l_orderkey // 256 AS file_id, d FROM rows_
      UNION ALL
      SELECT 'by_shipdate' AS layout,
        CAST(date_diff('day', DATE '{_FS_EPOCH}', d) AS BIGINT) // 30 AS file_id, d
      FROM rows_
    ),
    files AS (
      SELECT layout, file_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
        min(d) AS min_d, max(d) AS max_d,
        CAST(SUM(CASE WHEN d >= DATE '{_FS_LO}' AND d < DATE '{_FS_HI}'
                      THEN 1 ELSE 0 END) AS BIGINT) AS matched
      FROM laid GROUP BY layout, file_id
    )
    SELECT layout,
      CAST(COUNT(*) AS BIGINT) AS n_files,
      CAST(SUM(CASE WHEN max_d < DATE '{_FS_LO}' OR min_d >= DATE '{_FS_HI}'
                    THEN 1 ELSE 0 END) AS BIGINT) AS files_skipped,
      CAST(SUM(CASE WHEN max_d < DATE '{_FS_LO}' OR min_d >= DATE '{_FS_HI}'
                    THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS skip_fraction,
      CAST(SUM(CASE WHEN max_d < DATE '{_FS_LO}' OR min_d >= DATE '{_FS_HI}'
                    THEN 0 ELSE n_rows END) AS BIGINT) AS rows_scanned,
      CAST(SUM(matched) AS BIGINT) AS rows_matched
    FROM files GROUP BY layout
    """,
)
def q_file_skipping_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (min/max) file-skipping audit under two physical
    layouts: cluster-by-orderkey vs cluster-by-shipdate, for a
    3-month shipdate predicate.  Per layout: how many files a min/max
    zone map lets the scan SKIP entirely, and how many rows the
    surviving files force it to read vs the rows that actually match —
    the quantified motivation for q_zorder_layout/q_compaction_plan
    (layout.py): the same table, the same predicate, ~0% skipping
    under key order vs ~95% under date order.

    Scale: files are modeled as fixed-width key ranges (what a sorted
    write produces); the audit is one scan exploded ×2 layouts, one
    hash aggregate per (layout, file), and a bounded per-layout
    rollup.  This is exactly the stats pass a table-format maintenance
    job (Iceberg/Delta file stats) runs, so its cost profile IS the
    production profile."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").isNotNull() & F.col("l_orderkey").isNotNull()
    )
    d = F.col("l_shipdate").cast("date")
    rows = li.select(
        d.alias("d"),
        F.explode(
            F.array(
                F.struct(
                    F.lit("by_orderkey").alias("layout"),
                    F.expr("l_orderkey DIV 256").alias("file_id"),
                ),
                F.struct(
                    F.lit("by_shipdate").alias("layout"),
                    F.expr(
                        f"CAST(datediff(CAST(l_shipdate AS DATE), "
                        f"DATE'{_FS_EPOCH}') AS BIGINT) DIV 30"
                    ).alias("file_id"),
                ),
            )
        ).alias("lf"),
    ).select("d", "lf.layout", "lf.file_id")
    lo, hi = F.lit(_FS_LO).cast("date"), F.lit(_FS_HI).cast("date")
    files = rows.groupBy("layout", "file_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("d").alias("min_d"),
        F.max("d").alias("max_d"),
        F.sum(
            F.when((F.col("d") >= lo) & (F.col("d") < hi), 1).otherwise(0)
        ).alias("matched"),
    )
    skipped = (F.col("max_d") < lo) | (F.col("min_d") >= hi)
    return files.groupBy("layout").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(F.when(skipped, 1).otherwise(0)).cast("bigint").alias("files_skipped"),
        (
            F.sum(F.when(skipped, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("skip_fraction"),
        F.sum(F.when(skipped, 0).otherwise(F.col("n_rows")))
        .cast("bigint")
        .alias("rows_scanned"),
        F.sum("matched").cast("bigint").alias("rows_matched"),
    )


@register(
    "q_ks_test",
    oracle="""
    WITH d AS (
      SELECT n_chars,
        TRY_CAST(substr(source, 4) AS INTEGER) >= 10 AS is_new
      FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL
    ),
    g AS (
      SELECT n_chars,
        CAST(COUNT(*) FILTER (WHERE NOT is_new) AS BIGINT) AS c_base,
        CAST(COUNT(*) FILTER (WHERE is_new) AS BIGINT) AS c_new
      FROM d GROUP BY n_chars
    ),
    r AS (
      SELECT
        CAST(SUM(c_base) OVER (ORDER BY n_chars
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT) AS cum_b,
        CAST(SUM(c_new) OVER (ORDER BY n_chars
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT) AS cum_n,
        CAST(SUM(c_base) OVER () AS HUGEINT) AS t_base,
        CAST(SUM(c_new) OVER () AS HUGEINT) AS t_new
      FROM g
    )
    ,
    s AS (
      SELECT
        CAST(max(t_base) AS BIGINT) AS n_base,
        CAST(max(t_new) AS BIGINT) AS n_new,
        CAST(max(abs(cum_b * t_new - cum_n * t_base)) AS DOUBLE)
          / (CAST(max(t_base) AS DOUBLE) * CAST(max(t_new) AS DOUBLE)) AS d_stat,
        1.358 * sqrt((CAST(max(t_base) AS DOUBLE) + CAST(max(t_new) AS DOUBLE))
          / (CAST(max(t_base) AS DOUBLE) * CAST(max(t_new) AS DOUBLE)))
          AS crit_05
      FROM r
    )
    SELECT n_base, n_new, d_stat, crit_05, d_stat > crit_05 AS drift FROM s
    """,
)
def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test on the document-length
    distribution, base corpus (src0-9) vs incoming batch (src10+) —
    the nonparametric sibling of q_feature_drift's PSI: PSI needs a
    binning choice; KS compares the full empirical CDFs and reports
    the worst-case gap D = max|F_base(x) − F_new(x)| with the α=0.05
    critical value 1.358·√((n₁+n₂)/(n₁n₂)).

    Exactness: the max deviation is computed on INTEGER cross-products
    — |cum_b·N_new − cum_n·N_base| in DECIMAL/HUGEINT (bigint·bigint
    overflows int64 at warehouse scale) — so the maximizing point is
    engine-identical; only the final two divisions are float, in one
    fixed expression.

    Scale: one hash aggregate to the distinct-length frame (bounded by
    the length domain), two parallel prefix sums through
    `running_total`, a 1-row reduce.  No fact row is touched twice."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.ids import (
        running_total,
    )
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.normalize import (
        loud_src_n,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull() & F.col("source").isNotNull()
    )
    is_new = loud_src_n("source", "q_ks_test") >= 10
    g = docs.select(F.col("n_chars"), is_new.alias("is_new")).groupBy("n_chars").agg(
        F.count_if(~F.col("is_new")).alias("c_base"),
        F.count_if(F.col("is_new")).alias("c_new"),
    )
    r = running_total(g, ["n_chars"], "c_base", total_col="cum_b")
    r = running_total(r, ["n_chars"], "c_new", total_col="cum_n")
    tot = g.agg(
        F.sum("c_base").alias("t_base"), F.sum("c_new").alias("t_new")
    )
    dev = F.abs(
        F.col("cum_b").cast("decimal(19,0)") * F.col("t_new").cast("decimal(19,0)")
        - F.col("cum_n").cast("decimal(19,0)") * F.col("t_base").cast("decimal(19,0)")
    )
    tb = F.col("t_base").cast("double")
    tn = F.col("t_new").cast("double")
    agg = (
        r.crossJoin(F.broadcast(tot))
        .agg(
            F.max("t_base").cast("bigint").alias("n_base"),
            F.max("t_new").cast("bigint").alias("n_new"),
            (F.max(dev).cast("double") / (F.max(tb) * F.max(tn))).alias("d_stat"),
            (
                F.lit(1.358)
                * F.sqrt((F.max(tb) + F.max(tn)) / (F.max(tb) * F.max(tn)))
            ).alias("crit_05"),
        )
    )
    return agg.select(
        "n_base",
        "n_new",
        "d_stat",
        "crit_05",
        (F.col("d_stat") > F.col("crit_05")).alias("drift"),
    )


_SD_HALF = 14  # centered moving-average half-width (29-day trend window)


@register(
    "q_seasonal_decompose",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
        CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
    ),
    tr AS (
      SELECT d, cents,
        CASE WHEN COUNT(*) OVER w = {2 * _SD_HALF + 1} THEN
          CAST(SUM(cents) OVER w AS DOUBLE) / (COUNT(*) OVER w)
        END AS trend
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN {_SD_HALF} PRECEDING
                   AND {_SD_HALF} FOLLOWING)
    ),
    dt AS (
      SELECT d, cents, trend,
        CAST(floor((cents - trend) * 1000000 + 0.5) AS BIGINT) AS dt6,
        -- (x % 7 + 7) % 7: DuckDB % is a truncated remainder (negative
        -- for pre-epoch dates) while Spark's pmod is always 0..6
        (CAST(date_diff('day', DATE '1995-01-01', d) AS BIGINT) % 7 + 7) % 7
          AS dow
      FROM tr
    ),
    seas AS (
      SELECT dow,
        CAST(SUM(dt6) AS DOUBLE) / 1000000.0 / COUNT(*) AS seasonal
      FROM dt WHERE trend IS NOT NULL GROUP BY dow
    )
    SELECT dt.d, CAST(dt.cents AS DOUBLE) / 100.0 AS revenue,
      round(dt.trend / 100.0, 6) AS trend,
      round(seas.seasonal / 100.0, 6) AS seasonal,
      CASE WHEN dt.trend IS NOT NULL THEN
        round((CAST(dt.dt6 AS DOUBLE) / 1000000.0 - seas.seasonal) / 100.0, 6)
      END AS residual
    FROM dt JOIN seas USING (dow)
    """,
)
def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the daily-revenue
    series: trend = centered 29-day moving average, seasonal =
    day-of-week mean of the detrended series, residual = the rest —
    the anomaly-detection preprocessor that separates "weekends are
    slow" from "something broke" (pairs with q_cusum / q_mad_outliers,
    which fire on the RESIDUAL in a real monitor).

    Determinism: daily revenue is exact integer cents; the moving
    average is an exact-integer window sum divided once; the detrended
    value is fixed-pointed (floor(x·10⁶+0.5)) BEFORE the day-of-week
    mean so the seasonal means are exact-integer ratios — no float
    ever accumulates in engine-dependent order.  Day-of-week is
    datediff-mod-7 from a known Sunday, not the engines' divergent
    dayofweek() conventions.

    Scale: everything after the one fact-table aggregate runs on the
    calendar-bounded daily frame (the Gini pattern); the 7-row
    seasonal frame broadcasts back.  Edge days without a full 29-day
    window get NULL trend/residual rather than a biased partial mean."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(cents).alias("cents")
    )
    w = Window.orderBy("d").rowsBetween(-_SD_HALF, _SD_HALF)
    tr = daily.select(
        "d",
        "cents",
        F.when(
            F.count(F.lit(1)).over(w) == 2 * _SD_HALF + 1,
            F.sum("cents").over(w).cast("double") / F.count(F.lit(1)).over(w),
        ).alias("trend"),
    )
    dt = tr.select(
        "d",
        "cents",
        "trend",
        F.floor((F.col("cents") - F.col("trend")) * 1000000 + 0.5)
        .cast("bigint")
        .alias("dt6"),
        F.pmod(
            F.datediff(F.col("d"), F.lit("1995-01-01").cast("date")), F.lit(7)
        ).cast("bigint").alias("dow"),
    ).localCheckpoint(eager=False)  # bounded daily frame, two consumers
    seas = (
        dt.filter(F.col("trend").isNotNull())
        .groupBy("dow")
        .agg(
            (
                F.sum("dt6").cast("double") / F.lit(1000000.0) / F.count(F.lit(1))
            ).alias("seasonal")
        )
    )
    return dt.join(F.broadcast(seas), "dow").select(
        "d",
        (F.col("cents").cast("double") / 100.0).alias("revenue"),
        F.round(F.col("trend") / 100.0, 6).alias("trend"),
        F.round(F.col("seasonal") / 100.0, 6).alias("seasonal"),
        F.when(
            F.col("trend").isNotNull(),
            F.round(
                (F.col("dt6").cast("double") / 1000000.0 - F.col("seasonal"))
                / 100.0,
                6,
            ),
        ).alias("residual"),
    )
