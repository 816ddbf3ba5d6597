"""Tokenization-prep operators (SURVEY.md §2.3 Tier C extensions):
document chunking, sequence packing, and embedding quantization — the
steps between a curated corpus and a training shard.

Chunking is a stateless flat explode (zero shuffles: each task chunks
its own rows).  Packing places documents on global token-offset
boundaries with ``functions.ids.running_total`` — the parallel prefix
sum — instead of a single-task global window.  Quantization is a pure
per-vector expression.  Every query carries a DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions import text as X
from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.ids import running_total
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import register
from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.readers import load_table

# DuckDB tokenization CTE (single-sourced; functions/portable_hash.py)
from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.portable_hash import (  # noqa: E402
    SQL_TOKS_CTE as _SQL_TOKS,
    md5_prefix_int,
    sql_md5_int as _sql_md5_int,
    sql_md5_unit as _sql_md5_unit,
)

# Small window/stride so the ~54-token testdata documents produce
# several overlapping chunks each; a production context window only
# changes the constants, not the plan.
CHUNK_SIZE = 16
CHUNK_STRIDE = 12

PACK_CAPACITY = 256


@register(
    "q_chunk_documents",
    oracle=f"""
    WITH {_SQL_TOKS},
    nz AS (SELECT doc_id, toks FROM toks WHERE length(toks) >= 1),
    st AS (
      SELECT doc_id, toks, unnest(generate_series(1, length(toks), {CHUNK_STRIDE})) AS i
      FROM nz
    )
    SELECT doc_id,
      CAST((i - 1) // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
      CAST(length(toks[i:i + {CHUNK_SIZE - 1}]) AS BIGINT) AS n_tokens,
      array_to_string(toks[i:i + {CHUNK_SIZE - 1}], ' ') AS chunk_text
    FROM st
    """,
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split documents into fixed-size overlapping token windows
    (CHUNK_SIZE=16, CHUNK_STRIDE=12) — the context-window chunking
    step of a RAG / pretraining shard builder.

    Plan: tokenize → explode the stride-spaced start positions →
    slice per start.  Entirely within whole-stage codegen, no shuffle,
    no state: chunking 100 TB is a map-only job whose output size is
    input × (size/stride) overlap factor.  Both engines clamp the
    final short chunk the same way, and the <1-token guard matches
    DuckDB's empty generate_series."""
    docs = load_table(spark, sf_dir, "documents")
    base = (
        docs.select("doc_id", X.tokens("text").alias("toks"))
        .filter(F.size("toks") >= 1)
    )
    st = base.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(1), F.size("toks"), F.lit(CHUNK_STRIDE))
        ).alias("i"),
    )
    chunk = F.slice(F.col("toks"), F.col("i"), CHUNK_SIZE)
    return st.select(
        "doc_id",
        F.floor((F.col("i") - 1) / CHUNK_STRIDE).cast("bigint").alias("chunk_id"),
        F.size(chunk).cast("bigint").alias("n_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


@register(
    "q_pack_sequences",
    oracle=f"""
    WITH {_SQL_TOKS},
    counts AS (
      SELECT doc_id, CAST(length(toks) AS BIGINT) AS n_tok
      FROM toks WHERE length(toks) >= 1
    ),
    cum AS (
      SELECT doc_id, n_tok,
        SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS cum_tok
      FROM counts
    ),
    binned AS (
      SELECT doc_id, n_tok, CAST((cum_tok - 1) // {PACK_CAPACITY} AS BIGINT) AS bin_id
      FROM cum
    )
    SELECT bin_id, COUNT(*) AS n_docs,
      CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
      MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM binned GROUP BY bin_id
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into fixed-capacity token bins (PACK_CAPACITY=256
    tokens) in deterministic doc_id order — the sequence-packing /
    shard-boundary step of a training-data pipeline (each doc lands in
    the bin containing its last token).

    Plan: the global token cumsum comes from
    ``functions.ids.running_total`` — range-partition by doc_id,
    in-partition window cumsum, plus a driver-side prefix sum of one
    long per partition — NOT a single-task ``sum() over (order by)``
    global window; every stage is parallel at 10^9 documents.  The
    oracle uses the naive global window (DuckDB is single-node anyway)
    and must agree bit-for-bit.  Zero-token docs are excluded on both
    sides (their bin would differ between floor and truncating int
    division)."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select("doc_id", X.token_count("text").alias("n_tok"))
        .filter(F.col("n_tok") >= 1)
    )
    cum = running_total(counts, ["doc_id"], "n_tok", "cum_tok")
    binned = cum.withColumn(
        # integer div, not floor(a/b): double division loses integer
        # exactness past 2^53 cumulative tokens and can land a doc in
        # the adjacent bin vs the oracle's // (review-caught)
        "bin_id", F.expr(f"(cum_tok - 1) div {PACK_CAPACITY}").cast("bigint")
    )
    return binned.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@register(
    "q_embedding_quantize",
    oracle="""
    WITH sc AS (
      SELECT vec_id,
        greatest(
          list_aggregate(
            list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max')
          / 127.0,
          1e-12) AS scale,
        embedding
      FROM embeddings
    )
    SELECT vec_id, scale, CAST(i - 1 AS INTEGER) AS pos,
      CAST(floor(CAST(embedding[i] AS DOUBLE) / scale + 0.5) AS INTEGER) AS q
    FROM sc CROSS JOIN (
      SELECT unnest(generate_series(
        1, (SELECT MAX(length(embedding)) FROM embeddings))) AS i
    ) t
    WHERE i <= length(embedding)
    """,
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization per embedding: scale = max|x|/127,
    q_i = round(x_i/scale) — the storage/ANN-memory reduction step for
    a vector index (4× smaller than float32 before any codec).

    Rounding is the explicit ``floor(x/scale + 0.5)`` on BOTH engines:
    `round()` half-case rules differ across engines/types, floor does
    not.  The per-element lambda is interpreted (outside codegen) but
    does two flops per element; for a hot 100 TB pass the same kernel
    drops into the Arrow ``mapInPandas`` path of
    operators/similarity.py.

    Result shape is EXPLODED to (vec_id, scale, pos, q) scalar rows —
    the verification harness canonicalizes with a pandas sort over all
    columns, which cannot hash array cells (the round-3 driver ERR);
    the array form is a trailing ``collect_list`` away when a consumer
    wants it."""
    emb = load_table(spark, sf_dir, "embeddings")
    absmax = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    sc = emb.select(
        "vec_id",
        F.greatest(absmax / F.lit(127.0), F.lit(1e-12)).alias("scale"),
        "embedding",
    )
    q = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") / F.col("scale") + F.lit(0.5)).cast("int"),
    )
    return sc.select("vec_id", "scale", F.posexplode(q).alias("pos", "q"))


_SPAN_START_P = 0.05  # per-position span-start probability
_SPAN_LEN = 3  # fixed corruption span length (tokens)
_SPAN_U = "'doc:' || CAST(doc_id AS VARCHAR) || ':' || CAST(p AS VARCHAR)"




@register(
    "q_span_corruption",
    oracle=f"""
    WITH {_SQL_TOKS},
    pos AS (
      SELECT doc_id, unnest(generate_series(0, length(toks) - 1)) AS p
      FROM toks WHERE length(toks) >= 1
    ),
    flagged AS (
      SELECT doc_id, p,
        CASE WHEN {_sql_md5_unit(_SPAN_U)} < {_SPAN_START_P} THEN 1 ELSE 0 END
          AS start
      FROM pos
    ),
    covered AS (
      SELECT doc_id, start,
        max(start) OVER (
          PARTITION BY doc_id ORDER BY p
          ROWS BETWEEN {_SPAN_LEN - 1} PRECEDING AND CURRENT ROW
        ) AS masked
      FROM flagged
    )
    SELECT doc_id,
      CAST(COUNT(*) AS BIGINT) AS n_tokens,
      CAST(SUM(start) AS BIGINT) AS n_spans,
      CAST(SUM(masked) AS BIGINT) AS n_masked,
      round(CAST(SUM(masked) AS DOUBLE) / COUNT(*), 6) AS corruption_rate
    FROM covered
    GROUP BY doc_id
    """,
)
def q_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption mask PLANNING: for each document,
    deterministically select span starts (per-position md5-uniform <
    5%), extend each to a 3-token span, and report how many tokens the
    union of spans masks.  The mask-budget audit a denoising-objective
    pipeline runs before materializing corrupted examples — rates far
    from the configured budget flag tokenizer or corpus drift.

    Determinism: the per-position draw is the cross-engine md5 uniform
    (functions/portable_hash.md5_unit) on 'doc:<doc_id>:<pos>' — no
    RNG, so the oracle reproduces the exact mask.  Scale: one explode
    (flat, no shuffle), ONE window partitioned by doc_id with a
    constant 3-row frame (never unbounded), one hash agg — per-doc
    cost is linear in its token count."""
    from pyspark.sql.window import Window

    from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.portable_hash import (
        md5_unit,
    )

    docs = load_table(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id", F.posexplode(X.tokens("text")).alias("p", "tok")
    )
    flagged = pos.select(
        "doc_id",
        "p",
        F.when(
            md5_unit(
                F.concat_ws(":", F.lit("doc"), F.col("doc_id"), F.col("p"))
            )
            < _SPAN_START_P,
            1,
        )
        .otherwise(0)
        .alias("start"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(-(_SPAN_LEN - 1), 0)
    )
    covered = flagged.withColumn("masked", F.max("start").over(w))
    return covered.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("start").cast("bigint").alias("n_spans"),
        F.sum("masked").cast("bigint").alias("n_masked"),
        F.round(
            F.sum("masked").cast("double") / F.count(F.lit(1)), 6
        ).alias("corruption_rate"),
    )


# FIM sentinels — the PSM (prefix-suffix-middle) layout from Bavarian
# et al. 2022 ("Efficient Training of Language Models to Fill in the
# Middle", public; also StarCoder's <fim_*> tokens).
_FIM_PRE = "<fim_prefix>"
_FIM_SUF = "<fim_suffix>"
_FIM_MID = "<fim_middle>"

# oracle fragments: the two md5-derived cut hashes (portable int hash)
_SQL_FIM_HA = _sql_md5_int("CAST(doc_id AS VARCHAR) || ':fim-a'")
_SQL_FIM_HB = _sql_md5_int("CAST(doc_id AS VARCHAR) || ':fim-b'")


@register(
    "q_fim_transform",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text, length(text) AS n
      FROM documents WHERE text IS NOT NULL AND length(text) >= 3
    ),
    cuts AS (
      SELECT doc_id, text, n,
        1 + {_SQL_FIM_HA} % (n - 2) AS a
      FROM d
    ),
    cuts2 AS (
      SELECT doc_id, text, n, a,
        a + 1 + {_SQL_FIM_HB} % (n - 1 - a) AS b
      FROM cuts
    )
    SELECT doc_id, CAST(a AS BIGINT) AS cut_a, CAST(b AS BIGINT) AS cut_b,
      '{_FIM_PRE}' || substr(text, 1, a)
        || '{_FIM_SUF}' || substr(text, b + 1, n - b)
        || '{_FIM_MID}' || substr(text, a + 1, b - a) AS fim_text
    FROM cuts2
    """,
)
def q_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILL-IN-THE-MIDDLE transformation (Bavarian et al. 2022,
    public; the StarCoder/code-LLM training-data op): each document
    splits at two deterministic cut points into (prefix, middle,
    suffix) and is re-emitted in PSM order —
    <fim_prefix>P<fim_suffix>S<fim_middle>M — so an autoregressive
    model learns to infill the middle conditioned on both sides.

    Cut points are md5-derived integers (functions/portable_hash.py):
    a ∈ [1, n−2] and b ∈ [a+1, n−1], guaranteeing all three parts are
    non-empty (middle ≥ 1 char, suffix ≥ 1 char); documents under 3
    chars are excluded.  All arithmetic is integer modulo on the
    60-bit hash — no float anywhere — and substr is 1-based
    character (not byte) indexing in both engines.

    Scale: a PURE PROJECTION — zero shuffles, zero state; each task
    transforms its own rows at scan speed, the ideal 100 TB shape
    (same class as q_chunk_documents)."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.length("text") >= 3))
        .select("doc_id", "text", F.length("text").alias("n"))
    )
    ha = md5_prefix_int(
        F.concat(F.col("doc_id").cast("string"), F.lit(":fim-a"))
    )
    hb = md5_prefix_int(
        F.concat(F.col("doc_id").cast("string"), F.lit(":fim-b"))
    )
    cuts = d.select(
        "doc_id", "text", "n", (F.lit(1) + ha % (F.col("n") - 2)).alias("a")
    ).select(
        "doc_id",
        "text",
        "n",
        "a",
        (F.col("a") + 1 + hb % (F.col("n") - 1 - F.col("a"))).alias("b"),
    )
    return cuts.select(
        "doc_id",
        F.col("a").cast("bigint").alias("cut_a"),
        F.col("b").cast("bigint").alias("cut_b"),
        F.concat(
            F.lit(_FIM_PRE),
            F.col("text").substr(F.lit(1), F.col("a")),
            F.lit(_FIM_SUF),
            F.col("text").substr(F.col("b") + 1, F.col("n") - F.col("b")),
            F.lit(_FIM_MID),
            F.col("text").substr(F.col("a") + 1, F.col("b") - F.col("a")),
        ).alias("fim_text"),
    )
