"""ANN recall measurement (SURVEY.md §2.3 C3): an approximate index
without a recall number is unquantified.  Both ANN paths are compared
against the exact brute-force top-k on the same corpus and pinned to a
floor; the knobs that buy recall (LSH tables / probe radius, IVF
nprobe) are documented at the operator definitions and in SCALE.md.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import REGISTRY

from conftest import SF_DIR


def _topk_sets(rows):
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["cand_id"])
    return out


def _recall(exact: dict[int, set[int]], got: dict[int, set[int]]) -> float:
    per_q = [len(exact[q] & got.get(q, set())) / len(exact[q]) for q in exact]
    return sum(per_q) / len(per_q)


def test_lsh_recall_at_5(spark):
    # exact top-5 for the 5 shared query vectors (q_sim_topk runs k=10)
    exact = _topk_sets(REGISTRY["q_sim_topk"].fn(spark, SF_DIR).filter("rank <= 5").collect())
    lsh = _topk_sets(
        REGISTRY["q_sim_topk_lsh"].fn(spark, SF_DIR).filter("query_id < 5").collect()
    )
    r = _recall(exact, lsh)
    # measured 0.68 at sf0.001 / 0.64 at sf0.01 with 8 tables x 8 bits,
    # Hamming-1 probes; the single-table 12-bit form scored 0.0 on this
    # corpus (true neighbors at cosine ~0.3 ⇒ ~62% per-bit agreement)
    assert r >= 0.45, f"LSH recall@5 = {r}"


def test_ivf_recall_at_5(spark):
    exact = _topk_sets(REGISTRY["q_sim_topk"].fn(spark, SF_DIR).filter("rank <= 5").collect())
    ivf = _topk_sets(
        REGISTRY["q_sim_ivf"].fn(spark, SF_DIR).filter("query_id < 5").collect()
    )
    r = _recall(exact, ivf)
    # label-mean centroids are a stand-in for trained k-means, and the
    # corpus labels are geometrically weak — nprobe=3 lifts recall
    # roughly 3x over nprobe=1; a real deployment trains centroids
    assert r >= 0.2, f"IVF recall@5 = {r}"


def test_lsh_candidate_fraction_bounded(spark):
    # the point of the index: the exact-cosine stage must touch a small
    # fraction of (query x corpus) — here just the band-join fan-in
    emb = REGISTRY["q_sim_topk"].fn.__module__  # noqa: F841 — import side only
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.similarity import (
        _table_signatures,
    )
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.readers import load_table

    embdf = load_table(spark, SF_DIR, "embeddings")
    n = embdf.count()
    sigs = embdf.select(
        "vec_id", F.explode(_table_signatures(F.col("embedding"))).alias("ts")
    ).select("vec_id", "ts.table", "ts.sig")
    cand = sigs.select(F.col("vec_id").alias("cand_id"), "table", "sig")
    probes = sigs.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        "table",
        F.explode(
            F.array(F.col("sig"), *[F.col("sig").bitwiseXOR(F.lit(1 << j)) for j in range(8)])
        ).alias("sig"),
    )
    pairs = (
        cand.join(probes, ["table", "sig"])
        .select("query_id", "cand_id")
        .dropDuplicates(["query_id", "cand_id"])
        .count()
    )
    frac = pairs / (5 * n)
    # L·(1+b)/2^b = 8·9/256 ≈ 0.28 expected; allow slack for collisions
    assert frac < 0.5, f"candidate fraction {frac}"
