"""q_sim_index_incremental pins (VERDICT r8 next-6).

The oracle already proves maintenance ≡ full re-encode with the frozen
codebook (same codes, bit for bit).  These tests add the two claims the
oracle can't express:

* top-k equivalence on probes: the maintained code table and the
  frozen-codebook full re-encode rank candidates IDENTICALLY under ADC
  (follows from code equality, asserted end-to-end here at sf0.001);
* the recall question a real deployment asks — how much does skipping
  RETRAINING cost?  The maintained (frozen-codebook) index's
  recall@10 vs exact L2 on the post-delta corpus is pinned both
  absolutely and relative to a fully retrained index.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.mlprep import (
    _DELTA_MOD,
    _INS_SHIFT,
    _PQ_K,
    _PQ_M,
    _PQ_SUB,
    _pq_codebook,
    _pq_encode,
    q_sim_index_incremental,
)
from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.readers import load_table

from conftest import SF_DIR

N_PROBES = 5
TOP_K = 10


def _post_delta_corpus(emb):
    mod = F.col("vec_id") % _DELTA_MOD
    kept = emb.filter(~mod.isin(3, 5))
    updated = emb.filter(mod == 5).select(
        "vec_id",
        F.transform("embedding", lambda x: (-x).cast("float")).alias("embedding"),
    )
    inserted = emb.filter(mod == 7).select(
        (F.col("vec_id") + _INS_SHIFT).alias("vec_id"),
        F.reverse("embedding").alias("embedding"),
    )
    return kept.unionByName(updated).unionByName(inserted)


def _codes_dict(encoded) -> dict[int, tuple[int, ...]]:
    rows = (
        encoded.groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("s", "code"))),
                lambda t: t["code"],
            ).alias("codes")
        )
        .collect()
    )
    return {r["vec_id"]: tuple(r["codes"]) for r in rows}


def _cb_array(cb) -> np.ndarray:
    """codebook as [s, code] -> centroid ndarray."""
    arr = np.zeros((_PQ_M, _PQ_K, _PQ_SUB))
    for r in cb.collect():
        arr[r["cs"]][r["code"]] = r["cv"]
    return arr


SHORTLIST = 100


def _index_topk(
    codes: dict, cb_arr: np.ndarray, vecs: dict, query: np.ndarray, qid: int
):
    """The production search path (q_sim_pq_search's numpy twin):
    asymmetric-distance scoring via the per-query LUT → top-SHORTLIST
    ADC shortlist → exact rerank → top-k.  Raw ADC top-10 recall at
    K*=16/M=8 is ~0.3 by design; the rerank is part of the index."""
    q_sub = query.reshape(_PQ_M, _PQ_SUB)
    lut = ((cb_arr - q_sub[:, None, :]) ** 2).sum(axis=2)  # (M, K)
    scored = [
        (sum(lut[s][c] for s, c in enumerate(cs)), vid)
        for vid, cs in codes.items()
        if vid != qid
    ]
    short = [vid for _, vid in sorted(scored)[:SHORTLIST]]
    reranked = sorted(
        (float(((vecs[vid] - query) ** 2).sum()), vid) for vid in short
    )
    return [vid for _, vid in reranked[:TOP_K]]


@pytest.fixture(scope="module")
def corpus(spark):
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    post = _post_delta_corpus(emb).localCheckpoint()
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in post.collect()
    }
    return emb, post, vecs


def test_maintained_equals_frozen_full_reencode(spark, corpus):
    emb, post, _ = corpus
    cb = _pq_codebook(emb)
    rows = q_sim_index_incremental(spark, SF_DIR).collect()
    maintained: dict[int, dict[int, int]] = {}
    for r in rows:
        maintained.setdefault(r["vec_id"], {})[r["subspace"]] = r["code"]
    maintained_t = {
        vid: tuple(cs[s] for s in sorted(cs)) for vid, cs in maintained.items()
    }
    full = _codes_dict(_pq_encode(post, cb))
    assert maintained_t == full


def test_maintained_recall_vs_exact_and_vs_retrained(spark, corpus):
    emb, post, vecs = corpus
    cb_frozen = _pq_codebook(emb)  # trained on the BASE corpus
    cb_retrained = _pq_codebook(post)  # the full-rebuild alternative
    codes_frozen = _codes_dict(_pq_encode(post, cb_frozen))
    codes_retrained = _codes_dict(_pq_encode(post, cb_retrained))
    arr_frozen, arr_retrained = _cb_array(cb_frozen), _cb_array(cb_retrained)

    probe_ids = sorted(vecs)[:N_PROBES]
    rec_frozen, rec_retrained = [], []
    for qid in probe_ids:
        q = vecs[qid]
        exact = [
            vid
            for _, vid in sorted(
                (float(((v - q) ** 2).sum()), vid)
                for vid, v in vecs.items()
                if vid != qid
            )[:TOP_K]
        ]
        got_f = _index_topk(codes_frozen, arr_frozen, vecs, q, qid)
        got_r = _index_topk(codes_retrained, arr_retrained, vecs, q, qid)
        rec_frozen.append(len(set(got_f) & set(exact)) / TOP_K)
        rec_retrained.append(len(set(got_r) & set(exact)) / TOP_K)
    mean_f = sum(rec_frozen) / len(rec_frozen)
    mean_r = sum(rec_retrained) / len(rec_retrained)
    # absolute floor: the frozen-codebook maintained index must stay a
    # usable ANN index on the drifted corpus (measured 0.88 at
    # sf0.001; floor leaves noise margin)
    assert mean_f >= 0.7, (mean_f, rec_frozen)
    # relative pin: skipping retraining may cost at most 0.15 recall@10
    # vs the full rebuild on THIS delta (measured: BOTH read 0.88 —
    # zero drift cost at ≈18% of rows touched)
    assert mean_f >= mean_r - 0.15, (mean_f, mean_r)
