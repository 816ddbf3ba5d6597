"""Measure the LSH recall/cost frontier over the L (tables) knob.

The corpus is adversarially flat for hyperplane LSH (true top-5
neighbors sit at cosine ~0.32 ⇒ per-bit agreement ~0.60), so recall
is bought almost linearly with candidate volume.  This sweeps L at
b=8 bits, Hamming-1 probes, and records recall@5 vs the exact top-k
plus the candidate fraction (the cost knob) at sf0.001 and sf0.01 —
the measured frontier documented in SCALE.md and backing the pinned
floor in tests/test_sim_recall.py.
"""

from __future__ import annotations

import json
import os
import sys
from unittest import mock

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_from_sql_and_nosql_to_data_warehouse_spark import operators as ops
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import similarity as S
from cdc_from_sql_and_nosql_to_data_warehouse_spark.session import get_spark
from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.readers import load_table

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def topk_sets(rows):
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["cand_id"])
    return out


def recall(exact, got):
    per_q = [len(exact[q] & got.get(q, set())) / len(exact[q]) for q in exact]
    return sum(per_q) / len(per_q)


def main() -> None:
    spark = get_spark("lsh_frontier")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for sf_dir in SF_DIRS:
        exact = topk_sets(
            ops.REGISTRY["q_sim_topk"].fn(spark, sf_dir).filter("rank <= 5").collect()
        )
        n = load_table(spark, sf_dir, "embeddings").count()
        for L in (8, 12, 16, 20):
            with mock.patch.object(S, "_L_TABLES", L):
                df = S.q_sim_topk_lsh(spark, sf_dir)
                got = topk_sets(df.filter("query_id < 5").collect())
                r = recall(exact, got)
            out[f"{os.path.basename(sf_dir)}_L{L}"] = {
                "recall_at_5": round(r, 3),
                "expected_candidate_fraction": round(L * 9 / 256, 3),
                "corpus_rows": n,
            }
            print(sf_dir, "L =", L, "recall@5 =", round(r, 3), flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
