"""Engine benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Each query is timed end-to-end (plan + execute) against the noop sink,
so the number is full pipeline cost without driver-collect overhead.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdc_from_sql_and_nosql_to_data_warehouse_spark import operators as ops
from cdc_from_sql_and_nosql_to_data_warehouse_spark.session import get_spark

# Representative spread: scan+agg, star join, windows, CDC apply,
# dedup, similarity, text — the operators that dominate real pipelines.
# Round 2 adds the heavy hitters of the newly driver-verified set
# (percentile, pivot, tf-idf, global sort, Q2 shape, md5 minhash) so
# round-over-round regressions there are visible.
HEADLINE = [
    "q_pricing_summary",
    "q_star_join",
    "q_group_agg",
    "q_join_inner",
    "q_topk",
    "q_window_running_sum",
    "q_upsert_latest_wins",
    "q_asof_join",
    "q_sessionize",
    "q_dedup_exact",
    "q_dedup_near_minhash",
    "q_sim_topk",
    "q_text_tokens",
    "q_udf_map_in_pandas",
    "q_percentile",
    "q_pivot",
    "q_text_tfidf",
    "q_sort_multi",
    "q_min_cost_supplier",
    "q_dedup_minhash_md5",
    "q_market_share",
    "q_lm_score",
    "q_chunk_documents",
    # round-3 additions: iterative clustering, PQ-ADC search, segment
    # dedup, and graph-on-facts — the heaviest new plan shapes
    "q_kmeans_assign",
    "q_sim_pq_search",
    "q_dedup_segments",
    "q_pagerank",
    # session-4 additions: runtime-bloom-pruned join, recursive-CTE
    # traversal, and the one-scan DQ rule suite
    "q_bloom_prune_join",
    "q_reachability",
    "q_dq_expectations",
    # session-6 additions: BM25 retrieval, containment dedup, and the
    # time-series subsequence search — the new data-scaled shapes
    "q_bm25_search",
    "q_dedup_containment",
    "q_ts_similarity",
    # round-4 additions (appended — earlier prefixes stay comparable)
    "q_dedup_spans",
    "q_mixture_temperature",
    # pre-aggregated grouping-sets decomposition (functions/grouping.py)
    "q_rollup",
    "q_grouping_sets",
    # round-4 perf rewrites found by the full-registry sf0.1 scan:
    # shingle-set AllPairs (150s -> 2.7s) and the Arrow LSH signature
    # matmul (6.6s -> 1.0s) — benched so regressions stay visible
    "q_setsim_join",
    "q_sim_topk_lsh",
    # round-5 additions: the new data-scaled shapes (top-K vocabulary
    # + broadcast-back coverage, struct-min OHLC, positional-delete
    # anti-join, contingency chi-square)
    "q_vocab_coverage",
    "q_ohlc_bars",
    "q_delete_vector_apply",
    "q_chi2_independence",
    # round-6 additions: hybrid retrieval fusion (3 rank windows over
    # token-set joins), rank-statistic AUC (parallel prefix sum), and
    # the mapInPandas partial-Gram PCA — the new data-scaled shapes
    "q_hybrid_rrf",
    "q_retrieval_auc",
    "q_pca_project",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Local-bench sizing: testdata files are ~20 MB, so the default
    # 128 MB maxPartitionBytes yields 1-3 splits and idles the other
    # cores.  8 MB measured best across the headline mix: 4 MB over-
    # splits and the r2 q_udf_map_in_pandas "+43%" turned out to be
    # exactly this — per-partition Python-worker/Arrow-stream setup
    # (0.605 s at 4 MB → 0.47 at 8 MB → 0.43 at 16 MB), while 16 MB
    # under-parallelizes the join-heavy queries (q_min_cost_supplier
    # 1.01 → 1.44 s).  (On a real cluster with 128 MB+ row groups the
    # default is correct — this is a bench-host knob, not an engine
    # semantic.)  Bigger Arrow batches cut pandas-UDF overhead ~20%.
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")

    # Warmup: JVM/codegen on a trivial job, then one pass over the input
    # files (footer reads + OS page cache) so the first timed query
    # measures query execution, not cold-file costs every query after
    # it wouldn't pay.
    spark.range(1000).selectExpr("sum(id)").collect()
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.readers import load_table

    # noop write, not count(): parquet count() is answered from footer
    # stats without touching column chunks, which would leave the data
    # pages cold for the first timed query
    for t in ("lineitem", "orders", "customer", "events", "documents", "embeddings"):
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()
    # one warmup iteration of every headline query at the smallest SF:
    # compiles/caches the generated code so the timed runs measure
    # execution, not Janino compilation
    for name in HEADLINE:
        ops.REGISTRY[name].fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()

    # PRIMARY metric: min of 3 BACK-TO-BACK runs per query — the
    # steady-state number, directly comparable to r1/r2's best-of-2
    # (measured: interleaving the rounds instead read ~25% high across
    # the board because per-query JIT/branch state never gets warm —
    # that protocol change, not any plan change, was the whole
    # "r3 looks slower" delta; back-to-back min at the same commit
    # reproduces r1's subset total within 2%).  A trailing interleaved
    # round is kept as a SECONDARY median-ish sanity stat so a stray
    # GC pause or session-drift trend is still visible.
    runs: dict[str, list[float]] = {name: [] for name in HEADLINE}

    def timed(name: str) -> float:
        fn = ops.REGISTRY[name].fn
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        # drop py4j refs promptly so ContextCleaner can unpersist
        # localCheckpoint blocks instead of letting them pile up
        # (spark.cleaner.periodicGC default is 30 min — longer than
        # the whole bench)
        gc.collect()
        return dt

    for name in HEADLINE:
        for _ in range(3):
            runs[name].append(timed(name))
    interleaved = {name: round(timed(name), 3) for name in HEADLINE}

    timings_min = {name: round(min(ts), 3) for name, ts in runs.items()}
    total = round(sum(timings_min.values()), 3)
    # the r1/r2 comparable subset (first 23 headliners; r3 appended 4)
    r2_subset = HEADLINE[:23]
    subset_total = round(sum(timings_min[n] for n in r2_subset), 3)
    # Secondary stats go to a sidecar file: the driver keeps only the
    # LAST ~2000 chars of captured output and parses the final line as
    # JSON.  In round 4 the single line (min + interleaved dicts for 39
    # queries) outgrew that buffer and the driver recorded
    # "parsed": null — the final stdout line must stay comfortably
    # inside the tail window, and nothing may print after it.
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_secondary.json"), "w") as f:
        json.dump(
            {
                "queries_interleaved": interleaved,
                "total_interleaved": round(sum(interleaved.values()), 3),
                # Duplicate the headline detail here so the per-query
                # min-of-3 numbers survive even if the stdout line ever
                # takes the >1800-char fallback (which drops "queries").
                "queries_min": timings_min,
                "total_min": total,
                "total_r2_comparable_subset": subset_total,
                "protocol": "min-of-3 back-to-back (r1/r2: best-of-2 back-to-back)",
            },
            f,
        )
    line = json.dumps(
        {
            "metric": "headline_query_wall_total",
            "value": total,
            "unit": "sec",
            "queries": timings_min,
            "total_r2_comparable_subset": subset_total,
            "sf": sf,
        }
    )
    # Hard guard, mirrored in tests/test_bench_contract.py: if the
    # headline set ever grows the line past the driver's tail buffer,
    # drop per-query detail rather than ship an unparseable line.
    if len(line) > 1800:
        line = json.dumps(
            {
                "metric": "headline_query_wall_total",
                "value": total,
                "unit": "sec",
                "queries": {},
                "total_r2_comparable_subset": subset_total,
                "sf": sf,
            }
        )
    print(line)


if __name__ == "__main__":
    main()
