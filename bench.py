"""Engine benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Each query is timed end-to-end (plan + execute) against the noop sink,
so the number is full pipeline cost without driver-collect overhead.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdc_from_sql_and_nosql_to_data_warehouse_spark import operators as ops
from cdc_from_sql_and_nosql_to_data_warehouse_spark.session import get_spark

# Representative spread: scan+agg, star join, windows, CDC apply,
# dedup, similarity, text — the operators that dominate real pipelines.
HEADLINE = [
    "q_pricing_summary",
    "q_star_join",
    "q_group_agg",
    "q_join_inner",
    "q_topk",
    "q_window_running_sum",
    "q_upsert_latest_wins",
    "q_dedup_exact",
    "q_dedup_near_minhash",
    "q_sim_topk",
    "q_text_tokens",
    "q_udf_map_in_pandas",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup on a trivial job so q1 isn't charged for it
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = ops.REGISTRY[name].fn
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
