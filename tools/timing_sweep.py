"""Full-registry timing sweep for the optimization round (guide §1).

Times EVERY registry query at --sf-dir against the noop sink (min of
--runs back-to-back executions after a warmup pass at sf0.001 for
codegen), labels each job, and writes {name: sec} JSON so the round's
before/after deltas are grounded in the same protocol as bench.py.

Usage:
    python tools/timing_sweep.py [--sf-dir /root/testdata/sf0.1]
                                 [--runs 2] [--out /tmp/sweep.json] [names...]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default=None)
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument("--warmup-dir", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from cdc_from_sql_and_nosql_to_data_warehouse_spark import operators as ops
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.session import get_spark, tune
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.readers import load_table

    spark = get_spark("timing_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    tune(spark, args.sf_dir)
    # same bench-host knobs as bench.py so numbers are comparable
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")

    names = args.names or list(ops.REGISTRY)
    spark.range(1000).selectExpr("sum(id)").collect()
    for t in ("lineitem", "orders", "customer", "events", "documents", "embeddings"):
        load_table(spark, args.sf_dir, t).write.format("noop").mode("overwrite").save()

    def run_once(name: str, sf_dir: str) -> float:
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        t0 = time.perf_counter()
        ops.REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        gc.collect()
        return dt

    timings: dict[str, float] = {}
    # skip warmup (rather than fail every query) when the warmup dir is
    # absent on this host — the target --sf-dir may still be valid
    warmup = not args.no_warmup and os.path.isdir(args.warmup_dir)
    for i, name in enumerate(names):
        try:
            if warmup:
                run_once(name, args.warmup_dir)
            walls = [run_once(name, args.sf_dir) for _ in range(args.runs)]
            timings[name] = round(min(walls), 3)
            print(f"[{i}] {name}: {timings[name]}s", flush=True)
        except Exception as e:
            timings[name] = -1.0
            print(f"[{i}] {name}: ERROR {type(e).__name__}: {str(e)[:150]}", flush=True)
        if args.out:  # flush per query so a crash keeps prior numbers
            with open(args.out, "w") as f:
                json.dump(timings, f, indent=0, sort_keys=True)
    total = sum(v for v in timings.values() if v > 0)
    print(f"\nTOTAL {len(timings)} queries, {total:.1f}s", flush=True)
    ranked = sorted((n for n in timings if timings[n] > 0), key=lambda n: -timings[n])
    print("== top 30 ==")
    for n in ranked[:30]:
        print(f"  {n}: {timings[n]}s")


if __name__ == "__main__":
    main()
