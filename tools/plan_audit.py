"""Plan audit for the optimization round (guide §1.1/§7.2).

Captures ``explain("formatted")`` for every registry query at a given
SF dir WITHOUT executing it, and summarizes the structural signals the
optimization guide says to triage by: Exchange count, join strategies,
Python-boundary nodes, scans per table (cross-branch re-execution),
pushed filters, and codegen spans.

Usage:
    python tools/plan_audit.py [--sf-dir DIR] [--out plans/r12/audit.json]
                               [--dump-dir plans/r12/all] [names...]

The per-query plan text goes to --dump-dir (one file per query) when
given; the summary JSON always goes to --out.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_TOKENS = [
    ("exchanges", r"\bExchange\b"),
    ("sort_merge_join", r"\bSortMergeJoin\b"),
    ("broadcast_hash_join", r"\bBroadcastHashJoin\b"),
    ("shuffled_hash_join", r"\bShuffledHashJoin\b"),
    ("broadcast_nested_loop", r"\bBroadcastNestedLoopJoin\b"),
    ("cartesian", r"\bCartesianProduct\b"),
    ("batch_eval_python", r"\bBatchEvalPython\b"),
    ("arrow_eval_python", r"\bArrowEvalPython\b"),
    ("map_in_pandas", r"\b(MapInPandas|MapInArrow|PythonMapInArrow)\b"),
    ("flatmap_groups", r"\b(FlatMapGroupsInPandas|AggregateInPandas)\b"),
    ("window", r"\bWindow\b"),
    ("sorts", r"\bSort\b"),
    ("generate", r"\bGenerate\b"),
]


def plan_string(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def summarize(plan: str) -> dict:
    out = {}
    for key, pat in _TOKENS:
        out[key] = len(re.findall(pat, plan))
    # scans per table: "Scan parquet [num].../<table>.parquet" or Location lines
    scans = re.findall(r"Scan parquet[^\n]*", plan)
    out["scans"] = len(scans)
    per_table: dict[str, int] = {}
    for loc in re.findall(r"Location[^\n]*?(\w+)\.parquet", plan):
        per_table[loc] = per_table.get(loc, 0) + 1
    out["scans_per_table"] = per_table
    out["rescanned_tables"] = [t for t, n in per_table.items() if n > 1]
    out["pushed_filters_empty"] = len(re.findall(r"PushedFilters: \[\]", plan))
    out["codegen_spans"] = len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan)))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    ap.add_argument("--dump-dir", default=None)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from cdc_from_sql_and_nosql_to_data_warehouse_spark import operators as ops
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.session import get_spark, tune

    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    tune(spark, args.sf_dir)

    names = args.names or list(ops.REGISTRY)
    if args.dump_dir:
        os.makedirs(args.dump_dir, exist_ok=True)
    summary: dict[str, dict] = {}
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            df = ops.REGISTRY[name].fn(spark, args.sf_dir)
            plan = plan_string(df)
        except Exception as e:  # plan-time failure is itself a finding
            summary[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
            print(f"[{i}] {name}: PLAN-ERROR {str(e)[:120]}", flush=True)
            continue
        s = summarize(plan)
        s["plan_sec"] = round(time.time() - t0, 2)
        summary[name] = s
        if args.dump_dir:
            with open(os.path.join(args.dump_dir, f"{name}.txt"), "w") as f:
                f.write(plan)
        flags = []
        if s["cartesian"]:
            flags.append("CARTESIAN")
        if s["batch_eval_python"]:
            flags.append("BatchEvalPython")
        if s["rescanned_tables"]:
            flags.append(f"rescan:{','.join(s['rescanned_tables'])}")
        print(
            f"[{i}] {name}: ex={s['exchanges']} smj={s['sort_merge_join']} "
            f"bhj={s['broadcast_hash_join']} py={s['arrow_eval_python'] + s['map_in_pandas'] + s['flatmap_groups']} "
            f"scans={s['scans']} {' '.join(flags)}",
            flush=True,
        )
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
    # triage table: most exchanges first
    ranked = sorted(
        (n for n in summary if "error" not in summary[n]),
        key=lambda n: -summary[n]["exchanges"],
    )
    print("\n== top by exchange count ==")
    for n in ranked[:25]:
        s = summary[n]
        print(f"  {n}: ex={s['exchanges']} smj={s['sort_merge_join']} scans={s['scans']}")


if __name__ == "__main__":
    main()
