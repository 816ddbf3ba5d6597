"""Streaming micro-benchmark: file-drop CDC feed → append vs merge sink.

The reference's actual workload shape is this stream (DynamoDB stream →
S3 staging NDJSON → warehouse COPY/merge,
reference cdk_infrastructure/__init__.py:689-708); this tool records
the first performance evidence for it:

  * end-to-end rows/sec for each sink mode,
  * per-micro-batch latency (median / p95, from StreamingQuery
    progress events — numInputRows + batchDuration are Spark's own
    accounting, not wall-clock guesswork),
  * versioned-commit overhead = merge-mode median batch latency minus
    append-mode median batch latency (the merge path pays latest-wins
    merge compute + touched-bucket rewrite + hard-link staging +
    pointer flip; append pays only a partition write).

Feed: ~60k change events (sf0.01-scale — the driver's correctness SF)
as NDJSON drop files, maxFilesPerTrigger sized to yield ~10
micro-batches, availableNow trigger — the same service-free protocol
the streaming tests use.  Deterministic (seeded key/price mix).

Output: stream_bench.json at the repo root (schema pinned by
tests/test_scale_artifacts.py) + a summary block in SCALE.md.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_from_sql_and_nosql_to_data_warehouse_spark.session import get_spark
from cdc_from_sql_and_nosql_to_data_warehouse_spark.streaming import cdc

N_FILES = 40
ROWS_PER_FILE = 1500  # 60k events total
N_KEYS = 5000  # ~12 versions per key → real merge work
FILES_PER_TRIGGER = 4  # → 10 micro-batches


def write_feed(drop_dir: str) -> int:
    os.makedirs(drop_dir, exist_ok=True)
    seq = 0
    for f_idx in range(N_FILES):
        path = os.path.join(drop_dir, f"{f_idx:06d}__records.json")
        with open(path, "w") as f:
            for r in range(ROWS_PER_FILE):
                seq += 1
                k = (f_idx * 7919 + r) % N_KEYS  # deterministic key spread
                if seq % 97 == 0:  # ~1% deletes exercise REMOVE
                    ev = {
                        "eventName": "REMOVE",
                        "seq": seq,
                        "newImage": None,
                        "removedId": f"k{k}",
                    }
                else:
                    ev = {
                        "eventName": "INSERT" if seq % 3 else "MODIFY",
                        "seq": seq,
                        "newImage": {
                            "id": f"k{k}",
                            "price": round(100.0 + (seq % 1000) / 7.0, 4),
                            "shares": 1 + seq % 50,
                        },
                        "removedId": None,
                    }
                f.write(json.dumps(ev) + "\n")
    return seq


def batch_stats(query) -> tuple[int, list[float]]:
    rows, durs = 0, []
    for p in query.recentProgress:
        n = p.get("numInputRows", 0)
        if not n:
            continue  # zero-input housekeeping batch
        rows += n
        durs.append(float(p["batchDuration"]))
    return rows, durs


def run_mode(spark, drop_dir: str, work: str, mode: str) -> dict:
    ckpt = os.path.join(work, f"ckpt_{mode}")
    out = os.path.join(work, f"out_{mode}")
    stream = cdc.read_change_stream(spark, drop_dir, max_files_per_trigger=FILES_PER_TRIGGER)
    t0 = time.perf_counter()
    if mode == "append":
        q = cdc.start_append_stream(stream, out, ckpt, errors_dir=os.path.join(work, "err_a"))
    else:
        q = cdc.start_merge_stream(
            stream, out, ckpt, key="id", errors_dir=os.path.join(work, "err_m")
        )
    q.awaitTermination(600)
    wall = time.perf_counter() - t0
    rows, durs = batch_stats(q)
    final_rows = (
        cdc.read_merge_table(spark, out).count()
        if mode == "merge"
        else spark.read.parquet(out).count()
    )
    return {
        "input_rows": rows,
        "final_table_rows": final_rows,
        "wall_sec": round(wall, 3),
        "rows_per_sec": round(rows / wall, 1),
        "micro_batches": len(durs),
        "batch_ms_median": round(statistics.median(durs), 1),
        "batch_ms_p95": round(sorted(durs)[math.ceil(len(durs) * 0.95) - 1], 1),
    }


def write_event_feed(drop_dir: str) -> int:
    """Event-shaped feed (ts, event_type, value) for the windowed-agg
    path: 60k events spread over ~42 hours (one per 2.5s of event
    time) so a 5-minute tumble yields ~500 windows and the 10-minute
    watermark actually closes windows mid-run."""
    os.makedirs(drop_dir, exist_ok=True)
    types = ["view", "click", "buy", "error"]
    n = 0
    for f_idx in range(N_FILES):
        path = os.path.join(drop_dir, f"{f_idx:06d}__events.json")
        with open(path, "w") as f:
            for r in range(ROWS_PER_FILE):
                n += 1
                secs = (n * 5) // 2  # 2.5s of event time per event
                # the DATE advances with the hours — an hour-only %24
                # wrap sent event time ~24h backwards mid-feed and the
                # watermark silently discarded 42% of the events
                # (review-caught via windows_emitted in the artifact)
                day, rem = divmod(secs, 86400)
                ev = {
                    "ts": f"2024-01-{day + 1:02d}T{rem // 3600:02d}:"
                    f"{(rem // 60) % 60:02d}:{rem % 60:02d}",
                    "event_type": types[n % 4],
                    "value": round((n % 997) / 7.0, 4),
                }
                f.write(json.dumps(ev) + "\n")
    return n


def run_window_mode(spark, drop_dir: str, work: str) -> dict:
    """B31 tumbling window + watermark as a stream: the per-micro-batch
    cost here is the STATEFUL aggregation update (state store rows ≈
    open windows × event types), the path with zero perf evidence
    before round 6."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.streaming import windows

    ckpt = os.path.join(work, "ckpt_window")
    out = os.path.join(work, "out_window")
    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", FILES_PER_TRIGGER)
        .json(drop_dir)
    )
    agg = windows.tumbling_counts(
        stream, ts="ts", width="5 minutes", watermark="10 minutes"
    )
    t0 = time.perf_counter()
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    wall = time.perf_counter() - t0
    rows, durs = batch_stats(q)
    state_rows = 0
    for p in q.recentProgress:
        for so in p.get("stateOperators", []):
            state_rows = max(state_rows, so.get("numRowsTotal", 0))
    emitted = spark.read.parquet(out).count()
    return {
        "input_rows": rows,
        "windows_emitted": emitted,
        "max_state_rows": state_rows,
        "wall_sec": round(wall, 3),
        "rows_per_sec": round(rows / wall, 1),
        "micro_batches": len(durs),
        "batch_ms_median": round(statistics.median(durs), 1),
        "batch_ms_p95": round(sorted(durs)[math.ceil(len(durs) * 0.95) - 1], 1),
    }


def main() -> None:
    work = "/tmp/spark_graft_stream_bench"
    shutil.rmtree(work, ignore_errors=True)
    drop = os.path.join(work, "drop")
    total = write_feed(drop)

    spark = get_spark("stream_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: one tiny stream so JVM/codegen/stream-machinery costs
    # don't land on the first timed micro-batch
    warm_drop = os.path.join(work, "warm")
    os.makedirs(warm_drop)
    with open(os.path.join(warm_drop, "w.json"), "w") as f:
        f.write(
            json.dumps(
                {
                    "eventName": "INSERT",
                    "seq": 1,
                    "newImage": {"id": "w", "price": 1.0, "shares": 1},
                    "removedId": None,
                }
            )
            + "\n"
        )
    for m in ("append", "merge"):
        run_mode(spark, warm_drop, os.path.join(work, "warmup"), m)

    append = run_mode(spark, drop, work, "append")
    merge = run_mode(spark, drop, work, "merge")
    ev_drop = os.path.join(work, "ev_drop")
    write_event_feed(ev_drop)
    window = run_window_mode(spark, ev_drop, work)
    doc = {
        "feed_rows": total,
        "n_keys": N_KEYS,
        "files_per_trigger": FILES_PER_TRIGGER,
        "append": append,
        "merge": merge,
        "window": window,
        "merge_minus_append_batch_ms": round(
            merge["batch_ms_median"] - append["batch_ms_median"], 1
        ),
    }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "stream_bench.json"
    )
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
