"""End-to-end pipeline test: both reference legs + change streams +
parity, over the golden fixtures (SURVEY.md §3)."""

from __future__ import annotations

import json
import os
import shutil
import uuid

from cdc_from_sql_and_nosql_to_data_warehouse_spark import pipeline
from cdc_from_sql_and_nosql_to_data_warehouse_spark.streaming import cdc

FIX = "/root/repo/tests/fixtures"


def test_full_pipeline_two_ticks(spark, tmp_path):
    paths = pipeline.PipelinePaths(str(tmp_path))
    os.makedirs(paths.drop_dir)

    # two scheduled ticks of both source legs (A21)
    for _ in range(2):
        pipeline.tick_sql_path(spark, f"{FIX}/txns.csv", paths)
        pipeline.tick_nosql_path(spark, f"{FIX}/trades.ndjson", paths)

    # SQL path: no PK → 24 rows/tick accumulate (reference README.md:11)
    assert spark.read.parquet(paths.bronze_txns).count() == 48
    # NoSQL path: keyed upsert → table stays 8 rows (A8)
    assert spark.read.parquet(paths.keyed_trades).count() == 8

    # stage one change-file and drain both warehouse modes
    with open(f"{FIX}/change_events.ndjson") as f:
        events = [json.loads(line) for line in f]
    with open(f"{paths.drop_dir}/{uuid.uuid4().hex}.json", "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")
    pipeline.run_change_streams(spark, paths)

    # append warehouse: reference semantics — INSERT+MODIFY accumulate
    assert spark.read.parquet(paths.warehouse_append).count() == 11
    # merge warehouse: corrected semantics — keyed, REMOVE applied
    assert cdc.read_merge_table(spark, paths.warehouse_merge).count() == 7

    # parity report (A20): source keyed table 8 vs merged 7 → lag 1
    parity = pipeline.parity_report(spark, paths).first()
    assert parity["source_rows"] == 8
    assert parity["target_rows"] == 7
    assert parity["row_lag"] == 1

    shutil.rmtree(tmp_path, ignore_errors=True)
