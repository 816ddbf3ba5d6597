"""Streaming COUNT-MIN SKETCH maintenance (round 9): the q_count_min_sketch
grid is a legal unbounded-stream aggregate BECAUSE its state is bounded
by construction (depth×width cells, never per-key rows) — the claim the
batch operator's docstring makes, executed here through Structured
Streaming: lineitem arrives in micro-batches, the grid aggregates in
complete mode, and the final grid must equal the batch grid cell for
cell.  Both sides build through the OPERATOR'S cms_cells builder, so
the pin breaks if the bucket hash ever drifts (review r9)."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.featureprep import (
    _CMS_DEPTH,
    _CMS_WIDTH,
    cms_cells,
)
from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.readers import load_table

from conftest import SF_DIR


@pytest.fixture()
def chunked_lineitem(spark, tmp_path):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    src = tmp_path / "stream_src"
    # three arrival waves, deterministic split on the order key
    for i in range(3):
        li.filter(F.col("l_orderkey") % 3 == i).write.mode(
            "append" if i else "overwrite"
        ).parquet(str(src))
    return str(src), li


def test_streaming_cms_equals_batch_grid(spark, chunked_lineitem):
    src, li = chunked_lineitem
    stream = (
        spark.readStream.schema("l_orderkey bigint, l_partkey bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    name = f"cms_{uuid.uuid4().hex[:8]}"
    q = (
        cms_cells(stream, "l_partkey")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(300), "stream did not drain in 300s"
    finally:
        q.stop()
    got = {
        (r.depth, r.bucket): r.cnt
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    want = {
        (r.depth, r.bucket): r.cnt for r in cms_cells(li, "l_partkey").collect()
    }
    assert got == want
    # the streaming state is the grid itself: bounded by geometry
    assert len(got) <= _CMS_DEPTH * _CMS_WIDTH
