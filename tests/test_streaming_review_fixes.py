"""Round-4 review pins for sources/{attrvalue,pydatasource,jdbc} and
streaming/{windows,listener,stateful}."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources import jdbc, pydatasource
from cdc_from_sql_and_nosql_to_data_warehouse_spark.streaming import listener, windows
from cdc_from_sql_and_nosql_to_data_warehouse_spark.streaming.stateful import _fold


def test_observed_load_works_on_streaming(spark, tmp_path):
    # Observation objects are rejected for streaming Datasets; the
    # string-name path must be used instead (previously raised).
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
    )
    observed, obs = listener.observed_load(stream, name="probe", key="value")
    assert obs is None
    assert observed.isStreaming
    # batch path unchanged
    df = spark.range(5)
    observed_b, obs_b = listener.observed_load(df, name="probe2", key="id")
    assert obs_b is not None
    observed_b.count()
    assert obs_b.get["rows"] == 5


def test_stream_defaults_match_batch_defaults(spark):
    pydatasource.register(spark)
    batch = sorted(map(tuple, spark.read.format("cdc_changefeed").load().collect()))
    assert len(batch) == 4 * 1000  # batch defaults
    # the stream reader's bounded feed must regenerate the same rows
    r = pydatasource.ChangeFeedStreamReader({})
    start = r.initialOffset()
    rows = []
    while True:
        got, end = r.read(start)
        rows.extend(got)
        if not got:
            break
        start = end
    assert sorted(rows) == batch


def test_jdbc_reader_rejects_missing_bounds(spark):
    with pytest.raises(ValueError, match="lower_bound AND upper_bound"):
        jdbc.jdbc_reader(spark, "jdbc:mysql://h/db", "t", partition_column="id")


def test_windowed_counts_accept_watermark(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 0, i), "view", 1.0, 7) for i in range(10)],
        "ts timestamp, event_type string, value double, user_id long",
    )
    # batch frames: watermark is a no-op but the parameter must thread
    assert windows.sliding_counts(df, watermark="10 minutes").count() > 0
    assert windows.session_counts(df, watermark="10 minutes").count() > 0


def test_fold_matches_row_at_a_time_semantics():
    # duplicate seqs within a batch: first in input order wins; late
    # (seq <= last_seq) events bump n_events but never regress state;
    # REMOVE rows carry null price and must not erase the last price
    b1 = pd.DataFrame({"seq": [3, 1, 3, 2], "price": [9.0, 1.0, 777.0, None]})
    last_seq, n, price = _fold(None, 0, None, iter([b1]))
    assert (last_seq, n, price) == (3, 4, 9.0)
    b2 = pd.DataFrame({"seq": [2, 5, 4], "price": [666.0, None, 4.5]})
    last_seq, n, price = _fold(last_seq, n, price, iter([b2]))
    # seq 2 is late (ignored for state), 4 then 5 advance; 5's null
    # price keeps 4.5
    assert (last_seq, n, price) == (5, 7, 4.5)


def test_listener_progress_is_bounded():
    lst = listener.CountParityListener(keep_last=3)

    class _P:
        def __init__(self, i):
            self.name = "q"
            self.id = "id"
            self.batchId = i
            self.numInputRows = 10

    class _E:
        def __init__(self, i):
            self.progress = _P(i)

    for i in range(10):
        lst.onQueryProgress(_E(i))
    assert len(lst.progress) == 3
    assert listener.total_rows_seen(lst) == 100
