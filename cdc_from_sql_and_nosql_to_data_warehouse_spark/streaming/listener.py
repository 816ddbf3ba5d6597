"""Streaming observability (SURVEY.md §2.1 A20/§3.3): per-batch row
counts via StreamingQueryListener — the engine's CloudWatch-print
analog, implemented as intended (the reference's target count is
executed but never fetched,
source/start_dms_replication_task_lambda/handler.py:52-57)."""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQueryListener


class CountParityListener(StreamingQueryListener):
    """Collects per-query input row counts per micro-batch; pair with
    cdc.count_parity for source/target lag reporting.

    The per-batch detail is a BOUNDED deque (keep_last, default 1000):
    on a long-running session with a fast trigger an unbounded list is
    a driver-side memory leak (review-caught).  The running total is a
    counter, so ``total_rows_seen`` never depends on retained detail."""

    def __init__(self, keep_last: int = 1000) -> None:
        from collections import deque

        self.progress: deque[dict] = deque(maxlen=keep_last)
        self.total_input_rows: int = 0

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.total_input_rows += p.numInputRows
        self.progress.append(
            {
                "query": p.name or p.id,
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
            }
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def total_rows_seen(listener: CountParityListener) -> int:
    return listener.total_input_rows


def observed_load(df, name: str = "load", key: str | None = None):
    """A20/A21 in-flight metrics: attach an Observation that counts
    rows (and null keys, when ``key`` is given) DURING the action that
    consumes ``df`` — the reference's check_data_lambda re-queries the
    warehouse for COUNT(*) after the load (a second scan); an
    Observation rides the same pass for free and works identically on
    a 1000-executor cluster (metrics are merged task-side like any
    aggregate).

    Returns (observed_df, observation).  Batch: read
    ``observation.get`` after an action on observed_df.  Streaming:
    ``Observation`` objects are rejected by Spark for streaming
    Datasets (review-caught — the previous form raised right here), so
    the metrics are attached under the plain string ``name`` and
    surface per-batch in ``QueryProgressEvent.observedMetrics[name]``;
    the returned observation is None.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    metrics = [F.count(F.lit(1)).alias("rows")]
    if key is not None:
        metrics.append(
            F.count(F.when(F.col(key).isNull(), 1)).alias("null_keys")
        )
    if df.isStreaming:
        return df.observe(name, *metrics), None
    obs = Observation(name)
    return df.observe(obs, *metrics), obs
