"""Streaming observability (SURVEY.md §2.1 A20/§3.3): per-batch row
counts via StreamingQueryListener — the engine's CloudWatch-print
analog, implemented as intended (the reference's target count is
executed but never fetched,
source/start_dms_replication_task_lambda/handler.py:52-57)."""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQueryListener


class CountParityListener(StreamingQueryListener):
    """Collects per-query input row counts per micro-batch; pair with
    cdc.count_parity for source/target lag reporting."""

    def __init__(self) -> None:
        self.progress: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
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
    return sum(p["num_input_rows"] for p in listener.progress)
