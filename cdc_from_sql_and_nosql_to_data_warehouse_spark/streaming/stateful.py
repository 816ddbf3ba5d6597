"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY.md §2.2 B36 family; the north-star's named mechanism for
operators Structured Streaming lacks natively).

The example operator is a per-key CDC apply with running statistics:
for each key it keeps (last_seq, n_events, last_price) across
micro-batches — i.e. the DynamoDB-table state of the reference's
upsert pipeline, maintained inside the state store instead of an
external database.  State is partitioned by key, so it scales with
keys/executor, and the GroupStateTimeout can bound it.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "last_seq long, n_events long, last_price double"
OUTPUT_SCHEMA = "id string, last_seq long, n_events long, last_price double"


def _fold(last_seq, n_events, last_price, batches):
    """ONE definition of the per-key CDC fold, shared by BOTH stateful
    APIs (was copy-pasted with stylistic drift — review-caught) and
    VECTORIZED: per-row ``iterrows`` materializes a Series per event,
    the slowest iteration form pandas has, and a skewed hot key's
    micro-batch would spend its task time there.  Semantics preserved
    exactly: events sorted by seq; only events with seq above the
    running high-water mark advance it; among those, the last
    non-null price in seq order wins; late/duplicate events (seq <=
    last_seq, including equal seqs WITHIN a batch — stable sort +
    keep='first' reproduces the row-at-a-time guard) bump the event
    count but never regress state."""
    for pdf in batches:
        n_events += len(pdf)
        sel = pdf if last_seq is None else pdf[pdf["seq"] > last_seq]
        if len(sel):
            sel = sel.sort_values("seq", kind="stable").drop_duplicates(
                "seq", keep="first"
            )
            last_seq = int(sel["seq"].iloc[-1])
            prices = sel["price"].dropna()
            if len(prices):
                last_price = float(prices.iloc[-1])
    return last_seq, n_events, last_price


def _fold_output(key, last_seq, n_events, last_price) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "id": [key[0]],
            "last_seq": [last_seq],
            "n_events": [n_events],
            "last_price": [last_price],
        }
    )


def _apply_key_state(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    # no-state ⇒ last_seq None (NOT 0): a strict seq > 0 guard would
    # silently drop a legitimate first event with seq <= 0
    if state.exists:
        last_seq, n_events, last_price = state.get
    else:
        last_seq, n_events, last_price = None, 0, None
    last_seq, n_events, last_price = _fold(last_seq, n_events, last_price, batches)
    state.update((last_seq, n_events, last_price))
    yield _fold_output(key, last_seq, n_events, last_price)


def keyed_cdc_state(changes: DataFrame) -> DataFrame:
    """Stateful per-key CDC aggregate over a stream of
    (id, seq, price) change rows."""
    return changes.groupBy("id").applyInPandasWithState(
        _apply_key_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------
# transformWithState (Spark 4.x): the successor API to
# applyInPandasWithState.  Same per-key CDC semantics as
# keyed_cdc_state above, expressed as a StatefulProcessor with a
# typed ValueState cell.  What the new API adds over GroupState, and
# why it is the 100 TB posture going forward:
#   - composable named state (multiple value/list/map cells per key)
#     instead of one monolithic tuple;
#   - per-state TTL (ttlDurationMs) enforced by the state store itself
#     — retention (reference A16) without a cleanup job;
#   - timers (registerTimer) for event-driven emission;
#   - works on top of the RocksDB state-store provider unchanged.
# Environment note: the python worker protocol for transformWithState
# rides on protobuf, which this container does not ship; the test
# (tests/test_stateful_and_skew.py) importorskips accordingly.  The
# operator uses only public pyspark API and runs unmodified where
# protobuf is present.
from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)


class KeyedCdcProcessor(StatefulProcessor):
    """Per-key (last_seq, n_events, last_price) maintained in a
    ValueState cell; late/duplicate events (seq <= last_seq) bump the
    event count but never regress the latest-wins state — the same
    guard as _apply_key_state."""

    def __init__(self, ttl_ms: int | None = None) -> None:
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "cdc", STATE_SCHEMA, ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(self, key, rows, timerValues):
        if self._state.exists():
            last_seq, n_events, last_price = self._state.get()
        else:
            last_seq, n_events, last_price = None, 0, None
        last_seq, n_events, last_price = _fold(last_seq, n_events, last_price, rows)
        self._state.update((last_seq, n_events, last_price))
        yield _fold_output(key, last_seq, n_events, last_price)

    def close(self) -> None:
        pass


def keyed_cdc_transform_with_state(
    changes: DataFrame, ttl_ms: int | None = None
) -> DataFrame:
    """keyed_cdc_state on the transformWithState API: state cells are
    named, typed, and TTL-bounded by the store itself."""
    return changes.groupBy("id").transformWithStateInPandas(
        statefulProcessor=KeyedCdcProcessor(ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
