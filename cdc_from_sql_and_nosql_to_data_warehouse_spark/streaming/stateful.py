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
