"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API):
a deterministic keyed change-feed generator.

The reference consumes a DynamoDB Stream — a keyed feed of
INSERT/MODIFY/REMOVE events with sequence numbers (reference:
source/write_dynamodb_stream_to_s3_lambda/handler.py iterates stream
records).  Spark has no built-in connector for that feed; the Python
DataSource API is exactly the extension point for sources like it: the
connector declares SCHEMA + PARTITIONS, and each partition's `read`
runs data-parallel on executors (Arrow-batched back to the JVM).

This implementation generates the feed deterministically (md5-driven,
no RNG state) instead of calling a live endpoint — the same role the
`rate` source plays for throughput testing, but keyed and CDC-shaped,
so every upsert/merge/dedup operator can be exercised against a
replayable stream of known cardinality with NO files and NO services.
Swapping the generator body for real API calls (boto3 pagination over
shard iterators) changes nothing about the Spark-side contract:
partition planning, schema, and the executor-side iterator stay as-is.

Scale posture: one InputPartition per shard → Spark schedules shards
across executors; the generator yields plain tuples lazily (no
materialized batch), so memory per task is O(1) rows.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_OPS = ("INSERT", "MODIFY", "REMOVE")


def _h(*parts: object) -> int:
    """Stable 60-bit hash — same engine-portable md5 trick as
    functions/ids.py, usable from plain Python on executors."""
    s = ":".join(str(p) for p in parts)
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


class ChangeFeedDataSource(DataSource):
    """`spark.read.format("cdc_changefeed")` after
    `spark.dataSource.register(ChangeFeedDataSource)`.

    Options:
      shards       number of stream shards = input partitions (default 4)
      per_shard    events per shard (default 1000)
      keys         distinct entity ids across the feed (default 100)
      seed         feed epoch; a different seed is a different feed
    """

    @classmethod
    def name(cls) -> str:
        return "cdc_changefeed"

    def schema(self) -> str:
        return "seq bigint, shard int, op string, id string, price double"

    def reader(self, schema) -> "ChangeFeedReader":
        return ChangeFeedReader(self.options)


class ChangeFeedReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self._shards = int(options.get("shards", 4))
        self._per_shard = int(options.get("per_shard", 1000))
        self._keys = int(options.get("keys", 100))
        self._seed = int(options.get("seed", 0))

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(i) for i in range(self._shards)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        shard = partition.value
        for i in range(self._per_shard):
            h = _h(self._seed, shard, i)
            # sequence numbers are globally unique and ordered per shard,
            # like DynamoDB stream SequenceNumbers within a shard
            seq = shard * self._per_shard + i
            key = f"k{h % self._keys:05d}"
            op = _OPS[(h >> 8) % 3]
            price = None if op == "REMOVE" else round((h >> 16) % 100000 / 100.0, 2)
            yield (seq, shard, op, key, price)


def register(spark) -> None:
    """Idempotent-enough registration (re-registering overwrites)."""
    spark.dataSource.register(ChangeFeedDataSource)
