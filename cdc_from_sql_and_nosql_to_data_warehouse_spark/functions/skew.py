"""Skew-handling join utilities (SURVEY.md §4.3).

AQE's skew-join splitting handles most cases at runtime; explicit
salting is the deterministic fallback when one key dominates so hard
that even split partitions overwhelm an executor (the classic
null-key / celebrity-key problem at 100 TB).

``salted_join`` replicates the *small* side SALT_N times and scatters
the big side's hot keys across SALT_N partitions; the join stays equi
(on key + salt), so Catalyst still plans a hash join and the hot key's
rows spread over SALT_N tasks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str | list[str],
    small_key: str | list[str],
    salt_n: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salt: big side gets a deterministic salt in
    [0, salt_n); small side is exploded ×salt_n.  Result is identical
    to ``big.join(small, on=<keys>, how)`` for inner/left joins.
    Accepts composite keys (lists); small-side key columns whose names
    match the big side are dropped, mirroring the list-``on`` join."""
    from pyspark.sql.types import MapType

    if how not in ("inner", "left"):
        # right/full would be silently WRONG: the exploded small side
        # holds salt_n copies of every row, and an unmatched small row
        # fails the join condition salt_n times — surviving salt_n
        # times in the preserved side (review-caught: full join
        # returned 8 rows where plain returned 2).  Deduplicating the
        # preserved side post-join costs more than the skew it avoids;
        # flip the sides and use 'left', or let AQE skew-split handle it.
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "the replicated small side would duplicate unmatched "
            "preserved rows salt_n times under right/full joins"
        )
    big_keys = [big_key] if isinstance(big_key, str) else list(big_key)
    small_keys = [small_key] if isinstance(small_key, str) else list(small_key)
    # the salt must vary WITHIN a key or salting is a no-op: a salt
    # derived from the join key alone maps every row of the hot key to
    # one constant, landing them all in the same task anyway while the
    # small side still pays ×salt_n replication (review-caught — the
    # original form hashed only the key columns).  The hash mixes the
    # non-key payload (map-typed columns excluded — xxhash64 rejects
    # MapType at analysis time, advisory r3) WITH the physical position
    # (partition id + in-partition id): payload alone leaves exact
    # duplicate rows of a hot key on one salt/task — the celebrity-key
    # case is exactly where duplicates are likely (review-caught).
    # Join RESULTS are salt-independent; mixing in position trades only
    # placement determinism, never output rows.
    hashable = [
        F.col(f.name)
        for f in big.schema.fields
        if not isinstance(f.dataType, MapType) and f.name not in big_keys
    ]
    salt_src = F.xxhash64(
        *hashable, F.spark_partition_id(), F.monotonically_increasing_id()
    )
    salted_big = big.withColumn("__salt", F.pmod(salt_src, F.lit(salt_n)))
    # replicating the small side is a flatMap, not a shuffle
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_n)]))
    )
    cond = salted_big["__salt"] == salted_small["__salt"]
    for bk, sk in zip(big_keys, small_keys):
        cond = cond & (salted_big[bk] == salted_small[sk])
    out = salted_big.join(salted_small, cond, how)
    for bk, sk in zip(big_keys, small_keys):
        if bk == sk:
            out = out.drop(salted_small[sk])
    return out.drop("__salt")


def key_histogram(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Skew diagnosis: the top-N heaviest keys and their share.

    One scan of the input: the total row count is the sum over the
    (already aggregated, |distinct keys|-sized) counts frame — a
    separate ``df.count()`` would double the I/O of a diagnostic call
    at 100 TB.  The counts frame is checkpointed (post-aggregate, tiny)
    so the two consumers don't re-execute the scan."""
    counts = (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    total = counts.agg(F.sum("n").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("share", F.col("n") / F.col("__total").cast("double"))
        .drop("__total")
        .orderBy(F.col("n").desc())
        .limit(top)
    )
