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
    big_key: str,
    small_key: str,
    salt_n: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salt: big side gets a deterministic salt in
    [0, salt_n); small side is exploded ×salt_n.  Result is identical
    to ``big.join(small, big[big_key] == small[small_key], how)`` for
    inner/left joins."""
    salted_big = big.withColumn("__salt", F.pmod(F.hash(F.col(big_key)), F.lit(salt_n)))
    # replicating the small side is a flatMap, not a shuffle
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_n)]))
    )
    out = salted_big.join(
        salted_small,
        (salted_big[big_key] == salted_small[small_key])
        & (salted_big["__salt"] == salted_small["__salt"]),
        how,
    )
    return out.drop("__salt")


def key_histogram(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Skew diagnosis: the top-N heaviest keys and their share."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("share", F.col("n") / F.lit(float(total)))
        .orderBy(F.col("n").desc())
        .limit(top)
    )
