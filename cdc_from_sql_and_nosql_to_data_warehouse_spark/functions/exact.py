"""Exact-arithmetic aggregation helpers.

The driver's correctness gate hashes values produced by Spark against a
DuckDB oracle (repo:__spark_entry__.py docstring).  Floating-point SUM is
order-dependent, and Spark/DuckDB will not sum partitions in the same
order — so every money-ish aggregate goes through DECIMAL, which is
exact and associative, and is cast to DOUBLE only at the very end
(decimal→double is a deterministic nearest-double conversion, identical
in both engines).  SURVEY.md §7.4.2 flags this as a hard part.

The testdata money columns are 2-decimal doubles (verified by probe),
so DECIMAL(12,2) round-trips them exactly.  At 100 TB this policy also
holds: decimal sums are Tungsten-native and whole-stage-codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, prec: int = 12, scale: int = 2) -> Column:
    """Exact 2-dp money value as DECIMAL."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},{scale})")


def dsum(col: Column | str, prec: int = 12, scale: int = 2) -> Column:
    """Order-insensitive exact SUM of a money column, as DOUBLE."""
    return F.sum(dec(col, prec, scale)).cast("double")


def davg(col: Column | str, prec: int = 12, scale: int = 2) -> Column:
    """Exact-sum / count average (double division of identical operands
    is bitwise deterministic across engines).  Divides by the NON-NULL
    count — AVG semantics — not COUNT(*): on a nullable column (e.g.
    parse_money output, where blanks are NULL by design) dividing by
    all rows silently underestimates (review-caught)."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, prec, scale) / F.count(c)


# Matching DuckDB SQL fragments (oracle side of the same policy).
def sql_dsum(expr: str, prec: str = "12,2") -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL({prec}))) AS DOUBLE)"


def sql_davg(expr: str, prec: str = "12,2") -> str:
    return f"{sql_dsum(expr, prec)} / COUNT({expr})"
