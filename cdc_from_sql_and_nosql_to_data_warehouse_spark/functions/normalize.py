"""Typed-parse dialect of the reference's stringly data (SURVEY.md §1.2).

The reference stores everything as varchar(40)
(source/configure_rds_lambda/handler.py:46): money as padded
comma-grouped strings (``"  1,000,000.00 "``), dates as ``d-MMM-yy``
(``29-Jun-17``), booleans as ``TRUE``/``FALSE`` (txns.csv).  These are
the inverse parsers — pure JVM-side column expressions (no UDFs), so
they stay inside whole-stage codegen.

All parsers use ``try_cast``/``try_to_timestamp`` so the documented
malformed→NULL contract holds regardless of ``spark.sql.ansi.enabled``
(Spark 4 defaults it ON, under which a plain cast ABORTS the job on the
first dirty cell — exactly what a 100 TB ingest of crawl-grade CSV must
never do).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def parse_money(col: Column | str, prec: int = 18, scale: int = 2) -> Column:
    """``"  1,000,000.00 "`` → DECIMAL.  Empty/blank string → NULL
    (reference CSV uses empty string for NULL, txns.csv:2)."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(F.trim(c), ",", "")
    return F.when(cleaned == "", None).otherwise(cleaned).try_cast(f"decimal({prec},{scale})")


def parse_date_dmmm(col: Column | str, fmt: str = "d-MMM-yy") -> Column:
    """``29-Jun-17`` → DATE.  Note the two-digit-year pivot: Java's
    ``yy`` reads 17 as 2017 (base 2000); pass ``d-MMM-yyyy`` for
    four-digit years."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(F.trim(c), F.lit(fmt)).cast("date")


def parse_bool(col: Column | str) -> Column:
    """``TRUE``/``FALSE`` (any case) → BOOLEAN; blank → NULL."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.upper(F.trim(c))
    return F.when(t == "", None).otherwise(t.try_cast("boolean"))


def typed_parse(df: DataFrame, spec: dict[str, str]) -> DataFrame:
    """Apply a {column: kind} spec where kind ∈ {money, date, date4,
    bool, string, int, double}.  Unlisted columns pass through."""
    kinds = {
        "money": parse_money,
        "date": parse_date_dmmm,
        "date4": lambda c: parse_date_dmmm(c, "d-MMM-yyyy"),
        "bool": parse_bool,
        "string": lambda c: F.trim(F.col(c) if isinstance(c, str) else c),
        "int": lambda c: (F.col(c) if isinstance(c, str) else c).try_cast("long"),
        "double": lambda c: (F.col(c) if isinstance(c, str) else c).try_cast("double"),
    }
    cols = [
        kinds[spec[c]](c).alias(c) if c in spec else F.col(c)
        for c in df.columns
    ]
    return df.select(*cols)


def stringly(df: DataFrame) -> DataFrame:
    """The reference's forward direction: every column → string
    (all-varchar tables, SURVEY.md §2.1 A3)."""
    return df.select(*[F.col(c).cast("string").alias(c) for c in df.columns])


def loud_src_n(col: Column | str, qname: str) -> Column:
    """Parse the numeric suffix of a ``srcNN`` source tag, loudly but
    NULL-tolerantly: NULL source is absence and parses to NULL (it
    then fails both role filters exactly as the oracle's
    CAST(substr(NULL, 4) AS INT) does), while a malformed OR
    int-overflowing non-NULL source raises — corruption must never
    silently vanish from a dedup/drift decision.  The overflow check
    matters: a digits-only suffix past 2^31 try_casts to NULL, and
    without it the "loud" guard would silently classify by nothing
    (review-caught: the earlier form also TRUNCATED to 10 chars, so an
    11-digit suffix was misclassified by its prefix instead of
    raising, where DuckDB's CAST errors)."""
    c = F.col(col) if isinstance(col, str) else col
    suffix = F.substring(c, 4, 2_000_000_000)
    parsed = suffix.try_cast("int")
    return (
        F.when(c.isNull(), F.lit(None).cast("int"))
        .when(suffix.rlike(r"^\d+$") & parsed.isNotNull(), parsed)
        .otherwise(
            F.raise_error(
                F.concat(F.lit(f"{qname}: unparseable source "), c)
            ).cast("int")
        )
    )
