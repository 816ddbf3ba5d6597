"""Pin the measured lower() divergence surface between Java (Spark)
and DuckDB (round-4 probe).

Two Unicode classes diverge and cannot be unified without
reimplementing case mapping: U+0130 (Turkish dotted capital I — Java
produces i + U+0307, DuckDB plain i) and Greek capital sigma in final
position (Java context-sensitively emits U+03C2, DuckDB always
U+03C3).  Every other class in the battery (sharp-s, titlecase
digraphs, fullwidth forms, Cyrillic, Latin accents) matches.  If an
engine upgrade shifts this surface, this test fails and the oracle
fixtures' unicode policy (keep Σ/İ out) must be revisited.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

MATCHING = ["ıI", "STRASSE ẞ ß", "ǅungla ǆ", "ABCÉÀÜ", "ＡＢＣ", "ЉЊЏ", "über 中文"]
DIVERGING = {
    "İstanbul": ("i̇stanbul", "istanbul"),   # (java, duckdb)
    "ΣΙΣΥΦΟΣ": ("σισυφος", "σισυφοσ"),
}


def _spark_lower(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    return [r[0] for r in df.select(F.lower("t")).collect()]


def test_lower_parity_on_matching_classes(spark):
    got = _spark_lower(spark, MATCHING)
    want = [duckdb.sql("SELECT lower(?)", params=[t]).fetchone()[0] for t in MATCHING]
    assert got == want


def test_lower_divergence_surface_is_exactly_the_known_two(spark):
    texts = list(DIVERGING)
    sp = _spark_lower(spark, texts)
    du = [duckdb.sql("SELECT lower(?)", params=[t]).fetchone()[0] for t in texts]
    for t, s, d in zip(texts, sp, du):
        exp_s, exp_d = DIVERGING[t]
        assert s == exp_s, (t, s)
        assert d == exp_d, (t, d)
