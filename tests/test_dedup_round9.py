"""Round-9 dedup additions.

q_dedup_cross_spans vs q_dedup_spans: on the shipped fixture the two
signals coincide (its duplicated spans are all cross-doc clones), so
this test constructs the corpus that separates them — WITHIN-doc
repetition (a chorus) must flag only the bag-multiplicity detector,
while cross-doc boilerplate flags both.
"""

from __future__ import annotations

from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.dedup import (
    q_dedup_cross_spans,
    q_dedup_spans,
)

_CHORUS = "alpha beta gamma delta epsilon zeta eta theta"  # exactly 8 tokens
_BOILER = "one two three four five six seven eight"  # exactly 8 tokens


def _write_docs(spark, tmp_path) -> str:
    rows = [
        # doc 1: the chorus twice (within-doc repetition, no sharing)
        (1, f"{_CHORUS} filler1a filler1b {_CHORUS}", "en", "s", 0),
        # docs 2+3: each contains the boilerplate once (cross-doc)
        (2, f"{_BOILER} unique2a unique2b unique2c", "en", "s", 0),
        (3, f"unique3a unique3b unique3c {_BOILER}", "en", "s", 0),
        # doc 4: all-unique control
        (4, "u4a u4b u4c u4d u4e u4f u4g u4h u4i", "en", "s", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def test_cross_spans_ignores_within_doc_repetition(spark, tmp_path):
    sf = _write_docs(spark, tmp_path)
    spans = {r["doc_id"]: r for r in q_dedup_spans(spark, sf).collect()}
    cross = {r["doc_id"]: r for r in q_dedup_cross_spans(spark, sf).collect()}
    # doc 1's repeated chorus: bag-multiplicity flags it ...
    assert spans[1]["n_dup_windows"] > 0
    # ... but no OTHER document shares those windows
    assert cross[1]["n_cross_windows"] == 0
    # the shared boilerplate flags BOTH detectors on docs 2 and 3
    for d in (2, 3):
        assert spans[d]["n_dup_windows"] > 0
        assert cross[d]["n_cross_windows"] > 0
    # control stays clean everywhere
    assert spans[4]["n_dup_windows"] == 0
    assert cross[4]["n_cross_windows"] == 0
    # distinct-window accounting: doc 1 has 11 windows (18 tokens) but
    # only 10 DISTINCT window hashes (the chorus window repeats)
    assert spans[1]["n_windows"] == 11
    assert cross[1]["n_distinct_windows"] == 10
