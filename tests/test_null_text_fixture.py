"""NULL / non-ASCII text fixture (round-4 review of udfs/multimodal).

The shipped documents table is all-ASCII with no NULL text, so three
kernels were certified vacuously: q_udf_scalar's pandas UDF crashed the
job on NULL text (len(None)) and silently used unicode-whitespace
splitting; both multimodal mapInPandas kernels crashed on a NULL
payload; and q_multimodal_decode's checksum read the first BYTE while
its oracle read the first CODEPOINT — divergent on any leading
non-ASCII character.  This fixture injects NULL-text and non-ASCII
rows and replays the oracle diff for the affected operators.
"""

from __future__ import annotations

import shutil

import duckdb
import pytest

from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import REGISTRY

from conftest import SF_DIR, TABLES
from test_oracle_diff import replay_oracle_parity

# EVERY oracle-bearing query over the documents table replays on the
# dirty fixture — the systematic sweep that caught q_pmi_skipgram's
# empty-doc element_at crash, the explode_outer/regexp_extract_all
# NULL-vs-'' divergences, the BPE char-split dot-excludes-U+2028
# divergence, and the langid NULL-text verdict split.
QUERIES = sorted(
    n for n, s in REGISTRY.items() if s.oracle and "documents" in s.oracle
)


@pytest.fixture(scope="module")
def dirty_text_dir(tmp_path_factory):
    """sf0.001 testdata with 6 extra documents: NULL text, empty text,
    leading non-ASCII (ü / 中), unicode whitespace (\\xa0, \\u2028)."""
    d = tmp_path_factory.mktemp("dirtytext")
    for t in TABLES:
        if t == "documents":
            continue
        shutil.copy(f"{SF_DIR}/{t}.parquet", d / f"{t}.parquet")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT * FROM '{SF_DIR}/documents.parquet'
          UNION ALL BY NAME
          SELECT * FROM (
            SELECT maxid + i AS doc_id, t AS text, lang, source, n_chars
            FROM (SELECT max(doc_id) AS maxid, any_value(lang) AS lang,
                         any_value(source) AS source, 7 AS n_chars
                  FROM '{SF_DIR}/documents.parquet'),
            (VALUES (1, NULL), (2, ''), (3, 'über alles'),
                    (4, '中文 text here'), (5, 'nbsp' || chr(160) || 'joined'),
                    (6, 'line' || chr(8232) || 'sep')) v(i, t)
          )
        ) TO '{d / "documents.parquet"}' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(d)


@pytest.mark.slow
def test_dirty_text_oracle_parity(spark, dirty_text_dir):
    failures = replay_oracle_parity(spark, dirty_text_dir, QUERIES)
    assert not failures, failures


def test_write_zordered_empty_input(spark, tmp_path):
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.layout import (
        write_zordered,
    )

    empty = spark.createDataFrame([], "x bigint, y bigint, v string")
    out = str(tmp_path / "z")
    write_zordered(empty, "x", "y", out, partitions=2)
    assert spark.read.parquet(out).count() == 0
