"""NULL document-metadata fixture (round-4 sweep #7).

The dirty-text sweep perturbed `text` but left lang/source/n_chars
intact, so every per-language window, per-source budget/mixture
weight join, and length-based gate ran only over non-NULL metadata.
The dangerous asymmetry is the same one the as-of/SCD2 sweep caught: a
window PARTITION BY groups NULL keys together while the oracle's
equi-join drops them, so an operator decomposed either way must agree
with its oracle under NULL keys.  NULLs a residue class of all three
metadata columns and replays every documents oracle.
"""

from __future__ import annotations

import shutil

import duckdb
import pytest

from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import REGISTRY

from conftest import SF_DIR, TABLES
from test_oracle_diff import replay_oracle_parity

QUERIES = sorted(
    n for n, s in REGISTRY.items() if s.oracle and "documents" in s.oracle
)


@pytest.fixture(scope="module")
def null_meta_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("nullmeta")
    for t in TABLES:
        if t == "documents":
            continue
        shutil.copy(f"{SF_DIR}/{t}.parquet", d / f"{t}.parquet")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (SELECT * REPLACE (
            CASE WHEN doc_id % 29 = 3 THEN NULL ELSE lang END AS lang,
            CASE WHEN doc_id % 37 = 5 THEN NULL ELSE source END AS source,
            CASE WHEN doc_id % 43 = 7 THEN NULL ELSE n_chars END AS n_chars)
          FROM '{SF_DIR}/documents.parquet') TO '{d / "documents.parquet"}' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(d)


@pytest.mark.slow
def test_null_doc_meta_oracle_parity(spark, null_meta_dir):
    failures = replay_oracle_parity(spark, null_meta_dir, QUERIES)
    assert not failures, failures


def test_malformed_source_still_raises(spark, tmp_path):
    """NULL source is absence (parses to NULL); a malformed non-NULL
    source is corruption and must stay loud."""
    d = tmp_path / "badsrc"
    d.mkdir()
    con = duckdb.connect()
    for t in TABLES:
        src = f"{SF_DIR}/{t}.parquet"
        if t == "documents":
            con.execute(
                f"""
                COPY (SELECT * REPLACE (
                    CASE WHEN doc_id % 100 = 1 THEN 'weird' ELSE source END AS source)
                  FROM '{src}') TO '{d / "documents.parquet"}' (FORMAT PARQUET)
                """
            )
        else:
            shutil.copy(src, d / f"{t}.parquet")
    con.close()
    with pytest.raises(Exception, match="unparseable source"):
        REGISTRY["q_cross_dedup"].fn(spark, str(d)).collect()
