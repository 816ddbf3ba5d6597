"""Ordering-tie fixture (round-4 sweep #5).

The shipped events table has globally unique timestamps and the
embeddings table has no duplicate vectors, so every ORDER BY ts window
and every similarity top-k was certified without a single tie — the
determinism of the tie-breaks was never exercised.  This fixture
floors event timestamps onto a 1-day grid (1000 events collapse to
~400 distinct (user, ts) pairs — mass ties on every time-ordering key) and copies each vec_id%20==3 embedding from its
predecessor row (exact score ties in cosine top-k), then replays every
events/embeddings oracle.  A query whose window or top-k lacks a
deterministic tie-break is nondeterministic in BOTH engines under
ties — the class of bug that makes the driver's hash gate randomly
flaky rather than reliably red.
"""

from __future__ import annotations

import shutil

import duckdb
import pytest

from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import REGISTRY

from conftest import SF_DIR, TABLES
from test_oracle_diff import replay_oracle_parity

QUERIES = sorted(
    n
    for n, s in REGISTRY.items()
    if s.oracle and ("events" in s.oracle or "embeddings" in s.oracle)
)


@pytest.fixture(scope="module")
def tied_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiedts")
    for t in TABLES:
        if t in ("events", "embeddings"):
            continue
        shutil.copy(f"{SF_DIR}/{t}.parquet", d / f"{t}.parquet")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (SELECT * REPLACE (time_bucket(INTERVAL '1 day', ts) AS ts)
          FROM '{SF_DIR}/events.parquet') TO '{d / "events.parquet"}' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT e.vec_id,
                 COALESCE(p.embedding, e.embedding) AS embedding,
                 e.label
          FROM '{SF_DIR}/embeddings.parquet' e
          LEFT JOIN '{SF_DIR}/embeddings.parquet' p
            ON e.vec_id % 20 = 3 AND p.vec_id = e.vec_id - 1
          ORDER BY e.vec_id
        ) TO '{d / "embeddings.parquet"}' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(d)


@pytest.mark.slow
def test_tie_collision_oracle_parity(spark, tied_dir):
    failures = replay_oracle_parity(spark, tied_dir, QUERIES)
    assert not failures, failures
