"""Sampled-oracle protocol (VERDICT r10 next-2).

The AllPairs operators' textbook oracles are deliberately quadratic and
infeasible at blowup SFs; ``operators.SAMPLED_ORACLES`` recovers VALUE
checks there by comparing the engine's full output restricted to the
deterministic md5(doc_id) slice against the exact DuckDB truth computed
over the slice.  These tests pin:

1. non-vacuous agreement — a synthetic corpus with known in-slice
   near-duplicate pairs produces >0 restricted rows that hash-match the
   sampled oracle exactly;
2. soundness of the restriction — the restricted frame is a subset of
   the full output (the protocol audits, never recomputes);
3. slice determinism — in-slice membership is a pure function of
   doc_id, identical in Spark and DuckDB.
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from cdc_from_sql_and_nosql_to_data_warehouse_spark import operators as ops

# integers whose md5(str(i)) < '10' — inside the 1/16 slice
IN_SLICE = [27, 59, 60, 63, 119, 126]
OUT_SLICE = [1, 2, 3, 4]

_BASE = ("the quick brown fox jumps over the lazy dog while seven "
         "wizards brew strong potions under a pale winter moon near "
         "the old stone bridge by the river bend").split()


def _doc(i: int, mutate: int = 0) -> str:
    toks = list(_BASE)
    for k in range(mutate):
        toks[(7 * k + 3) % len(toks)] = f"mut{i}x{k}"
    return " ".join(toks)


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    """documents.parquet with two in-slice near-dup pairs, one
    cross-slice near-dup pair, and unrelated out-of-slice docs."""
    rows = [
        # near-dup pair fully inside the slice (1 mutation ≈ J > 0.8)
        (IN_SLICE[0], _doc(0, 0)),
        (IN_SLICE[1], _doc(0, 1)),
        # second in-slice near-dup pair
        (IN_SLICE[2], _doc(1, 0).replace("fox", "wolf")),
        (IN_SLICE[3], _doc(1, 1).replace("fox", "wolf")),
        # cross-slice near-dup: must appear in FULL output but NOT in
        # the restricted/sampled comparison
        (IN_SLICE[4], _doc(2, 0).replace("moon", "star")),
        (OUT_SLICE[0], _doc(2, 1).replace("moon", "star")),
        # unrelated out-of-slice noise
        (OUT_SLICE[1], " ".join(f"alpha{j} beta{j} gamma{j}" for j in range(20))),
        (OUT_SLICE[2], " ".join(f"delta{j} eps{j} zeta{j}" for j in range(20))),
    ]
    d = tmp_path_factory.mktemp("sampled_corpus")
    spark.createDataFrame(
        [(i, t, len(t)) for i, t in rows],
        "doc_id long, text string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def _duck_rows(sql: str, sf_dir: str):
    con = duckdb.connect()
    # Spark-written table = a part-file dir (replay_driver's rule)
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet/*.parquet'"
    )
    cur = con.execute(sql)
    names = [c[0] for c in cur.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    rows = sorted(tuple(r[i] for i in order) for r in cur.fetchall())
    con.close()
    return sorted(names), rows


def _spark_rows(df):
    cols = sorted(df.columns)
    return cols, sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", ["q_setsim_join", "q_dedup_containment"])
def test_sampled_matches_and_is_nonvacuous(spark, corpus_dir, name):
    samp = ops.SAMPLED_ORACLES[name]
    full = ops.REGISTRY[name].fn(spark, corpus_dir)
    restricted = samp.restrict(full)
    scols, srows = _spark_rows(restricted)
    ocols, orows = _duck_rows(samp.oracle, corpus_dir)
    assert scols == ocols
    assert srows == orows
    # the two in-slice near-dup pairs make the check non-vacuous
    assert len(srows) >= 2, "sampled slice produced no pairs — vacuous check"


@pytest.mark.parametrize("name", ["q_setsim_join", "q_dedup_containment"])
def test_restriction_is_a_subset_and_drops_cross_slice(spark, corpus_dir, name):
    samp = ops.SAMPLED_ORACLES[name]
    full = ops.REGISTRY[name].fn(spark, corpus_dir)
    _, frows = _spark_rows(full)
    _, rrows = _spark_rows(samp.restrict(ops.REGISTRY[name].fn(spark, corpus_dir)))
    assert set(rrows) <= set(frows)
    # the cross-slice near-dup pair is in the full output...
    cross = {r for r in frows if OUT_SLICE[0] in (r[0], r[1])}
    assert cross, "cross-slice near-dup pair missing from full output"
    # ...but excluded from the sampled comparison (both endpoints must
    # be in-slice)
    assert not any(OUT_SLICE[0] in (r[0], r[1]) for r in rrows)


def test_slice_membership_matches_python_md5():
    """The slice predicate both engines evaluate is md5 of the decimal
    string — pin the Python ground truth for the fixture ids."""
    for i in IN_SLICE:
        assert hashlib.md5(str(i).encode()).hexdigest() < "10"
    for i in OUT_SLICE:
        assert hashlib.md5(str(i).encode()).hexdigest() >= "10"


def test_registry_shape():
    assert set(ops.SAMPLED_ORACLES) >= {"q_setsim_join", "q_dedup_containment"}
    for name, samp in ops.SAMPLED_ORACLES.items():
        assert name in ops.REGISTRY
        assert samp.note
