"""Semantic invariants for the round-3 curation additions (the oracle
diff in test_oracle_diff.py checks cross-engine equality; these check
the properties that make the operators *meaningful*)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_from_sql_and_nosql_to_data_warehouse_spark import operators as ops

from conftest import SF_DIR


def _run(spark, name):
    return ops.REGISTRY[name].fn(spark, SF_DIR)


def test_dedup_segments_invariants(spark):
    rows = _run(spark, "q_dedup_segments").collect()
    assert rows, "non-empty corpus must yield per-doc rows"
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_segs"]
        assert abs(r["frac_kept"] - r["n_kept"] / r["n_segs"]) < 1e-12
    # first-occurrence semantics: every distinct segment hash has exactly
    # one surviving copy, so kept segments sum to the distinct-hash count
    total_kept = sum(r["n_kept"] for r in rows)
    docs = ops.REGISTRY["q_dedup_segments"].fn  # noqa: F841 (doc anchor)
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.readers import load_table
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions import text as X

    K = 10
    toks = X.tokens("text")
    n_distinct = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") > 0)
        .select(
            F.explode(
                F.sequence(F.lit(0).cast("bigint"), ((F.size("toks") - 1) / K).cast("bigint"))
            ).alias("i"),
            "toks",
        )
        .select(F.concat_ws(" ", F.slice(F.col("toks"), (F.col("i") * K + 1).cast("int"), K)).alias("seg"))
        .distinct()
        .count()
    )
    assert total_kept == n_distinct


def test_split_train_eval_is_stable_and_complete(spark):
    out1 = {(r["split"], r["source"]): (r["n_docs"], r["sum_chars"]) for r in _run(spark, "q_split_train_eval").collect()}
    out2 = {(r["split"], r["source"]): (r["n_docs"], r["sum_chars"]) for r in _run(spark, "q_split_train_eval").collect()}
    assert out1 == out2, "split must be deterministic run-to-run"
    assert {s for s, _ in out1} <= {"train", "val", "test"}
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.readers import load_table

    n_total = load_table(spark, SF_DIR, "documents").count()
    assert sum(n for n, _ in out1.values()) == n_total
    train = sum(n for (s, _), (n, _) in out1.items() if s == "train")
    # 90% expected; binomial slack for a 500-doc corpus
    assert 0.80 <= train / n_total <= 0.97


def test_length_quantile_filter_keeps_upper_three_quartiles(spark):
    kept = _run(spark, "q_length_quantile_filter").collect()
    assert kept
    for r in kept:
        assert r["n_tok"] >= r["thr"]
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.readers import load_table
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions import text as X

    per_lang_total = {
        r["lang"]: r["n"]
        for r in load_table(spark, SF_DIR, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    per_lang_kept: dict[str, int] = {}
    for r in kept:
        per_lang_kept[r["lang"]] = per_lang_kept.get(r["lang"], 0) + 1
    for lang, n in per_lang_total.items():
        k = per_lang_kept.get(lang, 0)
        # >= 75% minus interpolation edge; never everything unless ties
        assert k >= int(0.75 * n) - 1, (lang, k, n)


def test_corpus_shuffle_is_a_permutation(spark):
    rows = _run(spark, "q_corpus_shuffle").collect()
    positions = sorted(r["pos"] for r in rows)
    assert positions == list(range(len(rows)))
    assert len({r["doc_id"] for r in rows}) == len(rows)
    again = {r["doc_id"]: r["pos"] for r in _run(spark, "q_corpus_shuffle").collect()}
    assert {r["doc_id"]: r["pos"] for r in rows} == again, "epoch-salted order is deterministic"
