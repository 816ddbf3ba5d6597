"""Round-12 operator pins: q_gopher_rules (python recompute of every
gate), q_boilerplate_ngrams (brute-force 3-gram DF), q_bleu_pairs
(python clipped-precision twin), q_curriculum_interleave (round-robin
order properties), q_length_buckets (integer waste identity),
q_ttl_purge_plan (python frontier twin), q_quality_select
(subset/consistency bounds), q_poststrat_weights (weighted-total
identity: weights reproduce population shares exactly)."""

from __future__ import annotations

import datetime
import hashlib
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import REGISTRY
from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.readers import load_table

from conftest import SF_DIR


def _docs(spark):
    return {
        r.doc_id: (r.text or "", r.source, r.lang)
        for r in load_table(spark, SF_DIR, "documents").collect()
    }


def _toks(text: str) -> list[str]:
    return [t for t in text.lower().split() if t]


# ------------------------------------------------------- q_gopher_rules


def test_gopher_rules_match_python(spark):
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.text import (
        STOPWORDS_EN,
    )

    sw = set(STOPWORDS_EN)
    rows = {r.doc_id: r for r in
            REGISTRY["q_gopher_rules"].fn(spark, SF_DIR).collect()}
    docs = _docs(spark)
    n_with_tokens = 0
    for doc_id, (text, _, _) in docs.items():
        toks = _toks(text)
        if not toks:
            assert doc_id not in rows  # zero-token docs drop
            continue
        n_with_tokens += 1
        r = rows[doc_id]
        n = len(toks)
        sum_wlen = sum(len(t) for t in toks)
        n_alpha = sum(1 for t in toks if any(c.isalpha() for c in t))
        n_stop = len({t for t in toks if t in sw})
        assert r.n_words == n
        assert r.n_alpha == n_alpha
        assert r.n_stop_kinds == n_stop
        assert r.ok_word_count == (50 <= n <= 100_000)
        assert r.ok_mean_wlen == (3 * n <= sum_wlen <= 10 * n)
        assert r.ok_alpha_words == (10 * n_alpha >= 8 * n)
        assert r.ok_stopwords == (n_stop >= 2)
        assert r.pass_gopher == (
            r.ok_word_count and r.ok_mean_wlen
            and r.ok_alpha_words and r.ok_stopwords
        )
    assert len(rows) == n_with_tokens
    # the battery must discriminate on this corpus, not rubber-stamp
    verdicts = {r.pass_gopher for r in rows.values()}
    assert verdicts == {True, False}


# ------------------------------------------------- q_boilerplate_ngrams


def test_boilerplate_ngrams_match_bruteforce(spark):
    rows = REGISTRY["q_boilerplate_ngrams"].fn(spark, SF_DIR).collect()
    docs = _docs(spark)
    df = defaultdict(set)
    n_docs = Counter()
    for doc_id, (text, source, _) in docs.items():
        n_docs[source] += 1
        toks = _toks(text)
        for i in range(len(toks) - 2):
            df[(source, " ".join(toks[i:i + 3]))].add(doc_id)
    expect = defaultdict(list)
    for (source, gram), ids in df.items():
        if len(ids) >= 2:
            expect[source].append((-len(ids), gram))
    for source in expect:
        expect[source].sort()
    got = defaultdict(list)
    for r in rows:
        got[r.source].append(r)
    assert set(got) == set(expect)
    for source, rs in got.items():
        rs.sort(key=lambda r: r.rn)
        want = expect[source][: 20]
        assert [(-r.df, r.gram) for r in rs] == want
        assert all(r.n_docs == n_docs[source] for r in rs)
        assert [r.rn for r in rs] == list(range(1, len(want) + 1))


# ------------------------------------------------------- q_bleu_pairs


def test_bleu_pairs_match_python(spark):
    rows = {(r.cand_id, r.ref_id): r for r in
            REGISTRY["q_bleu_pairs"].fn(spark, SF_DIR).collect()}
    docs = _docs(spark)
    by_source = defaultdict(list)
    for doc_id, (text, source, _) in docs.items():
        by_source[source].append(doc_id)
    n_expected = 0
    for source, ids in by_source.items():
        ids.sort()
        for cand_id, ref_id in zip(ids, ids[1:]):
            c = _toks(docs[cand_id][0])
            r = _toks(docs[ref_id][0])
            if len(c) < 2 or len(r) < 2:
                assert (cand_id, ref_id) not in rows
                continue
            n_expected += 1
            cb = Counter(zip(c, c[1:]))
            rb = Counter(zip(r, r[1:]))
            clipped = sum(min(n, rb[g]) for g, n in cb.items())
            row = rows[(cand_id, ref_id)]
            assert row.n_bg_cand == len(c) - 1
            assert row.clipped == clipped
            assert row.precision2 == clipped / (len(c) - 1)
            assert row.bp_exponent == min(0.0, 1.0 - len(r) / len(c))
    assert len(rows) == n_expected


# --------------------------------------------- q_curriculum_interleave


def test_curriculum_interleave_order(spark):
    rows = REGISTRY["q_curriculum_interleave"].fn(spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "n_chars"
    ).collect()
    assert len(rows) == len(docs)
    # dense 0-based global positions
    assert sorted(r.global_pos for r in rows) == list(range(len(rows)))
    # rnk is the per-source difficulty rank
    chars = {r.doc_id: r.n_chars for r in docs}
    by_source = defaultdict(list)
    for r in docs:
        by_source[r.source].append(r.doc_id)
    expect_rnk = {}
    for source, ids in by_source.items():
        ids.sort(key=lambda d: (chars[d], d))
        for i, d in enumerate(ids):
            expect_rnk[d] = i + 1
    assert all(expect_rnk[r.doc_id] == r.rnk for r in rows)
    # global order is exactly (rnk, source, doc_id)
    ordered = sorted(rows, key=lambda r: r.global_pos)
    keys = [(r.rnk, r.source, r.doc_id) for r in ordered]
    assert keys == sorted(keys)


# ------------------------------------------------------ q_length_buckets


def test_length_buckets_identity(spark):
    rows = REGISTRY["q_length_buckets"].fn(spark, SF_DIR).collect()
    docs = _docs(spark)
    ladder = [16, 32, 64, 128, 256, 512, 1024, 4096]
    expect = defaultdict(lambda: [0, 0])
    for text, _, _ in docs.values():
        n = len(_toks(text))
        if not 1 <= n <= ladder[-1]:
            continue
        b = next(c for c in ladder if n <= c)
        expect[b][0] += 1
        expect[b][1] += n
    assert {r.bucket: (r.n_docs, r.sum_tok) for r in rows} == {
        b: tuple(v) for b, v in expect.items()
    }
    for r in rows:
        assert r.pad_waste == r.n_docs * r.bucket - r.sum_tok
        assert r.pad_waste >= 0


# ------------------------------------------------------ q_ttl_purge_plan


def test_ttl_purge_plan_match_python(spark):
    rows = {r.event_type: r for r in
            REGISTRY["q_ttl_purge_plan"].fn(spark, SF_DIR).collect()}
    ev = [
        (r.event_type, r.ts)
        for r in load_table(spark, SF_DIR, "events")
        .select("event_type", "ts").collect()
        if r.ts is not None
    ]
    ttls = {"error": 2, "click": 5, "view": 7, "signup": 10, "purchase": 14}
    wm = max(ts for _, ts in ev)
    per = defaultdict(list)
    for et, ts in ev:
        per[et].append(ts)
    assert set(rows) == set(per)
    for et, tss in per.items():
        ttl = ttls.get(et, 30)
        frontier = wm - datetime.timedelta(days=ttl)
        r = rows[et]
        assert r.ttl_days == ttl
        assert r.frontier_ts == frontier
        assert r.n_total == len(tss)
        assert r.n_purgeable == sum(1 for t in tss if t < frontier)
        assert r.oldest_ts == min(tss)


# ------------------------------------------------------ q_quality_select


def test_quality_select_bounds(spark):
    rows = REGISTRY["q_quality_select"].fn(spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents").groupBy("source").agg(
        F.count(F.lit(1)).alias("n")
    ).collect()
    n_by_source = {r.source: r.n for r in docs}
    assert {r.source for r in rows} == set(n_by_source)
    for r in rows:
        assert r.n_in == n_by_source[r.source]
        assert 0 <= r.n_kept <= r.n_in
        assert (r.tokens_kept == 0) == (r.n_kept == 0) or r.tokens_kept >= 0
    # quality-weighted selection must actually drop something and keep
    # something at corpus level (quality ~0.5-0.9 here)
    total_in = sum(r.n_in for r in rows)
    total_kept = sum(r.n_kept for r in rows)
    assert 0 < total_kept < total_in


def test_quality_select_deterministic(spark):
    a = REGISTRY["q_quality_select"].fn(spark, SF_DIR).collect()
    b = REGISTRY["q_quality_select"].fn(spark, SF_DIR).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# --------------------------------------------------- q_poststrat_weights


def test_poststrat_weights_reweight_identity(spark):
    rows = REGISTRY["q_poststrat_weights"].fn(spark, SF_DIR).collect()
    docs = _docs(spark)
    pop = Counter((s, l) for _, (_, s, l) in docs.items())
    samp = Counter(
        (s, l)
        for d, (_, s, l) in docs.items()
        if hashlib.md5(str(d).encode()).hexdigest() < "4"
    )
    n_tot = sum(pop.values())
    n_stot = sum(samp.values())
    assert {(r.source, r.lang) for r in rows} == set(pop)
    for r in rows:
        key = (r.source, r.lang)
        assert r.n_pop == pop[key]
        assert r.n_samp == samp.get(key, 0)
        if r.n_samp == 0:
            assert r.weight is None
        else:
            w = (r.n_pop / n_tot) / (r.n_samp / n_stot)
            assert abs(r.weight - w) < 5e-7  # 6dp rounding
    # the defining property: sample counts reweighted by w recover
    # exact population shares
    for r in rows:
        if r.n_samp:
            est_share = (r.n_samp / n_stot) * r.weight
            assert abs(est_share - r.n_pop / n_tot) < 1e-6
