"""Round-11 operator pins: q_hits (brute-force power-iteration twin +
TakeOrdered plan), q_pr_curve (brute-force hits@k + monotonicity),
q_cohort_ltv (cumulative identity), q_erasure_audit (python-md5 twin),
q_power_analysis (numpy recompute), q_code_detect (synthetic
code/prose corpus), q_weighted_quantile (brute-force cut points),
q_triplet_mining (numpy cosine twin + label polarity)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import numpy as np
from pyspark.sql import functions as F

from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import REGISTRY
from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.readers import load_table

from conftest import SF_DIR


# ------------------------------------------------------------- q_hits


def test_hits_matches_bruteforce(spark):
    """Second-round authority must equal the explicit A·Aᵀ·1 power
    iteration on the hub-capped edge set."""
    rows = REGISTRY["q_hits"].fn(spark, SF_DIR).collect()
    li = load_table(spark, SF_DIR, "lineitem").filter(
        F.col("l_partkey").isNotNull() & F.col("l_suppkey").isNotNull()
    )
    edges = {
        (r.p, r.s)
        for r in li.select(
            F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
        )
        .distinct()
        .collect()
    }
    deg = defaultdict(int)
    for p, _ in edges:
        deg[p] += 1
    kept = [(p, s) for p, s in edges if 2 <= deg[p] <= 50]
    a1 = defaultdict(int)
    for p, _ in kept:
        a1[p] += 1
    h1 = defaultdict(int)
    for p, s in kept:
        h1[s] += a1[p]
    a2 = defaultdict(int)
    for p, s in kept:
        a2[p] += h1[s]
    expect = sorted(a2.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r.p_partkey, r.authority) for r in rows] == expect
    assert [r.rank for r in rows] == list(range(1, len(expect) + 1))


def test_hits_plan_takes_ordered_before_rank(spark):
    """The top-20 must come from TakeOrdered (parallel per-partition
    top-k), with the rank window running on the bounded 20-row frame —
    never a global sort of the data-scaled part table."""
    df = REGISTRY["q_hits"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------- q_pr_curve


def test_pr_curve_matches_bruteforce(spark):
    rows = {r.k: r for r in REGISTRY["q_pr_curve"].fn(spark, SF_DIR).collect()}
    ev = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("value").isNotNull() & F.col("event_id").isNotNull())
        .select("event_id", "value", "event_type")
        .collect()
    )
    ranked = sorted(ev, key=lambda r: (-r.value, r.event_id))
    labels = [1 if r.event_type == "purchase" else 0 for r in ranked]
    npos = sum(labels)
    for k, row in rows.items():
        hits = sum(labels[:k])
        assert row.n_hits == hits
        assert row.n_pos == npos
        assert row.precision_at_k == round(hits / k, 6)
        assert row.recall_at_k == (round(hits / npos, 6) if npos else None)


def test_pr_curve_monotone(spark):
    rows = sorted(
        REGISTRY["q_pr_curve"].fn(spark, SF_DIR).collect(), key=lambda r: r.k
    )
    hits = [r.n_hits for r in rows]
    assert hits == sorted(hits), "hits@k must be nondecreasing in k"


# --------------------------------------------------------- q_cohort_ltv


def test_cohort_ltv_cumulative_identity(spark):
    rows = REGISTRY["q_cohort_ltv"].fn(spark, SF_DIR).collect()
    assert rows, "no cohorts produced"
    by_cohort = defaultdict(list)
    for r in rows:
        by_cohort[r.cohort_month].append(r)
    for grp in by_cohort.values():
        grp.sort(key=lambda r: r.age_months)
        run = 0.0
        for r in grp:
            run += r.revenue
            assert abs(r.cum_revenue - run) < 1e-6
            assert r.ltv_per_user == round(r.cum_revenue / r.n_users, 6)
        cums = [r.cum_revenue for r in grp]
        assert cums == sorted(cums)


# ------------------------------------------------------ q_erasure_audit


def test_erasure_audit_matches_python_md5(spark):
    rows = {r.event_type: r
            for r in REGISTRY["q_erasure_audit"].fn(spark, SF_DIR).collect()}
    ev = load_table(spark, SF_DIR, "events").select(
        "event_type", "user_id"
    ).collect()
    purged = defaultdict(int)
    total = defaultdict(int)
    users = defaultdict(set)
    for r in ev:
        total[r.event_type] += 1
        if r.user_id is not None and (
            hashlib.md5(str(r.user_id).encode()).hexdigest() < "08"
        ):
            purged[r.event_type] += 1
            users[r.event_type].add(r.user_id)
    for et, row in rows.items():
        assert row.n_purged == purged[et]
        assert row.n_retained == total[et] - purged[et]
        assert row.n_users_erased == len(users[et])
        assert row.pct_purged == round(purged[et] / total[et], 6)


# ----------------------------------------------------- q_power_analysis


def test_power_analysis_matches_numpy(spark):
    row = REGISTRY["q_power_analysis"].fn(spark, SF_DIR).first()
    ev = (
        load_table(spark, SF_DIR, "events")
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("user_id").isNotNull()
            & F.col("value").isNotNull()
        )
        .groupBy("user_id")
        .agg(F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("o"))
        .collect()
    )
    arms = defaultdict(list)
    for r in ev:
        arm = "A" if hashlib.md5(str(r.user_id).encode()).hexdigest()[0] < "8" else "B"
        arms[arm].append(r.o)
    a, b = np.array(arms["A"]), np.array(arms["B"])
    assert row.n_a == len(a) and row.n_b == len(b)
    mean_a, mean_b = round(a.mean(), 6), round(b.mean(), 6)
    assert row.mean_a == mean_a and row.mean_b == mean_b
    va, vb = round(a.var(ddof=1), 6), round(b.var(ddof=1), 6)
    pooled = round(((len(a) - 1) * va + (len(b) - 1) * vb)
                   / (len(a) + len(b) - 2), 6)
    assert row.var_pooled == pooled
    z = 1.959964 + 0.841621
    delta = round(mean_a - mean_b, 6)
    assert row.delta == delta
    assert abs(row.n_required_per_arm - 2 * pooled * z * z / delta**2) < 0.01
    assert abs(row.mde_at_current_n
               - z * np.sqrt(2 * pooled / len(a))) < 1e-5


# -------------------------------------------------------- q_code_detect


def test_code_detect_separates_code_from_prose(spark, tmp_path):
    rows = [
        (1, "def load(x): return x * 2 if x else None  # import json"),
        (2, "the quiet meadow stretched toward the distant hills and "
            "the travelers walked on through the morning mist"),
        (3, "while (i < n) { total = total + arr[i]; i = i + 1; }"),
    ]
    spark.createDataFrame(
        [(i, t, len(t)) for i, t in rows],
        "doc_id long, text string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {r.doc_id: r
           for r in REGISTRY["q_code_detect"].fn(spark, str(tmp_path)).collect()}
    assert out[1].is_code, "python-ish doc must flag as code"
    assert out[3].is_code, "c-ish doc must flag as code"
    assert not out[2].is_code, "prose must not flag as code"
    # exact symbol count on a known string: (){}[]=;<  in doc 3
    assert out[3].sym_cnt == sum(rows[2][1].count(c) for c in ";{}()[]=<>")


def test_code_detect_on_corpus_is_exact_ints(spark):
    out = REGISTRY["q_code_detect"].fn(spark, SF_DIR)
    r = out.agg(
        F.sum("sym_cnt").alias("s"), F.sum("kw_cnt").alias("k"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    assert r.n > 0 and r.s >= 0 and r.k >= 0


# --------------------------------------------------- q_weighted_quantile


def test_weighted_quantile_matches_bruteforce(spark):
    rows = {r.l_returnflag: r
            for r in REGISTRY["q_weighted_quantile"].fn(spark, SF_DIR).collect()}
    li = (
        load_table(spark, SF_DIR, "lineitem")
        .filter(
            F.col("l_extendedprice").isNotNull()
            & F.col("l_quantity").isNotNull()
            & (F.col("l_quantity") > 0)
            & F.col("l_returnflag").isNotNull()
        )
        .select(
            "l_returnflag",
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
            F.col("l_quantity").cast("long").alias("q"),
        )
        .collect()
    )
    groups = defaultdict(lambda: defaultdict(int))
    for r in li:
        groups[r.l_returnflag][r.cents] += r.q
    for flag, wmap in groups.items():
        total = sum(wmap.values())
        row = rows[flag]
        assert row.total_weight == total
        cum = 0
        med = p90 = None
        for cents in sorted(wmap):
            cum += wmap[cents]
            if med is None and 2 * cum >= total + 1:
                med = cents
            if p90 is None and 10 * cum >= 9 * total:
                p90 = cents
        assert row.w_median_cents == med
        assert row.w_p90_cents == p90
        assert row.w_median_cents <= row.w_p90_cents


# ----------------------------------------------------- q_triplet_mining


def test_triplet_mining_matches_numpy(spark):
    rows = REGISTRY["q_triplet_mining"].fn(spark, SF_DIR).collect()
    emb = (
        load_table(spark, SF_DIR, "embeddings")
        .filter(F.col("embedding").isNotNull() & F.col("label").isNotNull())
        .collect()
    )
    vecs = {r.vec_id: (np.array(r.embedding, dtype=np.float64), r.label)
            for r in emb}
    assert rows, "no triplets mined"
    for r in rows:
        av, al = vecs[r.anchor_id]
        assert r.anchor_label == al
        assert vecs[r.pos_id][1] == al
        assert vecs[r.neg_id][1] != al
        # hardest positive/negative by cosine (ties -> smaller id)
        best = {True: (-2.0, None), False: (-2.0, None)}
        for cid, (cv, cl) in vecs.items():
            if cid == r.anchor_id:
                continue
            cos = float(av @ cv / (np.linalg.norm(av) * np.linalg.norm(cv)))
            key = cl == al
            bc, bi = best[key]
            if cos > bc + 1e-9 or (abs(cos - bc) <= 1e-9 and cid < bi):
                best[key] = (cos, cid)
        assert r.pos_id == best[True][1]
        assert r.neg_id == best[False][1]
        assert abs(r.pos_cos - best[True][0]) < 1e-9
        assert r.margin == round(r.pos_cos - r.neg_cos, 6)


# ------------------------------------------------------ q_simpsons_check


def test_simpsons_check_sign_logic(spark):
    rows = REGISTRY["q_simpsons_check"].fn(spark, SF_DIR).collect()
    assert rows
    # recompute pooled from the strata themselves and re-derive flags
    p_ra = sum(round(r.rate_a * r.n_a) for r in rows if r.n_a)
    p_na = sum(r.n_a for r in rows)
    p_rb = sum(round(r.rate_b * r.n_b) for r in rows if r.n_b)
    p_nb = sum(r.n_b for r in rows)
    pooled_dir = p_ra * p_nb - p_rb * p_na
    for r in rows:
        if r.n_a and r.n_b and p_na and p_nb:
            s_dir = round(r.rate_a * r.n_a) * r.n_b - round(r.rate_b * r.n_b) * r.n_a
            assert r.reverses_pooled == (s_dir * pooled_dir < 0)
        else:
            assert not r.reverses_pooled


# --------------------------------------------------- q_late_arrival_audit


def test_late_arrival_matches_bruteforce(spark):
    rows = {r.event_type: r for r in
            REGISTRY["q_late_arrival_audit"].fn(spark, SF_DIR).collect()}
    ev = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull()
                & F.col("event_id").isNotNull())
        .select("user_id", "event_id", "ts", "event_type")
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r)
    late = defaultdict(int)
    total = defaultdict(int)
    worst = defaultdict(int)
    for rs in by_user.values():
        rs.sort(key=lambda r: r.event_id)
        hwm = None
        for r in rs:
            total[r.event_type] += 1
            if hwm is not None and r.ts < hwm:
                late[r.event_type] += 1
                worst[r.event_type] = max(
                    worst[r.event_type], int((hwm - r.ts).total_seconds())
                )
            hwm = r.ts if hwm is None else max(hwm, r.ts)
    for et, row in rows.items():
        assert row.n_events == total[et]
        assert row.n_late == late[et]
        if late[et]:
            assert row.max_lateness_sec == worst[et]
        assert row.late_frac == round(late[et] / total[et], 6)


# -------------------------------------------------------- q_vocab_growth


def test_vocab_growth_invariants(spark):
    rows = sorted(REGISTRY["q_vocab_growth"].fn(spark, SF_DIR).collect(),
                  key=lambda r: r.bucket)
    assert [r.bucket for r in rows] == list(range(10))
    assert sum(r.new_tokens for r in rows) == rows[-1].vocab_cum
    assert sum(r.n_occurrences for r in rows) == rows[-1].tokens_cum
    # cumulative columns are true prefix sums
    vc = tc = 0
    for r in rows:
        vc += r.new_tokens
        tc += r.n_occurrences
        assert r.vocab_cum == vc and r.tokens_cum == tc
    # Heaps-law sanity: the first bucket mints the most new tokens
    assert rows[0].new_tokens == max(r.new_tokens for r in rows)


# --------------------------------------------------- q_growth_accounting


def test_growth_accounting_identity(spark):
    rows = REGISTRY["q_growth_accounting"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_active == r.n_new + r.n_retained + r.n_resurrected


def test_growth_accounting_bruteforce_months(spark):
    ev = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("user_id", (F.year("ts") * 12 + F.month("ts")).alias("m"))
        .distinct()
        .collect()
    )
    months = defaultdict(set)
    for r in ev:
        months[r.m].add(r.user_id)
    firsts = {}
    for m in sorted(months):
        for u in months[m]:
            firsts.setdefault(u, m)
    rows = {r.month_idx: r for r in
            REGISTRY["q_growth_accounting"].fn(spark, SF_DIR).collect()}
    for m, users in months.items():
        row = rows[m]
        prev = months.get(m - 1, set())
        assert row.n_active == len(users)
        assert row.n_new == sum(1 for u in users if firsts[u] == m)
        assert row.n_retained == len(users & prev)
        assert row.n_churned == len(prev - users)
