"""Property-style checks for the round-8 operators: each operator's
DISTRIBUTED formulation (bucketed joins, window-max masks, distinct-
value rank sums, normalized decay credits) replayed against a literal
pure-Python reference on arbitrary inputs.  These pin the math; the
oracle diff pins the Spark/DuckDB execution of that math.
"""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------- interval join

H = 7  # small horizon forces bucket-boundary cases


@settings(max_examples=300, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.tuples(st.integers(0, 2), st.integers(0, 40)), max_size=25),
    st.lists(st.tuples(st.integers(0, 2), st.integers(0, 40)), max_size=25),
)
def test_interval_join_bucket_decomposition_is_complete(views, clicks):
    """q_impression_click_join's candidate generation: a click pairs
    with a view iff same user and c ∈ [v, v+H].  The operator joins on
    (user, bucket) with views exploded to {v//H, (v+H)//H}; this must
    equal the brute-force pair set — no pair lost at a bucket
    boundary, none duplicated (a click has exactly one bucket)."""
    brute = {
        (i, j)
        for i, (u, v) in enumerate(views)
        for j, (cu, c) in enumerate(clicks)
        if u == cu and v <= c <= v + H
    }
    bucketed = set()
    for i, (u, v) in enumerate(views):
        vbuckets = {v // H, (v + H) // H}
        for j, (cu, c) in enumerate(clicks):
            if u == cu and (c // H) in vbuckets and v <= c <= v + H:
                bucketed.add((i, j))
    assert bucketed == brute


# ---------------------------------------------------------- sorted neighborhood

W = 3


@settings(max_examples=300, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.integers(0, 60))
def test_sorted_neighborhood_bucket_pairing_is_exactly_n_by_w(n):
    """q_sorted_neighborhood pairs ranks (a, b) with 1 ≤ b−a ≤ w via an
    equi-join on rank buckets of width w (left side exploded to
    {a//w, (a+w)//w}).  The candidate set must equal the brute-force
    window pairs for EVERY rank count — the linearity claim
    (|pairs| = Σ min(w, n−1−a)) holds by construction."""
    brute = {(a, b) for a in range(n) for b in range(a + 1, min(a + W + 1, n))}
    bucketed = set()
    for a in range(n):
        abuckets = {a // W, (a + W) // W}
        for b in range(n):
            if b // W in abuckets and 1 <= b - a <= W:
                bucketed.add((a, b))
    assert bucketed == brute


# ------------------------------------------------------------- span corruption

SPAN = 3


@settings(max_examples=300, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.booleans(), max_size=40))
def test_span_mask_window_max_equals_interval_union(starts):
    """q_span_corruption counts masked tokens as max(start) over the
    trailing SPAN-row frame; that must equal membership in the union
    of [s, s+SPAN-1] intervals over all start positions s."""
    union = set()
    for s, flag in enumerate(starts):
        if flag:
            union.update(range(s, min(s + SPAN, len(starts))))
    window_form = {
        p
        for p in range(len(starts))
        if any(starts[q] for q in range(max(0, p - SPAN + 1), p + 1))
    }
    assert window_form == union


# --------------------------------------------------------- quantile normalize


@settings(max_examples=300, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.integers(0, 9), min_size=2, max_size=50))
def test_quantile_normalize_distinct_value_form_matches_percent_rank(values):
    """q_quantile_normalize computes percent_rank as
    (count of strictly smaller rows)/(n−1) from distinct-value counts;
    that must equal the SQL percent_rank definition
    (rank−1)/(n−1) with rank = strictly-smaller + 1, for every
    multiset (ties included)."""
    n = len(values)
    cnt = defaultdict(int)
    for v in values:
        cnt[v] += 1
    n_less = {}
    acc = 0
    for v in sorted(cnt):
        n_less[v] = acc
        acc += cnt[v]
    for v in values:
        rank = sum(1 for x in values if x < v) + 1
        assert n_less[v] / (n - 1) == (rank - 1) / (n - 1)


# ------------------------------------------------------- time-decay attribution


@settings(max_examples=300, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 10), st.integers(0, 10_000)),  # (age_days, w_raw)
        min_size=1,
        max_size=20,
    ),
    st.integers(0, 10_000),  # purchase cents
)
def test_time_decay_credits_conserve_purchase_value(touches, cents):
    """q_time_decay_attribution normalizes per purchase: credits =
    value · w_i / Σw with w_i rounded to 6dp BEFORE the sum and each
    credit rounded to 6dp.  The credited total must equal the purchase
    value within the accumulated rounding bound (each credit ≤ 5e-7
    off; k credits ⇒ ≤ 5e-7·k + ulp)."""
    value = cents / 100.0
    ws = [round(0.5 ** (age / 7.0), 6) for age, _ in touches]
    sw = sum(ws)  # exact in the operator (DECIMAL(18,6) sum)
    if sw == 0:
        # the operator's sw != 0 guard: every weight underflowed the
        # 6dp rounding → the purchase is unattributable and emits NO
        # credits (never a 0/0 NaN) — mirror that here
        credits = []
        assert sum(credits) == 0.0
        return
    credits = [round(value * w / sw, 6) for w in ws]
    assert abs(sum(credits) - value) <= 5e-7 * len(credits) + 1e-9
