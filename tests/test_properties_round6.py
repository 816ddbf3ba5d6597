"""Property-style checks for the round-6 evalprep operators: the
metric math replayed against pure-Python references on ANY input —
AUC's rank statistic (including its monotone-transform invariance),
NDCG's bounds, gaps-and-islands' exact partition of any key set, and
KS's agreement with a brute-force CDF scan.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


# ---------------------------------------------------------------- AUC
# scores quantized to 1dp so tie groups actually occur
scored_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-5, max_value=5).map(lambda x: x / 10.0),
        st.booleans(),
    ),
    min_size=2,
    max_size=40,
).filter(lambda xs: any(y for _, y in xs) and any(not y for _, y in xs))


def _auc_bruteforce(pairs):
    """P(score_pos > score_neg) + 0.5 P(=) over all pos×neg pairs."""
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    return wins / (len(pos) * len(neg))


def _auc_rank_form(pairs):
    """The integer doubled-rank form q_retrieval_auc computes."""
    from collections import Counter

    groups = Counter()
    pos_in = Counter()
    for s, y in pairs:
        groups[s] += 1
        pos_in[s] += int(y)
    cum = 0
    s2 = 0
    for s in sorted(groups):
        s2 += pos_in[s] * (2 * cum + groups[s] + 1)
        cum += groups[s]
    P = sum(pos_in.values())
    N = len(pairs) - P
    return (s2 - P * (P + 1)) / (2 * P * N)


@settings(max_examples=200, deadline=None, suppress_health_check=list(HealthCheck))
@given(scored_strategy)
def test_auc_rank_form_matches_pairwise_definition(pairs):
    assert abs(_auc_rank_form(pairs) - _auc_bruteforce(pairs)) < 1e-12


@settings(max_examples=100, deadline=None, suppress_health_check=list(HealthCheck))
@given(scored_strategy)
def test_auc_invariant_under_monotone_transform(pairs):
    # AUC is a rank statistic: any strictly increasing transform of the
    # scores must leave it unchanged
    transformed = [(3.0 * s + 7.0, y) for s, y in pairs]
    assert abs(_auc_rank_form(pairs) - _auc_rank_form(transformed)) < 1e-12


# --------------------------------------------------------------- NDCG
rel_strategy = st.lists(st.booleans(), min_size=1, max_size=30)


def _ndcg_at_k(rels, k=10):
    import math

    dcg = sum(
        round(1.0 / math.log2(i + 2), 6)
        for i, r in enumerate(rels[:k])
        if r
    )
    n_pos = sum(rels)
    idcg = sum(round(1.0 / math.log2(i + 2), 6) for i in range(min(k, n_pos)))
    return (dcg / idcg) if idcg > 0 else 0.0


@settings(max_examples=200, deadline=None, suppress_health_check=list(HealthCheck))
@given(rel_strategy)
def test_ndcg_bounds_and_perfect_ranking(rels):
    v = _ndcg_at_k(rels)
    assert 0.0 <= v <= 1.0 + 1e-12
    # sorting all positives to the front is the ideal ranking → NDCG 1
    ideal = sorted(rels, reverse=True)
    if any(rels):
        assert abs(_ndcg_at_k(ideal) - 1.0) < 1e-9
    else:
        assert _ndcg_at_k(ideal) == 0.0


# ----------------------------------------------------- gaps & islands
keys_strategy = st.sets(st.integers(min_value=0, max_value=200), min_size=1, max_size=60)


def _islands_reference(keys):
    out = []
    run = None
    for k in sorted(keys):
        if run and k == run[1] + 1:
            run[1] = k
        else:
            if run:
                out.append(tuple(run))
            run = [k, k]
    out.append(tuple(run))
    return out


def _islands_dense_id_form(keys):
    ks = sorted(keys)
    groups = {}
    for seq, k in enumerate(ks):
        groups.setdefault(k - seq, []).append(k)
    return sorted((min(v), max(v)) for v in groups.values())


@settings(max_examples=300, deadline=None, suppress_health_check=list(HealthCheck))
@given(keys_strategy)
def test_islands_dense_id_decomposition_is_exact(keys):
    # the key − dense_seq island id (q_gaps_islands) reproduces the
    # run-length reference on any key set, and the islands partition it
    islands = _islands_dense_id_form(keys)
    assert islands == _islands_reference(keys)
    covered = set()
    for a, b in islands:
        covered |= set(range(a, b + 1)) & keys
    assert covered == keys


# ------------------------------------------------------------------ KS
two_sample_strategy = st.tuples(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=50),
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=50),
)


def _ks_bruteforce(a, b):
    xs = sorted(set(a) | set(b))
    na, nb = len(a), len(b)
    return max(
        abs(sum(1 for v in a if v <= x) / na - sum(1 for v in b if v <= x) / nb)
        for x in xs
    )


def _ks_integer_form(a, b):
    """q_ks_test's integer cross-product maximum."""
    from collections import Counter

    ca, cb = Counter(a), Counter(b)
    na, nb = len(a), len(b)
    cum_a = cum_b = 0
    best = 0
    for x in sorted(set(a) | set(b)):
        cum_a += ca.get(x, 0)
        cum_b += cb.get(x, 0)
        best = max(best, abs(cum_a * nb - cum_b * na))
    return best / (na * nb)


@settings(max_examples=200, deadline=None, suppress_health_check=list(HealthCheck))
@given(two_sample_strategy)
def test_ks_integer_form_matches_cdf_scan(samples):
    a, b = samples
    assert abs(_ks_integer_form(a, b) - _ks_bruteforce(a, b)) < 1e-12
