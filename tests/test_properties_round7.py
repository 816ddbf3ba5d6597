"""Property-style checks for the round-7 attribution operators: the
model math replayed against pure-Python references on ANY event set.

Events are (user, ts, type, value) tuples; the references walk each
user's timeline literally, so any divergence is in the windowed
formulation, not the fixture.
"""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

TYPES = ["view", "click", "signup", "error", "purchase"]

# (user, ts, type_idx, cents): small domains force collisions; ts is an
# integer so ties exercise the event_id tiebreaker deterministically
event_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user
        st.integers(min_value=0, max_value=10),  # ts
        st.integers(min_value=0, max_value=4),  # type index
        st.integers(min_value=0, max_value=10_000),  # value in cents
    ),
    min_size=0,
    max_size=60,
)


def _timeline(events):
    """Per-user event list ordered by (ts, event_id) — event_id is the
    position in the input list, mirroring the operators' unique
    tiebreaker."""
    by_user = defaultdict(list)
    for eid, (u, ts, ti, cents) in enumerate(events):
        by_user[u].append((ts, eid, TYPES[ti], cents / 100.0))
    for u in by_user:
        by_user[u].sort(key=lambda r: (r[0], r[1]))
    return by_user


def _last_touch_reference(events):
    """Literal walk: credit each purchase to the channel of the most
    recent strictly-preceding non-purchase event."""
    rev = defaultdict(float)
    cnt = defaultdict(int)
    for u, rows in _timeline(events).items():
        last_channel = None
        for ts, eid, etype, value in rows:
            if etype == "purchase":
                ch = last_channel or "direct"
                rev[ch] += value
                cnt[ch] += 1
            else:
                last_channel = etype
    return dict(cnt), {k: round(v, 6) for k, v in rev.items()}


def _last_touch_windowed(events):
    """The operator's formulation: IGNORE-NULLS last over the
    (ts, event_id)-ordered preceding frame, then group by channel."""
    rev = defaultdict(float)
    cnt = defaultdict(int)
    for u, rows in _timeline(events).items():
        for i, (ts, eid, etype, value) in enumerate(rows):
            if etype != "purchase":
                continue
            channel = None
            for pts, peid, petype, _ in rows[:i]:
                if petype != "purchase":
                    channel = petype
            ch = channel or "direct"
            rev[ch] += value
            cnt[ch] += 1
    return dict(cnt), {k: round(v, 6) for k, v in rev.items()}


@settings(max_examples=300, deadline=None, suppress_health_check=list(HealthCheck))
@given(event_strategy)
def test_last_touch_window_form_matches_timeline_walk(events):
    assert _last_touch_windowed(events) == _last_touch_reference(events)


def _linear_reference(events):
    """Literal walk: each purchase's value splits equally over ALL
    strictly-preceding non-purchase touches (6dp per-credit rounding,
    the operator's determinism contract); purchases with zero touches
    are unattributable and drop."""
    credits = defaultdict(float)
    n_credits = defaultdict(int)
    for u, rows in _timeline(events).items():
        for i, (ts, eid, etype, value) in enumerate(rows):
            if etype != "purchase":
                continue
            touches = [r for r in rows[:i] if r[2] != "purchase"]
            if not touches:
                continue
            credit = round(value / len(touches), 6)
            for _, _, ch, _ in touches:
                credits[ch] += credit
                n_credits[ch] += 1
    return dict(n_credits), dict(credits)


@settings(max_examples=300, deadline=None, suppress_health_check=list(HealthCheck))
@given(event_strategy)
def test_linear_attribution_conserves_value_up_to_rounding(events):
    n_credits, credits = _linear_reference(events)
    attributable = 0.0
    n_touch_total = 0
    for u, rows in _timeline(events).items():
        for i, (ts, eid, etype, value) in enumerate(rows):
            if etype != "purchase":
                continue
            n = sum(1 for r in rows[:i] if r[2] != "purchase")
            if n:
                attributable += value
                n_touch_total += n
    total_credited = sum(credits.values())
    # each credit carries ≤5e-7 rounding; n_touch_total credits total
    assert abs(total_credited - attributable) <= 5e-7 * n_touch_total + 1e-9
    assert sum(n_credits.values()) == n_touch_total
    # purchase channel never receives credit in either model
    assert "purchase" not in credits


@settings(max_examples=300, deadline=None, suppress_health_check=list(HealthCheck))
@given(event_strategy)
def test_last_touch_totals_partition_all_purchases(events):
    cnt, rev = _last_touch_reference(events)
    n_purchases = sum(1 for _, _, ti, _ in events if TYPES[ti] == "purchase")
    assert sum(cnt.values()) == n_purchases
    total_value = sum(
        cents / 100.0 for _, _, ti, cents in events if TYPES[ti] == "purchase"
    )
    assert abs(sum(rev.values()) - total_value) < 1e-6
    assert "purchase" not in cnt
