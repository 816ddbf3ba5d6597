"""Contract tests for the round-6 measured-scale artifacts.

SCALE_SLOPE.json and stream_bench.json are committed measurement
records (tools/scale_slope.py, tools/stream_bench.py) that SCALE.md
summarizes.  These tests pin (a) the schema each tool promises, so a
tool edit that drops a field breaks loudly instead of silently
shipping an empty summary, and (b) the pass criteria the committed
numbers were graded against — if a regenerated artifact violates its
own bounds, the commit that updates it must also explain why.
"""

from __future__ import annotations

import json
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def slope():
    path = os.path.join(ROOT, "SCALE_SLOPE.json")
    if not os.path.exists(path):
        pytest.skip("SCALE_SLOPE.json not generated (run tools/scale_slope.py)")
    with open(path) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def stream():
    path = os.path.join(ROOT, "stream_bench.json")
    if not os.path.exists(path):
        pytest.skip("stream_bench.json not generated (run tools/stream_bench.py)")
    with open(path) as f:
        return json.load(f)


def test_slope_schema_and_coverage(slope):
    assert slope["replicas"] == 10
    assert slope["criteria"] == {"ratio_max": 12.0, "skew_max": 4.0}
    # the 10 most expensive round-5 headliners + 4 round-6 shapes
    # + 3 round-7 additions (attribution pair, robust-scale knob)
    # + up to 4 round-8 additions (interval join, time-decay credits,
    #   span mask, quantile normalize)
    # + up to 4 round-9 additions (ER chain, CDC-maintained PQ index,
    #   CDC-maintained df table, cross-doc span detector)
    # (round 10 adds no 10× queries — the six r9 north-star shapes were
    # already in the 10× list; they join the x100 block instead)
    assert len(slope["queries"]) in (17, 18, 21, 23, 25, 31)
    for extra in (
        "q_last_touch_attribution",
        "q_linear_attribution",
        "q_robust_scale",
    ):
        assert extra in slope["queries"]
    if len(slope["queries"]) == 18:
        assert "q_impression_click_join" in slope["queries"]
    for name, q in slope["queries"].items():
        for field in (
            "t_1x_sec",
            "t_10x_sec",
            "ratio",
            "worst_stage_skew_1x",
            "worst_stage_skew_10x",
        ):
            assert isinstance(q[field], (int, float)), (name, field)
        assert q["t_1x_sec"] > 0 and q["t_10x_sec"] > 0


def test_slope_is_near_linear_and_straggler_free(slope):
    crit = slope["criteria"]
    for name, q in slope["queries"].items():
        assert q["ratio"] <= crit["ratio_max"], (
            f"{name}: 10x wall-time ratio {q['ratio']} exceeds "
            f"{crit['ratio_max']} — plan no longer near-linear"
        )
        assert q["worst_stage_skew_10x"] <= crit["skew_max"], (
            f"{name}: stage max/median task time {q['worst_stage_skew_10x']} "
            f"exceeds {crit['skew_max']} — a straggler appeared at 10x"
        )
    assert slope["pass"] is True


def test_slope_x100_two_decade_block(slope):
    """Round-8 second decade (VERDICT r7 next-7): the same
    ratio/skew criteria applied from sf0.01 up to the 10×-of-sf0.1
    blowup — 100× the data.  Near-linear across two decades = ratio
    ≤ 120 (100× data × the per-decade 20% allowance); the measured
    ratios land far below because fixed per-query overhead amortizes."""
    if "x100" not in slope:
        pytest.skip("SCALE_SLOPE.json predates the x100 block")
    x = slope["x100"]
    assert x["criteria"] == {"ratio_max": 120.0, "skew_max": 4.0}
    # 10 heaviest headliners; +4 round-9 shapes (VERDICT r8 next-4);
    # +6 round-10 additions (VERDICT r9 next-2: the r9 north-star
    # shapes — both CDC-maintained indexes, cross-doc spans, link
    # prediction, Bradley-Terry, CMS)
    assert len(x["queries"]) in (10, 14, 20)
    if len(x["queries"]) >= 14:
        for extra in (
            "q_er_resolve",
            "q_impression_click_join",
            "q_time_decay_attribution",
            "q_span_corruption",
        ):
            assert extra in x["queries"], extra
    if len(x["queries"]) == 20:
        for extra in (
            "q_sim_index_incremental",
            "q_text_index_incremental",
            "q_dedup_cross_spans",
            "q_link_prediction",
            "q_bradley_terry",
            "q_count_min_sketch",
        ):
            assert extra in x["queries"], extra
    for name, q in x["queries"].items():
        assert q["t_1x_sec"] > 0 and q["t_100x_sec"] > 0, name
        assert q["ratio"] <= x["criteria"]["ratio_max"], (name, q["ratio"])
        assert q["worst_stage_skew_100x"] <= x["criteria"]["skew_max"], name
        # the 100× wall is the same measurement the 10× block records
        assert q["t_100x_sec"] == slope["queries"][name]["t_10x_sec"], name
    assert x["pass"] is True


def test_stream_bench_schema(stream):
    for mode in ("append", "merge"):
        m = stream[mode]
        for field in (
            "input_rows",
            "final_table_rows",
            "rows_per_sec",
            "micro_batches",
            "batch_ms_median",
            "batch_ms_p95",
        ):
            assert field in m, (mode, field)
        # the persist fix: each source row is counted (and read) ONCE
        assert m["input_rows"] == stream["feed_rows"], (
            f"{mode}: numInputRows {m['input_rows']} != feed "
            f"{stream['feed_rows']} — the micro-batch is being re-scanned"
        )
    # merge collapses ~12 versions/key to one row per surviving key
    assert stream["merge"]["final_table_rows"] <= stream["n_keys"]
    # append keeps every non-REMOVE image
    assert stream["append"]["final_table_rows"] > stream["n_keys"]
    assert stream["merge_minus_append_batch_ms"] > 0
    # windowed-agg path (B31 + watermark): all input consumed once,
    # closed windows emitted, bounded state
    w = stream["window"]
    assert w["input_rows"] == stream["feed_rows"], w
    assert w["windows_emitted"] > 0
    assert 0 < w["max_state_rows"] < stream["feed_rows"], w


def test_stream_bench_10x_block(stream):
    """Round-7 streaming scale slope: 10× feed at 10× files-per-trigger
    (same micro-batch count), plus the RocksDB state-store twin.
    Criteria mirror SCALE_SLOPE.json: wall ratio ≤ 12 at 10× rows, and
    the windowed path's state must stay TIME-bounded — the 10× feed
    densifies the same event-time span, so state rows may not scale
    with input."""
    if "x10" not in stream:
        import pytest

        pytest.skip("stream_bench.json predates the 10x block")
    x = stream["x10"]
    assert x["feed_rows"] >= 9 * stream["feed_rows"]
    for mode in ("append", "merge", "window", "window_rocksdb"):
        assert x["wall_ratio_vs_1x"][mode] <= 12.0, (mode, x["wall_ratio_vs_1x"])
    # state is bounded by open windows (watermark), not input size:
    # 10× rows over the same span may open at most ~2× state (ragged
    # batch boundaries), never 10×
    assert x["state_rows_ratio_window"] <= 3.0, x["state_rows_ratio_window"]
    assert x["window"]["input_rows"] == x["feed_rows"]
    assert x["merge"]["final_table_rows"] <= x["n_keys"]
    # the RocksDB run processed the same feed with bounded state too
    r = x["window_rocksdb"]
    assert r["state_store"] == "rocksdb"
    assert r["input_rows"] == x["feed_rows"]
    assert 0 < r["max_state_rows"] < x["feed_rows"]


def test_stream_bench_join_mode(stream):
    """Round-8 stream-stream interval join evidence (windows.join_streams
    — the last stateful shape with no bench numbers).  Both sides
    buffer; the watermark+interval bound is what lets state evict.
    max state ≈ one micro-batch of join-side rows (eviction happens at
    batch boundaries), NEVER cumulative input: the 10× same-batch-count
    run grows state with the batch, the 10× STEADY run (same batch
    span, 10× the batches) must hold state ~flat — that flatness is
    the eviction evidence."""
    if "join" not in stream:
        pytest.skip("stream_bench.json predates the join mode")
    j = stream["join"]
    # r9: the 1× block carries its own overhead note (the 1× wall is
    # trigger-overhead dominated and reads higher than 10× — VERDICT
    # r8 wrong-4 asked the artifact to say so itself)
    if "note" in j:
        assert "overhead" in j["note"], j["note"]
    assert j["pairs_emitted"] > 0
    # state is a small fraction of the join-side input, not cumulative
    assert 0 < j["max_state_rows"] <= 0.25 * j["input_rows"], j
    x = stream["x10"]
    assert x["wall_ratio_vs_1x"]["join"] <= 12.0
    # constant-density extended feed → pairs grow ~linearly (10×),
    # never quadratically
    assert x["join"]["pairs_emitted"] <= 12 * j["pairs_emitted"]
    # steady-batch twin: 10× longer stream at the same batch span may
    # not grow max state beyond ~2× (ragged boundaries), never 10×
    assert x["state_rows_ratio_join_steady"] <= 3.0, (
        x["state_rows_ratio_join_steady"]
    )


def test_stream_bench_bigstate_provider_split(stream):
    """Round-8 provider comparison at REAL state size (VERDICT r7
    next-6: 209 rows cannot separate providers).  The bigstate mode
    must actually reach ≥100k state rows, and both providers must
    process the identical feed to identical outputs."""
    if "x10" not in stream or "bigstate_hdfs" not in stream.get("x10", {}):
        pytest.skip("stream_bench.json predates the bigstate block")
    x = stream["x10"]
    h, r = x["bigstate_hdfs"], x["bigstate_rocksdb"]
    assert h["max_state_rows"] >= 100_000, h["max_state_rows"]
    assert r["max_state_rows"] >= 100_000, r["max_state_rows"]
    assert h["state_store"].startswith("hdfs")
    assert r["state_store"] == "rocksdb"
    # same feed, same agg → same emitted windows regardless of provider
    assert h["windows_emitted"] == r["windows_emitted"]
    assert x["bigstate_batch_ms_ratio_rocksdb_vs_hdfs"] > 0


def test_stream_bench_session_mode(stream):
    """Round-7 session-window stream evidence: gap-based variable-width
    state, the merge-into-open-session shape.  The feed's burst
    schedule is defined in EVENT time, so the 10× densified feed must
    not open more concurrent sessions — state stays ~flat."""
    if "session" not in stream:
        import pytest

        pytest.skip("stream_bench.json predates the session mode")
    s = stream["session"]
    assert s["input_rows"] == stream["feed_rows"]
    assert s["sessions_emitted"] > 0
    assert 0 < s["max_state_rows"] < stream["feed_rows"]
    x = stream["x10"]
    assert x["session"]["input_rows"] == x["feed_rows"]
    assert x["wall_ratio_vs_1x"]["session"] <= 12.0
    assert x["state_rows_ratio_session"] <= 3.0, x["state_rows_ratio_session"]


def test_slope_index_maintenance_block(slope):
    """Round-10 fixed-delta/variable-base table (VERDICT r9 next-2):
    the CDC-maintained indexes' delta work must stay ~flat while the
    base corpus grows 100×, and maintenance must beat the full rebuild
    at the top decade."""
    if "index_maintenance" not in slope:
        pytest.skip("SCALE_SLOPE.json predates the index_maintenance block")
    m = slope["index_maintenance"]
    assert set(m["tables"]) == {"ann_pq", "text_df"}
    for idx, tbl in m["tables"].items():
        assert set(tbl) == {"1x", "10x", "100x"}, idx
        base_prev = 0
        for leg in ("1x", "10x", "100x"):
            row = tbl[leg]
            # the delta is FIXED across legs; the base grows
            assert row["delta_rows"] == tbl["1x"]["delta_rows"], (idx, leg)
            assert row["base_rows"] >= base_prev, (idx, leg)
            base_prev = row["base_rows"]
            for f in ("t_delta_work_sec", "t_maintain_sec", "t_rebuild_sec"):
                assert row[f] > 0, (idx, leg, f)
        v = m["verdicts"][idx]
        assert v["delta_flat_ratio_100x_vs_1x"] <= m["criteria"][
            "delta_flat_max"
        ], (idx, v)
        # the 100 TB claim is the TREND: rebuild grows with the base,
        # maintenance does not, so maintain/rebuild falls every decade
        # and maintenance wins outright at the top one
        wins = v["maintain_over_rebuild_by_leg"]
        assert wins[0] > wins[1] > wins[2], (idx, wins)
        assert wins[-1] < m["criteria"]["maintain_win_max"], (idx, wins)
        assert v["pass"] is True, idx
    assert m["pass"] is True


def test_stream_bench_index_maintain(stream):
    """Round-10 streaming maintained-index evidence (VERDICT r9
    next-4): vector CDC feed → frozen-codebook re-encode → bucket-
    incremental merge; per-batch cost must not grow with the
    accumulated index (steady twin), and the 10× feed must stay
    near-linear in wall."""
    if "index_maintain" not in stream:
        import pytest

        pytest.skip("stream_bench.json predates the index_maintain block")
    one = stream["index_maintain"]
    x = stream["x10"]
    ten, steady = x["index_maintain"], x["index_maintain_steady"]
    assert one["input_rows"] == stream["vector_feed_rows"]
    assert ten["input_rows"] == x["vector_feed_rows"]
    # ~100-batch runs overflow recentProgress's retention (the same
    # truncation join_steady shows): the earliest batches roll off the
    # buffer, so the steady run's counted input undershoots slightly
    assert steady["input_rows"] >= 0.9 * x["vector_feed_rows"]
    for blk in (one, ten, steady):
        assert 0 < blk["index_rows"] < blk["input_rows"]
        assert blk["micro_batches"] >= 2
        assert blk["batch_ms_median"] > 0
    # same feed, same merge → same final index regardless of batching
    assert ten["index_rows"] == steady["index_rows"]
    assert x["wall_ratio_index_maintain"] <= 12.0
    # the maintenance claim: batch cost tracks the delta, not the
    # accumulated index — the steady run's second-half batches may not
    # balloon as the index grows underneath
    assert steady["batch_ms_growth_2nd_half_vs_1st"] <= 3.0, steady


@pytest.fixture(scope="module")
def pipeline():
    path = os.path.join(ROOT, "curation_pipeline.json")
    if not os.path.exists(path):
        pytest.skip(
            "curation_pipeline.json not generated (run tools/curation_pipeline.py)"
        )
    with open(path) as f:
        return json.load(f)


def test_curation_pipeline_artifact(pipeline):
    """Round-10 staged-pipeline evidence (VERDICT r9 next-5): five
    WAP-gated materialized stages, rows monotone non-increasing through
    the filters, and the staged output equal to the single-plan
    composite."""
    stages = pipeline["stages"]
    order = ["dedup", "decontaminate", "quality", "dist_match", "pack"]
    assert list(stages) == order
    for name in order:
        s = stages[name]
        assert s["version"] >= 1
        assert s["wall_sec"] > 0
        assert s["rows_in"] > 0 and s["rows_out"] > 0
    # every filter stage shrinks (or keeps) the corpus; chaining is
    # consistent: stage k's rows_in is stage k-1's rows_out
    for prev, cur in zip(order[:-1], order[1:]):
        assert stages[cur]["rows_in"] == stages[prev]["rows_out"]
    for name in order[:-1]:  # pack regroups, the others only filter
        assert stages[name]["rows_out"] <= stages[name]["rows_in"]
    assert pipeline["staged_equals_composite"] is True
    assert pipeline["pack_bins"] == stages["pack"]["rows_out"]
