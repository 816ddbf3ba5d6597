"""Pin the bench.py driver contract.

The driver captures only the last ~2000 chars of bench stdout and
parses the FINAL line as JSON.  Round 4 shipped a single line that
outgrew that buffer (min + interleaved dicts for 39 queries) and the
driver recorded ``"parsed": null`` — the whole bench round was lost.
These tests make that failure class structurally impossible:

* the final stdout line, simulated with worst-case timing widths for
  the CURRENT headline set, must stay under 1800 chars;
* every headline name must exist in the registry (a renamed query
  would crash the bench run itself).
"""

from __future__ import annotations

import json

import bench
from cdc_from_sql_and_nosql_to_data_warehouse_spark import operators as ops


def _final_obj(timings: dict[str, float], paired_int: int = 9999,
               benign: bool = True) -> dict:
    # mirrors the PARENT's final shape: child fields plus the probe /
    # exception summary injected by bench._parent().  r12: the child
    # rounds on-line walls to 2dp, the probe carries only the judgment
    # fields, and an all-benign exception log compacts to
    # {n, benign, class} — the slimming that fits 51 headliners.
    total = round(sum(timings.values()), 3)
    obj = {
        "metric": "headline_query_wall_total",
        "value": total,
        "unit": "sec",
        "queries": {n: round(v, 2) for n, v in timings.items()},
        "sf": 0.1,
        "paired": [paired_int] * len(bench.HEADLINE),
        "yard": {"q": bench.YARDSTICK, "w": 123.456},
        "value_paired": 12345.67,
        "probe": {
            "eff0": 0.123,
            "eff1": 0.123,
            "best_of": 3,
            "max_eff": 0.123,
            "clean": False,
        },
        "exc_n": 1234,
        "exc": (
            {"n": 1234, "benign": True, "class": "contextcleaner_accum_race"}
            if benign
            else {
                "n": 1234,
                "classes": {"contextcleaner_accum_race": 1234},
                "benign": False,
                "first": "E" * 60,
            }
        ),
        "value_norm": 12345.678,
    }
    return obj


def test_headline_names_are_registered():
    missing = [n for n in bench.HEADLINE if n not in ops.REGISTRY]
    assert missing == []


def test_headline_has_no_duplicates():
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))


def test_final_json_line_fits_driver_tail_buffer():
    # realistic-max width: every query at 9.999s (no round since r1
    # has exceeded 5s on any single headliner) with 4-digit paired
    # ints — the UNDEGRADED line must fit outright
    realistic = {name: 9.999 for name in bench.HEADLINE}
    line = json.dumps(_final_obj(realistic))
    assert len(line) < 1950, (
        f"bench final line would be {len(line)} chars with "
        f"{len(bench.HEADLINE)} headline queries; the driver tail buffer "
        "is ~2000 chars — trim HEADLINE or drop per-query detail"
    )


def test_clamped_line_always_fits_and_keeps_paired():
    # worst-case width: hundreds of seconds per query, 5-digit paired
    # ints, a fat exception histogram — the parent's degradation must
    # bring the line under the buffer while KEEPING the paired array
    # (it only drops in the very last step)
    worst = _final_obj(
        {name: 123.456 for name in bench.HEADLINE}, paired_int=99999,
        benign=False,
    )
    worst["exc"]["classes"] = {f"SomeLongExceptionName{i}": i for i in range(20)}
    line = bench._clamped_line(worst)
    obj = json.loads(line)
    assert len(line) < 1950, len(line)
    assert obj["paired"], "degradation dropped the paired array too eagerly"
    assert obj["value_paired"] == 12345.67
    assert obj["queries"] == {}  # raw walls degrade first (sidecar has them)


def test_clamped_line_paired_is_last_resort(monkeypatch):
    # at an absurdly small limit the paired array finally goes too,
    # and the line STILL parses
    worst = _final_obj(
        {name: 123.456 for name in bench.HEADLINE}, paired_int=99999
    )
    line = bench._clamped_line(worst, limit=700)
    obj = json.loads(line)
    assert obj["paired"] == []
    assert obj["value_paired"] == 12345.67


def test_paired_ratios_cancel_uniform_noise():
    # the whole point: a host slowdown that inflates EVERY wall by the
    # same factor leaves the paired ratios bit-identical
    runs_quiet = {n: [1.0 + i * 0.01] * 3 for i, n in enumerate(bench.HEADLINE)}
    yard_quiet = [0.5] * (len(bench.HEADLINE) + 1)
    runs_noisy = {n: [t * 2.3 for t in ts] for n, ts in runs_quiet.items()}
    yard_noisy = [y * 2.3 for y in yard_quiet]
    quiet = bench._paired_ratios(runs_quiet, yard_quiet)
    noisy = bench._paired_ratios(runs_noisy, yard_noisy)
    assert quiet.keys() == noisy.keys() and len(quiet) == len(bench.HEADLINE)
    for n in quiet:
        assert abs(quiet[n] - noisy[n]) < 1e-9, n


def test_paired_ratios_use_min_bracket_and_skip_zero_yard():
    names = bench.HEADLINE
    runs = {n: [2.0] for n in names}
    # first bracket pair is (0.0, 1.0) -> min 1.0 -> ratio 2.0;
    # a fully-zero bracket pair would drop the entry
    yard = [0.0] + [1.0] * len(names)
    got = bench._paired_ratios(runs, yard)
    assert got[names[0]] == 2.0
    yard_dead = [0.0, 0.0] + [1.0] * (len(names) - 1)
    got2 = bench._paired_ratios(runs, yard_dead)
    assert names[0] not in got2 and names[1] in got2


def test_yardstick_is_a_registered_headliner():
    # the yardstick must stay a headline query (it is warmed with the
    # rest and its own raw wall stays on the line for context)
    assert bench.YARDSTICK in bench.HEADLINE
    assert bench.YARDSTICK in ops.REGISTRY


def test_log_scan_counts_exception_frames(tmp_path):
    # the r6 mystery trace: DAGScheduler accumulator-cleanup race —
    # the scanner must count it and keep the first frame
    log = tmp_path / "log.txt"
    log.write_text(
        "26/08/15 07:50:45 WARN TaskSetManager: something benign\n"
        "26/08/15 07:50:45 ERROR DAGScheduler: Failed to update accumulator 5 (Unknown class) for task 0\n"
        "org.apache.spark.SparkException: attempted to access non-existent accumulator 5\n"
        "\tat org.apache.spark.errors.SparkCoreErrors$.x(SparkCoreErrors.scala:252)\n"
        "Caused by: java.lang.IllegalStateException: nope\n"
    )
    got = bench._scan_log(str(log))
    assert got["count"] == 3  # ERROR line + 2 exception frames
    assert "ERROR DAGScheduler" in got["first"]
    # classification (round-8): the accumulator race is named benign,
    # but the unknown IllegalStateException flips the overall verdict
    assert got["classes"]["contextcleaner_accum_race"] == 2
    assert got["classes"]["IllegalStateException"] == 1
    assert got["benign"] is False


def test_log_scan_all_benign_frames_verdict(tmp_path):
    # a log containing ONLY the known ContextCleaner race reads benign
    log = tmp_path / "log.txt"
    log.write_text(
        "26/08/15 07:50:45 ERROR DAGScheduler: Failed to update accumulator 5 (Unknown class) for task 0\n"
        "org.apache.spark.SparkException: attempted to access non-existent accumulator 5\n"
    )
    got = bench._scan_log(str(log))
    assert got["count"] == 2
    assert got["classes"] == {"contextcleaner_accum_race": 2}
    assert got["benign"] is True


def test_log_scan_known_harmful_class_flips_benign(tmp_path, monkeypatch):
    # the per-class benign flag must be READ: a known-but-harmful entry
    # (the documented extension point) may never be lumped into a
    # benign verdict (review-caught round 8)
    monkeypatch.setattr(
        bench,
        "_EXC_KNOWN",
        bench._EXC_KNOWN + [("OutOfMemoryError", "oom", False)],
    )
    log = tmp_path / "log.txt"
    log.write_text("java.lang.OutOfMemoryError: Java heap space\n")
    got = bench._scan_log(str(log))
    assert got["classes"] == {"oom": 1}
    assert got["benign"] is False


def test_clamped_line_bounds_unbounded_classes_histogram():
    # a log with hundreds of distinct exception classes must still
    # produce a line under the driver's tail buffer — the histogram
    # clamps to top-3 + "_other", then drops
    obj = {
        "metric": "headline_query_wall_total",
        "value": 1.0,
        "queries": {f"q_{i}": 1.234 for i in range(40)},
        "exc": {
            "n": 500,
            "classes": {f"SomeLongExceptionClassName{i}": i for i in range(200)},
            "benign": False,
            "first": "x" * 80,
        },
    }
    line = bench._clamped_line(obj)
    assert len(line) <= 1800
    import json as _json

    parsed = _json.loads(line)
    assert parsed["metric"] == "headline_query_wall_total"
    classes = parsed["exc"]["classes"]
    assert len(classes) <= 4  # top 3 + _other, or dropped entirely
    if "_other" in classes:
        assert classes["_other"] == sum(range(200)) - sum(
            sorted(range(200))[-3:]
        )


def test_log_scan_missing_file_is_empty():
    got = bench._scan_log("/nonexistent/definitely/not/here.txt")
    assert got == {
        "count": 0,
        "first": None,
        "classes": {},
        "benign": True,
    }


def test_attempt_selection_prefers_clean_then_fastest():
    # gate-clearing attempt wins even if slower; with no clean attempt
    # the fastest wall is the least noise-inflated sample
    a = {"eff": 0.50, "obj": {"value": 34.0}}
    b = {"eff": 0.90, "obj": {"value": 40.0}}
    c = {"eff": 0.52, "obj": {"value": 38.0}}
    assert bench._select_attempt([a, b, c], gate=0.85) is b
    assert bench._select_attempt([a, c], gate=0.85) is a
    # a missing value never wins
    d = {"eff": 0.60, "obj": {}}
    assert bench._select_attempt([d, c], gate=0.85) is c


def test_cpu_probe_shape():
    # 2-proc probe keeps the test cheap; fields and bounds only —
    # absolute numbers are host-dependent by definition
    got = bench._cpu_probe(2)
    assert got["nproc"] == 2
    assert got["single_ms"] > 0
    assert got["par_wall_ms"] > 0
    assert 0 < got["par_eff"] <= 2.0


def test_stream_bench_await_or_die_raises_on_timeout():
    # a timed-out stream must raise (and be stopped) instead of letting
    # partial batch stats flow into the committed artifact (round-7
    # review fix) — pinned against a fake query object
    import pytest as _pytest

    from tools.stream_bench import _await_or_die

    class FakeQuery:
        def __init__(self, finishes):
            self.finishes = finishes
            self.stopped = False

        def awaitTermination(self, timeout):
            return self.finishes

        def stop(self):
            self.stopped = True

    ok = FakeQuery(finishes=True)
    _await_or_die(ok, 1, "append")  # no raise
    assert not ok.stopped

    hung = FakeQuery(finishes=False)
    with _pytest.raises(RuntimeError, match="did not finish"):
        _await_or_die(hung, 1, "merge")
    assert hung.stopped


def test_paired_compare_reads_all_three_artifact_shapes(tmp_path):
    from tools.paired_compare import load_paired

    queries = {"q_a": 1.0, "q_b": 2.0}
    parsed = {"queries": queries, "paired": [120, 340]}
    # driver capture
    p1 = tmp_path / "BENCH_r9.json"
    p1.write_text(json.dumps({"n": 9, "parsed": parsed}))
    # raw stdout (noise line + artifact line)
    p2 = tmp_path / "out.txt"
    p2.write_text("warming up...\n" + json.dumps(parsed) + "\n")
    # sidecar
    p3 = tmp_path / "bench_secondary.json"
    p3.write_text(json.dumps({"queries_paired": {"q_a": 1.2, "q_b": 3.4}}))
    want = {"q_a": 1.2, "q_b": 3.4}
    for p in (p1, p2, p3):
        assert load_paired(str(p)) == want, p


def test_paired_compare_skips_zero_encoded_entries(tmp_path):
    from tools.paired_compare import load_paired

    p = tmp_path / "b.json"
    p.write_text(
        json.dumps({"queries": {"q_a": 1.0, "q_b": 2.0}, "paired": [0, 200]})
    )
    assert load_paired(str(p)) == {"q_b": 2.0}


def test_offscale_redirect_defaults_out_dir(monkeypatch, tmp_path):
    # ADVICE r11: a bare `--sf-dir <sf1>` run must not clobber the
    # repo-root artifacts — with SPARK_BENCH_OUT_DIR unset the
    # redirect must pick a non-repo dir and rebind the module paths
    monkeypatch.delenv("SPARK_BENCH_OUT_DIR", raising=False)
    monkeypatch.setattr(bench, "_OUT_DIR", bench._REPO)
    bench._redirect_offscale_artifacts()
    try:
        assert bench._OUT_DIR != bench._REPO
        assert bench._LOG_PATH.startswith(bench._OUT_DIR)
        assert bench._SIDECAR.startswith(bench._OUT_DIR)
        import os as _os
        assert _os.environ["SPARK_BENCH_OUT_DIR"] == bench._OUT_DIR
    finally:
        import os as _os
        _os.environ.pop("SPARK_BENCH_OUT_DIR", None)
        bench._OUT_DIR = bench._REPO
        bench._LOG_PATH = _os.path.join(bench._REPO, "bench_spark_log.txt")
        bench._SIDECAR = _os.path.join(bench._REPO, "bench_secondary.json")


def test_offscale_redirect_honors_explicit_out_dir(monkeypatch, tmp_path):
    monkeypatch.setenv("SPARK_BENCH_OUT_DIR", str(tmp_path))
    bench._redirect_offscale_artifacts()
    try:
        assert bench._OUT_DIR == str(tmp_path)
    finally:
        import os as _os
        bench._OUT_DIR = bench._REPO
        bench._LOG_PATH = _os.path.join(bench._REPO, "bench_spark_log.txt")
        bench._SIDECAR = _os.path.join(bench._REPO, "bench_secondary.json")
