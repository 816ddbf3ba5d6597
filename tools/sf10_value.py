"""Value-verify the sf10 decade (r12, VERDICT r11 next-2).

SF10_PROBE.json was walls-only: completion, skew, and spill posture,
with correctness resting on sf1 hashes + slope/invariant tests.  This
tool closes that gap by running the driver's value protocol at the
sf10 blowup for every probed query:

- plain hash where the DuckDB oracle is feasible (bounded threads via
  SPARK_GRAFT_DUCKDB_THREADS, per-oracle interrupt budget) — the
  MATERIALIZED-CTE fix (r11) makes the graph/ER oracles tractable;
- the md5-slice SAMPLED protocol for the deliberately-quadratic
  AllPairs oracles (q_setsim_join, q_dedup_containment — exactness of
  the restriction argument pinned in tests/test_sampled_oracle.py);
- rows-only queries keep their rows-only status, recorded explicitly.

Verdicts are merged INTO SF10_PROBE.json under queries[name]["value"],
so the probe artifact carries completion AND correctness per query.

Usage:
    SPARK_GRAFT_SCALE_DIR=/tmp/spark_graft_scale100x \
    SPARK_GRAFT_DRIVER_MEM=16g python tools/sf10_value.py [query ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from cdc_from_sql_and_nosql_to_data_warehouse_spark import operators as ops
from tools.sf10_probe import QUERIES

BLOWUP_DIR = os.environ.get(
    "SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_scale100x"
)
ORACLE_TIMEOUT = float(os.environ.get("SPARK_GRAFT_ORACLE_TIMEOUT", "900"))
PROBE_PATH = os.path.join(_REPO, "SF10_PROBE.json")


# Plain queries run in CHUNKS of fresh subprocesses: the first full-run
# attempt (r12) hit a driver-heap OOM at query #8 — sequential heavy
# replays accumulate JVM state (collected results, localCheckpoint
# blocks) that no single query needs — and one wedged JVM must not
# take the rest of the sweep with it.  Each chunk gets a fresh JVM and
# its own sidecar; replay_driver also flushes per query now.
_CHUNK = int(os.environ.get("SPARK_GRAFT_VALUE_CHUNK", "4"))

# The sampled-oracle slice must SHRINK with SF (the registered '10'
# 1/16 slice is sized for sf1; at sf10 it reaches ~31k docs = a ~1e9
# pair DuckDB join).  '02' = 1/128 of the key space keeps the slice at
# the same few-thousand-doc size the sf1 protocol ran at.
_SAMPLE_THR_SF10 = os.environ.get("SPARK_GRAFT_SAMPLE_THR", "02")


def _run_replay(extra: list[str], out_path: str, thr: str | None = None) -> dict:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    env.setdefault("SPARK_GRAFT_DUCKDB_THREADS", "4")
    env.setdefault("SPARK_GRAFT_DUCKDB_TEMP", "/tmp/duckdb_spill")
    if thr is not None:
        env["SPARK_GRAFT_SAMPLE_THR"] = thr
    cmd = [sys.executable, os.path.join(_REPO, "tools", "replay_driver.py"),
           "--sf", BLOWUP_DIR, "--json-out", out_path, *extra]
    # exit code 1 just means some query didn't hash-match — the records
    # carry the per-query verdicts either way
    subprocess.run(cmd, cwd=_REPO, env=env, check=False)
    try:
        with open(out_path) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def main() -> None:
    names = sys.argv[1:] or QUERIES
    if not os.path.exists(os.path.join(BLOWUP_DIR, "_BLOWUP_OK")):
        raise SystemExit(f"no blowup at {BLOWUP_DIR}; build it first "
                         "(tools/scale_slope.build_blowup)")
    sampled = [n for n in names if n in ops.SAMPLED_ORACLES]
    plain = [n for n in names if n not in ops.SAMPLED_ORACLES]

    recs: dict[str, dict] = {}
    with tempfile.TemporaryDirectory() as td:
        for ci in range(0, len(plain), _CHUNK):
            chunk = plain[ci:ci + _CHUNK]
            recs.update(_run_replay(
                ["--oracle-timeout", str(ORACLE_TIMEOUT), *chunk],
                os.path.join(td, f"plain{ci}.json")))
        if sampled:
            recs.update(_run_replay(
                ["--sampled-oracle", *sampled],
                os.path.join(td, "sampled.json"),
                thr=_SAMPLE_THR_SF10))

    with open(PROBE_PATH) as fh:
        probe = json.load(fh)
    for name, rec in recs.items():
        probe.setdefault("queries", {}).setdefault(name, {})["value"] = rec
    statuses = sorted(
        (r["status"] for r in recs.values()),
    )
    summary = {s: statuses.count(s) for s in dict.fromkeys(statuses)}
    probe.setdefault("notes", {})["value_protocol"] = (
        f"r12 tools/sf10_value.py: plain oracle (timeout {ORACLE_TIMEOUT:.0f}s,"
        f" 4-thread DuckDB, fresh-JVM chunks of {_CHUNK}) + sampled"
        f" md5-slice (SPARK_GRAFT_SAMPLE_THR '{_SAMPLE_THR_SF10}', SF-sized"
        " so the slice stays a few thousand docs) for the AllPairs pair"
        " joins; rows-only recorded as such"
    )
    with open(PROBE_PATH, "w") as fh:
        json.dump(probe, fh, indent=1, sort_keys=True)
    bad = [n for n, r in recs.items()
           if r["status"] not in ("OK", "OK-SAMPLED", "rows-only",
                                  "ORACLE-TIMEOUT")]
    print(json.dumps({"checked": len(recs), "summary": summary,
                      "failed": bad}))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
