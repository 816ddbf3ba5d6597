"""Compare two bench artifacts by their PAIRED ratios (round 9+).

Usage:
    python tools/paired_compare.py OLD NEW

OLD/NEW may each be:
  * a driver capture (BENCH_r{N}.json — reads .parsed),
  * a raw bench stdout line file (last JSON line wins), or
  * a bench_secondary.json sidecar (reads .queries_paired directly).

For every query present in both, prints NEW/OLD of the paired ratio —
the host-noise-immune drift number.  ~1.0 = unchanged; the median over
unchanged queries should sit near 1.0 even when raw walls drift 2×
with tenancy (SCALE.md "paired-calibration bench").  Exits 0 always;
this is a reading aid, not a gate — the 2× gate binds on the judged
artifacts themselves.
"""

from __future__ import annotations

import json
import statistics
import sys


def load_paired(path: str) -> dict[str, float]:
    """Per-query paired ratios from any of the three artifact shapes."""
    with open(path) as f:
        text = f.read()
    try:
        obj = json.loads(text)
    except ValueError:
        obj = None
    if isinstance(obj, dict) and "parsed" in obj:  # driver capture
        obj = obj["parsed"]
    if obj is None:  # raw stdout: last parseable JSON line
        for line in reversed(text.strip().splitlines()):
            try:
                obj = json.loads(line)
                break
            except ValueError:
                continue
    if not isinstance(obj, dict):
        raise SystemExit(f"{path}: no JSON artifact found")
    if "queries_paired" in obj:  # sidecar
        return {k: float(v) for k, v in obj["queries_paired"].items()}
    queries = obj.get("queries") or {}
    paired = obj.get("paired") or []
    if not queries or not paired:
        raise SystemExit(
            f"{path}: artifact carries no paired data "
            "(pre-round-9 bench, or the line degraded it — "
            "use bench_secondary.json)"
        )
    # "paired" ints are ratio*100 aligned with the queries key order
    out = {}
    for name, p in zip(queries, paired):
        if p:  # 0 encodes an unusable yardstick bracket
            out[name] = p / 100.0
    return out


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    old, new = load_paired(sys.argv[1]), load_paired(sys.argv[2])
    common = sorted(set(old) & set(new))
    if not common:
        raise SystemExit("no common queries between the two artifacts")
    drifts = {n: new[n] / old[n] for n in common if old[n] > 0}
    width = max(len(n) for n in common)
    for n in sorted(drifts, key=drifts.get):
        print(f"{n:<{width}}  old={old[n]:7.2f}  new={new[n]:7.2f}  "
              f"drift={drifts[n]:5.2f}x")
    med = statistics.median(drifts.values())
    flagged = {n: d for n, d in drifts.items() if d > max(1.5, 1.5 * med)}
    print(json.dumps({
        "n_common": len(drifts),
        "median_drift": round(med, 3),
        "flagged_over_1p5x_of_median": {
            n: round(d, 2) for n, d in sorted(flagged.items())
        },
    }))


if __name__ == "__main__":
    main()
