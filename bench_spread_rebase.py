#!/usr/bin/env python
"""Rebuild BENCH_SPREAD.json from N fresh-process single-pass bench runs.

The suspect-cell check in bench.py compares a single-run cell against
the recorded quiet-host spread max. For that comparison to be honest
the reference must come from the SAME protocol the driver uses: one
pass, fresh process. In-session repeats (SPARK_GRAFT_BENCH_REPEAT>1)
run each cell against warm codegen/plan caches and land ~25% faster
per cell (measured 367 s median-of-3 vs 463 s single-pass, same quiet
host), which would mis-flag ~10% of cells on every honest single run.

Usage (quiet host, ~7 min per run):
    python bench_spread_rebase.py [n_runs]

Writes BENCH_SPREAD.json with per-cell [min, median, max] across the
runs; failed cells (-1) are dropped from that cell's sample.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
DETAIL = os.path.join(REPO, "BENCH_DETAIL.json")
SPREAD = os.path.join(REPO, "BENCH_SPREAD.json")


def main() -> int:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    samples: dict[str, list[float]] = {}
    sf = None
    for i in range(n_runs):
        env = dict(os.environ, SPARK_GRAFT_BENCH_REPEAT="1")
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env,
            capture_output=True,
            text=True,
        )
        if proc.returncode != 0:
            print(proc.stderr[-2000:], file=sys.stderr)
            print(f"run {i}: bench.py failed", file=sys.stderr)
            return 1
        with open(DETAIL, encoding="utf-8") as fh:
            detail = json.load(fh)
        sf = detail["sf"]
        for name, t in detail["queries"].items():
            if t >= 0:
                samples.setdefault(name, []).append(t)
        print(f"run {i}: total {detail['value']} s "
              f"({len(detail['queries'])} queries)")
    spread = {
        name: [
            round(min(ts), 3),
            round(statistics.median(ts), 3),
            round(max(ts), 3),
        ]
        for name, ts in sorted(samples.items())
    }
    with open(SPREAD, "w", encoding="utf-8") as fh:
        json.dump(
            {
                "_comment": (
                    "Quiet-host per-cell wall-time spread reference: "
                    "[min, median, max] seconds across "
                    f"{n_runs} FRESH-PROCESS SINGLE-PASS bench runs — "
                    "the driver's exact protocol. bench.py flags "
                    "single-run cells exceeding 1.3x the recorded max "
                    "in suspect_cells (GC/noise indicator, not a plan "
                    "regression). Rebuild with bench_spread_rebase.py; "
                    "in-session repeats must NOT feed this file (warm "
                    "caches make them ~25% faster per cell)."
                ),
                "sf": sf,
                "repeat": n_runs,
                "protocol": "fresh_process_single_pass",
                "spread_min_med_max": spread,
            },
            fh,
            indent=1,
        )
        fh.write("\n")
    print(f"wrote {SPREAD} ({len(spread)} cells)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
