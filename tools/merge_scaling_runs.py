"""Merge N scaling-probe runs into one record by per-(key, sf) MINIMUM.

Host contention inflates whole probe windows 2-5x (the round-5 bench
lesson applies to the probe too: external load hit loadavg 20-40 during
round 11's first pass while the container itself was idle). The minimum
across runs is the defensible estimate of the plan's cost; growth
factors are recomputed from the merged cells so a row never mixes a
calm sf1 with a contended sf10.

Usage:
    python tools/merge_scaling_runs.py run1.json run2.json ... > out.json
"""

from __future__ import annotations

import json
import sys

SFS = ["0.001", "0.01", "0.1", "1", "10"]
FACTORS = [("f01", "0.01", "0.001"), ("f1", "0.1", "0.01"),
           ("f10", "1", "0.1"), ("f100", "10", "1")]


def main() -> None:
    runs = [json.load(open(p)) for p in sys.argv[1:]]
    keys: list[str] = []
    for r in runs:
        for k in r:
            if not k.startswith("_") and k not in keys:
                keys.append(k)
    out: dict = {}
    for k in keys:
        row: dict = {}
        for sf in SFS:
            vals = [r[k][sf] for r in runs if k in r and sf in r[k]]
            if vals:
                row[sf] = min(vals)
        for fac, hi, lo in FACTORS:
            if hi in row and lo in row:
                row[fac] = round(row[hi] / row[lo], 2)
        out[k] = row
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
