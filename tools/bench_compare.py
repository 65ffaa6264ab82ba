"""Round-over-round bench triage (VERDICT r7 #6): host contention can
inflate whole bench windows 1.5-3x, so a >1.3x per-key move in the
recorded medians is NOT yet a regression — it is a candidate. This
tool diffs two bench detail files (BENCH_LOCAL_*.json, the stderr
BENCH_DETAIL payload) and, for every key whose MEDIAN moved more than
the threshold in either direction, re-times the key fresh (N samples
in this quiet session, caches cleared between samples) and reports the
min — the number to trust before calling anything a regression.

Usage:
    python tools/bench_compare.py OLD.json NEW.json [--threshold 1.3]
        [--rerun] [--sf /root/testdata/sf0.1]
Output: one JSON line {key: {old, new, ratio, rerun_min?}} plus a
human table on stderr. Run in a quiet window (loadavg <= 2) and never
concurrently with anything else.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.3)
    ap.add_argument("--rerun", action="store_true")
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    old = json.load(open(args.old)).get("queries", {})
    new = json.load(open(args.new)).get("queries", {})
    movers: dict[str, dict] = {}
    for k in sorted(set(old) & set(new)):
        o, n = old[k], new[k]
        if not isinstance(o, (int, float)) or not isinstance(n, (int, float)):
            continue
        if o <= 0:
            continue
        ratio = n / o
        if ratio > args.threshold or ratio < 1 / args.threshold:
            movers[k] = {"old": o, "new": n, "ratio": round(ratio, 2)}
    print(
        f"# {len(movers)} movers past {args.threshold}x over "
        f"{len(set(old) & set(new))} common keys",
        file=sys.stderr,
    )
    if args.rerun and movers:
        from logistics_data_pipeline_spark import registry
        from logistics_data_pipeline_spark.session import get_spark, tune

        spark = tune(get_spark("bench_compare"))
        qs = registry.queries()
        for k in movers:
            if k not in qs:
                continue
            samples = []
            for _ in range(args.samples):
                registry.clear_session_caches(spark, keep_layers=False)
                t0 = time.time()
                qs[k](spark, args.sf).collect()
                samples.append(time.time() - t0)
            movers[k]["rerun_min"] = round(min(samples), 3)
            movers[k]["loadavg"] = round(os.getloadavg()[0], 1)
            print(f"# {k}: {movers[k]}", file=sys.stderr)
    print(json.dumps(movers))


if __name__ == "__main__":
    main()
