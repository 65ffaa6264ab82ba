"""Attribute `WARN WindowExec: No Partition Defined` emissions to registry
keys (VERDICT r12 #4: 639 such warnings in the gate log, unattributed).

Method: the WARN is emitted by the DRIVER JVM's log4j console appender on
fd 2. Py4j lets us println a marker to the same java.lang.System.err right
before each key executes, so a plain `2> file` capture interleaves markers
and warnings in emission order. Post-processing counts warnings per key.

Usage:
    python tools/window_warn_probe.py [--sf DIR] 2> /tmp/winwarn.err
    python tools/window_warn_probe.py --report /tmp/winwarn.err
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MARK = "WINDOW_WARN_PROBE_KEY"


def run(sf_dir: str) -> None:
    from logistics_data_pipeline_spark import registry
    from logistics_data_pipeline_spark.session import get_spark

    spark = get_spark("window-warn-probe")
    jerr = spark._jvm.java.lang.System.err  # same fd as log4j's console
    qs = registry.queries()
    for name in qs:
        jerr.println(f"{MARK} {name}")
        jerr.flush()
        try:
            qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR {name}: {exc}", file=sys.stdout)
        registry.clear_session_caches(spark)
    jerr.println(f"{MARK} __end__")
    jerr.flush()
    print("probe done", file=sys.stdout)


def report(path: str) -> None:
    counts: dict[str, int] = {}
    key = "__setup__"
    for line in open(path, errors="replace"):
        # markers can land mid-line after \r progress bars
        m = re.search(rf"{MARK} (\S+)", line)
        if m:
            key = m.group(1)
        n = line.count("WARN WindowExec: No Partition Defined")
        if n:
            counts[key] = counts.get(key, 0) + n
    total = sum(counts.values())
    for k, v in sorted(counts.items(), key=lambda kv: -kv[1]):
        print(f"{v:5d}  {k}")
    print(f"total {total}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--report", default=None)
    args = ap.parse_args()
    if args.report:
        report(args.report)
    else:
        run(args.sf)


if __name__ == "__main__":
    main()
