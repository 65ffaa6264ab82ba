"""Spark job/stage-count probe (VERDICT r12 #7): re-execution-count wins
(checkpoint a frame once instead of re-running its subtree per round) do
not change the final plan dump, so the evidence is the number of JOBS a
key submits. Each key runs inside its own job group; the status tracker
then reports how many jobs (and their stages) that group submitted.

Usage:
    python tools/job_count_probe.py [--sf DIR] key...
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logistics_data_pipeline_spark import registry  # noqa: E402
from logistics_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark("job-count-probe")
    sc = spark.sparkContext
    qs = registry.queries()
    # warm the silver layer so its one-time build doesn't count
    registry._valid(spark, args.sf).write.mode("overwrite").format("noop").save()
    out = {}
    for name in args.names:
        group = f"probe:{name}"
        sc.setJobGroup(group, name)
        qs[name](spark, args.sf).write.mode("overwrite").format("noop").save()
        sc.setJobGroup(None, None)
        tracker = sc.statusTracker()
        job_ids = tracker.getJobIdsForGroup(group)
        n_stages = 0
        for jid in job_ids:
            info = tracker.getJobInfo(jid)
            if info is not None:
                n_stages += len(info.stageIds)
        out[name] = {"jobs": len(job_ids), "stages": n_stages}
        registry.clear_session_caches(spark)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
