"""Scaling probe: time representative queries at sf0.001 / 0.01 / 0.1
(/ sf1 when synthesized) and report each key's per-decade wall-clock
growth factor.

The point is evidence for the 100 TB question: a key whose cost grows
~linearly with data (factor ~= 10 per decade, usually less while fixed
overheads dominate) extrapolates safely; a factor >> 10 flags a
super-linear shape (all-pairs, unsampled wedges) that would not
survive a 100x scale-up. Run AFTER bench / the gate, never
concurrently.

The sf1 decade is the weak-scaled synthetic from tools/make_sf1.py
(10 key-shifted replicas of sf0.1, disjoint shingle/cosine spaces);
run that first or the probe stops at three decades. The sf10 fifth
decade (VERDICT r9 #1) stacks the same construction once more with the
signmask embedding decorrelation and a distinct suffix separator:
    python tools/make_sf1.py .scratch/sf1 .scratch/sf10 \
        --embedding-mode signmask --suffix-sep '='
fNN factors: f01/f1/f10/f100 = ratio to the previous decade. VERDICT r6 #4
also pulls the iterative-graph family (HITS / k-core / triangles /
ensemble components) into the default set.

Usage:
    python tools/make_sf1.py            # once, ~170 MB to .scratch/sf1
    python tools/scaling_probe.py [names...]   # default: REPRESENTATIVE
Output: one JSON line {key: {sf: sec, ..., "f01": x, "f1": y,
"f10": z}} with fNN = ratio to the previous decade.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logistics_data_pipeline_spark import registry  # noqa: E402
from logistics_data_pipeline_spark.session import get_spark, tune  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIRS = {
    "0.001": "/root/testdata/sf0.001",
    "0.01": "/root/testdata/sf0.01",
    "0.1": "/root/testdata/sf0.1",
    "1": os.environ.get(
        "SPARK_GRAFT_SF1_DIR", os.path.join(_REPO, ".scratch", "sf1")
    ),
    "10": os.environ.get(
        "SPARK_GRAFT_SF10_DIR", os.path.join(_REPO, ".scratch", "sf10")
    ),
}

# One key per heavy family: scan+agg, star join, window, exact pair
# join, banded dedup, graph iteration, ANN, stream replay, sketch,
# forecast, wedge sampling, bootstrap explode — plus the four
# iterative-graph keys (VERDICT r6 #4).
REPRESENTATIVE = [
    "tpch_q1_pricing_summary",
    "fact_event",
    "events_user_sessions",
    "docs_neardup_minhash",
    "emb_neardup_lsh",
    "orders_item_pagerank",
    "emb_knn_ivf_exact",
    "stream_dedup_watermark",
    "events_quantile_sketch",
    "events_holt_forecast",
    "orders_link_prediction",
    "events_bootstrap_ci",
    "orders_graph_hits",
    "orders_kcore",
    "orders_graph_triangles",
    "docs_ensemble_components",
]


def main() -> None:
    names = sys.argv[1:] or REPRESENTATIVE
    sfs = [
        sf
        for sf, d in SF_DIRS.items()
        if os.path.exists(os.path.join(d, "events.parquet"))
    ]
    missing = [sf for sf in SF_DIRS if sf not in sfs]
    if missing:
        print(f"# skipping absent SFs: {missing}", file=sys.stderr)
    qs = registry.queries()
    spark = get_spark("scaling_probe")
    tune(spark)
    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        row: dict[str, float] = {}
        for sf in sfs:
            registry.clear_session_caches(spark, keep_layers=False)
            t0 = time.time()
            # noop sink, not collect() (VERDICT r10 #3): a corpus-sized
            # result (fact_event is 8.8M rows at sf10) timed through a
            # driver fetch measures Arrow transfer + driver materialize,
            # not the plan — fact_event's r10 "f100 24.4" was exactly
            # this bias (a fresh-session count() measured the build at
            # 19.7 s ≈ linear). The noop writer executes the full plan
            # (shuffles included) and discards rows executor-side, the
            # same contract bench.py uses.
            fn(spark, SF_DIRS[sf]).write.mode("overwrite").format(
                "noop"
            ).save()
            row[sf] = round(time.time() - t0, 2)
        for fac, hi, lo in (
            ("f01", "0.01", "0.001"),
            ("f1", "0.1", "0.01"),
            ("f10", "1", "0.1"),
            ("f100", "10", "1"),
        ):
            if hi in row and lo in row:
                row[fac] = round(row[hi] / row[lo], 2)
        out[name] = row
        print(f"# {name}: {row}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
