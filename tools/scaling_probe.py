"""Scaling probe: time representative queries at sf0.001 / 0.01 / 0.1
and report each key's per-decade wall-clock growth factor.

The point is evidence for the 100 TB question: a key whose cost grows
~linearly with data (factor ≈ 10 per decade, usually less while fixed
overheads dominate) extrapolates safely; a factor ≫ 10 flags a
super-linear shape (all-pairs, unsampled wedges) that would not
survive a 100× scale-up. Run AFTER bench / the gate, never
concurrently.

Usage:
    python tools/scaling_probe.py [names...]   # default: REPRESENTATIVE
Output: one JSON line {key: {sf: sec, ..., "f01": x, "f1": y}} where
f01 = t(0.01)/t(0.001) and f1 = t(0.1)/t(0.01).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logistics_data_pipeline_spark import registry  # noqa: E402
from logistics_data_pipeline_spark.session import get_spark, tune  # noqa: E402

SFS = ["0.001", "0.01", "0.1"]

# One key per heavy family: scan+agg, star join, window, exact pair
# join, banded dedup, graph iteration, ANN, stream replay, sketch,
# forecast, wedge sampling, bootstrap explode.
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
]


def main() -> None:
    names = sys.argv[1:] or REPRESENTATIVE
    qs = registry.queries()
    spark = get_spark("scaling_probe")
    tune(spark)
    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        row: dict[str, float] = {}
        for sf in SFS:
            sf_dir = f"/root/testdata/sf{sf}"
            registry.clear_session_caches(spark, keep_layers=False)
            t0 = time.time()
            fn(spark, sf_dir).collect()
            row[sf] = round(time.time() - t0, 2)
        row["f01"] = round(row["0.01"] / row["0.001"], 2)
        row["f1"] = round(row["0.1"] / row["0.01"], 2)
        out[name] = row
        print(f"# {name}: {row}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
