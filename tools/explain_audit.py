"""Plan audit: print the formatted physical plan of selected registry
queries and grep-check the properties that matter at 100 TB —
predicate pushdown reaching the parquet scan, broadcast joins on dim
sides, whole-stage codegen coverage, no Cartesian products.

Usage:
    python tools/explain_audit.py [names...]     # default: audit set
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logistics_data_pipeline_spark import registry  # noqa: E402
from logistics_data_pipeline_spark.session import get_spark  # noqa: E402

# query -> properties its plan must exhibit
EXPECT: dict[str, list[str]] = {
    # NB: "[codegen id: N]" markers only appear in post-execution AQE
    # plans; pre-execution formatted plans omit them, so codegen
    # coverage isn't assertable here.
    "tpch_q6_forecast_revenue": [
        "PushedFilters: [IsNotNull(l_shipdate)",
        "Output [2]: [l_extendedprice",  # column pruning to the 2 used cols
    ],
    "tpch_q3_shipping_priority": ["BroadcastHashJoin", "PushedFilters", "TakeOrderedAndProject"],
    "tpch_q5_local_supplier_volume": ["BroadcastHashJoin"],
    "tpch_q4_order_priority": ["BroadcastHashJoin", "LeftSemi"],
    "tpch_q16_supplier_counts": ["LeftAnti", "BroadcastHashJoin"],
    "kpi_carrier_performance": ["BroadcastHashJoin"],
    "events_asof_join": ["Window"],
    "fact_event": [],
    "monitor_ingest_trend": ["TakeOrderedAndProject"],
}


def main() -> None:
    names = sys.argv[1:] or list(EXPECT)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("explain-audit")
    qs = registry.queries()
    failures = []
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        print(f"{'=' * 20} {name} {'=' * 20}")
        print(plan)
        for want in EXPECT.get(name, []):
            if want not in plan:
                failures.append((name, want))
                print(f"!! MISSING: {want}")
        if "CartesianProduct" in plan:
            failures.append((name, "no CartesianProduct"))
            print("!! UNEXPECTED CartesianProduct")
    if failures:
        print("\nAUDIT FAILURES:")
        for name, want in failures:
            print(f"  {name}: {want}")
        sys.exit(1)
    print("\nplan audit: all expectations present")


if __name__ == "__main__":
    main()
