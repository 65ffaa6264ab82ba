"""orders_link_prediction phase attribution (VERDICT r11 #5).

SCALING_r11's 335.5 s sf10 row is the record's largest absolute; this
probe splits it into the stages the operator actually runs so the cost
is attributable:

  edges   — copurchase_edges: DISTINCT (order, part) items, the
            middle-keyed self-join per order, DISTINCT edge list +
            out-degrees (the shared session asset in bench, so bench
            timings amortize it; the scaling probe pays it cold).
  cap     — hub cap + semi-join + the eager localCheckpoint of the
            capped edge frame, plus the broadcast degree table.
  wedges  — the governed (1/16 md5 middle sample) wedge self-join and
            the (u, w) partial-agg of CN / integer-RA.
  rank    — anti-join against existing edges, degree joins, top-50.

Usage:
    python tools/lp_probe.py [--sf DIR ...]

Output: one JSON line per decade with per-phase seconds (each phase
timed by forcing an action on its checkpointed/collapsed frame; later
phases reuse the earlier frames, so the split sums to ~the end-to-end
cost rather than double-counting).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from logistics_data_pipeline_spark.adapters.testdata import load_table  # noqa: E402
from logistics_data_pipeline_spark.operators import analytics  # noqa: E402
from logistics_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", nargs="+", default=[".scratch/sf1", ".scratch/sf10"])
    args = ap.parse_args()

    spark = get_spark("lp_probe")
    for sf_dir in args.sf:
        li = load_table(spark, sf_dir, "lineitem")
        out = {"sf": sf_dir}

        from pyspark import StorageLevel

        t0 = time.time()
        # DISK_ONLY for every corpus-sized probe frame: the registered
        # key holds at most ONE checkpointed edge copy at a time; the
        # probe retains edges_od AND capped AND pairs simultaneously to
        # isolate phases, which heap-OOMed twice at sf10 before this.
        edges_od = analytics.copurchase_edges(li).persist(StorageLevel.DISK_ONLY)
        out["n_edges"] = edges_od.count()
        out["edges_sec"] = round(time.time() - t0, 1)

        t0 = time.time()
        keep = edges_od.filter(
            F.col("od") <= analytics.LP_MAX_DEG
        ).select("src", "dst")
        capped = keep.join(
            keep.select(F.col("src").alias("dst")).distinct(),
            "dst",
            "left_semi",
        ).persist(StorageLevel.DISK_ONLY)
        degs = (
            capped.groupBy("src")
            .agg(F.count("*").cast("bigint").alias("d"))
            .localCheckpoint(eager=True)
        )
        out["n_capped"] = capped.count()
        out["cap_sec"] = round(time.time() - t0, 1)

        t0 = time.time()
        mid_kept = (
            F.substring(F.md5(F.col("src").cast("string")), 1, 1)
            < analytics.LP_SAMPLE_HEX
        )
        e2 = (
            capped.filter(mid_kept)
            .join(F.broadcast(degs), "src")
            .select(
                F.col("src").alias("v"),
                F.col("dst").alias("w"),
                F.col("d").alias("dv"),
            )
        )
        pairs = (
            capped.select(F.col("dst").alias("v"), F.col("src").alias("u"))
            .join(e2, "v")
            .filter(F.col("u") < F.col("w"))
            .groupBy("u", "w")
            .agg(
                (F.count("*") * analytics.LP_SAMPLE_SCALE)
                .cast("bigint")
                .alias("cn"),
                (
                    F.sum(F.expr(f"{analytics.LP_RA_SCALE} DIV dv"))
                    * analytics.LP_SAMPLE_SCALE
                )
                .cast("bigint")
                .alias("ra_micro"),
            )
        )
        # DISK_ONLY, not localCheckpoint: the pair frame is the one
        # corpus-quadratic-ish intermediate (890M rows at sf10) — heap
        # retention of it OOMed the first sf10 probe attempt; the
        # registered key never retains it at all (it streams into the
        # TakeOrdered top-50), so the probe shouldn't either.
        pairs = pairs.persist(StorageLevel.DISK_ONLY)
        out["n_pairs"] = pairs.count()
        out["wedges_sec"] = round(time.time() - t0, 1)

        t0 = time.time()
        existing = capped.filter(F.col("src") < F.col("dst")).select(
            F.col("src").alias("u"), F.col("dst").alias("w")
        )
        fresh = pairs.join(existing, ["u", "w"], "left_anti")
        scored = (
            fresh.join(
                F.broadcast(
                    degs.select(F.col("src").alias("u"), F.col("d").alias("du"))
                ),
                "u",
            )
            .join(
                F.broadcast(
                    degs.select(F.col("src").alias("w"), F.col("d").alias("dw"))
                ),
                "w",
            )
            .select(
                "u",
                "w",
                F.col("cn").alias("cn_est"),
                F.round(
                    F.col("ra_micro").cast("double")
                    / F.lit(float(analytics.LP_RA_SCALE)),
                    6,
                ).alias("ra_score"),
                F.round(
                    F.col("cn").cast("double")
                    / (F.col("du") + F.col("dw") - F.col("cn")).cast("double"),
                    6,
                ).alias("jaccard"),
            )
        )
        out["n_top"] = (
            scored.orderBy(
                F.col("ra_score").desc(), F.col("cn_est").desc(), "u", "w"
            )
            .limit(analytics.LP_TOP)
            .count()
        )
        out["rank_sec"] = round(time.time() - t0, 1)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
