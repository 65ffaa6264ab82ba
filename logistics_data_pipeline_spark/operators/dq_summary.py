"""Data-quality invalid-event summary.

Reference: ``intermediate/quality/dq_invalid_delivery_summary.sql``
(SURVEY.md A4–A6, J6, O1): daily totals from staging, per-(date, reason)
invalid counts, LEFT JOIN, ratio-of-aggregates with NULLIF guard,
ROUND(..., 2).

Scale notes: two small-cardinality hash aggregations (keys = dates ×
reasons) with map-side partial aggregation, then a broadcast-able join
on event_date.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.core import nullif_zero


def dq_invalid_delivery_summary(stg: DataFrame, invalid: DataFrame) -> DataFrame:
    all_events = stg.groupBy(
        F.col("ingestion_timestamp").cast("date").alias("event_date")
    ).agg(F.count("event_id").alias("total_events"))

    invalid_counts = (
        invalid.select(
            F.col("ingestion_timestamp").cast("date").alias("event_date"),
            "invalid_reason",
            "event_id",
        )
        .groupBy("event_date", "invalid_reason")
        .agg(F.count("event_id").alias("invalid_count"))
    )

    summary = invalid_counts.alias("ic").join(
        F.broadcast(all_events.alias("ae")),
        F.col("ic.event_date") == F.col("ae.event_date"),
        "left",
    )
    return summary.select(
        F.col("ic.event_date").alias("event_date"),
        "invalid_reason",
        "invalid_count",
        "total_events",
        # Reference casts to FLOAT; DuckDB then does float32 arithmetic
        # while Spark promotes float/long to double. Both sides compute
        # in DOUBLE here so the engines agree to the bit (the float32
        # path differs only below display precision).
        F.round(
            F.col("invalid_count").cast("double")
            / nullif_zero(F.col("total_events"))
            * 100,
            2,
        ).alias("pct_of_total_events"),
    ).orderBy("event_date", "invalid_reason")
