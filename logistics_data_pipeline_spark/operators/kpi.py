"""Business-KPI dashboard queries.

Reference: ``src/dashboards/Business_KPI_dashboard.py`` (SURVEY.md A7,
A8, J7–J9, O2, O5, P8, P9). Each function returns the DataFrame a
dashboard would render; at scale these run against materialized gold
tables rather than re-deriving the star per query (pipeline.py offers
both; the reference recomputes views every query — SURVEY.md §4).

Scale notes: all four are aggregations/filters over the fact joined to
tiny broadcast dims; no shuffle beyond the final small group-bys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.core import nullif_zero


def carrier_performance(fact: DataFrame, d_carrier: DataFrame) -> DataFrame:
    """A7/J7/O2: per-carrier on-time rate (Business_KPI_dashboard.py:20-34)."""
    f = fact.alias("f")
    c = F.broadcast(d_carrier).alias("c")
    joined = f.join(c, F.col("f.carrier_sk") == F.col("c.carrier_sk"), "left")
    return (
        joined.groupBy(F.col("c.carrier_name").alias("carrier_name"))
        .agg(
            F.count("f.event_sk").alias("total_events"),
            F.sum(F.when(F.col("f.is_late_delivery"), 1).otherwise(0))
            .cast("bigint")
            .alias("late_deliveries"),
            F.round(
                F.sum(F.when(~F.col("f.is_late_delivery"), 1).otherwise(0)) * 100.0
                / nullif_zero(F.count("f.event_sk")),
                2,
            ).alias("on_time_rate"),
            F.round(F.avg("f.weight_kg"), 2).alias("avg_weight_kg"),
        )
        .orderBy(F.desc("on_time_rate"))
    )


def active_shipments(
    fact: DataFrame, d_location: DataFrame, d_status: DataFrame, d_carrier: DataFrame
) -> DataFrame:
    """P8/J8: geo map of not-yet-delivered shipments
    (Business_KPI_dashboard.py:55-68). ``!=`` is null-rejecting: events
    whose status join missed are excluded — preserved."""
    f = fact.alias("f")
    l = F.broadcast(d_location).alias("l")
    s = F.broadcast(d_status).alias("s")
    c = F.broadcast(d_carrier).alias("c")
    return (
        f.join(l, F.col("f.origin_location_sk") == F.col("l.location_sk"), "left")
        .join(s, F.col("f.status_sk") == F.col("s.status_sk"), "left")
        .join(c, F.col("f.carrier_sk") == F.col("c.carrier_sk"), "left")
        .filter(
            (F.col("s.status_name") != "Delivered")
            & F.col("l.latitude").isNotNull()
            & F.col("l.longitude").isNotNull()
        )
        .select(
            F.col("l.latitude").alias("latitude"),
            F.col("l.longitude").alias("longitude"),
            F.col("s.status_name").alias("status"),
            F.col("c.carrier_name").alias("carrier_name"),
        )
    )


def weight_distribution(fact: DataFrame) -> DataFrame:
    """P9: weights for the histogram (Business_KPI_dashboard.py:80-82)."""
    return fact.filter(F.col("weight_kg").isNotNull()).select("weight_kg")


def status_distribution(fact: DataFrame, d_status: DataFrame) -> DataFrame:
    """A8/J9/O5: event counts by status (Business_KPI_dashboard.py:95-101)."""
    f = fact.alias("f")
    s = F.broadcast(d_status).alias("s")
    return (
        f.join(s, F.col("f.status_sk") == F.col("s.status_sk"), "left")
        .groupBy(F.col("s.status_name").alias("status_name"))
        .agg(F.count("*").alias("event_count"))
        .orderBy(F.desc("event_count"))
    )
