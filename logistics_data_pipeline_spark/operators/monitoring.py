"""Pipeline-monitoring dashboard queries.

Reference: ``src/dashboards/pipeline_monitoring_dashboard.py``
(SURVEY.md A9–A11, O3, O4). These run against the raw/bronze layer.

Deviation (documented): the reference's recent-rows preview orders only
by ``ingestion_timestamp DESC`` — nondeterministic under ties; secondary
sort keys are added so the LIMIT is stable (needed for oracle hashing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scalar_metrics(bronze: DataFrame) -> DataFrame:
    """A9: COUNT(*), COUNT(DISTINCT order_id), MAX(timestamp)
    (pipeline_monitoring_dashboard.py:21-23)."""
    return bronze.agg(
        F.count("*").alias("total_events"),
        F.countDistinct("order_id").alias("unique_orders"),
        F.max("timestamp").alias("latest_event"),
    )


def ingest_trend(bronze: DataFrame, limit: int = 60) -> DataFrame:
    """A10/O3: per-minute counts, most recent 60
    (pipeline_monitoring_dashboard.py:31-39). Catalyst plans this as
    TakeOrderedAndProject — no full sort."""
    return (
        bronze.groupBy(
            F.date_trunc("minute", F.col("timestamp").cast("timestamp")).alias("minute")
        )
        .agg(F.count("*").alias("event_count"))
        .orderBy(F.desc("minute"))
        .limit(limit)
    )


def dq_rollup(summary: DataFrame) -> DataFrame:
    """A11: total invalid by reason (pipeline_monitoring_dashboard.py:54-59)."""
    return (
        summary.groupBy("invalid_reason")
        .agg(F.sum("invalid_count").cast("bigint").alias("total_invalid"))
        .orderBy(F.desc("total_invalid"))
    )


def recent_events(bronze: DataFrame, limit: int = 20) -> DataFrame:
    """O4: recent raw rows (pipeline_monitoring_dashboard.py:76) with
    deterministic tie-breaks (module docstring)."""
    return bronze.orderBy(
        F.desc("ingestion_timestamp"),
        F.desc("timestamp"),
        F.desc("event_id"),
        F.desc("order_id"),
    ).limit(limit)
