"""The reference dashboards' presentation layer, engine-side.

The reference renders two Streamlit pages
(`src/dashboards/Business_KPI_dashboard.py`,
`src/dashboards/pipeline_monitoring_dashboard.py`): each chart is a SQL
query (all of which are green registry keys here) plus a fixed chart
spec (mark type, axes, color channel, title, bin count). This module
ports that LAST layer — the exact chart-ready frames and their specs —
so a dashboard user switching engines gets identical payloads; only the
pixel rendering stays with whatever front end is installed
(``render_plotly`` builds the same ``px.bar/line/pie/histogram`` figures
when plotly is importable, and every spec renders text-mode without it).

Scale: every payload below is the OUTPUT of an aggregate operator
(carrier counts, status counts, 60-minute trend, 20-row preview) — tiny
frames a driver can hold no matter the fact-table size. The one
exception in the reference, the raw per-row weight histogram
(``px.histogram`` shipping every weight to the browser), is additionally
offered pre-binned (``weight_histogram_binned``) because shipping 100 TB
of rows to a chart is the one thing this layer must never do."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class ChartSpec:
    """One chart: the reference's plotly-express call, data included."""

    chart_id: str
    mark: str  # "bar" | "line" | "pie" | "histogram" | "map" | "metric" | "table"
    title: str
    df: DataFrame
    x: str | None = None
    y: str | None = None
    color: str | None = None
    nbins: int | None = None
    labels: dict = field(default_factory=dict)

    def render_text(self, limit: int = 25) -> str:
        """Front-end-free rendering: the spec header plus the payload
        rows — what the chart communicates, minus the pixels."""
        head = f"[{self.mark}] {self.title}"
        axes = ", ".join(
            f"{k}={v}"
            for k, v in (("x", self.x), ("y", self.y), ("color", self.color))
            if v
        )
        if axes:
            head += f" ({axes})"
        body = "\n".join(str(r.asDict()) for r in self.df.limit(limit).collect())
        return f"{head}\n{body}"

    def render_plotly(self):
        """The same px figure the reference builds; None if plotly is
        not installed (it is not baked into this container)."""
        try:
            import plotly.express as px  # noqa: PLC0415
        except ImportError:
            return None
        pdf = self.df.toPandas()
        if self.mark == "bar":
            return px.bar(
                pdf, x=self.x, y=self.y, color=self.color,
                title=self.title, labels=self.labels,
            )
        if self.mark == "line":
            return px.line(pdf.sort_values(self.x), x=self.x, y=self.y, title=self.title)
        if self.mark == "pie":
            return px.pie(pdf, names=self.x, values=self.y, title=self.title)
        if self.mark == "histogram":
            return px.histogram(pdf, x=self.x, title=self.title, nbins=self.nbins)
        return None


def business_kpi_dashboard(
    fact: DataFrame,
    d_carrier: DataFrame,
    d_location: DataFrame,
    d_status: DataFrame,
) -> list[ChartSpec]:
    """Business_KPI_dashboard.py:20-116 — four charts, same order, same
    payloads (each df is the registered operator the reference SQL
    equals), same plotly channels."""
    from .operators.kpi import (
        active_shipments,
        carrier_performance,
        status_distribution,
        weight_distribution,
    )

    return [
        ChartSpec(
            "carrier_performance", "bar",
            "On-Time Rate vs Late Deliveries per Carrier",
            carrier_performance(fact, d_carrier),
            x="carrier_name", y="on_time_rate", color="late_deliveries",
            labels={
                "on_time_rate": "On-Time Rate (%)",
                "late_deliveries": "Late Deliveries",
            },
        ),
        ChartSpec(
            "active_shipment_map", "map", "Active Shipment Locations",
            active_shipments(fact, d_location, d_status, d_carrier),
            x="longitude", y="latitude", color="status",
        ),
        ChartSpec(
            "weight_distribution", "histogram",
            "Distribution of Package Weights (kg)",
            weight_distribution(fact), x="weight_kg", nbins=50,
        ),
        ChartSpec(
            "events_by_status", "pie", "Event Distribution by Status",
            status_distribution(fact, d_status),
            x="status_name", y="event_count",
        ),
    ]


def monitoring_dashboard(
    bronze: DataFrame, dq_summary: DataFrame
) -> list[ChartSpec]:
    """pipeline_monitoring_dashboard.py:20-77 — headline metrics,
    ingestion trend (last 60 minutes), DQ-issue bar, 20-row preview."""
    from .operators.monitoring import (
        dq_rollup,
        ingest_trend,
        recent_events,
        scalar_metrics,
    )

    return [
        ChartSpec(
            "headline_metrics", "metric", "Pipeline Health",
            scalar_metrics(bronze),
        ),
        ChartSpec(
            "ingestion_trend", "line", "Events Landed in MinIO (Last 60 Minutes)",
            ingest_trend(bronze), x="minute", y="event_count",
        ),
        ChartSpec(
            "dq_issues", "bar", "Invalid Records by Reason",
            dq_rollup(dq_summary),
            x="invalid_reason", y="total_invalid", color="invalid_reason",
        ),
        ChartSpec(
            "recent_raw", "table", "Recent Raw Payloads (Bronze)",
            recent_events(bronze),
        ),
    ]


def weight_histogram_binned(fact: DataFrame, nbins: int = 50) -> DataFrame:
    """Scale-safe twin of the weight histogram: the reference ships
    every ``weight_kg`` row to plotly and bins client-side; at 100 TB
    the binning must happen IN the engine. Equal-width bins over the
    observed [min, max], matching plotly's autobin-with-nbins contract
    closely enough to chart: (bin_start, bin_end, n). One aggregate to
    find the range (2-row broadcast), one pass to bin — no row leaves
    the cluster."""
    w = fact.filter(F.col("weight_kg").isNotNull()).select(
        F.col("weight_kg").cast("double").alias("w")
    )
    rng = F.broadcast(
        w.agg(F.min("w").alias("lo"), F.max("w").alias("hi"))
    )
    return (
        w.join(rng)
        .withColumn(
            "bin",
            F.when(
                F.col("hi") == F.col("lo"), F.lit(0)
            ).otherwise(
                F.least(
                    F.floor(
                        (F.col("w") - F.col("lo"))
                        / ((F.col("hi") - F.col("lo")) / nbins)
                    ).cast("int"),
                    F.lit(nbins - 1),
                )
            ),
        )
        .groupBy("bin", "lo", "hi")
        .agg(F.count("*").cast("bigint").alias("n"))
        .select(
            F.col("bin").cast("int").alias("bin"),
            F.round(
                F.col("lo") + F.col("bin") * (F.col("hi") - F.col("lo")) / nbins, 6
            ).alias("bin_start"),
            F.round(
                F.col("lo") + (F.col("bin") + 1) * (F.col("hi") - F.col("lo")) / nbins, 6
            ).alias("bin_end"),
            "n",
        )
        .orderBy("bin")
    )
