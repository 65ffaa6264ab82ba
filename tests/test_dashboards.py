"""Dashboard presentation-layer parity (VERDICT r8 delta #1): the
chart-ready payloads and plotly channel bindings of
`src/dashboards/Business_KPI_dashboard.py` and
`pipeline_monitoring_dashboard.py`, minus only the pixels."""

from __future__ import annotations

from datetime import datetime

import pytest

from logistics_data_pipeline_spark import dashboards as dash
from logistics_data_pipeline_spark.adapters.testdata import bronze_events
from logistics_data_pipeline_spark.pipeline import build_warehouse


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir):
    return build_warehouse(bronze_events(spark, sf_dir), persist=False)


def _specs(warehouse):
    return dash.business_kpi_dashboard(
        warehouse["fact_event"],
        warehouse["dim_carrier"],
        warehouse["dim_location"],
        warehouse["dim_status"],
    )


def test_business_dashboard_charts_match_reference_order_and_channels(warehouse):
    specs = _specs(warehouse)
    assert [(s.chart_id, s.mark) for s in specs] == [
        ("carrier_performance", "bar"),
        ("active_shipment_map", "map"),
        ("weight_distribution", "histogram"),
        ("events_by_status", "pie"),
    ]
    bar = specs[0]
    # Business_KPI_dashboard.py:37-49 — exact px.bar channels + labels
    assert (bar.x, bar.y, bar.color) == (
        "carrier_name", "on_time_rate", "late_deliveries",
    )
    assert bar.labels == {
        "on_time_rate": "On-Time Rate (%)",
        "late_deliveries": "Late Deliveries",
    }
    assert bar.title == "On-Time Rate vs Late Deliveries per Carrier"
    hist = specs[2]
    assert hist.nbins == 50 and hist.x == "weight_kg"


def test_business_dashboard_payloads_are_the_registered_operators(warehouse):
    from logistics_data_pipeline_spark.operators import kpi

    specs = {s.chart_id: s for s in _specs(warehouse)}
    fact = warehouse["fact_event"]
    assert sorted(
        specs["carrier_performance"].df.collect()
    ) == sorted(kpi.carrier_performance(fact, warehouse["dim_carrier"]).collect())
    assert sorted(specs["events_by_status"].df.collect()) == sorted(
        kpi.status_distribution(fact, warehouse["dim_status"]).collect()
    )
    # every chart frame carries exactly the columns its channels bind
    cp = specs["carrier_performance"].df.columns
    assert {"carrier_name", "on_time_rate", "late_deliveries"} <= set(cp)
    assert set(specs["active_shipment_map"].df.columns) == {
        "latitude", "longitude", "status", "carrier_name",
    }


def test_monitoring_dashboard_charts(spark, sf_dir, warehouse):
    bronze = bronze_events(spark, sf_dir)
    specs = dash.monitoring_dashboard(
        bronze, warehouse["dq_invalid_delivery_summary"]
    )
    assert [(s.chart_id, s.mark) for s in specs] == [
        ("headline_metrics", "metric"),
        ("ingestion_trend", "line"),
        ("dq_issues", "bar"),
        ("recent_raw", "table"),
    ]
    metrics = specs[0].df.collect()[0]
    assert metrics.total_events == bronze.count()
    # trend is capped at the reference's 60-minute window
    assert specs[1].df.count() <= 60
    assert specs[3].df.count() <= 20


def test_render_text_and_plotly_degrade_gracefully(warehouse):
    spec = _specs(warehouse)[0]
    txt = spec.render_text(limit=3)
    assert txt.startswith("[bar] On-Time Rate vs Late Deliveries per Carrier")
    assert "carrier_name" in txt
    try:
        import plotly  # noqa: F401

        has_plotly = True
    except ImportError:
        has_plotly = False
    fig = spec.render_plotly()
    if has_plotly:
        assert fig is not None
    else:
        assert fig is None  # no crash without a front end


def test_binned_histogram_sums_to_row_count(warehouse):
    fact = warehouse["fact_event"]
    binned = dash.weight_histogram_binned(fact).collect()
    n_rows = fact.filter("weight_kg IS NOT NULL").count()
    assert sum(r.n for r in binned) == n_rows
    assert all(0 <= r.bin < 50 for r in binned)
    # bins tile the range in order without overlap
    for a, b in zip(binned, binned[1:]):
        assert a.bin < b.bin and a.bin_end <= b.bin_start + 1e-9
