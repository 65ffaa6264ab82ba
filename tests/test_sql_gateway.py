"""S12: the read-only analytic connection. The reference dashboards
submit SQL strings against warehouse views (Business_KPI_dashboard.py);
the Spark equivalent is temp views + spark.sql — this test runs the
reference's carrier-KPI SQL verbatim through the gateway and checks it
equals the DataFrame-API formulation."""

from __future__ import annotations

from logistics_data_pipeline_spark.adapters.testdata import bronze_events
from logistics_data_pipeline_spark.operators.kpi import carrier_performance
from logistics_data_pipeline_spark.pipeline import build_warehouse, register_views

# Reference Business_KPI_dashboard.py:20-34, unchanged.
REFERENCE_KPI_SQL = """
    SELECT
        c.carrier_name,
        COUNT(f.event_sk)                                          AS total_events,
        SUM(CASE WHEN f.is_late_delivery THEN 1 ELSE 0 END)       AS late_deliveries,
        ROUND(
            SUM(CASE WHEN NOT f.is_late_delivery THEN 1 ELSE 0 END) * 100.0
            / NULLIF(COUNT(f.event_sk), 0), 2
        )                                                          AS on_time_rate,
        ROUND(AVG(f.weight_kg), 2)                                 AS avg_weight_kg
    FROM fact_event f
    LEFT JOIN dim_carrier c ON f.carrier_sk = c.carrier_sk
    GROUP BY c.carrier_name
    ORDER BY on_time_rate DESC
"""


def test_reference_dashboard_sql_runs_verbatim(spark, sf_dir):
    wh = build_warehouse(bronze_events(spark, sf_dir), persist=False)
    register_views(wh)
    via_sql = spark.sql(REFERENCE_KPI_SQL).collect()
    via_api = carrier_performance(wh["fact_event"], wh["dim_carrier"]).collect()
    assert len(via_sql) == len(via_api) > 0
    # SQL literal 100.0 parses as DECIMAL in Spark SQL (the DataFrame
    # path uses a double literal) — same values, different type; compare
    # as floats.
    sql_rows = {
        (r.carrier_name, r.total_events, int(r.late_deliveries), float(r.on_time_rate))
        for r in via_sql
    }
    api_rows = {
        (r.carrier_name, r.total_events, int(r.late_deliveries), float(r.on_time_rate))
        for r in via_api
    }
    assert sql_rows == api_rows
