"""Unit tests for the star schema (dims A1-A3, U1; fact J1-J5, P7) and
the dbt_utils-compatible surrogate keys (§2.8)."""

from __future__ import annotations

import hashlib
from datetime import datetime

from conftest import make_bronze

from logistics_data_pipeline_spark.operators.staging import stage_events
from logistics_data_pipeline_spark.operators.star import (
    dim_carrier,
    dim_location,
    dim_order,
    dim_status,
    dim_time,
    fact_event,
)
from logistics_data_pipeline_spark.operators.validity import valid_events

BASE = {
    "order_id": "o1",
    "timestamp": "2024-01-05T08:00:00",
    "status": "In Transit",
    "origin": "A, C1",
    "destination": "B, C2",
    "carrier_name": "DHL",
    "latitude": 10.0,
    "longitude": 20.0,
    "weight_kg": 5.0,
    "estimated_delivery": "2024-01-07",
    "ingestion_timestamp": datetime(2026, 1, 1),
}


def rows(*overrides):
    return [{**BASE, "event_id": f"e{i}", **o} for i, o in enumerate(overrides)]


def _valid(spark, *overrides):
    return valid_events(stage_events(make_bronze(spark, rows(*overrides))))


def test_surrogate_key_matches_dbt_utils_md5(spark):
    sk = dim_carrier(_valid(spark, {})).collect()[0].carrier_sk
    assert sk == hashlib.md5(b"DHL").hexdigest()


def test_dim_location_union_and_independent_mins(spark):
    """A2: MIN(lat)/MIN(lon) taken independently — the resulting pair may
    never have co-occurred in any row (preserved reference quirk)."""
    valid = _valid(
        spark,
        {"origin": "X", "latitude": 5.0, "longitude": 50.0},
        {"origin": "X", "latitude": 1.0, "longitude": 99.0},
        {"destination": "X", "latitude": 9.0, "longitude": 40.0},
    )
    locs = {r.location_name: r for r in dim_location(valid).collect()}
    assert locs["X"].latitude == 1.0 and locs["X"].longitude == 40.0


def test_dim_time_dow_sunday_zero(spark):
    # 2024-01-07 is a Sunday -> DuckDB EXTRACT(DOW) = 0
    valid = _valid(
        spark, {"timestamp": "2024-01-07T01:00:00", "estimated_delivery": "2024-01-09"}
    )
    r = dim_time(valid).collect()[0]
    assert r.day_of_week == 0
    assert r.year == 2024 and r.hour == 1


def test_dim_order_lifecycle_minmax_on_strings(spark):
    valid = _valid(
        spark,
        {"order_id": "o9", "timestamp": "2024-01-05T08:00:00"},
        {"order_id": "o9", "timestamp": "2024-01-06T07:00:00"},
    )
    r = dim_order(valid).collect()[0]
    assert r.first_event_timestamp == "2024-01-05T08:00:00"
    assert r.latest_event_timestamp == "2024-01-06T07:00:00"


def test_fact_is_late_delivery_string_compare_and_null_false(spark):
    """P7: late iff estimated_delivery < latest order event (string cmp);
    NULL latest (impossible here) and on-time rows give FALSE."""
    valid = _valid(
        spark,
        # latest event 2024-01-08T… > estimate 2024-01-07 -> late
        {"order_id": "late", "timestamp": "2024-01-05T08:00:00",
         "estimated_delivery": "2024-01-07"},
        {"order_id": "late", "timestamp": "2024-01-08T09:00:00",
         "estimated_delivery": "2024-01-10"},
        # estimate 2024-01-07 > latest 2024-01-05T… -> on time
        {"order_id": "ontime", "timestamp": "2024-01-05T08:00:00",
         "estimated_delivery": "2024-01-07"},
    )
    fact = fact_event(valid)
    by_order = {}
    dim = {r.order_sk: r.order_id for r in dim_order(valid).collect()}
    for r in fact.collect():
        by_order.setdefault(dim[r.order_sk], []).append(r.is_late_delivery)
    assert by_order["late"][0] is True  # first event's estimate exceeded
    assert by_order["ontime"] == [False]


def test_fact_fk_integrity(spark):
    """dbt relationships tests (schema.yml): every fact FK resolves."""
    valid = _valid(spark, {}, {"status": "Delivered"}, {"carrier_name": "FedEx"})
    fact = fact_event(valid)
    assert fact.filter(
        "order_sk IS NULL OR time_sk IS NULL OR status_sk IS NULL"
        " OR origin_location_sk IS NULL OR destination_location_sk IS NULL"
        " OR carrier_sk IS NULL"
    ).count() == 0
    # event_sk unique + not null
    assert fact.select("event_sk").distinct().count() == fact.count()


def test_dim_status_excludes_empty(spark):
    valid = _valid(spark, {}, {"status": "Delivered"})
    names = {r.status_name for r in dim_status(valid).collect()}
    assert names == {"In Transit", "Delivered"}


def test_dim_order_scd2_collapses_runs_and_versions(spark):
    from logistics_data_pipeline_spark.operators.star import dim_order_scd2

    rows = [
        # order A: Created -> Created (dup run) -> Transit -> Delivered
        ("e1", "A", "2024-01-01T08:00:00", "Order Created"),
        ("e2", "A", "2024-01-01T09:00:00", "Order Created"),
        ("e3", "A", "2024-01-01T10:00:00", "In Transit"),
        ("e4", "A", "2024-01-02T10:00:00", "Delivered"),
        # order B: single event
        ("e5", "B", "2024-01-01T12:00:00", "Picked Up"),
    ]
    valid = spark.createDataFrame(
        rows, ["event_id", "order_id", "timestamp", "status"]
    )
    got = dim_order_scd2(valid).collect()
    a = [r for r in got if r.order_id == "A"]
    assert [(r.status, r.version) for r in a] == [
        ("Order Created", 1), ("In Transit", 2), ("Delivered", 3)
    ]
    assert a[0].effective_from == "2024-01-01T08:00:00"
    assert a[0].effective_to == "2024-01-01T10:00:00"  # run collapsed: e2 absorbed
    assert a[2].effective_to is None and a[2].is_current
    b = [r for r in got if r.order_id == "B"]
    assert len(b) == 1 and b[0].is_current and b[0].version == 1
