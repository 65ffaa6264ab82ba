"""Unit tests for staging (P1-P2) and the validity split (P3-P6),
including the reference's lexicographic string-comparison edge cases
(SURVEY.md §1.2): same-day estimated_delivery must be INVALID because
'YYYY-MM-DD' < 'YYYY-MM-DDTHH:MM:SS' lexicographically."""

from __future__ import annotations

from datetime import datetime

from conftest import make_bronze

from logistics_data_pipeline_spark.operators.staging import stage_events
from logistics_data_pipeline_spark.operators.validity import (
    invalid_events,
    valid_events,
)

CLEAN = {
    "event_id": "e1",
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


def row(**over):
    return {**CLEAN, **over}


def test_staging_trims_and_casts(spark):
    stg = stage_events(make_bronze(spark, [row(event_id="  e1  ", status=" In Transit ")]))
    r = stg.collect()[0]
    assert r.event_id == "e1"
    assert r.status == "In Transit"
    # FLOAT (32-bit) cast matches reference staging
    assert dict(stg.dtypes)["weight_kg"] == "float"


def test_staging_drops_null_and_empty_ids(spark):
    stg = stage_events(
        make_bronze(
            spark,
            [
                row(event_id="e1"),
                row(event_id=None),
                row(event_id="   "),  # whitespace-only trims to ''
                row(order_id=None),
                row(order_id=""),
            ],
        )
    )
    assert [r.event_id for r in stg.collect()] == ["e1"]


def test_same_day_delivery_is_invalid_string_compare(spark):
    """'2024-01-05' < '2024-01-05T08:00:00' lexicographically -> invalid,
    even though temporally it is the same day (the §1.2 edge)."""
    stg = stage_events(
        make_bronze(
            spark,
            [
                row(event_id="same_day", estimated_delivery="2024-01-05"),
                row(event_id="next_day", estimated_delivery="2024-01-06"),
                row(event_id="prev_day", estimated_delivery="2024-01-04"),
            ],
        )
    )
    valid_ids = {r.event_id for r in valid_events(stg).collect()}
    assert valid_ids == {"next_day"}
    inv = {r.event_id: r.invalid_reason for r in invalid_events(stg).collect()}
    assert inv == {
        "same_day": "INVALID_ESTIMATED_DELIVERY",
        "prev_day": "INVALID_ESTIMATED_DELIVERY",
    }


def test_priority_case_first_match_wins(spark):
    """Rows violating several rules get the highest-priority reason
    (weight > coords > delivery > status > location)."""
    stg = stage_events(
        make_bronze(
            spark,
            [
                row(event_id="w_and_c", weight_kg=-1.0, latitude=None),
                row(event_id="c_and_s", latitude=None, status=""),
                row(event_id="s_and_l", status="", origin=""),
            ],
        )
    )
    inv = {r.event_id: r.invalid_reason for r in invalid_events(stg).collect()}
    assert inv == {
        "w_and_c": "INVALID_WEIGHT",
        "c_and_s": "MISSING_COORDINATES",
        "s_and_l": "MISSING_STATUS",
    }


def test_invalid_flag_null_asymmetry(spark):
    """NULL estimated_delivery: excluded from valid (NULL comparison) AND
    explicitly flagged invalid — the reference's deliberate asymmetry."""
    stg = stage_events(make_bronze(spark, [row(event_id="nd", estimated_delivery=None)]))
    assert valid_events(stg).count() == 0
    inv = invalid_events(stg).collect()
    assert len(inv) == 1 and inv[0].invalid_reason == "INVALID_ESTIMATED_DELIVERY"


def test_invalid_output_drops_timestamp_column(spark):
    stg = stage_events(make_bronze(spark, [row(weight_kg=-5.0)]))
    cols = invalid_events(stg).columns
    assert "timestamp" not in cols
    assert "invalid_reason" in cols
