"""Validity split: 5-rule conjunction (valid) and flag/label (invalid).

Reference: ``int_valid_logistics_events.sql`` (P3) and
``int_invalid_logistics_events.SQL`` (P4–P6).

Semantics preserved exactly (SURVEY.md §1.2): ``estimated_delivery >=
timestamp`` is a LEXICOGRAPHIC string comparison — a same-day ISO date
('2024-01-05') compares LESS THAN the same-day timestamp
('2024-01-05T08:00:00') because the date is a strict prefix, so same-day
estimates are classified invalid. Spark StringType comparison is also
lexicographic, so the Column operators reproduce this bit-for-bit.

Note the deliberate asymmetry in the reference: the *valid* rule is
``estimated_delivery >= timestamp`` (NULL ⇒ excluded), while the
*invalid* flag adds an explicit ``IS NULL`` check — both reproduced.

Scale notes: both are narrow filters over staging — no shuffle; the
conjunction/disjunction push into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

INVALID_REASONS = [
    "INVALID_WEIGHT",
    "MISSING_COORDINATES",
    "INVALID_ESTIMATED_DELIVERY",
    "MISSING_STATUS",
    "MISSING_LOCATION",
]


def valid_events(stg: DataFrame) -> DataFrame:
    """P3: rows passing all 5 validity rules."""
    c = F.col
    return stg.filter(
        (c("weight_kg") > 0)
        & c("latitude").isNotNull()
        & c("longitude").isNotNull()
        & (c("estimated_delivery") >= c("timestamp"))  # string comparison!
        & c("status").isNotNull()
        & (c("status") != "")
        & c("origin").isNotNull()
        & (c("origin") != "")
        & c("destination").isNotNull()
        & (c("destination") != "")
    )


def _flags() -> dict[str, Column]:
    """P4: TRUE = rule violated (int_invalid_logistics_events.SQL:6-20)."""
    c = F.col
    return {
        "is_invalid_weight": c("weight_kg").isNull() | (c("weight_kg") <= 0),
        "is_missing_coordinates": c("latitude").isNull() | c("longitude").isNull(),
        "is_invalid_delivery": c("estimated_delivery").isNull()
        | (c("estimated_delivery") < c("timestamp")),
        "is_missing_status": c("status").isNull() | (c("status") == ""),
        "is_missing_location": c("origin").isNull()
        | (c("origin") == "")
        | c("destination").isNull()
        | (c("destination") == ""),
    }


def invalid_events(stg: DataFrame) -> DataFrame:
    """P4–P6: flag, keep rows violating ≥1 rule, label with priority CASE.

    Output column set matches the reference's ``labelled`` CTE: the
    ``timestamp`` column and the boolean flags are dropped.
    """
    flags = _flags()
    flagged = stg
    for name, expr in flags.items():
        flagged = flagged.withColumn(name, expr)
    invalid = flagged.filter(
        flags_col("is_invalid_weight")
        | flags_col("is_missing_coordinates")
        | flags_col("is_invalid_delivery")
        | flags_col("is_missing_status")
        | flags_col("is_missing_location")
    )
    reason = (
        F.when(F.col("is_invalid_weight"), "INVALID_WEIGHT")
        .when(F.col("is_missing_coordinates"), "MISSING_COORDINATES")
        .when(F.col("is_invalid_delivery"), "INVALID_ESTIMATED_DELIVERY")
        .when(F.col("is_missing_status"), "MISSING_STATUS")
        .when(F.col("is_missing_location"), "MISSING_LOCATION")
    )
    return invalid.select(
        "event_id",
        "order_id",
        "estimated_delivery",
        "status",
        "origin",
        "destination",
        "carrier_name",
        "latitude",
        "longitude",
        "weight_kg",
        "ingestion_timestamp",
        reason.alias("invalid_reason"),
    )


def flags_col(name: str) -> Column:
    return F.col(name)
