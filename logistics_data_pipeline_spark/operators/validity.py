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


def valid_predicate() -> Column:
    """P3's 5-rule conjunction as a reusable expression (NULL-valued for
    rows with NULL inputs — filter() drops those, matching SQL WHERE)."""
    c = F.col
    return (
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


def valid_events(stg: DataFrame) -> DataFrame:
    """P3: rows passing all 5 validity rules."""
    return stg.filter(valid_predicate())


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


def invalid_reason_expr() -> Column:
    """P5-P6 as one expression: the priority-CASE label, non-NULL
    exactly when some validity flag fires (i.e. for the invalid set) —
    lets single-scan consumers derive invalid membership + label
    without building the invalid DataFrame."""
    flags = _flags()
    reason = None
    for (name, expr), label in zip(flags.items(), INVALID_REASONS):
        reason = (
            F.when(expr, label) if reason is None else reason.when(expr, label)
        )
    return reason


def invalid_events(stg: DataFrame) -> DataFrame:
    """P4–P6: flag, keep rows violating ≥1 rule, label with priority CASE.

    Output column set matches the reference's ``labelled`` CTE: the
    ``timestamp`` column and the boolean flags are dropped.
    """
    # the priority CASE is non-NULL exactly when some flag fires, so the
    # "violates ≥1 rule" filter and the label are one expression
    reason = invalid_reason_expr()
    invalid = stg.filter(reason.isNotNull())
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
