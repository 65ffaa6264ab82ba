"""Runtime data-quality gate: 7 checks over bronze with severity.

Reference: ``src/warehouse/data_quality_check.py:76-189`` (SURVEY.md
A13, §5). Checks 1–5 are errors (fail the pipeline), 6–7 warnings.
``CURRENT_DATE`` in check 7 is wall-clock — parameterized as
``as_of_date`` for determinism (SURVEY.md §7 risk #3).

Scale notes: the six predicate checks compute in ONE pass over bronze
(conditional aggregation → map-side partial agg, no shuffle); only the
duplicate check needs a groupBy shuffle on event_id. The reference runs
7 separate full scans — this is the Spark-first consolidation.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.core import try_to_date, try_to_timestamp
from ..schemas import VALID_STATUSES


def _predicates(as_of_date: str) -> list[tuple[int, str, str, Column]]:
    """(check_id, name, severity, failing-row predicate); check 6 (dups)
    is handled separately because it needs a group-by."""
    c = F.col
    return [
        (1, "null_order_ids", "error", c("order_id").isNull() | (c("order_id") == "")),
        (
            2,
            "invalid_weights",
            "error",
            c("weight_kg").isNull() | (c("weight_kg") <= 0) | (c("weight_kg") > 5000),
        ),
        (
            3,
            "malformed_timestamps",
            "error",
            c("timestamp").isNull() | try_to_timestamp("timestamp").isNull(),
        ),
        # NOT IN is null-rejecting: NULL status is NOT counted (preserved)
        (4, "invalid_status_values", "error", ~c("status").isin(VALID_STATUSES)),
        (
            5,
            "invalid_coordinates",
            "error",
            c("latitude").isNull()
            | c("longitude").isNull()
            | (c("latitude") < -90)
            | (c("latitude") > 90)
            | (c("longitude") < -180)
            | (c("longitude") > 180),
        ),
        (
            7,
            "past_or_invalid_delivery_dates",
            "warning",
            try_to_date("estimated_delivery").isNull()
            | (try_to_date("estimated_delivery") < F.lit(as_of_date).cast("date")),
        ),
    ]


def dq_check_counts(bronze: DataFrame, as_of_date: str) -> DataFrame:
    """All 7 checks as one DataFrame (check_id, check_name, severity,
    failing_rows) — single scan + one group-by, fully distributed."""
    preds = _predicates(as_of_date)
    wide = bronze.agg(
        *[
            F.sum(F.when(p, 1).otherwise(0)).cast("bigint").alias(f"c{cid}")
            for cid, _, _, p in preds
        ]
    )
    dup = (
        bronze.filter(F.col("event_id").isNotNull())
        .groupBy("event_id")
        .agg(F.count("*").alias("dup_count"))
        .filter(F.col("dup_count") > 1)
        .agg(F.count("*").cast("bigint").alias("c6"))
    )
    stack_args = ", ".join(
        f"{cid}, '{name}', '{sev}', c{cid}" for cid, name, sev, _ in preds
    )
    return wide.crossJoin(dup).selectExpr(
        f"stack(7, {stack_args}, 6, 'duplicate_event_ids', 'warning', c6)"
        " AS (check_id, check_name, severity, failing_rows)"
    )


@dataclass
class QualityReport:
    errors: int
    warnings: int
    counts: dict[str, int]

    @property
    def passed(self) -> bool:
        """Reference exit semantics: errors halt the DAG, warnings pass
        (data_quality_check.py:197-208)."""
        return self.errors == 0


def run_quality_gate(bronze: DataFrame, as_of_date: str) -> QualityReport:
    """Severity model counts *failed checks*, not failing rows
    (data_quality_check.py:73-74)."""
    rows = dq_check_counts(bronze, as_of_date).collect()
    errors = sum(1 for r in rows if r.severity == "error" and r.failing_rows > 0)
    warnings = sum(1 for r in rows if r.severity == "warning" and r.failing_rows > 0)
    return QualityReport(
        errors=errors,
        warnings=warnings,
        counts={r.check_name: r.failing_rows for r in rows},
    )
