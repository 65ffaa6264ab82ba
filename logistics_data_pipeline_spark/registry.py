"""Query registry: the driver-facing inventory.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with
a DuckDB oracle SQL string over the driver's pre-registered views
(region nation customer supplier part orders lineitem events documents
embeddings). Keys without an oracle get the driver's weaker rows-only
check (non-SQL-expressible ops, e.g. LSH).

SURVEY.md §2 operator IDs are noted in each builder's docstring in the
operator modules.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .adapters.testdata import BRONZE_SQL, bronze_events

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    _QUERIES[name] = fn
    if oracle is not None:
        _ORACLES[name] = oracle


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Carrier on-time KPI (reference Business_KPI_dashboard.py:20-34),
    the end-to-end slice: bronze → staging → valid → star → KPI."""
    if "kpi_carrier_performance" in _QUERIES:
        return _QUERIES["kpi_carrier_performance"](spark, sf_dir)
    return _QUERIES["bronze_events"](spark, sf_dir)


# --- registrations ---------------------------------------------------------

register(
    "bronze_events",
    bronze_events,
    f"WITH bronze AS (\n{BRONZE_SQL}\n) SELECT * FROM bronze",
)
