"""Scalar expression helpers shared across operators.

These reproduce semantics the reference gets from DuckDB/dbt built-ins:

* ``surrogate_key`` -- byte-identical expansion of
  ``dbt_utils.generate_surrogate_key`` (dbt_utils 1.3.0): MD5 over the
  string-cast column with a sentinel for NULL, multi-columns joined by
  ``'-'``. Reference usage: dim_time.sql:26, dim_location.sql:47,
  dim_status.sql:15, dim_carrier.sql:14, dim_order.sql:24,
  fact_event.sql:98.
* ``dow_sunday0`` -- DuckDB ``EXTRACT(DOW ...)`` is 0..6 with Sunday=0;
  Spark ``dayofweek`` is 1..7 with Sunday=1 (SURVEY.md §2.8).
* ``nullif_zero`` -- ``NULLIF(x, 0)`` used in ratio-of-aggregate
  denominators (dq_invalid_delivery_summary.sql:42).
* ``try_to_timestamp``/``try_to_date`` -- DuckDB ``TRY_CAST`` null-on-fail
  semantics used by the DQ gate (data_quality_check.py:110, :179-180).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DBT_NULL_SENTINEL = "_dbt_utils_surrogate_key_null_"


def surrogate_key(*cols: Column | str) -> Column:
    """MD5 surrogate key, byte-identical to dbt_utils.generate_surrogate_key."""
    parts: list[Column] = []
    for i, c in enumerate(cols):
        col = F.col(c) if isinstance(c, str) else c
        if i > 0:
            parts.append(F.lit("-"))
        parts.append(F.coalesce(col.cast("string"), F.lit(_DBT_NULL_SENTINEL)))
    return F.md5(F.concat(*parts) if len(parts) > 1 else parts[0])


def surrogate_key_sql(*cols: str) -> str:
    """The same surrogate key as ANSI/DuckDB SQL text (for oracle parity)."""
    pieces = [
        f"coalesce(CAST({c} AS VARCHAR), '{_DBT_NULL_SENTINEL}')" for c in cols
    ]
    inner = " || '-' || ".join(pieces)
    return f"md5({inner})"


def dow_sunday0(ts: Column) -> Column:
    """Day-of-week with Sunday=0 (DuckDB EXTRACT(DOW) convention)."""
    return (F.dayofweek(ts) - F.lit(1)).cast("int")


def nullif_zero(c: Column) -> Column:
    return F.when(c == 0, F.lit(None)).otherwise(c)


def try_to_timestamp(c: Column | str) -> Column:
    """TRY_CAST(x AS TIMESTAMP): NULL on parse failure."""
    col = F.col(c) if isinstance(c, str) else c
    return col.try_cast("timestamp")


def try_to_date(c: Column | str) -> Column:
    """TRY_CAST(x AS DATE): NULL on parse failure."""
    col = F.col(c) if isinstance(c, str) else c
    return col.try_cast("date")
