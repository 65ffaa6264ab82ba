"""Staging layer: cast/trim projection + ID cleaning.

Reference: ``models/layer/staging/stg_logistics_events.sql`` (SURVEY.md
P1, P2). Eight columns TRIM(CAST(x AS STRING)), three CAST(x AS FLOAT),
then rows with NULL/empty event_id or order_id are dropped.

The reference re-stamps ``ingestion_timestamp = current_localtimestamp()``
at model-run time; wall-clock is parameterized here (pass ``restamp`` to
reproduce that behavior deterministically; default keeps the load-time
stamp), per SURVEY.md §7 risk #3.

Scale notes: pure narrow projection + filter — no shuffle; Catalyst
pushes both the column pruning and the ID-null filters into the parquet
scan.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STRING_COLS = [
    "event_id",
    "order_id",
    "timestamp",
    "estimated_delivery",
    "status",
    "origin",
    "destination",
    "carrier_name",
]
FLOAT_COLS = ["latitude", "longitude", "weight_kg"]


def stage_events(bronze: DataFrame, restamp: datetime | None = None) -> DataFrame:
    """P1 cast+trim projection, P2 null/empty-ID filter."""
    cols = [F.trim(F.col(c).cast("string")).alias(c) for c in STRING_COLS]
    cols += [F.col(c).cast("float").alias(c) for c in FLOAT_COLS]
    stamp = (
        F.lit(restamp).cast("timestamp") if restamp is not None
        else F.col("ingestion_timestamp")
    )
    cols.append(stamp.alias("ingestion_timestamp"))
    casted = bronze.select(*cols)
    return casted.filter(
        F.col("event_id").isNotNull()
        & F.col("order_id").isNotNull()
        & (F.col("event_id") != "")
        & (F.col("order_id") != "")
    )
