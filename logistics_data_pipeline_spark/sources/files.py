"""Batch file-source adapters beyond parquet: JSON-lines and CSV event
readers with the declared wire schema, explicit corrupt-row capture,
and the same ingestion-timestamp stamping the bronze CTAS performs
(reference: src/warehouse/_init_duckdb.py:48-57 stamps at load;
src/stream/consumer_to_minio.py:82-97 drops undecodable payloads).

Design: PERMISSIVE parsing with a ``_corrupt_record`` rescue column —
schema-conforming rows flow through typed, malformed lines are KEPT as
raw strings for quarantine instead of silently vanishing (DROPMALFORMED)
or failing the job (FAILFAST). The reader never infers: inference costs
an extra full pass at 100 TB and lets a bad file silently widen a
column type; the wire schema is the contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import WIRE_EVENT_SCHEMA
from ..session import track_persist

_RESCUE = "_corrupt_record"


def _rescue_schema() -> T.StructType:
    return T.StructType(
        [*WIRE_EVENT_SCHEMA.fields, T.StructField(_RESCUE, T.StringType())]
    )


def read_events_json(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines events with corrupt-row rescue. Returns the wire
    columns plus ``_corrupt_record`` (NULL for clean rows)."""
    df = (
        spark.read.schema(_rescue_schema())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _RESCUE)
        .json(path)
    )
    return df


def read_events_csv(spark: SparkSession, path: str, header: bool = True) -> DataFrame:
    """CSV events with corrupt-row rescue; same contract as the JSON
    reader (CSV additionally needs the raw line cached for rescue —
    Spark requires selecting the corrupt column only alongside the
    full schema, which the fixed projection here satisfies)."""
    return (
        spark.read.schema(_rescue_schema())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _RESCUE)
        .option("header", "true" if header else "false")
        .csv(path)
    )


def split_clean_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows drop the rescue column and gain
    the load-time ``ingestion_timestamp`` (the bronze CTAS contract);
    quarantine keeps the raw offending line for inspection/replay."""
    # Spark disallows querying ONLY the corrupt column straight off a
    # raw file scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the parsed
    # frame must be materialized first. Operator-scoped persist,
    # released by clear_session_caches.
    df = track_persist(df)
    clean = (
        df.filter(F.col(_RESCUE).isNull())
        .drop(_RESCUE)
        .withColumn("ingestion_timestamp", F.current_timestamp())
    )
    quarantine = df.filter(F.col(_RESCUE).isNotNull()).select(
        F.col(_RESCUE).alias("raw_record")
    )
    return clean, quarantine
