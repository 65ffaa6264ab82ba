"""Bronze layer sources/sinks: parquet scans, load stamping, and the
incremental dedup insert.

Reference (SURVEY.md §2.1): S6 parquet glob scan, S7 file listing, S8
CTAS with ingestion stamp, S9 NOT-IN incremental insert, S10 catalog
probe (``src/warehouse/_init_duckdb.py:35-70``).

Scale notes:
* S9's ``NOT IN (subquery)`` is re-expressed as a LEFT ANTI join — same
  result here (event_ids are non-null), but the anti-join hashes on the
  key instead of planning a null-aware mark join. At warehouse scale the
  right design is a Delta/Iceberg ``MERGE ... WHEN NOT MATCHED INSERT``;
  the anti-join is the storage-agnostic equivalent.
* The reference re-reads the whole bucket every run (O(all files) per
  hour). ``incremental_insert`` only needs the *incoming* batch and the
  existing key column — with bronze partitioned by ingest date the
  existing-side scan prunes to recent partitions.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import BRONZE_EVENT_SCHEMA, WIRE_EVENT_SCHEMA


def read_bronze(spark: SparkSession, glob: str, with_ingestion: bool = True) -> DataFrame:
    """S6: schema-pinned parquet scan over the bronze file glob."""
    schema = BRONZE_EVENT_SCHEMA if with_ingestion else WIRE_EVENT_SCHEMA
    return spark.read.schema(schema).parquet(glob)


def list_bronze_files(spark: SparkSession, glob: str) -> list[str]:
    """S7: file listing (count gates the pipeline in the reference)."""
    df = spark.read.format("binaryFile").load(glob).select("path")
    return [r.path for r in df.collect()]


def stamp_ingestion(df: DataFrame, clock: datetime) -> DataFrame:
    """S8: add ``ingestion_timestamp``. Wall-clock is injected (never
    current_timestamp() inside operators — SURVEY.md §7 risk #3)."""
    return df.withColumn("ingestion_timestamp", F.lit(clock).cast("timestamp"))


def table_exists(spark: SparkSession, name: str) -> bool:
    """S10: catalog existence probe (information_schema equivalent)."""
    return spark.catalog.tableExists(name)


def incremental_insert(incoming: DataFrame, existing: DataFrame, key: str = "event_id") -> DataFrame:
    """S9/J10: rows of ``incoming`` whose key is absent from ``existing``
    (idempotent re-ingest). LEFT ANTI ≡ the reference's NOT-IN because
    event_ids are non-null uuids (SURVEY.md J10)."""
    return incoming.join(existing.select(key), on=key, how="left_anti")


def first_or_incremental_load(
    spark: SparkSession, bronze_glob: str, table: str, clock: datetime
) -> None:
    """S8+S9 composed: CTAS on first run, anti-join append after
    (reference _init_duckdb.py:42-70)."""
    src = stamp_ingestion(read_bronze(spark, bronze_glob, with_ingestion=False), clock)
    if not table_exists(spark, table):
        src.write.saveAsTable(table)
        return
    existing = spark.table(table)
    incremental_insert(src, existing).write.insertInto(table)


def merge_upsert(target: DataFrame, updates: DataFrame, key: str = "event_id") -> DataFrame:
    """CDC-style MERGE emulation (no Delta in v1): updated rows replace
    matching target rows, new rows append — i.e.
    ``MERGE WHEN MATCHED UPDATE SET * WHEN NOT MATCHED INSERT *``.

    Anti-join keeps unmatched target rows; union brings every update
    row in. One shuffle on the key. With Delta/Iceberg this becomes a
    native MERGE INTO with file-level pruning; semantics are identical.
    """
    kept = target.join(updates.select(key), on=key, how="left_anti")
    return kept.unionByName(updates)
