"""Bucketed tables and small-file compaction — the physical-layout
levers that matter at 100 TB.

Bucketing: writing both sides of a recurring big-big join bucketed (and
sorted) on the join key makes every subsequent join shuffle-FREE — the
sort-merge join reads co-located buckets directly. On a 1000-executor
cluster this converts the nightly orders⋈lineitem backbone from a
full-network shuffle into local merges. Tested by asserting the join
plan contains no Exchange (tests/test_layout.py).

Compaction: the reference's 50-row micro-batch files (BATCH_SIZE=50,
consumer_to_minio.py:33) create the classic small-file problem —
O(files) scan tasks and namenode pressure. ``compact_parquet`` rewrites
a directory to ~target_rows-per-file with one repartition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int = 8, sort: bool = True
) -> None:
    """Materialize as a bucketed (+sorted) managed table; both sides of
    a co-located join must use the same bucket count and key."""
    writer = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — with
    bucketing metadata present, Catalyst plans a shuffle-free
    sort-merge join."""
    return spark.table(left_table).join(spark.table(right_table), key)


def compact_parquet(
    spark: SparkSession, in_dir: str, out_dir: str, target_rows_per_file: int = 500_000
) -> int:
    """Rewrite a small-file parquet directory into ~target_rows files.
    Returns the output file count. (At cluster scale prefer
    per-partition compaction so one job doesn't rewrite the world.)"""
    df = spark.read.parquet(in_dir)
    n = df.count()
    files = max(1, -(-n // target_rows_per_file))
    df.repartition(files).write.mode("overwrite").parquet(out_dir)
    return files
