"""Gold-layer physical layout: date-partitioned writes, small-file
compaction, and the layout diagnostics that decide when to compact.

Why this exists (SURVEY.md §2.1 S5): the reference's consumer writes one
parquet file per 50-row buffer (``src/stream/consumer_to_minio.py:33``),
so an hour of streaming leaves thousands of KB-sized files per day —
the classic small-file problem. At 100 TB that layout is fatal twice
over: the NameNode/listing cost of millions of files, and a scan that
pays per-file open overhead instead of streaming column chunks. The
production answer is (a) hive-style partitioning on the pruning column
so queries touch only the partitions they filter on, and (b) a periodic
compaction pass that rewrites each partition into ~target-sized files.

Scale design:
* ``write_partitioned`` repartitions by the partition columns before
  the write so each partition's rows land in few tasks (no
  files = tasks × partitions explosion), and caps rows per file with
  ``maxRecordsPerFile`` so a hot partition still splits into parallel,
  memory-bounded files.
* ``compact_partitions`` rewrites atomically: new files into a temp
  directory, then a directory swap — readers never observe a partial
  partition (same crash-safety recipe as streaming/ingest.py's
  ``upsert_sink``).
* ``partition_file_stats`` is driver-side listing only (no data read);
  its output is partition-count sized, never row sized.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_ROWS_PER_FILE = 1_000_000


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("event_date",),
    rows_per_file: int = DEFAULT_ROWS_PER_FILE,
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned parquet write: one shuffle on the partition
    columns concentrates each partition into few writer tasks, and
    ``maxRecordsPerFile`` re-splits oversized partitions into bounded
    files — so file count tracks data size, not task count."""
    (
        df.repartition(*[F.col(c) for c in partition_cols])
        .write.mode(mode)
        .option("maxRecordsPerFile", rows_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def partition_file_stats(spark: SparkSession, path: str) -> DataFrame:
    """Layout diagnostic: per-partition file count and byte sizes, from
    a driver-side directory walk (metadata only). ``needs_compaction``
    flags partitions whose mean file size is under a quarter of the
    128 MB parquet sweet spot — the compaction worklist."""
    rows = []
    for dirpath, _dirnames, filenames in os.walk(path):
        parts = [
            p for p in os.path.relpath(dirpath, path).split(os.sep) if "=" in p
        ]
        if not parts:
            continue
        key = "/".join(parts)
        for fn in filenames:
            if fn.endswith(".parquet"):
                rows.append((key, os.path.getsize(os.path.join(dirpath, fn))))
    if not rows:
        return spark.createDataFrame(
            [], "partition string, n_files long, total_bytes long, "
                "avg_bytes double, needs_compaction boolean"
        )
    df = spark.createDataFrame(rows, "partition string, bytes long")
    return (
        df.groupBy("partition")
        .agg(
            F.count("*").cast("bigint").alias("n_files"),
            F.sum("bytes").cast("bigint").alias("total_bytes"),
            F.round(F.avg("bytes"), 1).alias("avg_bytes"),
        )
        .withColumn(
            "needs_compaction",
            (F.col("n_files") > 1) & (F.col("avg_bytes") < 32 * 1024 * 1024),
        )
        .orderBy("partition")
    )


def compact_partitions(
    spark: SparkSession,
    path: str,
    target_bytes_per_file: int = 128 * 1024 * 1024,
    only_flagged: bool = True,
) -> list[str]:
    """Rewrite small-file partitions into ~``target_bytes_per_file``
    files, atomically per partition (write to a temp sibling, swap the
    directory). Returns the partition keys compacted.

    The file count per partition is derived from the partition's
    current on-disk bytes (compressed size is the honest predictor of
    rewritten size — row-count heuristics miss wide/narrow schemas).
    Each partition is an independent job: at warehouse scale the
    worklist shards across maintenance windows, and a crash mid-pass
    loses only the partition being swapped (temp dir is rebuilt)."""
    stats = partition_file_stats(spark, path).collect()
    done: list[str] = []
    for r in stats:
        if only_flagged and not r.needs_compaction:
            continue
        src = os.path.join(path, r.partition)
        n_files = max(1, int(r.total_bytes // target_bytes_per_file) + 1)
        tmp = src + f"__compact_{uuid.uuid4().hex[:8]}"
        (
            spark.read.parquet(src)
            .coalesce(n_files)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        old = src + "__old"
        os.rename(src, old)
        try:
            os.rename(tmp, src)
        except OSError:  # roll back: readers keep the uncompacted files
            os.rename(old, src)
            raise
        shutil.rmtree(old)
        done.append(r.partition)
    return done
