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


def _morton_interleave(a, b, bits: int = 16):
    """Interleave the low ``bits`` of two non-negative int columns into
    a Morton (Z-order) code — pure Column bit arithmetic, stays in
    codegen. 2·bits ≤ 62 keeps the code in a signed BIGINT."""
    from pyspark.sql import functions as F

    code = F.lit(0).cast("bigint")
    for i in range(bits):
        bit_a = F.shiftright(a.cast("bigint"), i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(b.cast("bigint"), i).bitwiseAND(F.lit(1))
        code = (
            code
            + (bit_a * F.lit(1 << (2 * i)).cast("bigint"))
            + (bit_b * F.lit(1 << (2 * i + 1)).cast("bigint"))
        )
    return code


def write_zordered(
    df: DataFrame,
    out_dir: str,
    col_a: str,
    col_b: str,
    files: int = 8,
    bits: int = 16,
) -> None:
    """Z-order-lite: range-repartition + sort by the Morton interleave
    of two filter columns before writing, so parquet row-group min/max
    stats become narrow on BOTH columns simultaneously — the multi-
    dimensional data-skipping layout (Delta OPTIMIZE ZORDER BY, in
    miniature). A plain sort by one column gives perfect skipping on
    it and none on the other; the Morton curve splits the difference,
    shrinking every row group's bounding box so predicate-on-either-
    column scans skip most groups at the reader level.

    Scale: one range exchange on the code (the same shape any global
    sort-write uses) and a within-partition sort; the interleave is
    map-side bit arithmetic."""
    from pyspark.sql import functions as F

    code = _morton_interleave(F.col(col_a), F.col(col_b), bits)
    (
        df.withColumn("_z", code)
        .repartitionByRange(files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
