"""Driver-testdata adapter.

The driver's tables (``/root/testdata/sf*/*.parquet``) are TPC-H-ish,
not logistics events, so the reference pipeline's input is *derived*
deterministically from the ``events`` table: every expression below is
pure integer/string arithmetic on (event_id, user_id, ts, value) and is
implemented twice -- once in the DataFrame API (``bronze_events``) and
once as DuckDB SQL (``BRONZE_SQL``) -- producing bit-identical rows, so
the driver's oracle compare genuinely exercises the reference semantics
(string timestamps, dirty-row validity classes; FIXTURES.md §1).

Dirty-row classes (m = event_id % 97, ~1% of rows each; FIXTURES.md §1
"required dirty-row variants"):
    m=0  -> negative weight          (INVALID_WEIGHT)
    m=1  -> NULL lat/lon             (MISSING_COORDINATES)
    m=2  -> status ''                (MISSING_STATUS)
    m=3  -> origin ''                (MISSING_LOCATION)
    m=4  -> same-day estimated_delivery  (INVALID_ESTIMATED_DELIVERY via
            lexicographic string compare -- SURVEY.md §1.2 edge)
    m=5  -> NULL estimated_delivery
    m=6  -> event_id ''              (dropped at staging)
    m=7  -> negative weight AND NULL coords (priority CASE test)
    m=8  -> NULL order_id            (dropped at staging)
    m=9  -> NULL status
    m=10 -> NULL weight

``ingestion_timestamp`` is a *fixed injected clock* spread over 72 hourly
buckets (the reference stamps wall-clock at load; wall-clock is
parameterized out for deterministic oracles -- SURVEY.md §7 risks #3).
"""

from __future__ import annotations

import os
from functools import lru_cache as _lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import tune

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Fixed injected clock (see module docstring).
INGEST_BASE = "2026-01-01 00:00:00"
# "today" for the wall-clock-dependent DQ check 7
# (reference data_quality_check.py:180); mid-range of the events table.
DQ_AS_OF_DATE = "2024-01-15"


@_lru_cache(maxsize=None)
def _nano_ts_columns(path: str) -> tuple[str, ...]:
    """Columns stored as parquet TIMESTAMP(NANOS) (Spark can't read those
    natively; with spark.sql.legacy.parquet.nanosAsLong they surface as
    long nanos and are converted back to timestamps in load_table)."""
    import pyarrow.parquet as pq

    schema = pq.read_schema(path)
    out = []
    for field in schema:
        t = field.type
        if str(t).startswith("timestamp[ns"):
            out.append(field.name)
    return tuple(out)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    for c in _nano_ts_columns(path):
        if c in df.columns and dict(df.dtypes).get(c) == "bigint":
            # floor-divide nanos -> micros (DuckDB truncates the same way)
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def bronze_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived logistics bronze table (= reference ``raw_logistics``).

    Must stay in lock-step with ``BRONZE_SQL`` below.
    """
    ev = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    uid = F.col("user_id")
    m = eid % 97

    status_clean = (
        F.when(eid % 6 == 0, "Order Created")
        .when(eid % 6 == 1, "Picked Up")
        .when(eid % 6 == 2, "In Transit")
        .when(eid % 6 == 3, "Out for Delivery")
        .when(eid % 6 == 4, "Delivered")
        .otherwise("Delayed")
    )
    carrier = (
        F.when(uid % 4 == 0, "BlueDart")
        .when(uid % 4 == 1, "FedEx")
        .when(uid % 4 == 2, "DHL")
        .otherwise("SwiftLogistics")
    )

    def city(expr):
        return F.concat(
            F.lit("City-"),
            F.lpad((expr % 25).cast("string"), 2, "0"),
            F.lit(", C"),
            (expr % 5).cast("string"),
        )

    return ev.select(
        F.when(m == 6, "").otherwise(eid.cast("string")).alias("event_id"),
        F.when(m == 8, F.lit(None).cast("string"))
        .otherwise(
            F.concat(F.lit("ORD-"), F.lpad((uid % 500).cast("string"), 4, "0"))
        )
        .alias("order_id"),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("timestamp"),
        F.when(m == 2, "")
        .when(m == 9, F.lit(None).cast("string"))
        .otherwise(status_clean)
        .alias("status"),
        F.when(m == 3, "").otherwise(city(eid + uid)).alias("origin"),
        city(eid * 2 + uid).alias("destination"),
        carrier.alias("carrier_name"),
        F.when(m.isin(1, 7), F.lit(None).cast("double"))
        .otherwise(((eid * 7 + uid) % 181 - 90).cast("double") + 0.5)
        .alias("latitude"),
        F.when(m.isin(1, 7), F.lit(None).cast("double"))
        .otherwise(((eid * 11 + uid) % 361 - 180).cast("double") + 0.25)
        .alias("longitude"),
        F.when(m.isin(0, 7), F.lit(0.0) - F.col("value"))
        .when(m == 10, F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("weight_kg"),
        F.when(m == 5, F.lit(None).cast("string"))
        .when(m == 4, F.date_format("ts", "yyyy-MM-dd"))
        .otherwise(
            F.date_format(
                F.date_add(F.to_date("ts"), (1 + eid % 9).cast("int")),
                "yyyy-MM-dd",
            )
        )
        .alias("estimated_delivery"),
        F.expr(
            f"timestamp'{INGEST_BASE}'"
            " + make_interval(0, 0, 0, 0, cast(event_id % 72 AS int), 0, 0)"
        ).alias("ingestion_timestamp"),
    )


# DuckDB-SQL twin of bronze_events(); the oracle queries CTE on this.
# The driver pre-registers the parquet tables as views named region,
# nation, ..., events, documents, embeddings.
BRONZE_SQL = f"""
SELECT
  CASE WHEN event_id % 97 = 6 THEN '' ELSE CAST(event_id AS VARCHAR) END AS event_id,
  CASE WHEN event_id % 97 = 8 THEN NULL
       ELSE concat('ORD-', lpad(CAST(user_id % 500 AS VARCHAR), 4, '0')) END AS order_id,
  strftime(ts, '%Y-%m-%dT%H:%M:%S') AS "timestamp",
  CASE WHEN event_id % 97 = 2 THEN ''
       WHEN event_id % 97 = 9 THEN NULL
       WHEN event_id % 6 = 0 THEN 'Order Created'
       WHEN event_id % 6 = 1 THEN 'Picked Up'
       WHEN event_id % 6 = 2 THEN 'In Transit'
       WHEN event_id % 6 = 3 THEN 'Out for Delivery'
       WHEN event_id % 6 = 4 THEN 'Delivered'
       ELSE 'Delayed' END AS status,
  CASE WHEN event_id % 97 = 3 THEN ''
       ELSE concat('City-', lpad(CAST((event_id + user_id) % 25 AS VARCHAR), 2, '0'),
                   ', C', CAST((event_id + user_id) % 5 AS VARCHAR)) END AS origin,
  concat('City-', lpad(CAST((event_id * 2 + user_id) % 25 AS VARCHAR), 2, '0'),
         ', C', CAST((event_id * 2 + user_id) % 5 AS VARCHAR)) AS destination,
  CASE WHEN user_id % 4 = 0 THEN 'BlueDart'
       WHEN user_id % 4 = 1 THEN 'FedEx'
       WHEN user_id % 4 = 2 THEN 'DHL'
       ELSE 'SwiftLogistics' END AS carrier_name,
  CASE WHEN event_id % 97 IN (1, 7) THEN NULL
       ELSE CAST((event_id * 7 + user_id) % 181 - 90 AS DOUBLE) + 0.5 END AS latitude,
  CASE WHEN event_id % 97 IN (1, 7) THEN NULL
       ELSE CAST((event_id * 11 + user_id) % 361 - 180 AS DOUBLE) + 0.25 END AS longitude,
  CASE WHEN event_id % 97 IN (0, 7) THEN 0.0 - value
       WHEN event_id % 97 = 10 THEN NULL
       ELSE value END AS weight_kg,
  CASE WHEN event_id % 97 = 5 THEN NULL
       WHEN event_id % 97 = 4 THEN strftime(ts, '%Y-%m-%d')
       ELSE strftime(CAST(ts AS DATE) + INTERVAL 1 DAY * CAST(1 + event_id % 9 AS INT), '%Y-%m-%d')
       END AS estimated_delivery,
  TIMESTAMP '{INGEST_BASE}' + INTERVAL 1 HOUR * CAST(event_id % 72 AS INT) AS ingestion_timestamp
FROM events
""".strip()
