"""Synthetic logistics-event source + Kafka producer leg.

Reference (SURVEY.md §2.1): S2 is a Faker/random row source
(``src/api/generator.py:46-60``), S1 the Kafka JSON producer
(``generator.py:104-117``).

The Spark-first generator is a *deterministic* row source:
``spark.range(n)`` + multiplicative hashing instead of RNG, so the same
(n, salt) always yields identical rows on any partitioning/cluster —
required for oracle checks and exactly-once re-runs, and exactly as
parallel as a random source (no driver-side loop; each executor
generates its own id range).

Value domains mirror the reference generator: 6 statuses, 4 carriers,
"City, CC" pairs, weight 1–500 (2 dp), delivery date 0..+10 days.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import CARRIERS, VALID_STATUSES

GEN_BASE_TS = "2026-01-01 00:00:00"
_M31 = 2147483647
_KNUTH = 2654435761

CITIES = [
    "Mumbai, IN",
    "Delhi, IN",
    "Singapore, SG",
    "Rotterdam, NL",
    "Hamburg, DE",
    "Shanghai, CN",
    "Los Angeles, US",
    "Newark, US",
    "Dubai, AE",
    "Santos, BR",
]


def _h(salt: int):
    """Deterministic 31-bit hash of the row id (Knuth multiplicative)."""
    return (F.col("id") * _KNUTH + F.lit(salt)) % _M31


def _pick(values: list[str], salt: int):
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (_h(salt) % len(values) + 1).cast("int"))


def synthetic_events(
    spark: SparkSession, n: int, window_s: int = 30 * 86400, start: int = 0
) -> DataFrame:
    """S2: n deterministic wire-schema events (no ingestion_timestamp).
    ``start`` offsets the id range so successive serving calls
    (sources/api.py) yield fresh-but-reproducible rows; the registered
    oracle query uses the default start=0."""
    ts = F.to_timestamp(F.lit(GEN_BASE_TS)) + F.make_interval(
        secs=(_h(1) % window_s).cast("int")
    )
    return spark.range(start, start + n).select(
        F.md5(F.concat(F.lit("evt-"), F.col("id").cast("string"))).alias("event_id"),
        F.concat(
            F.lit("ORD-"),
            F.char(_h(2) % 26 + 65),
            F.char(_h(3) % 26 + 65),
            F.lit("-"),
            F.lpad((_h(4) % 10000).cast("string"), 4, "0"),
        ).alias("order_id"),
        F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss").alias("timestamp"),
        _pick(VALID_STATUSES, 5).alias("status"),
        _pick(CITIES, 6).alias("origin"),
        _pick(CITIES, 7).alias("destination"),
        _pick(CARRIERS, 8).alias("carrier_name"),
        ((_h(9) % 180001).cast("double") / 1000.0 - 90.0).alias("latitude"),
        ((_h(10) % 360001).cast("double") / 1000.0 - 180.0).alias("longitude"),
        ((_h(11) % 49901).cast("double") / 100.0 + 1.0).alias("weight_kg"),
        F.date_format(
            F.date_add(ts.cast("date"), (_h(12) % 11).cast("int")), "yyyy-MM-dd"
        ).alias("estimated_delivery"),
    )


def _sql_h(salt: int) -> str:
    return f"((i * {_KNUTH} + {salt}) % {_M31})"


def _sql_pick(values: list[str], salt: int) -> str:
    arr = "[" + ", ".join(f"'{v}'" for v in values) + "]"
    return f"{arr}[CAST({_sql_h(salt)} % {len(values)} AS INT) + 1]"


SYNTHETIC_EVENTS_SQL = f"""
SELECT
  md5(concat('evt-', CAST(i AS VARCHAR))) AS event_id,
  concat('ORD-', chr(CAST({_sql_h(2)} % 26 AS INT) + 65),
         chr(CAST({_sql_h(3)} % 26 AS INT) + 65), '-',
         lpad(CAST({_sql_h(4)} % 10000 AS VARCHAR), 4, '0')) AS order_id,
  strftime(TIMESTAMP '{GEN_BASE_TS}' + INTERVAL 1 SECOND * CAST({_sql_h(1)} % 2592000 AS INT),
           '%Y-%m-%dT%H:%M:%S') AS "timestamp",
  {_sql_pick(VALID_STATUSES, 5)} AS status,
  {_sql_pick(CITIES, 6)} AS origin,
  {_sql_pick(CITIES, 7)} AS destination,
  {_sql_pick(CARRIERS, 8)} AS carrier_name,
  CAST({_sql_h(9)} % 180001 AS DOUBLE) / 1000.0 - 90.0 AS latitude,
  CAST({_sql_h(10)} % 360001 AS DOUBLE) / 1000.0 - 180.0 AS longitude,
  CAST({_sql_h(11)} % 49901 AS DOUBLE) / 100.0 + 1.0 AS weight_kg,
  strftime(CAST(TIMESTAMP '{GEN_BASE_TS}' + INTERVAL 1 SECOND * CAST({_sql_h(1)} % 2592000 AS INT) AS DATE)
           + INTERVAL 1 DAY * CAST({_sql_h(12)} % 11 AS INT), '%Y-%m-%d') AS estimated_delivery
FROM generate_series(0, 9999) t(i)
""".strip()


def to_wire(events: DataFrame) -> DataFrame:
    """S1: the Kafka wire projection — order_id key, JSON-serialized
    payload (reference generator.py:104-112 keys by order_id)."""
    return events.select(
        F.col("order_id").alias("key"),
        F.to_json(F.struct(*events.columns)).alias("value"),
    )


def kafka_sink_options(bootstrap: str, topic: str = "logistics-events") -> dict[str, str]:
    """The exact option map the Kafka producer writes with (reference
    generator.py:104-112: bootstrap + one target topic; the order_id
    partitioning key rides in the ``key`` column from ``to_wire``, not
    in config). Testable without a broker (VERDICT r2 #9)."""
    return {"kafka.bootstrap.servers": bootstrap, "topic": topic}


def produce_to_kafka(events: DataFrame, bootstrap: str, topic: str = "logistics-events") -> None:
    """S1: batch-produce to Kafka (needs spark-sql-kafka on the
    classpath + a broker; config-gated, exercised only in integration
    environments)."""
    to_wire(events).write.format("kafka").options(
        **kafka_sink_options(bootstrap, topic)
    ).save()
