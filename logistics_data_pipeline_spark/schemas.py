"""Explicit schemas.

The reference declares its only schema at the producer (Pydantic model,
reference ``src/api/generator.py:33-44``); everything downstream infers.
Here the bronze event schema is explicit so parquet/Kafka reads never
depend on inference (SURVEY.md §1.3).

Semantics preserved from the reference (SURVEY.md §1.2): ``timestamp``
and ``estimated_delivery`` are STRINGS end-to-end; every downstream
comparison is lexicographic, which for ISO-8601 text differs from
temporal comparison on same-day values. Do not "fix" to TimestampType.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Bronze logistics event, mirroring raw_logistics
# (reference src/warehouse/_init_duckdb.py:50-56).
BRONZE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType()),
        T.StructField("order_id", T.StringType()),
        T.StructField("timestamp", T.StringType()),  # ISO-8601 string, kept as string
        T.StructField("status", T.StringType()),
        T.StructField("origin", T.StringType()),
        T.StructField("destination", T.StringType()),
        T.StructField("carrier_name", T.StringType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("weight_kg", T.DoubleType()),
        T.StructField("estimated_delivery", T.StringType()),  # ISO date string
        T.StructField("ingestion_timestamp", T.TimestampType()),
    ]
)

# Wire schema (pre-ingestion): same minus ingestion_timestamp, for the
# Kafka JSON payload (reference src/api/generator.py:33-44).
WIRE_EVENT_SCHEMA = T.StructType(BRONZE_EVENT_SCHEMA.fields[:-1])

VALID_STATUSES = [
    "Order Created",
    "Picked Up",
    "In Transit",
    "Out for Delivery",
    "Delivered",
    "Delayed",
]  # reference src/api/generator.py:47

CARRIERS = ["BlueDart", "FedEx", "DHL", "SwiftLogistics"]  # generator.py:55
