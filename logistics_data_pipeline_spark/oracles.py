"""DuckDB oracle SQL — the independent re-statement of every operator.

Each Spark query registered in ``registry.py`` has a twin here, built
from one shared CTE prelude (bronze → stg → valid/invalid → dims → fact
→ dq_summary) mirroring the reference dbt DAG. DuckDB only evaluates
CTEs a query references, so sharing one prelude costs nothing.

Semantics mirrored from the reference models (same files as the
operators' docstrings); surrogate keys via
``functions.core.surrogate_key_sql`` (byte-identical dbt_utils
expansion).
"""

from __future__ import annotations

from .adapters.testdata import BRONZE_SQL, DQ_AS_OF_DATE
from .functions.core import surrogate_key_sql as sk

STG_SQL = """
SELECT * FROM (
  SELECT
    TRIM(CAST(event_id AS VARCHAR)) AS event_id,
    TRIM(CAST(order_id AS VARCHAR)) AS order_id,
    TRIM(CAST("timestamp" AS VARCHAR)) AS "timestamp",
    TRIM(CAST(estimated_delivery AS VARCHAR)) AS estimated_delivery,
    TRIM(CAST(status AS VARCHAR)) AS status,
    TRIM(CAST(origin AS VARCHAR)) AS origin,
    TRIM(CAST(destination AS VARCHAR)) AS destination,
    TRIM(CAST(carrier_name AS VARCHAR)) AS carrier_name,
    CAST(latitude AS FLOAT) AS latitude,
    CAST(longitude AS FLOAT) AS longitude,
    CAST(weight_kg AS FLOAT) AS weight_kg,
    ingestion_timestamp
  FROM bronze
)
WHERE event_id IS NOT NULL AND order_id IS NOT NULL
  AND event_id <> '' AND order_id <> ''
""".strip()

VALID_SQL = """
SELECT * FROM stg
WHERE weight_kg > 0
  AND latitude IS NOT NULL AND longitude IS NOT NULL
  AND estimated_delivery >= "timestamp"
  AND status IS NOT NULL AND status <> ''
  AND origin IS NOT NULL AND origin <> ''
  AND destination IS NOT NULL AND destination <> ''
""".strip()

_FLAG_W = "(weight_kg IS NULL OR weight_kg <= 0)"
_FLAG_C = "(latitude IS NULL OR longitude IS NULL)"
_FLAG_D = '(estimated_delivery IS NULL OR estimated_delivery < "timestamp")'
_FLAG_S = "(status IS NULL OR status = '')"
_FLAG_L = "(origin IS NULL OR origin = '' OR destination IS NULL OR destination = '')"

INVALID_SQL = f"""
SELECT
  event_id, order_id, estimated_delivery, status, origin, destination,
  carrier_name, latitude, longitude, weight_kg, ingestion_timestamp,
  CASE
    WHEN {_FLAG_W} THEN 'INVALID_WEIGHT'
    WHEN {_FLAG_C} THEN 'MISSING_COORDINATES'
    WHEN {_FLAG_D} THEN 'INVALID_ESTIMATED_DELIVERY'
    WHEN {_FLAG_S} THEN 'MISSING_STATUS'
    WHEN {_FLAG_L} THEN 'MISSING_LOCATION'
  END AS invalid_reason
FROM stg
WHERE {_FLAG_W} OR {_FLAG_C} OR {_FLAG_D} OR {_FLAG_S} OR {_FLAG_L}
""".strip()

DIM_TIME_SQL = f"""
SELECT
  {sk('full_timestamp')} AS time_sk,
  full_timestamp,
  CAST(full_timestamp AS DATE) AS date,
  CAST(EXTRACT(YEAR  FROM CAST(full_timestamp AS TIMESTAMP)) AS INT) AS year,
  CAST(EXTRACT(MONTH FROM CAST(full_timestamp AS TIMESTAMP)) AS INT) AS month,
  CAST(EXTRACT(DAY   FROM CAST(full_timestamp AS TIMESTAMP)) AS INT) AS day,
  CAST(EXTRACT(HOUR  FROM CAST(full_timestamp AS TIMESTAMP)) AS INT) AS hour,
  CAST(EXTRACT(DOW   FROM CAST(full_timestamp AS TIMESTAMP)) AS INT) AS day_of_week
FROM (SELECT DISTINCT "timestamp" AS full_timestamp FROM valid)
""".strip()

DIM_LOCATION_SQL = f"""
SELECT
  {sk('location_name')} AS location_sk,
  location_name, latitude, longitude
FROM (
  SELECT location_name, MIN(latitude) AS latitude, MIN(longitude) AS longitude
  FROM (
    SELECT origin AS location_name, latitude, longitude FROM valid
    WHERE origin IS NOT NULL AND origin <> ''
    UNION ALL
    SELECT destination AS location_name, latitude, longitude FROM valid
    WHERE destination IS NOT NULL AND destination <> ''
  )
  GROUP BY location_name
)
""".strip()

DIM_STATUS_SQL = f"""
SELECT {sk('status_name')} AS status_sk, status_name
FROM (SELECT DISTINCT status AS status_name FROM valid
      WHERE status IS NOT NULL AND status <> '')
""".strip()

DIM_CARRIER_SQL = f"""
SELECT {sk('carrier_name')} AS carrier_sk, carrier_name
FROM (SELECT DISTINCT carrier_name FROM valid
      WHERE carrier_name IS NOT NULL AND carrier_name <> '')
""".strip()

# ANY_VALUE -> MIN for determinism in BOTH engines (SURVEY.md §7 risk #2)
DIM_ORDER_SQL = f"""
SELECT
  {sk('order_id')} AS order_sk,
  order_id, destination, origin, weight_kg,
  first_event_timestamp, latest_event_timestamp
FROM (
  SELECT
    order_id,
    MIN(destination) AS destination,
    MIN(origin)      AS origin,
    MIN(weight_kg)   AS weight_kg,
    MIN("timestamp") AS first_event_timestamp,
    MAX("timestamp") AS latest_event_timestamp
  FROM valid
  GROUP BY order_id
)
""".strip()

FACT_SQL = f"""
SELECT
  {sk('e.event_id')} AS event_sk,
  e.event_id,
  ord.order_sk,
  tim.time_sk,
  sta.status_sk,
  loc_orig.location_sk AS origin_location_sk,
  loc_dest.location_sk AS destination_location_sk,
  car.carrier_sk,
  e.weight_kg,
  e.estimated_delivery,
  CASE WHEN e.estimated_delivery < ord.latest_event_timestamp
       THEN TRUE ELSE FALSE END AS is_late_delivery
FROM valid e
LEFT JOIN dim_order    ord      ON e.order_id = ord.order_id
LEFT JOIN dim_time     tim      ON e."timestamp" = tim.full_timestamp
LEFT JOIN dim_status   sta      ON e.status = sta.status_name
LEFT JOIN dim_location loc_orig ON e.origin = loc_orig.location_name
LEFT JOIN dim_location loc_dest ON e.destination = loc_dest.location_name
LEFT JOIN dim_carrier  car      ON e.carrier_name = car.carrier_name
""".strip()

DQ_SUMMARY_SQL = """
SELECT
  ic.event_date,
  ic.invalid_reason,
  ic.invalid_count,
  ae.total_events,
  -- reference casts to FLOAT; DOUBLE here on both sides (see
  -- operators/dq_summary.py) so float32-vs-double ulps can't diverge
  ROUND(CAST(ic.invalid_count AS DOUBLE) / NULLIF(ae.total_events, 0) * 100, 2)
    AS pct_of_total_events
FROM (
  SELECT CAST(ingestion_timestamp AS DATE) AS event_date, invalid_reason,
         COUNT(event_id) AS invalid_count
  FROM invalid
  GROUP BY CAST(ingestion_timestamp AS DATE), invalid_reason
) ic
LEFT JOIN (
  SELECT CAST(ingestion_timestamp AS DATE) AS event_date,
         COUNT(event_id) AS total_events
  FROM stg
  GROUP BY CAST(ingestion_timestamp AS DATE)
) ae ON ic.event_date = ae.event_date
""".strip()

_CTES: list[tuple[str, str]] = [
    ("bronze", BRONZE_SQL),
    ("stg", STG_SQL),
    ("valid", VALID_SQL),
    ("invalid", INVALID_SQL),
    ("dim_time", DIM_TIME_SQL),
    ("dim_location", DIM_LOCATION_SQL),
    ("dim_status", DIM_STATUS_SQL),
    ("dim_carrier", DIM_CARRIER_SQL),
    ("dim_order", DIM_ORDER_SQL),
    ("fact_event", FACT_SQL),
    ("dq_summary", DQ_SUMMARY_SQL),
]

PRELUDE = "WITH " + ",\n".join(f"{n} AS (\n{s}\n)" for n, s in _CTES) + "\n"


def q(final_select: str) -> str:
    """An oracle query = shared prelude + final SELECT."""
    return PRELUDE + final_select.strip()


# --- per-query finals ------------------------------------------------------

KPI_CARRIER_SQL = q("""
SELECT
  c.carrier_name,
  COUNT(f.event_sk) AS total_events,
  CAST(SUM(CASE WHEN f.is_late_delivery THEN 1 ELSE 0 END) AS BIGINT) AS late_deliveries,
  ROUND(SUM(CASE WHEN NOT f.is_late_delivery THEN 1 ELSE 0 END) * 100.0
        / NULLIF(COUNT(f.event_sk), 0), 2) AS on_time_rate,
  ROUND(AVG(f.weight_kg), 2) AS avg_weight_kg
FROM fact_event f
LEFT JOIN dim_carrier c ON f.carrier_sk = c.carrier_sk
GROUP BY c.carrier_name
ORDER BY on_time_rate DESC
""")

KPI_ACTIVE_SHIPMENTS_SQL = q("""
SELECT l.latitude, l.longitude, s.status_name AS status, c.carrier_name
FROM fact_event f
LEFT JOIN dim_location l ON f.origin_location_sk = l.location_sk
LEFT JOIN dim_status   s ON f.status_sk = s.status_sk
LEFT JOIN dim_carrier  c ON f.carrier_sk = c.carrier_sk
WHERE s.status_name != 'Delivered'
  AND l.latitude IS NOT NULL AND l.longitude IS NOT NULL
""")

KPI_WEIGHT_SQL = q("SELECT weight_kg FROM fact_event WHERE weight_kg IS NOT NULL")

# Scale-safe twin of the weight histogram (dashboards.py): the reference
# ships every row to plotly and bins client-side; this bins in-engine.
# Equal-width bins over [min, max], last bin right-closed.
KPI_WEIGHT_HISTOGRAM_SQL = q("""
SELECT * FROM (
  WITH w AS (
    SELECT CAST(weight_kg AS DOUBLE) AS wv FROM fact_event
    WHERE weight_kg IS NOT NULL
  ),
  rng AS (SELECT MIN(wv) AS lo, MAX(wv) AS hi FROM w),
  b AS (
    SELECT CASE WHEN hi = lo THEN 0
                ELSE LEAST(CAST(FLOOR((wv - lo) / ((hi - lo) / 50)) AS INT), 49)
           END AS bin, lo, hi
    FROM w, rng
  )
  SELECT CAST(bin AS INT) AS bin,
         ROUND(lo + bin * (hi - lo) / 50, 6) AS bin_start,
         ROUND(lo + (bin + 1) * (hi - lo) / 50, 6) AS bin_end,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM b GROUP BY bin, lo, hi
) ORDER BY bin
""")

KPI_STATUS_SQL = q("""
SELECT s.status_name, COUNT(*) AS event_count
FROM fact_event f
LEFT JOIN dim_status s ON f.status_sk = s.status_sk
GROUP BY s.status_name
ORDER BY event_count DESC
""")

MONITOR_SCALAR_SQL = q("""
SELECT COUNT(*) AS total_events,
       COUNT(DISTINCT order_id) AS unique_orders,
       MAX("timestamp") AS latest_event
FROM bronze
""")

MONITOR_TREND_SQL = q("""
SELECT date_trunc('minute', CAST("timestamp" AS TIMESTAMP)) AS minute,
       COUNT(*) AS event_count
FROM bronze
GROUP BY 1
ORDER BY 1 DESC
LIMIT 60
""")

MONITOR_DQ_ROLLUP_SQL = q("""
SELECT invalid_reason, CAST(SUM(invalid_count) AS BIGINT) AS total_invalid
FROM dq_summary
GROUP BY invalid_reason
ORDER BY total_invalid DESC
""")

MONITOR_RECENT_SQL = q("""
SELECT * FROM bronze
ORDER BY ingestion_timestamp DESC, "timestamp" DESC, event_id DESC, order_id DESC
LIMIT 20
""")

_VALID_STATUS_LIST = "'Order Created', 'Picked Up', 'In Transit', 'Out for Delivery', 'Delivered', 'Delayed'"

DQ_CHECKS_SQL = q(f"""
SELECT 1 AS check_id, 'null_order_ids' AS check_name, 'error' AS severity,
       CAST(COUNT(*) AS BIGINT) AS failing_rows
FROM bronze WHERE order_id IS NULL OR order_id = ''
UNION ALL
SELECT 2, 'invalid_weights', 'error', CAST(COUNT(*) AS BIGINT)
FROM bronze WHERE weight_kg IS NULL OR weight_kg <= 0 OR weight_kg > 5000
UNION ALL
SELECT 3, 'malformed_timestamps', 'error', CAST(COUNT(*) AS BIGINT)
FROM bronze WHERE "timestamp" IS NULL OR TRY_CAST("timestamp" AS TIMESTAMP) IS NULL
UNION ALL
SELECT 4, 'invalid_status_values', 'error', CAST(COUNT(*) AS BIGINT)
FROM bronze WHERE status NOT IN ({_VALID_STATUS_LIST})
UNION ALL
SELECT 5, 'invalid_coordinates', 'error', CAST(COUNT(*) AS BIGINT)
FROM bronze WHERE latitude IS NULL OR longitude IS NULL
   OR latitude < -90 OR latitude > 90 OR longitude < -180 OR longitude > 180
UNION ALL
SELECT 6, 'duplicate_event_ids', 'warning', CAST(COUNT(*) AS BIGINT)
FROM (SELECT event_id FROM bronze WHERE event_id IS NOT NULL
      GROUP BY event_id HAVING COUNT(*) > 1)
UNION ALL
SELECT 7, 'past_or_invalid_delivery_dates', 'warning', CAST(COUNT(*) AS BIGINT)
FROM bronze WHERE TRY_CAST(estimated_delivery AS DATE) IS NULL
   OR TRY_CAST(estimated_delivery AS DATE) < DATE '{DQ_AS_OF_DATE}'
""")

# dbt schema.yml equivalents (SURVEY.md §5 item 2): one row per test.
_DIM_TESTS = "\nUNION ALL\n".join(
    f"""SELECT '{dim}_{sk}_not_null' AS test_name,
       CAST(SUM(CASE WHEN {sk} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations FROM {dim}
UNION ALL
SELECT '{dim}_{sk}_unique', CAST(COUNT(*) AS BIGINT) FROM
  (SELECT {sk} FROM {dim} WHERE {sk} IS NOT NULL GROUP BY {sk} HAVING COUNT(*) > 1)
UNION ALL
SELECT '{dim}_{nk}_unique', CAST(COUNT(*) AS BIGINT) FROM
  (SELECT {nk} FROM {dim} WHERE {nk} IS NOT NULL GROUP BY {nk} HAVING COUNT(*) > 1)"""
    for dim, sk, nk in [
        ("dim_time", "time_sk", "full_timestamp"),
        ("dim_location", "location_sk", "location_name"),
        ("dim_status", "status_sk", "status_name"),
        ("dim_carrier", "carrier_sk", "carrier_name"),
        ("dim_order", "order_sk", "order_id"),
    ]
)

_FK_TESTS = "\nUNION ALL\n".join(
    f"""SELECT 'fact_{fk}_relationship', CAST(COUNT(*) AS BIGINT) FROM fact_event f
WHERE f.{fk} IS NOT NULL AND NOT EXISTS (SELECT 1 FROM {dim} d WHERE d.{pk} = f.{fk})"""
    for fk, dim, pk in [
        ("order_sk", "dim_order", "order_sk"),
        ("time_sk", "dim_time", "time_sk"),
        ("status_sk", "dim_status", "status_sk"),
        ("origin_location_sk", "dim_location", "location_sk"),
        ("destination_location_sk", "dim_location", "location_sk"),
        ("carrier_sk", "dim_carrier", "carrier_sk"),
    ]
)

SCHEMA_TESTS_SQL = q(f"""
SELECT 'stg_event_id_not_null' AS test_name,
       CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations FROM stg
UNION ALL
SELECT 'stg_event_id_unique', CAST(COUNT(*) AS BIGINT) FROM
  (SELECT event_id FROM stg WHERE event_id IS NOT NULL GROUP BY event_id HAVING COUNT(*) > 1)
UNION ALL
SELECT 'valid_event_id_not_null',
       CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM valid
UNION ALL
SELECT 'valid_event_id_unique', CAST(COUNT(*) AS BIGINT) FROM
  (SELECT event_id FROM valid WHERE event_id IS NOT NULL GROUP BY event_id HAVING COUNT(*) > 1)
UNION ALL
SELECT 'invalid_reason_accepted_values', CAST(SUM(CASE WHEN invalid_reason IS NOT NULL
  AND invalid_reason NOT IN ('INVALID_WEIGHT','MISSING_COORDINATES',
  'INVALID_ESTIMATED_DELIVERY','MISSING_STATUS','MISSING_LOCATION')
  THEN 1 ELSE 0 END) AS BIGINT) FROM invalid
UNION ALL
SELECT 'is_late_delivery_accepted_values', CAST(SUM(CASE WHEN is_late_delivery IS NOT NULL
  AND is_late_delivery NOT IN (TRUE, FALSE) THEN 1 ELSE 0 END) AS BIGINT) FROM fact_event
UNION ALL
{_DIM_TESTS}
UNION ALL
{_FK_TESTS}
""")

# S9 incremental dedup insert: rows of the "incoming" batch not already
# in the "existing" table (NOT IN ≡ left anti; event_ids non-null here).
# Splits of the events table are deterministic stand-ins for
# existing-table vs new-batch.
INGEST_ANTIJOIN_SQL = """
SELECT * FROM events
WHERE event_id % 10 < 5
  AND event_id NOT IN (SELECT event_id FROM events WHERE event_id % 10 < 3)
""".strip()
