"""Gold layer: Kimball star schema (5 dims + 1 fact).

Reference: ``models/layer/dimension/*.sql`` and ``facts/fact_event.sql``
(SURVEY.md A1–A3, U1, J1–J5, P7, §2.8 surrogate keys).

Surrogate keys are byte-identical to ``dbt_utils.generate_surrogate_key``
(MD5 over string-cast + NULL sentinel) so they hash-match the oracle.

Deviation (documented, SURVEY.md §7 risk #2): the reference's
``dim_order`` uses ``ANY_VALUE(destination/origin)``, which is
nondeterministic in both engines; ``MIN`` is used here AND in the oracle
so results are stable.

Scale notes (100 TB):
* dim_status / dim_carrier / dim_location are tiny (bounded enum-ish
  domains) → broadcast-joined onto the fact.
* dim_order and dim_time are high-cardinality (one row per order /
  distinct timestamp) → shuffle hash joins on their keys; AQE handles
  skew. Do NOT broadcast these.
* The fact build references valid_events twice (directly and through
  dim_order's group-by); callers composing the full star should cache
  or checkpoint valid_events (pipeline.py does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.core import dow_sunday0, surrogate_key


def dim_time(valid: DataFrame) -> DataFrame:
    """A1 distinct timestamps + calendar breakdown (dim_time.sql)."""
    ts = F.col("full_timestamp").cast("timestamp")
    return (
        valid.select(F.col("timestamp").alias("full_timestamp"))
        .distinct()
        .select(
            surrogate_key("full_timestamp").alias("time_sk"),
            "full_timestamp",
            F.col("full_timestamp").cast("date").alias("date"),
            F.year(ts).cast("int").alias("year"),
            F.month(ts).cast("int").alias("month"),
            F.dayofmonth(ts).cast("int").alias("day"),
            F.hour(ts).cast("int").alias("hour"),
            # DuckDB EXTRACT(DOW): Sunday=0 (SURVEY.md §2.8)
            dow_sunday0(ts).alias("day_of_week"),
        )
    )


def dim_location(valid: DataFrame) -> DataFrame:
    """U1 UNION ALL of origins∪destinations, A2 GROUP BY with independent
    MIN(lat)/MIN(lon) (pair may never co-occur — preserved exactly)."""
    origins = valid.filter(
        F.col("origin").isNotNull() & (F.col("origin") != "")
    ).select(
        F.col("origin").alias("location_name"), "latitude", "longitude"
    )
    destinations = valid.filter(
        F.col("destination").isNotNull() & (F.col("destination") != "")
    ).select(
        F.col("destination").alias("location_name"), "latitude", "longitude"
    )
    deduped = (
        origins.unionByName(destinations)
        .groupBy("location_name")
        .agg(F.min("latitude").alias("latitude"), F.min("longitude").alias("longitude"))
    )
    return deduped.select(
        surrogate_key("location_name").alias("location_sk"),
        "location_name",
        "latitude",
        "longitude",
    )


def dim_status(valid: DataFrame) -> DataFrame:
    """A1 distinct statuses (dim_status.sql)."""
    return (
        valid.filter(F.col("status").isNotNull() & (F.col("status") != ""))
        .select(F.col("status").alias("status_name"))
        .distinct()
        .select(surrogate_key("status_name").alias("status_sk"), "status_name")
    )


def dim_carrier(valid: DataFrame) -> DataFrame:
    """A1 distinct carriers (dim_carrier.sql)."""
    return (
        valid.filter(
            F.col("carrier_name").isNotNull() & (F.col("carrier_name") != "")
        )
        .select("carrier_name")
        .distinct()
        .select(surrogate_key("carrier_name").alias("carrier_sk"), "carrier_name")
    )


def dim_order(valid: DataFrame) -> DataFrame:
    """A3 per-order lifecycle aggregates (dim_order.sql).

    MIN/MAX over ISO timestamp strings ≡ temporal order. ANY_VALUE →
    MIN for determinism (module docstring).
    """
    orders = valid.groupBy("order_id").agg(
        F.min("destination").alias("destination"),
        F.min("origin").alias("origin"),
        F.min("weight_kg").alias("weight_kg"),
        F.min("timestamp").alias("first_event_timestamp"),
        F.max("timestamp").alias("latest_event_timestamp"),
    )
    return orders.select(
        surrogate_key("order_id").alias("order_sk"),
        "order_id",
        "destination",
        "origin",
        "weight_kg",
        "first_event_timestamp",
        "latest_event_timestamp",
    )


def fact_event_fast(valid: DataFrame) -> DataFrame:
    """Join-free fact build — provably identical output to ``fact_event``.

    Every dim join in the reference is a LEFT join back to a dimension
    *derived from the same valid set*, keyed by a natural key the valid
    row necessarily contains. So each surrogate FK is a pure function of
    the fact row itself (md5 of the natural key), and the only genuine
    data dependency — dim_order.latest_event_timestamp — is a per-order
    MAX, expressible as a window. Six shuffling joins collapse into five
    md5 expressions + ONE shuffle (the order_id window).

    Join-miss semantics preserved: dim_status/dim_location filter empty
    names but validity already guarantees those non-empty; dim_carrier
    also filters empties while validity does NOT check carrier — an
    empty carrier misses the join in the reference, reproduced by the
    NULL guard below.

    At 100 TB this is the difference between 6 wide shuffles of the fact
    and 1. The join-based ``fact_event`` remains as the reference-shaped
    formulation; both hash-match the same oracle.
    """
    from pyspark.sql import Window

    latest = F.max("timestamp").over(Window.partitionBy("order_id"))
    empty_to_null = lambda c: F.when(  # noqa: E731
        F.col(c).isNull() | (F.col(c) == ""), F.lit(None).cast("string")
    ).otherwise(F.col(c))
    return valid.select(
        surrogate_key("event_id").alias("event_sk"),
        "event_id",
        surrogate_key("order_id").alias("order_sk"),
        surrogate_key("timestamp").alias("time_sk"),
        surrogate_key("status").alias("status_sk"),
        surrogate_key("origin").alias("origin_location_sk"),
        surrogate_key("destination").alias("destination_location_sk"),
        F.when(
            empty_to_null("carrier_name").isNull(), F.lit(None).cast("string")
        )
        .otherwise(surrogate_key("carrier_name"))
        .alias("carrier_sk"),
        "weight_kg",
        "estimated_delivery",
        F.when(F.col("estimated_delivery") < latest, F.lit(True))
        .otherwise(F.lit(False))
        .alias("is_late_delivery"),
    )


def fact_event(
    valid: DataFrame,
    d_order: DataFrame | None = None,
    d_time: DataFrame | None = None,
    d_status: DataFrame | None = None,
    d_location: DataFrame | None = None,
    d_carrier: DataFrame | None = None,
) -> DataFrame:
    """J1–J5 left joins onto dims, P7 is_late_delivery, fact SK.

    Joins follow the reference exactly (fact_event.sql:68-121): all LEFT
    OUTER on natural keys; dim_location role-plays twice (origin and
    destination). Small dims are broadcast; order/time dims shuffle.
    """
    d_order = d_order if d_order is not None else dim_order(valid)
    d_time = d_time if d_time is not None else dim_time(valid)
    d_status = d_status if d_status is not None else dim_status(valid)
    d_location = d_location if d_location is not None else dim_location(valid)
    d_carrier = d_carrier if d_carrier is not None else dim_carrier(valid)

    e = valid.alias("e")
    ordd = d_order.select("order_sk", "order_id", "latest_event_timestamp").alias("ord")
    tim = d_time.select("time_sk", "full_timestamp").alias("tim")
    sta = F.broadcast(d_status.select("status_sk", "status_name")).alias("sta")
    loc_o = F.broadcast(d_location.select("location_sk", "location_name")).alias("loc_orig")
    loc_d = F.broadcast(d_location.select("location_sk", "location_name")).alias("loc_dest")
    car = F.broadcast(d_carrier.select("carrier_sk", "carrier_name")).alias("car")

    joined = (
        e.join(ordd, F.col("e.order_id") == F.col("ord.order_id"), "left")
        .join(tim, F.col("e.timestamp") == F.col("tim.full_timestamp"), "left")
        .join(sta, F.col("e.status") == F.col("sta.status_name"), "left")
        .join(loc_o, F.col("e.origin") == F.col("loc_orig.location_name"), "left")
        .join(loc_d, F.col("e.destination") == F.col("loc_dest.location_name"), "left")
        .join(car, F.col("e.carrier_name") == F.col("car.carrier_name"), "left")
    )
    return joined.select(
        surrogate_key(F.col("e.event_id")).alias("event_sk"),
        F.col("e.event_id").alias("event_id"),
        F.col("ord.order_sk").alias("order_sk"),
        F.col("tim.time_sk").alias("time_sk"),
        F.col("sta.status_sk").alias("status_sk"),
        F.col("loc_orig.location_sk").alias("origin_location_sk"),
        F.col("loc_dest.location_sk").alias("destination_location_sk"),
        F.col("car.carrier_sk").alias("carrier_sk"),
        F.col("e.weight_kg").alias("weight_kg"),
        F.col("e.estimated_delivery").alias("estimated_delivery"),
        # P7: lexicographic string compare; NULL latest ⇒ FALSE
        F.when(
            F.col("e.estimated_delivery") < F.col("ord.latest_event_timestamp"), F.lit(True)
        )
        .otherwise(F.lit(False))
        .alias("is_late_delivery"),
    )


def dim_order_scd2(valid: DataFrame) -> DataFrame:
    """Slowly-changing-dimension type 2 on order status — versioned
    rows with effective_from/effective_to/is_current (an operator the
    reference's append-only star lacks, but any warehouse user needs).

    Change detection (lag) collapses consecutive same-status events;
    effective ranges come from lead over the collapsed set. Timestamps
    stay the reference's ISO STRINGS — lexicographic order ≡ temporal
    (SURVEY.md §1.2), so the versioning is byte-faithful to the
    reference's comparison semantics. One shuffle on order_id; both
    windows share it.
    """
    w = Window.partitionBy("order_id").orderBy("timestamp", "event_id")
    changes = (
        valid.select("order_id", "status", "timestamp", "event_id")
        .withColumn("prev_status", F.lag("status").over(w))
        .filter(
            F.col("prev_status").isNull() | (F.col("status") != F.col("prev_status"))
        )
    )
    w2 = Window.partitionBy("order_id").orderBy("timestamp", "event_id")
    return (
        changes.select(
            "order_id",
            "status",
            F.col("timestamp").alias("effective_from"),
            F.lead("timestamp").over(w2).alias("effective_to"),
            F.lead("timestamp").over(w2).isNull().alias("is_current"),
            F.row_number().over(w2).cast("int").alias("version"),
        )
        .orderBy("order_id", "version")
    )
