"""dbt-schema-test equivalents over the star layer.

Reference: ``logistics_pipeline/models/layer/schema.yml`` run by the
DAG's dbt_test task (SURVEY.md §5 item 2): not_null + unique on staging
and valid event_ids, dim surrogate/natural keys; accepted_values on
invalid_reason and is_late_delivery; relationships (FK integrity) from
fact_event's six FKs to their dims. (The reference's YAML has a typo'd
``versio:`` header and a mis-indented fact block — the declared *intent*
is implemented here.)

Each test yields one (test_name, violations) row; a green run is all
zeros. Tests are plain aggregations — they compose into a handful of
hash aggregates, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .validity import INVALID_REASONS


def _one(name: str, df: DataFrame) -> DataFrame:
    return df.select(
        F.lit(name).alias("test_name"),
        F.coalesce(F.first("violations"), F.lit(0)).cast("bigint").alias("violations"),
    )


def not_null(df: DataFrame, col: str, name: str) -> DataFrame:
    return _one(name, df.agg(F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).alias("violations")))


def unique(df: DataFrame, col: str, name: str) -> DataFrame:
    dup = (
        df.filter(F.col(col).isNotNull())
        .groupBy(col)
        .count()
        .filter(F.col("count") > 1)
        .agg(F.count("*").alias("violations"))
    )
    return _one(name, dup)


def accepted_values(df: DataFrame, col: str, values: list, name: str) -> DataFrame:
    bad = df.agg(
        F.sum(
            F.when(F.col(col).isNotNull() & ~F.col(col).isin(values), 1).otherwise(0)
        ).alias("violations")
    )
    return _one(name, bad)


def relationships(
    child: DataFrame, child_col: str, parent: DataFrame, parent_col: str, name: str
) -> DataFrame:
    orphans = (
        child.filter(F.col(child_col).isNotNull())
        .join(
            parent.select(F.col(parent_col).alias("__pk")),
            F.col(child_col) == F.col("__pk"),
            "left_anti",
        )
        .agg(F.count("*").alias("violations"))
    )
    return _one(name, orphans)


def relationships_onepass(
    fact: DataFrame, fks: list[tuple[str, DataFrame, str, str]]
) -> DataFrame:
    """All FK-integrity tests in ONE scan of the fact: broadcast-left-
    join each (tiny) dim's key set, count unmatched non-null FKs as one
    row of sums, then unpivot to (test_name, violations) rows. Replaces
    N anti-join scans of the fact with one — the difference between N
    full passes and one at 100 TB."""
    joined = fact
    flags = []
    for i, (fk, parent, pk, name) in enumerate(fks):
        keys = F.broadcast(parent.select(F.col(pk).alias(f"__pk_{i}")).distinct())
        joined = joined.join(keys, F.col(fk) == F.col(f"__pk_{i}"), "left")
        flags.append(
            F.sum(
                F.when(F.col(fk).isNotNull() & F.col(f"__pk_{i}").isNull(), 1).otherwise(0)
            ).alias(name)
        )
    row = joined.agg(*flags)
    names = [name for *_, name in fks]
    stack_expr = ", ".join(f"'{n}', {n}" for n in names)
    return row.selectExpr(
        f"stack({len(names)}, {stack_expr}) as (test_name, violations)"
    ).select("test_name", F.col("violations").cast("bigint").alias("violations"))


def star_schema_tests(wh: dict[str, DataFrame]) -> DataFrame:
    """The full schema.yml suite over a built warehouse dict
    (pipeline.build_warehouse output)."""
    stg = wh["stg_logistics_events"]
    valid = wh["int_valid_logistics_events"]
    invalid = wh["int_invalid_logistics_events"]
    fact = wh["fact_event"]
    tests = [
        not_null(stg, "event_id", "stg_event_id_not_null"),
        unique(stg, "event_id", "stg_event_id_unique"),
        not_null(valid, "event_id", "valid_event_id_not_null"),
        unique(valid, "event_id", "valid_event_id_unique"),
        accepted_values(
            invalid, "invalid_reason", INVALID_REASONS, "invalid_reason_accepted_values"
        ),
        accepted_values(
            fact, "is_late_delivery", [True, False], "is_late_delivery_accepted_values"
        ),
    ]
    for dim, sk, nk in [
        ("dim_time", "time_sk", "full_timestamp"),
        ("dim_location", "location_sk", "location_name"),
        ("dim_status", "status_sk", "status_name"),
        ("dim_carrier", "carrier_sk", "carrier_name"),
        ("dim_order", "order_sk", "order_id"),
    ]:
        tests.append(not_null(wh[dim], sk, f"{dim}_{sk}_not_null"))
        tests.append(unique(wh[dim], sk, f"{dim}_{sk}_unique"))
        tests.append(unique(wh[dim], nk, f"{dim}_{nk}_unique"))
    tests.append(
        relationships_onepass(
            fact,
            [
                (fk, wh[dim], pk, f"fact_{fk}_relationship")
                for fk, dim, pk in [
                    ("order_sk", "dim_order", "order_sk"),
                    ("time_sk", "dim_time", "time_sk"),
                    ("status_sk", "dim_status", "status_sk"),
                    ("origin_location_sk", "dim_location", "location_sk"),
                    ("destination_location_sk", "dim_location", "location_sk"),
                    ("carrier_sk", "dim_carrier", "carrier_sk"),
                ]
            ],
        )
    )
    out = tests[0]
    for t in tests[1:]:
        out = out.unionByName(t)
    return out
