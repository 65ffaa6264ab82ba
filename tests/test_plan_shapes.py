"""Physical-plan shape assertions for the scale-sensitive operators:
the band join must never degrade to a nested-loop/cartesian product,
histogram/curation scans must prune columns, and the semantic
enrichment join must broadcast the small pair side. These lock in the
100 TB-safe plans `.explain` reviews arrived at."""

from __future__ import annotations

from logistics_data_pipeline_spark.adapters.testdata import load_table
from logistics_data_pipeline_spark.llm import curation
from logistics_data_pipeline_spark.operators import analytics, temporal


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_band_join_is_hash_join_not_cartesian(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    plan = _plan(temporal.purchase_click_attribution(events))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the equality pre-join on (user_id, bucket) plans as a hash join
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def _read_schemas(df) -> list[str]:
    import re

    return re.findall(r"ReadSchema: (struct<[^>]*>)", _plan(df))


def test_split_assign_prunes_scan_to_doc_id(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    schemas = _read_schemas(curation.split_assign(docs))
    # content-independent split must not read the text column
    assert schemas and all("text" not in s for s in schemas), schemas
    assert any("doc_id" in s for s in schemas)


def test_histogram_reads_only_value(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    schemas = _read_schemas(analytics.value_histogram(events))
    assert schemas == ["struct<value:double>"], schemas


def test_retention_avoids_cartesian_and_reuses_user_clustering(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    plan = _plan(temporal.retention_cohorts(events))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interarrival_single_user_shuffle(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    plan = _plan(temporal.interarrival_stats(events))
    # one hash-partitioning exchange on user_id feeds both the window
    # and the groupBy (the agg rides the window's partitioning)
    assert plan.count("hashpartitioning(user_id") <= 1, plan
