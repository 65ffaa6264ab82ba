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


def test_embedding_neardup_block_pair_is_equi_join(spark, sf_dir):
    """VERDICT r1 #3 regression lock: the exact embedding near-dup must
    stay a key-partitioned equi-join — no BroadcastNestedLoopJoin, no
    cartesian, no whole-corpus broadcast on the pair path."""
    from logistics_data_pipeline_spark.llm import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    plan = _plan(similarity.embedding_neardup(emb))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_embedding_neardup_fast_has_no_collect_broadcast(spark, sf_dir):
    """VERDICT r1 #2 regression lock: building the fast near-dup plan
    must not execute any job (the round-1 version collect()ed the
    corpus at plan-build time)."""
    from logistics_data_pipeline_spark.llm import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    df = similarity.embedding_neardup_fast(emb)
    after = len(tracker.getJobIdsForGroup() or [])
    assert after == before, "plan construction ran Spark jobs (driver collect?)"
    assert "mapInPandas" in _plan(df) or "FlatMapGroupsInPandas" in _plan(df)


def _has_unpartitioned_window(plan: str) -> bool:
    import re

    for line in plan.splitlines():
        m = re.search(r"\bWindow (\[.*)$", line)
        if not m:
            continue
        groups = re.findall(r"\[[^\[\]]*\]", m.group(1))
        if len(groups) == 2 and re.search(r"\b(ASC|DESC)\b", groups[-1]):
            return True
    return False


def test_quantile_queries_have_no_global_windows(spark, sf_dir):
    """VERDICT r1 #4 regression lock: RFM / LTV deciles / q15 must never
    reintroduce a single-partition ordered window."""
    from logistics_data_pipeline_spark.operators import tpch_extra

    orders = load_table(spark, sf_dir, "orders")
    assert not _has_unpartitioned_window(_plan(analytics.customer_rfm(orders)))
    assert not _has_unpartitioned_window(_plan(analytics.customer_ltv_deciles(orders)))
    q15 = tpch_extra.q15_top_supplier(
        load_table(spark, sf_dir, "supplier"), load_table(spark, sf_dir, "lineitem")
    )
    assert not _has_unpartitioned_window(_plan(q15))


def test_range_join_is_bin_hash_join_not_nested_loop(spark, sf_dir):
    """The interval × point range join must plan as an equi-join on the
    bin key — never the BroadcastNestedLoopJoin a raw BETWEEN predicate
    produces."""
    events = load_table(spark, sf_dir, "events")
    plan = _plan(temporal.hot_window_range_join(events))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_doc_chunks_is_shuffle_free_before_presentation_sort(spark, sf_dir):
    """Chunking is map-only: tokenize + explode + slice. The ONLY
    exchange in the plan is the final presentation orderBy's range
    exchange — no aggregation or join shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    plan = _plan(curation.doc_chunks(docs))
    assert plan.count("Exchange") <= 1, plan
    assert "rangepartitioning" in plan or "Exchange" not in plan, plan


def test_dim_stats_reads_only_embedding(spark, sf_dir):
    from logistics_data_pipeline_spark.llm import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    schemas = _read_schemas(similarity.dim_stats(emb))
    assert schemas and all("label" not in s for s in schemas), schemas


def test_incremental_dedup_is_hash_joins_on_content_hash(spark, sf_dir):
    from logistics_data_pipeline_spark.llm import dedup

    docs = load_table(spark, sf_dir, "documents")
    plan = _plan(dedup.incremental_dedup(docs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_exact_cosine_stays_in_codegen_hash_agg(spark, sf_dir):
    """The round-5 rewrite: the per-pair dot product must plan as
    Generate (posexplode) + HashAggregate — never BatchEvalPython, and
    no higher-order Aggregate lambda in the pair loop."""
    from logistics_data_pipeline_spark.llm import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    plan = _plan(similarity.embedding_neardup(emb))
    assert "BatchEvalPython" not in plan
    assert "Generate posexplode" in plan or "Generate" in plan
    assert "HashAggregate" in plan


def test_prefix_neardup_narrow_pair_stream(spark, sf_dir):
    """The quadratic pair join must not carry the full 64-dim vectors:
    full vectors enter only via the survivors' id join-back."""
    from logistics_data_pipeline_spark.llm import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    plan = _plan(similarity.embedding_neardup_prefix(emb))
    assert "BatchEvalPython" not in plan
    # the block-pair join keys exist, and the pair-side projections
    # reference the prefix slices (lpv/rpv), not the full lv/rv arrays
    import re

    joins = [ln for ln in plan.splitlines() if "Join" in ln]
    pair_join = [ln for ln in joins if re.search(r"p#\d+.*q#\d+", ln)]
    assert pair_join, joins
    # the pair join's own line must not materialize the full vectors
    assert all("lv#" not in ln and "rv#" not in ln for ln in pair_join), pair_join


def test_weighted_sample_zero_exchange_takeordered(spark, sf_dir):
    from logistics_data_pipeline_spark.llm import curation

    docs = load_table(spark, sf_dir, "documents")
    plan = _plan(curation.weighted_sample(docs))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_snm_window_is_partitioned(spark, sf_dir):
    """Blocked SNM must never run an unpartitioned (global-sort)
    window: every Window node carries the blk partition spec."""
    from logistics_data_pipeline_spark.llm import dedup

    docs = load_table(spark, sf_dir, "documents")
    plan = _plan(dedup.sorted_neighborhood(docs))
    for ln in plan.splitlines():
        if "Window" in ln and "windowspecdefinition" in ln:
            assert "blk" in ln or "doc_id" in ln, ln
