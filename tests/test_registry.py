"""Registry contract: every query callable returns a DataFrame on
sf0.001 with a stable schema; oracle coverage is explicit."""

from __future__ import annotations

import pytest

from logistics_data_pipeline_spark import registry

# Keys intentionally WITHOUT an oracle (non-SQL-expressible); everything
# else must have one. Keep in sync with registry registrations.
ROWS_ONLY_OK: set[str] = {
    "docs_neardup_minhash",  # LSH banding over xxhash64
    "docs_simhash",  # xxhash64 signatures
    "emb_knn_ivf",  # approximate probe subset
    "emb_neardup_cosine_fast",  # BLAS summation last-ulp vs SQL
    "emb_neardup_lsh",  # SRP-LSH candidate recall < 1 by construction
    "emb_kmeans_cells",  # iterative Lloyd assignment
    "emb_pq_codes",  # iterative per-subspace Lloyd training
    "events_approx_distinct",  # HLL sketch estimates are engine-specific
}


def test_all_queries_have_oracles_or_are_whitelisted():
    q = set(registry.queries())
    o = set(registry.oracle_sql())
    assert o <= q, "oracle without a query"
    assert q - o == ROWS_ONLY_OK, f"missing oracle for: {sorted(q - o - ROWS_ONLY_OK)}"


@pytest.mark.parametrize("name", sorted(registry.queries()))
def test_query_runs_on_smallest_sf(spark, sf_dir, name):
    df = registry.queries()[name](spark, sf_dir)
    assert df.columns, name
    assert df.count() >= 0


def test_flagship_nonempty(spark, sf_dir):
    assert registry.flagship(spark, sf_dir).count() > 0
