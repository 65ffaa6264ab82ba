"""The local oracle replica must be exactly as strict as the driver's
canonicalizer.

Round 3 shipped three keys whose array-typed outputs crashed the
driver's ``_canon`` (pandas ``sort_values`` → ``Categorical`` factorize
→ ``TypeError: unhashable type: 'numpy.ndarray'``) while the replica
printed ok, because it pre-stringified list columns before sorting
(VERDICT r3 #2). These tests pin the strict behavior: non-hashable
column values raise in ``norm_frame``, and no registered query is
allowed to emit a complex-typed (array/map/struct) output column at
all — the driver canonicalizes even rows-only results.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

from check_correctness import norm_frame  # noqa: E402

from logistics_data_pipeline_spark import registry  # noqa: E402


def test_norm_frame_rejects_ndarray_columns():
    # Spark toPandas materializes array<T> columns as np.ndarray cells.
    df = pd.DataFrame({"id": [2, 1], "vec": [np.array([1.0, 2.0]), np.array([3.0])]})
    with pytest.raises(TypeError, match="unhashable"):
        norm_frame(df)


def test_norm_frame_rejects_list_columns():
    # DuckDB .df() materializes LIST columns as Python lists.
    df = pd.DataFrame({"id": [2, 1], "vec": [[1.0, 2.0], [3.0]]})
    with pytest.raises(TypeError, match="unhashable"):
        norm_frame(df)


def test_norm_frame_sorts_scalars_with_nulls():
    df = pd.DataFrame(
        {"k": ["b", None, "a"], "n": [2.0, 1.0, None], "i": [3, 1, 2]}
    )
    out = norm_frame(df)
    assert list(out.columns) == ["i", "k", "n"]
    assert out["k"].tolist() == [None, "a", "b"]
    assert len(out) == 3


def test_tracked_persists_are_released(spark, sf_dir):
    """Operator-scoped persists (MinHash signature table) must register
    with session.track_persist and be releasable between queries —
    the round-3 hot-session degradation came from exactly these
    accumulating for the session's lifetime."""
    from logistics_data_pipeline_spark import registry, session
    from logistics_data_pipeline_spark.adapters.testdata import load_table
    from logistics_data_pipeline_spark.llm.dedup import neardup_minhash

    session.release_tracked_persists()
    docs = load_table(spark, sf_dir, "documents")
    neardup_minhash(docs).count()
    assert len(session._TRACKED_PERSISTS) >= 1
    tracked = list(session._TRACKED_PERSISTS)
    released = registry.clear_session_caches(spark)
    assert released >= 1
    assert session._TRACKED_PERSISTS == []
    from pyspark import StorageLevel

    for df in tracked:
        assert df.storageLevel == StorageLevel.NONE


def test_no_registered_query_emits_complex_typed_columns(spark, sf_dir):
    """Schema-level gate over every registered key (including rows-only
    ones — the driver counts rows only AFTER canonicalizing, so an
    array column nulls even ``spark_rows``, as docs_simhash did in r3).
    Building the DataFrame is lazy, so this walks all 120+ schemas
    cheaply."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = []
    for name, fn in registry.queries().items():
        schema = fn(spark, sf_dir).schema
        for field in schema.fields:
            if isinstance(field.dataType, (ArrayType, MapType, StructType)):
                bad.append(f"{name}.{field.name}: {field.dataType.simpleString()}")
    assert not bad, (
        "complex-typed output columns crash the driver canonicalizer; "
        "emit long format or serialize instead: " + "; ".join(bad)
    )
