"""Contract tests over the driver-generated testdata.

The driver regenerates /root/testdata between rounds, and physical
parquet details can drift (round 3: timestamps switched from
TIMESTAMP(NANOS) to TIMESTAMP(MICROS, isAdjustedToUTC=false), which
Spark infers as TIMESTAMP_NTZ — breaking every epoch-cast operator
until NTZ inference was disabled at the session). These tests make the
NEXT drift fail loudly in pytest instead of surfacing as a driver
correctness failure on end-of-round state.
"""

from __future__ import annotations

import pytest

from logistics_data_pipeline_spark.adapters.testdata import TABLES, load_table

EXPECTED_COLUMNS = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {"c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"},
    "supplier": {"s_suppkey", "s_name", "s_nationkey", "s_acctbal"},
    "part": {"p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"},
    "orders": {
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    },
    "lineitem": {
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    },
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    "documents": {"doc_id", "text", "lang", "source", "n_chars"},
    "embeddings": {"vec_id", "embedding", "label"},
}


def test_all_tables_load_with_expected_columns(spark, sf_dir):
    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        assert set(df.columns) >= EXPECTED_COLUMNS[t], (
            f"{t}: missing {EXPECTED_COLUMNS[t] - set(df.columns)}"
        )
        assert df.limit(1).count() == 1, f"{t} is empty"


@pytest.mark.parametrize(
    "table,col", [("events", "ts"), ("orders", "o_orderdate"), ("lineitem", "l_shipdate")]
)
def test_time_columns_load_as_ltz_timestamp(spark, sf_dir, table, col):
    """Every operator treats event time as TIMESTAMP (LTZ) under the UTC
    session zone — the r1/r2 driver-green behavior. NTZ would break the
    epoch casts (`ts.cast('long')`) in session/interarrival/range-join
    operators; a bigint here means the nanos adapter path regressed."""
    dtype = dict(load_table(spark, sf_dir, table).dtypes)[col]
    assert dtype == "timestamp", f"{table}.{col} loaded as {dtype}"
    # and the epoch cast the temporal operators rely on must analyze
    from pyspark.sql import functions as F

    load_table(spark, sf_dir, table).select(
        F.col(col).cast("long")
    ).limit(1).collect()


def test_embeddings_are_float_arrays(spark, sf_dir):
    dtype = dict(load_table(spark, sf_dir, "embeddings").dtypes)["embedding"]
    assert dtype in ("array<float>", "array<double>"), dtype


def test_corpora_stay_under_the_governor_oracle_bounds():
    """The size-adaptive governors (SRP-LSH / aHash band width,
    SemDeDup cell sharding) pick their narrow regime at every
    committed SF, which is exactly where the REGISTERED oracle
    constants mirror them. If the driver ever regenerates testdata
    past these bounds, the Spark side would switch regimes and the
    hardcoded twins would hash-mismatch — fail HERE first, with the
    fix: re-bind the registered SQL from the parameterized builders
    (neardup_lsh_sql / semantic_decontamination_governed_sql /
    curation._decontamination_panel_sql / media_ahash_neardup_sql /
    semdedup_sql) at the width/cap the new sizes select. (pHash left
    this list in round 12: its complete multiprobe makes the output
    exact in every regime and its oracle is ground truth, so there is
    no regime bound to guard.)"""
    import duckdb

    n_emb = duckdb.sql(
        "SELECT count(*) FROM '/root/testdata/sf0.1/embeddings.parquet'"
    ).fetchone()[0]
    n_docs = duckdb.sql(
        "SELECT count(*) FROM '/root/testdata/sf0.1/documents.parquet'"
    ).fetchone()[0]
    assert n_emb <= 4096, (
        f"SRP-LSH 4-bit oracle bound crossed: {n_emb} vectors (re-bind the "
        "emb_neardup_lsh, emb_semantic_decontamination_governed, and "
        "docs_decontamination_panel oracles at the governor's new width). "
        "ALSO: emb_semantic_decontamination is the QUADRATIC exact oracle "
        "twin of the governed key — its emb_pairs asset grows as n², so "
        "past this bound keep it test-only (the _governed SRP-LSH path is "
        "the only one that runs at scale; see registry.py's comment on the "
        "key). The emb_knn_graph_beam oracle's exact all-pairs graph build "
        "shares this 4096 bound (NSW_EXACT_BOUND) — beyond it the nsw_graph "
        "asset switches to the LSH-seeded NN-descent build, which the "
        "registered oracle does NOT mirror"
    )
    assert n_docs <= 8192, f"aHash 8-bit oracle bound crossed: {n_docs} docs"
    from logistics_data_pipeline_spark.llm.similarity import (
        KC_EXACT_CELLS,
        SEMDEDUP_CELL_CAP,
    )

    # max k-means cell size can't exceed the corpus; a whole-corpus
    # bound keeps this check oracle-free (cells are seeded-dependent)
    assert n_emb <= KC_EXACT_CELLS * SEMDEDUP_CELL_CAP, (
        f"SemDeDup single-shard bound may be crossed: {n_emb} vectors, "
        f"{KC_EXACT_CELLS} cells x cap {SEMDEDUP_CELL_CAP} (the oracle "
        "mirrors sharding exactly, so correctness holds either way — "
        "this guard just flags that the sharded regime went live)"
    )


def test_document_text_is_nonempty_printable_ascii():
    """The PNG roundtrip/resize oracles (llm/multimodal.py
    PNG_ROUNDTRIP_SQL / PNG_RESIZE_SQL) compare character-based DuckDB
    VARCHAR ops (length/substr/ord/repeat) against the Spark side's
    UTF-8 byte cycling — the two agree ONLY while documents.text is
    non-empty printable ASCII (1 byte == 1 char, and no div-by-zero in
    ceil(512.0/length(text))). ADVICE r7: pin that contract here so a
    testdata regen with real multi-byte text (docs carry lang='zh')
    fails loudly with the fix — rewrite those oracles byte-based
    (encode()/octet_length) — instead of as a silent hash mismatch."""
    import duckdb

    for sf in ("0.001", "0.01", "0.1"):
        bad = duckdb.sql(
            f"""
            SELECT count(*) FROM '/root/testdata/sf{sf}/documents.parquet'
            WHERE text IS NULL OR length(text) = 0
               OR octet_length(encode(text)) != length(text)
               OR regexp_matches(text, '[^\\x20-\\x7e]')
            """
        ).fetchone()[0]
        assert bad == 0, (
            f"sf{sf}: {bad} documents break the printable-ASCII contract "
            "the PNG oracles assume — rewrite PNG_ROUNDTRIP_SQL/"
            "PNG_RESIZE_SQL byte-based (encode()/octet_length) before "
            "trusting their hash rows"
        )


def test_event_type_domain_matches_ldiv_pivot():
    """events_l_diversity pivots its entropy terms over the FIXED
    five-value event_type domain pinned in analytics._LDIV_TYPES (the
    pivot fixes the float summation order, the suite's cross-engine
    heal). A sixth type in regenerated testdata would be counted in
    n_rows but silently excluded from distinct_sensitive and the
    entropy sum — IDENTICALLY in both engines, so the oracle can never
    catch the drift (ADVICE r9). Pin the domain here instead: the fix
    on failure is to extend _LDIV_TYPES (and the _ldiv_sql pivot it
    drives) to the new domain and re-verify the key."""
    import duckdb

    from logistics_data_pipeline_spark.operators.analytics import _LDIV_TYPES

    for sf in ("0.001", "0.01", "0.1"):
        got = tuple(
            r[0]
            for r in duckdb.sql(
                f"SELECT DISTINCT event_type FROM "
                f"'/root/testdata/sf{sf}/events.parquet' ORDER BY 1"
            ).fetchall()
        )
        assert got == _LDIV_TYPES, (
            f"sf{sf}: event_type domain {got} != _LDIV_TYPES "
            f"{_LDIV_TYPES} — extend analytics._LDIV_TYPES and its "
            "_ldiv_sql pivot before trusting events_l_diversity rows"
        )
