"""Round-9 ADVICE closures: signed-zero rounding, threshold-
parameterized governed-decon oracle, legible missing-control-file
errors. Each test pins one ADVICE r8 item so it cannot regress."""

from __future__ import annotations

import duckdb
import pytest

from logistics_data_pipeline_spark.adapters.testdata import load_table
from logistics_data_pipeline_spark.llm import similarity as llm_sim


def test_round_half_up_normalizes_signed_zero():
    """BigDecimal.valueOf(x).setScale(nd).doubleValue() has no -0.0;
    the driver-side mirror must not either (ADVICE r8 #1), else a
    trajectory value rounding to zero from below bitwise-diverges from
    the declarative/oracle path."""
    import math

    out = llm_sim._round_half_up(-1e-9, 6)
    assert out == 0.0
    assert not math.copysign(1.0, out) < 0, "sign of zero must be +"
    # regular values unaffected
    assert llm_sim._round_half_up(1.2345675, 6) == 1.234568
    assert llm_sim._round_half_up(-1.5e-6, 6) == -2e-6
    assert llm_sim._round_half_up(float("nan"), 6) != llm_sim._round_half_up(
        float("nan"), 6
    )


def test_governed_decon_nondefault_threshold_matches_duckdb(spark, sf_dir):
    """The SQL builder now mirrors BOTH knobs (band_bits, threshold) of
    the Spark path (ADVICE r8 #3): a non-default threshold must have a
    matching cross-engine twin, row for row."""
    emb = load_table(spark, sf_dir, "embeddings")
    thr = 0.42
    sp = {
        r.eval_id: (r.n_train_neardups, r.top_train_id, r.top_cosine)
        for r in llm_sim.semantic_decontamination_governed(
            emb, threshold=thr
        ).collect()
    }
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    dk = {
        ev: (n, tid, cos)
        for ev, n, tid, cos in con.sql(
            llm_sim.semantic_decontamination_governed_sql(4, threshold=thr)
        ).fetchall()
    }
    assert set(sp) == set(dk)
    assert len(sp) > 0, "threshold 0.42 must keep the twin non-trivial"
    for ev, (n, tid, cos) in sp.items():
        nd, tidd, cosd = dk[ev]
        assert (n, tid) == (nd, tidd), ev
        assert abs(cos - cosd) <= 1e-6, ev
    # a stricter threshold can only shrink the flagged-eval set
    default_n = llm_sim.semantic_decontamination_governed(emb).count()
    assert len(sp) <= default_n


def test_missing_control_files_raise_file_not_found(spark, tmp_path):
    """read_upsert_table / read_dedup_corpus on an uninitialized table
    dir must raise FileNotFoundError naming the marker, not a bare
    AttributeError from NoneType (ADVICE r8 #5)."""
    from logistics_data_pipeline_spark.streaming.ingest import (
        read_dedup_corpus,
        read_upsert_table,
    )

    with pytest.raises(FileNotFoundError, match="_CURRENT"):
        read_upsert_table(spark, str(tmp_path / "nope"))
    with pytest.raises(FileNotFoundError, match="_MANIFEST"):
        read_dedup_corpus(spark, str(tmp_path / "nope"))
