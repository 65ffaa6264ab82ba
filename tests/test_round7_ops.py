"""Round-7 operators: Gopher repetition rules, semantic
decontamination, and property pins the oracle compare can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from logistics_data_pipeline_spark.adapters.testdata import load_table
from logistics_data_pipeline_spark.llm import curation as llm_cur
from logistics_data_pipeline_spark.llm import similarity as llm_sim


def test_gopher_repetition_flags_synthetic_repeats(spark):
    """A doc that is one 3-gram repeated must fail the top-3-gram rule;
    a doc of all-distinct words must pass everything."""
    docs = spark.createDataFrame(
        [
            (1, ("the cat sat " * 30).strip()),
            (2, " ".join(f"w{i}" for i in range(90))),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in llm_cur.gopher_repetition(docs).collect()}
    assert not out[1]["pass_top_3gram"]
    assert not out[1]["pass_repetition"]
    # dup 5-grams cover ~everything in the repeated doc
    assert out[1]["dup_5gram_frac"] > 0.9
    assert out[2]["pass_repetition"]
    assert out[2]["dup_5gram_frac"] == 0.0


def test_gopher_repetition_short_doc_edges(spark):
    docs = spark.createDataFrame([(1, "only one"), (2, "solo")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in llm_cur.gopher_repetition(docs).collect()}
    # 1 token: no n-grams at all -> all fractions 0, vacuous pass
    assert out[2]["top_2gram_frac"] == 0.0
    assert out[2]["pass_repetition"]
    # 2 tokens: the single bigram covers 100% of the chars -> frac 1.0.
    # That (correctly) fails the 0.20 threshold; the published gate
    # runs these rules after the 50-word minimum, so tiny docs never
    # reach them in a real pipeline.
    assert out[1]["top_2gram_frac"] == 1.0
    assert not out[1]["pass_repetition"]


def test_semantic_decontamination_only_cross_split_pairs(spark, sf_dir):
    """Every reported (eval, train) pair must actually cross the md5
    split, and every eval-side near-dup with a train partner must be
    reported — no pair invented, none dropped."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = llm_sim.embedding_neardup(emb)
    out = llm_sim.semantic_decontamination(emb, pairs).collect()
    is_eval = {
        r["vec_id"]: r["flag"]
        for r in emb.select(
            "vec_id",
            (
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("vec_id").cast("string"),
                            F.lit(llm_sim.SEMDECON_SALT),
                        )
                    ),
                    1,
                    1,
                )
                < llm_sim.SEMDECON_EVAL_HEX
            ).alias("flag"),
        ).collect()
    }
    expected = {}
    for p in pairs.collect():
        a, b = p["a_id"], p["b_id"]
        if is_eval[a] != is_eval[b]:
            ev = a if is_eval[a] else b
            expected.setdefault(ev, []).append(p["cosine"])
    assert {r["eval_id"] for r in out} == set(expected)
    for r in out:
        assert is_eval[r["eval_id"]]
        assert not is_eval[r["top_train_id"]]
        assert r["n_train_neardups"] == len(expected[r["eval_id"]])
        assert r["top_cosine"] == max(expected[r["eval_id"]])
