"""Round-10 operator contracts: the graph-ANN beam search (recall
floor, determinism, graph degree bound, exact-oracle parity at test
scale) and the k-means seeding exact-integer-Φ rewrite."""

from __future__ import annotations

from logistics_data_pipeline_spark.adapters.testdata import load_table
from logistics_data_pipeline_spark.llm import similarity as llm_sim


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_knn_graph_beam_recall_floor(spark, sf_dir):
    """Beam search over the kNN graph must reach recall@5 ≥ 0.9 against
    exact brute force at test scale (the same floor style the IVF /
    IVF-PQ / SRP paths pin via tools/ann_eval.py). The graph-ANN paper
    claim is near-exact recall at sub-linear probe cost; 0.9 leaves
    room for the fixed entry point on a small corpus."""
    emb = _emb(spark, sf_dir)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in llm_sim.knn_bruteforce(emb).collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in llm_sim.knn_graph_beam(emb).collect()
    }
    assert truth, "brute force returned nothing"
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9, f"graph-beam recall@5 {recall:.3f} < 0.9"


def test_knn_graph_beam_is_deterministic(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    a = [tuple(r) for r in llm_sim.knn_graph_beam(emb).collect()]
    b = [tuple(r) for r in llm_sim.knn_graph_beam(emb).collect()]
    assert a == b and len(a) > 0


def test_knn_graph_degree_bound(spark, sf_dir):
    """Symmetrized graph: out-degree ≤ 2m (top-m out-edges plus at most
    m distinct reverse edges per vertex)."""
    from pyspark.sql import functions as F

    corpus = _emb(spark, sf_dir).filter(F.col("vec_id") >= 10)
    g = llm_sim._knn_graph(corpus)
    deg = g.groupBy("src").agg(F.count("*").alias("d"))
    mx = deg.agg(F.max("d")).collect()[0][0]
    assert mx <= 2 * llm_sim.NSW_M, mx
    # symmetric: every edge's reverse exists
    rev = g.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    assert g.exceptAll(rev).limit(1).count() == 0


def test_knn_graph_beam_visits_strict_subset_of_corpus(spark, sf_dir):
    """The point of graph ANN: the search must NOT have scored the
    whole corpus (otherwise it is brute force with extra steps). The
    visited_out hook (ADVICE r10 — the old version of this test was
    vacuous) exposes the scored set; with a narrowed beam the bound
    entry + rounds · beam · 2m is far below even the sf0.001 corpus."""
    from pyspark.sql import functions as F

    emb = _emb(spark, sf_dir)
    n_corpus = emb.filter("vec_id >= 10").count()
    beam, m, rounds = 4, 4, 2
    cap = 1 + rounds * beam * 2 * m
    assert cap < n_corpus, "narrow the beam params: the bound is vacuous"
    sink: list = []
    out = llm_sim.knn_graph_beam(
        emb, beam=beam, m=m, rounds=rounds, visited_out=sink
    )
    assert out.count() > 0
    (visited,) = sink
    per_query = visited.groupBy("query_id").agg(
        F.countDistinct("vec_id").alias("n_visited")
    )
    mx = per_query.agg(F.max("n_visited")).collect()[0][0]
    assert 0 < mx <= cap < n_corpus, (mx, cap, n_corpus)


def test_kmeans_phi_is_exact_integer_total(spark, sf_dir):
    """The seeding Φ must equal the exact integer micro-unit total of
    the 6-dp first-seed distances (ADVICE r9: no float accumulation
    order anywhere in the prefix distribution)."""
    from pyspark.sql import functions as F

    emb = _emb(spark, sf_dir)
    seeds = llm_sim.kmeanspp_init(emb).collect()
    first = seeds[0]
    assert first.phi_before is None
    v = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in emb.select("vec_id", "embedding").collect()
    }
    s1 = v[first.vec_id]
    micro = 0
    for vec in v.values():
        d = round(sum((a - b) * (a - b) for a, b in zip(vec, s1)), 6)
        micro += int(round(d * 1e6))
    # phi_before of seed 2 is the potential BEFORE that pick = the
    # first-seed distance total
    assert seeds[1].phi_before == round(micro / 1e6, 6)


def test_nn_descent_graph_edge_recall_vs_exact(spark, sf_dir):
    """Three NN-descent rounds from the md5-ring init must recover
    most of the exact top-k graph — the paper's claim (~90%+ in a
    handful of iterations) scaled to the floor the suite can pin on
    clustered test embeddings."""
    from pyspark.sql import functions as F

    emb = _emb(spark, sf_dir)
    got = {
        (r.src, r.dst) for r in llm_sim.nn_descent_graph(emb).collect()
    }
    scored = llm_sim.embedding_neardup(
        emb.filter(F.col("vec_id") >= 10), threshold=-1.0
    )
    both = scored.select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst"), "cosine"
    ).unionByName(
        scored.select(
            F.col("b_id").alias("src"), F.col("a_id").alias("dst"), "cosine"
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("src").orderBy(F.desc("cosine"), F.asc("dst"))
    exact = {
        (r.src, r.dst)
        for r in both.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= llm_sim.NND_K)
        .collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.85, f"NN-descent edge recall {recall:.3f} < 0.85"


def test_nn_descent_graph_feeds_beam_search(spark, sf_dir):
    """Composition: beam search over the NN-DESCENT graph (symmetrized,
    like the serving asset) must still clear the recall floor — the
    actual 100 TB deployment shape (approximate build + graph serve),
    mirroring the kmeans||→++ composition test."""
    from pyspark.sql import functions as F

    emb = _emb(spark, sf_dir)
    nd = llm_sim.nn_descent_graph(emb).select("src", "dst")
    graph = nd.unionByName(
        nd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    truth = {
        (r.query_id, r.neighbor_id)
        for r in llm_sim.knn_bruteforce(emb).collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in llm_sim.knn_graph_beam(emb, graph=graph).collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.85, f"beam-over-NN-descent recall {recall:.3f} < 0.85"
