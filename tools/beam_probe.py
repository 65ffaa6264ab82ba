"""Search-only graph-ANN probe (VERDICT r11 #2).

SCALING_r11's layered-vs-plain rows each included a from-scratch graph
build (``graph=None``), so they never isolated the quantity the layered
variant exists for: SEARCH latency over an already-built index. This
probe builds (and localCheckpoints) the ``nsw_graph`` asset ONCE per
decade, then times ``knn_graph_beam`` plain (6 rounds) vs layered
(4 rounds + sqrt-n entry layer) search-only, min over ``--reps`` runs.

Usage:
    python tools/beam_probe.py [--sf DIR ...] [--reps 3]

Output: one JSON line per decade
    {"sf": dir, "n_corpus": n, "build_sec": t,
     "plain_sec": t, "layered_sec": t, "plain_rows": n, "layered_rows": n}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from logistics_data_pipeline_spark.adapters.testdata import load_table  # noqa: E402
from logistics_data_pipeline_spark.llm import similarity as sim  # noqa: E402
from logistics_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", nargs="+", default=[".scratch/sf1", ".scratch/sf10"])
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark("beam_probe")
    for sf_dir in args.sf:
        emb = load_table(spark, sf_dir, "embeddings").localCheckpoint(eager=True)
        corpus = emb.filter(F.col("vec_id") >= sim.NSW_N_QUERIES)
        n_corpus = corpus.count()
        t0 = time.time()
        graph = sim._knn_graph(corpus, sim.NSW_M).localCheckpoint(eager=True)
        graph.count()
        build_sec = round(time.time() - t0, 1)

        t0 = time.time()
        books = sim.beam_pq_books(emb)
        codes = sim.pq_assign_packed(
            corpus, sim._books_tensor(books)
        ).localCheckpoint(eager=True)
        codes.count()
        pq_build_sec = round(time.time() - t0, 1)

        out = {
            "sf": sf_dir,
            "n_corpus": n_corpus,
            "build_sec": build_sec,
            "pq_build_sec": pq_build_sec,
        }
        for name, fn in (
            ("plain", lambda: sim.knn_graph_beam(emb, graph=graph)),
            (
                "layered",
                lambda: sim.knn_graph_beam(
                    emb,
                    graph=graph,
                    layered=True,
                    rounds=sim.NSW_LAYERED_ROUNDS,
                ),
            ),
            (
                "pq",
                lambda: sim.knn_graph_beam_pq(
                    emb, graph=graph, books=books, codes=codes
                ),
            ),
            (
                "pq_layered",
                lambda: sim.knn_graph_beam_pq(
                    emb,
                    graph=graph,
                    books=books,
                    codes=codes,
                    layered=True,
                    rounds=sim.NSW_LAYERED_ROUNDS,
                ),
            ),
        ):
            times, rows = [], None
            for _ in range(args.reps):
                t0 = time.time()
                rows = fn().count()
                times.append(time.time() - t0)
            out[f"{name}_sec"] = round(min(times), 2)
            out[f"{name}_rows"] = rows
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
