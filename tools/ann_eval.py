"""ANN quality harness: recall@k of every approximate index vs the
exact brute-force baseline, on the driver testdata.

Usage:
    python tools/ann_eval.py [sf_dir]     # default /root/testdata/sf0.01

Prints one line per (index, config): recall@5 over the 10 standard
query vectors, plus candidate-set sizes where meaningful. Deterministic
(seeded quantizers / hyperplanes), so these numbers are reproducible.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logistics_data_pipeline_spark.adapters.testdata import load_table  # noqa: E402
from logistics_data_pipeline_spark.llm import similarity as sim  # noqa: E402
from logistics_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("ann-eval")
    emb = load_table(spark, sf_dir, "embeddings")
    truth = {
        (r.query_id, r.neighbor_id) for r in sim.knn_bruteforce(emb).collect()
    }

    def recall(df) -> float:
        got = {(r.query_id, r.neighbor_id) for r in df.collect()}
        return len(got & truth) / len(truth)

    rows = [
        ("bruteforce (exact baseline)", 1.0),
        ("ivf-flat kmeans16 nprobe=3", recall(sim.knn_ivf(emb, nprobe=3))),
        ("ivf-flat kmeans16 nprobe=8", recall(sim.knn_ivf(emb, nprobe=8))),
        ("ivf-flat labels nprobe=3", recall(sim.knn_ivf_labels(emb, nprobe=3))),
        ("ivf-pq 16x4bit nprobe=8", recall(sim.knn_ivfpq(emb))),
        ("ivf-pq 32x4bit nprobe=8", recall(sim.knn_ivfpq(emb, n_subspaces=32))),
        (
            f"graph-beam m={sim.NSW_M} b={sim.NSW_BEAM} t={sim.NSW_ROUNDS}",
            recall(sim.knn_graph_beam(emb)),
        ),
        (
            f"graph-beam layered t={sim.NSW_LAYERED_ROUNDS}",
            recall(
                sim.knn_graph_beam(
                    emb, rounds=sim.NSW_LAYERED_ROUNDS, layered=True
                )
            ),
        ),
        (
            f"graph-beam pq {sim.NSW_PQ_SUB}x{sim.NSW_PQ_CELLS} "
            f"b={sim.NSW_PQ_BEAM} rr={sim.NSW_PQ_RERANK}",
            recall(sim.knn_graph_beam_pq(emb)),
        ),
    ]
    for name, r in rows:
        print(f"{name:32s} recall@5 = {r:.3f}")

    exact_pairs = sim.embedding_neardup(emb, 0.35).count()
    lsh_pairs = sim.embedding_neardup_lsh(emb, 0.35).count()
    print(
        f"{'srp-lsh near-dup @0.35':32s} pair recall = "
        f"{lsh_pairs / exact_pairs:.3f} ({lsh_pairs}/{exact_pairs})"
    )
    prefix_pairs = sim.embedding_neardup_prefix(emb, 0.35).count()
    print(
        f"{'matryoshka-prefix near-dup @0.35':32s} pair recall = "
        f"{prefix_pairs / exact_pairs:.3f} ({prefix_pairs}/{exact_pairs})"
    )


if __name__ == "__main__":
    main()
