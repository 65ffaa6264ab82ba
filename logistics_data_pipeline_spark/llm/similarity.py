"""Similarity search over embedding columns (driver mandate): exact
brute-force cosine top-k as the correctness baseline, and an IVF
(inverted-file) variant as the scale path.

Scale design (100 TB / billions of vectors):
* Brute force is O(queries × corpus) — correct, and fine when the query
  side is small and broadcast; every executor scans only its slice of
  the corpus (no shuffle of the big side, one TakeOrdered per query).
* IVF: coarse-quantize the corpus (here: per-label centroids — the
  labels play the role of k-means cells; at scale run k-means on a
  sample), then probe only the nprobe closest cells — the classic
  recall/throughput trade.
* Cosine math is done JVM-side with higher-order functions (zip_with +
  aggregate) in DOUBLE; similarities are rounded to 6 dp before ranking
  so Spark's and DuckDB's last-ulp summation differences cannot flip
  the ordering; ties break on vec_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def vector_norms(emb: DataFrame) -> DataFrame:
    """Per-vector L2 norm + dimensionality (oracle-checkable vector math)."""
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(_norm(F.col("embedding")), 6).alias("l2_norm"),
    )


VECTOR_NORMS_SQL = """
SELECT vec_id,
       CAST(len(embedding) AS INT) AS dim,
       ROUND(sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm
FROM embeddings
""".strip()


def knn_bruteforce(
    emb: DataFrame, n_queries: int = 10, k: int = 5
) -> DataFrame:
    """Exact top-k cosine neighbors for query vectors (vec_id <
    n_queries) over the rest of the corpus. The query side is broadcast;
    the corpus is scanned in place — no corpus shuffle."""
    queries = F.broadcast(
        emb.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
        )
    )
    candidates = emb.filter(F.col("vec_id") >= n_queries).select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c")
    )
    scored = queries.crossJoin(candidates).select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot(F.col("q"), F.col("c")) / (_norm(F.col("q")) * _norm(F.col("c"))),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


KNN_BRUTEFORCE_SQL = """
SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                      CAST(c.embedding AS DOUBLE[])), 6) AS cosine,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                                 CAST(c.embedding AS DOUBLE[])), 6) DESC,
                    c.vec_id ASC) AS rank
  FROM embeddings q JOIN embeddings c ON c.vec_id >= 10 AND q.vec_id < 10
)
WHERE rank <= 5
""".strip()


def knn_ivf(
    emb: DataFrame, n_queries: int = 10, k: int = 5, nprobe: int = 3
) -> DataFrame:
    """IVF approximate top-k: per-label centroids as coarse cells; each
    query probes only its nprobe nearest cells. Same output shape as
    brute force (approximate recall — rows-only driver check)."""
    # centroids: mean per (label, dimension) — posexplode + groupBy is
    # the scalable way to average vectors without collecting them
    pos = emb.select(
        "label", F.posexplode("embedding").alias("pos", "v")
    )
    centroid_rows = (
        pos.groupBy("label", "pos")
        .agg(F.avg(F.col("v").cast("double")).alias("m"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select(
            "label", F.transform(F.col("pm"), lambda s: s["m"]).alias("centroid")
        )
    )
    centroids = F.broadcast(centroid_rows)

    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    # assign each query to its nprobe closest centroids
    q_cells = (
        queries.crossJoin(centroids)
        .select(
            "query_id",
            "q",
            "label",
            (
                _dot(F.col("q"), F.col("centroid"))
                / (_norm(F.col("q")) * _norm(F.col("centroid")))
            ).alias("cell_sim"),
        )
        .withColumn(
            "cell_rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("cell_sim"), F.asc("label")
                )
            ),
        )
        .filter(F.col("cell_rank") <= nprobe)
        .select("query_id", "q", "label")
    )
    candidates = emb.filter(F.col("vec_id") >= n_queries).select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c"), "label"
    )
    scored = F.broadcast(q_cells).join(candidates, "label").select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot(F.col("q"), F.col("c")) / (_norm(F.col("q")) * _norm(F.col("c"))),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_neardup(emb: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-duplicate pairs. Exact all-pairs above a
    threshold; at 100 TB scale the same output is produced by LSH
    bucketing first — here the corpus side stays partitioned and only
    pairs in the upper triangle are scored."""
    a = emb.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("vb"))
    pairs = a.join(b, F.col("a_id") < F.col("b_id")).select(
        "a_id",
        "b_id",
        F.round(
            _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb"))),
            6,
        ).alias("cosine"),
    )
    return pairs.filter(F.col("cosine") >= threshold).orderBy("a_id", "b_id")


EMBEDDING_NEARDUP_SQL = """
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])), 6) >= 0.95
ORDER BY a_id, b_id
""".strip()
