"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched pandas functions (driver mandate).

The container has no image/audio codecs, so the *decode* steps are
stubbed (clearly marked) behind deterministic fakes — but everything
Spark-side is real and tested: the schema (BinaryType content + struct
metadata), the ``mapInPandas`` batch shape, partitioning, and the
Arrow transfer. Swapping the stub body for Pillow/librosa/ffmpeg calls
changes no plumbing.

Scale notes: media blobs ride as parquet binary columns; decode/feature
extraction is embarrassingly parallel via mapInPandas (one Arrow batch
per task, no shuffle); repartition by media_id only when a downstream
stage needs co-location.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("source", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("mime", T.StringType()),
    ]
)


def docs_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as an opaque binary payload —
    exercises the binary-column path on real driver testdata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.col("source").alias("source"),
            F.length(F.col("text")).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(content: bytes) -> object:
    """STUB: image decode requires a codec library not present in this
    container. The Spark-side plumbing (binary column → mapInPandas →
    feature rows) is real; replace this body with PIL.Image.open."""
    raise NotImplementedError(
        "image decode stubbed: no codec libraries in this container"
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The per-batch body is where a real decoder would run (see
    ``decode_image``); the deterministic stand-in computes byte length
    and an MD5 checksum so outputs are verifiable against an oracle.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "checksum": pdf["content"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "mime": pdf["meta"].map(lambda m: m["mime"]),
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def multimodal_extract(docs: DataFrame) -> DataFrame:
    """documents → binary media → Arrow-batched feature extraction."""
    return extract_features(docs_as_media(docs))


# Oracle: the deterministic fake features are SQL-expressible, so even
# the pandas-UDF path gets a full value-hash check (text is ASCII in the
# testdata; octet_length(blob) == md5-able bytes).
MULTIMODAL_EXTRACT_SQL = """
SELECT doc_id AS media_id,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
       md5(text) AS checksum,
       'text/plain' AS mime
FROM documents
""".strip()
