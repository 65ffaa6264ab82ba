"""Structured Streaming ingest leg: events → bronze parquet.

Reference chain (SURVEY.md §2.1 S3–S5, §2.9): Kafka consumer polls,
buffers 50 records, writes each buffer as one parquet file to s3://bronze.
Idiomatic Spark re-expression:

* Kafka source → ``from_json`` over the wire schema → parquet sink with
  checkpointing (exactly-once file sink vs the reference's
  at-least-once + load-time dedup).
* The reference's 60-second bounded run (``--duration 60`` in the hourly
  DAG) maps to ``trigger(availableNow=True)``: drain what's there, stop.
* Count-based 50-row batching has no Spark trigger equivalent
  (SURVEY.md §2.9); ``foreachBatch`` + re-chunking reproduces the file
  layout when needed — only table contents matter semantically.
* ``dropDuplicates`` on event_id inside the stream gives in-flight
  dedup; the load-time anti-join (sources/bronze.py) remains canonical.

The file-source variant is fully testable in this container; the Kafka
variant needs the spark-sql-kafka package + a broker and is config-gated
(same plan shape, different source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..schemas import WIRE_EVENT_SCHEMA


def file_stream_source(
    spark: SparkSession, json_dir: str, max_files: int = 4
) -> DataFrame:
    """File-based stream of JSON event payloads (testable stand-in for
    the Kafka topic; same wire schema)."""
    return (
        spark.readStream.schema(WIRE_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .json(json_dir)
    )


def kafka_source_options(bootstrap: str, topic: str = "logistics-events") -> dict[str, str]:
    """The exact option map the Kafka source is built with (reference
    consumer_to_minio.py:18-22: earliest offsets, one subscribed topic).
    Split out so the contract is testable without a broker or the
    spark-sql-kafka package (VERDICT r2 #9)."""
    return {
        "kafka.bootstrap.servers": bootstrap,
        "subscribe": topic,
        "startingOffsets": "earliest",
    }


def decode_wire(raw: DataFrame) -> DataFrame:
    """The ONE post-source decode both transports share: JSON-parse the
    ``value`` column against the wire schema, drop corrupt payloads
    (null structs — reference logs-and-skips,
    consumer_to_minio.py:94-97), flatten. The Kafka leg and the
    file-replay leg both route through this function, so their plans
    are identical above the source relation —
    tests/test_streaming_llm.py pins that plan equality, which is the
    strongest broker-free check this container allows (VERDICT r5 #7)."""
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), WIRE_EVENT_SCHEMA).alias("e")
    )
    # PERMISSIVE from_json maps a corrupt payload to a struct of nulls
    # (not a null struct); a valid wire event always carries event_id,
    # so that is the corrupt marker — same rule as drop_corrupt.
    return parsed.filter(
        F.col("e").isNotNull() & F.col("e.event_id").isNotNull()
    ).select("e.*")


def kafka_stream_source(
    spark: SparkSession, bootstrap: str, topic: str = "logistics-events"
) -> DataFrame:
    """Kafka source (reference consumer_to_minio.py:18-22): earliest
    offsets, JSON value decode via the shared ``decode_wire`` graph."""
    raw = (
        spark.readStream.format("kafka")
        .options(**kafka_source_options(bootstrap, topic))
        .load()
    )
    return decode_wire(raw)


def text_replay_source(spark: SparkSession, json_dir: str) -> DataFrame:
    """Dockerless Kafka stand-in: stream the topic's JSON payloads from
    text files as a ``value`` column — the same shape the Kafka source
    emits — then decode through the IDENTICAL ``decode_wire`` graph.
    Unlike ``file_stream_source`` (schema'd JSON reader), this replays
    the byte-payload decode path itself."""
    raw = spark.readStream.text(json_dir)
    return decode_wire(raw)


def drop_corrupt(events: DataFrame) -> DataFrame:
    """PERMISSIVE-mode JSON decode turns corrupt payloads into all-null
    rows (the reference logs-and-skips them, consumer_to_minio.py:94-97);
    a valid wire event always carries event_id, so null-id rows are the
    corrupt ones."""
    return events.filter(F.col("event_id").isNotNull())


def bronze_sink(
    events: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    dedup: bool = True,
    available_now: bool = True,
    watermark: str | None = None,
    event_time_col: str = "timestamp",
) -> StreamingQuery:
    """Write the event stream to bronze parquet with checkpointed
    exactly-once semantics; availableNow reproduces the bounded-run DAG
    mode.

    ``watermark`` switches in-flight dedup from ``dropDuplicates``
    (state grows with every event_id ever seen — fine for a bounded
    run, fatal for a perpetual 100 TB stream) to
    ``dropDuplicatesWithinWatermark`` (state bounded to the lateness
    horizon; correct as long as duplicates arrive within it, which
    Kafka redeliveries do)."""
    if dedup:
        if watermark is not None:
            events = events.withColumn(
                "__event_time", F.to_timestamp(F.col(event_time_col))
            )
            events = events.withWatermark("__event_time", watermark)
            events = events.dropDuplicatesWithinWatermark(["event_id"]).drop(
                "__event_time"
            )
        else:
            events = events.dropDuplicates(["event_id"])
    writer = (
        events.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def micro_batch_sink(
    events: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    rows_per_file: int = 50,
) -> StreamingQuery:
    """foreachBatch sink re-chunking each micro-batch into ~50-row files
    — byte-layout parity with the reference's count-based batching
    (BATCH_SIZE=50, consumer_to_minio.py:33) when file layout matters."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        n = batch_df.count()
        if n == 0:
            return
        files = max(1, (n + rows_per_file - 1) // rows_per_file)
        batch_df.repartition(files).write.mode("append").parquet(out_dir)

    return (
        events.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def upsert_sink(stream: DataFrame, table_dir: str, checkpoint_dir: str, key: str = "event_id"):
    """Exactly-once streaming MERGE into a keyed parquet table via
    ``foreachBatch`` + atomic version swap — the CDC-apply leg
    (reference's warehouse upsert, streaming-shaped).

    Each micro-batch merges into the current table version with
    ``merge_upsert`` (anti-join + union, one key shuffle) and writes a
    NEW version directory named by batch_id, then atomically repoints a
    ``_CURRENT`` marker (write-temp + os.replace). Idempotent by
    batch_id — exactly the contract foreachBatch requires for
    exactly-once sinks without a transactional table format. Two replay
    windows exist after a crash, and both are handled:

    * crash BEFORE the marker repoint: the replayed batch re-merges
      against the previous version and overwrites its own (possibly
      partial) version directory — safe, versions never overwrite the
      directory they read from;
    * crash AFTER the repoint but before the streaming checkpoint
      commits: the marker already names this batch's version, so the
      merge is already applied; re-running it would make Spark
      overwrite the very path it is reading (runtime error, wedged
      query). Detected by comparing the marker to ``version_dir`` and
      skipped outright.

    With Delta/Iceberg this collapses to a native ``MERGE INTO``;
    semantics are identical. Marker I/O goes through ``pathio`` so the
    same sink runs over local disk or an s3a:// bucket (the marker
    commit is a POSIX rename locally, a single atomic PUT there)."""
    from ..sources.bronze import merge_upsert
    from . import pathio

    marker = pathio.join(table_dir, "_CURRENT")

    def _apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        current = pathio.read_text(spark, marker)
        current = current.strip() if current else None
        version_dir = pathio.join(table_dir, f"v{batch_id:020d}")
        if current == version_dir and pathio.is_dir(spark, version_dir):
            return  # batch already fully applied; replay after marker repoint
        if current and pathio.is_dir(spark, current):
            merged = merge_upsert(spark.read.parquet(current), batch, key)
        else:
            merged = batch
        merged.write.mode("overwrite").parquet(version_dir)
        pathio.write_text_atomic(spark, marker, version_dir)

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_upsert_table(spark, table_dir: str) -> DataFrame:
    """Read the current version of an ``upsert_sink`` table."""
    from . import pathio

    marker = pathio.join(table_dir, "_CURRENT")
    current = pathio.read_text(spark, marker)
    if current is None:
        raise FileNotFoundError(marker)
    return spark.read.parquet(current.strip())


def rollup_sink(
    stream: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    time_col: str = "timestamp",
) -> StreamingQuery:
    """Continuous-aggregate maintenance (the hypertable-rollup shape):
    each micro-batch reduces to per-minute partial aggregates, which
    MERGE ADDITIVELY into a versioned rollup table — counts and sums
    add, so the maintained table always equals the batch GROUP BY of
    everything ingested (a stream==batch test pins this), without ever
    re-reading raw history.

    Scale: the batch side reduces BEFORE the merge (map-side partials
    → one tiny per-minute frame), and the merge joins aggregate-to-
    aggregate on the minute key — state is the rollup's cardinality
    (minutes), not the event volume. Exactly-once by batch_id with the
    same versioned-directory + _CURRENT marker discipline (and the
    same two crash-replay windows) as ``upsert_sink``; with
    Delta/Iceberg this collapses to MERGE INTO with += updates."""
    from . import pathio

    marker = pathio.join(table_dir, "_CURRENT")

    def _apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        partial = (
            batch.withColumn("minute", F.date_trunc("minute", F.to_timestamp(F.col(time_col))))
            .groupBy("minute")
            .agg(
                F.count("*").cast("bigint").alias("n_events"),
                F.sum(F.col("weight_kg").cast("double")).alias("sum_weight"),
            )
        )
        current = pathio.read_text(spark, marker)
        current = current.strip() if current else None
        version_dir = pathio.join(table_dir, f"v{batch_id:020d}")
        if current == version_dir and pathio.is_dir(spark, version_dir):
            return  # replay after marker repoint: already applied
        if current and pathio.is_dir(spark, current):
            prev = spark.read.parquet(current)
            merged = (
                prev.unionByName(partial)
                .groupBy("minute")
                .agg(
                    F.sum("n_events").cast("bigint").alias("n_events"),
                    F.sum("sum_weight").alias("sum_weight"),
                )
            )
        else:
            merged = partial
        merged.write.mode("overwrite").parquet(version_dir)
        pathio.write_text_atomic(spark, marker, version_dir)

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def dedup_corpus_sink(
    stream: DataFrame,
    corpus_dir: str,
    checkpoint_dir: str,
    key_col: str = "doc_id",
    text_col: str = "text",
):
    """Continuous dedup-corpus maintenance: the LLM curation pipeline's
    ingest leg as a stream. Each micro-batch of documents is deduped
    WITHIN the batch (first arrival per content hash wins) and AGAINST
    everything already ingested (left-anti on the corpus hash set),
    and only the surviving rows are appended as a new immutable part —
    the streaming twin of ``llm.dedup.incremental_dedup``'s verdict
    logic, with the NEW rows committed instead of reported.

    Storage layout is append-only + manifest (the scalable shape — the
    upsert sink's rewrite-the-table versioning would make every batch
    O(corpus)): each batch writes ONLY its kept rows to an immutable
    part directory, and a ``_MANIFEST`` file listing committed parts is
    repointed atomically (write-temp + ``os.replace``). Exactly-once by
    batch_id: a replayed batch whose part is already in the manifest
    short-circuits; a crash before the manifest append leaves an
    orphan part directory that the replay simply overwrites. At 100 TB
    this is a metadata-layer table format in miniature — with
    Delta/Iceberg the manifest becomes the transaction log and the
    anti-join's corpus side becomes an incrementally-maintained hash
    index instead of a manifest-union scan."""
    import hashlib

    from . import pathio

    manifest = pathio.join(corpus_dir, "_MANIFEST")
    # foreachBatch replay identity is (query, batch_id), not batch_id
    # alone — two different queries appending to the same corpus both
    # start at batch 0, so parts are namespaced by the checkpoint (the
    # query's durable identity): a replay of the SAME query+batch
    # short-circuits, a new query's batch 0 appends.
    qid = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:8]

    def _apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        pathio.make_dirs(spark, corpus_dir)
        txt = pathio.read_text(spark, manifest) or ""
        parts = [ln.strip() for ln in txt.splitlines() if ln.strip()]
        part_dir = pathio.join(corpus_dir, f"{qid}-b{batch_id:020d}")
        if part_dir in parts:
            return  # replay after commit: batch already in the corpus
        hashed = batch.withColumn("text_hash", F.md5(F.col(text_col)))
        w = Window.partitionBy("text_hash").orderBy(key_col)
        first_in_batch = (
            hashed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if parts:
            corpus_hashes = (
                spark.read.parquet(*parts).select("text_hash").distinct()
            )
            kept = first_in_batch.join(corpus_hashes, "text_hash", "left_anti")
        else:
            kept = first_in_batch
        kept.write.mode("overwrite").parquet(part_dir)
        pathio.write_text_atomic(
            spark, manifest, "\n".join([*parts, part_dir]) + "\n"
        )

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_dedup_corpus(spark, corpus_dir: str) -> DataFrame:
    """Read the committed dedup corpus (union of manifest parts)."""
    from . import pathio

    manifest = pathio.join(corpus_dir, "_MANIFEST")
    txt = pathio.read_text(spark, manifest)
    if txt is None:
        raise FileNotFoundError(manifest)
    parts = [ln.strip() for ln in txt.splitlines() if ln.strip()]
    return spark.read.parquet(*parts)
