"""Structured Streaming ingest leg (file source → bronze parquet with
checkpointed dedup) and LLM extension operator behaviors."""

from __future__ import annotations

import json

from logistics_data_pipeline_spark.llm.dedup import (
    exact_dedup,
    neardup_minhash,
    neardup_ngram,
    simhash,
)
from logistics_data_pipeline_spark.llm.multimodal import multimodal_extract
from logistics_data_pipeline_spark.llm.similarity import knn_bruteforce, knn_ivf
from logistics_data_pipeline_spark.streaming.ingest import (
    bronze_sink,
    file_stream_source,
    micro_batch_sink,
)

WIRE_ROW = {
    "event_id": "e1",
    "order_id": "o1",
    "timestamp": "2024-01-05T08:00:00",
    "status": "In Transit",
    "origin": "A, C1",
    "destination": "B, C2",
    "carrier_name": "DHL",
    "latitude": 10.0,
    "longitude": 20.0,
    "weight_kg": 5.0,
    "estimated_delivery": "2024-01-07",
}


def _write_json(dirpath, name, rows):
    p = dirpath / name
    p.write_text("\n".join(json.dumps(r) for r in rows))


def test_file_stream_to_bronze_with_dedup(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    rows = [dict(WIRE_ROW, event_id=f"e{i}") for i in range(10)]
    _write_json(src, "a.json", rows[:6])
    # duplicate e4/e5 across files: stream dedup must drop them
    _write_json(src, "b.json", rows[4:])
    out, ckpt = str(tmp_path / "bronze"), str(tmp_path / "ckpt")
    q = bronze_sink(file_stream_source(spark, str(src)), out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 10
    assert got.select("event_id").distinct().count() == 10
    # restart with no new files: checkpoint prevents reprocessing
    q2 = bronze_sink(file_stream_source(spark, str(src)), out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == 10


def test_micro_batch_sink_rechunks_to_50_row_files(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    _write_json(src, "a.json", [dict(WIRE_ROW, event_id=f"e{i}") for i in range(120)])
    out, ckpt = str(tmp_path / "bronze"), str(tmp_path / "ckpt")
    q = micro_batch_sink(file_stream_source(spark, str(src)), out, ckpt)
    q.awaitTermination(120)
    df = spark.read.parquet(out)
    assert df.count() == 120


def test_exact_dedup_groups(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "x y z")], ["doc_id", "text"]
    )
    got = {r.keeper_doc_id: r.n_copies for r in exact_dedup(docs).collect()}
    assert got == {1: 2, 3: 1}


def test_neardup_ngram_finds_shifted_copy(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(1, base), (2, base + " tail"), (3, "totally different words here now")],
        ["doc_id", "text"],
    )
    pairs = {(r.a_id, r.b_id): r.jaccard for r in neardup_ngram(docs, 0.5).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.8
    assert all(3 not in p for p in pairs)


def test_neardup_ngram_df_cap_bounds_hot_shingle_fanout(spark):
    """Adversarial corpus: every doc shares one boilerplate phrase. With
    the DF cap the hot shingles never enter the pair join (bounded
    fan-out instead of |postings|² rows), so docs related ONLY through
    boilerplate emit no pair; genuinely near-identical docs still pair
    via their discriminative shingles."""
    boiler = "all rights reserved by the publisher"
    n_docs = 40
    rows = [(i, f"{boiler} unique{i} filler{i} token{i} end{i}") for i in range(n_docs)]
    # two true near-dups sharing discriminative content beyond the boilerplate
    rows += [(100, boiler + " alpha beta gamma delta epsilon zeta"),
             (101, boiler + " alpha beta gamma delta epsilon eta")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r.a_id, r.b_id) for r in neardup_ngram(docs, 0.3, max_df=10).collect()}
    assert got == {(100, 101)}
    # uncapped, the boilerplate shingles pair every doc with every other
    uncapped = neardup_ngram(docs, 0.3, max_df=10**9).count()
    assert uncapped > len(got)


def test_minhash_agrees_with_exact_on_clear_cases(spark):
    base = " ".join(f"w{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, base), (2, base + " extra"), (3, " ".join(f"z{i}" for i in range(60)))],
        ["doc_id", "text"],
    )
    got = {(r.a_id, r.b_id) for r in neardup_minhash(docs, 0.7).collect()}
    assert got == {(1, 2)}


def test_neardup_components_transitive_chain(spark):
    """d1~d2 and d2~d3 pair up but d1~d3 does not — the component still
    unifies all three (label propagation transitivity); d4 is alone."""
    from logistics_data_pipeline_spark.llm.dedup import neardup_components

    w = [f"w{i}" for i in range(40)]
    docs = spark.createDataFrame(
        [
            (1, " ".join(w[0:28])),
            (2, " ".join(w[5:33])),
            (3, " ".join(w[10:38])),
            (4, " ".join(f"z{i}" for i in range(30))),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.component for r in neardup_components(docs, 0.6).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4}


def test_simhash_identical_docs_same_signature(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta epsilon zeta")],
        ["doc_id", "text"],
    )
    sigs = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[3]


def test_simhash_bands_pigeonhole_hamming_close_pairs_share_bucket(spark):
    """The banding guarantee the % 1024 bucket lacked (VERDICT r2 #4):
    any signature pair at hamming distance <= bands-1 must share at
    least one band key. Near-identical long docs (one token swapped)
    flip few majority bits, so the crafted corpus contains real
    1 <= hamming <= 5 pairs; identical docs share ALL bands."""
    base = [f"tok{i}" for i in range(120)]
    rows = [(0, " ".join(base)), (1, " ".join(base))]
    for d in range(2, 8):
        mutated = list(base)
        for j in range(d - 1):  # swap d-1 tokens -> increasing distance
            mutated[j * 7] = f"swap{d}_{j}"
        rows.append((d, " ".join(mutated)))
    out = {r.doc_id: (r.simhash, set(r.simhash_bands)) for r in simhash(
        spark.createDataFrame(rows, ["doc_id", "text"])
    ).collect()}
    assert out[0][1] == out[1][1]  # identical docs: all 6 bands equal
    close_pairs = 0
    ids = sorted(out)
    for i in ids:
        for j in ids:
            if i >= j:
                continue
            ham = bin(out[i][0] ^ out[j][0]).count("1")
            if ham <= 5:
                close_pairs += 1
                assert out[i][1] & out[j][1], (
                    f"hamming-{ham} pair ({i},{j}) shares no band"
                )
    assert close_pairs >= 3  # the crafted corpus must actually test the claim


def test_knn_ivf_matches_bruteforce_top1_mostly(spark, sf_dir):
    """IVF probing every learned cell must equal brute force exactly
    (probing all cells removes the approximation)."""
    from logistics_data_pipeline_spark.adapters.testdata import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    bf = {(r.query_id, r.rank): r.neighbor_id for r in knn_bruteforce(emb).collect()}
    ivf = {
        (r.query_id, r.rank): r.neighbor_id
        for r in knn_ivf(emb, nprobe=16, n_cells=16).collect()
    }
    assert bf == ivf


def test_knn_ivf_kmeans_recall_beats_labels_baseline(spark, sf_dir):
    """Learned k-means cells at the real operating point (nprobe=3) must
    match or beat the labels-as-cells stand-in on recall@5 vs brute
    force (VERDICT r1 #9). Deterministic: seeded init + fixed data."""
    from logistics_data_pipeline_spark.adapters.testdata import load_table
    from logistics_data_pipeline_spark.llm.similarity import knn_ivf_labels

    emb = load_table(spark, sf_dir, "embeddings")
    truth = {(r.query_id, r.neighbor_id) for r in knn_bruteforce(emb).collect()}

    def recall(df):
        got = {(r.query_id, r.neighbor_id) for r in df.collect()}
        return len(got & truth) / len(truth)

    r_kmeans = recall(knn_ivf(emb, nprobe=3, n_cells=10))
    r_labels = recall(knn_ivf_labels(emb, nprobe=3))
    assert r_kmeans >= r_labels
    assert r_kmeans > 0.3  # sane floor: learned cells find a real share


def test_embedding_neardup_lsh_is_verified_subset_with_recall(spark, sf_dir):
    """SRP-LSH candidates are exact-verified, so the output must be a
    SUBSET of the exact pair set with identical cosines; measured recall
    at threshold 0.35 is pinned (deterministic: seeded hyperplanes)."""
    from logistics_data_pipeline_spark.adapters.testdata import load_table
    from logistics_data_pipeline_spark.llm.similarity import (
        embedding_neardup,
        embedding_neardup_lsh,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {(r.a_id, r.b_id): r.cosine for r in embedding_neardup(emb, 0.35).collect()}
    lsh = {(r.a_id, r.b_id): r.cosine for r in embedding_neardup_lsh(emb, 0.35).collect()}
    assert set(lsh) <= set(exact)
    # Both paths round HALF_UP via F.round, but the pre-round sums come
    # from different summation orders (JVM sequential fold vs BLAS
    # einsum) — a cosine within ~1ulp of a 0.5e-6 boundary can land on
    # either side after data regeneration, so pin to 1e-6, not equality.
    for pair, cos in lsh.items():
        assert abs(cos - exact[pair]) <= 1e-6
    assert len(lsh) / len(exact) >= 0.8  # r=4,b=16 at θ≈66°: ~0.94 expected


def test_lsh_wide_band_regime_matches_duckdb_exactly(spark, sf_dir):
    """Cross-ENGINE check of the band-width governor's 8-bit regime
    (the registered oracle constant only covers the ≤4096-vector 4-bit
    default): Spark at band_bits=8 must produce the identical pair set
    and cosines (±1ulp-at-6dp, the documented HALF_UP boundary wobble)
    as the parameterized DuckDB twin on the real corpus."""
    import duckdb

    from logistics_data_pipeline_spark.adapters.testdata import load_table
    from logistics_data_pipeline_spark.llm.similarity import (
        embedding_neardup_lsh,
        neardup_lsh_sql,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    sp = {(r.a_id, r.b_id): r.cosine
          for r in embedding_neardup_lsh(emb, band_bits=8).collect()}
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    dk = {(a, b): c for a, b, c in con.sql(neardup_lsh_sql(8)).fetchall()}
    assert set(sp) == set(dk) and len(sp) > 0
    for pair, cos in sp.items():
        assert abs(cos - dk[pair]) <= 1e-6, pair


def test_embedding_neardup_fast_matches_exact(spark, sf_dir):
    """The BLAS block-product path must emit the same pairs as the
    exact expression path (lowered threshold so the set is non-empty)."""
    from logistics_data_pipeline_spark.adapters.testdata import load_table
    from logistics_data_pipeline_spark.llm.similarity import (
        embedding_neardup,
        embedding_neardup_fast,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {(r.a_id, r.b_id) for r in embedding_neardup(emb, 0.35).collect()}
    fast = {(r.a_id, r.b_id) for r in embedding_neardup_fast(emb, 0.35).collect()}
    assert exact == fast
    assert len(exact) > 0


def test_multimodal_resize_and_frames(spark):
    """Both kernels now consume DECODED pixels (round 8): expected
    values are recomputed here from the same cycling+codec primitives,
    independently of the mapInPandas path."""
    import hashlib

    import numpy as np

    from logistics_data_pipeline_spark.llm.multimodal import (
        _cycle_to,
        docs_as_png,
        resize_media,
        sample_frames,
    )

    text = "ab" * 300
    docs = spark.createDataFrame(
        [(1, text, "en", "s1", len(text))],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    media = docs_as_png(docs)
    pix = _cycle_to(text.encode(), 512)
    a = np.frombuffer(pix, dtype=np.uint8).reshape(16, 32)
    out = (a.reshape(8, 2, 16, 2).sum(axis=(1, 3), dtype=np.int64) // 4).astype(
        np.uint8
    )
    r = resize_media(media).collect()[0]
    assert (r.width, r.height, r.n_bytes_out) == (16, 8, 128)
    assert r.resized_checksum == hashlib.md5(out.tobytes()).hexdigest()
    frames = sample_frames(media, every=2).collect()
    assert [f.frame_index for f in frames] == [0, 2, 4, 6]
    assert all(f.n_frames == 8 for f in frames)
    assert frames[1].frame_checksum == hashlib.md5(pix[128:192]).hexdigest()


def test_multimodal_extract_batch_shape(spark):
    docs = spark.createDataFrame(
        [(1, "hello world", "en", "s1", 11)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    r = multimodal_extract(docs).collect()[0]
    assert r.n_bytes == 11
    assert r.mime == "text/plain"
    import hashlib

    assert r.checksum == hashlib.md5(b"hello world").hexdigest()


def test_watermarked_dedup_bounds_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark: duplicates inside the lateness
    horizon are dropped; state stays bounded (the perpetual-stream mode
    of the ingest leg)."""
    src = tmp_path / "incoming"
    src.mkdir()
    rows = [dict(WIRE_ROW, event_id=f"e{i}") for i in range(8)]
    _write_json(src, "a.json", rows[:5] + rows[3:5])  # dups inside one file
    _write_json(src, "b.json", rows[4:])              # e4..e7, e4 again late
    out, ckpt = str(tmp_path / "bronze"), str(tmp_path / "ckpt")
    q = bronze_sink(
        file_stream_source(spark, str(src)), out, ckpt, watermark="1 hour"
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 8
    assert got.select("event_id").distinct().count() == 8


def test_corrupt_json_rows_are_dropped(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    good = [dict(WIRE_ROW, event_id=f"e{i}") for i in range(3)]
    lines = [json.dumps(good[0]), "{this is not json", json.dumps(good[1]),
             '"just a string"', json.dumps(good[2])]
    (src / "a.json").write_text("\n".join(lines))
    from logistics_data_pipeline_spark.streaming.ingest import drop_corrupt

    out, ckpt = str(tmp_path / "bronze"), str(tmp_path / "ckpt")
    q = bronze_sink(drop_corrupt(file_stream_source(spark, str(src))), out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert sorted(r.event_id for r in got.collect()) == ["e0", "e1", "e2"]


def test_doc_bigram_logprob_scores_repetition_above_novelty(spark):
    """A doc made of corpus-frequent bigrams must outscore a doc of
    one-off bigrams (that is the point of a perplexity filter)."""
    from logistics_data_pipeline_spark.llm.text import doc_bigram_logprob

    common = "the cat sat on the mat"
    docs = spark.createDataFrame(
        [(i, common) for i in range(5)]
        + [(99, "zq xv jk wm pl qn")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.avg_logprob for r in doc_bigram_logprob(docs).collect()}
    assert got[0] == got[4]  # identical docs, identical scores
    assert got[0] > got[99]


def test_pq_codes_training_reduces_quantization_error(spark, sf_dir):
    """Trained PQ codebooks must not quantize worse than their sampled
    initialization, codes stay in [0, n_cells), and every vector emits
    one code per subspace."""
    from logistics_data_pipeline_spark.adapters.testdata import load_table
    from logistics_data_pipeline_spark.llm.similarity import pq_codes

    emb = load_table(spark, sf_dir, "embeddings")
    trained = pq_codes(emb, n_subspaces=8, n_cells=16, iters=3).collect()
    init = pq_codes(emb, n_subspaces=8, n_cells=16, iters=0).collect()
    n_vec = emb.count()
    assert len(trained) == n_vec * 8
    assert all(0 <= r.code < 16 for r in trained)
    err_trained = sum(r.sq_err for r in trained)
    err_init = sum(r.sq_err for r in init)
    assert err_trained <= err_init


def test_dedup_keeper_picks_longest_per_component(spark):
    """Chained near-dups unify into one component; the longest doc is
    the keeper; the unrelated doc keeps itself."""
    from logistics_data_pipeline_spark.llm.dedup import dedup_keeper

    w = [f"w{i}" for i in range(40)]
    docs = spark.createDataFrame(
        [
            (1, " ".join(w[0:28])),
            (2, " ".join(w[5:33]) + " longest extra tail"),
            (3, " ".join(w[10:38])),
            (4, " ".join(f"z{i}" for i in range(30))),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: (r.keeper_doc_id, r.is_keeper) for r in dedup_keeper(docs, 0.6).collect()}
    assert got == {1: (2, False), 2: (2, True), 3: (2, False), 4: (4, True)}


def test_knn_ivfpq_recall_floor(spark):
    """IVF-PQ+refine at defaults must stay near the IVF-Flat nprobe=8
    probe ceiling (0.80 measured; refine removes quantization error
    from the final ordering) and emit exactly k rows per query.
    Pinned at sf0.01 — the corpus `tools/ann_eval.py` measures on —
    so ANN quality regressions fail CI, not just the README table
    (VERDICT r2 #8)."""
    from logistics_data_pipeline_spark.adapters.testdata import load_table
    from logistics_data_pipeline_spark.llm.similarity import knn_ivfpq

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    truth = {(r.query_id, r.neighbor_id) for r in knn_bruteforce(emb).collect()}
    rows = knn_ivfpq(emb).collect()
    assert len(rows) == 50
    got = {(r.query_id, r.neighbor_id) for r in rows}
    assert len(got & truth) / len(truth) >= 0.75


def test_knn_ivf_flat_recall_floor(spark):
    """IVF-Flat learned cells at the serving operating point (nprobe=8)
    must hold its measured recall@5 (0.80 at sf0.01) within a small
    margin — the floor the IVF-PQ refine path inherits (VERDICT r2 #8)."""
    from logistics_data_pipeline_spark.adapters.testdata import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    truth = {(r.query_id, r.neighbor_id) for r in knn_bruteforce(emb).collect()}
    got = {(r.query_id, r.neighbor_id) for r in knn_ivf(emb, nprobe=8).collect()}
    assert len(got & truth) / len(truth) >= 0.75


def test_srp_lsh_pair_recall_floor(spark):
    """SRP-LSH near-dup candidate recall vs the exact pair set at the
    high-similarity threshold it exists for must stay >= 0.9 (0.941
    measured at sf0.01, matching the 1-(1-p^4)^16 banding prediction)
    (VERDICT r2 #8)."""
    from logistics_data_pipeline_spark.adapters.testdata import load_table
    from logistics_data_pipeline_spark.llm.similarity import (
        embedding_neardup,
        embedding_neardup_lsh,
    )

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    exact = embedding_neardup(emb, 0.35).count()
    lsh = embedding_neardup_lsh(emb, 0.35).count()
    assert lsh / exact >= 0.9


def test_streaming_upsert_sink_merges_and_restarts_idempotently(spark, tmp_path):
    """Two micro-batches with overlapping keys: the later batch's rows
    must win; a checkpointed restart with no new input must change
    nothing (foreachBatch idempotency by batch_id)."""
    from logistics_data_pipeline_spark.streaming.ingest import (
        read_upsert_table,
        upsert_sink,
    )

    src = tmp_path / "incoming"
    src.mkdir()
    _write_json(src, "a.json", [dict(WIRE_ROW, event_id=f"e{i}", weight_kg=1.0) for i in range(6)])
    _write_json(src, "b.json", [dict(WIRE_ROW, event_id=f"e{i}", weight_kg=9.0) for i in range(4, 10)])
    table, ckpt = str(tmp_path / "table"), str(tmp_path / "ckpt")
    q = upsert_sink(
        file_stream_source(spark, str(src), max_files=1), table, ckpt
    )
    q.awaitTermination(120)
    got = {r.event_id: r.weight_kg for r in read_upsert_table(spark, table).collect()}
    assert len(got) == 10
    assert got["e0"] == 1.0 and got["e5"] == 9.0 and got["e9"] == 9.0
    # restart: no new files -> table unchanged
    q2 = upsert_sink(
        file_stream_source(spark, str(src), max_files=1), table, ckpt
    )
    q2.awaitTermination(120)
    got2 = {r.event_id: r.weight_kg for r in read_upsert_table(spark, table).collect()}
    assert got2 == got


def test_streaming_upsert_sink_survives_replay_after_marker_repoint(spark, tmp_path):
    """Crash window the sink exists for: marker repointed to v{batch_id}
    but the streaming checkpoint never committed. Simulated faithfully by
    deleting the last ``commits/<id>`` file — on restart Spark replays
    that batch while _CURRENT already names its version directory. The
    old code re-merged and overwrote the path it was reading (runtime
    error, permanently wedged query); the fix detects the already-applied
    batch and skips."""
    import os

    from logistics_data_pipeline_spark.streaming.ingest import (
        read_upsert_table,
        upsert_sink,
    )

    src = tmp_path / "incoming"
    src.mkdir()
    _write_json(src, "a.json", [dict(WIRE_ROW, event_id=f"e{i}", weight_kg=1.0) for i in range(6)])
    _write_json(src, "b.json", [dict(WIRE_ROW, event_id=f"e{i}", weight_kg=9.0) for i in range(4, 10)])
    table, ckpt = str(tmp_path / "table"), str(tmp_path / "ckpt")
    q = upsert_sink(file_stream_source(spark, str(src), max_files=1), table, ckpt)
    q.awaitTermination(120)
    got = {r.event_id: r.weight_kg for r in read_upsert_table(spark, table).collect()}

    commits = sorted(os.listdir(os.path.join(ckpt, "commits")))
    last = [c for c in commits if not c.startswith(".")][-1]
    os.remove(os.path.join(ckpt, "commits", last))
    crc = os.path.join(ckpt, "commits", f".{last}.crc")
    if os.path.exists(crc):  # local-FS checksum sidecar would block the re-commit rename
        os.remove(crc)

    q2 = upsert_sink(file_stream_source(spark, str(src), max_files=1), table, ckpt)
    q2.awaitTermination(120)
    assert q2.exception() is None
    got2 = {r.event_id: r.weight_kg for r in read_upsert_table(spark, table).collect()}
    assert got2 == got


def test_kafka_source_and_sink_option_contracts(spark):
    """The Kafka legs can't execute here (no broker, no spark-sql-kafka
    package), but the option maps they are built from ARE the contract
    with the reference deployment — pin them (VERDICT r2 #9). The wire
    projection (key = order_id, value = full-row JSON) is executable
    and asserted against a real row."""
    import json

    from logistics_data_pipeline_spark.sources.generator import (
        kafka_sink_options,
        synthetic_events,
        to_wire,
    )
    from logistics_data_pipeline_spark.streaming.ingest import kafka_source_options

    assert kafka_source_options("broker:9092") == {
        "kafka.bootstrap.servers": "broker:9092",
        "subscribe": "logistics-events",
        "startingOffsets": "earliest",
    }
    assert kafka_sink_options("broker:9092", "custom-topic") == {
        "kafka.bootstrap.servers": "broker:9092",
        "topic": "custom-topic",
    }
    ev = synthetic_events(spark, n=3)
    wire = to_wire(ev).collect()
    assert [f.name for f in to_wire(ev).schema.fields] == ["key", "value"]
    payload = json.loads(wire[0].value)
    assert payload["order_id"] == wire[0].key
    assert set(payload) == {f.name for f in ev.schema.fields}


def test_kafka_and_file_replay_share_post_source_plan(spark, tmp_path):
    """VERDICT r5 #7: the broker-free contract that the Kafka leg and
    the file-replay leg run the SAME decode graph. Both route through
    ``decode_wire``; feeding it two different ``value``-bearing sources
    must yield analyzed plans that are identical above the source
    relation (operator-for-operator), and the replay leg must execute
    end-to-end, dropping the corrupt payload."""
    import json

    from logistics_data_pipeline_spark.streaming.ingest import (
        bronze_sink,
        decode_wire,
        text_replay_source,
    )

    def plan_above_source(df):
        plan = df._jdf.queryExecution().analyzed().toString()
        # keep the transformation stack, cut the source relation line(s)
        keep = []
        for line in plan.splitlines():
            if "Relation" in line or "LogicalRDD" in line:
                break
            keep.append(line)
        return "\n".join(keep)

    # kafka-shaped raw frame: the exact columns the kafka source emits
    kafka_shaped = spark.createDataFrame(
        [(b"k", b'{"x":1}', "t", 0, 0)],
        "key binary, value binary, topic string, partition int, offset long",
    )
    file_shaped = spark.createDataFrame([('{"x":1}',)], "value string")
    pk = plan_above_source(decode_wire(kafka_shaped))
    pf = plan_above_source(decode_wire(file_shaped))
    # normalize expression ids (#123) before comparing
    import re

    norm = lambda s: re.sub(r"#\d+", "#", s)  # noqa: E731
    assert norm(pk) == norm(pf)
    assert "from_json" in pk and "isnotnull" in pk.lower()

    # and the replay leg executes the graph end-to-end
    src = tmp_path / "wire"
    src.mkdir()
    good = {
        "event_id": "E1", "order_id": "O1", "timestamp": "2024-01-01T00:00:00",
        "event_type": "pickup", "location": "NYC", "status": "in_transit",
    }
    lines = [json.dumps(good), "NOT JSON {{{"]
    (src / "payloads.json").write_text("\n".join(lines))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = bronze_sink(text_replay_source(spark, str(src)), out, ckpt, dedup=False)
    q.awaitTermination(60)
    got = spark.read.parquet(out).collect()
    assert len(got) == 1 and got[0].event_id == "E1"


def test_doc_chunks_overlap_and_coverage(spark):
    """100 tokens at chunk=64/stride=48 -> exactly 2 chunks: [0,64) and
    [48,100); consecutive chunks overlap by chunk-stride tokens and the
    union covers every token. A short doc emits exactly one chunk."""
    from logistics_data_pipeline_spark.llm.curation import doc_chunks

    toks = [f"t{i}" for i in range(100)]
    docs = spark.createDataFrame(
        [(1, " ".join(toks)), (2, "only three tokens")], ["doc_id", "text"]
    )
    rows = {(r.doc_id, r.chunk_id): r for r in doc_chunks(docs).collect()}
    assert {k for k in rows} == {(1, 0), (1, 1), (2, 0)}
    c0, c1 = rows[(1, 0)].chunk_text.split(" "), rows[(1, 1)].chunk_text.split(" ")
    assert c0 == toks[0:64] and c1 == toks[48:100]
    assert rows[(1, 0)].n_tokens == 64 and rows[(1, 1)].n_tokens == 52
    assert c0[48:] == c1[:16]  # 16-token overlap
    assert rows[(2, 0)].chunk_text == "only three tokens"


def test_hot_window_range_join_counts_crafted_bursts(spark):
    """Two bursts at known minutes; every event inside [minute-5min,
    minute+6min) must be counted, including ones in neighbouring
    minutes, and boundary events obey the half-open interval."""
    from logistics_data_pipeline_spark.operators.temporal import (
        hot_window_range_join,
    )

    rows = []
    # burst A: 5 events at 10:00, plus one at 09:55:00 (inside, boundary)
    # and one at 09:54:59 (outside)
    for i in range(5):
        rows.append((i, "2024-01-01 10:00:10", 100 + i))
    rows.append((10, "2024-01-01 09:55:00", 200))
    rows.append((11, "2024-01-01 09:54:59", 201))
    # burst B: 3 events at 12:00, plus one at 12:05:59 (inside: < 12:06)
    # and one at 12:06:00 (outside)
    for i in range(3):
        rows.append((20 + i, "2024-01-01 12:00:20", 300))
    rows.append((30, "2024-01-01 12:05:59", 301))
    rows.append((31, "2024-01-01 12:06:00", 302))
    from pyspark.sql import functions as F

    ev = spark.createDataFrame(
        [(i, ts, u, "click", 1.0, "{}") for i, ts, u in rows],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        str(r.w_start): (r.n_minute, r.n_events, r.n_users)
        for r in hot_window_range_join(ev, top_k=2).collect()
    }
    assert got["2024-01-01 09:55:00"] == (5, 6, 6)  # 5 burst + 09:55:00
    assert got["2024-01-01 11:55:00"] == (3, 4, 2)  # 3 burst + 12:05:59


def test_dim_stats_known_moments(spark):
    """Three 2-d vectors with hand-computable stats; microunit floor
    quantization is exact for these values."""
    from logistics_data_pipeline_spark.llm.similarity import dim_stats

    emb = spark.createDataFrame(
        [(1, [1.0, -2.0], "a"), (2, [2.0, 0.0], "a"), (3, [3.0, 2.0], "a")],
        ["vec_id", "embedding", "label"],
    )
    got = {r.dim: r for r in dim_stats(emb).collect()}
    assert got[0].n_vecs == 3 and got[0].mean_v == 2.0 and got[0].std_v == 1.0
    assert got[0].min_v == 1.0 and got[0].max_v == 3.0
    assert got[1].mean_v == 0.0 and got[1].std_v == 2.0


def test_curation_pipeline_filters_dedups_and_splits(spark):
    """Composed pipeline: repetitive/short docs drop at quality, exact
    duplicates collapse to the min-id keeper carrying n_copies, and
    every survivor gets a deterministic split."""
    from logistics_data_pipeline_spark.llm.curation import curation_pipeline

    good = " ".join(f"tok{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (1, good, "en", "web", len(good)),
            (2, good, "en", "web", len(good)),          # exact dup of 1
            (3, "too short", "en", "web", 9),            # TOO_SHORT
            (4, "spam " * 30, "en", "web", 150),         # LOW_DIVERSITY
            (5, " ".join(f"w{i}" for i in range(40)), "de", "books", 200),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    rows = {r.doc_id: r for r in curation_pipeline(docs).collect()}
    assert set(rows) == {1, 5}
    assert rows[1].n_copies == 2 and rows[5].n_copies == 1
    assert all(r.split in ("train", "val", "test") for r in rows.values())


def test_incremental_dedup_verdicts(spark):
    """doc_ids 0,5,10,15 are the 'new batch'; 0 duplicates corpus text,
    5/10 duplicate each other in-batch (min id keeps), 15 is new."""
    from logistics_data_pipeline_spark.llm.dedup import incremental_dedup

    docs = spark.createDataFrame(
        [
            (0, "already ingested content"),
            (5, "fresh batch duplicate"),
            (10, "fresh batch duplicate"),
            (15, "genuinely new content"),
            (1, "already ingested content"),   # corpus
            (2, "other corpus content"),       # corpus
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.verdict for r in incremental_dedup(docs).collect()}
    assert got == {
        0: "DUP_OF_CORPUS",
        5: "NEW",
        10: "DUP_IN_BATCH",
        15: "NEW",
    }


def test_embedding_neardup_prefix_is_verified_subset_with_recall(spark):
    """Prefix-filtered pairs are exact-verified, so they must be a
    SUBSET of the exact pair set with identical full-dim cosines;
    measured recall on the random corpus (worst case — no MRL
    structure) must stay >= 0.9."""
    from logistics_data_pipeline_spark.adapters.testdata import load_table
    from logistics_data_pipeline_spark.llm.similarity import (
        embedding_neardup,
        embedding_neardup_prefix,
    )

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    exact = {(r.a_id, r.b_id): r.cosine for r in embedding_neardup(emb).collect()}
    pref = {
        (r.a_id, r.b_id): r.cosine for r in embedding_neardup_prefix(emb).collect()
    }
    assert set(pref) <= set(exact)
    for pair, cos in pref.items():
        assert cos == exact[pair]
    assert len(pref) / len(exact) >= 0.9


def test_text_normalize_strips_controls_and_collapses_whitespace(spark):
    from logistics_data_pipeline_spark.llm.text import text_normalize

    docs = spark.createDataFrame(
        [(1, "a\tb\r\nc\x00d   e "), (2, "clean text")], ["doc_id", "text"]
    )
    got = {r.doc_id: r for r in text_normalize(docs).collect()}
    assert got[1].text_clean == "a b c d e"
    assert got[1].n_chars_raw == 13 and got[1].n_chars_clean == 9
    assert got[1].n_removed == 4
    assert got[2].text_clean == "clean text" and got[2].n_removed == 0


def test_rollup_sink_matches_batch_groupby_and_restarts_idempotently(spark, tmp_path):
    """Continuous aggregate: after streaming N files (one micro-batch
    each), the maintained rollup equals the batch GROUP BY over all
    input; a checkpointed restart with no new input changes nothing."""
    from pyspark.sql import functions as F

    from logistics_data_pipeline_spark.streaming.ingest import (
        read_upsert_table,
        rollup_sink,
    )

    src = tmp_path / "incoming"
    src.mkdir()
    rows_a = [
        dict(WIRE_ROW, event_id=f"a{i}", timestamp="2024-01-05T08:00:30", weight_kg=1.0)
        for i in range(4)
    ]
    rows_b = [
        dict(WIRE_ROW, event_id=f"b{i}", timestamp="2024-01-05T08:00:45", weight_kg=2.0)
        for i in range(3)
    ] + [
        dict(WIRE_ROW, event_id=f"c{i}", timestamp="2024-01-05T09:10:00", weight_kg=0.5)
        for i in range(2)
    ]
    _write_json(src, "a.json", rows_a)
    _write_json(src, "b.json", rows_b)
    table, ckpt = str(tmp_path / "rollup"), str(tmp_path / "ckpt")
    q = rollup_sink(file_stream_source(spark, str(src), max_files=1), table, ckpt)
    q.awaitTermination(120)
    got = {
        str(r.minute): (r.n_events, r.sum_weight)
        for r in read_upsert_table(spark, table).collect()
    }
    # batch truth: 08:00 -> 7 events (4*1.0 + 3*2.0 = 10.0); 09:10 -> 2 (1.0)
    assert got == {
        "2024-01-05 08:00:00": (7, 10.0),
        "2024-01-05 09:10:00": (2, 1.0),
    }
    q2 = rollup_sink(file_stream_source(spark, str(src), max_files=1), table, ckpt)
    q2.awaitTermination(120)
    got2 = {
        str(r.minute): (r.n_events, r.sum_weight)
        for r in read_upsert_table(spark, table).collect()
    }
    assert got2 == got


def test_whiten_standardizes_each_dimension(spark):
    from logistics_data_pipeline_spark.llm.similarity import whiten

    emb = spark.createDataFrame(
        [(1, [1.0, 10.0], "a"), (2, [2.0, 10.0], "a"), (3, [3.0, 10.0], "a")],
        ["vec_id", "embedding", "label"],
    )
    got = {r.vec_id: r.whitened for r in whiten(emb).collect()}
    # dim 0: mean 2, std 1 -> standardized to [-1, 0, 1]
    assert [got[i][0] for i in (1, 2, 3)] == [-1.0, 0.0, 1.0]
    # dim 1 is constant: zero variance -> NULL, never +-inf
    assert all(got[i][1] is None for i in (1, 2, 3))


def test_dedup_cluster_stats_histogram(spark):
    """3 docs forming one near-dup chain + 1 singleton -> histogram has
    a size-3 cluster (drops 2) and a size-1 cluster (drops 0)."""
    from logistics_data_pipeline_spark.llm.dedup import dedup_cluster_stats

    w = [f"w{i}" for i in range(40)]
    docs = spark.createDataFrame(
        [
            (1, " ".join(w[0:28])),
            (2, " ".join(w[5:33])),
            (3, " ".join(w[10:38])),
            (4, " ".join(f"z{i}" for i in range(30))),
        ],
        ["doc_id", "text"],
    )
    got = {r.cluster_size: r for r in dedup_cluster_stats(docs, 0.6).collect()}
    assert got[3].n_clusters == 1 and got[3].n_dropped_by_dedup == 2
    assert got[1].n_clusters == 1 and got[1].n_dropped_by_dedup == 0
    assert got[3].drop_frac_of_corpus == 0.5


class TestDedupCorpusSink:
    def _write_doc_files(self, spark, tmp, groups):
        import os

        src = os.path.join(tmp, "incoming")
        os.makedirs(src, exist_ok=True)
        for i, rows in enumerate(groups):
            spark.createDataFrame(rows, "doc_id long, text string").coalesce(
                1
            ).write.mode("overwrite").parquet(os.path.join(src, f"g{i}"))
        return [os.path.join(src, f"g{i}") for i in range(len(groups))]

    def test_stream_equals_batch_dedup_with_redelivery(self, spark, tmp_path):
        import os

        from logistics_data_pipeline_spark.streaming.ingest import (
            dedup_corpus_sink,
            read_dedup_corpus,
        )

        tmp = str(tmp_path)
        # batch 1: docs 1-3 (2 and 3 duplicate content); batch 2 redelivers
        # doc 2's content under a new id and adds doc 5
        g1 = [(1, "alpha body"), (2, "same body"), (3, "same body")]
        g2 = [(4, "same body"), (5, "omega body")]
        paths = self._write_doc_files(spark, tmp, [g1, g2])
        corpus = os.path.join(tmp, "corpus")
        ckpt = os.path.join(tmp, "ckpt")

        schema = "doc_id long, text string"
        for p in paths:  # one source run per arrival group = micro-batch
            stream = spark.readStream.schema(schema).parquet(p)
            q = dedup_corpus_sink(stream, corpus, os.path.join(ckpt, os.path.basename(p)))
            q.awaitTermination(120)
        out = read_dedup_corpus(spark, corpus).orderBy("doc_id").collect()
        assert [(r.doc_id, r.text) for r in out] == [
            (1, "alpha body"),
            (2, "same body"),  # first arrival wins inside batch 1
            (5, "omega body"),  # doc 4 rejected against the corpus
        ]

    def test_replay_is_idempotent(self, spark, tmp_path):
        import os

        from logistics_data_pipeline_spark.streaming.ingest import (
            dedup_corpus_sink,
            read_dedup_corpus,
        )

        tmp = str(tmp_path)
        paths = self._write_doc_files(spark, tmp, [[(1, "only body"), (2, "only body")]])
        corpus = os.path.join(tmp, "corpus")
        schema = "doc_id long, text string"
        # run the same source twice against SEPARATE checkpoints: the
        # second run replays batch 0; the manifest short-circuit must
        # keep the corpus unchanged rather than double-append
        for i in range(2):
            stream = spark.readStream.schema(schema).parquet(paths[0])
            q = dedup_corpus_sink(stream, corpus, os.path.join(tmp, f"ckpt{i}"))
            q.awaitTermination(120)
        out = read_dedup_corpus(spark, corpus).collect()
        assert len(out) == 1 and out[0].doc_id == 1


class TestBatchFileSources:
    def test_json_reader_rescues_corrupt_lines(self, spark, tmp_path):
        import json as _json

        from logistics_data_pipeline_spark.sources.files import (
            read_events_json,
            split_clean_quarantine,
        )

        p = tmp_path / "events.json"
        lines = [_json.dumps(dict(WIRE_ROW, event_id=f"e{i}")) for i in range(3)]
        lines.insert(1, "{broken json!!")
        p.write_text("\n".join(lines))
        df = read_events_json(spark, str(p))
        clean, quarantine = split_clean_quarantine(df)
        assert clean.count() == 3
        assert "ingestion_timestamp" in clean.columns
        q = quarantine.collect()
        assert len(q) == 1 and q[0].raw_record.startswith("{broken")

    def test_csv_reader_types_and_rescue(self, spark, tmp_path):
        from logistics_data_pipeline_spark.sources.files import (
            read_events_csv,
            split_clean_quarantine,
        )

        cols = ["event_id", "order_id", "timestamp", "status", "origin",
                "destination", "carrier_name", "latitude", "longitude",
                "weight_kg", "estimated_delivery"]
        good = ",".join('"%s"' % WIRE_ROW[c] if isinstance(WIRE_ROW[c], str)
                        else str(WIRE_ROW[c]) for c in cols)
        bad = '"e9","o9","2024-01-05T08:00:00","S","A, C1","B, C2","DHL",notafloat,20.0,5.0,"2024-01-07"'
        p = tmp_path / "events.csv"
        p.write_text(",".join(cols) + "\n" + good + "\n" + bad + "\n")
        clean, quarantine = split_clean_quarantine(read_events_csv(spark, str(p)))
        got = clean.collect()
        assert len(got) == 1 and got[0].latitude == 10.0
        assert quarantine.count() == 1


def test_simhash_pairs_exact_within_pigeonhole_radius(spark):
    """At max_ham = bands-1 the banded candidates provably cover every
    pair in radius: banded+verified output must EQUAL the brute-force
    hamming join over the same signatures."""
    from itertools import combinations

    from logistics_data_pipeline_spark.llm.dedup import simhash, simhash_pairs

    base = [f"tok{i}" for i in range(120)]
    rows = [(0, " ".join(base)), (1, " ".join(base))]
    for d in range(2, 10):
        mutated = list(base)
        for j in range(d - 1):
            mutated[j * 7] = f"swap{d}_{j}"
        rows.append((d, " ".join(mutated)))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sigs = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    brute = {
        (a, b): bin(sigs[a] ^ sigs[b]).count("1")
        for a, b in combinations(sorted(sigs), 2)
        if bin(sigs[a] ^ sigs[b]).count("1") <= 5
    }
    got = {(r.a_id, r.b_id): r.hamming for r in simhash_pairs(docs).collect()}
    assert got == brute and len(brute) >= 3


def test_sorted_neighborhood_semantics(spark):
    """SNM finds same-prefix near-dups via the sort window and, by
    design, misses prefix-divergent ones (its documented blind spot)."""
    from logistics_data_pipeline_spark.llm.dedup import sorted_neighborhood

    body = " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (1, "prefixaa " + body),
            (2, "prefixaa " + body + " tail"),   # same block, adjacent in sort
            (3, "zz-other " + body),             # same content, far-away prefix
            (4, "prefixaa " + " ".join(f"q{i}" for i in range(40))),
        ],
        "doc_id long, text string",
    )
    got = {(r.a_id, r.b_id) for r in sorted_neighborhood(docs, threshold=0.6).collect()}
    assert (1, 2) in got
    assert all(3 not in p for p in got)  # blocked SNM's documented miss


def test_incremental_topk_equals_full_recompute(spark, sf_dir):
    from logistics_data_pipeline_spark.adapters.testdata import load_table
    from logistics_data_pipeline_spark.llm.similarity import (
        incremental_topk,
        knn_bruteforce,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    full = [(r.query_id, r.neighbor_id, r.cosine, r.rank)
            for r in knn_bruteforce(emb).orderBy("query_id", "rank").collect()]
    inc = [(r.query_id, r.neighbor_id, r.cosine, r.rank)
           for r in incremental_topk(emb).collect()]
    assert inc == full and len(inc) == 50


def test_ensemble_components_merge_across_methods(spark):
    """A chain where each link comes from a DIFFERENT method must
    unify into one component: 1-2 by Jaccard (balanced overlap), 2-3
    by containment (2 quoted inside 3), and an isolated doc stays its
    own component."""
    from logistics_data_pipeline_spark.llm.dedup import (
        containment_pairs,
        ensemble_components,
        neardup_ngram,
    )

    body = " ".join(f"w{i}" for i in range(30))
    filler = " ".join(f"f{i}" for i in range(200))
    docs = spark.createDataFrame(
        [
            (1, body),
            (2, body + " tail"),          # jaccard pair with 1
            (3, body + " tail " + filler),  # contains 2, low jaccard
            (4, " ".join(f"z{i}" for i in range(30))),
        ],
        "doc_id long, text string",
    )
    # the chain premise: jaccard links (1,2) but NOT (2,3)
    jac = {(r.a_id, r.b_id) for r in neardup_ngram(docs).collect()}
    con = {(r.a_id, r.b_id) for r in containment_pairs(docs).collect()}
    assert (1, 2) in jac and (2, 3) not in jac
    assert (2, 3) in con
    comp = {r.doc_id: r.component for r in ensemble_components(docs).collect()}
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[4] == 4


def test_lsh_512bit_16band_regime_matches_duckdb_exactly(spark, sf_dir):
    """Cross-ENGINE check of the governor's WIDE tier (>32768 vectors
    picks n_bits=512, band_bits=16 — the regime SCALING_r10's governor
    re-derivation added after the width-only tiers went 45.7× at the
    sf10 decade): Spark at (n_bits=128, band_bits=16) — the same
    band shape at a pytest-sized bit count — must produce the
    identical pair set and cosines as the parameterized DuckDB twin.
    The n_bits knob is mirrored through _srp_sig_ctes(band_bits,
    n_bits), so this pins BOTH governor knobs cross-engine."""
    import duckdb

    from logistics_data_pipeline_spark.adapters.testdata import load_table
    from logistics_data_pipeline_spark.llm.similarity import (
        embedding_neardup_lsh,
        neardup_lsh_sql,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    sp = {(r.a_id, r.b_id): r.cosine
          for r in embedding_neardup_lsh(
              emb, n_bits=128, band_bits=16
          ).collect()}
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    dk = {(a, b): c
          for a, b, c in con.sql(neardup_lsh_sql(16, n_bits=128)).fetchall()}
    assert set(sp) == set(dk)
    for pair, cos in sp.items():
        assert abs(cos - dk[pair]) <= 1e-6, pair


def test_srp_blas_buckets_match_declarative(spark, sf_dir):
    """The wide-tier BLAS signature path (X @ G per Arrow batch) must
    produce bucket-for-bucket identical signatures to the declarative
    fanout-join path at the same (n_bits, band_bits) — the only
    divergence risk is a projection exactly on the ±0.5e-6 rounding
    boundary (np.round half-even vs Spark HALF_UP), measure-zero over
    md5-derived planes."""
    from logistics_data_pipeline_spark.adapters.testdata import load_table
    from logistics_data_pipeline_spark.llm.similarity import srp_buckets

    emb = load_table(spark, sf_dir, "embeddings")
    decl = {
        (r.vec_id, r.band): r.bucket
        for r in srp_buckets(
            emb, n_bits=128, band_bits=16, impl="declarative"
        ).collect()
    }
    blas = {
        (r.vec_id, r.band): r.bucket
        for r in srp_buckets(
            emb, n_bits=128, band_bits=16, impl="blas"
        ).collect()
    }
    assert decl == blas and len(decl) > 0
