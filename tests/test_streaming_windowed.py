"""Streaming analytics == batch analytics on the same data: the
watermarked windowed agg and the stateful sessionizer must reproduce
their batch twins (operators/temporal, operators/analytics), and the
sessionizer's state must survive a checkpointed restart."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from logistics_data_pipeline_spark.adapters.testdata import load_table
from logistics_data_pipeline_spark.operators.analytics import user_sessions
from logistics_data_pipeline_spark.operators.temporal import tumbling_window_counts
from logistics_data_pipeline_spark.streaming.windowed import (
    JSON_TS_FMT,
    dedup_stream,
    events_file_stream,
    run_to_memory,
    sessionize_stream,
    windowed_counts,
)

STREAM_COLS = ["event_id", "ts", "user_id", "event_type", "value"]


def _dump_events_json(spark, sf_dir, out_dir, n_files=1):
    ev = load_table(spark, sf_dir, "events").select(*STREAM_COLS)
    ev.repartition(n_files).write.mode("overwrite").option(
        "timestampFormat", JSON_TS_FMT
    ).json(str(out_dir))
    return ev


def test_windowed_counts_stream_equals_batch(spark, sf_dir, tmp_path):
    src = tmp_path / "stream_src"
    _dump_events_json(spark, sf_dir, src)
    stream = windowed_counts(events_file_stream(spark, str(src)))
    run_to_memory(stream, "win_counts", "complete", str(tmp_path / "ckpt"))
    got = {
        (r.window_start, r.event_type, r.n_events, r.total_value)
        for r in spark.table("win_counts").collect()
    }
    want = {
        (r.window_start, r.event_type, r.n_events, r.total_value)
        for r in tumbling_window_counts(load_table(spark, sf_dir, "events")).collect()
    }
    assert got == want and len(want) > 0


def test_dedup_stream_drops_redeliveries_equals_batch(spark, sf_dir, tmp_path):
    """dropDuplicatesWithinWatermark over a redelivered stream must
    equal batch dropDuplicates on the same data: duplicates are exact
    row copies (as broker redelivery produces), so first-wins is
    value-neutral and the comparison is deterministic."""
    src = tmp_path / "stream_src"
    ev = (
        load_table(spark, sf_dir, "events")
        .select(*STREAM_COLS)
        .orderBy("event_id")
        .limit(200)
    )
    # redeliver half the rows in a second file, a third of them twice
    ev.coalesce(1).write.mode("overwrite").option(
        "timestampFormat", JSON_TS_FMT
    ).json(str(src))
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode("append").option(
        "timestampFormat", JSON_TS_FMT
    ).json(str(src))
    ev.filter(F.col("event_id") % 3 == 0).coalesce(1).write.mode("append").option(
        "timestampFormat", JSON_TS_FMT
    ).json(str(src))
    stream = dedup_stream(events_file_stream(spark, str(src)))
    run_to_memory(stream, "dedup_out", "append", str(tmp_path / "ckpt"))
    got = {tuple(r) for r in spark.table("dedup_out").select(*STREAM_COLS).collect()}
    want = {tuple(r) for r in ev.dropDuplicates(["event_id"]).collect()}
    assert got == want and len(want) == 200


def test_dedup_counts_stream_batch_matches_undoubled_rollup(spark, sf_dir):
    """The registered stream_dedup_watermark wrapper: doubling 10% of
    events through the real dedup stream graph must reproduce the
    per-type rollup of the ORIGINAL table exactly (the oracle
    contract)."""
    from logistics_data_pipeline_spark.streaming.windowed import (
        dedup_counts_stream_batch,
    )

    ev = load_table(spark, sf_dir, "events")
    got = {tuple(r) for r in dedup_counts_stream_batch(spark, ev).collect()}
    want = {
        tuple(r)
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("total_value"),
        )
        .collect()
    }
    assert got == want and len(want) > 0


def test_sessionize_stream_closed_sessions_match_batch(spark, sf_dir, tmp_path):
    """One availableNow drain: every session the batch sessionizer finds
    is emitted closed except each user's final (still-open) one."""
    src = tmp_path / "stream_src"
    _dump_events_json(spark, sf_dir, src)
    q = sessionize_stream(events_file_stream(spark, str(src)))
    run_to_memory(q, "sessions", "append", str(tmp_path / "ckpt"))
    closed = spark.table("sessions")
    closed_per_user = {
        r.user_id: r.n for r in closed.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    batch = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in user_sessions(load_table(spark, sf_dir, "events")).collect()
    }
    assert len(batch) > 0
    for user_id, (n_sessions, n_events) in batch.items():
        assert closed_per_user.get(user_id, 0) == n_sessions - 1, user_id
    # closed-session events + one open session's events account for all
    emitted = {r.user_id: r.s for r in closed.groupBy("user_id").agg(F.sum("n_events").alias("s")).collect()}
    for user_id, (_, n_events) in batch.items():
        assert emitted.get(user_id, 0) < n_events


def test_sessionize_stream_restart_closes_session(spark, tmp_path):
    """State survives a checkpointed restart: a late file that breaches
    the gap closes the session opened in the first run."""
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def write(name, rows):
        (src / name).write_text(
            "\n".join(
                json.dumps(
                    {"event_id": i, "ts": ts, "user_id": 7, "event_type": "click", "value": v}
                )
                for i, (ts, v) in enumerate(rows)
            )
        )

    out = str(tmp_path / "out")

    def drain():
        # memory sink can't recover a checkpoint; the restart test needs
        # a durable (file) sink
        q = (
            sessionize_stream(events_file_stream(spark, str(src)))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        from logistics_data_pipeline_spark.streaming.windowed import SESSION_OUTPUT_SCHEMA

        return spark.read.schema(SESSION_OUTPUT_SCHEMA).parquet(out)

    write("a.json", [("2024-01-01T00:00:00.000000Z", 1.5), ("2024-01-01T00:10:00.000000Z", 2.5)])
    assert drain().count() == 0  # session still open

    write("b.json", [("2024-01-01T03:00:00.000000Z", 9.0)])
    rows = drain().collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.user_id == 7 and r.n_events == 2 and r.total_value == 4.0
    assert r.session_start.isoformat().startswith("2024-01-01T00:00")
    assert r.session_end.isoformat().startswith("2024-01-01T00:10")


def test_stream_stream_interval_join_matches_batch_attribution(spark, sf_dir, tmp_path):
    from logistics_data_pipeline_spark.operators.temporal import (
        purchase_click_attribution,
    )
    from logistics_data_pipeline_spark.streaming.windowed import (
        click_attribution_pairs_stream,
    )

    src = tmp_path / "ssj_src"
    _dump_events_json(spark, sf_dir, src, n_files=4)
    stream = click_attribution_pairs_stream(events_file_stream(spark, str(src)))
    run_to_memory(stream, "ssj_pairs", "append", str(tmp_path / "ssj_ckpt"))
    pairs = spark.table("ssj_pairs")
    got = {
        (r.purchase_id, r.n): None
        for r in pairs.groupBy("purchase_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    want = {
        (r.purchase_id, r.n_prior_clicks): None
        for r in purchase_click_attribution(
            load_table(spark, sf_dir, "events")
        )
        .filter(F.col("n_prior_clicks") > 0)  # inner join drops zero-click tail
        .collect()
    }
    assert len(want) > 0
    assert got == want


def test_hopping_counts_stream_equals_batch(spark, sf_dir, tmp_path):
    """Overlapping (sliding) windows through Structured Streaming must
    finalize to exactly the batch hopping aggregation."""
    from logistics_data_pipeline_spark.operators.temporal import hopping_window_counts
    from logistics_data_pipeline_spark.streaming.windowed import hopping_windowed_counts

    src = tmp_path / "stream_src"
    _dump_events_json(spark, sf_dir, src)
    stream = hopping_windowed_counts(events_file_stream(spark, str(src)))
    run_to_memory(stream, "hop_counts", "complete", str(tmp_path / "ckpt"))
    got = {
        (r.window_start, r.window_end, r.event_type, r.n_events, r.total_value)
        for r in spark.table("hop_counts").collect()
    }
    want = {
        (r.window_start, r.window_end, r.event_type, r.n_events, r.total_value)
        for r in hopping_window_counts(load_table(spark, sf_dir, "events")).collect()
    }
    assert got == want and len(want) > 0


def test_enrich_stream_static_join_equals_batch(spark, sf_dir, tmp_path):
    """Stream-static enrichment: the broadcast dim join produces the
    identical enriched rows whether the events arrive as a stream or a
    batch, including the left-join 'unknown' fallback for types absent
    from the dim."""
    from logistics_data_pipeline_spark.streaming.windowed import enrich_stream

    src = tmp_path / "stream_src"
    ev = _dump_events_json(spark, sf_dir, src)
    types = [r.event_type for r in ev.select("event_type").distinct().collect()]
    # dim covers all but one type -> that type must fall back, not drop
    covered = sorted(types)[:-1] if len(types) > 1 else types
    dim = spark.createDataFrame(
        [(t, f"cat_{t[:2]}", 30 + 5 * i) for i, t in enumerate(covered)],
        "event_type string, category string, sla_minutes long",
    )
    stream = enrich_stream(
        __import__(
            "logistics_data_pipeline_spark.streaming.windowed", fromlist=["x"]
        ).events_file_stream(spark, str(src)),
        dim,
    )
    run_to_memory(stream, "enriched_out", "append", str(tmp_path / "ckpt"))
    key = lambda r: (r.event_id, r.category, r.sla_minutes)
    got = sorted(map(key, spark.table("enriched_out").collect()))
    want = sorted(map(key, enrich_stream(ev, dim).collect()))
    assert got == want and len(want) == ev.count()
    if len(types) > 1:
        missing = sorted(types)[-1]
        fell_back = [
            r for r in spark.table("enriched_out").collect()
            if r.event_type == missing
        ]
        assert fell_back and all(
            r.category == "unknown" and r.sla_minutes is None for r in fell_back
        )


def test_sessionize_entry_cap_matches_islands_oracle(spark, tmp_path):
    """Capped-regime cross-engine parity (VERDICT r9 #4): with
    max_events=2, a 5-event within-gap run splits close-on-overflow
    into blocks of 2 — the streamed closed sessions must equal the
    sessionize_closed_sql(max_events=2) islands oracle on the same
    rows (the registered cap of 512 never triggers at committed SFs,
    so this is the only place the split regime is exercised)."""
    import duckdb
    import pandas as pd

    from logistics_data_pipeline_spark.streaming.windowed import (
        sessionize_closed_sql,
    )

    src = tmp_path / "src"
    src.mkdir()
    rows = [
        # user 7: five events 5 min apart (one gap-island), then a
        # post-gap straggler that closes the residual block
        (1, "2024-01-01T00:00:00.000000Z", 7, 1.25),
        (2, "2024-01-01T00:05:00.000000Z", 7, 2.25),
        (3, "2024-01-01T00:10:00.000000Z", 7, 3.25),
        (4, "2024-01-01T00:15:00.000000Z", 7, 4.25),
        (5, "2024-01-01T00:20:00.000000Z", 7, 5.25),
        (6, "2024-01-01T03:00:00.000000Z", 7, 6.25),
        # user 8: exactly cap events, never overflows -> stays open
        (7, "2024-01-01T00:00:00.000000Z", 8, 1.00),
        (8, "2024-01-01T00:01:00.000000Z", 8, 2.00),
        # user 9: three events at the SAME timestamp (ADVICE r10) — the
        # capped split is then decided purely by the event_id tiebreak
        # ((9,10) close as one block, (11) as the residual); a ts-only
        # sort leaves the block membership to pandas quicksort luck
        (9, "2024-01-01T00:00:00.000000Z", 9, 1.50),
        (10, "2024-01-01T00:00:00.000000Z", 9, 2.50),
        (11, "2024-01-01T00:00:00.000000Z", 9, 4.50),
        (12, "2024-01-01T03:00:00.000000Z", 9, 8.00),
    ]
    (src / "a.json").write_text(
        "\n".join(
            json.dumps(
                {
                    "event_id": i,
                    "ts": ts,
                    "user_id": u,
                    "event_type": "click",
                    "value": v,
                }
            )
            for i, ts, u, v in rows
        )
    )
    q = sessionize_stream(events_file_stream(spark, str(src)), max_events=2)
    run_to_memory(q, "capped_sessions", "append", str(tmp_path / "ckpt"))
    # Full-tuple sort: user 9's two closed blocks share an identical
    # (session_start, session_end) — all three events carry the same
    # timestamp — so any engine ORDER BY on the output columns leaves
    # their relative order tie-broken arbitrarily (the driver's compare
    # is order-insensitive for the same reason).
    got = sorted(
        (r.user_id, r.session_start.isoformat(), r.session_end.isoformat(),
         r.n_events, r.total_value)
        for r in spark.table("capped_sessions").collect()
    )
    events_pdf = pd.DataFrame(
        [
            {
                "event_id": i,
                "ts": pd.Timestamp(ts.replace("Z", "")),
                "user_id": u,
                "value": v,
            }
            for i, ts, u, v in rows
        ]
    )
    con = duckdb.connect()
    con.register("events", events_pdf)
    want = sorted(
        (u, s.isoformat(), e.isoformat(), n, tv)
        for u, s, e, n, tv in con.execute(
            sessionize_closed_sql(max_events=2)
        ).fetchall()
    )
    assert got == want
    # and the hand-derived shape: user 7 closes blocks (1,2), (3,4),
    # (5) — the gap straggler closes the 1-event residual — while
    # user 8's exactly-cap block stays open (close-on-overflow); user
    # 9's same-ts run splits by event_id into (9,10) then (11), with
    # the block values proving the MEMBERSHIP, not just the counts
    # (in the sorted order user 9's 1-event block sorts first)
    assert [(u, n) for u, _, _, n, _ in got] == [
        (7, 2), (7, 2), (7, 1), (9, 1), (9, 2)
    ]
    assert sorted(tv for u, _, _, _, tv in got if u == 9) == [4.0, 4.5]
    assert [
        (n, tv) for u, _, _, n, tv in got if u == 9
    ] == [(1, 4.5), (2, 4.0)]  # membership: (9,10) together, (11) alone


def test_sessionize_fold_raises_on_null_value_and_ts():
    """ADVICE r11 #2: the vectorized fold must FAIL LOUDLY on NULL/NaN
    value or NaT ts — the old per-row ``int(round(float(v)))`` loop
    raised, and the numpy casts would otherwise turn NaN into
    INT64_MIN garbage cents (silent session-total corruption)."""
    import numpy as np
    import pandas as pd
    import pytest as _pytest

    from logistics_data_pipeline_spark.streaming.windowed import (
        _sessionize_group,
    )

    class FakeState:
        exists = False

        def update(self, t):
            self.tup = t

    def run(pdf):
        return list(_sessionize_group((1,), iter([pdf]), FakeState()))

    ok = pd.DataFrame(
        {
            "user_id": [1, 1],
            "event_id": [1, 2],
            "ts": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 00:01:00"]),
            "value": [1.25, 2.50],
        }
    )
    run(ok)  # sane input folds fine
    with _pytest.raises(ValueError, match="NULL/NaN value"):
        run(ok.assign(value=[1.25, np.nan]))
    with _pytest.raises(ValueError, match="NULL ts"):
        run(ok.assign(ts=pd.to_datetime(["2024-01-01", pd.NaT])))
