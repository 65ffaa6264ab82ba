"""Unit tests for dataset-curation operators (llm/curation.py) and the
temporal band-join / cube additions — fixture-level semantics that the
sf0.01 oracle gate can't pin down (boundaries, determinism, totality).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from logistics_data_pipeline_spark.llm import curation
from logistics_data_pipeline_spark.operators import temporal


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("word text sample "), F.col("id").cast("string")).alias("text"),
        F.lit("en").alias("lang"),
        (F.col("id") % 4).cast("string").alias("source"),
        F.lit(20).alias("n_chars"),
    )


class TestSplitAssign:
    def test_totality_and_determinism(self, spark):
        docs = _docs(spark)
        a = curation.split_assign(docs).collect()
        b = curation.split_assign(docs).collect()
        assert a == b
        assert len(a) == 200
        assert {r.split for r in a} <= {"train", "val", "test"}

    def test_fractions_roughly_honored(self, spark):
        counts = {
            r.split: r.n
            for r in curation.split_assign(_docs(spark, 1000))
            .groupBy("split")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        # md5 buckets are uniform: 10% +- a generous binomial margin
        assert 60 <= counts.get("test", 0) <= 140
        assert 60 <= counts.get("val", 0) <= 140
        assert counts["train"] >= 700

    def test_split_is_content_independent(self, spark):
        docs = _docs(spark)
        relabeled = docs.withColumn("text", F.lit("totally different"))
        orig = {r.doc_id: r.split for r in curation.split_assign(docs).collect()}
        new = {r.doc_id: r.split for r in curation.split_assign(relabeled).collect()}
        assert orig == new


class TestStratifiedSample:
    def test_at_most_k_per_stratum_and_deterministic(self, spark):
        docs = _docs(spark)
        out = curation.stratified_sample(docs, per_source=3)
        per = out.groupBy("source").agg(F.count("*").alias("n")).collect()
        assert all(r.n == 3 for r in per)  # 50 docs/source, so exactly k
        assert out.collect() == curation.stratified_sample(docs, per_source=3).collect()

    def test_small_stratum_keeps_all(self, spark):
        docs = _docs(spark, 2)  # sources "0" and "1", one doc each
        out = curation.stratified_sample(docs, per_source=5).collect()
        assert len(out) == 2
        assert all(r.sample_rank == 1 for r in out)


class TestRepetitionStats:
    def test_hand_computed_bigrams(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b a b a b"), (2, "all words differ here now")],
            ["doc_id", "text"],
        )
        rows = {r.doc_id: r for r in curation.repetition_stats(docs).collect()}
        # doc 1: bigrams = ab, ba, ab, ba, ab -> n=5, max=3, all repeated
        assert rows[1].n_bigrams == 5
        assert rows[1].max_bigram_count == 3
        assert abs(rows[1].top_bigram_frac - 0.6) < 1e-9
        assert rows[1].dup_bigram_frac == 1.0
        # doc 2: 4 distinct bigrams, none repeated
        assert rows[2].n_bigrams == 4
        assert rows[2].max_bigram_count == 1
        assert rows[2].dup_bigram_frac == 0.0

    def test_single_token_doc_has_no_row(self, spark):
        docs = spark.createDataFrame([(1, "lonely")], ["doc_id", "text"])
        assert curation.repetition_stats(docs).count() == 0


class TestMixtureWeights:
    def test_uniform_target_math(self, spark):
        docs = spark.createDataFrame(
            [(i, "t", "en", "big" if i < 30 else "small", 1) for i in range(40)],
            ["doc_id", "text", "lang", "source", "n_chars"],
        )
        rows = {r.source: r for r in curation.mixture_weights(docs).collect()}
        # target = 40/2 = 20 docs/source
        assert rows["big"].n_docs == 30 and rows["small"].n_docs == 10
        assert abs(rows["big"].sampling_weight - 20 / 30) < 1e-6
        assert abs(rows["small"].sampling_weight - 2.0) < 1e-6
        assert rows["big"].sample_prob == rows["big"].sampling_weight
        assert rows["small"].sample_prob == 1.0  # upsampling capped


class TestInvertedIndex:
    def test_postings_sorted_and_df_filtered(self, spark):
        docs = spark.createDataFrame(
            [(3, "apple banana"), (1, "apple apple"), (2, "banana x9")],
            ["doc_id", "text"],
        )
        rows = {r.token: r for r in curation.inverted_index(docs).collect()}
        assert set(rows) == {"apple", "banana"}  # x9 non-alpha, df=1 dropped
        assert rows["apple"].postings == "1,3"
        assert rows["apple"].doc_freq == 2 and rows["apple"].total_tf == 3


class TestClickAttribution:
    def test_window_boundaries_and_bucket_crossing(self, spark):
        t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

        def ev(eid, uid, typ, offset_s):
            return (eid, t0 + dt.timedelta(seconds=offset_s), uid, typ, 1.0, "{}")

        events = spark.createDataFrame(
            [
                ev(100, 1, "purchase", 0),
                ev(1, 1, "click", 0),  # at purchase ts: counted (inclusive)
                ev(2, 1, "click", -1800),  # exactly -30min: excluded (exclusive)
                ev(3, 1, "click", -1799),  # just inside window
                ev(4, 1, "click", -1),  # inside, same bucket as purchase
                ev(5, 1, "click", -3000),  # before window
                ev(6, 1, "click", 10),  # after purchase
                ev(7, 2, "click", -5),  # other user
                ev(101, 2, "purchase", 0),
            ],
            ["event_id", "ts", "user_id", "event_type", "value", "props"],
        )
        rows = {
            r.purchase_id: r.n_prior_clicks
            for r in temporal.purchase_click_attribution(events).collect()
        }
        assert rows[100] == 3  # clicks 1, 3, 4
        assert rows[101] == 1  # click 7

    def test_purchase_with_no_clicks_kept_at_zero(self, spark):
        events = spark.createDataFrame(
            [(1, dt.datetime(2026, 1, 1), 9, "purchase", 1.0, "{}")],
            ["event_id", "ts", "user_id", "event_type", "value", "props"],
        )
        rows = temporal.purchase_click_attribution(events).collect()
        assert len(rows) == 1 and rows[0].n_prior_clicks == 0


class TestPivotUnpivotRoundTrip:
    def test_unpivot_restores_long_form_with_zeros(self, spark):
        events = spark.createDataFrame(
            [
                (1, dt.datetime(2026, 1, 1, 8), 1, "click", 1.0, "{}"),
                (2, dt.datetime(2026, 1, 1, 9), 1, "click", 1.0, "{}"),
                (3, dt.datetime(2026, 1, 2, 8), 2, "signup", 1.0, "{}"),
            ],
            ["event_id", "ts", "user_id", "event_type", "value", "props"],
        )
        out = {
            (r.event_date, r.event_type): r.n_events
            for r in temporal.daily_type_unpivot(events).collect()
        }
        # 2 days x 5 types, zero cells materialized
        assert len(out) == 10
        assert out[("2026-01-01", "click")] == 2
        assert out[("2026-01-02", "signup")] == 1
        assert out[("2026-01-01", "purchase")] == 0


class TestCube:
    def test_grand_total_and_marginals(self, spark):
        events = spark.createDataFrame(
            [
                (1, dt.datetime(2026, 1, 1, 8), 1, "click", 2.0, "{}"),
                (2, dt.datetime(2026, 1, 2, 9), 1, "click", 3.0, "{}"),
                (3, dt.datetime(2026, 1, 1, 10), 2, "signup", 5.0, "{}"),
            ],
            ["event_id", "ts", "user_id", "event_type", "value", "props"],
        )
        rows = temporal.daily_type_cube(events).collect()
        grand = [r for r in rows if r.g_date == 1 and r.g_type == 1]
        assert len(grand) == 1 and grand[0].n_events == 3 and grand[0].total_value == 10.0
        by_type = {
            r.event_type: r.n_events for r in rows if r.g_date == 1 and r.g_type == 0
        }
        assert by_type == {"click": 2, "signup": 1}
        assert len(rows) == 3 + 2 + 2 + 1  # cells + day marginals + type marginals + grand


class TestPiiScrub:
    def test_redacts_and_counts(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "contact me at alice@example.com or +1 (555) 123-4567 ok"),
                (2, "no pii here at all"),
                (3, "two mails a@b.io c@d.org"),
            ],
            ["doc_id", "text"],
        )
        rows = {r.doc_id: r for r in curation.pii_scrub(docs).collect()}
        assert rows[1].n_emails == 1 and rows[1].n_phones == 1 and rows[1].was_scrubbed
        assert rows[2].n_emails == 0 and rows[2].n_phones == 0 and not rows[2].was_scrubbed
        assert rows[3].n_emails == 2

    def test_scrubbed_hash_stable_and_pii_free(self, spark):
        docs = spark.createDataFrame([(1, "mail alice@example.com end")], ["doc_id", "text"])
        import hashlib

        expected = hashlib.md5(b"mail <EMAIL> end").hexdigest()
        assert curation.pii_scrub(docs).collect()[0].scrubbed_md5 == expected


def test_pack_sequences_next_fit_semantics(spark):
    """Within a pack group, docs pack in doc_id order; a doc opens a new
    sequence iff the current one would overflow; oversized docs sit
    alone (possibly overflowing). Single group => fully deterministic."""
    from logistics_data_pipeline_spark.llm.curation import pack_sequences

    def words(n):
        return " ".join(f"w{i}" for i in range(n))

    docs = spark.createDataFrame(
        [(0, words(100)), (16, words(100)), (32, words(100)),  # 100+100 fit, 3rd spills
         (48, words(300)),                                      # oversized: alone
         (64, words(10))],
        ["doc_id", "text"],
    )
    got = {r.doc_id: (r.seq_in_group, r.fill_after)
           for r in pack_sequences(docs, capacity=256, n_groups=16).collect()}
    assert got == {0: (1, 100), 16: (1, 200), 32: (2, 100),
                   48: (3, 300), 64: (4, 10)}


def test_pack_sequences_groups_are_independent(spark):
    """Docs in different hash groups never share a sequence id space;
    every non-oversized sequence respects capacity."""
    from logistics_data_pipeline_spark.llm.curation import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(1 + i % 40))) for i in range(80)],
        ["doc_id", "text"],
    )
    rows = pack_sequences(docs, capacity=64, n_groups=4).collect()
    assert {r.pack_group for r in rows} == {0, 1, 2, 3}
    assert all(r.pack_group == r.doc_id % 4 for r in rows)
    # fill_after never exceeds capacity unless the doc alone exceeds it
    assert all(r.fill_after <= 64 or r.n_tokens > 64 for r in rows)


def test_user_funnel_sequencing_semantics(spark):
    """A click BEFORE any view must not convert; strict-after ordering
    gates each step on the previous step's first-touch time."""
    from datetime import datetime

    from logistics_data_pipeline_spark.operators.analytics import user_funnel

    def ev(i, u, typ, m):
        return (i, datetime(2025, 1, 1, 0, m), u, typ, 1.0, "{}")

    rows = [
        # u1: full ordered funnel
        ev(1, 1, "view", 0), ev(2, 1, "click", 1), ev(3, 1, "purchase", 2),
        # u2: click before view -> stops at view
        ev(4, 2, "click", 0), ev(5, 2, "view", 1),
        # u3: view+click, purchase BEFORE the click -> stops at click
        ev(6, 3, "purchase", 0), ev(7, 3, "view", 1), ev(8, 3, "click", 2),
        # u4: never views -> contributes nothing
        ev(9, 4, "click", 0), ev(10, 4, "purchase", 1),
        # u5: simultaneous view/click (strict > excludes the tie)
        ev(11, 5, "view", 5), ev(12, 5, "click", 5),
    ]
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    got = {r.step: (r.users, r.conv_from_prev, r.conv_from_start)
           for r in user_funnel(events).collect()}
    # views: u1,u2,u3,u5 = 4; clicks-after-view: u1,u3 = 2; purchases: u1
    assert got[1] == (4, None, 1.0)
    assert got[2] == (2, 0.5, 0.5)
    assert got[3] == (1, 0.5, 0.25)


class TestVocabEntropy:
    def test_uniform_vocab_efficiency_one(self, spark):
        # 4 distinct tokens, each exactly once per doc → uniform unigram
        # distribution → entropy = ln(V), efficiency = 1, hapax only if c==1
        from logistics_data_pipeline_spark.llm import text as llm_text

        docs = spark.createDataFrame(
            [(1, "a b c d"), (2, "a b c d")],
            "doc_id long, text string",
        )
        row = llm_text.vocab_entropy(docs).collect()[0]
        assert row.n_tokens == 8 and row.n_types == 4
        assert row.hapax_frac == 0.0
        import math

        assert abs(row.entropy_nats - round(math.log(4), 6)) < 1e-9
        assert row.efficiency == 1.0

    def test_single_token_entropy_zero(self, spark):
        from logistics_data_pipeline_spark.llm import text as llm_text

        docs = spark.createDataFrame([(1, "x x x")], "doc_id long, text string")
        row = llm_text.vocab_entropy(docs).collect()[0]
        assert row.entropy_nats == 0.0 and row.n_types == 1
        assert row.efficiency is None  # ln(V)=0 → NULL, not divide-by-zero


class TestZipfFit:
    def test_exact_powerlaw_recovers_slope(self, spark):
        # freq(rank) = 2^(10-rank) → ln f = 10·ln2 − rank·ln2; ranks are
        # 1..8 so the regression on ln(rank) is not exactly linear, but a
        # perfectly Zipfian corpus freq = C/rank gives slope −1, r2 = 1.
        from logistics_data_pipeline_spark.llm import text as llm_text

        rows = []
        doc = []
        c = 840  # divisible by 1..8 → freq_i = 840/i exactly
        for i in range(1, 9):
            doc.extend([f"tok{i:02d}"] * (c // i))
        rows.append((1, " ".join(doc)))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        row = llm_text.zipf_fit(docs, n_ranks=8).collect()[0]
        assert row.n_ranks == 8
        assert abs(row.zipf_slope + 1.0) < 1e-6
        assert row.r2 == 1.0


class TestCmsFreq:
    def test_estimate_never_underestimates(self, spark):
        from logistics_data_pipeline_spark.operators import analytics

        events = spark.range(2000).select(
            F.col("id").alias("event_id"),
            (F.col("id") % 37).alias("user_id"),
        )
        out = analytics.cms_user_freq(events).collect()
        assert len(out) == analytics.CMS_TOP_USERS
        for r in out:
            assert r.cms_estimate >= r.exact_count
            assert r.cms_overestimate == r.cms_estimate - r.exact_count

    def test_sketch_is_fixed_size(self, spark):
        # the cells aggregation must never exceed depth × width rows
        from logistics_data_pipeline_spark.operators import analytics

        events = spark.range(5000).select(
            F.col("id").alias("event_id"), (F.col("id") % 997).alias("user_id")
        )
        # estimate for a heavy hitter stays close at this load factor
        out = analytics.cms_user_freq(events).collect()
        worst = max(r.cms_overestimate for r in out)
        assert worst <= 5000 // analytics.CMS_WIDTH * 4


class TestRepeatedPassages:
    def test_cross_doc_span_found_and_singletons_dropped(self, spark):
        from logistics_data_pipeline_spark.llm import dedup

        boiler = "all rights reserved contact us for more information"  # 8 toks
        docs = spark.createDataFrame(
            [
                (1, boiler + " unique one"),
                (2, "prefix text here " + boiler),
                (3, "totally different words with no repeats at all whatsoever"),
            ],
            "doc_id long, text string",
        )
        out = dedup.repeated_passages(docs, n=8).collect()
        assert any(r.passage == boiler and r.n_docs == 2 for r in out)
        # no span private to doc 3 survives the n_docs >= 2 filter
        assert all(r.n_docs >= 2 for r in out)

    def test_within_doc_repeat_is_not_cross_doc(self, spark):
        from logistics_data_pipeline_spark.llm import dedup

        span = "one two three four five six seven eight"
        docs = spark.createDataFrame(
            [(1, span + " " + span)], "doc_id long, text string"
        )
        assert dedup.repeated_passages(docs, n=8).count() == 0


class TestMipsVsCosine:
    def test_magnitude_changes_ranking(self, spark):
        # a long vector pointing slightly off beats a short aligned one
        # under inner product but loses under cosine
        from logistics_data_pipeline_spark.llm import similarity

        rows = [
            (0, [1.0, 0.0], 0),      # query
            (10, [0.9, 0.0], 0),     # aligned, short
            (11, [5.0, 2.0], 0),     # off-axis, long
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
        mips = {r.neighbor_id: r.rank for r in similarity.mips_topk(emb, n_queries=1, k=2).collect()}
        assert mips[11] == 1 and mips[10] == 2

    def test_percentile_interpolation(self, spark):
        from logistics_data_pipeline_spark.operators import analytics

        orders = spark.createDataFrame(
            [(i, "1-URGENT", float(v)) for i, v in enumerate([10, 20, 30, 40])],
            "o_orderkey long, o_orderpriority string, o_totalprice double",
        )
        out = {r.q_idx: r.value for r in analytics.price_percentiles(orders).collect()}
        assert out[1] == 25.0  # median of 10,20,30,40 interpolates
        assert out[0] == 17.5  # 0.25 → 10 + 0.75·10


class TestPcaProject:
    def _emb(self, spark, n=60, d=6, seed=3):
        import numpy as np

        rng = np.random.default_rng(seed)
        # anisotropic cloud: dim 0 dominates variance, dim 1 second
        base = rng.normal(size=(n, d)) * np.array([5.0, 2.0] + [0.3] * (d - 2))
        rows = [(i, [float(x) for x in base[i]], 0) for i in range(n)]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )

    def test_scores_centered_and_variance_ordered(self, spark):
        import numpy as np

        from logistics_data_pipeline_spark.llm import similarity

        emb = self._emb(spark)
        out = similarity.pca_project(emb, n_components=3).collect()
        by_pc = {}
        for r in out:
            by_pc.setdefault(r.pc, []).append(r.score)
        for pc, scores in by_pc.items():
            assert abs(float(np.mean(scores))) < 1e-3  # centered
        vars_ = [float(np.var(by_pc[k])) for k in sorted(by_pc)]
        assert vars_[0] >= vars_[1] >= vars_[2]  # eigenvalue ordering
        # the dominant axis must capture most of the injected variance
        assert vars_[0] > 3 * vars_[1]

    def test_deterministic_across_runs(self, spark):
        from logistics_data_pipeline_spark.llm import similarity

        emb = self._emb(spark)
        a = similarity.pca_project(emb, n_components=2).collect()
        b = similarity.pca_project(emb, n_components=2).collect()
        assert a == b

    def test_empty_input_yields_empty_frame(self, spark):
        from logistics_data_pipeline_spark.llm import similarity

        # no rows -> empty output of the declared schema, not a
        # ValueError from max() over empty moments (ADVICE r4)
        empty = spark.createDataFrame(
            [], "vec_id long, embedding array<float>, label int"
        )
        out = similarity.pca_project(empty, n_components=2)
        assert out.count() == 0
        assert [f.name for f in out.schema.fields] == ["vec_id", "pc", "score"]

    def test_covariance_symmetric_diag_positive(self, spark):
        from logistics_data_pipeline_spark.llm import similarity

        emb = self._emb(spark, n=30)
        rows = similarity.dim_covariance(emb).collect()
        diag = [r.cov for r in rows if r.dim_i == r.dim_j]
        assert all(v > 0 for v in diag)
        # upper triangle only, every (i<=j) pair exactly once
        seen = {(r.dim_i, r.dim_j) for r in rows}
        d = max(r.dim_j for r in rows) + 1
        assert len(seen) == d * (d + 1) // 2


class TestTripletMining:
    def test_positive_same_label_negative_other_label(self, spark):
        from logistics_data_pipeline_spark.llm import similarity

        rows = [
            (0, [1.0, 0.0], 7),    # anchor, label 7
            (10, [0.9, 0.1], 7),   # near positive
            (11, [0.5, 0.5], 7),   # farther positive
            (12, [1.0, 0.01], 3),  # VERY near but wrong label -> hard negative
            (13, [-1.0, 0.0], 3),  # far negative
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        out = similarity.triplet_mining(emb, n_anchors=1).collect()
        assert len(out) == 1
        r = out[0]
        assert r.pos_id == 10 and r.neg_id == 12
        assert abs(r.margin - (r.pos_cos - r.neg_cos)) < 1e-9
        # the mined negative is HARDER (more similar) than the far one
        assert r.neg_cos > 0.9

    def test_media_dup_groups_keeper_and_reclaim(self, spark):
        from logistics_data_pipeline_spark.llm import multimodal

        docs = spark.createDataFrame(
            [(5, "same bytes", "web"), (2, "same bytes", "web"), (9, "unique", "web")],
            "doc_id long, text string, source string",
        )
        rows = {r.checksum: r for r in multimodal.media_dup_groups(docs).collect()}
        dup = [r for r in rows.values() if r.n_copies == 2][0]
        assert dup.keeper_id == 2  # min media_id survives
        assert dup.reclaimable_bytes == len("same bytes")
        single = [r for r in rows.values() if r.n_copies == 1][0]
        assert single.reclaimable_bytes == 0


class TestChi2AndBasket:
    def test_independent_table_chi2_zero(self, spark):
        from logistics_data_pipeline_spark.llm import text as llm_text

        # perfectly independent 2x2: every (lang, source) cell equal
        rows = [
            (i, "t", lang, src, 1)
            for i, (lang, src) in enumerate(
                [(l, s) for l in ("en", "de") for s in ("a", "b")] * 10
            )
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars int"
        )
        r = llm_text.lang_source_chi2(docs).collect()[0]
        assert r.n_docs == 40 and r.n_cells == 4 and r.dof == 1
        assert r.chi2 == 0.0 and r.cramers_v == 0.0

    def test_perfect_association_cramers_one(self, spark):
        from logistics_data_pipeline_spark.llm import text as llm_text

        # each language locked to its own source -> V = 1
        rows = [(i, "t", "en", "a", 1) for i in range(10)] + [
            (i + 10, "t", "de", "b", 1) for i in range(10)
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars int"
        )
        r = llm_text.lang_source_chi2(docs).collect()[0]
        assert r.cramers_v == 1.0

    def test_basket_lift_math(self, spark):
        from logistics_data_pipeline_spark.operators import analytics

        # 4 orders; parts 1 and 2 always together, part 3 alone
        rows = [
            (1, 1), (1, 2),
            (2, 1), (2, 2),
            (3, 3),
            (4, 3),
        ]
        lineitem = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
        out = analytics.market_basket_pairs(lineitem).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.part_a, r.part_b) == (1, 2)
        assert r.pair_orders == 2 and r.orders_a == 2 and r.orders_b == 2
        # lift = P(ab)/(P(a)P(b)) = (2/4)/((2/4)(2/4)) = 2
        assert r.lift == 2.0

    def test_basket_dedups_within_order(self, spark):
        from logistics_data_pipeline_spark.operators import analytics

        # the same part twice in one order must not double-count support
        rows = [(1, 7), (1, 7), (1, 8)]
        lineitem = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
        r = analytics.market_basket_pairs(lineitem).collect()[0]
        assert r.pair_orders == 1


class TestHllRollup:
    def test_sketch_merge_lossless_and_bounded_error(self, spark):
        from logistics_data_pipeline_spark.operators import analytics

        events = spark.range(20000).select(
            F.col("id").alias("event_id"),
            (F.unix_timestamp(F.lit("2026-01-01 00:00:00"))
             + F.col("id") * 60).cast("timestamp").alias("ts"),
            (F.col("id") % 1777).alias("user_id"),
            F.when(F.col("id") % 3 == 0, "click").otherwise("view").alias(
                "event_type"
            ),
        )
        out = analytics.hll_rollup(events).collect()
        levels = {r.level for r in out}
        assert levels == {"type_day", "type", "all"}
        # merge losslessness: union of per-day sketches must equal a
        # direct sketch over the same rows — compare at the type level
        direct = {
            r.event_type: r.est
            for r in events.groupBy("event_type")
            .agg(
                F.hll_sketch_estimate(
                    F.hll_sketch_agg("user_id")
                ).cast("bigint").alias("est")
            )
            .collect()
        }
        for r in out:
            if r.level == "type":
                assert r.n_hll == direct[r.event_type], r
        # nominal HLL error bound (lgConfigK=12 -> ~1.6% sigma; allow 5%)
        for r in out:
            assert r.rel_error is not None and r.rel_error < 0.05, r


class TestMadAndSkew:
    def test_mad_resists_burst_that_blinds_sigma(self, spark):
        from logistics_data_pipeline_spark.operators import analytics

        # 100 normal values + a burst of 10 extremes: mean/sigma swallow
        # the burst (sigma explodes), median/MAD keep flagging it
        rows = [(i, "click", 10.0 + (i % 7) * 0.1) for i in range(100)]
        rows += [(100 + i, "click", 5000.0) for i in range(10)]
        events = spark.createDataFrame(rows, "event_id long, event_type string, value double")
        flagged = {r.event_id for r in analytics.value_anomalies_mad(events).collect()}
        assert all(100 + i in flagged for i in range(10))
        assert not any(i in flagged for i in range(100))

    def test_mad_zero_group_is_dropped_not_inf(self, spark):
        from logistics_data_pipeline_spark.operators import analytics

        # >=50% identical values -> MAD=0; the NULLIF guard must drop
        # the whole group (no inf/NULL robust_z rows) instead of
        # emitting engine-dependent infinities (ADVICE r4)
        rows = [(i, "const", 7.0) for i in range(20)]
        rows += [(100, "const", 9999.0)]  # extreme but MAD is still 0
        rows += [(200 + i, "vary", float(i)) for i in range(20)]
        rows += [(300, "vary", 1e6)]
        events = spark.createDataFrame(
            rows, "event_id long, event_type string, value double"
        )
        out = analytics.value_anomalies_mad(events).collect()
        assert all(r.event_type != "const" for r in out)
        assert any(r.event_id == 300 for r in out)
        assert all(r.robust_z is not None for r in out)

    def test_skew_panel_extremes(self, spark):
        from logistics_data_pipeline_spark.operators import analytics

        # perfectly even keys
        even = spark.range(1000).select(
            F.col("id").alias("event_id"), (F.col("id") % 10).alias("user_id")
        )
        r = analytics.key_skew_stats(even).collect()[0]
        assert r.n_keys == 10 and r.top1_share == 0.1
        assert r.key_entropy_norm == 1.0 and r.max_over_mean == 1.0
        # one pathological hot key
        skewed = spark.range(1000).select(
            F.col("id").alias("event_id"),
            F.when(F.col("id") < 991, 0).otherwise(F.col("id")).alias("user_id"),
        )
        r = analytics.key_skew_stats(skewed).collect()[0]
        assert r.top1_share == 0.991
        assert r.key_entropy_norm < 0.05
        assert r.max_over_mean > 9


class TestDauWau:
    def test_rolling_distinct_semantics(self, spark):
        from logistics_data_pipeline_spark.operators import temporal

        t0 = dt.datetime(2026, 3, 1, 12, 0, 0)
        rows = []
        # day 0: users 1,2 ; day 3: user 2 (again) ; day 8: user 3
        for eid, (d, u) in enumerate([(0, 1), (0, 2), (3, 2), (8, 3)]):
            rows.append((eid, t0 + dt.timedelta(days=d), u))
        events = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
        out = {r.day: r for r in temporal.dau_wau_stickiness(events).collect()}
        assert set(out) == {"2026-03-01", "2026-03-04", "2026-03-09"}
        # day 3's trailing week covers day 0: users {1,2} -> wau 2, dau 1
        r = out["2026-03-04"]
        assert r.dau == 1 and r.wau == 2 and r.stickiness == 0.5
        # day 8's trailing week is days 2..8: day-3 activity (user 2) is
        # in, day-0 activity is out -> {2, 3}
        r = out["2026-03-09"]
        assert r.dau == 1 and r.wau == 2 and r.stickiness == 0.5
        # same user active twice in one window counts once
        r = out["2026-03-01"]
        assert r.wau == 2


class TestRound5Ops:
    def test_containment_catches_quote_jaccard_misses(self, spark):
        from logistics_data_pipeline_spark.llm import dedup

        # doc 1 is quoted wholesale inside doc 2 (which is much longer):
        # containment must be 1.0 even though Jaccard is far below 0.6
        quote = " ".join(f"q{i}" for i in range(12))
        filler = " ".join(f"f{i}" for i in range(80))
        docs = spark.createDataFrame(
            [(1, quote), (2, quote + " " + filler), (3, "unrelated " * 20)],
            "doc_id long, text string",
        )
        out = {(r.a_id, r.b_id): r for r in dedup.containment_pairs(docs).collect()}
        assert (1, 2) in out
        r = out[(1, 2)]
        assert r.containment == 1.0
        assert r.n_a < r.n_b
        jac = r.n_shared / (r.n_a + r.n_b - r.n_shared)
        assert jac < 0.6  # Jaccard dedup would have missed this pair

    def test_snapshot_diff_classes(self, spark):
        from logistics_data_pipeline_spark.llm import curation

        docs = spark.createDataFrame(
            [(i, f"text {i}") for i in range(100)], "doc_id long, text string"
        )
        out = curation.snapshot_diff(docs).collect()
        by_class = {}
        for r in out:
            by_class.setdefault(r.change, set()).add(r.doc_id)
        assert by_class["added"] == {i for i in range(100) if i % 10 == 9}
        assert by_class["removed"] == {i for i in range(100) if i % 10 == 0}
        # changed = edited docs present in BOTH snapshots
        assert by_class["changed"] == {
            i for i in range(100) if i % 7 == 0 and i % 10 not in (0, 9)
        }
        # added rows have no old fingerprint, removed rows no new one
        assert all(r.old_fp is None for r in out if r.change == "added")
        assert all(r.new_fp is None for r in out if r.change == "removed")

    def test_quality_classifier_bounds_and_determinism(self, spark):
        from logistics_data_pipeline_spark.llm import text as llm_text

        docs = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, ""), (3, "alpha beta gamma")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in llm_text.quality_classifier(docs).collect()}
        # pinned weights are in [-0.5, 0.5), so the mean is too
        assert -0.5 <= out[1].cls_score < 0.5
        assert out[1] == out[3].__class__(doc_id=1, **{
            k: v for k, v in out[3].asDict().items() if k != "doc_id"
        })  # same text -> identical score row
        # tokenless doc: no features, NULL score, keep=False
        assert out[2].n_feat_tokens == 0
        assert out[2].cls_score is None and out[2].keep is False

    def test_bpe_pair_counts_hand_checked(self, spark):
        from logistics_data_pipeline_spark.llm import text as llm_text

        # vocab: "aaa" x2 occurrences -> pairs aa,aa per occurrence = 4
        #        "ab"  x3 occurrences -> ab 3; "b" contributes nothing
        docs = spark.createDataFrame(
            [(1, "aaa ab"), (2, "aaa ab ab b")], "doc_id long, text string"
        )
        out = {r.pair: r.pair_count for r in llm_text.bpe_pair_counts(docs).collect()}
        assert out == {"aa": 4, "ab": 3}


class TestKmeansUpdateAndNovelty:
    def test_lloyd_update_moves_toward_members(self, spark):
        import numpy as np

        from logistics_data_pipeline_spark.llm import similarity

        # two well-separated label clusters; the label-centroid init is
        # already optimal, so one Lloyd step must be a (near) fixpoint:
        # every vector stays in its label cell and new == mean == old
        rng = np.random.default_rng(7)
        rows = []
        for i in range(40):
            lab = i % 2
            base = np.array([5.0, 0.0, 0.0, 0.0]) if lab == 0 else np.array([0.0, 5.0, 0.0, 0.0])
            rows.append((i, [float(x) for x in base + rng.normal(scale=0.05, size=4)], lab))
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
        out = similarity.kmeans_update(emb).collect()
        assert {r.cell_label for r in out} == {0, 1}
        assert sum({r.cell_label: r.n_members for r in out}.values()) == 40
        for r in out:
            assert abs(r.new_val - r.old_val) < 1e-4  # fixpoint up to rounding

    def test_novelty_order_semantics(self, spark):
        from logistics_data_pipeline_spark.llm import dedup

        text_a = " ".join(f"w{i}" for i in range(12))
        text_b = " ".join(f"v{i}" for i in range(12))
        docs = spark.createDataFrame(
            [(1, text_a), (2, text_a), (3, text_b), (4, "too short")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in dedup.ngram_novelty(docs).collect()}
        assert out[1].novelty == 1.0  # first occurrence owns everything
        assert out[2].novelty == 0.0  # exact dup of an earlier doc
        assert out[3].novelty == 1.0  # disjoint content
        assert out[4].n_shingles == 0 and out[4].novelty is None


class TestBpeMergeStep:
    def test_merge_applied_and_recounted(self, spark):
        from logistics_data_pipeline_spark.llm import text as llm_text

        # "abc" x3, "abd" x1: iteration-0 pairs: 'a b' 4, 'b c' 3, 'b d' 1
        # -> winning merge 'a b'; iteration-1 symbols: ab|c, ab|d
        # -> pairs: 'ab c' 3, 'ab d' 1
        docs = spark.createDataFrame(
            [(1, "abc abc abd"), (2, "abc")], "doc_id long, text string"
        )
        rows = llm_text.bpe_merge_step(docs).collect()
        assert all(r.merge_pair == "a b" for r in rows)
        out = {r.pair: r.pair_count for r in rows}
        assert out == {"ab c": 3, "ab d": 1}


class TestAgreementAndWeightedSample:
    def test_agreement_panel_decomposition(self, spark):
        from logistics_data_pipeline_spark.llm import dedup

        body = " ".join(f"w{i}" for i in range(30))
        docs = spark.createDataFrame(
            [
                (1, body),
                (2, body),  # exact dup: jaccard 1.0, containment 1.0
                (3, body + " " + " ".join(f"x{i}" for i in range(200))),
                # doc 3 contains doc 1 (containment 1.0, jaccard low)
                (4, "totally different " + " ".join(f"z{i}" for i in range(30))),
            ],
            "doc_id long, text string",
        )
        out = {r.method: r.n_pairs for r in dedup.dedup_method_agreement(docs).collect()}
        assert out["exact_hash"] == 1  # (1,2)
        assert out["containment"] >= 3  # (1,2),(1,3),(2,3)
        assert out["containment_only"] >= 2  # the quote pairs
        assert out["jaccard"] == out["jaccard_and_containment"] + out["jaccard_only"]
        assert out["containment"] == out["jaccard_and_containment"] + out["containment_only"]

    def test_weighted_sample_deterministic_and_biased(self, spark):
        from pyspark.sql import functions as F

        from logistics_data_pipeline_spark.llm import curation

        docs = spark.range(2000).select(
            F.col("id").alias("doc_id"),
            F.lit("t").alias("text"),
            # half the corpus 100x heavier: expect it to dominate the sample
            F.when(F.col("id") % 2 == 0, 1000).otherwise(10).alias("n_chars"),
        )
        a = curation.weighted_sample(docs).collect()
        b = curation.weighted_sample(docs).collect()
        assert a == b and len(a) == 100
        heavy = sum(1 for r in a if r.n_chars == 1000)
        assert heavy >= 85  # weight-proportional, not uniform
        assert all(r.es_key <= 0 for r in a)


class TestMediaSliceNeardup:
    def test_partial_corruption_still_pairs(self, spark):
        from logistics_data_pipeline_spark.llm import multimodal

        base = "".join(f"block{i:02d} " for i in range(64)).strip()  # 575 ascii chars
        # corrupt one slice-sized region near the middle -> 8ths mostly intact
        corrupted = base[:300] + "X" * 10 + base[310:]
        different = "z" * len(base)
        docs = spark.createDataFrame(
            [(1, base), (2, base), (3, corrupted), (4, different)],
            "doc_id long, text string",
        )
        docs = docs.select("doc_id", "text", F.lit("en").alias("lang"),
                           F.lit("s").alias("source"),
                           F.length("text").cast("long").alias("n_chars"))
        out = {(r.a_id, r.b_id): r.n_slices_matched
               for r in multimodal.media_slice_neardup(docs).collect()}
        assert out[(1, 2)] == 8          # exact dup: all slices
        assert 6 <= out[(1, 3)] <= 7     # one corrupted region
        assert (1, 4) not in out and (2, 4) not in out


class TestAnnRecallPanel:
    def test_panel_structure_and_mean_consistency(self, spark, sf_dir):
        from logistics_data_pipeline_spark.adapters.testdata import load_table
        from logistics_data_pipeline_spark.llm import similarity

        emb = load_table(spark, sf_dir, "embeddings")
        rows = similarity.ann_recall_panel(emb).collect()
        methods = {r.method for r in rows}
        assert methods == {"ivf", "ivfpq", "graph_beam", "graph_pq"}
        # the graph paths should beat the cell-probing paths on this
        # corpus (ann_eval: 0.98 vs 0.80/0.82) — pin a 0.9 mean floor
        # on both the full-precision and the PQ-compressed traversal
        for gm in ("graph_beam", "graph_pq"):
            g_mean = [
                r.recall_at_k
                for r in rows
                if r.method == gm and r.query == "mean"
            ]
            assert g_mean and g_mean[0] >= 0.9, (gm, g_mean)
        for m in methods:
            per_q = [r.recall_at_k for r in rows if r.method == m and r.query != "mean"]
            mean = [r.recall_at_k for r in rows if r.method == m and r.query == "mean"]
            assert len(per_q) == 10 and len(mean) == 1
            assert all(0.0 <= x <= 1.0 for x in per_q)
            assert abs(mean[0] - round(sum(per_q) / len(per_q), 6)) <= 1e-6


class TestLatenessPanel:
    def test_disordered_arrivals_bucketed(self, spark):
        import datetime as dt

        from logistics_data_pipeline_spark.operators import temporal

        t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
        rows = []
        # arrival order = event_id; event 1 sets the front, then:
        rows.append((1, t0, 1, "click", 1.0, "{}"))
        rows.append((2, t0 - dt.timedelta(seconds=30), 1, "click", 1.0, "{}"))   # 30s late
        rows.append((3, t0 - dt.timedelta(seconds=120), 1, "click", 1.0, "{}"))  # 2m late
        rows.append((4, t0 + dt.timedelta(hours=1), 1, "click", 1.0, "{}"))      # new front
        rows.append((5, t0 - dt.timedelta(hours=7), 1, "click", 1.0, "{}"))      # ~8h late
        events = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        )
        out = {r.bucket: r.n_events for r in temporal.lateness_panel(events).collect()}
        assert out == {"0_lt_1m": 3, "1_lt_5m": 1, "5_ge_6h": 1}

    def test_bucket_boundary_crossing(self, spark):
        import datetime as dt

        from logistics_data_pipeline_spark.operators import temporal

        # force ids to straddle the 8192-wide scan buckets: the event-time
        # front must carry across bucket boundaries via the prefix max
        t0 = dt.datetime(2026, 1, 1)
        rows = [(10, t0 + dt.timedelta(hours=10), 1, "c", 1.0, "{}")]
        rows.append((8193, t0, 1, "c", 1.0, "{}"))  # next scan bucket, 10h late
        events = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        )
        out = {r.bucket: r.n_events for r in temporal.lateness_panel(events).collect()}
        assert out == {"0_lt_1m": 1, "5_ge_6h": 1}


class TestTfidfCosinePairs:
    def test_rare_shared_vocab_dominates(self, spark):
        from logistics_data_pipeline_spark.llm import text as llm_text

        common = "the a of and to in"
        docs = spark.createDataFrame(
            [
                (1, common + " zeppelin quasar nebula pulsar magnetar"),
                (2, common + " zeppelin quasar nebula pulsar magnetar"),
                (3, common + " gearbox piston crankshaft flywheel camshaft"),
                (4, "wholly disjoint vocabulary here"),
            ],
            "doc_id long, text string",
        )
        out = {(r.a_id, r.b_id): r.cosine
               for r in llm_text.tfidf_cosine_pairs(docs, threshold=0.0).collect()}
        # identical vectors -> cosine exactly 1.0
        assert out[(1, 2)] == 1.0
        # sharing only ubiquitous words scores strictly (and clearly) lower
        assert out[(1, 3)] < out[(1, 2)] - 0.25
        # no shared terms -> the inverted index never pairs them at all
        assert (1, 4) not in out and (3, 4) not in out


class TestSupplierReliability:
    def test_wilson_orders_small_samples_sanely(self, spark):
        import datetime as dt

        from logistics_data_pipeline_spark.operators import tpch_extra

        d0 = dt.datetime(1997, 1, 1)
        supplier = spark.createDataFrame(
            [(1, "all-late-tiny", 0, 0.0), (2, "mostly-late-big", 0, 0.0)],
            "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
        )
        orders = spark.createDataFrame(
            [(1, 1, "O", 1.0, d0, "1-URGENT")],
            "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        )
        late = d0 + dt.timedelta(days=60)
        ontime = d0 + dt.timedelta(days=5)
        rows = [(1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", late)] * 2  # supp1: 2/2 late
        rows += [(1, 1, 2, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", late)] * 90
        rows += [(1, 1, 2, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ontime)] * 10
        lineitem = spark.createDataFrame(
            rows,
            "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
            "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
            "l_returnflag string, l_linestatus string, l_shipdate timestamp",
        )
        out = {r.s_suppkey: r for r in
               tpch_extra.supplier_reliability(supplier, orders, lineitem).collect()}
        # raw rate says supp1 (100%) is worse; Wilson lower bound knows
        # 2 observations prove little and ranks the 90% on 100 obs worse
        assert out[1].late_rate == 1.0 and out[2].late_rate == 0.9
        assert out[2].wilson_lo > out[1].wilson_lo
        assert 0.0 <= out[1].wilson_lo <= 1.0


class TestAbcAnalysis:
    def test_pareto_classes_hand_checked(self, spark):
        import datetime as dt

        from logistics_data_pipeline_spark.operators import tpch_extra

        d0 = dt.datetime(1997, 1, 1)
        part = spark.createDataFrame(
            [(i, f"part{i}", "B", "T", 1, 1.0) for i in range(1, 5)],
            "p_partkey long, p_name string, p_brand string, p_type string, p_size int, p_retailprice double",
        )
        # revenues 70, 20, 6, 4 -> cum shares .70 A, .90 B, .96 C, 1.0 C
        rows = []
        for pk, price in [(1, 70.0), (2, 20.0), (3, 6.0), (4, 4.0)]:
            rows.append((pk, pk, 1, 1, 1.0, price, 0.0, 0.0, "N", "O", d0))
        lineitem = spark.createDataFrame(
            rows,
            "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
            "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
            "l_returnflag string, l_linestatus string, l_shipdate timestamp",
        )
        out = {r.p_partkey: r.abc_class
               for r in tpch_extra.abc_analysis(part, lineitem).collect()}
        assert out == {1: "A", 2: "B", 3: "C", 4: "C"}


class TestRateBursts:
    def test_spike_flagged_against_flat_baseline(self, spark):
        import datetime as dt

        from logistics_data_pipeline_spark.operators import temporal

        t0 = dt.datetime(2026, 1, 1)
        rows, eid = [], 0
        # 30 flat hours at 4/hour, then one 12-event spike hour
        for h in range(30):
            for j in range(4):
                rows.append((eid, t0 + dt.timedelta(hours=h, minutes=j), 1, "click", 1.0, "{}"))
                eid += 1
        for j in range(12):
            rows.append((eid, t0 + dt.timedelta(hours=30, minutes=j), 1, "click", 1.0, "{}"))
            eid += 1
        events = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        )
        out = temporal.rate_bursts(events).collect()
        assert len(out) == 1
        r = out[0]
        assert r.hour == t0 + dt.timedelta(hours=30) and r.n == 12
        assert r.baseline_per_hour == 4.0 and r.burst_ratio == 3.0


class TestChunkDupAndProvenance:
    def test_chunk_dup_share(self, spark):
        from logistics_data_pipeline_spark.llm import curation

        blockA = " ".join(f"a{i}" for i in range(64))
        blockB = " ".join(f"b{i}" for i in range(64))
        blockC = " ".join(f"c{i}" for i in range(64))
        docs = spark.createDataFrame(
            [
                (1, blockA + " " + blockB),  # A shared with doc 2 -> 1/2 dup
                (2, blockA + " " + blockC),  # A shared -> 1/2 dup
                (3, " ".join(f"z{i}" for i in range(64))),  # unique
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in curation.chunk_dup_rate(docs).collect()}
        assert out[1].n_chunks == 2 and out[1].dup_share == 0.5
        assert out[2].dup_share == 0.5
        assert out[3].dup_share == 0.0

    def test_provenance_lists_removed_ids(self, spark):
        from logistics_data_pipeline_spark.llm import dedup

        docs = spark.createDataFrame(
            [(1, "same"), (5, "same"), (3, "same"), (7, "unique")],
            "doc_id long, text string",
        )
        out = {r.keeper_doc_id: r for r in dedup.dedup_provenance(docs).collect()}
        assert set(out) == {1, 7}
        assert out[1].n_removed == 2 and out[1].removed_ids == "3,5"
        assert out[7].n_removed == 0 and out[7].removed_ids == ""


class TestBloomPanel:
    def test_fpr_estimate_tracks_measurement(self, spark, sf_dir):
        from logistics_data_pipeline_spark.adapters.testdata import load_table
        from logistics_data_pipeline_spark.operators import analytics

        r = analytics.bloom_membership_panel(
            load_table(spark, sf_dir, "events")
        ).collect()[0]
        assert 0 < r.bits_set <= analytics.BLOOM_BITS
        assert abs(r.fill_ratio - r.bits_set / analytics.BLOOM_BITS) < 1e-6
        # every probe key is a true negative, so measured fpr is exact;
        # the fill-based estimate must be in the same ballpark (both
        # are small at this scale; x3 covers binomial noise)
        assert 0.0 <= r.measured_fpr <= 1.0
        if r.expected_fpr > 0.001:
            assert r.measured_fpr <= 3 * r.expected_fpr
            assert r.measured_fpr >= r.expected_fpr / 3


class TestNormStats:
    def test_detects_broken_vectors_and_unit_share(self, spark):
        from logistics_data_pipeline_spark.llm import similarity

        rows = [(i, [0.6, 0.8, 0.0, 0.0], 0) for i in range(8)]  # unit
        rows.append((100, [1.2, 1.6, 0.0, 0.0], 0))  # double-scaled
        rows.append((101, [0.0, 0.0, 0.0, 0.0], 0))  # zeroed
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        r = similarity.norm_stats(emb).collect()[0]
        assert r.n_vectors == 10
        assert r.min_norm == 0.0 and r.max_norm == 2.0 and r.median_norm == 1.0
        assert r.frac_unit == 0.8


class TestSeasonalDeviation:
    def test_rush_hour_is_not_an_anomaly_spike_is(self, spark):
        import datetime as dt

        from logistics_data_pipeline_spark.operators import temporal

        t0 = dt.datetime(2026, 1, 1)
        rows, eid = [], 0
        # 10 days: hour 9 always busy (10 events), hour 3 always quiet (2)
        for d in range(10):
            for j in range(10):
                rows.append((eid, t0 + dt.timedelta(days=d, hours=9, minutes=j), 1, "click", 1.0, "{}")); eid += 1
            for j in range(2):
                rows.append((eid, t0 + dt.timedelta(days=d, hours=3, minutes=j), 1, "click", 1.0, "{}")); eid += 1
        # day 10: hour 3 spikes to 8 (4x its profile), hour 9 stays at 10
        for j in range(8):
            rows.append((eid, t0 + dt.timedelta(days=10, hours=3, minutes=j), 1, "click", 1.0, "{}")); eid += 1
        for j in range(10):
            rows.append((eid, t0 + dt.timedelta(days=10, hours=9, minutes=j), 1, "click", 1.0, "{}")); eid += 1
        events = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        )
        out = temporal.seasonal_deviation(events).collect()
        assert len(out) == 1  # the busy-but-normal hour 9 never flags
        r = out[0]
        assert r.hod == 3 and r.event_date == dt.date(2026, 1, 11) and r.n == 8
        assert r.seasonal_ratio > 2.5


class TestWindowedFunnel:
    def test_out_of_window_step_does_not_convert(self, spark):
        import datetime as dt

        from logistics_data_pipeline_spark.operators import analytics

        t0 = dt.datetime(2026, 1, 1)
        rows = [
            # user 1: full journey inside the windows
            (1, t0, 1, "view", 1.0, "{}"),
            (2, t0 + dt.timedelta(hours=2), 1, "click", 1.0, "{}"),
            (3, t0 + dt.timedelta(hours=4), 1, "purchase", 1.0, "{}"),
            # user 2: click arrives 3 days after the view -> no step 2
            (4, t0, 2, "view", 1.0, "{}"),
            (5, t0 + dt.timedelta(days=3), 2, "click", 1.0, "{}"),
            (6, t0 + dt.timedelta(days=3, hours=1), 2, "purchase", 1.0, "{}"),
        ]
        events = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        )
        out = {r.step: r.users for r in analytics.user_funnel_windowed(events).collect()}
        assert out == {1: 2, 2: 1, 3: 1}
        # the unbounded funnel would convert user 2 as well
        unbounded = {r.step: r.users for r in analytics.user_funnel(events).collect()}
        assert unbounded == {1: 2, 2: 2, 3: 2}


class TestExactDupVectors:
    def test_identical_vectors_group(self, spark):
        from logistics_data_pipeline_spark.llm import similarity

        v = [0.1, 0.2, 0.3, 0.4]
        emb = spark.createDataFrame(
            [(1, v, 0), (5, v, 0), (3, v, 0), (9, [0.1, 0.2, 0.3, 0.5], 0)],
            "vec_id long, embedding array<float>, label int",
        )
        out = {r.keeper_vec_id: r.n_copies
               for r in similarity.exact_dup_vectors(emb).collect()}
        assert out == {1: 3, 9: 1}


class TestShingleDfStats:
    def test_buckets_and_pair_math(self, spark):
        from logistics_data_pipeline_spark.llm import dedup

        body = "a b c d e"  # 3 distinct 3-gram shingles
        docs = spark.createDataFrame(
            [(i, body) for i in range(5)] + [(10, "x y z w v")],
            "doc_id long, text string",
        )
        out = {r.df_bucket: r for r in dedup.shingle_df_stats(docs).collect()}
        # shared shingles have df=5 -> bucket 8, pairs 3 * C(5,2) = 30
        assert out[8].n_shingles == 3 and out[8].candidate_pairs == 30
        # unique shingles df=1 -> bucket 1, zero pairs
        assert out[1].candidate_pairs == 0
        assert abs(out[8].pair_share - 1.0) < 1e-9


class TestMinhashErrorPanel:
    def test_error_within_binomial_bound(self, spark):
        from logistics_data_pipeline_spark.llm import dedup

        # overlapping windows of a shared token stream give a spread of
        # true jaccards in [0.3, 1.0]
        w = [f"w{i}" for i in range(80)]
        rows = [(i, " ".join(w[i * 5 : i * 5 + 40])) for i in range(8)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        r = dedup.minhash_error_panel(docs).collect()[0]
        assert r.n_pairs >= 5
        # k=64 binomial: sigma <= 0.5/8 = 0.0625; mean |err| well under
        # 2 sigma, max under ~4 sigma
        assert r.mean_abs_err <= 0.13
        assert r.max_abs_err <= 0.25
        assert abs(r.bias) <= 0.1


class TestHeapsFit:
    def test_growing_vs_saturated_vocabulary(self, spark):
        from logistics_data_pipeline_spark.llm import text as llm_text

        # every doc contributes brand-new tokens -> beta near 1
        growing = spark.createDataFrame(
            [(i, " ".join(f"t{i}x{j}" for j in range(20))) for i in range(256)],
            "doc_id long, text string",
        )
        g = llm_text.heaps_fit(growing).collect()[0]
        assert g.heaps_beta > 0.8 and g.r2 > 0.95

        # fixed 10-token vocabulary -> growth saturates, beta near 0
        fixed = spark.createDataFrame(
            [(i, " ".join(f"w{j}" for j in range(10))) for i in range(256)],
            "doc_id long, text string",
        )
        f = llm_text.heaps_fit(fixed).collect()[0]
        assert f.heaps_beta < 0.05
        assert f.vocab_total == 10


class TestEffectSizes:
    def test_cohens_d_hand_computed(self, spark):
        from logistics_data_pipeline_spark.operators import analytics

        # A: values 1..5 (mean 3); B: values 3..7 (mean 5); equal
        # spread -> pooled sd = sqrt(2.5), d = -2/sqrt(2.5)
        rows = [(i, "A", float(v)) for i, v in enumerate([1, 2, 3, 4, 5])]
        rows += [(10 + i, "B", float(v)) for i, v in enumerate([3, 4, 5, 6, 7])]
        events = spark.createDataFrame(
            rows, "event_id long, event_type string, value double"
        )
        r = analytics.type_effect_sizes(events).collect()[0]
        assert (r.type_a, r.type_b) == ("A", "B")
        assert r.mean_diff == -2.0
        import math

        assert abs(r.cohens_d - (-2.0 / math.sqrt(2.5))) < 1e-6


class TestCosineHistogram:
    def test_bins_cover_all_pairs_and_cumulate(self, spark, sf_dir):
        from logistics_data_pipeline_spark.adapters.testdata import load_table
        from logistics_data_pipeline_spark.llm import similarity

        emb = load_table(spark, sf_dir, "embeddings")
        n = emb.count()
        # 'g' sorts above every hex char -> keeps all pairs (exact
        # histogram); the default 25% governor is oracle hash-matched.
        rows = similarity.cosine_histogram(emb, sample_hex="g").collect()
        assert sum(r.n_pairs for r in rows) == n * (n - 1) // 2
        total = similarity.cosine_histogram(emb).collect()
        # default sample keeps ~25% of pairs (binomial, wide tolerance)
        frac = sum(r.n_pairs for r in total) / (n * (n - 1) // 2)
        assert 0.15 < frac < 0.35
        assert abs(rows[-1].cum_share - 1.0) < 1e-9
        assert all(-1.0 <= r.bin_lo <= 1.0 for r in rows)
        # cumulative share is monotone
        cums = [r.cum_share for r in rows]
        assert cums == sorted(cums)


class TestItemPagerank:
    def test_symmetric_ring_is_uniform_and_hub_wins(self, spark):
        from logistics_data_pipeline_spark.operators import analytics

        # ring of 6 parts: each order links two neighbors -> perfectly
        # symmetric graph, PageRank must be uniform
        rows = []
        for i in range(6):
            rows.append((i, i, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", None))
            rows.append((i, (i + 1) % 6, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", None))
        ring = spark.createDataFrame(
            rows,
            "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
            "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
            "l_returnflag string, l_linestatus string, l_shipdate timestamp",
        )
        out = analytics.item_pagerank(ring, top=6).collect()
        ranks = {r.p_partkey: r.rank_micro for r in out}
        assert len(set(ranks.values())) == 1  # exactly uniform (integer math)
        # star: part 0 co-purchased with everyone, spokes only with 0
        rows = []
        for i in range(1, 7):
            rows.append((100 + i, 0, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", None))
            rows.append((100 + i, i, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", None))
        star = spark.createDataFrame(rows, ring.schema)
        sout = analytics.item_pagerank(star, top=7).collect()
        assert sout[0].p_partkey == 0  # the hub dominates
        assert sout[0].rank_micro > 3 * sout[1].rank_micro
