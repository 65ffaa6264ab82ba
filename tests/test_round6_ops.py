"""Fixture-level semantics for the round-6 panel operators: perplexity
deciles, cross-source contamination, token dup inflation, and the
label-centroid cosine matrix (plus the shared-frame injection paths the
registry uses). The sf0.01 oracle gate pins exact values; these pin the
invariants the gate can't express (totality, monotonicity, known-answer
geometry)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from logistics_data_pipeline_spark.llm import dedup, similarity, text


def _docs(spark):
    rows = []
    for i in range(40):
        body = f"the quick brown fox jumps over dog number {i} again and again"
        rows.append((i, body, "en", f"src{i % 3}", len(body)))
    # exact duplicates of docs 0 and 1 from a different source
    rows.append((100, rows[0][1], "en", "mirror", len(rows[0][1])))
    rows.append((101, rows[1][1], "en", "mirror", len(rows[1][1])))
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


class TestPerplexityBuckets:
    def test_totality_and_monotone_ranges(self, spark):
        docs = _docs(spark)
        out = text.perplexity_buckets(docs, n_buckets=4).collect()
        assert [r.bucket for r in out] == [1, 2, 3, 4]
        n_scored = text.doc_bigram_logprob(docs).count()
        assert sum(r.n_docs for r in out) == n_scored
        # NTILE ordering: bucket k's range sits at or above bucket k-1's
        for lo, hi in zip(out, out[1:]):
            assert hi.min_logprob >= lo.max_logprob - 1e-9
            assert lo.min_logprob <= lo.max_logprob


class TestSourceOverlap:
    def test_shares_total_and_cross_flag(self, spark):
        docs = _docs(spark)
        out = dedup.source_overlap(docs).collect()
        assert abs(sum(r.share for r in out) - 1.0) < 1e-6
        for r in out:
            assert r.is_cross_source == (r.source_a != r.source_b)
            assert r.source_a <= r.source_b
        # the mirrored exact copies must surface as cross-source cells
        assert any(r.is_cross_source and "mirror" in (r.source_a, r.source_b) for r in out)
        # pair total matches the generator it summarizes
        assert sum(r.n_pairs for r in out) == dedup.neardup_ngram(docs).count()

    def test_accepts_shared_scores(self, spark):
        docs = _docs(spark)
        scores = dedup.ngram_pair_scores(docs)
        a = dedup.source_overlap(docs).collect()
        b = dedup.source_overlap(
            docs, pairs=dedup.neardup_ngram(docs, scores=scores)
        ).collect()
        assert a == b


class TestTokenDupInflation:
    def test_known_answer(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "a b c", "en", "s", 5),
                (2, "a b c", "en", "s", 5),  # dup of 1: 3 dup tokens
                (3, "x y", "en", "s", 3),
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        r = dedup.token_dup_inflation(docs).collect()[0]
        assert r.n_docs == 3 and r.n_unique_docs == 2
        assert r.total_tokens == 8 and r.unique_tokens == 5
        assert r.duplicated_tokens == 3
        assert abs(r.inflation - 8 / 5) < 1e-9


class TestLabelCentroidSim:
    def test_known_geometry(self, spark):
        # label 0 along e0, label 1 along e1 (orthogonal), label 2 = label 0
        rows = []
        for i in range(4):
            rows.append((i, [1.0, 0.0, 0.0], 0))
            rows.append((10 + i, [0.0, 1.0, 0.0], 1))
            rows.append((20 + i, [2.0, 0.0, 0.0], 2))
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        out = {(r.label_a, r.label_b): r.centroid_cosine
               for r in similarity.label_centroid_sim(emb).collect()}
        assert out[(0, 1)] == pytest.approx(0.0, abs=1e-6)
        assert out[(1, 2)] == pytest.approx(0.0, abs=1e-6)
        assert out[(0, 2)] == pytest.approx(1.0, abs=1e-6)


class TestLabelPropagationConvergenceGuard:
    def test_raises_when_unconverged(self, spark):
        # a path graph of diameter 5 cannot converge in 1 round
        nodes = spark.range(6).select(F.col("id").alias("node_id"))
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(5)], "a_id long, b_id long"
        )
        with pytest.raises(RuntimeError, match="did not converge"):
            dedup.label_propagation(nodes, pairs, max_iter=1)
        # and converges exactly with enough rounds
        labels = dedup.label_propagation(nodes, pairs, max_iter=10).collect()
        assert {r.component for r in labels} == {0}

class TestCorpusDatasheet:
    def test_known_answer(self, spark):
        from logistics_data_pipeline_spark.llm import curation

        docs = spark.createDataFrame(
            [
                (1, "a b c", "en", "s1", 5),
                (2, "a b c", "en", "s2", 5),
                (3, "x y", "fr", "s1", 3),
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        r = curation.corpus_datasheet(docs).collect()[0]
        assert r.n_docs == 3 and r.n_sources == 2 and r.n_langs == 2
        assert r.n_unique_texts == 2
        assert abs(r.exact_dup_rate - 1 / 3) < 1e-6
        assert r.total_tokens == 8 and r.min_tokens == 2 and r.max_tokens == 3


class TestLabelOutliers:
    def test_planted_outlier_ranks_first(self, spark):
        from logistics_data_pipeline_spark.llm import similarity

        rows = [(i, [1.0, 0.0], 0) for i in range(9)]
        rows += [(100, [0.0, 9.0], 0)]  # far from label-0 centroid
        rows += [(200 + i, [0.0, 1.0], 1) for i in range(5)]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        out = similarity.label_outlier_vectors(emb, top=3).collect()
        assert out[0].vec_id == 100
        assert out[0].z > 2.0
        # degenerate label (all-identical vectors) yields NULL z, not a crash
        zs = {r.vec_id: r.z for r in similarity.label_outlier_vectors(emb, top=20).collect()}
        assert all(z is None for v, z in zs.items() if 200 <= v < 300)

class TestBm25:
    def test_planted_heavy_doc_ranks_first(self, spark):
        # 30 background docs establish the df ranking; doc 999 repeats
        # the mid-frequency terms many times -> top BM25 score
        rows = []
        for i in range(30):
            common = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
            mid = "lambda mu" if i % 2 == 0 else "nu xi"
            rows.append((i, f"{common} {mid} filler{i}", "en", "s", 10))
        rows.append((999, "lambda mu nu xi " * 10, "en", "s", 10))
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        out = text.bm25_scores(docs, n_terms=4, skip_head=10, top=5).collect()
        assert out[0].doc_id == 999
        assert out[0].bm25 > 0
        assert all(a.bm25 >= b.bm25 for a, b in zip(out, out[1:]))
        assert all(1 <= r.n_terms_matched <= 4 for r in out)


class TestGraphTriangles:
    def test_known_graph(self, spark):
        from logistics_data_pipeline_spark.operators import analytics

        # order 1 buys parts {1,2,3} (a triangle), order 2 buys {3,4}
        rows = [(1, p) for p in (1, 2, 3)] + [(2, p) for p in (3, 4)]
        li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
        r = analytics.graph_triangles(li).collect()[0]
        assert r.n_triangles == 1
        # degrees 2,2,3,1 -> wedges 1+1+3+0 = 5 -> coeff 3/5
        assert r.n_wedges == 5
        assert abs(r.clustering_coeff - 0.6) < 1e-9

    def test_degree_cap_drops_hub(self, spark):
        from logistics_data_pipeline_spark.operators import analytics

        # star around part 0 (degree 10) + one triangle {100,101,102}
        rows = [(o, 0) for o in range(10)] + [(o, o + 1) for o in range(10)]
        rows += [(50, p) for p in (100, 101, 102)]
        li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
        r = analytics.graph_triangles(li, max_deg=5).collect()[0]
        # hub is capped out; only the clean triangle remains
        assert r.n_triangles == 1

class TestRrfFusion:
    def test_agrees_with_legs_and_bounds(self, spark):
        rows = []
        for i in range(30):
            common = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
            mid = "lambda mu" if i % 2 == 0 else "nu xi"
            rows.append((i, f"{common} {mid} filler{i}", "en", "s", 10))
        rows.append((999, "lambda mu nu xi " * 10, "en", "s", 10))
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        out = text.rrf_fusion(docs, n_terms=4, skip_head=10, top=10).collect()
        # the doc that tops both legs tops the fusion; 2-list max is 2/(61)
        assert out[0].doc_id == 999
        assert out[0].n_lists == 2
        assert out[0].rrf <= 2 / 61 + 1e-6  # 6 dp round
        assert all(a.rrf >= b.rrf for a, b in zip(out, out[1:]))


class TestTypeValueDrift:
    def test_planted_shift_flags(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        rows = []
        for d in range(14):
            for i in range(40):
                # type A jumps by +100 in the recent week; type B stays
                shift = 100.0 if d >= 7 else 0.0
                rows.append((base + dt.timedelta(days=d, minutes=i), "A", 10.0 + (i % 5) + shift))
                rows.append((base + dt.timedelta(days=d, minutes=i), "B", 20.0 + (i % 5)))
        ev = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
        out = {r.event_type: r for r in __import__("logistics_data_pipeline_spark.operators.analytics", fromlist=["x"]).type_value_drift(ev).collect()}
        assert out["A"].is_drift and abs(out["A"].mean_recent - out["A"].mean_prior - 100.0) < 1e-6
        assert not out["B"].is_drift

class TestKmvDistinct:
    def test_small_groups_exact_and_error_measured(self, spark):
        import datetime as dt

        from logistics_data_pipeline_spark.operators import analytics

        base = dt.datetime(2024, 1, 1)
        rows = []
        for u in range(30):  # type S: 30 users < k -> sketch stores all, exact
            rows.append((base, "S", u, 1.0))
        for u in range(3000):  # type L: estimator kicks in
            rows.append((base, "L", u, 1.0))
        ev = spark.createDataFrame(rows, "ts timestamp, event_type string, user_id long, value double")
        out = {r.event_type: r for r in analytics.kmv_distinct(ev).collect()}
        assert out["S"].kmv_estimate == 30.0 and out["S"].rel_error == 0.0
        assert out["L"].exact_distinct == 3000
        # bottom-k estimator: within ~4 standard errors of 1/sqrt(k-2)
        assert out["L"].rel_error < 4 / (62 ** 0.5)


class TestLeadtimeAnova:
    def test_separated_groups_large_f(self, spark):
        import datetime as dt

        from logistics_data_pipeline_spark.operators import tpch_extra

        d0 = dt.date(2024, 1, 1)
        orders, li = [], []
        ok = 0
        # URGENT ships in ~2 days, LOW in ~20: priority explains variance
        for prio, lead in (("1-URGENT", 2), ("5-LOW", 20)):
            for i in range(30):
                ok += 1
                orders.append((ok, prio, d0))
                li.append((ok, d0 + dt.timedelta(days=lead + (i % 3))))
        o = spark.createDataFrame(orders, "o_orderkey long, o_orderpriority string, o_orderdate date")
        l = spark.createDataFrame(li, "l_orderkey long, l_shipdate date")
        r = tpch_extra.leadtime_anova(l, o).collect()[0]
        assert r.df_between == 1 and r.df_within == 58
        assert r.f_stat > 100 and r.eta_squared > 0.9
        assert abs(r.grand_mean_days - (3 + 21) / 2) < 0.5

    def test_identical_groups_f_near_zero(self, spark):
        import datetime as dt

        from logistics_data_pipeline_spark.operators import tpch_extra

        d0 = dt.date(2024, 1, 1)
        orders, li = [], []
        for k, prio in enumerate(("1-URGENT", "5-LOW")):
            for i in range(20):
                oid = k * 100 + i
                orders.append((oid, prio, d0))
                li.append((oid, d0 + dt.timedelta(days=5 + (i % 5))))
        o = spark.createDataFrame(orders, "o_orderkey long, o_orderpriority string, o_orderdate date")
        l = spark.createDataFrame(li, "l_orderkey long, l_shipdate date")
        r = tpch_extra.leadtime_anova(l, o).collect()[0]
        assert r.f_stat < 1e-6 and r.eta_squared < 1e-6


class TestPromoDid:
    def test_planted_lift_recovered(self, spark):
        import datetime as dt

        from logistics_data_pipeline_spark.operators import tpch_extra

        d0 = dt.date(2024, 1, 1)
        part = spark.createDataFrame(
            [(1, "PROMO BRUSHED"), (2, "STANDARD POLISHED")],
            "p_partkey long, p_type string",
        )
        li = []
        # both families at 100 before; after the midpoint PROMO jumps to
        # 150 while control stays -> DiD = +50 net of zero drift
        for day, promo_price, other_price in ((0, 100.0, 100.0), (10, 150.0, 100.0)):
            for i in range(10):
                li.append((1, d0 + dt.timedelta(days=day), promo_price, 0.0))
                li.append((2, d0 + dt.timedelta(days=day), other_price, 0.0))
        l = spark.createDataFrame(
            li, "l_partkey long, l_shipdate date, l_extendedprice double, l_discount double"
        )
        r = tpch_extra.promo_did(l, part).collect()[0]
        assert r.promo_before == 100.0 and r.promo_after == 150.0
        assert r.other_before == 100.0 and r.other_after == 100.0
        assert r.did_estimate == 50.0
        assert r.n_promo == 20 and r.n_other == 20


class TestLinearProbe:
    def test_separable_data_learns_direction(self, spark):
        import numpy as np

        from logistics_data_pipeline_spark.llm import similarity

        rng = np.random.RandomState(5)
        d, n = 8, 200
        u = np.zeros(d); u[0] = 1.0  # positives shifted along dim 0
        pts, labels = [], []
        for i in range(n):
            pos = i < n // 2
            x = rng.randn(d) * 0.3 + (2.0 * u if pos else -2.0 * u)
            pts.append(x); labels.append(0 if pos else 1)  # target label 0
        emb = spark.createDataFrame(
            [(i, [float(v) for v in pts[i]], labels[i]) for i in range(n)],
            "vec_id long, embedding array<float>, label int",
        )
        out = sorted(similarity.linear_probe_gd(emb).collect(), key=lambda r: r.dim)
        w = np.array([r.weight for r in out])
        mse = out[0].train_mse
        assert out[0].n_pos == n // 2
        # the discriminative dimension dominates the learned weights
        assert w[0] > 3 * max(abs(w[1:]).max(), 1e-9)
        # trained MSE beats the w=0 baseline (= n_pos/n = 0.5)
        assert mse < 0.25
        # scores separate the classes perfectly on this margin
        scores = np.array(pts) @ w
        assert scores[: n // 2].min() > scores[n // 2:].max()


class TestMmdLabels:
    def test_shifted_group_scores_higher(self, spark):
        import numpy as np

        from logistics_data_pipeline_spark.llm import similarity

        rng = np.random.RandomState(3)
        d, n = 8, 120
        a = rng.randn(n, d)            # label 0: standard normal
        b = rng.randn(n, d)            # label 1: same distribution
        c = rng.randn(n, d) + 3.0      # label 2: mean-shifted cloud
        rows = []
        for lbl, m in ((0, a), (1, b), (2, c)):
            for i in range(n):
                rows.append((lbl * n + i, [float(x) for x in m[i]], lbl))
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        # full pair space for the test (rate knob wide open)
        out = {(r.label_a, r.label_b): r for r in
               similarity.mmd_labels(emb, sample_hex="g").collect()}
        same = out[(0, 1)].mmd2
        shifted = min(out[(0, 2)].mmd2, out[(1, 2)].mmd2)
        assert shifted > 10 * max(same, 1e-6)
        assert abs(same) < 0.01  # identical distributions ~ 0


class TestStlDecompose:
    def test_planted_daily_cycle_recovered(self, spark):
        import datetime as dt

        from logistics_data_pipeline_spark.operators import temporal

        t0 = dt.datetime(2024, 1, 1)
        rows = []
        eid = 0
        # 6 days: base 10/hour, hours 8-16 get +15 (a working-day bump)
        for d in range(6):
            for h in range(24):
                n = 10 + (15 if 8 <= h <= 16 else 0)
                for i in range(n):
                    rows.append((eid, t0 + dt.timedelta(days=d, hours=h, seconds=i), 1, "A", 1.0))
                    eid += 1
        ev = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
        )
        out = temporal.stl_decompose(ev).collect()
        # seasonal: peak hours clearly above trough hours
        seas = {}
        for r in out:
            if r.seasonal is not None:
                seas[r.hour_of_day] = r.seasonal
        assert seas[12] - seas[2] > 10
        # remainder is small where trend is defined (clean periodic signal)
        rems = [abs(r.remainder) for r in out if r.remainder is not None]
        assert rems and sum(rems) / len(rems) < 3.0
        # edges (first/last 12 hours) have no trend
        hs = sorted(r.hour_idx for r in out)
        first = next(r for r in out if r.hour_idx == hs[0])
        assert first.trend is None and first.remainder is None


class TestMarkovStationary:
    def test_two_state_chain_converges_to_known_pi(self, spark):
        import datetime as dt

        from logistics_data_pipeline_spark.operators import temporal

        # one user alternates A,A,B,A,A,B,... -> P(A->A)=.5, P(A->B)=.5,
        # P(B->A)=1  =>  stationary pi = (2/3, 1/3)
        t0 = dt.datetime(2024, 1, 1)
        seq = ["A", "A", "B"] * 40
        rows = [(i, t0 + dt.timedelta(seconds=i), 1, et, 1.0) for i, et in enumerate(seq)]
        ev = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
        )
        out = {r.event_type: r.stationary_p for r in temporal.markov_stationary(ev).collect()}
        assert abs(out["A"] - 2 / 3) < 1e-3
        assert abs(out["B"] - 1 / 3) < 1e-3
        assert abs(sum(out.values()) - 1.0) < 1e-5

    def test_unreachable_type_reports_zero(self, spark):
        import datetime as dt

        from logistics_data_pipeline_spark.operators import temporal

        t0 = dt.datetime(2024, 1, 1)
        rows = [(i, t0 + dt.timedelta(seconds=i), 1, "A", 1.0) for i in range(20)]
        rows.append((99, t0, 2, "Z", 1.0))  # lone event, never in a transition
        ev = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
        )
        out = {r.event_type: r.stationary_p for r in temporal.markov_stationary(ev).collect()}
        assert out["Z"] == 0.0 and abs(out["A"] - 1.0) < 1e-6


class TestTopPaths:
    def test_session_cut_and_purchase_rate(self, spark):
        import datetime as dt

        from logistics_data_pipeline_spark.operators import temporal

        t0 = dt.datetime(2024, 1, 1, 9)
        rows = []
        eid = 0
        # 5 users walk view > click > purchase within one session
        for u in range(5):
            for j, et in enumerate(["view", "click", "purchase"]):
                rows.append((eid, t0 + dt.timedelta(minutes=j), u, et, 1.0)); eid += 1
        # 2 users walk view > click > view
        for u in range(5, 7):
            for j, et in enumerate(["view", "click", "view"]):
                rows.append((eid, t0 + dt.timedelta(minutes=j), u, et, 1.0)); eid += 1
        # a >30-min gap must CUT the path (user 7 never forms a 3-walk)
        rows.append((eid, t0, 7, "view", 1.0)); eid += 1
        rows.append((eid, t0 + dt.timedelta(minutes=5), 7, "click", 1.0)); eid += 1
        rows.append((eid, t0 + dt.timedelta(minutes=50), 7, "purchase", 1.0)); eid += 1
        ev = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
        )
        out = {r.path: r for r in temporal.top_paths(ev).collect()}
        assert out["view > click > purchase"].n_walks == 5
        assert out["view > click > purchase"].n_users == 5
        assert out["view > click > purchase"].ends_in_purchase_rate == 1.0
        assert out["view > click > view"].n_walks == 2
        assert out["view > click > view"].ends_in_purchase_rate == 0.0
        # the gap-cut walk never appears
        assert all("purchase" != p.split(" > ")[2] or r.n_users <= 5
                   for p, r in out.items())
        assert len(out) == 2


class TestKaplanMeier:
    def test_survival_steps_and_censoring(self, spark):
        import datetime as dt

        from logistics_data_pipeline_spark.operators import tpch_extra

        d0 = dt.date(2024, 1, 1)
        # 4 orders: events at day 2 (two orders), day 5 (one); one open
        # order censored at corpus max (day 5 ship)
        orders = spark.createDataFrame(
            [
                (1, "F", d0), (2, "F", d0), (3, "F", d0), (4, "O", d0),
            ],
            "o_orderkey long, o_orderstatus string, o_orderdate date",
        )
        li = spark.createDataFrame(
            [
                (1, d0 + dt.timedelta(days=2)),
                (2, d0 + dt.timedelta(days=2)),
                (3, d0 + dt.timedelta(days=5)),
                (4, d0 + dt.timedelta(days=1)),  # open order, partial ship
            ],
            "l_orderkey long, l_shipdate date",
        )
        out = {r.t_days: r for r in tpch_extra.kaplan_meier(orders, li).collect()}
        assert set(out) == {2, 5}
        # day 2: 4 at risk, 2 events -> S = 0.5
        assert out[2].n_risk == 4 and out[2].n_events == 2
        assert abs(out[2].survival - 0.5) < 1e-6
        # day 5: censored open order (t=5) still at risk alongside the
        # event -> n_risk 2, S = 0.5 * (1 - 1/2) = 0.25
        assert out[5].n_risk == 2 and out[5].n_events == 1
        assert abs(out[5].survival - 0.25) < 1e-6


class TestEwmaControl:
    def test_planted_spike_alarms(self, spark):
        import datetime as dt

        from logistics_data_pipeline_spark.operators import temporal

        t0 = dt.datetime(2024, 2, 1)
        rows = []
        eid = 0
        # 48 steady hours of 20 events, then one 200-event spike hour
        for h in range(48):
            for i in range(20):
                rows.append((eid, t0 + dt.timedelta(hours=h, minutes=i), 1, "A", 1.0)); eid += 1
        for i in range(200):
            rows.append((eid, t0 + dt.timedelta(hours=48, seconds=i), 1, "A", 1.0)); eid += 1
        ev = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
        )
        out = sorted(temporal.ewma_control(ev).collect(), key=lambda r: r.hour_idx)
        spike = out[-1]
        assert spike.cnt == 200 and spike.is_alarm
        assert abs(spike.ewma - 20.0) < 1e-6  # steady baseline
        # steady hours with a full lookback never alarm
        for r in out[24:-1]:
            assert not r.is_alarm and abs(r.ewma - 20.0) < 1e-6
        # the first hour has no prior -> no baseline, no alarm
        assert out[0].ewma is None and not out[0].is_alarm


class TestAttributionModels:
    def test_credits_and_flags(self, spark):
        import datetime as dt
        import math

        from logistics_data_pipeline_spark.operators import temporal

        t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
        rows = [
            # user 1: clicks at -20min, -10min, -1min before purchase id 100
            (1, t0 - dt.timedelta(minutes=20), 1, "click", 0.0),
            (2, t0 - dt.timedelta(minutes=10), 1, "click", 0.0),
            (3, t0 - dt.timedelta(minutes=1), 1, "click", 0.0),
            (100, t0, 1, "purchase", 9.99),
            # a click outside the 30-min lookback never attributes
            (4, t0 - dt.timedelta(minutes=45), 1, "click", 0.0),
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
        )
        out = {r.click_id: r for r in temporal.attribution_models(ev).collect()}
        assert set(out) == {1, 2, 3}
        assert all(r.n_clicks == 3 and abs(r.linear_credit - 1 / 3) < 1e-6 for r in out.values())
        assert out[1].is_first_touch and not out[1].is_last_touch
        assert out[3].is_last_touch and not out[3].is_first_touch
        # time decay favors the most recent click
        assert out[3].time_decay_credit > out[2].time_decay_credit > out[1].time_decay_credit
        ws = [math.exp(-m * 60 / temporal.ATTRIB_DECAY_TAU_S) for m in (20, 10, 1)]
        assert abs(out[3].time_decay_credit - ws[2] / sum(ws)) < 1e-5
        # credits normalize to 1 per purchase
        assert abs(sum(r.time_decay_credit for r in out.values()) - 1.0) < 1e-5


class TestDuplicateInvoices:
    def test_planted_double_entry(self, spark):
        import datetime as dt

        from logistics_data_pipeline_spark.operators import tpch_extra

        d0 = dt.date(2024, 5, 1)
        rows = [
            # planted duplicate: same customer, same cents, next day
            (1, 10, 500.00, d0),
            (2, 10, 500.00, d0 + dt.timedelta(days=1)),
            # near-duplicate: within 0.1% and 3 days
            (3, 11, 1000.00, d0),
            (4, 11, 1000.50, d0 + dt.timedelta(days=3)),
            # same customer but price differs 5% -> not flagged
            (5, 12, 200.00, d0),
            (6, 12, 210.00, d0),
            # same price but 30 days apart -> not flagged
            (7, 13, 300.00, d0),
            (8, 13, 300.00, d0 + dt.timedelta(days=30)),
            # different customers, identical orders -> not flagged
            (9, 14, 400.00, d0),
            (10, 15, 400.00, d0),
        ]
        orders = spark.createDataFrame(
            rows, "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate date"
        )
        out = tpch_extra.duplicate_invoices(orders).collect()
        got = {(r.order_a, r.order_b): r for r in out}
        assert set(got) == {(1, 2), (3, 4)}
        assert got[(1, 2)].exact_amount and got[(1, 2)].day_gap == 1
        assert not got[(3, 4)].exact_amount and got[(3, 4)].day_gap == 3


class TestLshSCurve:
    def test_high_bins_recalled_low_bins_not(self, spark):
        from logistics_data_pipeline_spark.llm import dedup

        base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
                "juliet kilo lima mike november oscar papa quebec romeo ").split()
        rows = []
        # 10 near-identical pairs (high jaccard) + 10 low-overlap pairs
        for k in range(10):
            t = " ".join(base) + f" suffix{k}"
            rows.append((2 * k, t + " x"))
            rows.append((2 * k + 1, t + " y"))
        for k in range(10):
            rows.append((100 + 2 * k, f"group{k} " + " ".join(f"a{k}w{j}" for j in range(25)) + " shared common tokens here"))
            rows.append((101 + 2 * k, f"group{k} " + " ".join(f"b{k}w{j}" for j in range(25)) + " shared common tokens here"))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = dedup.lsh_s_curve(docs).collect()
        assert out, "panel must not be empty"
        hi = [r for r in out if r.bin_lo >= 0.85]
        lo = [r for r in out if r.bin_lo <= 0.15]
        # near-identical pairs are (almost) always banded together
        assert hi and all(r.observed_rate >= 0.9 for r in hi)
        # the theoretical curve agrees: ~1.0 up high, ~0 down low
        assert all(r.theoretical_rate > 0.98 for r in hi)
        assert all(r.theoretical_rate < 0.05 for r in lo)
        # counts are consistent
        assert all(r.n_candidates <= r.n_pairs for r in out)


class TestKAnonymity:
    def test_small_group_flags(self, spark):
        import datetime as dt

        from logistics_data_pipeline_spark.operators import analytics

        base = dt.datetime(2024, 3, 1, 10)
        rows = []
        # group A: 6 distinct users in one QI cell -> anonymous at k=5
        for u in range(6):
            rows.append((base, "A", u, 15.0))
        # group B: 2 users, 10 rows -> violates (row count is NOT cover)
        for i in range(10):
            rows.append((base, "B", i % 2, 25.0))
        ev = spark.createDataFrame(rows, "ts timestamp, event_type string, user_id long, value double")
        out = {r.event_type: r for r in analytics.k_anonymity(ev).collect()}
        assert not out["A"].violates_k and out["A"].n_users == 6
        assert out["B"].violates_k and out["B"].n_users == 2 and out["B"].n_rows == 10
        assert abs(out["B"].row_share - 10 / 16) < 1e-6


class TestKcore:
    def test_clique_survives_tail_peeled(self, spark):
        from logistics_data_pipeline_spark.operators import analytics

        # K5 clique (degrees 4) + path 5-6-7 hanging off vertex 0:
        # the 3-core is exactly the clique; the path peels away over
        # TWO rounds (7 first, then 6, then 5) — exercising iteration.
        und = []
        for a in range(5):
            for b in range(5):
                if a != b:
                    und.append((a, b))
        for a, b in [(0, 5), (5, 6), (6, 7)]:
            und += [(a, b), (b, a)]
        from collections import Counter

        deg = Counter(s for s, _ in und)
        edges = spark.createDataFrame(
            [(s, d, deg[s]) for s, d in und], "src long, dst long, od long"
        )
        out = analytics.kcore(None, k=3, edges_od=edges).collect()
        assert {r.vertex for r in out} == {0, 1, 2, 3, 4}
        assert all(r.core_degree == 4 for r in out)

    def test_no_core_empty(self, spark):
        from logistics_data_pipeline_spark.operators import analytics

        edges = spark.createDataFrame(
            [(0, 1, 1), (1, 0, 1)], "src long, dst long, od long"
        )
        assert analytics.kcore(None, k=3, edges_od=edges).count() == 0


class TestFuzzyDecontamination:
    def test_planted_cross_split_paraphrase(self, spark):
        import hashlib

        from logistics_data_pipeline_spark.llm import curation, dedup

        thr = curation._hex_threshold(0.2)  # below -> val/test, above -> train

        def split_of(i):
            return "eval" if hashlib.md5(str(i).encode()).hexdigest()[:4] < thr else "train"

        train_ids = [i for i in range(200) if split_of(i) == "train"]
        eval_ids = [i for i in range(200) if split_of(i) == "eval"]
        base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet " * 4
        rows = []
        # planted leak: train doc shares ~95% of shingles with an eval doc
        leak_train, leak_eval = train_ids[0], eval_ids[0]
        rows.append((leak_train, base + "kilo lima"))
        rows.append((leak_eval, base + "mike november"))
        # background docs: unique texts, no overlap
        for k, i in enumerate(train_ids[1:40]):
            rows.append((i, f"unique train text t{k} " + " ".join(f"w{k}x{j}" for j in range(30))))
        for k, i in enumerate(eval_ids[1:10]):
            rows.append((i, f"unique eval text e{k} " + " ".join(f"v{k}y{j}" for j in range(30))))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r.doc_id: r for r in dedup.fuzzy_decontamination(docs).collect()}
        assert leak_train in out, "planted leak must surface as a candidate"
        r = out[leak_train]
        assert r.top_eval_id == leak_eval
        assert r.is_fuzzy_contaminated and r.max_jaccard > 0.7
        # background train docs share no bands with eval docs
        assert all(i not in out for i in train_ids[1:40])


class TestPowerIteration:
    def test_converges_to_true_pc1(self, spark):
        """After 12 rounded steps the iterate is (numerically) the top
        eigenvector of the quantized covariance — checked against
        numpy's eigh on the same rounded matrix."""
        import numpy as np

        from logistics_data_pipeline_spark.llm import similarity

        rng = np.random.RandomState(7)
        # anisotropic cloud: dominant direction along a random unit u
        d, n = 16, 400
        u = rng.randn(d); u /= np.linalg.norm(u)
        pts = (rng.randn(n, 1) * 3.0) @ u[None, :] + rng.randn(n, d) * 0.3
        emb = spark.createDataFrame(
            [(i, [float(x) for x in pts[i]]) for i in range(n)],
            "vec_id long, embedding array<float>",
        )
        out = similarity.power_iteration(emb).collect()
        v = np.array([r.pc1_loading for r in sorted(out, key=lambda r: r.dim)])
        lam = out[0].eigenvalue
        # reference eigh on the SAME integer-quantized covariance
        q = np.floor(pts * float(similarity.COV_SCALE))
        c = np.cov(q, rowvar=False) / float(similarity.COV_SCALE) ** 2
        evals, evecs = np.linalg.eigh(c)
        top = evecs[:, -1]
        assert abs(abs(v @ top) / np.linalg.norm(v)) > 0.999
        assert abs(lam - evals[-1]) / evals[-1] < 0.01
        # sign pin: largest-|loading| entry is positive
        piv = max(range(d), key=lambda i: (abs(v[i]), -i))
        assert v[piv] > 0


class TestPcaDeflation:
    def test_spectrum_matches_eigh(self, spark):
        import numpy as np

        from logistics_data_pipeline_spark.llm import similarity

        rng = np.random.RandomState(11)
        d, n = 12, 300
        # three planted directions with distinct variances 9/4/1
        basis = np.linalg.qr(rng.randn(d, d))[0][:, :3]
        pts = (
            rng.randn(n, 3) * np.array([3.0, 2.0, 1.0])
        ) @ basis.T + rng.randn(n, d) * 0.05
        emb = spark.createDataFrame(
            [(i, [float(x) for x in pts[i]]) for i in range(n)],
            "vec_id long, embedding array<float>",
        )
        out = similarity.pca_deflation(emb).collect()
        assert len(out) == 3 * d
        q = np.floor(pts * float(similarity.COV_SCALE))
        c = np.cov(q, rowvar=False) / float(similarity.COV_SCALE) ** 2
        evals, evecs = np.linalg.eigh(c)
        for comp in range(3):
            rows = sorted((r for r in out if r.component == comp), key=lambda r: r.dim)
            v = np.array([r.loading for r in rows])
            lam = rows[0].eigenvalue
            ref = evecs[:, -1 - comp]
            assert abs(abs(v @ ref) / np.linalg.norm(v)) > 0.99, comp
            assert abs(lam - evals[-1 - comp]) / evals[-1 - comp] < 0.02, comp
        # eigenvalues strictly decreasing across components
        lams = [next(r for r in out if r.component == c2).eigenvalue for c2 in range(3)]
        assert lams[0] > lams[1] > lams[2]


class TestHllManual:
    def test_small_range_exact_and_merge_bound(self, spark):
        import datetime as dt

        from logistics_data_pipeline_spark.operators import analytics

        base = dt.datetime(2024, 1, 1)
        rows = []
        for u in range(25):  # type S: 25 users << m -> linear counting regime
            rows.append((base, "S", u, 1.0))
        for u in range(5000):  # type L: harmonic-mean estimator regime
            rows.append((base, "L", u, 1.0))
        ev = spark.createDataFrame(
            rows, "ts timestamp, event_type string, user_id long, value double"
        )
        out = {r.level: r for r in analytics.hll_manual(ev).collect()}
        # linear counting at tiny cardinality is near-exact (±couple %)
        assert out["S"].exact_distinct == 25 and out["S"].rel_error < 0.10
        # m=256 -> sigma ~ 1.04/16 = 6.5%; allow 4 sigma
        assert out["L"].exact_distinct == 5000 and out["L"].rel_error < 0.26
        # the merged row covers the union of both types (same universe ->
        # 5000 distinct users) and its error obeys the same bound
        assert out["all"].exact_distinct == 5000 and out["all"].rel_error < 0.26

    def test_merge_equals_direct_sketch(self, spark):
        """HLL union property: max-merging per-type registers gives the
        IDENTICAL estimate a single sketch over all rows would give."""
        import datetime as dt

        from logistics_data_pipeline_spark.operators import analytics

        base = dt.datetime(2024, 1, 1)
        rows = [(base, "A", u, 1.0) for u in range(0, 900)]
        rows += [(base, "B", u, 1.0) for u in range(600, 1500)]  # overlap
        ev = spark.createDataFrame(
            rows, "ts timestamp, event_type string, user_id long, value double"
        )
        merged = {r.level: r for r in analytics.hll_manual(ev).collect()}["all"]
        one_type = ev.withColumn("event_type", F.lit("X"))
        direct = {r.level: r for r in analytics.hll_manual(one_type).collect()}["X"]
        assert merged.hll_estimate == direct.hll_estimate


class TestLabelPrototypes:
    def test_nearest_to_centroid_first(self, spark):
        from logistics_data_pipeline_spark.llm import similarity

        rows = [(i, [float(i), 0.0], 0) for i in range(10)]  # centroid x=4.5
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
        out = similarity.label_prototypes(emb, per_label=3).collect()
        assert [r.vec_id for r in out] == [4, 5, 3]  # dists .5,.5,1.5; tie by id
        assert [r.rank for r in out] == [1, 2, 3]

class TestDeletePropagation:
    def test_accounting_adds_up(self, spark):
        from logistics_data_pipeline_spark.llm import curation

        rows = [(i, f"text body {i} " * 5, "en", "s", 50) for i in range(1, 200)]
        rows.append((0, rows[4][1], "en", "s", 50))  # id 0 deleted; copy at id 5
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        emb = spark.range(0, 150).select(
            F.col("id").alias("vec_id"),
            F.array(F.lit(1.0), F.lit(2.0)).cast("array<float>").alias("embedding"),
            F.lit(0).alias("label"),
        )
        out = {r.artifact: r for r in curation.delete_propagation(docs, emb, mod=97).collect()}
        # deleted ids: 0, 97, 194 -> 3 docs purged, 197 keep
        assert out["documents"].n_purged == 3
        assert out["documents"].n_surviving == 197
        # vec ids 0 and 97 exist in the 0..149 range
        assert out["embeddings"].n_purged == 2
        assert out["embeddings"].n_surviving == 148
        # doc 5 duplicates deleted doc 0's text -> left-behind copy
        assert out["exact_copies_left_behind"].n_purged == 1


class TestRevenueTrend:
    def test_exact_slope_on_known_series(self, spark):
        import datetime as dt

        from logistics_data_pipeline_spark.operators import tpch_extra

        # one nation, revenue 100, 200, 300 over three months -> slope 100
        orders = spark.createDataFrame(
            [
                (1, 1, "O", 100.0, dt.datetime(2024, 1, 5)),
                (2, 1, "O", 200.0, dt.datetime(2024, 2, 5)),
                (3, 1, "O", 300.0, dt.datetime(2024, 3, 5)),
            ],
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp",
        )
        customer = spark.createDataFrame(
            [(1, "c", 0)], "c_custkey long, c_name string, c_nationkey int"
        )
        nation = spark.createDataFrame(
            [(0, "N")], "n_nationkey int, n_name string"
        )
        r = tpch_extra.revenue_trend(orders, customer, nation).collect()[0]
        assert r.n_months == 3
        assert abs(r.slope_per_month - 100.0) < 1e-9
        assert abs(r.total_revenue - 600.0) < 1e-9

class TestCohortLtv:
    def test_cumulative_exact_cents(self, spark):
        import datetime as dt

        from logistics_data_pipeline_spark.operators import tpch_extra

        orders = spark.createDataFrame(
            [
                (1, 1, "O", 10.00, dt.datetime(2024, 1, 5)),
                (2, 1, "O", 20.01, dt.datetime(2024, 2, 5)),
                (3, 2, "O", 5.00, dt.datetime(2024, 1, 20)),
            ],
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp",
        )
        rows = {(r.cohort_month, r.months_since_first): r
                for r in tpch_extra.cohort_ltv(orders).collect()}
        jan = 2024 * 12 + 1
        assert rows[(jan, 0)].n_customers == 2
        assert rows[(jan, 0)].cum_ltv_cents_per_customer == 750  # (10+5)/2
        assert rows[(jan, 1)].cum_ltv_cents_per_customer == 1750  # +20.01/2 floor


class TestTokenizerFertility:
    def test_counts_and_shares(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "hello world", "en", "s1", 11),       # 2 words, 2 tokens
                (2, "c'est l'ete", "fr", "s1", 11),        # 2 words, 7 tokens
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        out = {(r.lang, r.source): r for r in text.tokenizer_fertility(docs).collect()}
        assert out[("en", "s1")].fertility == 1.0
        assert out[("fr", "s1")].n_tokens == 6  # c ' est l ' ete
        assert abs(sum(r.token_share for r in out.values()) - 1.0) < 1e-6


class TestThresholdSweep:
    def test_monotone_and_consistent(self, spark):
        docs = spark.createDataFrame(
            [(i, "alpha beta gamma delta epsilon common tail " + ("x" * (i % 3)), "en", "s", 10)
             for i in range(20)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        out = dedup.dedup_threshold_sweep(docs).collect()
        assert [r.threshold for r in out] == [0.5, 0.6, 0.7, 0.8, 0.9]
        # pair and doc counts are monotone non-increasing in the threshold
        for lo, hi in zip(out, out[1:]):
            assert hi.n_pairs <= lo.n_pairs
            assert hi.n_docs_touched <= lo.n_docs_touched
        # the 0.7 row must agree with the production pair generator
        n07 = dedup.neardup_ngram(docs, threshold=0.7).count()
        assert dict((r.threshold, r.n_pairs) for r in out)[0.7] == n07

class TestSignCodes:
    def test_known_bits(self, spark):
        from logistics_data_pipeline_spark.llm import similarity

        emb = spark.createDataFrame(
            [
                (1, [1.0] * 64, 0),                  # all bits set
                (2, [-1.0] * 64, 0),                 # none set
                (3, [1.0, -1.0] * 32, 0),            # even positions set
            ],
            "vec_id long, embedding array<float>, label int",
        )
        out = {r.vec_id: r for r in similarity.sign_codes(emb).collect()}
        assert out[1].code_lo == 2**32 - 1 and out[1].code_hi == 2**32 - 1
        assert out[1].n_pos_bits == 64
        assert out[2].code_lo == 0 and out[2].code_hi == 0 and out[2].n_pos_bits == 0
        even = sum(2**p for p in range(0, 32, 2))
        assert out[3].code_lo == even and out[3].code_hi == even
        assert out[3].n_pos_bits == 32


class TestBacklogAging:
    def test_buckets_and_exclusion(self, spark):
        import datetime as dt

        from logistics_data_pipeline_spark.operators import tpch_extra

        mx = dt.datetime(2024, 6, 30)
        orders = spark.createDataFrame(
            [
                (1, 1, "O", 10.0, mx),                              # age 0 -> 0-7d
                (2, 1, "O", 20.0, mx - dt.timedelta(days=20)),      # 8-30d
                (3, 1, "P", 30.0, mx - dt.timedelta(days=120)),     # >90d
                (4, 1, "F", 99.0, mx - dt.timedelta(days=5)),       # finalized: excluded
            ],
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp",
        )
        out = {(r.status, r.age_bucket): r for r in tpch_extra.backlog_aging(orders).collect()}
        assert out[("O", "0-7d")].n_orders == 1
        assert out[("O", "8-30d")].value_at_risk == 20.0
        assert out[("P", ">90d")].n_orders == 1
        assert not any(k[0] == "F" for k in out)

class TestHammingCosineCalibration:
    def test_identical_and_opposite_pairs(self, spark):
        from logistics_data_pipeline_spark.llm import similarity

        emb = spark.createDataFrame(
            [(1, [1.0, 2.0, 3.0, 4.0], 0), (2, [1.0, 2.0, 3.0, 4.0], 0),
             (3, [-1.0, -2.0, -3.0, -4.0], 0)],
            "vec_id long, embedding array<float>, label int",
        )
        # 'g' keeps every md5 bucket -> all 3 pairs
        out = {r.hamming: r for r in
               similarity.hamming_cosine_calibration(emb, sample_hex="g").collect()}
        assert out[0].mean_cosine == pytest.approx(1.0, abs=1e-6)   # (1,2)
        assert out[4].n_pairs == 2                                   # (1,3), (2,3)
        assert out[4].mean_cosine == pytest.approx(-1.0, abs=1e-6)
        # hamming monotone: bucket 0 cosine above bucket 4
        assert out[0].mean_cosine > out[4].mean_cosine


class TestSupplierConcentration:
    def test_hhi_extremes(self, spark):
        from logistics_data_pipeline_spark.operators import tpch_extra

        rows = [(1, 100, 1, 10.0), (2, 100, 1, 10.0)]        # part 100: single supplier
        rows += [(3, 200, 1, 10.0), (4, 200, 2, 10.0)]       # part 200: 50/50 split
        li = spark.createDataFrame(
            rows, "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double"
        )
        out = {r.p_partkey: r for r in tpch_extra.supplier_concentration(li).collect()}
        assert out[100].hhi == pytest.approx(1.0, abs=1e-9)
        assert out[100].n_suppliers == 1
        assert out[200].hhi == pytest.approx(0.5, abs=1e-9)

class TestChangepointScan:
    def test_finds_planted_shift_day(self, spark):
        import datetime as dt

        from logistics_data_pipeline_spark.operators import analytics

        base = dt.datetime(2024, 3, 1)
        rows = []
        for d in range(20):
            level = 10.0 if d < 12 else 50.0  # shift starts day 12
            jitter = ((d * 7) % 5) * 0.1  # day-to-day variance so z is defined
            for i in range(30):
                rows.append(
                    (base + dt.timedelta(days=d, minutes=i), "A", level + jitter)
                )
        ev = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
        r = analytics.changepoint_scan(ev).collect()[0]
        # the argmax split lands at (or within a day of) the level shift
        assert abs((r.split_day - (base + dt.timedelta(days=11))).days) <= 1
        assert r.mean_before < 15 and r.mean_after > 45
        assert r.abs_z > 5

class TestDpSourceCounts:
    def test_mechanism_shape(self, spark):
        from logistics_data_pipeline_spark.llm import curation

        docs = spark.createDataFrame(
            [(i, f"t{i}", "en", f"s{i % 4}", 2) for i in range(100)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        out = curation.dp_source_counts(docs).collect()
        assert len(out) == 4
        for r in out:
            assert r.true_count == 25
            assert r.laplace_scale == 1.0
            # Laplace(1) noise: nonzero and within a sane tail bound
            assert r.dp_count != r.true_count
            assert abs(r.dp_count - r.true_count) < 15
        # deterministic: same input -> identical release
        again = curation.dp_source_counts(docs).collect()
        assert out == again


class TestGraphHits:
    def _graph(self, spark):
        # one order per customer; part 100 in every basket, 101..104
        # exclusive to one customer each; customer 1 also buys 101+102
        orders = spark.createDataFrame(
            [(k, k) for k in (1, 2, 3, 4)], "o_orderkey long, o_custkey long"
        )
        lines = [(1, 100), (1, 101), (1, 102), (2, 100), (3, 100), (4, 100), (4, 103)]
        lineitem = spark.createDataFrame(lines, "l_orderkey long, l_partkey long")
        return orders, lineitem

    def test_authority_concentrates_on_shared_part(self, spark):
        from logistics_data_pipeline_spark.operators import analytics

        orders, lineitem = self._graph(spark)
        out = analytics.graph_hits(orders, lineitem, iters=3, top=10).collect()
        parts = [r for r in out if r.node_type == "part"]
        custs = [r for r in out if r.node_type == "customer"]
        assert parts and custs
        # part 100 (bought by everyone) is the top authority by a margin
        assert parts[0].node_id == 100
        assert parts[0].score_units > 2 * parts[1].score_units
        # hub mass: customer 1 (3 parts incl. two 100%-owned) tops
        assert custs[0].node_id == 1
        # integer L1 normalization: each side sums to ~SCALE (div slack)
        ssum = sum(r.score_units for r in parts)
        assert 0.99 * analytics.HITS_SCALE <= ssum <= analytics.HITS_SCALE
        # deterministic
        again = analytics.graph_hits(orders, lineitem, iters=3, top=10).collect()
        assert out == again


class TestBbitMinhash:
    def test_exact_duplicates_estimate_one(self, spark):
        docs = _docs(spark)
        out = {(r.a_id, r.b_id): r for r in dedup.bbit_minhash(docs).collect()}
        assert (0, 100) in out and (1, 101) in out
        for pair in ((0, 100), (1, 101)):
            r = out[pair]
            # identical shingle sets: every estimator saturates at 1
            assert r.jaccard == 1.0
            assert r.est_full == 1.0 and r.est_b2 == 1.0 and r.est_b1 == 1.0
        for r in out.values():
            assert r.jaccard >= dedup.MINHASH_ERR_THRESHOLD
            # corrected estimators stay in a sane band around truth
            assert -0.5 <= r.est_b1 <= 1.0 and -0.1 <= r.est_b2 <= 1.0


class TestKneserNeyBigram:
    def test_probability_mass_and_discount(self, spark):
        # every doc repeats the same two-word cycle: all bigrams clear
        # NGRAM_MIN_COUNT, so each context's full continuation set is
        # visible in the output and its KN mass must sum to ~1
        docs = spark.createDataFrame(
            [(i, "alpha beta alpha beta alpha gamma " * 3, "en", "s", 10)
             for i in range(5)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        rows = text.kneser_ney_bigram(docs).collect()
        assert rows
        disc, seen_mass, lam = {}, {}, {}
        for r in rows:
            assert 0.0 < r.p_kn <= 1.0
            assert r.p_cont > 0.0
            # the discounted term alone sits below MLE; interpolation
            # adds it back via the continuation distribution
            lam_w1 = text.KN_DISCOUNT * r.n_continuations / r.n_context
            assert abs(r.p_kn - ((r.n_bigram - text.KN_DISCOUNT) / r.n_context
                                 + lam_w1 * r.p_cont)) < 1e-5
            seen_mass.setdefault(r.w1, 0.0)
            seen_mass[r.w1] += (r.n_bigram - text.KN_DISCOUNT) / r.n_context
            lam[r.w1] = lam_w1
        # full-vocabulary mass: discounted seen mass + lambda(w1) * 1
        # (sum of p_cont over ALL words is exactly 1) must equal 1
        for w1 in seen_mass:
            assert abs(seen_mass[w1] + lam[w1] - 1.0) < 1e-6, w1


class TestMmrSelect:
    def test_diversity_beats_pure_relevance(self, spark):
        # vec 0 = query; vecs 1,2 nearly identical and most relevant;
        # vec 3 orthogonal-ish but still relevant
        rows = [
            (0, [1.0, 0.0, 0.0, 0.0], 0),
            (1, [0.8, 0.6, 0.0, 0.0], 0),      # relevant
            (2, [0.8, 0.6, 0.001, 0.0], 0),    # near-duplicate of 1
            (3, [0.8, -0.6, 0.0, 0.0], 0),     # equally relevant, diverse
            (4, [0.1, 0.0, 0.0, 1.0], 0),      # barely relevant
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        out = similarity.mmr_select(emb, k=3, pool=4).collect()
        assert [r.rank for r in out] == [1, 2, 3]
        # first pick is the most relevant vector
        assert out[0].vec_id == 1
        # second pick skips the near-duplicate (vec 2) for the diverse vec 3
        assert out[1].vec_id == 3
        # the duplicate only enters once the diverse option is exhausted
        assert out[2].vec_id == 2
        # redundancy penalty: mmr scores are <= relevance from rank 2 on
        assert out[1].mmr_score <= out[1].relevance
        assert out[0].mmr_score == out[0].relevance


class TestReadability:
    def test_known_counts(self, spark):
        docs = spark.createDataFrame(
            [(1, "aa bb aa bb", "en", "s", 11)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        r = text.readability(docs).collect()[0]
        assert r.n_words == 4
        assert r.n_syllables == 2  # two 'aa' vowel runs, 'bb' has none
        assert r.n_sentences == 1
        assert abs(r.syll_per_word - 0.5) < 1e-9
        expected = round(206.835 - 1.015 * 4.0 - 84.6 * 0.5, 6)
        assert abs(r.flesch - expected) < 1e-9


class TestStreamHoppingCounts:
    def test_stream_equals_batch(self, spark, tmp_path):
        import datetime as dt

        from logistics_data_pipeline_spark.operators import temporal
        from logistics_data_pipeline_spark.streaming import windowed

        base = dt.datetime(2024, 3, 1, 10, 0, 0)
        rows = [
            (i, base + dt.timedelta(minutes=3 * i), i % 4, "A" if i % 2 else "B",
             float(i) + 0.25, "{}")
            for i in range(40)
        ]
        ev = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        got = windowed.hopping_counts_stream_batch(spark, ev).collect()
        want = (
            temporal.hopping_window_counts(ev)
            .orderBy("window_start", "event_type")
            .collect()
        )
        assert [tuple(r) for r in got] == [tuple(r) for r in want]


class TestCrosslingualNeardup:
    def test_grid_complete_and_duplicate_detected(self, spark):
        rows = []
        for i in range(10):
            rows.append((i, f"the quick brown fox jumps over dog {i} zz yy xx", "en", "s", 40))
        # doc 100: exact copy of doc 0's text but tagged German
        rows.append((100, rows[0][1], "de", "s", 40))
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        out = {(r.lang_a, r.lang_b): r for r in dedup.crosslingual_neardup(docs).collect()}
        # full upper-triangle grid over {de, en}
        assert set(out) == {("de", "de"), ("de", "en"), ("en", "en")}
        x = out[("de", "en")]
        assert x.is_crosslingual and x.n_pairs >= 1 and x.max_jaccard == 1.0
        assert out[("de", "de")].n_pairs == 0


class TestReorderIntervals:
    def test_known_cadence(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        rows = []
        # customer 1: perfectly regular weekly orders -> cv 0
        for k in range(5):
            rows.append((100 + k, 1, base + dt.timedelta(days=7 * k)))
        # customer 2: gaps of 1, 3 days -> mean 2d, sd sqrt(2)
        for k, day in enumerate((0, 1, 4)):
            rows.append((200 + k, 2, base + dt.timedelta(days=day)))
        # customer 3: only 2 orders (1 gap) -> filtered out
        rows.append((300, 3, base))
        rows.append((301, 3, base + dt.timedelta(days=2)))
        orders = spark.createDataFrame(
            rows, "o_orderkey long, o_custkey long, o_orderdate timestamp"
        )
        from logistics_data_pipeline_spark.operators import analytics

        out = {r.o_custkey: r for r in analytics.reorder_intervals(orders).collect()}
        assert set(out) == {1, 2}
        r1 = out[1]
        assert r1.n_orders == 5 and r1.avg_gap_days == 7.0
        assert r1.std_gap_days == 0.0 and r1.cv_gap == 0.0
        r2 = out[2]
        assert r2.n_orders == 3 and r2.avg_gap_days == 2.0
        assert r2.min_gap_days == 1.0 and r2.max_gap_days == 3.0
        assert abs(r2.std_gap_days - round(2**0.5, 6)) < 1e-6


class TestGopherRules:
    def test_known_flags(self, spark):
        from logistics_data_pipeline_spark.llm import curation

        good = ("the be to of and that have with " + "word " * 52).strip()  # 60 words
        short = "the be tiny"
        longw = " ".join(["pneumonoultramicroscopic"] * 60)  # mean len 24
        docs = spark.createDataFrame(
            [(1, good, "en", "s", 1), (2, short, "en", "s", 1), (3, longw, "en", "s", 1)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        out = {r.doc_id: r for r in curation.gopher_rules(docs).collect()}
        assert out[1].keep and out[1].fail_reason is None
        assert out[1].n_words == 60 and out[1].stop_hits == 8
        assert not out[2].keep and out[2].fail_reason == "WORD_COUNT"
        assert not out[3].keep and out[3].fail_reason == "MEAN_WORD_LEN"
        assert out[3].pass_word_count and not out[3].pass_mean_word_len


class TestAbTestSrm:
    def test_matches_reference_computation(self, spark):
        import datetime as dt
        import hashlib
        import statistics

        base = dt.datetime(2024, 5, 1)
        rows, vals = [], {}
        for uid in range(200):
            for k in range(3):
                v = round((uid % 7) + k * 0.5, 2)
                rows.append((uid * 10 + k, base, uid, "A", v, "{}"))
                vals.setdefault(uid, []).append(v)
        ev = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        from logistics_data_pipeline_spark.operators import analytics

        r = analytics.ab_test_srm(ev).collect()[0]
        arm_a = {u for u in vals if hashlib.md5(str(u).encode()).hexdigest()[0] < "8"}
        assert r.n_users_a == len(arm_a)
        assert r.n_users_b == 200 - len(arm_a)
        va = [v for u in arm_a for v in vals[u]]
        vb = [v for u in vals if u not in arm_a for v in vals[u]]
        assert r.n_a == len(va) and r.n_b == len(vb)
        assert abs(r.mean_a - statistics.mean(va)) < 1e-6
        assert abs(r.mean_b - statistics.mean(vb)) < 1e-6
        expected_srm = (r.n_users_a - r.n_users_b) ** 2 / 200
        assert abs(r.srm_chi2 - expected_srm) < 1e-6


class TestPhashNeardup:
    def test_identical_and_perturbed_payloads(self, spark):
        from logistics_data_pipeline_spark.llm import multimodal

        body = ("spark dct perceptual hash block " * 12)[:300]
        perturbed = body[:150] + "XY" + body[152:]  # 2-byte local edit
        docs = spark.createDataFrame(
            [(1, body, "en", "s", 300), (2, body, "en", "s", 300),
             (3, perturbed, "en", "s", 300),
             (4, "completely different content " * 11, "en", "s", 300)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        out = {(r.a_id, r.b_id): r.hamming
               for r in multimodal.media_phash_neardup(docs).collect()}
        # identical payloads: hamming 0
        assert out[(1, 2)] == 0
        # a 2-byte local edit stays within the hamming budget
        assert (1, 3) in out and out[(1, 3)] <= multimodal.PHASH_MAX_HAMMING
        for h in out.values():
            assert 0 <= h <= multimodal.PHASH_MAX_HAMMING


class TestHoldoutPerplexity:
    def test_eval_side_only_and_oov(self, spark):
        import hashlib

        rows = [(i, "alpha beta gamma delta epsilon", "en", "s", 5) for i in range(40)]
        # one eval-side doc with a bigram no train doc contains
        rows.append((1000, "zz qq zz qq zz qq", "en", "s", 6))
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        out = {r.doc_id: r for r in text.holdout_perplexity(docs).collect()}
        eval_ids = {i for i, *_ in rows
                    if hashlib.md5(str(i).encode()).hexdigest()[0] >= "c"}
        assert set(out) == {i for i in eval_ids}
        if 1000 in out:  # md5('1000') starts with 'a' -> train; guard anyway
            assert out[1000].oov_frac == 1.0
        # common docs: every bigram seen in training -> oov 0, finite logp
        common = [r for i, r in out.items() if i != 1000]
        assert common
        for r in common:
            assert r.n_unseen == 0 and r.oov_frac == 0.0
            assert r.avg_logprob < 0


class TestAbcXyz:
    def test_classes(self, spark):
        import datetime as dt

        rows = []
        base = dt.datetime(2024, 1, 1)
        # part 1: ~55% of revenue, perfectly steady 10/week -> cum_share
        # 0.55 <= 0.8 -> A; constant weekly demand -> X
        for k in range(10):
            rows.append((k, 1, 10.0, 1_000.0, 0.0, base + dt.timedelta(weeks=k)))
        # mid parts pad the Pareto curve
        rows.append((50, 3, 1.0, 4_000.0, 0.0, base + dt.timedelta(weeks=1)))
        rows.append((51, 4, 1.0, 3_000.0, 0.0, base + dt.timedelta(weeks=2)))
        rows.append((52, 5, 1.0, 1_000.0, 0.0, base + dt.timedelta(weeks=4)))
        # part 2: tiny revenue, one burst week -> C + erratic (Z)
        rows.append((100, 2, 50.0, 10.0, 0.0, base + dt.timedelta(weeks=3)))
        li = spark.createDataFrame(
            rows,
            "l_orderkey long, l_partkey long, l_quantity double,"
            " l_extendedprice double, l_discount double, l_shipdate timestamp",
        )
        from logistics_data_pipeline_spark.operators import tpch_extra

        out = {r.p_partkey: r for r in tpch_extra.abc_xyz(li).collect()}
        assert out[1].abc_class == "A" and out[1].xyz_class == "X"
        assert out[1].cell == "AX" and out[1].n_active_weeks == 10
        assert out[2].abc_class == "C" and out[2].xyz_class == "Z"
        assert out[2].demand_cv > 1.0


class TestMahalanobisOod:
    def test_planted_outlier_flags(self, spark):
        rows = [(i, [1.0 + (i % 5) * 0.01, 2.0 - (i % 7) * 0.01, 0.5, -0.5], 0)
                for i in range(60)]
        rows.append((999, [50.0, -50.0, 9.0, 9.0], 1))  # far outside
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        out = {r.vec_id: r for r in similarity.mahalanobis_ood(emb).collect()}
        assert len(out) == 61
        assert out[999].is_outlier
        assert out[999].maha_sq > max(r.maha_sq for v, r in out.items() if v != 999)
        # every dimension varies in this fixture -> all contribute
        assert all(r.n_dims_used == 4 for r in out.values())


class TestSeasonalIndex:
    def test_flat_series_indexes_to_one(self, spark):
        import datetime as dt

        rows = []
        k = 0
        for yr in (2023, 2024):
            for mo in range(1, 13):
                for d in (3, 17):
                    rows.append((k, 1, "O", 100.0, dt.datetime(yr, mo, d), "1-URGENT"))
                    k += 1
        orders = spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        )
        from logistics_data_pipeline_spark.operators import analytics

        out = analytics.seasonal_index(orders).collect()
        assert [r.mo for r in out] == list(range(1, 13))
        for r in out:
            assert r.n_years == 2
            assert abs(r.seasonal_index - 1.0) < 1e-9


class TestPowerAnalysis:
    def test_monotone_and_reference_value(self, spark):
        import datetime as dt
        import statistics

        vals = [round((i % 10) + 0.25, 2) for i in range(500)]
        ev = spark.createDataFrame(
            [(i, dt.datetime(2024, 1, 1), i, "A", v, "{}") for i, v in enumerate(vals)],
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        from logistics_data_pipeline_spark.operators import analytics

        out = analytics.power_analysis(ev).collect()
        assert [r.mde_frac for r in out] == [0.01, 0.02, 0.05, 0.1]
        # smaller detectable effect -> more samples, ~quadratically
        assert out[0].n_per_arm > out[1].n_per_arm > out[3].n_per_arm
        mean, var = statistics.mean(vals), statistics.variance(vals)
        import math
        expected = math.ceil(
            2 * (analytics.POWER_Z_ALPHA + analytics.POWER_Z_BETA) ** 2 * var
            / (0.05 * mean) ** 2
        )
        assert abs(out[2].n_per_arm - expected) <= 1


class TestRakeKeywords:
    def test_multiword_connected_phrase_wins(self, spark):
        # "fast spark engine" recurs as a phrase; "slow" only alone
        body = "fast spark engine of fast spark engine and slow to fast spark engine"
        docs = spark.createDataFrame(
            [(1, body, "en", "s", len(body)), (2, body, "en", "s", len(body))],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        out = text.rake_keywords(docs).collect()
        top = out[0]
        assert top.phrase == "fast spark engine"
        assert top.n_words == 3 and top.n_occurrences == 6
        # each member word: freq 6 (or 7 for 'fast'), degree = 3 per phrase
        # occurrence -> word score ~3; phrase score ~9 > any 1-word phrase
        assert top.score > 8.0
        by_phrase = {r.phrase: r for r in out}
        assert by_phrase["slow"].score < top.score


class TestIntrinsicDim:
    def test_planar_manifold_detected(self, spark):
        import math
        import random

        rng = random.Random(7)
        # 300 vectors on a 2-D plane embedded in 8-D (+ distinct coords)
        rows = []
        for i in range(300):
            a, b = rng.uniform(-1, 1), rng.uniform(-1, 1)
            v = [a, b, a + b, a - b, 0.5 * a, 0.5 * b, 0.25 * a, 0.25 * b]
            rows.append((i, [float(x) for x in v], 0))
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        r = similarity.intrinsic_dim(emb, n_anchors=128).collect()[0]
        assert r.n_anchors_used > 100
        # true manifold dimension is 2; TwoNN should land well under 8
        assert 1.0 <= r.intrinsic_dim <= 4.0
        assert r.mean_ln_mu > 0


class TestCuped:
    def test_correlated_covariate_reduces_variance(self, spark):
        import datetime
        import random

        rng = random.Random(11)
        base = datetime.datetime(2024, 1, 1)
        rows = []
        for uid in range(200):
            persistent = rng.uniform(10, 100)  # user's stable spend level
            # pre-period event (covariate) and post-period event (metric):
            # Y strongly tracks X, so CUPED should remove most variance
            rows.append((uid * 2, base + datetime.timedelta(days=1), uid,
                         "purchase", round(persistent + rng.uniform(-2, 2), 2)))
            rows.append((uid * 2 + 1, base + datetime.timedelta(days=20), uid,
                         "purchase", round(persistent + rng.uniform(-2, 2), 2)))
        ev = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
        )
        from logistics_data_pipeline_spark.operators.analytics import cuped_adjustment

        r = cuped_adjustment(ev).collect()[0]
        assert r.n == 200 and r.n_a + r.n_b == 200
        # Y = X + small noise: theta near 1, most variance explained
        assert 0.8 < r.theta < 1.2
        assert r.var_reduction_pct > 80.0
        # adjustment is mean-preserving: the weighted arm means still
        # average to the overall post-period mean
        raw = (r.n_a * r.mean_a_raw + r.n_b * r.mean_b_raw) / r.n
        adj = (r.n_a * r.mean_a_adj + r.n_b * r.mean_b_adj) / r.n
        assert abs(raw - adj) < 1e-6
        # no true treatment effect was planted: adjusted lift is small
        # and its noise is tighter than (or comparable to) the raw lift
        assert abs(r.lift_adj) <= abs(r.lift_raw) + 1e-9


class TestPcmStats:
    def test_known_signal(self, spark):
        import math

        from logistics_data_pipeline_spark.llm.multimodal import pcm_stats

        # UTF-8 bytes are the PCM stream: 'aaaa' -> two identical
        # positive samples 0x6161; 'aaé' -> 61 61 C3 A9 -> one
        # positive sample then 0xA9C3 = -22077 (sign change)
        docs = spark.createDataFrame(
            [(1, "aaaa", "en", "s", 4), (2, "aaé", "en", "s", 4)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        rows = {r.media_id: r for r in pcm_stats(docs).collect()}
        flat = rows[1]
        assert flat.n_samples == 2
        assert flat.dc_offset == 24929.0 and flat.peak == 24929
        assert flat.zero_crossings == 0 and flat.zcr == 0.0
        assert flat.rms == 24929.0
        mixed = rows[2]
        assert mixed.n_samples == 2
        assert mixed.zero_crossings == 1 and mixed.zcr == 1.0
        assert mixed.peak == 24929
        assert mixed.dc_offset == round((24929 - 22077) / 2, 6)
        assert mixed.rms == round(
            math.sqrt((24929 * 24929 + 22077 * 22077) / 2), 6
        )


class TestBootstrapCi:
    def test_ci_brackets_mean_and_scales_with_n(self, spark):
        import datetime

        base = datetime.datetime(2024, 1, 1)
        rows = [
            (i, base, i % 97, "a", float(50 + (i * 37) % 11))  # tight spread
            for i in range(2000)
        ]
        ev = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, value double",
        )
        from logistics_data_pipeline_spark.operators.analytics import (
            BOOT_B,
            bootstrap_ci,
        )

        r = bootstrap_ci(ev).collect()[0]
        assert r.n_replicates == BOOT_B
        assert r.ci_lo <= r.mean_value <= r.ci_hi
        assert 0 < r.boot_se < 1.0  # se of the mean ~ sd/sqrt(2000) << 1
        # CI width should be a few SEs, not degenerate, not huge
        assert 0 < (r.ci_hi - r.ci_lo) < 8 * r.boot_se


class TestCdcChunkDedup:
    def test_shift_invariance_vs_unrelated(self, spark):
        from logistics_data_pipeline_spark.llm.dedup import cdc_chunk_dedup

        body = " ".join(f"word{i % 50} item{i % 31} thing{i % 17}" for i in range(120))
        shifted = "inserted " + body  # one-token head edit
        unrelated = " ".join(f"zz{i} qq{i * 3 + 1}" for i in range(360))
        mk = lambda rows: spark.createDataFrame(  # noqa: E731
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        r_shift = cdc_chunk_dedup(
            mk([(1, body, "en", "s", 1), (2, shifted, "en", "s", 1)])
        ).collect()[0]
        # CDC re-synchronizes after the edited chunk: the two docs share
        # almost all chunks -> big dedup despite the shift
        assert r_shift.dup_chunk_pct > 35.0
        assert r_shift.savings_pct > 35.0
        r_unrel = cdc_chunk_dedup(
            mk([(1, body, "en", "s", 1), (2, unrelated, "en", "s", 1)])
        ).collect()[0]
        assert r_unrel.dup_chunk_pct < 5.0
        # boundaries are content-defined: mean chunk length ~ CDC_DIV
        assert 3.0 < r_shift.avg_chunk_tokens < 20.0


class TestHoltForecast:
    def test_linear_series_recovered_exactly(self, spark):
        import datetime

        from logistics_data_pipeline_spark.operators.analytics import (
            HOLT_H,
            HOLT_K,
            holt_forecast,
        )

        base = datetime.datetime(2024, 3, 1)
        rows = []
        eid = 0
        # 20 days of perfectly linear daily totals: day t sums to 100+10t
        for t in range(20):
            for part in (60.0, 40.0 + 10.0 * t):
                rows.append(
                    (eid, base + datetime.timedelta(days=t), 1, "purchase", part)
                )
                eid += 1
        ev = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, value double",
        )
        out = holt_forecast(ev).collect()
        assert len(out) == HOLT_H
        # on an exactly linear series Holt is exact: trend = 10,
        # level = last window day's total, forecasts continue the line
        last_total = 100.0 + 10.0 * 19
        for r in out:
            assert abs(r.trend - 10.0) < 1e-6
            assert abs(r.level - last_total) < 1e-6
            assert abs(r.forecast - (last_total + 10.0 * r.h)) < 1e-6
        # fewer than K days -> no forecast rows (explicit gate, not junk)
        short = spark.createDataFrame(
            rows[: 2 * (HOLT_K - 2)],
            "event_id long, ts timestamp, user_id long, event_type string, value double",
        )
        assert holt_forecast(short).count() == 0


class TestLinkPrediction:
    def test_planted_missing_link_tops_exact_mode(self, spark):
        from logistics_data_pipeline_spark.operators.analytics import link_prediction

        rows = []
        # orders 1..3 each contain part 100 with middles 1,2,3; orders
        # 4..6 contain part 200 with the same middles -> 100 and 200
        # share 3 neighbors but never co-occur. Filler orders give the
        # middles extra degree so RA weights differ from 1.
        oid = 0
        for mid in (1, 2, 3):
            for endpoint in (100, 200):
                rows.append((oid, endpoint))
                rows.append((oid, mid))
                oid += 1
        for f in range(10):  # filler: middles paired with unique parts
            rows.append((oid, 300 + f))
            rows.append((oid, 1 + f % 3))
            oid += 1
        li = spark.createDataFrame(
            [(o, p, 1.0) for o, p in rows],
            "l_orderkey long, l_partkey long, l_quantity double",
        )
        out = link_prediction(li, sample_hex="g", sample_scale=1).collect()
        planted = [r for r in out if {r.u, r.w} == {100, 200}]
        assert planted, out[:5]
        r = planted[0]
        # 3 shared middles: middle 1 has degree 6 (2 endpoints + 4
        # fillers), middles 2 and 3 degree 5 -> RA = 1/6 + 1/5 + 1/5;
        # Jaccard = 3/(3+3-3)
        assert r.cn_est == 3
        assert r.ra_score == round(1 / 6 + 1 / 5 + 1 / 5, 6)
        assert r.jaccard == 1.0
        # sampled mode is a subset estimate: never exceeds 16x exact,
        # and remains a valid frame (may drop the pair entirely)
        sampled = link_prediction(li).collect()
        for r in sampled:
            assert r.cn_est % 16 == 0


class TestWipSweep:
    def test_planted_overlap_and_littles_identity(self, spark):
        import datetime

        from logistics_data_pipeline_spark.operators.tpch_extra import wip_sweep

        d = lambda n: datetime.datetime(2024, 1, 1) + datetime.timedelta(days=n)  # noqa: E731
        orders = spark.createDataFrame(
            [(1, d(0)), (2, d(1)), (3, d(2))], "o_orderkey long, o_orderdate timestamp"
        )
        # order 1 ships day 3, order 2 day 2, order 3 day 4:
        # WIP curve: day0:1 day1:2 day2:3 day3:2 day4:1 day5:0
        li = spark.createDataFrame(
            [(1, d(3)), (2, d(2)), (3, d(4)), (3, d(1))],
            "l_orderkey long, l_shipdate timestamp",
        )
        r = wip_sweep(orders, li).collect()[0]
        assert r.n_orders == 3
        assert r.max_wip == 3
        assert r.span_days == 5  # day0 .. day5 (close+1)
        # durations: 4 + 2 + 3 = 9 days in system
        assert r.w_days == 3.0
        assert r.l_avg_wip == round(9 / 5, 6)
        assert abs(r.littles_gap) < 1e-9


class TestHoltBacktest:
    def test_linear_series_backtests_to_zero_error(self, spark):
        import datetime

        from logistics_data_pipeline_spark.operators.analytics import (
            BACKTEST_ORIGINS,
            holt_backtest,
        )

        base = datetime.datetime(2024, 3, 1)
        rows = []
        for t in range(25):  # linear daily totals 100+10t, single event/day
            rows.append((t, base + datetime.timedelta(days=t), 1, "x",
                         100.0 + 10.0 * t))
        ev = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, value double",
        )
        out = holt_backtest(ev).collect()
        assert len(out) == BACKTEST_ORIGINS
        for r in out:
            # Holt is exact on a line: every 1-step forecast hits the actual
            assert abs(r.forecast - r.actual) < 1e-6
            assert r.abs_pct_err < 1e-6
        # origins target consecutive days ending at the latest
        days = [r.target_day for r in out]
        assert days == sorted(days)


class TestKdeDensity:
    def test_density_integrates_to_one_and_peaks_at_mode(self, spark):
        import datetime

        from logistics_data_pipeline_spark.operators.analytics import (
            KDE_GRID,
            kde_density,
        )

        base = datetime.datetime(2024, 1, 1)
        # bimodal INTERIOR clusters (anchors at 0/100 pin the grid so
        # no cluster sits on a boundary, where kernel mass truncates)
        vals = (
            [0.0, 100.0]
            + [20.0 + (i % 7) * 0.5 for i in range(700)]
            + [80.0 + (i % 5) * 0.5 for i in range(300)]
        )
        ev = spark.createDataFrame(
            [(i, base, 1, "x", v) for i, v in enumerate(vals)],
            "event_id long, ts timestamp, user_id long, event_type string, value double",
        )
        rows = kde_density(ev).collect()
        assert len(rows) == KDE_GRID
        xs = [r.x for r in rows]
        ds = [r.density for r in rows]
        # trapezoid integral of the density ~ 1 (kernel mass inside range)
        integral = sum(
            (ds[i] + ds[i + 1]) / 2 * (xs[i + 1] - xs[i]) for i in range(len(xs) - 1)
        )
        assert 0.85 < integral < 1.1
        # the mode sits near 20, and density near 50 is ~0
        peak_x = xs[ds.index(max(ds))]
        assert 12 < peak_x < 30
        mid = min(rows, key=lambda r: abs(r.x - 50.0))
        assert mid.density < max(ds) / 20


class TestShapleyAttribution:
    def test_axioms_on_planted_game(self, spark):
        import datetime

        from logistics_data_pipeline_spark.operators.temporal import (
            shapley_attribution,
        )

        base = datetime.datetime(2024, 1, 1)
        rows, eid = [], 0

        def user(uid, types):
            nonlocal eid
            for t in types:
                rows.append((eid, base, uid, t, 1.0))
                eid += 1

        # 100 users touch only click; half convert. 100 touch only view;
        # none convert. 100 touch click+view; half convert -> view is a
        # NULL PLAYER (adds nothing to any coalition): shapley(view)=0
        for u in range(100):
            user(u, ["click"] + (["purchase"] if u % 2 == 0 else []))
        for u in range(100, 200):
            user(u, ["view"])
        for u in range(200, 300):
            user(u, ["click", "view"] + (["purchase"] if u % 2 == 0 else []))
        ev = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, value double",
        )
        got = {r.channel: r.shapley_value for r in shapley_attribution(ev).collect()}
        assert set(got) == {"click", "view", "signup", "error"}
        # view is a NULL PLAYER (adds nothing to any coalition) -> 0;
        # click carries the only positive marginal contributions;
        # signup/error pick up -1/12 each: the simplified game sets
        # unobserved coalitions to 0, so "adding" them to {click}
        # destroys its 0.5 rate -- the documented v==0 convention
        assert abs(got["view"]) < 1e-9
        assert got["click"] == round(1 / 6, 9)
        assert got["signup"] == got["error"] == round(-1 / 12, 9)
        # efficiency: sum of credits == v(full set) - v(empty) == 0
        assert abs(sum(got.values())) < 1e-8


class TestDailyAcf:
    def test_weekly_cycle_peaks_at_lag_7(self, spark):
        import datetime

        from logistics_data_pipeline_spark.operators.analytics import daily_acf

        base = datetime.datetime(2024, 1, 1)
        rows = []
        # 56 days with a strong 7-day cycle: weekends (t%7 in 5,6) spike
        for t in range(56):
            amp = 300.0 if t % 7 in (5, 6) else 100.0
            rows.append((t, base + datetime.timedelta(days=t), 1, "x", amp))
        ev = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, value double",
        )
        out = {r.lag: r for r in daily_acf(ev).collect()}
        assert len(out) == 14
        peak = [lag for lag, r in out.items() if r.is_peak]
        assert peak == [7]
        assert out[7].acf > 0.8
        assert out[3].acf < 0.2  # off-cycle lag decorrelates
        assert out[14].acf > 0.6  # harmonic of the weekly cycle


class TestConformalForecast:
    def test_interval_brackets_linear_series(self, spark):
        import datetime

        from logistics_data_pipeline_spark.operators.analytics import (
            CONF_CALIB,
            conformal_forecast,
        )

        base = datetime.datetime(2024, 3, 1)
        rows = []
        # linear trend + small deterministic wobble -> residuals are the
        # wobble scale, interval must be tight around the line
        for t in range(30):
            wobble = 3.0 if t % 2 == 0 else -3.0
            rows.append((t, base + datetime.timedelta(days=t), 1, "x",
                         100.0 + 10.0 * t + wobble))
        ev = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, value double",
        )
        r = conformal_forecast(ev).collect()[0]
        assert r.n_calib == CONF_CALIB
        true_next = 100.0 + 10.0 * 30
        assert r.lo <= true_next <= r.hi
        # wobble amplitude bounds the band: q_resid in (0, ~3x wobble]
        assert 0 < r.q_resid < 10.0
        assert abs((r.hi - r.lo) - 2 * r.q_resid) < 1e-6


class TestMannWhitney:
    def test_planted_shift_detected_and_null_passes(self, spark):
        import datetime

        from logistics_data_pipeline_spark.operators.analytics import (
            AB_SPLIT_HEX,
            mann_whitney_u,
        )
        import hashlib

        def is_a(uid):
            return hashlib.md5(str(uid).encode()).hexdigest()[0] < AB_SPLIT_HEX

        base = datetime.datetime(2024, 1, 1)
        # planted shift: arm A values ~ 100 + noise, arm B ~ 110 + noise
        rows = []
        for uid in range(400):
            shift = 0.0 if is_a(uid) else 10.0
            rows.append((uid, base, uid, "x", 100.0 + shift + (uid * 13 % 7)))
        ev = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, value double",
        )
        r = mann_whitney_u(ev).collect()[0]
        assert r.n1 + r.n2 == 400
        assert r.z < -5  # arm A sits stochastically below arm B
        assert bool(r.significant)
        # no-shift null: same noise both arms -> |z| small
        rows0 = [
            (uid, base, uid, "x", 100.0 + (uid * 13 % 7)) for uid in range(400)
        ]
        ev0 = spark.createDataFrame(
            rows0,
            "event_id long, ts timestamp, user_id long, event_type string, value double",
        )
        r0 = mann_whitney_u(ev0).collect()[0]
        assert abs(r0.z) < 2.5


class TestKsTest:
    def test_variance_shift_detected_where_means_agree(self, spark):
        import datetime

        from logistics_data_pipeline_spark.operators.analytics import (
            AB_SPLIT_HEX,
            ks_test,
        )
        import hashlib

        def is_a(uid):
            return hashlib.md5(str(uid).encode()).hexdigest()[0] < AB_SPLIT_HEX

        base = datetime.datetime(2024, 1, 1)
        rows = []
        # both arms mean 100, but B has 5x the spread: KS must fire
        for uid in range(600):
            off = (uid * 17 % 21) - 10  # symmetric around 0
            spread = 1.0 if is_a(uid) else 5.0
            rows.append((uid, base, uid, "x", 100.0 + spread * off))
        ev = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, value double",
        )
        r = ks_test(ev).collect()[0]
        assert r.n1 + r.n2 == 600
        assert r.d_stat > 0.3
        assert bool(r.significant)
        # identical distributions -> D small, not significant
        rows0 = [
            (uid, base, uid, "x", 100.0 + (uid * 17 % 21) - 10)
            for uid in range(600)
        ]
        ev0 = spark.createDataFrame(
            rows0,
            "event_id long, ts timestamp, user_id long, event_type string, value double",
        )
        r0 = ks_test(ev0).collect()[0]
        assert not bool(r0.significant)


class TestJamesStein:
    def test_small_groups_shrink_more(self, spark):
        import datetime

        from logistics_data_pipeline_spark.operators.analytics import (
            james_stein_means,
        )

        base = datetime.datetime(2024, 1, 1)
        rows = []
        eid = 0
        # big group at mean 100, tiny group at mean 140 (same spread):
        # the tiny group must shrink toward the grand mean much harder
        for i in range(500):
            rows.append((eid, base, i, "big", 100.0 + (i % 11) - 5)); eid += 1
        for i in range(8):
            rows.append((eid, base, i, "tiny", 140.0 + (i % 11) - 5)); eid += 1
        ev = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, value double",
        )
        got = {r.event_type: r for r in james_stein_means(ev).collect()}
        big, tiny = got["big"], got["tiny"]
        assert tiny.shrink_factor > big.shrink_factor
        assert big.shrink_factor < 0.05  # n=500: essentially no shrink
        # shrunk mean moves toward the grand mean, never past it
        assert big.grand_mean < tiny.mean_shrunk < tiny.mean_raw
