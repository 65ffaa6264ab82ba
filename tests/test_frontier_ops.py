"""Fixture-level semantics for the frontier-panel operators added this
session: Theil–Sen robust trend, Benford digit audit, Gini/Lorenz
concentration, the 2-D Pareto skyline, item-item similarity,
gaps-and-islands streaks, date-spine gap fill, MOSS winnowing, and
edit-distance candidate verification. The sf0.01 oracle gate pins exact
values; these pin the invariants the gate can't express (known-answer
geometry, the winnowing detection guarantee, robustness-to-outlier)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from logistics_data_pipeline_spark.llm import dedup, text
from logistics_data_pipeline_spark.operators import analytics, temporal
from logistics_data_pipeline_spark.operators import tpch_extra as tx


def _orders(spark, rows):
    return spark.createDataFrame(
        [
            (i, ck, "O", float(price), datetime.datetime(y, m, 1), "1-URGENT")
            for i, (ck, price, y, m) in enumerate(rows)
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )


def _dims(spark):
    customer = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20)], "c_custkey long, c_nationkey long"
    )
    nation = spark.createDataFrame(
        [(10, "ALPHA"), (20, "BETA")], "n_nationkey long, n_name string"
    )
    return customer, nation


class TestTheilSen:
    def test_exact_linear_slope(self, spark):
        # monthly revenue 100, 200, 300, 400 -> every pairwise slope 100
        rows = [(1, 100.0 * (m + 1), 2024, m + 1) for m in range(4)]
        orders = _orders(spark, rows)
        customer, nation = _dims(spark)
        out = tx.theilsen_trend(orders, customer, nation).collect()
        assert len(out) == 1
        assert out[0].theilsen_slope_per_month == pytest.approx(100.0)
        assert out[0].n_pairs == 6

    def test_robust_to_one_outlier_month(self, spark):
        # linear 100/month except one 100x spike month: the MEDIAN slope
        # stays at the clean trend while OLS gets dragged
        rows = [(1, 100.0 * (m + 1), 2024, m + 1) for m in range(7)]
        rows[6] = (1, 40000.0, 2024, 7)  # spike at the END, where OLS leverage peaks
        orders = _orders(spark, rows)
        customer, nation = _dims(spark)
        ts = tx.theilsen_trend(orders, customer, nation).collect()[0]
        ols = tx.revenue_trend(orders, customer, nation).collect()[0]
        assert abs(ts.theilsen_slope_per_month - 100.0) < 60.0
        assert abs(ols.slope_per_month - 100.0) > 500.0


class TestBenford:
    def test_spine_complete_and_shares(self, spark):
        # only digits 1 and 9 present; the other seven report 0
        rows = [(1, 1234.0, 2024, 1)] * 3 + [(1, 9000.5, 2024, 2)]
        out = tx.benford_digits(_orders(spark, rows)).collect()
        assert [r.digit for r in out] == list(range(1, 10))
        by_d = {r.digit: r for r in out}
        assert by_d[1].n_orders == 3 and by_d[1].obs_share == pytest.approx(0.75)
        assert by_d[9].n_orders == 1
        assert by_d[5].n_orders == 0 and by_d[5].obs_share == 0.0
        assert sum(r.obs_share for r in out) == pytest.approx(1.0, abs=1e-5)
        # Benford expectation columns are the injected literals
        assert by_d[1].benford_share == pytest.approx(0.30103, abs=1e-5)
        assert by_d[1].excess == pytest.approx(0.75 - 0.30103, abs=1e-5)


class TestGini:
    def test_perfect_equality_is_zero(self, spark):
        rows = [(ck, 500.0, 2024, 1) for ck in range(1, 9)]
        out = tx.revenue_gini(_orders(spark, rows)).collect()[0]
        assert out.gini == pytest.approx(0.0, abs=1e-6)
        assert out.n_customers == 8

    def test_total_concentration_approaches_limit(self, spark):
        # one whale, nine dust accounts: G within a hair of (n-1)/n
        rows = [(1, 1e6, 2024, 1)] + [(ck, 0.01, 2024, 1) for ck in range(2, 11)]
        out = tx.revenue_gini(_orders(spark, rows)).collect()[0]
        assert out.gini == pytest.approx(0.9, abs=1e-3)
        assert out.top10pct_share == pytest.approx(1.0, abs=1e-3)


class TestParetoFront:
    def test_known_frontier(self, spark):
        part = spark.createDataFrame(
            [
                (1, "a", "B", "T", 10, 5.0),   # frontier (cheapest)
                (2, "b", "B", "T", 20, 7.0),   # frontier (bigger, pricier)
                (3, "c", "B", "T", 15, 7.0),   # dominated by 2 (same price, smaller)
                (4, "d", "B", "T", 8, 9.0),    # dominated by 1 and 2
                (5, "e", "B", "T", 30, 12.0),  # frontier
            ],
            "p_partkey long, p_name string, p_brand string, p_type string, "
            "p_size int, p_retailprice double",
        )
        keys = [r.p_partkey for r in tx.part_pareto_front(part).collect()]
        assert keys == [1, 2, 5]

    def test_equal_points_both_survive(self, spark):
        part = spark.createDataFrame(
            [(1, "a", "B", "T", 10, 5.0), (2, "b", "B", "T", 10, 5.0)],
            "p_partkey long, p_name string, p_brand string, p_type string, "
            "p_size int, p_retailprice double",
        )
        keys = [r.p_partkey for r in tx.part_pareto_front(part).collect()]
        assert keys == [1, 2]  # neither strictly dominates the other


def _lineitem(spark, baskets):
    rows = []
    for ok, parts in enumerate(baskets):
        for ln, pk in enumerate(parts):
            rows.append((ok, pk, 1, ln, 1.0, 10.0, 0.0, 0.0, "N", "O",
                         datetime.datetime(2024, 1, 1)))
    return spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )


class TestItemSimilarity:
    def test_known_jaccard_and_rank(self, spark):
        # parts 1,2 co-occur twice; 1,3 once (pruned by min_co=2)
        li = _lineitem(spark, [[1, 2], [1, 2], [1, 3], [2]])
        out = analytics.item_similarity(li, top_k=3, min_co=2).collect()
        by_src = {(r.p_partkey, r.neighbor_partkey): r for r in out}
        assert (1, 3) not in by_src
        r = by_src[(1, 2)]
        # |O1|=3, |O2|=3, co=2 -> 2/(3+3-2)
        assert r.co_orders == 2 and r.jaccard == pytest.approx(0.5)
        assert by_src[(2, 1)].jaccard == pytest.approx(0.5)  # symmetric
        assert all(r.rank <= 3 for r in out)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, datetime.datetime(2024, 1, d, h), uid, "view", float(v), "{}")
            for i, (uid, d, h, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


class TestGapsIslands:
    def test_streak_census(self, spark):
        # user 1: days 1-3 then 5 -> streaks [3, 1]; user 2: day 2 only
        ev = _events(
            spark,
            [(1, 1, 9, 1), (1, 2, 9, 1), (1, 2, 15, 1), (1, 3, 9, 1),
             (1, 5, 9, 1), (2, 2, 9, 1)],
        )
        out = {r.user_id: r for r in temporal.gaps_islands(ev).collect()}
        u1 = out[1]
        assert u1.n_active_days == 4 and u1.n_streaks == 2
        assert u1.longest_streak == 3
        assert u1.longest_streak_start == datetime.date(2024, 1, 1)
        assert out[2].longest_streak == 1

    def test_tie_breaks_to_earliest_start(self, spark):
        # two 2-day streaks: days 1-2 and 5-6
        ev = _events(spark, [(1, d, 9, 1) for d in (1, 2, 5, 6)])
        out = temporal.gaps_islands(ev).collect()[0]
        assert out.longest_streak == 2
        assert out.longest_streak_start == datetime.date(2024, 1, 1)


class TestDailyGapfill:
    def test_gap_surfaces_as_zero_row(self, spark):
        ev = _events(spark, [(1, 1, 9, 10), (1, 3, 9, 20)])  # day 2 silent
        out = temporal.daily_gapfill(ev).collect()
        assert [r.day for r in out] == [
            datetime.date(2024, 1, 1), datetime.date(2024, 1, 2),
            datetime.date(2024, 1, 3),
        ]
        gap = out[1]
        assert gap.n_events == 0 and gap.total_value == 0.0 and gap.is_gap
        assert not out[0].is_gap and out[0].total_value == pytest.approx(10.0)
        assert sum(r.n_events for r in out) == 2


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


class TestWinnowing:
    def test_detection_guarantee_and_density(self, spark):
        # winnowing guarantee: any shared run of >= w+k-1 (=8) words
        # yields at least one shared fingerprint
        shared = "alpha bravo charlie delta echo foxtrot golf hotel"
        docs = _docs(
            spark,
            [
                f"{shared} one two three four five six seven",
                f"zero nine eight {shared}",
                "completely different words with no overlap at all here",
            ],
        )
        sel = text._winnow_selected(docs, text.WINNOW_K, text.WINNOW_W)
        fp0 = {r.fp for r in sel.filter(F.col("doc_id") == 0).collect()}
        fp1 = {r.fp for r in sel.filter(F.col("doc_id") == 1).collect()}
        fp2 = {r.fp for r in sel.filter(F.col("doc_id") == 2).collect()}
        assert fp0 & fp1, "shared 8-word run must share a fingerprint"
        assert not (fp0 & fp2)
        census = {r.doc_id: r for r in text.winnowing(docs).collect()}
        for r in census.values():
            assert 1 <= r.n_fingerprints <= r.n_kgrams
            assert 0 < r.density <= 1.0

    def test_short_doc_keeps_one_fingerprint(self, spark):
        docs = _docs(spark, ["just four tiny words"])  # 4 tokens = 1 kgram
        out = text.winnowing(docs).collect()
        assert len(out) == 1 and out[0].n_fingerprints == 1
        assert text.winnowing(_docs(spark, ["one two"])).count() == 0

    def test_pairs_surface_duplicates(self, spark):
        body = " ".join(f"tok{i} common word stream flowing" for i in range(10))
        docs = _docs(spark, [body, body + " trailing extra", "other " * 30])
        pairs = text.winnowing_pairs(docs).collect()
        assert any({p.a_id, p.b_id} == {0, 1} for p in pairs)
        for p in pairs:
            assert 0 < p.fp_jaccard <= 1.0


class TestEditDistanceVerify:
    def test_identical_and_near_identical(self, spark):
        base = "the quick brown fox jumps over the lazy dog " * 4
        docs = _docs(spark, [base, base, base.replace("lazy", "hazy", 1)])
        out = dedup.editdistance_verify(docs).collect()
        by_pair = {(r.a_id, r.b_id): r for r in out}
        exact = by_pair[(0, 1)]
        assert exact.edit_distance == 0 and exact.edit_similarity == 1.0
        near = by_pair[(0, 2)]
        assert 0 < near.edit_distance <= 2
        assert near.edit_similarity > 0.98


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


class TestExactQuantizers:
    """kmeans_cells_exact / pq_codes_exact: the oracle gate pins exact
    cross-engine values; these pin the clustering geometry itself."""

    def test_kmeans_cells_separates_two_clusters(self, spark):
        from logistics_data_pipeline_spark.llm import similarity as sim

        # two tight cones on the unit sphere (cosine-separable)
        a = [[1.0, 0.02 * i, 0.0, 0.0] for i in range(6)]
        b = [[0.0, 0.02 * i, 0.0, 1.0] for i in range(6)]
        emb = _emb_df(spark, a + b)
        out = sim.kmeans_cells_exact(emb, n_cells=2, seed=7).collect()
        assert len(out) == 12
        assert all(r.cell_rank == 1 for r in out)
        cells_a = {r.cell for r in out if r.vec_id < 6}
        cells_b = {r.cell for r in out if r.vec_id >= 6}
        assert len(cells_a) == 1 and len(cells_b) == 1
        assert cells_a != cells_b

    def test_kmeans_cells_deterministic(self, spark):
        from logistics_data_pipeline_spark.llm import similarity as sim

        vecs = [[float((i * 7 + j * 3) % 5) + 0.1 for j in range(4)] for i in range(10)]
        emb = _emb_df(spark, vecs)
        r1 = sorted(map(tuple, sim.kmeans_cells_exact(emb, 3, seed=7).collect()))
        r2 = sorted(map(tuple, sim.kmeans_cells_exact(emb, 3, seed=7).collect()))
        assert r1 == r2

    def test_pq_codes_shape_and_subspace_independence(self, spark):
        from logistics_data_pipeline_spark.llm import similarity as sim

        # dim 4, 2 subspaces: first half clusters on axis-x, second on axis-y
        vecs = [[10.0, 0.0, 0.0, 5.0], [10.1, 0.0, 0.0, 5.1],
                [0.0, 10.0, 5.0, 0.0], [0.1, 10.0, 5.2, 0.0]]
        emb = _emb_df(spark, vecs)
        out = sim.pq_codes_exact(emb, n_subspaces=2, n_cells=2, seed=11).collect()
        assert len(out) == 8  # 4 vectors x 2 subspaces
        by_vs = {(r.vec_id, r.subspace): r for r in out}
        assert set(by_vs) == {(v, s) for v in range(4) for s in range(2)}
        # near-identical vectors land on the same code in every subspace
        for s in range(2):
            assert by_vs[(0, s)].code == by_vs[(1, s)].code
            assert by_vs[(2, s)].code == by_vs[(3, s)].code
            assert by_vs[(0, s)].code != by_vs[(2, s)].code
        assert all(r.sq_err >= 0 for r in out)

    def test_pq_exact_codes_match_numpy_reference(self, spark):
        """Independent numpy re-derivation of the one-round spec: md5
        seed order, rounded seed codebook, argmin-L2 assign, mean
        update, re-assign — codes and errors must agree."""
        import hashlib

        import numpy as np

        from logistics_data_pipeline_spark.llm import similarity as sim

        vecs = [[float((i * 5 + j * 7) % 9) for j in range(4)] for i in range(9)]
        emb = _emb_df(spark, vecs)
        n_sub, n_cells, seed = 2, 2, 11
        out = {
            (r.vec_id, r.subspace): (r.code, r.sq_err)
            for r in sim.pq_codes_exact(emb, n_sub, n_cells, seed).collect()
        }

        X = np.array(vecs)
        order = sorted(
            range(len(vecs)),
            key=lambda i: (hashlib.md5(f"{i}:{seed}".encode()).hexdigest(), i),
        )
        dsub = X.shape[1] // n_sub
        for s in range(n_sub):
            Xs = X[:, s * dsub:(s + 1) * dsub]
            cb = np.round(Xs[order[:n_cells]], 6)
            d2 = np.round(((Xs[:, None] - cb[None]) ** 2).sum(axis=2), 6)
            a0 = np.argmin(d2, axis=1)  # np.argmin ties -> lowest index, same rule
            cb1 = cb.copy()
            for c in range(n_cells):
                if (a0 == c).any():
                    cb1[c] = np.round(Xs[a0 == c].mean(axis=0), 6)
            d2b = np.round(((Xs[:, None] - cb1[None]) ** 2).sum(axis=2), 6)
            a1 = np.argmin(d2b, axis=1)
            for v in range(len(vecs)):
                code, err = out[(v, s)]
                assert code == a1[v], (v, s)
                assert err == pytest.approx(d2b[v, a1[v]], abs=1e-9)


class TestSemDedupAndCuration:
    def test_semdedup_drops_higher_id_of_within_cell_dup(self, spark):
        from logistics_data_pipeline_spark.llm import similarity as sim

        emb = _emb_df(spark, [
            [1.0, 0.0, 0.0, 0.0],      # 0: kept (cell minimum)
            [1.0, 0.001, 0.0, 0.0],    # 1: near-dup of 0 -> dropped
            [0.0, 0.0, 1.0, 0.0],      # 2: other cell, kept
            [0.0, 0.0, 0.99, 0.1],     # 3: near-dup of 2 -> dropped
        ])
        cells = spark.createDataFrame(
            [(0, 0), (1, 0), (2, 1), (3, 1)], "vec_id long, cell int"
        )
        out = {r.vec_id: r for r in sim.semdedup(emb, threshold=0.9, cells=cells).collect()}
        assert out[0].is_kept and not out[1].is_kept
        assert out[2].is_kept and not out[3].is_kept
        assert out[1].n_lower_dups == 1 and out[1].max_lower_cos > 0.99
        assert out[0].max_lower_cos is None  # cell minimum has no lower pair

    def test_semdedup_blocking_never_pairs_across_cells(self, spark):
        from logistics_data_pipeline_spark.llm import similarity as sim

        # identical vectors in DIFFERENT cells: the SemDeDup recall
        # trade — cross-cell dups are invisible by design
        emb = _emb_df(spark, [[1.0, 0.0], [1.0, 0.0]])
        cells = spark.createDataFrame([(0, 0), (1, 1)], "vec_id long, cell int")
        out = sim.semdedup(emb, threshold=0.5, cells=cells).collect()
        assert all(r.is_kept for r in out)

    def test_semdedup_shard_governor_bounds_pairs_and_matches_md5(self, spark):
        """Over-cap cell: pairs form only within the md5 sub-shard
        (shard id independently recomputed with hashlib here), and an
        under-cap cap reproduces the unsharded semantics exactly."""
        import hashlib

        from logistics_data_pipeline_spark.llm import similarity as sim

        n = 12
        emb = _emb_df(spark, [[1.0, 0.0001 * i] for i in range(n)])  # all dups
        cells = spark.createDataFrame(
            [(i, 0) for i in range(n)], "vec_id long, cell int"
        )

        # cap 4 on a 12-member cell -> ceil(12/4) = 3 shards
        def shard(vid, n_shards=3):
            h = hashlib.md5(f"sdshard:{vid}".encode()).hexdigest()[:12]
            return int(h, 16) % n_shards

        out = {
            r.vec_id: r
            for r in sim.semdedup(emb, threshold=0.9, cells=cells, cell_cap=4).collect()
        }
        shards = {v: shard(v) for v in range(n)}
        assert len(set(shards.values())) == 3  # governor actually split
        for v in range(n):
            expect = sum(1 for u in range(v) if shards[u] == shards[v])
            assert out[v].n_lower_dups == expect, (v, shards)
            assert out[v].is_kept == (expect == 0)

        # under-cap: single shard == the unsharded keep-lowest rule
        out1 = {
            r.vec_id: r
            for r in sim.semdedup(emb, threshold=0.9, cells=cells, cell_cap=64).collect()
        }
        for v in range(n):
            assert out1[v].n_lower_dups == v
            assert out1[v].is_kept == (v == 0)

    def test_semdedup_sql_twin_carries_the_same_governor(self):
        """The parameterized oracle builder embeds the same shard-count
        formula and md5 shard key the Spark side uses."""
        from logistics_data_pipeline_spark.llm import similarity as sim

        s = sim.semdedup_sql(40)
        assert "(COUNT(*) + 39) // 40" in s
        assert "'sdshard:' || CAST(c.vec_id AS VARCHAR)" in s
        assert "a.shard = b.shard" in s
        assert sim.SEMDEDUP_SQL == sim.semdedup_sql(sim.SEMDEDUP_CELL_CAP)

    def test_semdedup_sharded_regime_matches_duckdb_exactly(self, spark, sf_dir):
        """EXECUTED cross-engine diff of the SHARDED regime (ADVICE r7:
        the hex-cast shard key was only string-matched before): a small
        cell_cap forces ceil(size/cap) md5 sub-shards on real corpus
        data, and Spark must reproduce the DuckDB twin row for row —
        including n_lower_dups, which counts only within-shard pairs."""
        import duckdb

        from logistics_data_pipeline_spark.llm import similarity as sim

        cap = 8  # sf0.001 cells are larger than this -> sharded regime
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        sp = [
            (r.vec_id, r.cell, r.n_lower_dups, r.max_lower_cos, r.is_kept)
            for r in sim.semdedup(emb, cell_cap=cap).collect()
        ]
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
        )
        dk = [tuple(t) for t in con.sql(sim.semdedup_sql(cap)).fetchall()]
        # the governor must actually have split a cell AND dropped
        # cross-shard pairs (otherwise this is the unsharded regime)
        unsharded = {
            r.vec_id: r.n_lower_dups
            for r in sim.semdedup(emb, cell_cap=10**9).collect()
        }
        assert any(
            n < unsharded[v] for v, _, n, _, _ in sp
        ), "cap never bit: test is not exercising the sharded regime"
        assert sp == dk and len(sp) > 0

    def test_cluster_balanced_sample_caps_every_cell(self, spark):
        from logistics_data_pipeline_spark.llm import similarity as sim

        emb = _emb_df(spark, [[float(i), 1.0] for i in range(20)])
        cells = spark.createDataFrame(
            [(i, i % 2) for i in range(20)], "vec_id long, cell int"
        )
        out = sim.cluster_balanced_sample(emb, per_cell=3, cells=cells).collect()
        per = {}
        for r in out:
            per.setdefault(r.cell, []).append(r.pick_rank)
        assert set(per) == {0, 1}
        assert all(sorted(v) == [1, 2, 3] for v in per.values())

    def test_dsir_upweights_target_looking_docs(self, spark):
        from logistics_data_pipeline_spark.llm import curation as cur

        rows = []
        # target (en) docs speak 'alpha'; source-only (de) docs speak 'beta'
        for i in range(5):
            rows.append((i, "alpha " * 20, "en", "s0", 100))
        for i in range(5, 10):
            rows.append((i, "beta " * 20, "de", "s0", 100))
        # two probe docs in the source distribution, one per dialect
        rows.append((10, "alpha " * 20, "de", "s0", 100))
        rows.append((11, "beta " * 20, "en", "s0", 100))
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        out = {r.doc_id: r.dsir_log_weight for r in cur.dsir_weights(docs).collect()}
        # 'alpha' dominates the target distribution -> alpha-docs score
        # higher than beta-docs regardless of their own lang label
        assert out[10] > out[11]
        assert out[0] > out[5]


class TestGoldLayout:
    """Partitioned writes + small-file compaction (sources/layout.py):
    the operational answer to the reference's 50-row micro-batch files."""

    def _events_df(self, spark, n=200):
        return spark.range(n).select(
            F.col("id").alias("event_id"),
            F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 3).cast("int"))
            .cast("string")
            .alias("event_date"),
            (F.col("id") * 2).alias("value"),
        )

    def test_write_partitioned_prunes_and_round_trips(self, spark, tmp_path):
        from logistics_data_pipeline_spark.sources import layout

        df = self._events_df(spark)
        out = str(tmp_path / "gold")
        layout.write_partitioned(df, out, ("event_date",), rows_per_file=1000)
        back = spark.read.parquet(out)
        assert back.count() == 200
        # partition pruning reaches the scan
        plan = (
            back.filter(F.col("event_date") == "2024-01-02")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "PartitionFilters: [" in plan and "event_date" in plan.split(
            "PartitionFilters"
        )[1][:120]

    def test_compaction_shrinks_file_count_and_preserves_rows(self, spark, tmp_path):
        from logistics_data_pipeline_spark.sources import layout

        out = str(tmp_path / "gold")
        # simulate the 50-row-file problem: many tiny files per partition
        df = self._events_df(spark).repartition(16)
        df.write.mode("overwrite").partitionBy("event_date").parquet(out)
        before = layout.partition_file_stats(spark, out).collect()
        assert all(r.n_files > 1 and r.needs_compaction for r in before)
        pre = sorted(
            tuple(r) for r in spark.read.parquet(out)
            .select("event_id", "value", "event_date").collect()
        )

        done = layout.compact_partitions(spark, out)
        assert sorted(done) == sorted(r.partition for r in before)
        after = {r.partition: r for r in layout.partition_file_stats(spark, out).collect()}
        for r in before:
            assert after[r.partition].n_files == 1  # tiny test data -> one file
            assert after[r.partition].total_bytes > 0
        post = sorted(
            tuple(r) for r in spark.read.parquet(out)
            .select("event_id", "value", "event_date").collect()
        )
        assert pre == post  # byte-identical contents, fewer files

    def test_compaction_skips_healthy_partitions(self, spark, tmp_path):
        from logistics_data_pipeline_spark.sources import layout

        out = str(tmp_path / "gold")
        self._events_df(spark).coalesce(1).write.mode("overwrite").partitionBy(
            "event_date"
        ).parquet(out)
        stats = layout.partition_file_stats(spark, out).collect()
        assert all(r.n_files == 1 for r in stats)
        assert layout.compact_partitions(spark, out) == []


class TestKnnIvfExact:
    def test_probe_subset_of_bruteforce_with_recall(self, spark, sf_dir):
        from logistics_data_pipeline_spark.llm import similarity as sim
        from logistics_data_pipeline_spark.adapters.testdata import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        ivf = sim.knn_ivf_exact(emb)
        bf = sim.knn_bruteforce(emb)
        got = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
        truth = {(r.query_id, r.neighbor_id) for r in bf.collect()}
        assert len(got) <= len(truth) or got  # k rows per query max
        recall = len(got & truth) / len(truth)
        # near-random synthetic vectors: cell membership carries little
        # neighbor signal, so the honest floor is just above the
        # nprobe/cells ≈ 0.19 random-probe baseline (0.4 measured at
        # sf0.001); real clustered corpora sit far higher
        assert recall >= 0.25
        # every returned neighbor is a corpus vector, never a query
        assert all(n >= sim.IVF_EXACT_N_QUERIES for _, n in got)

    def test_rank_is_dense_per_query(self, spark, sf_dir):
        from logistics_data_pipeline_spark.llm import similarity as sim
        from logistics_data_pipeline_spark.adapters.testdata import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        out = sim.knn_ivf_exact(emb).collect()
        per = {}
        for r in out:
            per.setdefault(r.query_id, []).append(r.rank)
        for ranks in per.values():
            assert sorted(ranks) == list(range(1, len(ranks) + 1))


class TestDupSpanCoverage:
    def test_shared_run_yields_one_maximal_island(self, spark):
        """Two docs share a 20-token run (13 overlapping 8-gram seeds
        each); the island merge must union them into ONE maximal span
        of exactly 20 covered tokens, wherever the run sits."""
        from logistics_data_pipeline_spark.llm import dedup

        shared = [f"a{i}" for i in range(20)]
        docs = spark.createDataFrame(
            [
                (0, " ".join(shared + [f"u{i}" for i in range(10)])),
                (1, " ".join([f"v{i}" for i in range(5)] + shared + [f"w{i}" for i in range(5)])),
                (2, " ".join(f"z{i}" for i in range(30))),
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in dedup.dup_span_coverage(docs).collect()}
        for d in (0, 1):
            assert out[d].n_tokens == 30
            assert out[d].n_dup_seeds == 13  # starts 0..12 of the run
            assert out[d].n_dup_spans == 1  # merged into one island
            assert out[d].covered_tokens == 20
            assert out[d].dup_coverage == pytest.approx(20 / 30, abs=1e-6)
        assert out[2].n_dup_spans == 0 and out[2].dup_coverage == 0.0

    def test_disjoint_runs_stay_separate_islands(self, spark):
        """Two shared runs separated by > n unique tokens must report
        as TWO maximal spans whose covered counts don't bridge the gap."""
        from logistics_data_pipeline_spark.llm import dedup

        r1 = [f"a{i}" for i in range(8)]   # exactly one seed
        r2 = [f"b{i}" for i in range(8)]
        gap = [f"g{i}" for i in range(10)]  # > n, breaks the island
        docs = spark.createDataFrame(
            [
                (0, " ".join(r1 + gap + r2)),
                (1, " ".join(r1 + [f"x{i}" for i in range(10)] + r2)),
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in dedup.dup_span_coverage(docs).collect()}
        assert out[0].n_dup_spans == 2
        assert out[0].covered_tokens == 16  # 8 + 8, gap not bridged
        assert out[1].n_dup_spans == 2 and out[1].covered_tokens == 16


class TestAhashNeardup:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t, "en", "s0", len(t)) for i, t in enumerate(texts)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )

    def test_local_edit_survives_global_change_does_not(self, spark):
        from logistics_data_pipeline_spark.llm import multimodal as mm

        base = "the quick brown fox jumps over the lazy dog " * 8  # > 256 bytes
        local = base[:100] + "X" * 4 + base[104:]  # 4-byte local patch
        different = "zzzz " * 80
        docs = self._docs(spark, [base, local, different])
        out = {(r.a_id, r.b_id): r.hamming for r in
               mm.media_ahash_neardup(docs).collect()}
        assert (0, 1) in out  # local edit: few blocks flip
        assert (0, 2) not in out and (1, 2) not in out

    def test_identical_payloads_hamming_zero(self, spark):
        from logistics_data_pipeline_spark.llm import multimodal as mm

        t = "abcdefgh " * 40
        docs = self._docs(spark, [t, t])
        out = mm.media_ahash_neardup(docs).collect()
        assert len(out) == 1 and out[0].hamming == 0

    def test_short_payloads_excluded(self, spark):
        from logistics_data_pipeline_spark.llm import multimodal as mm

        docs = self._docs(spark, ["tiny", "also tiny"])
        assert mm.media_ahash_neardup(docs).count() == 0

    def test_sixteen_bit_regime_matches_duckdb_exactly(self, spark, sf_dir):
        """Cross-ENGINE check of the governor's 16-bit regime (the
        registered oracle constant only covers 8-bit): Spark with
        band_bits=16 must produce the identical pair set and distances
        as the parameterized DuckDB twin on real corpus data."""
        import duckdb

        from logistics_data_pipeline_spark.llm import multimodal as mm

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        sp = {(r.a_id, r.b_id): r.hamming
              for r in mm.media_ahash_neardup(docs, band_bits=16).collect()}
        dk = {(a, b): h
              for a, b, h in con.sql(mm.media_ahash_neardup_sql(16)).fetchall()}
        assert sp == dk and len(sp) > 0
        # pHash (round 12): BOTH band widths must equal the GROUND-TRUTH
        # exact all-pairs oracle — the complete multiprobe makes the
        # banded output exact in every regime, so the check is recall
        # vs truth, not banding parity.
        truth = {(a, b): h
                 for a, b, h in con.sql(mm.media_phash_neardup_sql()).fetchall()}
        for bb in (8, 16):
            sp = {(r.a_id, r.b_id): r.hamming
                  for r in mm.media_phash_neardup(docs, band_bits=bb).collect()}
            assert sp == truth and len(sp) > 0, f"band_bits={bb}"

    def test_wide_band_governor_preserves_hamming_on_common_pairs(self, spark):
        """16-bit bands (the >8192-media governor regime) must compute
        the SAME packed 64-bit signature — so every pair surfaced by
        both band widths reports an identical Hamming distance, and a
        0-distance exact dup can never be lost (all bands equal)."""
        from logistics_data_pipeline_spark.llm import multimodal as mm

        base = "the quick brown fox jumps over the lazy dog " * 8
        local = base[:100] + "X" * 4 + base[104:]
        docs = self._docs(spark, [base, local, base])  # 0~1 edit, 0==2 dup
        h8 = {(r.a_id, r.b_id): r.hamming
              for r in mm.media_ahash_neardup(docs, band_bits=8).collect()}
        h16 = {(r.a_id, r.b_id): r.hamming
               for r in mm.media_ahash_neardup(docs, band_bits=16).collect()}
        assert h16[(0, 2)] == 0  # exact dup survives any band width
        for pair in set(h8) & set(h16):
            assert h8[pair] == h16[pair], pair
        assert set(h16) <= set(h8)  # wider bands only ever lose recall

        # pHash (round 12): the complete multiprobe makes both widths
        # EXACT, so the two regimes must be fully identical, not merely
        # recall-ordered.
        p8 = {(r.a_id, r.b_id): r.hamming
              for r in mm.media_phash_neardup(docs, band_bits=8).collect()}
        p16 = {(r.a_id, r.b_id): r.hamming
               for r in mm.media_phash_neardup(docs, band_bits=16).collect()}
        assert p16[(0, 2)] == 0
        assert p8 == p16


def test_ahash_32bit_regime_matches_duckdb_and_preserves_hamming(spark, sf_dir):
    """The SCALING_r10 third aHash tier (32-bit bands past 131072
    media, after the 16-bit tier measured 76.6×/decade at sf10):
    cross-engine parity through the parameterized twin, identical
    Hamming on common pairs vs the 8-bit regime, and candidates only
    ever shrink as bands widen."""
    import duckdb

    from logistics_data_pipeline_spark.llm import multimodal as mm

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    sp = {(r.a_id, r.b_id): r.hamming
          for r in mm.media_ahash_neardup(docs, band_bits=32).collect()}
    dk = {(a, b): h
          for a, b, h in con.sql(mm.media_ahash_neardup_sql(32)).fetchall()}
    assert sp == dk
    h8 = {(r.a_id, r.b_id): r.hamming
          for r in mm.media_ahash_neardup(docs, band_bits=8).collect()}
    assert set(sp) <= set(h8)
    for pair in sp:
        assert sp[pair] == h8[pair], pair
