"""Round-9 operator contracts: CUSUM's prefix-sum identity against the
literal recursion, l-diversity's entropy bounds, EOQ's cost-balance
property, theta's OLS trend against numpy, and k-means++ seeding
invariants."""

from __future__ import annotations

import numpy as np
import pytest

from logistics_data_pipeline_spark.adapters.testdata import load_table
from logistics_data_pipeline_spark.llm import similarity as llm_sim
from logistics_data_pipeline_spark.operators import analytics
from logistics_data_pipeline_spark.operators import tpch_extra as tx


def test_cusum_matches_literal_recursion(spark, sf_dir):
    """The windowed identity S_t = P_t - min(0, min_j P_j) must equal
    the textbook clamped recursion replayed row-by-row in Python."""
    events = load_table(spark, sf_dir, "events")
    got = {r.event_type: r for r in analytics.cusum_control(events).collect()}
    rows = (
        events.select("event_type", "ts", "event_id", "value")
        .orderBy("event_type", "ts", "event_id")
        .collect()
    )
    from collections import defaultdict
    from decimal import Decimal

    series = defaultdict(list)
    for r in rows:
        series[r.event_type].append(int(Decimal(str(r.value)).quantize(Decimal("0.01")) * 100))
    for t, xs in series.items():
        mu0 = sum(xs) // len(xs)  # floor mean in cents
        s_up = s_dn = 0
        peak_up = peak_dn = 0
        alarms_up = alarms_dn = 0
        for x in xs:
            s_up = max(0, s_up + x - mu0 - analytics.CUSUM_ALLOW_CENTS)
            s_dn = max(0, s_dn + mu0 - analytics.CUSUM_ALLOW_CENTS - x)
            peak_up = max(peak_up, s_up)
            peak_dn = max(peak_dn, s_dn)
            alarms_up += s_up > analytics.CUSUM_H_CENTS
            alarms_dn += s_dn > analytics.CUSUM_H_CENTS
        g = got[t]
        assert g.mu0_cents == mu0, t
        assert g.peak_up_cents == peak_up, t
        assert g.peak_dn_cents == peak_dn, t
        assert g.alarm_rows_up == alarms_up, t
        assert g.alarm_rows_dn == alarms_dn, t


def test_l_diversity_entropy_bounds(spark, sf_dir):
    """exp(H) is at most the distinct sensitive count (uniform case,
    equality) and at least 1; flags must restate the comparisons."""
    events = load_table(spark, sf_dir, "events")
    rows = analytics.l_diversity(events).collect()
    assert rows
    for r in rows:
        assert 1.0 - 1e-6 <= r.entropy_l <= r.distinct_sensitive + 1e-6
        assert r.violates_distinct_l == (r.distinct_sensitive < analytics.L_DIVERSITY)
        assert r.violates_entropy_l == (r.entropy_l < analytics.L_DIVERSITY)
    # entropy reaches its bound exactly on a perfectly uniform group
    uni = [r for r in rows if r.n_rows == r.distinct_sensitive]
    for r in uni:
        assert abs(r.entropy_l - r.distinct_sensitive) <= 1e-6


def test_eoq_cost_balance(spark, sf_dir):
    """At the EOQ the annual ordering cost D/Q*S equals the annual
    holding cost Q/2*h*c — the defining first-order condition."""
    li = load_table(spark, sf_dir, "lineitem")
    rows = tx.eoq_policy(li).collect()
    assert 0 < len(rows) <= tx.EOQ_TOP
    for r in rows[:20]:
        order_cost = r.annual_demand / r.eoq_units * tx.EOQ_ORDER_COST
        hold_cost = r.eoq_units / 2.0 * tx.EOQ_HOLD_RATE * r.unit_cost
        assert order_cost == pytest.approx(hold_cost, rel=1e-4), r.l_partkey
        assert r.orders_per_year == pytest.approx(
            r.annual_demand / r.eoq_units, rel=1e-4
        )
        assert r.reorder_point == pytest.approx(
            r.annual_demand / 365.0 * tx.EOQ_LEAD_DAYS, rel=1e-4
        )


def test_theta_trend_matches_numpy_ols(spark, sf_dir):
    """The exact integer-weighted OLS slope/intercept must agree with
    numpy's polyfit over the same monthly window, and the forecast must
    be the average of the two theta lines."""
    orders = load_table(spark, sf_dir, "orders")
    out = analytics.theta_forecast(orders).collect()
    assert len(out) == analytics.THETA_H
    monthly = (
        orders.groupBy(
            analytics.F.trunc(analytics.F.to_date("o_orderdate"), "month").alias("m")
        )
        .agg(analytics.F.round(analytics.F.sum("o_totalprice"), 2).alias("y"))
        .orderBy(analytics.F.col("m").desc())
        .limit(analytics.THETA_K)
        .orderBy("m")
        .collect()
    )
    y = np.array([float(r.y) for r in monthly])
    t = np.arange(1, len(y) + 1, dtype=float)
    b, a = np.polyfit(t, y, 1)
    assert out[0].slope == pytest.approx(b, rel=1e-6)
    assert out[0].intercept == pytest.approx(a, rel=1e-6)
    for r in out:
        theta0 = a + b * (analytics.THETA_K + r.h)
        assert r.forecast == pytest.approx(
            (theta0 + r.ses_theta2) / 2.0, rel=1e-6, abs=1e-4
        )


def test_kmeanspp_seeding_invariants(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    seeds = llm_sim.kmeanspp_init(emb).collect()
    assert [r.seed_rank for r in seeds] == list(range(1, llm_sim.KPP_K + 1))
    assert len({r.vec_id for r in seeds}) == llm_sim.KPP_K  # distinct
    assert seeds[0].phi_before is None
    phis = [r.phi_before for r in seeds[1:]]
    assert all(p is not None and p > 0 for p in phis)
    # the potential the sampler sees can only shrink as seeds accumulate
    for p_prev, p_next in zip(phis, phis[1:]):
        assert p_next <= p_prev + 1e-6
    # deterministic: a second run reproduces the seed set exactly
    again = llm_sim.kmeanspp_init(emb).collect()
    assert [(r.seed_rank, r.vec_id) for r in again] == [
        (r.seed_rank, r.vec_id) for r in seeds
    ]


def test_kmeansbb_oversampling_invariants(spark, sf_dir):
    """k-means|| candidate set: one round-0 seed, every point's vote
    lands on exactly one candidate (weights sum to n), candidates are
    distinct, and the expected per-round draw is l-ish (>0, corpus-
    bounded)."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    cands = llm_sim.kmeansbb_candidates(emb).collect()
    assert sum(1 for r in cands if r.round_added == 0) == 1
    assert len({r.cand_id for r in cands}) == len(cands)
    assert sum(r.weight for r in cands) == n
    rounds = {r.round_added for r in cands}
    assert rounds <= set(range(llm_sim.KBB_R + 1))
    per_round = {
        rr: sum(1 for r in cands if r.round_added == rr) for rr in sorted(rounds)
    }
    assert all(v > 0 for v in per_round.values())
    assert len(cands) <= 1 + llm_sim.KBB_R * 4 * llm_sim.KBB_L  # Chernoff-loose


def test_kmeansbb_plus_pp_finish_composes(spark, sf_dir):
    """The scale recipe end-to-end: || oversamples candidates in
    rounds, then the ++ finish runs on the candidate SUBSET — the
    composition must yield KPP_K distinct seeds drawn only from the
    candidate set."""
    emb = load_table(spark, sf_dir, "embeddings")
    cand_ids = {
        r.cand_id for r in llm_sim.kmeansbb_candidates(emb).collect()
    }
    sub = emb.filter(emb.vec_id.isin(list(cand_ids)))
    seeds = llm_sim.kmeanspp_init(sub).collect()
    assert len(seeds) == llm_sim.KPP_K
    assert {r.vec_id for r in seeds} <= cand_ids


def test_holt_winters_matches_literal_recursion(spark, sf_dir):
    """The unrolled weight table must reproduce the textbook additive
    HW recursion replayed in exact Fractions on the same monthly
    window, and the forecast must recombine level/trend/seasonal."""
    from fractions import Fraction as Fr

    orders = load_table(spark, sf_dir, "orders")
    out = analytics.holt_winters_forecast(orders).collect()
    assert len(out) == analytics.HW_H
    monthly = (
        orders.groupBy(
            analytics.F.trunc(analytics.F.to_date("o_orderdate"), "month").alias("m")
        )
        .agg(
            analytics.F.sum(
                (analytics.F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
                    "decimal(19,0)"
                )
            ).alias("cents")
        )
        .orderBy(analytics.F.col("m").desc())
        .limit(analytics.HW_K)
        .orderBy("m")
        .collect()
    )
    y = [Fr(int(r.cents)) for r in monthly]
    m, k = analytics.HW_M, analytics.HW_K
    assert len(y) == k
    l = sum(y[:m]) / m
    b = (sum(y[m : 2 * m]) / m - sum(y[:m]) / m) / m
    s = {i: y[i - 1] - sum(y[:m]) / m for i in range(1, m + 1)}
    for t in range(m + 1, k + 1):
        l_new = Fr(1, 2) * (y[t - 1] - s[t - m]) + Fr(1, 2) * (l + b)
        b_new = Fr(1, 2) * (l_new - l) + Fr(1, 2) * b
        s[t] = Fr(1, 2) * (y[t - 1] - l_new) + Fr(1, 2) * s[t - m]
        l, b = l_new, b_new
    assert out[0].level == pytest.approx(float(l) / 100.0, abs=2e-6)
    assert out[0].trend == pytest.approx(float(b) / 100.0, abs=2e-6)
    for r in out:
        s_h = float(s[k - m + ((r.h - 1) % m) + 1]) / 100.0
        assert r.seasonal == pytest.approx(s_h, abs=2e-6), r.h
        assert r.forecast == pytest.approx(
            r.level + r.trend * r.h + r.seasonal, abs=2e-5
        )


def test_dup_span_removal_micro_and_coverage_bound(spark, sf_dir):
    """Micro-case: two identical docs → the min-doc_id keeper is
    untouched, the copy is fully removed; a doc with no duplicated
    span is untouched. Corpus property: per doc, removal can only
    delete tokens that dup_span_coverage counts as covered (the
    keeper's copy survives, so removed <= covered)."""
    import hashlib

    from logistics_data_pipeline_spark.llm import dedup as dd

    words = " ".join(f"w{i}" for i in range(dd.PASSAGE_N + 4))
    micro = spark.createDataFrame(
        [(1, words), (2, words), (3, "only one doc has this text here now")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dd.dup_span_removal(micro).collect()}
    assert out[1].n_removed == 0  # keeper survives intact
    assert out[1].clean_md5 == hashlib.md5(words.encode()).hexdigest()
    assert out[2].n_removed == out[2].n_tokens  # the copy vanishes
    assert out[2].clean_md5 == hashlib.md5(b"").hexdigest()
    assert out[3].n_removed == 0

    docs = load_table(spark, sf_dir, "documents")
    cov = {r.doc_id: r.covered_tokens for r in dd.dup_span_coverage(docs).collect()}
    rem = dd.dup_span_removal(docs).collect()
    assert sum(r.n_removed for r in rem) > 0  # testdata carries real dups
    for r in rem:
        assert r.n_removed <= cov[r.doc_id], r.doc_id


def test_gopher_ablation_reconciles_with_the_panel(spark, sf_dir):
    """The ablation cells must partition the corpus (counts sum to
    |docs|, shares to 1) and restate the panel: the keep-pattern cell
    count equals the panel's keep count, and each sole_fail name
    matches the one failing flag of its pattern."""
    from logistics_data_pipeline_spark.llm import curation as cur

    docs = load_table(spark, sf_dir, "documents")
    cells = cur.gopher_ablation(docs).collect()
    n_docs = docs.count()
    assert sum(c.n_docs for c in cells) == n_docs
    assert abs(sum(c.share for c in cells) - 1.0) < 1e-4
    panel = cur.gopher_rules(docs)
    keep_cells = [c for c in cells if c.n_failing_rules == 0]
    assert sum(c.n_docs for c in keep_cells) == panel.filter("keep").count()
    names = dict(zip(cur._GOPHER_FLAGS, cur._GOPHER_RULE_NAMES))
    for c in cells:
        fails = [f for f in cur._GOPHER_FLAGS if not getattr(c, f)]
        assert c.n_failing_rules == len(fails)
        if len(fails) == 1:
            assert c.sole_fail == names[fails[0]]
        else:
            assert c.sole_fail is None
