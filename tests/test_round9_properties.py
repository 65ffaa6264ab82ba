"""Hypothesis properties for the round-9 exact primitives — all
driver-side pure functions, so the math the SQL twins encode is checked
for ARBITRARY inputs, not just the committed testdata."""

from __future__ import annotations

import math
from datetime import datetime, timedelta
from fractions import Fraction as Fr

from hypothesis import given, settings
from hypothesis import strategies as st

from logistics_data_pipeline_spark import orchestration as orch
from logistics_data_pipeline_spark.llm import similarity as llm_sim
from logistics_data_pipeline_spark.operators import analytics


@given(st.floats(allow_nan=False, allow_infinity=False, width=64), st.integers(0, 12))
def test_round_half_up_matches_bigdecimal_semantics(x, nd):
    """Shortest-repr HALF_UP quantization, unsigned zero, idempotent."""
    from decimal import ROUND_HALF_UP, Decimal, localcontext

    out = llm_sim._round_half_up(x, nd)
    with localcontext() as ctx:
        ctx.prec = 330
        ref = float(
            Decimal(repr(x)).quantize(Decimal(1).scaleb(-nd), ROUND_HALF_UP)
        )
    assert out == ref or (out == 0.0 and ref == 0.0)
    assert not (out == 0.0 and math.copysign(1.0, out) < 0)
    assert llm_sim._round_half_up(out, nd) == out


@given(st.integers(2, 64), st.integers(0, 10**6))
def test_kpp_uniform_is_a_deterministic_unit_interval_draw(j, salt):
    u = llm_sim._kpp_uniform(j, salt)
    assert 0.0 <= u < 1.0
    assert u == llm_sim._kpp_uniform(j, salt)


@given(st.integers(0, 10), st.integers(0, 4))
def test_retry_loop_attempt_and_sleep_accounting(fail_times, retries):
    """attempts = min(fail_times, retries) + 1; a 5-min sleep after
    every failed attempt EXCEPT the terminal one."""
    sleeps = []
    state = {"n": 0}

    def fn():
        state["n"] += 1
        if state["n"] <= fail_times:
            raise RuntimeError("x")

    tr = orch.run_task_with_retries(
        "t", fn, retries=retries, retry_delay_s=300.0, sleep=sleeps.append
    )
    if fail_times <= retries:
        assert tr.state == "success"
        assert tr.attempts == fail_times + 1
        assert sleeps == [300.0] * fail_times
    else:
        assert tr.state == "failed"
        assert tr.attempts == retries + 1
        assert sleeps == [300.0] * retries


@given(
    st.datetimes(
        min_value=datetime(2020, 1, 1), max_value=datetime(2030, 12, 30)
    ),
    st.integers(0, 72),
)
def test_next_hourly_fire_is_the_next_boundary(now, hours_down):
    """Strictly future, on the hour, never more than an hour away, and
    a scheduler down for `hours_down` hours still fires ONCE (no
    backfill) at the next boundary."""
    nxt = orch.next_hourly_fire(now)
    assert nxt > now
    assert nxt.minute == nxt.second == nxt.microsecond == 0
    assert nxt - now <= timedelta(hours=1)
    last = now.replace(minute=0, second=0, microsecond=0) - timedelta(
        hours=hours_down
    )
    assert orch.next_hourly_fire(now, last) == nxt


@given(st.lists(st.integers(-10**6, 10**6), min_size=1, max_size=300))
def test_cusum_prefix_identity_equals_clamped_recursion(ds):
    """S_t = P_t - min(0, min_j P_j) == max(0, S_{t-1} + d_t) for any
    integer drift series — the identity events_cusum_control's two
    windows encode."""
    s = 0
    p = 0
    run_min = 0
    for d in ds:
        s = max(0, s + d)
        p += d
        run_min = min(run_min, p)
        assert s == p - min(run_min, 0)


@given(
    st.lists(
        st.integers(0, 10**12), min_size=analytics.HW_K, max_size=analytics.HW_K
    )
)
@settings(max_examples=25, deadline=None)
def test_hw_weight_table_equals_literal_recursion(ys):
    """The unrolled 14-row weight table reproduces the textbook
    additive Holt-Winters recursion EXACTLY (Fraction arithmetic) for
    arbitrary series, not just the committed monthly revenue."""
    m, k = analytics.HW_M, analytics.HW_K
    y = [Fr(v) for v in ys]
    l = sum(y[:m]) / m
    b = (sum(y[m : 2 * m]) / m - sum(y[:m]) / m) / m
    s = {i: y[i - 1] - sum(y[:m]) / m for i in range(1, m + 1)}
    for t in range(m + 1, k + 1):
        l_new = Fr(1, 2) * (y[t - 1] - s[t - m]) + Fr(1, 2) * (l + b)
        b_new = Fr(1, 2) * (l_new - l) + Fr(1, 2) * b
        s[t] = Fr(1, 2) * (y[t - 1] - l_new) + Fr(1, 2) * s[t - m]
        l, b = l_new, b_new
    den = analytics._HW_DEN
    wl = sum(Fr(int(w[1])) * y[w[0] - 1] for w in analytics._HW_W) / den
    wb = sum(Fr(int(w[2])) * y[w[0] - 1] for w in analytics._HW_W) / den
    assert wl == l and wb == b
    for i in range(1, m + 1):
        wsi = sum(Fr(int(w[3][i - 1])) * y[w[0] - 1] for w in analytics._HW_W) / den
        assert wsi == s[k - m + i]


@given(
    st.lists(
        st.integers(0, 10**12),
        min_size=analytics.THETA_K,
        max_size=analytics.THETA_K,
    )
)
@settings(max_examples=25, deadline=None)
def test_theta_ses_weights_equal_literal_recursion(ys):
    """The dyadic SES weight row (w_1 = 2, w_t = 2^{t-1}, over 2^K)
    reproduces l_t = (z_t + l_{t-1})/2 with l_1 = z_1 exactly."""
    z = [Fr(v) for v in ys]
    l = z[0]
    for t in range(1, analytics.THETA_K):
        l = (z[t] + l) / 2
    w = dict(analytics._THETA_SES_W)
    got = sum(Fr(w[t]) * z[t - 1] for t in w) / analytics._THETA_SES_DEN
    assert got == l
