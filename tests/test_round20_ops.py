"""Round-20 tests: FIFO PnL, CAPM beta, Sharpe/Sortino, Donchian."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _python_fifo(trades):
    """Reference FIFO matcher: k-th sold unit matches the k-th bought
    unit (the two legs are independent arrival-ordered streams — the
    same convention the query and oracle implement; a long-only
    inventory gate would additionally drop sells preceding buys)."""
    from collections import defaultdict

    buys = defaultdict(list)
    sells = defaultdict(list)
    for inst, qty, px, is_sell in trades:
        (sells if is_sell else buys)[inst].extend([px] * qty)
    matched = defaultdict(int)
    pnl = defaultdict(int)
    for inst in set(buys) | set(sells):
        b, s = buys[inst], sells[inst]
        k = min(len(b), len(s))
        matched[inst] = k
        pnl[inst] = sum(s[i] - b[i] for i in range(k))
    return matched, pnl


def test_fifo_matches_sequential_queue(spark):
    rows = {r.inst: r for r in registry.queries()["bars_fifo_pnl"](spark, SF).collect()}
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select(
            F.col("l_partkey").alias("inst"),
            (F.col("l_orderkey") * 100 + F.col("l_linenumber")).alias("seq"),
            F.round("l_quantity").cast("long").alias("qty"),
            F.expr(
                "CAST(round(l_extendedprice * 100) AS BIGINT)"
                " div CAST(round(l_quantity) AS BIGINT)"
            ).alias("px"),
            (F.col("l_returnflag") == "R").alias("is_sell"),
        )
        .collect()
    )
    per_leg = sorted(li, key=lambda r: (r.inst, r.seq, r.px, r.qty))
    matched, pnl = _python_fifo([(r.inst, r.qty, r.px, r.is_sell) for r in per_leg])
    for inst, r in rows.items():
        assert r.matched_qty == matched[inst], inst
        assert r.realized_pnl_cents == pnl[inst], inst
    # instruments with sells but zero buys (or vice versa) simply absent
    assert set(rows) == {i for i in matched if matched[i] > 0}


def test_capm_market_beta_averages_to_one_ish(spark):
    rows = registry.queries()["bars_capm_beta"](spark, SF).collect()
    assert rows
    # equal-weight market: betas bracket 1 (value-weighted identity is
    # exact; equal-weight integer-mean market keeps them near 1)
    betas = [r.beta_e6 / 1e6 for r in rows]
    assert min(betas) < 1.5 and max(betas) > 0.5
    assert sum(betas) / len(betas) == pytest_approx(1.0, 0.5)


def pytest_approx(v, tol):
    class _A:
        def __eq__(self, other):
            return abs(other - v) <= tol

    return _A()


def test_sharpe_sortino_signs_agree(spark):
    rows = registry.queries()["bars_sharpe_sortino"](spark, SF).collect()
    assert rows
    for r in rows:
        if r.sortino_e6 is not None:
            # same numerator => same sign; sortino magnitude >= sharpe
            # when downside deviation <= total deviation (usual case)
            assert (r.sharpe_e6 >= 0) == (r.sortino_e6 >= 0)


def test_donchian_breakout_flags_consistent(spark):
    df = registry.queries()["bars_donchian_breakout"](spark, SF)
    rows = df.collect()
    assert rows
    for r in rows:
        assert r.lower_cents <= r.upper_cents
        if r.breakout == 1:
            assert r.close_cents > r.upper_cents
        elif r.breakout == -1:
            assert r.close_cents < r.lower_cents
        else:
            assert r.lower_cents <= r.close_cents <= r.upper_cents
