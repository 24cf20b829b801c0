"""Round-56 tests: ridge normal equations, intraday seasonality,
losing streaks."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_ridge_matches_numpy_solve(spark):
    (row,) = registry.queries()["ml_ridge_normal_equations"](spark, SF).collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        F.col("l_quantity").cast("long").alias("q"),
        F.round(F.col("l_discount") * 100).cast("long").alias("d"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    ).collect()
    X = np.array([[r.q, r.d, 1] for r in li], dtype=np.float64)
    y = np.array([r.y for r in li], dtype=np.float64)
    A = X.T @ X + 1000 * np.eye(3)
    beta = np.linalg.solve(A, X.T @ y)
    assert row.n_obs == len(li)
    # same system, different solver: agree to ~1e-6 relative
    assert abs(row.beta_qty_e4 / 1e4 - beta[0]) < max(1e-4, abs(beta[0]) * 1e-6)
    assert abs(row.beta_disc_e4 / 1e4 - beta[1]) < max(1e-4, abs(beta[1]) * 1e-6)
    assert abs(row.intercept_e4 / 1e4 - beta[2]) < max(1e-4, abs(beta[2]) * 1e-6)
    # quantity should carry a strongly positive price loading
    assert row.beta_qty_e4 > 0


def test_intraday_seasonality_shares_sum_to_one(spark):
    rows = registry.queries()["bars_intraday_seasonality"](spark, SF).collect()
    assert rows
    by_sym: dict[str, list] = {}
    for r in rows:
        assert 0 <= r.hr <= 23
        assert r.mean_abs_move_cents >= 0
        by_sym.setdefault(r.symbol, []).append(r)
    for sym, rs in by_sym.items():
        share = sum(r.tick_share_e6 for r in rs)
        # floor division loses at most 1 ppm per bucket
        assert 1_000_000 - len(rs) <= share <= 1_000_000


def test_losing_streaks_manual_recompute(spark):
    rows = registry.queries()["bars_losing_streaks"](spark, SF).collect()
    assert rows
    ev = spark.read.parquet(f"{SF}/events.parquet")
    closes = (
        ev.groupBy(
            F.col("event_type").alias("symbol"),
            F.date_trunc("day", "ts").cast("date").alias("day"),
        )
        .agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"))
        .orderBy("symbol", "day")
        .collect()
    )
    import math

    by_sym: dict[str, list[int]] = {}
    for r in closes:
        by_sym.setdefault(r.symbol, []).append(r.c)
    for row in rows:
        cs = by_sym[row.symbol]
        rets = [math.floor((b - a) * 10000.0 / a + 0.5) for a, b in zip(cs, cs[1:])]
        best = cur = n_loss = 0
        worst = 0
        cur_sum = 0
        for r in rets:
            if r < 0:
                cur += 1
                cur_sum += r
                n_loss += 1
                best = max(best, cur)
                worst = min(worst, cur_sum)
            else:
                cur = 0
                cur_sum = 0
        assert row.longest_loss_streak == best
        assert row.n_loss_days == n_loss
        assert row.worst_streak_loss_bp == worst
