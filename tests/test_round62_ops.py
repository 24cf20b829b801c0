"""Round-62 tests: Dickey-Fuller, Theil's U2."""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_dickey_fuller_matches_numpy_ols(spark):
    rows = registry.queries()["stats_dickey_fuller"](spark, SF).collect()
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
    by_sym: dict[str, list[int]] = {}
    for r in closes:
        by_sym.setdefault(r.symbol, []).append(r.c)
    for row in rows:
        cs = by_sym[row.symbol]
        x = np.array(cs[:-1], dtype=np.float64)
        d = np.diff(np.array(cs, dtype=np.float64))
        X = np.column_stack([x, np.ones_like(x)])
        beta, res, *_ = np.linalg.lstsq(X, d, rcond=None)
        n = len(x)
        resid = d - X @ beta
        sse = float(resid @ resid)
        se = math.sqrt(sse / (n - 2) / float(((x - x.mean()) ** 2).sum()))
        t = beta[0] / se
        assert row.n_obs == n
        assert abs(row.beta_e9 / 1e9 - beta[0]) < 1e-6
        assert abs(row.df_t_e4 / 1e4 - t) < 1e-3


def test_theil_u2_consistency(spark):
    (row,) = registry.queries()["forecast_theil_u2"](spark, SF).collect()
    # U2 must equal the ratio of its own reported RMSEs (to rounding)
    approx = row.rmse_seasonal_cents / row.rmse_naive_cents
    assert abs(row.theil_u2_e6 / 1e6 - approx) < 0.01
    assert row.n_days > 0
