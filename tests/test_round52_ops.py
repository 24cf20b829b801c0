"""Round-52 tests: range volatility, VaR/ES, Cramér's V."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_range_volatility_bounds_and_gk_efficiency(spark):
    rows = registry.queries()["bars_range_volatility"](spark, SF).collect()
    assert rows
    for r in rows:
        # positive finite daily vols (the synthetic tape's uniform intraday
        # spread makes them large in absolute terms — bound sanity, not level)
        assert 0 < r.parkinson_e6 < 10_000_000
        assert 0 < r.garman_klass_e6 < 10_000_000
        assert r.n_days > 0


def test_var_es_tail_invariants(spark):
    rows = registry.queries()["bars_var_expected_shortfall"](spark, SF).collect()
    assert rows
    for r in rows:
        # ES averages the k worst returns, so ES <= VaR (k-th worst)
        assert r.es_bp <= r.var_bp
        assert 1 <= r.k_tail <= r.n_rets
        assert r.k_tail == max(1, math.ceil(r.n_rets * 0.05))


def test_var_matches_manual_order_statistic(spark):
    rows = registry.queries()["bars_var_expected_shortfall"](spark, SF).collect()
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
        rets = sorted(
            math.floor((b - a) * 10000.0 / a + 0.5) for a, b in zip(cs, cs[1:])
        )
        k = max(1, math.ceil(len(rets) * 0.05))
        assert row.var_bp == rets[k - 1]
        assert row.es_bp == math.floor(sum(rets[:k]) / k + 0.5)


def test_cramers_v_in_unit_interval(spark):
    (row,) = registry.queries()["stats_cramers_v"](spark, SF).collect()
    assert 0 <= row.cramers_v_e6 <= 1_000_000
    assert row.dof == (row.n_rows - 1) * (row.n_cols - 1)
    assert row.n_cols <= 7
    assert row.chi2_e4 >= 0
