"""Round-18 tests: market-microstructure operators (tick-rule signing,
volume bars, Roll spread, Amihud illiquidity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_tick_rule_counts_partition_trades(spark):
    df = registry.queries()["bars_tick_rule_signing"](spark, SF)
    rows = df.collect()
    assert rows, "expected per-symbol-day rows"
    # every trade is exactly one of buy/sell/unsigned
    totals = df.agg(
        F.sum(F.col("n_buys") + F.col("n_sells") + F.col("n_unsigned")).alias("n")
    ).collect()[0]
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert totals.n == n_events
    # unsigned trades are rare after the first tick: at most one leading
    # run per symbol can stay unsigned, so unsigned << total
    unsigned = df.agg(F.sum("n_unsigned").alias("u")).collect()[0].u
    assert unsigned < n_events * 0.05


def test_volume_bars_value_conserved_and_bounded(spark):
    from us_stock_data_pipeline_spark.queries.analytics_ops29 import _VBAR_THRESH

    df = registry.queries()["bars_volume_bars"](spark, SF)
    rows = df.collect()
    assert rows
    ev = spark.read.parquet(f"{SF}/events.parquet")
    total_cents = ev.select(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("s")
    ).collect()[0].s
    assert sum(r.bar_value_cents for r in rows) == total_cents
    for r in rows:
        assert r.low_cents <= r.open_cents <= r.high_cents
        assert r.low_cents <= r.close_cents <= r.high_cents
    # bar ids are dense per symbol (every threshold crossing opens one)
    by_sym = {}
    for r in rows:
        by_sym.setdefault(r.symbol, []).append(r.bar_id)
    for ids in by_sym.values():
        assert sorted(ids) == list(range(len(ids)))
    # every bar except the last per symbol must have crossed the threshold:
    # its cumulative value through its close reaches (bar_id+1) * thresh
    for sym, ids in by_sym.items():
        sym_rows = sorted((r for r in rows if r.symbol == sym), key=lambda r: r.bar_id)
        cum = 0
        for r in sym_rows[:-1]:
            cum += r.bar_value_cents
            assert cum >= (r.bar_id + 1) * _VBAR_THRESH


def test_roll_spread_matches_python(spark):
    df = registry.queries()["bars_roll_spread"](spark, SF)
    rows = {r.symbol: r for r in df.collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    import collections
    import math

    daily = collections.defaultdict(dict)
    best = collections.defaultdict(dict)
    for e in ev:
        k = (e.event_type, e.ts.date())
        if k not in best or e.event_id > best[k][0]:
            best[k] = (e.event_id, round(e.value * 100))
    for (sym, day), (_, close) in best.items():
        daily[sym][day] = close
    for sym, series in daily.items():
        closes = [series[d] for d in sorted(series)]
        dp = [b - a for a, b in zip(closes, closes[1:])]
        pairs = list(zip(dp, dp[1:]))
        n = len(pairs)
        sx = sum(p for p, _ in pairs)
        sy = sum(q for _, q in pairs)
        sxy = sum(p * q for p, q in pairs)
        num = n * sxy - sx * sy
        r = rows[sym]
        assert r.n_pairs == n
        if num < 0:
            want = math.floor(2 * math.sqrt(-(num / (n * n))) * 1000 + 0.5)
            assert r.roll_spread_millicents == want
        else:
            assert r.roll_spread_millicents is None


def test_amihud_positive_and_per_symbol(spark):
    df = registry.queries()["bars_amihud_illiquidity"](spark, SF)
    rows = df.collect()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    n_syms = ev.select("event_type").distinct().count()
    assert len(rows) == n_syms
    for r in rows:
        assert r.n_days >= 1
        assert r.amihud_e15 >= 0
