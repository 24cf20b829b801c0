"""Round-94 tests: Wilcoxon signed-rank, TRIN Arms index."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _bars_cv(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    rows = (
        ev.groupBy(
            F.col("event_type").alias("symbol"),
            F.date_trunc("day", "ts").cast("date").alias("day"),
        )
        .agg(
            F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"),
            F.count(F.lit(1)).cast("long").alias("v"),
        )
        .orderBy("symbol", "day")
        .collect()
    )
    out = defaultdict(list)
    for r in rows:
        out[r.symbol].append((r.day, r.c, r.v))
    return out


def test_wilcoxon_matches_bruteforce(spark):
    rows = registry.queries()["stats_wilcoxon_signed_rank"](spark, SF).collect()
    assert rows
    bars = _bars_cv(spark)
    rets = {}
    for sym, seq in bars.items():
        for (d0, p, _), (d1, c, _) in zip(seq, seq[1:]):
            rets[(sym, d1)] = math.floor((c - p) * 10000.0 / p + 0.5)
    by_day = defaultdict(list)
    for (sym, d), r in rets.items():
        by_day[d].append(r)
    for row in rows:
        ds = []
        for (sym, d), r in rets.items():
            if sym != row.symbol:
                continue
            k, mr = len(by_day[d]), sum(by_day[d])
            dd = r * k - mr
            if dd != 0:
                ds.append(dd)
        n = len(ds)
        order = sorted(range(n), key=lambda i: (abs(ds[i]), ds[i]))
        rn = {order[i]: i + 1 for i in range(n)}
        groups = defaultdict(list)
        for i in range(n):
            groups[abs(ds[i])].append(rn[i])
        wplus2 = 0
        tie_cubic = 0
        for i in range(n):
            g = groups[abs(ds[i])]
            rank2 = min(g) + max(g)
            if ds[i] > 0:
                wplus2 += rank2
            tie_cubic += len(g) ** 2 - 1
        assert (row.n_pairs, row.wplus2) == (n, wplus2)
        z = (wplus2 - n * (n + 1) / 2) / (
            2 * math.sqrt(n * (n + 1) * (2 * n + 1) / 24 - tie_cubic / 48)
        )
        assert row.z_milli == math.floor(z * 1000 + 0.5)


def test_trin_matches_bruteforce(spark):
    rows = registry.queries()["bars_trin_arms_index"](spark, SF).collect()
    assert rows
    bars = _bars_cv(spark)
    daily = defaultdict(lambda: [0, 0, 0, 0])
    for sym, seq in bars.items():
        for (d0, p, _), (d1, c, v) in zip(seq, seq[1:]):
            e = daily[d1]
            if c > p:
                e[0] += 1
                e[2] += v
            elif c < p:
                e[1] += 1
                e[3] += v
    assert len(rows) == len(daily)
    for r in rows:
        adv, decl, av, dv = daily[r.day]
        assert (r.adv, r.decl, r.adv_vol, r.decl_vol) == (adv, decl, av, dv)
        if decl == 0 or av == 0:
            assert r.trin_milli == -1
        else:
            assert r.trin_milli == adv * dv * 1000 // (decl * av)
