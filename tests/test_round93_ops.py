"""Round-93 tests: Omega ratio, Cochran-Armitage trend test."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_omega_matches_bruteforce(spark):
    rows = registry.queries()["bars_omega_ratio"](spark, SF).collect()
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
    seqs = defaultdict(list)
    for r in closes:
        seqs[r.symbol].append(r.c)
    for r in rows:
        cs = seqs[r.symbol]
        rets = [math.floor((c - p) * 10000.0 / p + 0.5) for p, c in zip(cs, cs[1:])]
        gain = sum(x for x in rets if x > 0)
        loss = sum(-x for x in rets if x < 0)
        assert (r.n_returns, r.gain_qbp, r.loss_qbp) == (len(rets), gain, loss)
        assert r.omega_milli == gain * 1000 // loss
        # identity: gain - loss == sum of returns
        assert gain - loss == sum(rets)


def test_cochran_armitage_matches_bruteforce(spark):
    (row,) = registry.queries()["stats_cochran_armitage_trend"](spark, SF).collect()
    o = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    graded = (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .select(
            F.substring("o_orderpriority", 1, 1).cast("long").alias("lvl"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ev"),
        )
        .collect()
    )
    per = defaultdict(lambda: [0, 0])
    for r in graded:
        per[r.lvl][0] += 1
        per[r.lvl][1] += r.ev
    nn = sum(n for n, _ in per.values())
    ee = sum(e for _, e in per.values())
    swn = sum(l * n for l, (n, _) in per.items())
    swe = sum(l * e for l, (_, e) in per.items())
    swwn = sum(l * l * n for l, (n, _) in per.items())
    t_num = nn * swe - ee * swn
    var = ee * (nn - ee) / nn * (nn * swwn - swn * swn) / nn
    assert (row.n_rows, row.n_events, row.t_num_scaled) == (nn, ee, t_num)
    assert row.z_milli == math.floor(t_num / math.sqrt(var) * 1000 + 0.5)
    # parity-assignment outcome: |z| should not be astronomically large
    assert abs(row.z_milli) < 100_000
