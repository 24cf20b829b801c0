"""Round-106 tests: Jain fairness, up/down capture."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _trunc_div(a, b):
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_jain_matches_bruteforce(spark):
    rows = registry.queries()["supplier_jain_fairness"](spark, SF).collect()
    assert rows
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    s = spark.read.parquet(f"{SF}/supplier.parquet")
    n = spark.read.parquet(f"{SF}/nation.parquet")
    alloc = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy("n_name", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    per = defaultdict(list)
    for r in alloc:
        per[r.n_name].append(r.c)
    for r in rows:
        xs = per[r.nation]
        nsup = len(xs)
        assert (r.n_suppliers, r.total_lines) == (nsup, sum(xs))
        j = sum(xs) ** 2 / nsup / sum(x * x for x in xs)
        assert r.jain_micro == math.floor(j * 1e6 + 0.5)
        # J bounded by (1/n, 1]
        assert 1_000_000 // nsup <= r.jain_micro <= 1_000_000


def test_capture_matches_bruteforce(spark):
    rows = registry.queries()["bars_updown_capture"](spark, SF).collect()
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
        seqs[r.symbol].append((r.day, r.c))
    rets = {}
    for sym, seq in seqs.items():
        for (d0, p), (d1, c) in zip(seq, seq[1:]):
            rets[(sym, d1)] = math.floor((c - p) * 10000.0 / p + 0.5)
    by_day = defaultdict(dict)
    for (sym, d), r in rets.items():
        by_day[d][sym] = r
    for row in rows:
        un = ud = dn = dd = nu = nd = 0
        for d, m in by_day.items():
            if row.symbol not in m:
                continue
            mr_k, k = sum(m.values()), len(m)
            if mr_k > 0:
                nu += 1
                un += m[row.symbol] * k
                ud += mr_k
            elif mr_k < 0:
                nd += 1
                dn += m[row.symbol] * k
                dd += mr_k
        assert (row.n_up_days, row.n_down_days) == (nu, nd)
        assert row.up_capture_milli == _trunc_div(un * 1000, ud)
        assert row.down_capture_milli == _trunc_div(dn * 1000, dd)
