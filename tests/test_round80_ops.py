"""Round-80 tests: Money Flow Index, McNemar paired test."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_mfi_matches_bruteforce(spark):
    rows = registry.queries()["bars_money_flow_index"](spark, SF).collect()
    assert rows
    ev = spark.read.parquet(f"{SF}/events.parquet")
    bars = (
        ev.groupBy(
            F.col("event_type").alias("symbol"),
            F.date_trunc("day", "ts").cast("date").alias("day"),
        )
        .agg(
            F.round(F.max("value") * 100).cast("long").alias("h"),
            F.round(F.min("value") * 100).cast("long").alias("l"),
            F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"),
            F.count(F.lit(1)).cast("long").alias("v"),
        )
        .orderBy("symbol", "day")
        .collect()
    )
    seqs = defaultdict(list)
    for r in bars:
        seqs[r.symbol].append((r.day, r.h + r.l + r.c, r.v))
    N = 14
    expected = {}
    for sym, seq in seqs.items():
        pos, neg = [0], [0]
        for i in range(1, len(seq)):
            tp, ptp = seq[i][1], seq[i - 1][1]
            mf = tp * seq[i][2]
            pos.append(mf if tp > ptp else 0)
            neg.append(mf if tp < ptp else 0)
        for i in range(N, len(seq)):
            p = sum(pos[i - N + 1: i + 1])
            n = sum(neg[i - N + 1: i + 1])
            mfi = -1 if p + n == 0 else p * 10000 // (p + n)
            expected[(sym, seq[i][0])] = (p, n, mfi)
    assert len(rows) == len(expected)
    for r in rows:
        assert expected[(r.symbol, r.day)] == (r.pos_flow3, r.neg_flow3, r.mfi_bp)
        assert r.mfi_bp == -1 or 0 <= r.mfi_bp <= 10000


def test_mcnemar_matches_bruteforce(spark):
    (row,) = registry.queries()["stats_mcnemar_paired"](spark, SF).collect()
    o = spark.read.parquet(f"{SF}/orders.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet")
    y0 = o.agg(F.min(F.year("o_orderdate"))).collect()[0][0]
    per_cust = {r.c_custkey: [0, 0] for r in c.select("c_custkey").collect()}
    for r in o.select("o_custkey", F.year("o_orderdate").alias("y")).collect():
        if r.o_custkey in per_cust:
            if r.y == y0:
                per_cust[r.o_custkey][0] = 1
            elif r.y == y0 + 1:
                per_cust[r.o_custkey][1] = 1
    both = sum(1 for a, b in per_cust.values() if a and b)
    b_ = sum(1 for a, b in per_cust.values() if a and not b)
    c_ = sum(1 for a, b in per_cust.values() if not a and b)
    neither = sum(1 for a, b in per_cust.values() if not a and not b)
    assert (row.both_active, row.b_only_first, row.c_only_second, row.neither) == (
        both, b_, c_, neither
    )
    assert both + b_ + c_ + neither == len(per_cust)
    assert row.chi2_milli == math.floor((b_ - c_) ** 2 / (b_ + c_) * 1000 + 0.5)
    assert row.chi2_corrected_milli == math.floor(
        (abs(b_ - c_) - 1) ** 2 / (b_ + c_) * 1000 + 0.5
    )
    # continuity correction only shrinks the statistic
    assert row.chi2_corrected_milli <= row.chi2_milli
