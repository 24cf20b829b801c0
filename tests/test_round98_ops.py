"""Round-98 tests: Dunning G^2 collocations, Bowley skewness."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_dunning_matches_bruteforce(spark):
    rows = registry.queries()["text_dunning_collocations"](spark, SF).collect()
    assert len(rows) == 20
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("text").collect()
    bigrams = Counter()
    for r in docs:
        ws = r.text.split(" ")
        for a, b in zip(ws, ws[1:]):
            bigrams[(a, b)] += 1
    n = sum(bigrams.values())
    c1 = Counter()
    c2 = Counter()
    for (a, b), k in bigrams.items():
        c1[a] += k
        c2[b] += k

    def g2(a, b):
        k11 = bigrams[(a, b)]
        k12 = c1[a] - k11
        k21 = c2[b] - k11
        k22 = n - c1[a] - c2[b] + k11

        def t(o, rt, ct):
            return o * math.log(o * n / (rt * ct)) if o > 0 else 0.0

        raw = (
            t(k11, k11 + k12, k11 + k21)
            + t(k12, k11 + k12, k12 + k22)
            + t(k21, k21 + k22, k11 + k21)
            + t(k22, k21 + k22, k12 + k22)
        )
        return math.floor(2e6 * raw + 0.5)

    scored = sorted(
        ((g2(a, b), a, b) for (a, b) in bigrams),
        key=lambda x: (-x[0], x[1], x[2]),
    )[:20]
    got = [(r.g2_micro, r.w1, r.w2) for r in rows]
    assert got == scored
    for r in rows:
        assert r.pair_count == bigrams[(r.w1, r.w2)]
        assert r.g2_micro >= 0  # G^2 is non-negative


def test_bowley_matches_bruteforce(spark):
    rows = registry.queries()["agg_bowley_skewness"](spark, SF).collect()
    assert rows
    c = spark.read.parquet(f"{SF}/customer.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    vals = (
        c.join(o, o.o_custkey == c.c_custkey)
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
        )
        .collect()
    )
    per = defaultdict(list)
    for r in vals:
        per[r.seg].append(r.v)
    for r in rows:
        vs = sorted(per[r.segment])
        n = len(vs)
        q1 = vs[(n + 3) // 4 - 1]
        q2 = vs[(n + 1) // 2 - 1]
        q3 = vs[(3 * n + 1) // 4 - 1]
        assert (r.n_orders, r.q1_cents, r.q2_cents, r.q3_cents) == (n, q1, q2, q3)
        assert r.bowley_milli == math.floor((q3 + q1 - 2 * q2) / (q3 - q1) * 1000 + 0.5)
        assert -1000 <= r.bowley_milli <= 1000
