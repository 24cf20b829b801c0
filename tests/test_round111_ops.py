"""Round-110 tests: golden-record merge, odds/risk ratios."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_golden_record_matches_bruteforce(spark):
    rows = registry.queries()["etl_golden_record_merge"](spark, SF).collect()
    assert rows
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "event_type", "value", "ts", "event_id")
        .collect()
    )
    pri = {"purchase": 1, "signup": 2}
    best = {}
    for r in ev:
        key = (pri.get(r.event_type, 3), _neg_ts(r.ts), -r.event_id)
        if r.user_id not in best or key < best[r.user_id][0]:
            best[r.user_id] = (key, r)
    assert len(rows) == len(best)
    for r in rows:
        chosen = best[r.user_id][1]
        assert r.golden_source == chosen.event_type
        assert r.golden_value_cents == round(chosen.value * 100)
        assert r.golden_event_id == chosen.event_id
    # the priority rule must actually bite: every user with a purchase
    # event gets a purchase golden record even if other events are newer
    users_with_purchase = {r.user_id for r in ev if r.event_type == "purchase"}
    for r in rows:
        if r.user_id in users_with_purchase:
            assert r.golden_source == "purchase"


def _neg_ts(ts):
    return -ts.timestamp()


def test_odds_risk_ratio_matches_bruteforce(spark):
    (row,) = registry.queries()["stats_odds_risk_ratio"](spark, SF).collect()
    o = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    flags = (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("y"))
        .collect()
    )
    a = b = c = d = 0
    for r in flags:
        exp = r.o_orderpriority in ("1-URGENT", "2-HIGH")
        if exp and r.y:
            a += 1
        elif exp:
            b += 1
        elif r.y:
            c += 1
        else:
            d += 1
    assert (row.a, row.b, row.c, row.d) == (a, b, c, d)
    orx = a * d / b / c
    rr = a * (c + d) / c / (a + b)
    assert row.odds_ratio_micro == math.floor(orx * 1e6 + 0.5)
    assert row.risk_ratio_micro == math.floor(rr * 1e6 + 0.5)
    se_or = math.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
    assert row.or_ci_lo_micro == math.floor(math.exp(math.log(orx) - 1.96 * se_or) * 1e6 + 0.5)
    assert row.or_ci_hi_micro == math.floor(math.exp(math.log(orx) + 1.96 * se_or) * 1e6 + 0.5)
    # CI brackets the point estimate
    assert row.or_ci_lo_micro <= row.odds_ratio_micro <= row.or_ci_hi_micro
