"""Round-97 tests: stream-stream left-outer join, IRR bisection."""

from __future__ import annotations

import math
from collections import defaultdict
from datetime import timedelta

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.queries.analytics_ops90 import _pow_chain

SF = "/root/testdata/sf0.001"


def test_stream_left_outer_matches_watermark_semantics(spark):
    rows = registry.queries()["stream_stream_left_outer_join"](spark, SF).collect()
    assert rows
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
    ).collect()
    clicks = [(r.event_id, r.user_id, r.ts) for r in ev if r.event_type == "click"]
    purch = [(r.event_id, r.user_id, r.ts) for r in ev if r.event_type == "purchase"]
    wm = min(max(t for _, _, t in clicks), max(t for _, _, t in purch)) - timedelta(hours=1)
    expected = set()
    matched_clicks = set()
    by_user = defaultdict(list)
    for pid, u, pt in purch:
        by_user[u].append((pid, pt))
    for cid, u, ct in clicks:
        hits = [
            pid for pid, pt in by_user[u] if ct < pt <= ct + timedelta(hours=1)
        ]
        for pid in hits:
            expected.add((cid, pid))
            matched_clicks.add(cid)
        if not hits and ct + timedelta(hours=1) < wm:
            expected.add((cid, None))
    got = {(r.click_id, r.purchase_id) for r in rows}
    assert got == expected
    # the tail of the tape must be pending, not emitted as nulls
    tail = [cid for cid, u, ct in clicks
            if cid not in matched_clicks and ct + timedelta(hours=1) >= wm]
    assert all((cid, None) not in got for cid in tail)


def test_irr_matches_bruteforce(spark):
    rows = registry.queries()["finance_irr_bisection"](spark, SF).collect()
    assert rows
    o = spark.read.parquet(f"{SF}/orders.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet")
    n = spark.read.parquet(f"{SF}/nation.parquet")
    y0 = o.agg(F.min(F.year("o_orderdate"))).collect()[0][0]
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), (F.year("o_orderdate") - y0).alias("t"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
        .collect()
    )
    flows = defaultdict(list)
    for r in rev:
        flows[r.nation].append((r.t, -r.cents if r.t == 0 else r.cents))

    def npv_q(fl, r):
        return sum(
            math.floor(cf / _pow_chain(1.0 + r, t) * 1e6 + 0.5) for t, cf in fl
        )

    for row in rows:
        fl = flows[row.nation]
        assert sum(cf for _, cf in fl) > 0 and npv_q(fl, 10.0) < 0
        lo, hi = 0.0, 10.0
        for _ in range(24):
            mid = (lo + hi) / 2
            if npv_q(fl, mid) > 0:
                lo = mid
            else:
                hi = mid
        assert row.irr_micro == math.floor((lo + hi) / 2 * 1e6 + 0.5)
        # NPV at the reported IRR is near zero: root actually found
        r = row.irr_micro / 1e6
        assert abs(npv_q(fl, r)) < abs(npv_q(fl, 0.0)) / 100
