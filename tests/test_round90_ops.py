"""Round-90 tests: Granger causality, Qini uplift curve."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_granger_matches_bruteforce(spark):
    rows = registry.queries()["timeseries_granger_causality"](spark, SF).collect()
    assert len(rows) == 20  # 5 symbols, directed pairs
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
    rets = {
        s: [math.floor((c - p) * 10000.0 / p + 0.5) for p, c in zip(cs, cs[1:])]
        for s, cs in seqs.items()
    }
    for r in rows:
        ys, xs = rets[r.symbol_y], rets[r.symbol_x]
        pts = [
            (ys[i], ys[i - 1], xs[i - 1]) for i in range(1, min(len(ys), len(xs)))
        ]
        n = len(pts)
        assert r.n_obs == n
        sy = sum(p[0] for p in pts)
        s1 = sum(p[1] for p in pts)
        s2 = sum(p[2] for p in pts)
        cyy = sum(p[0] ** 2 for p in pts) - sy * sy / n
        c11 = sum(p[1] ** 2 for p in pts) - s1 * s1 / n
        c22 = sum(p[2] ** 2 for p in pts) - s2 * s2 / n
        c12 = sum(p[1] * p[2] for p in pts) - s1 * s2 / n
        c1y = sum(p[0] * p[1] for p in pts) - s1 * sy / n
        c2y = sum(p[0] * p[2] for p in pts) - s2 * sy / n
        sse_r = cyy - c1y * c1y / c11
        det = c11 * c22 - c12 * c12
        sse_f = cyy - ((c1y * c22 - c2y * c12) * c1y + (c2y * c11 - c1y * c12) * c2y) / det
        assert r.sse_restricted == math.floor(sse_r + 0.5)
        assert r.sse_full == math.floor(sse_f + 0.5)
        assert r.granger_f_milli == math.floor(
            (sse_r - sse_f) / (sse_f / (n - 3)) * 1000 + 0.5
        )
        # adding a regressor can only shrink SSE
        assert r.sse_full <= r.sse_restricted
        assert r.granger_f_milli >= 0


def test_qini_matches_bruteforce(spark):
    rows = registry.queries()["ml_qini_uplift_curve"](spark, SF).collect()
    assert len(rows) == 10
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        (F.col("user_id") % 2).cast("long").alias("t"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("conv"),
        F.round(F.col("value") * 100).cast("long").alias("score"),
        "event_id",
    ).collect()
    pts = sorted(ev, key=lambda r: (-r.score, r.event_id))
    n = len(pts)
    # ntile sizes: first (n % 10) deciles get one extra
    base, extra = divmod(n, 10)
    nt_c = nc_c = ct_c = cc_c = 0
    idx = 0
    for d, r in enumerate(rows, start=1):
        size = base + (1 if d <= extra else 0)
        chunk = pts[idx: idx + size]
        idx += size
        nt_c += sum(p.t for p in chunk)
        nc_c += sum(1 - p.t for p in chunk)
        ct_c += sum(p.t * p.conv for p in chunk)
        cc_c += sum((1 - p.t) * p.conv for p in chunk)
        assert (r.nt_cum, r.nc_cum, r.conv_t_cum, r.conv_c_cum) == (
            nt_c, nc_c, ct_c, cc_c
        )
        assert r.qini_micro == math.floor((ct_c - cc_c * nt_c / nc_c) * 1e6 + 0.5)
    # final decile covers everything: Qini(10) is overall uplift
    assert rows[-1].nt_cum + rows[-1].nc_cum == n
