"""Round-41 tests: jackknife ratio variance, position bias."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_jackknife_matches_python(spark):
    got = {r.flag: r for r in registry.queries()["stats_jackknife_ratio"](spark, SF).collect()}
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select(
            "l_returnflag",
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
            F.round("l_quantity").cast("long").alias("x"),
        )
        .collect()
    )
    from collections import defaultdict

    groups = defaultdict(list)
    for r in li:
        groups[r.l_returnflag].append((r.y, r.x))
    for flag, obs in groups.items():
        n = len(obs)
        sy = sum(y for y, _ in obs)
        sx = sum(x for _, x in obs)
        thetas = [math.floor((sy - y) / (sx - x) + 0.5) for y, x in obs]
        s1, s2 = sum(thetas), sum(t * t for t in thetas)
        var = math.floor((n - 1) / n * (s2 - s1 * s1 / n) + 0.5)
        r = got[flag]
        assert r.n_lines == n
        assert r.ratio_e6 == math.floor(sy / sx * 1e6 + 0.5)
        assert r.jack_var_q == var


def test_position_bias_curve_complete(spark):
    rows = registry.queries()["events_position_bias"](spark, SF).collect()
    assert [r.position for r in rows] == list(range(1, 11))
    for r in rows:
        assert 0 <= r.n_conversions <= r.n_impressions
        assert r.cvr_e6 == r.n_conversions * 1_000_000 // r.n_impressions
    # impressions are non-increasing in position (a user contributes to
    # position k only if their sequence is at least k+1 long)
    imps = [r.n_impressions for r in rows]
    assert imps == sorted(imps, reverse=True)
