"""Round-32 tests: power analysis, price elasticity."""

from __future__ import annotations

import math

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_power_analysis_matches_formula(spark):
    from us_stock_data_pipeline_spark.queries.analytics_ops41 import (
        _MDE_E6,
        _Z_ALPHA,
        _Z_BETA,
    )

    rows = registry.queries()["stats_power_analysis"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        p1 = r.n_converted / r.n_customers
        p2 = p1 + _MDE_E6 / 1e6
        want = math.ceil(
            (_Z_ALPHA + _Z_BETA) ** 2
            * (p1 * (1 - p1) + p2 * (1 - p2))
            / (_MDE_E6 / 1e6) ** 2
        )
        assert r.n_required_per_arm == want
        assert r.segment_is_powered == (1 if r.n_customers // 2 >= want else 0)


def test_elasticity_matches_numpy(spark):
    import numpy as np
    from pyspark.sql import functions as F

    rows = {r.brand: r for r in registry.queries()["orders_price_elasticity"](spark, SF).collect()}
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    part = spark.read.parquet(f"{SF}/part.parquet")
    obs = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select(
            "p_brand",
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
            F.round("l_quantity").cast("long").alias("qty"),
        )
        .collect()
    )
    from collections import defaultdict

    panel = defaultdict(lambda: ([], []))
    for o in obs:
        lp = math.floor(math.log(o.cents / o.qty) * 1e5 + 0.5)
        lq = math.floor(math.log(o.qty) * 1e5 + 0.5)
        panel[o.p_brand][0].append(lp)
        panel[o.p_brand][1].append(lq)
    for brand, (xs, ys) in panel.items():
        slope = np.polyfit(np.array(xs, float), np.array(ys, float), 1)[0]
        got = rows[brand].elasticity_e6 / 1e6
        assert abs(got - slope) < 1e-3, brand
