"""Round-28 tests: CMH odds ratio, min-variance pairs, bandit replay."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_cmh_pools_between_stratum_extremes(spark):
    rows = registry.queries()["stats_cmh_odds_ratio"](spark, SF).collect()
    assert len(rows) == 5
    cmh = {r.cmh_or_e6 for r in rows}
    assert len(cmh) == 1  # one pooled estimate
    cmh = cmh.pop()
    strata = [r.stratum_or_e6 for r in rows]
    assert min(strata) <= cmh <= max(strata)
    for r in rows:
        assert r.a + r.b + r.c + r.d > 0


def test_min_variance_weights_reduce_variance(spark):
    """The closed-form w1 must yield portfolio variance <= each leg's
    variance (the defining property), checked in exact float math on
    the same return series."""
    import numpy as np

    rows = registry.queries()["portfolio_min_variance_pairs"](spark, SF).collect()
    assert len(rows) == 10  # C(5,2)
    ev = spark.read.parquet(f"{SF}/events.parquet")
    daily = (
        ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"))
        .orderBy("event_type", "day")
        .collect()
    )
    from collections import defaultdict

    series = defaultdict(list)
    for r in daily:
        series[r.event_type].append(r.c)
    rets = {
        s: np.diff(np.log(np.array(v, dtype=float)))
        for s, v in series.items()
    }
    for r in rows:
        r1, r2 = rets[r.sym1], rets[r.sym2]
        w1 = r.w1_e6 / 1e6
        port = w1 * r1 + (1 - w1) * r2
        assert port.var() <= min(r1.var(), r2.var()) + 1e-12, (r.sym1, r.sym2)


def test_bandit_replay_policy_is_hourly_argmax(spark):
    rows = registry.queries()["bandit_replay_eval"](spark, SF).collect()
    assert len(rows) == 24
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    from collections import Counter, defaultdict

    train = defaultdict(Counter)
    for e in ev:
        if e.event_id % 2 == 0:
            train[e.ts.hour][e.event_type] += 1
    for r in rows:
        cnt = train[r.hour]
        best = min(((-n, a) for a, n in cnt.items()))[1]
        assert r.pi_action == best, r.hour
        assert 0 <= r.n_matched <= r.n_logged
