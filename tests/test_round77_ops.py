"""Round-77 tests: Nelson-Aalen hazard, log-rank two-group test."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"
CENSOR = 60


def _durations(spark):
    """(group, t, ev) durations mirroring the queries' censoring model."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    rows = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("int").alias("g"),
            F.datediff("l_shipdate", "o_orderdate").alias("raw"),
        )
        .collect()
    )
    return [
        (r.g, min(r.raw, CENSOR), 1 if r.raw <= CENSOR else 0) for r in rows
    ]


def test_nelson_aalen_matches_bruteforce(spark):
    out = registry.queries()["survival_nelson_aalen"](spark, SF).collect()
    assert out
    dur = _durations(spark)
    per_t: dict[int, list[int]] = {}
    for _, t, ev in dur:
        d = per_t.setdefault(t, [0, 0])
        d[0] += ev
        d[1] += 1
    n_risk = len(dur)
    cum = 0
    expected = {}
    for t in sorted(per_t):
        d, leaving = per_t[t]
        if d > 0:
            cum += d * 1_000_000 // n_risk
            expected[t] = (n_risk, d, cum)
        n_risk -= leaving
    for r in out:
        n, d, c = expected[r.t_days]
        assert (r.n_risk, r.d_events, r.cum_hazard_micro) == (n, d, c)
    assert len(out) == len(expected)


def test_nelson_aalen_below_neg_log_km(spark):
    # H_NA(t) <= -ln(S_KM(t)) pointwise (1-x <= e^-x): ties the two
    # survival estimators together on shared event times. KM now
    # reports the exact fixed-point product survival_fp9 (r9), so the
    # log view is recomputed here; each fold step floors, making
    # -ln(S_fp9) an upper bound of -ln(S_true) and preserving the
    # inequality direction.
    import math

    na = {r.t_days: r.cum_hazard_micro for r in
          registry.queries()["survival_nelson_aalen"](spark, SF).collect()}
    km = {r.t_days: -math.log(r.survival_fp9 / 1e9) * 1e6 for r in
          registry.queries()["survival_kaplan_meier"](spark, SF).collect()}
    shared = set(na) & set(km)
    assert shared
    for t in shared:
        assert na[t] <= km[t] + 2  # +2 micro: independent quantizations


def test_logrank_matches_bruteforce(spark):
    (row,) = registry.queries()["survival_logrank_test"](spark, SF).collect()
    dur = _durations(spark)
    n1 = sum(1 for g, _, _ in dur if g)
    n2 = len(dur) - n1
    assert (row.n1_tot, row.n2_tot) == (n1, n2)
    per_t: dict[int, list[int]] = {}
    for g, t, ev in dur:
        d = per_t.setdefault(t, [0, 0, 0, 0])  # d1, d2, leave1, leave2
        d[0] += ev * g
        d[1] += ev * (1 - g)
        d[2] += g
        d[3] += 1 - g
    o1 = e1 = v = 0
    r1, r2 = n1, n2
    for t in sorted(per_t):
        d1, d2, l1, l2 = per_t[t]
        d, n = d1 + d2, r1 + r2
        if d > 0 and n > 1:
            o1 += d1
            e1 += d * r1 * 1_000_000 // n
            v += math.floor(d * r1 / n * r2 / n * (n - d) / (n - 1) * 1_000_000 + 0.5)
        r1 -= l1
        r2 -= l2
    assert (row.o1, row.e1_micro, row.v_micro) == (o1, e1, v)
    diff = o1 * 1_000_000 - e1
    assert row.chi2_milli == math.floor(diff * diff / 1_000_000 / v * 1000 + 0.5)
    assert row.chi2_milli >= 0
