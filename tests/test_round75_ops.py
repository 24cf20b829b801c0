"""Round-75 tests: propensity-score matching ATT."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_psm_match_quality_and_counts(spark):
    (row,) = registry.queries()["causal_psm_att"](spark, SF).collect()
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    n_treated = cust.filter(F.col("c_mktsegment") == "BUILDING").count()
    assert row.n_treated == n_treated
    assert row.n_matched + row.n_caliper_dropped == row.n_treated
    assert row.n_matched > 0
    assert 0 <= row.max_match_dist_cents <= 10_000


def test_psm_nearest_match_manual(spark):
    (row,) = registry.queries()["causal_psm_att"](spark, SF).collect()
    cust = spark.read.parquet(f"{SF}/customer.parquet").select(
        F.col("c_custkey").alias("cust"),
        (F.col("c_mktsegment") == "BUILDING").alias("treated"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("score"),
    ).collect()
    controls = sorted(
        ((c.score, c.cust) for c in cust if not c.treated)
    )
    import bisect

    n_matched = 0
    max_dist = 0
    scores = [s for s, _ in controls]
    for c in cust:
        if not c.treated:
            continue
        i = bisect.bisect_right(scores, c.score)  # strictly-greater index
        # backward candidate: any control with (score, cust) < (c.score, c.cust)
        cands = []
        j = bisect.bisect_left(controls, (c.score, c.cust))
        if j > 0:
            cands.append(c.score - controls[j - 1][0])
        if j < len(controls):
            cands.append(controls[j][0] - c.score)
        if not cands:
            continue
        d = min(cands)
        if d <= 10_000:
            n_matched += 1
            max_dist = max(max_dist, d)
    assert row.n_matched == n_matched
    assert row.max_match_dist_cents == max_dist
