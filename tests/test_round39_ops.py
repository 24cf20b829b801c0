"""Round-39 tests: walk-forward CV, triplet violations."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_walk_forward_first_month_has_no_model(spark):
    rows = registry.queries()["ml_walk_forward_cv"](spark, SF).collect()
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    months = sorted(
        r.m
        for r in orders.select(
            F.date_trunc("month", "o_orderdate").cast("date").alias("m")
        )
        .distinct()
        .collect()
    )
    got_months = [r.fold_month for r in rows]
    assert months[0] not in got_months, "first month has no history to train on"
    assert set(got_months) == set(months[1:])
    for r in rows:
        assert r.mae_cents > 0


def test_walk_forward_no_future_leakage(spark):
    """Model for month m must equal mean over months < m only —
    spot-checked for the last month."""
    rows = {r.fold_month: r for r in registry.queries()["ml_walk_forward_cv"](spark, SF).collect()}
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("m"),
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("y"),
    ).collect()
    months = sorted({o.m for o in orders})
    last = months[-1]
    from collections import defaultdict

    train_sum = defaultdict(lambda: [0, 0])
    for o in orders:
        if o.m < last:
            t = train_sum[o.o_orderpriority]
            t[0] += o.y
            t[1] += 1
    errs = []
    for o in orders:
        if o.m == last:
            s, c = train_sum[o.o_orderpriority]
            errs.append(abs(o.y - s // c))
    assert rows[last].n_test == len(errs)
    assert rows[last].mae_cents == sum(errs) // len(errs)


def test_triplet_counts_consistent(spark):
    r = registry.queries()["embedding_triplet_violations"](spark, SF).collect()[0]
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n_anchors = emb.filter("vec_id % 5 = 0").count()
    assert r.n_triplets == n_anchors
    assert 0 <= r.n_hard_violations <= r.n_violations <= r.n_triplets
