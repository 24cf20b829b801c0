"""Round-12 operator tests: AQE conf bracket hygiene, backtest
state-machine invariants, subject-extract accounting."""

from __future__ import annotations

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _rows(spark, name, sf=SF):
    return registry.queries()[name](spark, sf).collect()


def test_aqe_brackets_restore_session_confs(spark):
    """The demonstration confs must not leak: broadcast threshold and
    skew thresholds read the same before and after both queries."""
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.coalescePartitions.enabled",
    ]
    before = {k: spark.conf.get(k, None) for k in keys}
    _rows(spark, "join_aqe_runtime_broadcast")
    _rows(spark, "join_aqe_skew_handled")
    after = {k: spark.conf.get(k, None) for k in keys}
    assert before == after


def test_aqe_broadcast_result_matches_plain_join(spark):
    from pyspark.sql import functions as F

    rows = {r.o_orderpriority: (r.n_lines, r.revenue_cents) for r in _rows(spark, "join_aqe_runtime_broadcast")}
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet").filter(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2) == "ff"
    )
    plain = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
            ).alias("rev"),
        )
        .collect()
    )
    assert rows == {r.o_orderpriority: (r.n, r.rev) for r in plain}


def test_skew_key_zero_dominates(spark):
    rows = {r.skew_key: r.n_events for r in _rows(spark, "join_aqe_skew_handled")}
    total = sum(rows.values())
    # the synthetic collapse puts ~80% of events on key 0
    assert rows[0] * 10 >= total * 7
    ev = spark.read.parquet(f"{SF}/events.parquet").count()
    assert total == ev


def test_turtle_backtest_invariants(spark):
    for r in _rows(spark, "bars_turtle_backtest"):
        assert r.n_trades >= 1
        assert 0 <= r.n_wins <= r.n_trades
        assert r.n_forced_exits in (0, 1)  # at most one open position
        assert r.worst_trade_cents <= r.best_trade_cents
        assert r.worst_trade_cents <= r.total_pnl_cents // r.n_trades <= r.best_trade_cents


def test_turtle_exit_rule_bounds_losses(spark):
    """A stop-out exit happens at the first close under the prior
    10-day low AFTER an entry above the prior 20-day high; any
    non-forced losing trade's loss is bounded by the largest
    single-day drop in the fixture (sanity: no trade loses more than
    the full price range)."""
    from pyspark.sql import functions as F

    rng = (
        spark.read.parquet(f"{SF}/events.parquet")
        .agg(
            (F.max(F.round(F.col("value") * 100)) - F.min(F.round(F.col("value") * 100)))
            .cast("long")
            .alias("range_cents")
        )
        .collect()[0]
        .range_cents
    )
    for r in _rows(spark, "bars_turtle_backtest"):
        assert abs(r.worst_trade_cents) <= rng


def test_subject_extract_accounting(spark):
    from pyspark.sql import functions as F

    rows = _rows(spark, "etl_subject_access_extract")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    expect_subjects = cust.filter(F.col("c_custkey") % 97 == 0).count()
    assert len(rows) == expect_subjects
    for r in rows:
        if r.n_orders == 0:
            assert r.first_order is None and r.n_lineitems == 0 and r.spend_cents == 0
        else:
            assert r.first_order <= r.last_order
            assert r.n_lineitems >= r.n_orders  # every order has >= 1 line


def test_flesch_scores_in_plausible_band(spark):
    for r in _rows(spark, "text_readability_flesch"):
        assert r.words >= r.sentences
        assert r.syllables >= r.words // 2  # nearly every word has a vowel group
        assert -200 <= r.flesch_score <= 207
