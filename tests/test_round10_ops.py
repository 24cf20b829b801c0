"""Round-10 operator tests: semantic invariants beyond the oracle hash."""

from __future__ import annotations

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _rows(spark, name, sf=SF):
    return registry.queries()[name](spark, sf).collect()


def test_pipe_syntax_equals_ansi(spark):
    """The pipe-syntax query must produce exactly what the same query
    written through the DataFrame API produces."""
    from pyspark.sql import functions as F

    rows = {r.l_returnflag: (r.n_lines, r.revenue_cents) for r in _rows(spark, "sql_pipe_syntax")}
    li = spark.read.parquet(f"{SF}/lineitem.parquet").filter(
        F.col("l_shipdate") >= "1995-01-01"
    )
    ansi = (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
                    "long"
                )
            ).alias("rev"),
        )
        .collect()
    )
    assert rows == {r.l_returnflag: (r.n, r.rev) for r in ansi}


def test_session_variable_cutoff_is_90_days(spark):
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cutoff = orders.agg(
        F.max("o_orderdate") - F.expr("INTERVAL 90 DAY")
    ).collect()[0][0]
    expect = orders.filter(F.col("o_orderdate") > cutoff).count()
    got = sum(r.n_orders for r in _rows(spark, "sql_session_variables"))
    assert got == expect


def test_decision_stump_beats_root_and_counts_add_up(spark):
    (r,) = _rows(spark, "ml_decision_stump")
    assert r.weighted_gini <= r.root_gini + 1e-9
    assert 0 <= r.pos_left <= r.n_left
    assert 0 <= r.pos_right <= r.n_right
    assert r.n_left > 0 and r.n_right > 0
    docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert r.n_left + r.n_right == docs


def test_naive_bayes_confusion_covers_all_docs(spark):
    rows = _rows(spark, "ml_naive_bayes_lang")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert sum(r.n_docs for r in rows) == docs.count()
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    for r in rows:
        assert r.true_lang in langs and r.pred_lang in langs
    # diagonal dominance: the classifier should beat random on its own
    # training corpus (5 langs -> random = 20%)
    diag = sum(r.n_docs for r in rows if r.true_lang == r.pred_lang)
    assert diag * 5 > docs.count()


def test_bootstrap_ci_brackets_point_estimate(spark):
    (r,) = _rows(spark, "stats_bootstrap_ci")
    assert r.n_resamples == 64
    assert r.ci_lo_cents <= r.ci_hi_cents
    # the point estimate should land inside (or at worst on) the CI
    assert r.ci_lo_cents <= r.point_mean_cents <= r.ci_hi_cents


def test_event_study_accounting(spark):
    for r in _rows(spark, "bars_event_study"):
        # top decile by disc-percentile: at least 10% of days qualify
        assert r.n_event_days * 10 >= r.n_days
        assert r.n_event_days < r.n_days
        # abnormal = event mean - overall mean; overall is a blend, so
        # abnormal and (event - other) must share a sign (within quantization)
        if r.mean_event_ret_bp > r.mean_other_ret_bp:
            assert r.mean_abnormal_bp >= -0.02
        else:
            assert r.mean_abnormal_bp <= 0.02


def test_datasheet_bounds(spark):
    rows = _rows(spark, "corpus_datasheet")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        assert 1 <= r.n_langs <= 5
        assert 0 <= r.en_permille <= 1000
        assert 0 <= r.dup_permille < 1000
        assert 0 <= r.stopword_permille < 1000
        assert r.mean_tokens > 0 and r.p50_chars > 0


def test_dpp_totals_match_plain_filter(spark):
    from pyspark.sql import functions as F

    rows = {r.event_type: r.n_events for r in _rows(spark, "join_dynamic_partition_pruning")}
    ev = spark.read.parquet(f"{SF}/events.parquet")
    expect = {
        r.event_type: r.n
        for r in ev.filter(F.col("event_type").isin("purchase", "signup"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert rows == expect
