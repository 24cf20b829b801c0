"""Round-7 operator tests, part 3: batch H/I/J invariants."""

from __future__ import annotations

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _q(name):
    return registry.queries()[name]


def test_pmi_symmetric_inputs_and_bounds(spark):
    rows = _q("text_pmi_cooccurrence")(spark, SF).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r.w1 < r.w2
        assert r.n12 <= min(r.n1, r.n2)
        assert r.n12 >= 5


def test_atr_dominates_daily_range_floor(spark):
    rows = _q("bars_atr")(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.tr_cents >= 0
        assert r.atr_cents >= 0


def test_trimmed_mean_two_formulations_agree(spark):
    for r in _q("agg_trimmed_mean")(spark, SF).collect():
        assert abs(r.trimmed_mean - r.trimmed_mean_check) < 1e-9
        assert r.n_kept <= r.n_total
        # 10% trim keeps at least 80% of rows
        assert r.n_kept >= r.n_total - 2 * (r.n_total // 10)


def test_repeat_latency_buckets_ordered(spark):
    rows = _q("customer_repeat_latency")(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.min_avg_gap <= r.max_avg_gap
        assert 7 * r.gap_weeks_bucket <= r.min_avg_gap + 1


def test_token_runway_bottleneck_is_min(spark):
    rows = _q("corpus_token_budget_forecast")(spark, SF).collect()
    min_steps = min(r.steps_runway for r in rows)
    for r in rows:
        assert r.exhausts_first == (r.steps_runway == min_steps)


def test_embedding_dup_audit_accounting(spark):
    r = _q("embedding_exact_duplicates")(spark, SF).collect()[0]
    assert r.n_vecs == 500
    assert r.n_distinct + r.n_redundant == r.n_vecs
    assert (r.max_group > 1) == (r.n_dup_groups > 0)


def test_bag_semantics_identity(spark):
    """|A EXCEPT ALL B| = |A| - |A INTERSECT ALL B| — the defining bag
    identity; and UNION ALL = |A| + |B|."""
    rows = {r.op: r.n_rows for r in _q("set_ops_bag_semantics")(spark, SF).collect()}
    from pyspark.sql import functions as F

    from us_stock_data_pipeline_spark.catalog import load_table

    li = load_table(spark, SF, "lineitem")
    na = li.filter(F.col("l_returnflag") == "R").count()
    nb = li.filter(F.col("l_linestatus") == "F").count()
    assert rows["union_all"] == na + nb
    assert rows["except_all"] == na - rows["intersect_all"]


def test_grouping_labels_totals_consistent(spark):
    rows = _q("agg_grouping_id_labels")(spark, SF).collect()
    grand = [r for r in rows if r.scope == "grand_total"]
    assert len(grand) == 1
    detail_cents = sum(r.cents for r in rows if r.scope == "detail")
    subtotal_cents = sum(r.cents for r in rows if r.scope == "nation_subtotal")
    assert grand[0].cents == detail_cents == subtotal_cents
    assert all(r.nation == "ALL_NATIONS" for r in grand)


# --------------------------------------------------------------------------
# batch K: ratio CI, Simpson audit, kNN eval, burstiness
# --------------------------------------------------------------------------


def test_ratio_ci_brackets_point_estimate(spark):
    for r in _q("agg_ratio_delta_ci")(spark, SF).collect():
        assert r.ci_low <= r.revenue_per_event <= r.ci_high
        assert r.n_users > 1


def test_simpson_check_has_pooled_and_segments(spark):
    rows = {r.segment: r for r in _q("events_simpson_check")(spark, SF).collect()}
    assert set(rows) == {"heavy", "light", "pooled"}
    for r in rows.values():
        assert 0.0 <= r.rate_early <= 1.0 and 0.0 <= r.rate_late <= 1.0
        assert r.conv_early <= r.n_early and r.conv_late <= r.n_late


def test_knn_eval_counts_sum_to_sample(spark):
    rows = _q("knn_loo_label_eval")(spark, SF).collect()
    assert sum(r.n_queries for r in rows) == 50
    for r in rows:
        assert 0 <= r.n_correct <= r.n_queries


def test_burstiness_nonnegative_and_flag_consistent(spark):
    rows = _q("text_burstiness_dispersion")(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.vmr >= 0.0
        assert r.docs_with <= r.total
        assert r.bursty == (r.vmr > 2.0) or abs(r.vmr - 2.0) < 1e-3


# --------------------------------------------------------------------------
# batch L: reconciliation, surrogate keys, code table, sliding median
# --------------------------------------------------------------------------


def test_tax_recon_classes_partition_orders(spark):
    from us_stock_data_pipeline_spark.catalog import load_table

    rows = _q("lineitem_tax_reconciliation")(spark, SF).collect()
    assert sum(r.n_orders for r in rows) == load_table(spark, SF, "orders").count()
    for r in rows:
        if r.recon_class == "exact":
            assert r.max_diff_cents == 0


def test_surrogate_keys_collision_free_at_16(spark):
    r = _q("etl_surrogate_key_audit")(spark, SF).collect()[0]
    assert r.n_rows == r.distinct_sk16 + r.collisions_sk16
    assert r.collisions_sk16 == 0  # 64-bit space, 150 rows
    assert r.distinct_sk8 <= r.distinct_sk16


def test_code_table_join_covers_all_priorities(spark):
    rows = _q("join_inline_code_table")(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.n_breached <= r.n_orders


def test_code_table_join_broadcasts(spark):
    df = _q("join_inline_code_table")(spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_sliding_median_within_frame_bounds(spark):
    rows = _q("window_sliding_median")(spark, SF).collect()
    assert rows
    by_symbol = {}
    for r in rows:
        by_symbol.setdefault(r.symbol, []).append(r)
    for sym, rs in by_symbol.items():
        rs.sort(key=lambda r: r.day)
        cents = [r.cents for r in rs]
        # output starts at rn=7: the first 6 output rows' frames reach
        # back into warmup days not present here — check from i=6 on,
        # where the 7-day frame lies fully inside the visible rows
        for i in range(6, len(rs)):
            window = cents[i - 6: i + 1]
            assert min(window) <= rs[i].median_cents <= max(window)


# --------------------------------------------------------------------------
# batch M: file skew, debounce, format battery, whale concentration
# --------------------------------------------------------------------------


def test_file_skew_value_file_bijection(spark):
    """Staged layout writes one file per returnflag value, so n_files
    equals the flag cardinality and row totals match lineitem."""
    from us_stock_data_pipeline_spark.catalog import load_table

    r = _q("etl_input_file_skew")(spark, SF).collect()[0]
    li = load_table(spark, SF, "lineitem")
    assert r.n_files == li.select("l_returnflag").distinct().count()
    assert r.total_rows == li.count()
    assert r.skew_ratio >= 1.0


def test_debounce_suppression_ratio(spark):
    rows = _q("events_alert_debounce")(spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_episodes <= r.n_crossings
        assert r.crossings_per_episode >= 1.0


def test_format_battery_rendering(spark):
    rows = _q("scalar_format_battery")(spark, SF).collect()
    for r in rows:
        assert len(r.padded_key) == 3
        assert len(r.lpadded) == 20
        assert len(r.rpadded) == 6
        assert r.kv_render.startswith("nation=")


def test_whale_share_bounded_by_decile_math(spark):
    rows = _q("orders_whale_concentration")(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.top_decile_share <= 1.0
        assert r.top_decile_cents <= r.total_cents
        # a decile of customers holds at least a decile of revenue
        # (they are the TOP decile)
        if r.n_customers >= 10:
            assert r.top_decile_share >= 0.1 - 1e-9
