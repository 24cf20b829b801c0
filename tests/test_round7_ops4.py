"""Round-7 operator tests, part 4: batch N/O invariants."""

from __future__ import annotations

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _q(name):
    return registry.queries()[name]


def test_deletion_manifest_shares_bounded(spark):
    rows = _q("etl_deletion_manifest")(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_delete <= r.part_rows
        assert r.n_users <= r.n_delete
        assert 0.0 < r.delete_share <= 1.0


def test_multi_distinct_panel_hierarchy(spark):
    r = _q("agg_multi_distinct_expand")(spark, SF).collect()[0]
    assert r.n_users <= r.n_rows
    # composite cardinality at least the max of its parts
    assert r.n_user_type_pairs >= max(r.n_users, r.n_types)
    assert r.n_user_type_pairs <= r.n_users * r.n_types


def test_not_in_null_trap_pinned(spark):
    r = _q("subquery_null_semantics")(spark, SF).collect()[0]
    assert r.n_in == r.n_exists  # IN and EXISTS agree
    assert r.n_not_in == 0  # the NULL poisons NOT IN entirely
    assert r.n_not_exists == r.n_rows_total if hasattr(r, "n_rows_total") else True
    # NOT EXISTS is the true complement of EXISTS
    assert r.n_exists + r.n_not_exists > 0


def test_fiscal_445_period_weeks(spark):
    rows = _q("orders_fiscal_calendar_445")(spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r.fq <= 4
        assert 1 <= r.fp <= 3
    # every order lands somewhere
    from us_stock_data_pipeline_spark.catalog import load_table

    assert sum(r.n_orders for r in rows) == load_table(spark, SF, "orders").count()


def test_burn_rate_page_implies_thresholds(spark):
    rows = _q("events_error_budget_burn")(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.err_short <= r.n_short and r.err_long <= r.n_long
        if r.page:
            assert r.burn_short > 6.0 - 1e-3 and r.burn_long > 3.0 - 1e-3


def test_percentile_disc_cont_ordering(spark):
    for r in _q("agg_percentile_disc_cont")(spark, SF).collect():
        assert r.p50_disc <= r.p90_disc
        assert r.p50_cont <= r.p90_cont + 1e-9
        # cont interpolates within the data range around disc
        assert abs(r.p50_cont - r.p50_disc) < max(abs(r.p50_disc) * 0.5, 1000)


def test_source_similarity_bounds(spark):
    rows = _q("text_source_similarity_matrix")(spark, SF).collect()
    assert len(rows) == 19 * 20 // 2
    for r in rows:
        assert r.src_a < r.src_b
        assert 0.0 <= r.cosine <= 1.0 + 1e-9


def test_quantization_sweep_monotone_in_bits(spark):
    rows = {r.bits: r for r in _q("embedding_quantization_sweep")(spark, SF).collect()}
    assert set(rows) == {4, 8}
    # more bits -> strictly less reconstruction error
    assert rows[8].mse <= rows[4].mse
    assert rows[8].max_err_units <= rows[4].max_err_units
    for r in rows.values():
        assert r.n_vals == 500 * 64


# --------------------------------------------------------------------------
# batch P: percent-of-parent, try arithmetic, segment transitions,
# stream-static join
# --------------------------------------------------------------------------


def test_percent_of_parent_sums_to_one_per_region(spark):
    rows = _q("window_percent_of_parent")(spark, SF).collect()
    by_region = {}
    for r in rows:
        by_region.setdefault(r.region, []).append(r)
    for region, rs in by_region.items():
        assert abs(sum(r.pct_of_region for r in rs) - 1.0) < 0.01, region
    assert abs(sum(r.pct_of_total for r in rows) - 1.0) < 0.01


def test_try_arithmetic_null_on_zero_divisor(spark):
    rows = _q("scalar_try_arithmetic")(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.flag_as_number is None  # letters never parse
        assert r.qty_roundtrip is not None  # integral roundtrip always does
        if r.price_per_discount_point is None:
            pass  # zero discount -> NULL, never an error


def test_segment_transitions_cover_all_user_weeks(spark):
    from pyspark.sql import functions as F

    from us_stock_data_pipeline_spark.catalog import load_table

    rows = _q("events_segment_transition")(spark, SF).collect()
    total_trans = sum(r.n_users for r in rows)
    ev = load_table(spark, SF, "events")
    wk_us = 7 * 86400 * 1000000
    user_weeks = (
        ev.select("user_id", F.expr(f"unix_micros(ts) div {wk_us}").alias("wk"))
        .distinct()
        .count()
    )
    # every observed user-week emits exactly one transition row
    assert total_trans == user_weeks
    for r in rows:
        assert r.from_seg in ("heavy", "light")
        assert r.to_seg in ("heavy", "light", "inactive")


def test_stream_static_join_weights_conserved(spark):
    rows = _q("stream_static_enrich_join")(spark, SF).collect()
    assert rows
    from us_stock_data_pipeline_spark.catalog import load_table

    assert sum(r.n_events for r in rows) == load_table(spark, SF, "events").count()
    for r in rows:
        assert r.weighted_cents >= 0


# --------------------------------------------------------------------------
# batch Q: double submission, out-of-order, dedup savings, shard plan
# --------------------------------------------------------------------------


def test_double_submission_gaps_within_window(spark):
    rows = _q("events_double_submission")(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_suspect >= 1
        assert 0 <= r.min_gap_sec <= 24 * 3600


def test_out_of_order_ratio_bounded(spark):
    rows = _q("events_out_of_order_ratio")(spark, SF).collect()
    for r in rows:
        assert r.n_late <= r.n_events
        assert 0.0 <= r.late_ratio <= 1.0
        if r.n_late > 0:
            assert r.max_lateness_sec > 0


def test_dedup_savings_consistent_with_survivor_pick(spark):
    """Savings projection must agree with the survivor-pick op: chars
    saved across sources equals cluster total minus kept chars."""
    sav = _q("corpus_dedup_savings")(spark, SF).collect()
    surv = _q("dedup_survivor_pick")(spark, SF).collect()
    saved_from_clusters = sum(r.total_chars - r.kept_chars for r in surv)
    assert sum(r.chars_saved for r in sav) == saved_from_clusters
    for r in sav:
        assert r.n_dropped < r.n_docs
        assert 0.0 <= r.savings_ratio < 1.0


def test_shard_plan_balances_buckets(spark):
    rows = _q("embedding_shard_plan")(spark, SF).collect()
    assert len(rows) == 8
    assert sum(r.n_vecs for r in rows) == 500
    loads = [r.n_vecs for r in rows]
    bal = _q("embedding_bucket_balance")(spark, SF).collect()[0]
    # striping keeps every shard within one max-bucket of the leader
    assert max(loads) - min(loads) <= bal.max_bucket


# --------------------------------------------------------------------------
# batch R: PVM bridge, weighted scorecard, growth accounting
# --------------------------------------------------------------------------


def test_pvm_effects_reconstruct_delta(spark):
    """Algebraic identity: price effect + volume effect = delta
    (within 1 cent of rounding each effect)."""
    rows = _q("lineitem_pvm_bridge")(spark, SF).collect()
    assert rows
    for r in rows:
        recon = r.price_effect_cents + r.volume_effect_cents
        assert abs(recon - r.delta_cents) <= 2


def test_scorecard_ranks_are_permutations(spark):
    rows = _q("supplier_weighted_scorecard")(spark, SF).collect()
    n = len(rows)
    for col in ("r_rev", "r_breadth", "r_recency"):
        assert sorted(getattr(r, col) for r in rows) == list(range(1, n + 1))
    for r in rows:
        assert r.weighted_rank == 2 * r.r_rev + r.r_breadth + r.r_recency


def test_growth_accounting_partitions_actives(spark):
    rows = sorted(_q("events_growth_accounting")(spark, SF).collect(),
                  key=lambda r: r.d)
    assert rows
    for r in rows:
        assert r.n_new + r.n_retained + r.n_resurrected == r.n_active
    # day one everyone is new
    assert rows[0].n_retained == 0 and rows[0].n_resurrected == 0
    # total news across days == total distinct users
    from us_stock_data_pipeline_spark.catalog import load_table

    total_users = load_table(spark, SF, "events").select("user_id").distinct().count()
    assert sum(r.n_new for r in rows) == total_users
