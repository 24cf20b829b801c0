"""Property and plan-shape tests for the round-9 operators."""

from __future__ import annotations

import pytest

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _q(name):
    return registry.all_queries()[name].fn


def test_attention_softmax_shares_form_distribution(spark):
    rows = _q("ml_attention_softmax")(spark, SF).collect()
    assert rows, "top-k attention rows expected"
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    # weights ordered, shares in [0, 1e6], and the top-k mass is a
    # subset of a normalized distribution
    wqs = [r.w_q for r in rows]
    assert wqs == sorted(wqs, reverse=True)
    assert all(0 <= r.share_e6 <= 1_000_000 for r in rows)
    assert sum(r.share_e6 for r in rows) <= 1_000_000


def test_attention_softmax_plan_broadcasts_query(spark):
    """The query row must be broadcast: no shuffle of the key corpus for
    scoring (the scale property)."""
    plan = _q("ml_attention_softmax")(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_elo_zero_sum_and_bounds(spark):
    from us_stock_data_pipeline_spark.queries.round9_ops3 import _ELO_START

    rows = _q("ml_elo_ratings")(spark, SF).collect()
    assert rows
    # zero-sum updates: total rating mass is exactly conserved
    assert sum(r.rating_milli for r in rows) == _ELO_START * len(rows)
    for r in rows:
        assert 0 <= r.n_wins <= r.n_matches


def test_infonce_rank_consistent_with_weights(spark):
    rows = _q("ml_infonce_loss_audit")(spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r.pos_rank
        assert 0 < r.pos_wq <= r.sum_wq
        assert r.loss_e6 >= 0  # -ln(p) with p <= 1
        if r.pos_rank == 1:
            # positive carries the max weight -> loss bounded by ln(n)
            assert r.loss_e6 <= 4_000_000


def test_doremi_weights_normalize_and_tilt(spark):
    rows = _q("corpus_doremi_reweight_step")(spark, SF).collect()
    total = sum(r.new_weight_e6 for r in rows)
    assert 1_000_000 - len(rows) <= total <= 1_000_000  # floor-div slack
    # monotone: a domain with higher excess loss gets at least the
    # weight of any domain with lower excess
    by_excess = sorted(rows, key=lambda r: r.excess_e6)
    for a, b in zip(by_excess, by_excess[1:]):
        assert a.new_weight_e6 <= b.new_weight_e6 + 1


def test_logsumexp_dominates_max(spark):
    for r in _q("agg_logsumexp")(spark, SF).collect():
        # lse >= max always; lse <= max + ln(n)
        assert r.lse_e6 >= r.max_e6
        import math

        assert r.lse_e6 <= r.max_e6 + int(math.log(r.n) * 1e6) + 2


def test_katz_rank_consistency_and_floor(spark):
    rows = _q("graph_katz_centrality")(spark, SF).collect()
    assert rows
    # every score >= the walk-free floor of 1e6, ranks are a permutation
    assert all(r.katz_micro >= 1_000_000 for r in rows)
    assert sorted(r.rnk for r in rows) == list(range(1, len(rows) + 1))
    by_rank = sorted(rows, key=lambda r: r.rnk)
    scores = [r.katz_micro for r in by_rank]
    assert scores == sorted(scores, reverse=True)


def test_alignment_uniformity_ranges(spark):
    (r,) = _q("embedding_alignment_uniformity")(spark, SF).collect()
    # squared distance of unit vectors is in [0, 4]
    assert 0 <= r.alignment_e6 <= 4_000_000
    # uniformity = ln mean exp(-2 d2) is in [-8, 0]
    assert -8_000_000 <= r.uniformity_e6 <= 0
    assert r.n_pairs >= r.n_pos_pairs > 0


def test_label_smoothing_ce_floor(spark):
    """Smoothing floors the per-doc NLL at -ln((1-eps) + eps/K) and caps
    it at -ln(eps/K)."""
    import math

    rows = _q("ml_label_smoothing_ce")(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    k = docs.select("lang").distinct().count()
    lo = -math.log(0.9 + 0.1 / k) * 1e6
    hi = -math.log(0.1 / k) * 1e6
    for r in rows:
        assert lo - 2 <= r.ce_smoothed_e6 <= hi + 2


def test_pinball_loss_quantile_property(spark):
    """At tau = 0.9 roughly 10% of observations sit above the q90
    forecast, and those overshoots carry 9x weight."""
    rows = _q("ml_pinball_loss")(spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    from pyspark.sql import functions as F

    for r in rows:
        above = (
            ev.filter(F.col("event_type") == r.event_type)
            .filter(F.round(F.col("value") * 100).cast("long") > r.q90_cents)
            .count()
        )
        assert above <= r.n_obs * 0.1 + 1  # ceil-rank q90 bounds overshoots


def test_zonemap_read_scans_only_kept_files(spark, tmp_path):
    """The stat-filtered scan's inputFiles are exactly the planned kept
    files — files are skipped in the ACTUAL scan, not just the planner."""
    from us_stock_data_pipeline_spark.etl import versioned as V

    root = str(tmp_path / "zm")
    df = spark.createDataFrame(
        [("A", 1, 1.0), ("A", 2, 2.0), ("B", 100, 3.0), ("B", 200, 4.0)],
        "symbol string, ts int, px double",
    )
    V.versioned_merge_upsert(
        spark, df, root, ("symbol", "ts"), stats_cols=("ts",)
    )
    snap = V.read_versioned(spark, root, stat_filter={"ts": (100, 300)})
    kept, skipped = V.plan_snapshot_files(spark, root, stat_filter={"ts": (100, 300)})
    kept_files = {f for fs in kept.values() for f in fs}
    scanned = {f.split("/zm/")[-1] for f in snap.inputFiles()}
    assert scanned == kept_files
    assert skipped and not (set(skipped) & scanned)


def test_scd4_tables_partition_the_versions(spark):
    rows = {r.table_type: r for r in _q("etl_scd4_history_table")(spark, SF).collect()}
    cur, hist = rows["current"], rows["history"]
    # every user has exactly one current row; history holds the rest
    assert cur.n_rows == cur.n_users
    assert hist.n_users <= cur.n_users
    assert hist.n_rows >= hist.n_users or hist.n_rows == 0
