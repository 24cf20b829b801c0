"""Plan-shape assertions for round-8 operators: runtime bloom-filter
injection, Z-order clustering effectiveness, basket-join strategy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture
def bloom_conf(spark):
    """Lower the injection size thresholds (defaults assume 10 GB scans)
    so the optimizer is WILLING to inject on fixture-sized tables; the
    decision logic itself is what we assert."""
    keys = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "1GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        # At fixture size the filtered orders side is broadcastable and
        # Spark (correctly) skips the bloom — a broadcast join already
        # prunes row-level. Disabling auto-broadcast emulates at-scale
        # statistics, where orders is shuffle-bound and the bloom is
        # exactly the optimization that matters.
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {}
    for k, v in keys.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is not None:
            spark.conf.set(k, v)


def test_runtime_bloom_filter_injected(spark, bloom_conf):
    """With thresholds permitting, the selective orders predicate must
    inject a bloom/semi-join runtime filter into the lineitem side —
    visible as might_contain (bloom) in the optimized plan."""
    from us_stock_data_pipeline_spark.queries.round8_ops3 import (
        join_runtime_bloom_filter,
    )

    df = join_runtime_bloom_filter(spark, SF_DIR)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" in optimized or "bloom_filter_agg" in optimized, optimized[:2000]


def test_zorder_buckets_tighter_than_single_sort(spark):
    """The Morton layout's per-bucket bounding boxes must be tight in
    BOTH dimensions simultaneously: total bbox area across the 16
    buckets well under the naive single-column-sort layout, whose
    buckets span the full 1024 range of the second dimension."""
    from us_stock_data_pipeline_spark.queries.round8_ops import (
        etl_zorder_clustering,
    )

    # sf0.1: the part-key domain covers the full 1024 range, so all 16
    # z-range buckets materialize (smaller fixtures fill fewer).
    rows = etl_zorder_clustering(spark, "/root/testdata/sf0.1").collect()
    assert len(rows) == 16
    # each z-range bucket covers a 256x256 quadrant region of the
    # 1024x1024 key grid (20-bit z div 2^16 fixes the top 4 bits = 2
    # bits per dimension), so every bbox is at most ~256x256 + edges
    for r in rows:
        assert r.px_max - r.px_min + 1 <= 256
        assert r.sx_max - r.sx_min + 1 <= 256
    # THE z-order win is per-dimension tightness, not total area (total
    # bbox area is ~invariant across layouts): under a single-column
    # sort on px, EVERY bucket spans the full 1024 sx range, so a
    # predicate on sx alone prunes nothing. Under z-order each bucket
    # sits in one 256-wide sx quadrant, so an sx-quadrant predicate
    # hits exactly 4 of 16 buckets — 75% of files skipped.
    for lo in (0, 256, 512, 768):
        overlapping = [
            r for r in rows if r.sx_min <= lo + 255 and r.sx_max >= lo
        ]
        assert len(overlapping) == 4, (lo, len(overlapping))


def test_soft_dedup_join_is_shuffle_on_fp(spark):
    """corpus_soft_dedup_weights joins the corpus back to its cluster
    sizes on the fingerprint — at scale NEITHER side is broadcastable
    (cluster count ~ corpus size), so the plan must be a shuffle join
    co-partitioned on fp, not a broadcast of a corpus-sized side."""
    from us_stock_data_pipeline_spark.queries.round8_ops3 import (
        corpus_soft_dedup_weights,
    )

    df = corpus_soft_dedup_weights(spark, SF_DIR)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    # the logical plan must not carry a broadcast HINT on either side;
    # whether AQE picks broadcast at fixture size is stats-driven and fine
    assert "UnresolvedHint" not in optimized and "hint" not in optimized.lower()


def test_target_encoding_single_fact_pass(spark):
    """ml_target_encoding_kfold must broadcast the two aggregate
    lookup tables back onto the fact rows (category dim is 50 rows,
    category x fold is 250) — one shuffle-free enrichment pass, never
    a per-fold re-aggregation of the table."""
    from us_stock_data_pipeline_spark.queries.round8_ops4 import (
        ml_target_encoding_kfold,
    )

    df = ml_target_encoding_kfold(spark, SF_DIR)
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert physical.count("BroadcastHashJoin") >= 2
    # the lineitem scan appears once per aggregate + once for the fact
    # pass — but never 5x (one per fold), which is the naive shape
    assert physical.count("Scan parquet") <= 4


def test_black_scholes_single_symbol_shuffle(spark):
    """finance_black_scholes is one daily rollup + one lag window + one
    moment aggregate: every exchange hashes on the symbol axis; there
    must be no join and no extra non-symbol exchange before the final
    tiny sort."""
    from us_stock_data_pipeline_spark.queries.round8_ops import (
        finance_black_scholes,
    )

    df = finance_black_scholes(spark, SF_DIR)
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in physical
    import re

    exchanges = re.findall(r"Exchange (\w+)\(([^)]*)\)", physical)
    for kind, args in exchanges:
        if kind == "hashpartitioning":
            # the symbol axis appears pre-alias as event_type in the
            # daily-rollup exchange
            assert "symbol" in args or "event_type" in args, (kind, args)


def test_wav_decode_plan_stays_arrow(spark):
    """The WAV pipeline must be scan -> two ArrowEvalPython-free
    mapInPandas stages -> one aggregate; payload bytes never hit a
    collect or a row-wise Python UDF."""
    from us_stock_data_pipeline_spark.queries.round8_ops import (
        multimodal_wav_pcm_decode,
    )

    df = multimodal_wav_pcm_decode(spark, SF_DIR)
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert physical.count("MapInPandas") == 2
    assert "BatchEvalPython" not in physical  # no row-at-a-time Python
