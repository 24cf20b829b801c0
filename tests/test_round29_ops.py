"""Round-29 tests: best-of-n curve, MoE load balance, equal-weight index."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_best_of_n_curve_monotone(spark):
    rows = registry.queries()["rlhf_best_of_n_curve"](spark, SF).collect()
    assert [r.n for r in rows] == [1, 2, 4, 8]
    means = [r.mean_best_reward for r in rows]
    assert means == sorted(means), "E[max of n] must grow with n"
    for r in rows:
        assert r.n_blocks >= 1


def test_moe_aux_loss_floor_at_uniform(spark):
    from us_stock_data_pipeline_spark.queries.llm_ops28 import _MOE_EXPERTS

    rows = registry.queries()["moe_load_balance_audit"](spark, SF).collect()
    assert len(rows) == _MOE_EXPERTS
    total_share = sum(r.load_share_e6 for r in rows)
    assert abs(total_share - 1_000_000) < _MOE_EXPERTS  # floor remainders
    # entropy sum <= ln(E); aux loss sum >= 1 (both in 1e-6 units,
    # with slack for quantization)
    ent = sum(r.entropy_term_e6 for r in rows)
    assert ent <= math.log(_MOE_EXPERTS) * 1e6 + _MOE_EXPERTS
    aux = sum(r.aux_loss_term_e6 for r in rows)
    assert aux >= 1_000_000 - 2 * _MOE_EXPERTS * 1000


def test_index_log_chain_is_exact_cumsum(spark):
    rows = registry.queries()["bars_equal_weight_index"](spark, SF).collect()
    assert rows
    acc = 0
    for r in rows:  # already ordered by day
        acc += r.mkt_logret_e6
        assert r.log_index_e6 == acc
        want_level = math.floor(math.exp(acc / 1e6) * 100 * 1000 + 0.5)
        assert r.index_milli == want_level
        assert r.above_base == (1 if acc >= 0 else 0)
