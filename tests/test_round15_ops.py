"""Round-15 operator tests: allocation conservation, index ordering,
BFS frontier structure, EOQ bounds."""

from __future__ import annotations

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _rows(spark, name, sf=SF):
    return registry.queries()[name](spark, sf).collect()


def test_lrm_allocation_conserves_pennies(spark):
    from pyspark.sql import functions as F

    rows = _rows(spark, "lineitem_cost_allocation_lrm")
    # total allocated across flags == total freight across orders that
    # have lines (conservation: the whole point of largest remainder)
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey").distinct()
    freight_total = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .agg(F.sum(F.round("o_totalprice").cast("long")).alias("t"))
        .collect()[0]
        .t
    )
    assert sum(r.allocated_cents for r in rows) == freight_total
    for r in rows:
        assert 0 <= r.n_lines_bumped <= r.n_lines


def test_price_index_fisher_between(spark):
    (r,) = _rows(spark, "lineitem_price_index_laspeyres")
    lo, hi = sorted((r.laspeyres, r.paasche))
    # Fisher is the geometric mean: strictly between (or equal)
    assert lo - 0.0002 <= r.fisher <= hi + 0.0002
    assert r.n_parts > 0
    for v in (r.laspeyres, r.paasche, r.fisher):
        assert 0.5 < v < 2.0  # sane index band for stable prices


def test_bfs_hops_alternate_types(spark):
    rows = {r.hop: r for r in _rows(spark, "graph_bfs_reachability")}
    assert rows[0].node_type == "supplier" and rows[0].n_nodes == 1
    for hop, r in rows.items():
        assert r.node_type == ("supplier" if hop % 2 == 0 else "part")
        assert r.n_nodes >= 1


def test_bfs_monotone_reachability(spark):
    rows = {r.hop: r.n_nodes for r in _rows(spark, "graph_bfs_reachability")}
    # hop-2 suppliers can't exceed hot-cap x hop-1 parts
    if 2 in rows and 1 in rows:
        assert rows[2] <= rows[1] * 40


def test_eoq_bounds(spark):
    for r in _rows(spark, "orders_economic_order_quantity"):
        assert r.n_parts > 0
        assert r.median_eoq_milli > 0
        assert 0 <= r.n_multi_order_parts <= r.n_parts
