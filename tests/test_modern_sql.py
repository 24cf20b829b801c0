"""Round-5 modern-SQL tests (recursive CTE + VARIANT)."""

from __future__ import annotations

import math

from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.catalog import load_table

SF = "/root/testdata/sf0.001"


def _rows(spark, name):
    return registry.queries()[name](spark, SF).collect()


def test_recursive_hierarchy_is_complete_binary_tree(spark):
    """parent(n) = (n-1)//2 over 0..N-1 is a complete binary tree:
    depth d holds nodes [2^d - 1, min(2^(d+1) - 1, N) - 1], every node
    reached exactly once."""
    rows = _rows(spark, "sql_recursive_hierarchy")
    n_docs = load_table(spark, SF, "documents").count()
    assert sum(r["n_nodes"] for r in rows) == n_docs
    assert [r["depth"] for r in rows] == list(range(len(rows)))
    assert len(rows) == math.floor(math.log2(n_docs)) + 1
    for r in rows:
        lo = 2 ** r["depth"] - 1
        hi = min(2 ** (r["depth"] + 1) - 1, n_docs)
        assert r["first_node"] == lo
        assert r["last_node"] == hi - 1
        assert r["n_nodes"] == hi - lo


def test_variant_extraction_matches_json_path(spark):
    """VARIANT extraction must agree with the string-parsing path
    (get_json_object) on every group."""
    from pyspark.sql import functions as F

    rows = {r["event_type"]: r for r in _rows(spark, "scalar_variant_props")}
    legacy = {
        r["event_type"]: r
        for r in load_table(spark, SF, "events")
        .select(
            "event_type",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert rows.keys() == legacy.keys()
    for et, r in rows.items():
        assert r["sum_k"] == legacy[et]["sum_k"]
        assert r["n"] == legacy[et]["n"]
