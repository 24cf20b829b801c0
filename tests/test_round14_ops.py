"""Round-14 operator tests: UDF-tier equivalence, SQL-sugar
equivalence, XML roundtrip, sketch accuracy and mergeability."""

from __future__ import annotations

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def _rows(spark, name, sf=SF):
    return registry.queries()[name](spark, sf).collect()


def test_arrow_udf_matches_sql_expression(spark):
    from pyspark.sql import functions as F

    rows = {r.l_returnflag: r.net_cents for r in _rows(spark, "udf_arrow_optimized")}
    li = spark.read.parquet(f"{SF}/lineitem.parquet").filter(
        F.col("l_shipdate") >= "1996-01-01"
    )
    sql_side = (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(
                F.expr(
                    "CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax)"
                    " * 100 + 0.5) AS BIGINT)"
                )
            ).alias("nc")
        )
        .collect()
    )
    assert rows == {r.l_returnflag: r.nc for r in sql_side}


def test_map_in_arrow_no_pandas_boxing(spark):
    rows = _rows(spark, "udf_map_in_arrow")
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    by_id = {d.doc_id: d.text for d in docs}
    assert len(rows) == len(docs)
    for r in rows[:50]:
        t = by_id[r.doc_id]
        assert r.n_bytes == len(t.encode("utf-8"))
        assert r.n_e == t.count("e")


def test_identifier_and_static_agree(spark):
    from pyspark.sql import functions as F

    rows = {r.o_orderpriority: r.total_cents for r in _rows(spark, "sql_identifier_clause")}
    o = spark.read.parquet(f"{SF}/orders.parquet")
    static = (
        o.groupBy("o_orderpriority")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("t"))
        .collect()
    )
    assert rows == {r.o_orderpriority: r.t for r in static}


def test_lateral_alias_chain_consistent(spark):
    for r in _rows(spark, "sql_lateral_column_alias"):
        assert r.net_dollars == r.net_cents // 100


def test_collation_ci_is_half_of_cs(spark):
    for r in _rows(spark, "scalar_collation"):
        # names are upper-cased in the fixture; the lowercase twin makes
        # every name 2 case variants -> ci distinct = cs distinct / 2
        assert r.n_cs_distinct == 2 * r.n_ci_distinct
        assert r.n_variants == r.n_cs_distinct  # names unique per row


def test_xml_roundtrip_lossless(spark):
    for r in _rows(spark, "source_xml_roundtrip"):
        assert r.n_roundtrip_mismatch == 0
        assert r.parsed_cents > 0


def test_hll_union_row_present_and_consistent(spark):
    rows = {r.grp: r for r in _rows(spark, "agg_hll_native_sketch")}
    assert "ALL" in rows
    per = [r for g, r in rows.items() if g != "ALL"]
    # union of per-group distinct customers >= any group, <= sum
    assert max(r.n_exact for r in per) <= rows["ALL"].n_exact <= sum(r.n_exact for r in per)
    for r in rows.values():
        assert r.est_within_5pct == 1
