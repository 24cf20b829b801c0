"""Round-69 tests: Theil decomposition, grouped-UDF OLS."""

from __future__ import annotations

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_theil_decomposition_identity_and_bounds(spark):
    (row,) = registry.queries()["agg_theil_decomposition"](spark, SF).collect()
    # decomposition identity is exact by construction
    assert row.theil_total_e9 == row.theil_between_e9 + row.theil_within_e9
    # Theil T is non-negative (up to per-term quantization slack)
    assert row.theil_total_e9 >= -row.n_customers  # 1e-9 slack per term
    assert row.theil_within_e9 >= -row.n_customers
    assert row.n_groups >= 2
    assert row.n_customers > 0


def test_udf_ols_matches_sql_twin_exactly(spark):
    udf_rows = registry.queries()["udf_grouped_ols_trend"](spark, SF).collect()
    assert udf_rows
    import duckdb

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    oracle = registry._REGISTRY["udf_grouped_ols_trend"].oracle
    sql_rows = con.sql(oracle).fetchall()
    assert [(r.symbol, r.n_days, r.slope_e6, r.r2_e6) for r in udf_rows] == sql_rows
    for r in udf_rows:
        assert 0 <= r.r2_e6 <= 1_000_000
