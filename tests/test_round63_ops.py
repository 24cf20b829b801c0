"""Round-63 tests: CSV dialect roundtrip, LOO rolling mean."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_csv_dialect_counts_match_customer_table(spark):
    (row,) = registry.queries()["source_csv_dialect"](spark, SF).collect()
    cust = spark.read.parquet(f"{SF}/customer.parquet").collect()
    assert row.n_rows == len(cust)
    assert row.sum_custkey == sum(c.c_custkey for c in cust)
    # every note embeds exactly one newline
    assert row.n_multiline_notes == len(cust)
    want_chars = sum(
        len(f'n,{c.c_name}\n"{c.c_custkey}"') for c in cust
    )
    assert row.total_note_chars == want_chars


def test_loo_mean_excludes_current_row(spark):
    rows = registry.queries()["window_loo_rolling_mean"](spark, SF).collect()
    assert rows
    by_sym: dict[str, list] = {}
    for r in rows:
        by_sym.setdefault(r.symbol, []).append(r)
    for sym, rs in by_sym.items():
        rs.sort(key=lambda r: r.day)
        cs = [r.c for r in rs]
        for i, r in enumerate(rs):
            lo, hi = max(0, i - 3), min(len(cs), i + 4)
            neigh = cs[lo:i] + cs[i + 1 : hi]
            assert r.loo_mean_cents == sum(neigh) // len(neigh)
