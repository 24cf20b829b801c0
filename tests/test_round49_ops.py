"""Round-49 tests: recursive lookup, null ordering."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_recursive_lookup_reads_every_file_once(spark):
    rows = registry.queries()["source_recursive_lookup"](spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    want = {
        r.event_type: (r.n, r.c)
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("c"),
        )
        .collect()
    }
    got = {r.event_type: (r.n_events, r.total_cents) for r in rows}
    assert got == want


def test_null_ordering_offset_is_null_count(spark):
    rows = registry.queries()["sort_null_ordering_pin"](spark, SF).collect()
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    n_null = cust.filter("c_acctbal < 0").count()
    for r in rows:
        if r.pos_bal is not None:
            # non-null rows shift down by exactly the null block size
            assert r.rank_nf == r.rank_nl + n_null, r.c_custkey
        else:
            assert r.rank_nf < r.rank_nl
