"""Round-45 tests: normalized dedup, last-digit audit."""

from __future__ import annotations

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_normalized_dedup_counts(spark):
    rows = registry.queries()["dedup_normalized_exact"](spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert 0 < r.n_survivors <= r.n_docs
        assert r.n_in_dup_groups <= r.n_docs


def test_normalization_collapses_reformatting(spark):
    """Case and whitespace variants must share a normalized hash."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("The  Quick\tBrown Fox ",), ("the quick brown fox",)], "text string"
    ).select(
        F.md5(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))).alias(
            "h"
        )
    )
    hashes = {r.h for r in df.collect()}
    assert len(hashes) == 1


def test_last_digit_chisq_terms(spark):
    rows = registry.queries()["audit_last_digit_uniformity"](spark, SF).collect()
    assert len(rows) == 10
    total = sum(r.n for r in rows)
    for r in rows:
        want = (10 * r.n - total) ** 2 * 1000 // (100 * total)
        assert r.chisq_term_e3 == want
