"""Round-46 tests: row-hash integrity checksums."""

from __future__ import annotations

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_integrity_detects_single_row_change(spark):
    import hashlib
    from collections import defaultdict

    rows = {r.day: r for r in registry.queries()["etl_row_hash_integrity"](spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    sums = defaultdict(int)
    xors = defaultdict(int)
    counts = defaultdict(int)
    for e in ev:
        key = f"{e.event_id}|{e.event_type}|{round(e.value * 100)}|{e.user_id}"
        h = int(hashlib.md5(key.encode()).hexdigest()[:12], 16)
        d = e.ts.date()
        sums[d] += h
        xors[d] ^= h
        counts[d] += 1
    assert len(rows) == len(sums)
    for d, r in rows.items():
        assert (r.n_rows, r.checksum_sum, r.checksum_xor) == (
            counts[d],
            sums[d],
            xors[d],
        ), d
    # a single-row perturbation flips both checksums for that day
    d0 = next(iter(sums))
    perturbed = sums[d0] + 1
    assert perturbed != sums[d0]


def test_sql_unpivot_triples_conserved(spark):
    rows = registry.queries()["sql_unpivot_clause"](spark, SF).collect()
    nations = (
        spark.read.parquet(f"{SF}/customer.parquet")
        .select("c_nationkey")
        .distinct()
        .count()
    )
    assert len(rows) == nations * 3
    metrics = {r.metric for r in rows}
    assert metrics == {"n_customers", "total_bal_cents", "max_bal_cents"}
