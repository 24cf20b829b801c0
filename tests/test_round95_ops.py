"""Round-95 tests: SCD Type 3, multi-key blocking union."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_scd3_matches_bruteforce(spark):
    rows = registry.queries()["etl_scd3_prior_value"](spark, SF).collect()
    assert rows
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "event_type", "ts", "event_id")
        .collect()
    )
    per = defaultdict(list)
    for r in ev:
        per[r.user_id].append((r.ts, r.event_id, r.event_type))
    assert len(rows) == len(per)
    for r in rows:
        seq = sorted(per[r.user_id], reverse=True)
        cur = seq[0][2]
        prior = next((t for _, _, t in seq if t != cur), None)
        assert r.current_type == cur
        assert r.prior_type == prior
        assert r.has_prior == (0 if prior is None else 1)


def test_multiblock_pairs_verified(spark):
    rows = registry.queries()["dedup_multiblock_union"](spark, SF).collect()
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }

    def lev(a, b):
        n, m = len(a), len(b)
        prev = list(range(m + 1))
        for i in range(1, n + 1):
            cur = [i] + [0] * m
            for j in range(1, m + 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (a[i - 1] != b[j - 1]),
                )
            prev = cur
        return prev[m]

    for r in rows:
        a, b = docs[r.id_a][:300], docs[r.id_b][:300]
        assert r.id_a < r.id_b
        assert r.edit_dist == lev(a, b)
        assert r.edit_dist <= 25
        assert abs(len(docs[r.id_a]) - len(docs[r.id_b])) <= 25
    # and the blocking actually surfaces duplicates on this fixture
    assert rows
