"""Round-96 tests: fixed-width parsing, count-distinct-over-window."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_fixed_width_roundtrip_lossless(spark):
    rows = registry.queries()["source_fixed_width_parse"](spark, SF).collect()
    assert rows
    ev = spark.read.parquet(f"{SF}/events.parquet")
    exp = {
        r.event_type: (r.n, r.mn, r.mx, r.cents)
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("user_id").alias("mn"),
            F.max("user_id").alias("mx"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .collect()
    }
    got = {r.event_type: (r.n_rows, r.min_user, r.max_user, r.value_cents) for r in rows}
    assert got == exp


def test_fixed_width_line_layout(spark):
    # the staged file really is fixed width: every line exactly 40 chars
    from us_stock_data_pipeline_spark.queries.source_formats9 import _stage_fixed_width

    path = _stage_fixed_width(spark, SF)
    lens = (
        spark.read.text(path)
        .select(F.length("value").alias("n"))
        .distinct()
        .collect()
    )
    assert [r.n for r in lens] == [40]


def test_window_count_distinct_matches_bruteforce(spark):
    rows = registry.queries()["window_count_distinct_rewrite"](spark, SF).collect()
    assert rows
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "event_type", "ts", "event_id")
        .collect()
    )
    per = defaultdict(list)
    for r in ev:
        per[r.user_id].append((r.ts, r.event_id, r.event_type))
    expected = {}
    for u, seq in per.items():
        seen = set()
        for i, (_, _, t) in enumerate(sorted(seq), start=1):
            seen.add(t)
            if i <= 5:
                expected[(u, i)] = len(seen)
    assert len(rows) == len(expected)
    for r in rows:
        assert expected[(r.user_id, r.event_seq)] == r.distinct_types_so_far
        # cumulative distinct count is monotone and bounded by seq
        assert 1 <= r.distinct_types_so_far <= r.event_seq
