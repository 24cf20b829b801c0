"""Round-21 tests: Bradley-Terry, IPF raking, split adjustment."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_stock_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


def test_bradley_terry_strengths_order_by_winrate_roughly(spark):
    rows = registry.queries()["rlhf_bradley_terry"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.wins <= r.games
        assert r.strength_e6 >= 0
    # an undefeated-vs-winless sanity: the best win-rate supplier must
    # outrank the worst win-rate supplier in BT strength
    by_rate = sorted(rows, key=lambda r: r.wins / r.games)
    assert by_rate[-1].strength_e6 > by_rate[0].strength_e6


def test_bradley_terry_matches_python_mm(spark):
    rows = {r.suppkey: r for r in registry.queries()["rlhf_bradley_terry"](spark, SF).collect()}
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select(
            "l_orderkey",
            "l_suppkey",
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("ext"),
        )
        .collect()
    )
    from collections import defaultdict

    by_order = defaultdict(list)
    for r in li:
        by_order[r.l_orderkey].append((r.l_suppkey, r.ext))
    nwin = defaultdict(int)
    for lines in by_order.values():
        for sa, ea in lines:
            for sb, eb in lines:
                if sa != sb and ea > eb:
                    nwin[(sa, sb)] += 1
    g = defaultdict(int)
    w = defaultdict(int)
    for (i, j), n in nwin.items():
        g[(i, j)] += n
        g[(j, i)] += n
        w[i] += n
    supps = {i for i, _ in g}
    gtot = {i: sum(n for (a, _), n in g.items() if a == i) for i in supps}
    s1 = {i: 2_000_000 * w[i] // gtot[i] for i in supps}
    d = defaultdict(int)
    for (i, j), n in g.items():
        if s1[i] + s1[j] > 0:
            d[i] += n * 10**12 // (s1[i] + s1[j])
    for i in supps:
        if d[i] > 0:
            assert rows[i].strength_e6 == w[i] * 10**12 // d[i], i
            assert rows[i].wins == w[i]
            assert rows[i].games == gtot[i]


def test_ipf_converges_marginals(spark):
    df = registry.queries()["corpus_raking_ipf"](spark, SF)
    rows = df.collect()
    assert rows
    from collections import defaultdict

    row_mass = defaultdict(int)
    col_mass = defaultdict(int)
    total = sum(r.n_docs for r in rows)
    for r in rows:
        row_mass[r.source] += r.weighted_mass_e6
        col_mass[r.lang] += r.weighted_mass_e6
    n_src = len(row_mass)
    n_lang = len(col_mass)
    # after two sweeps the LAST-scaled axis (lang) must sit within
    # quantization error of its target; rows are near-converged
    col_target = (total // n_lang) * 1_000_000
    for lang, m in col_mass.items():
        assert abs(m - col_target) / col_target < 0.01, (lang, m, col_target)
    row_target = (total // n_src) * 1_000_000
    for src, m in row_mass.items():
        assert abs(m - row_target) / row_target < 0.25, (src, m, row_target)


def test_split_adjustment_boundary_jump(spark):
    rows = registry.queries()["etl_split_adjustment"](spark, SF).collect()
    assert rows
    import datetime

    d1 = datetime.date(2024, 2, 15)
    d2 = datetime.date(2024, 4, 1)
    for r in rows:
        even = len(r.symbol) % 2 == 0
        a = 1 if (even and r.day < d1) else 0
        b = 1 if r.day < d2 else 0
        assert r.n_splits_after == a + b, r
        want = r.close_cents * 1000 * (2**b) // ((2**a) * (3**b))
        assert r.adj_close_milli == want, r
        # after all splits the adjusted price equals the raw price
        if r.day >= d2:
            assert r.adj_close_milli == r.close_cents * 1000
