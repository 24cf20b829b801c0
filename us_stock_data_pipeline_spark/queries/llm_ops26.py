"""Round-21 LLM ops, part 26: Bradley-Terry preference-strength fitting
and iterative proportional fitting (IPF raking) — the two workhorse
iterative estimators of RLHF reward modeling and corpus reweighting,
both run for a FIXED iteration count with every intermediate quantity
micro-quantized to BIGINT, so the DuckDB oracle hash-matches despite
the algorithms being "iterative float" on paper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Bradley-Terry strengths (2 MM iterations, exact integer arithmetic)
# --------------------------------------------------------------------------

# Hunter (2004) MM update: s_i <- W_i / sum_j g_ij / (s_i + s_j).
# With uniform init the first iteration collapses to s1_i = 2*W_i/G_i
# (quantized to 1e-6); the second evaluates each denominator term as
# the EXACT integer division g_ij * 1e12 div (s1_i + s1_j) — s1 is in
# 1e-6 units, so the term is n/(s_i+s_j) in 1e-6 units and the exact
# integer sum is reduction-order independent. s2 = W*1e12 div D.
_BT_ORACLE = """
WITH prefs AS (
  SELECT a.l_suppkey AS wi, b.l_suppkey AS li, CAST(count(*) AS BIGINT) AS n
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey
   AND a.l_suppkey <> b.l_suppkey
   AND CAST(round(a.l_extendedprice * 100) AS BIGINT)
     > CAST(round(b.l_extendedprice * 100) AS BIGINT)
  GROUP BY 1, 2
),
games AS (
  SELECT i, j, CAST(sum(n) AS BIGINT) AS g FROM (
    SELECT wi AS i, li AS j, n FROM prefs
    UNION ALL
    SELECT li AS i, wi AS j, n FROM prefs
  ) GROUP BY 1, 2
),
wins AS (
  SELECT wi AS i, CAST(sum(n) AS BIGINT) AS w FROM prefs GROUP BY 1
),
s1 AS (
  SELECT g.i,
         coalesce(w.w, 0) AS w,
         CAST(sum(g.g) AS BIGINT) AS gtot,
         CAST(2000000 * coalesce(w.w, 0) // sum(g.g) AS BIGINT) AS s1_e6
  FROM games g LEFT JOIN wins w ON w.i = g.i
  GROUP BY g.i, w.w
),
denom AS (
  SELECT g.i,
         CAST(sum(g.g * 1000000000000 // (si.s1_e6 + sj.s1_e6)) AS BIGINT) AS d
  FROM games g
  JOIN s1 si ON si.i = g.i
  JOIN s1 sj ON sj.i = g.j
  WHERE si.s1_e6 + sj.s1_e6 > 0
  GROUP BY g.i
)
SELECT s.i AS suppkey, s.w AS wins, s.gtot AS games,
       CAST(s.w * 1000000000000 // d.d AS BIGINT) AS strength_e6
FROM s1 s JOIN denom d ON d.i = s.i
ORDER BY strength_e6 DESC, suppkey
"""


@register("rlhf_bradley_terry", oracle=_BT_ORACLE, tags=("llm", "rlhf", "ml"), bench=True)
def rlhf_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry preference strengths — the model under every
    pairwise-preference reward fit (RLHF reward models, chatbot-arena
    ratings, ranker calibration) — via two Hunter-MM iterations kept
    EXACT: preferences are within-order supplier duels (the
    higher-priced line "wins"), iteration 1 collapses to
    2e6*W div G under the uniform init, and iteration 2 evaluates
    each MM denominator term as g*1e12 div (s1_i + s1_j) — an exact
    BIGINT per term, so the cross-opponent sum cannot drift with
    reduction order and the whole fit is float-free. Plan: one
    self-join on the order key (<= 7 lines per order bounds the duel
    fan-out), two small aggregates over the supplier-pair table, one
    self-join of the strength vector onto the games table (suppliers
    are a dimension — broadcastable at any corpus scale)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_suppkey",
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("ext"),
        )
        # explicit-width repartition: AQE's byte-based coalescing shrinks
        # this row-small/CPU-heavy self-join to ~3 tasks, serializing the
        # duel fan-out on 3 of 32 cores (driver-round-6: join+agg 2.2s ->
        # 1.3s). An explicit numbered repartition is exempt from AQE
        # coalescing, and the self-join reuses the one exchange.
        .repartition(spark.sparkContext.defaultParallelism, "l_orderkey")
    )
    a, b = li.alias("a"), li.alias("b")
    prefs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") != F.col("b.l_suppkey"))
            & (F.col("a.ext") > F.col("b.ext")),
        )
        .groupBy(F.col("a.l_suppkey").alias("wi"), F.col("b.l_suppkey").alias("li"))
        .agg(F.count("*").cast("long").alias("n"))
        .transform(registry.track_persist)  # feeds games AND wins — without this the order-key
        # self-join (the expensive stage) runs twice
    )
    games = (
        prefs.select(F.col("wi").alias("i"), F.col("li").alias("j"), "n")
        .unionAll(prefs.select(F.col("li").alias("i"), F.col("wi").alias("j"), "n"))
        .groupBy("i", "j")
        .agg(F.sum("n").cast("long").alias("g"))
        # feeds s1 AND denom: without the persist the symmetrize+shuffle
        # +aggregate subtree re-executes once per consumer (the executed
        # plan showed it inlined up to 8x across the si/sj broadcasts,
        # denom, and the final join — 2.9s of the query's 3.5s)
        .transform(registry.track_persist)
    )
    wins = prefs.groupBy(F.col("wi").alias("i")).agg(F.sum("n").cast("long").alias("w"))
    s1 = (
        # wins is supplier-sized (dimension cardinality) — broadcast it so
        # the left join needs no shuffle/sort of the games table
        games.join(F.broadcast(wins), "i", "left")
        .groupBy("i", "w")
        .agg(F.sum("g").cast("long").alias("gtot"))
        .select(
            "i",
            F.coalesce(F.col("w"), F.lit(0)).alias("w"),
            "gtot",
            F.expr("CAST(2000000 * coalesce(w, 0) div gtot AS BIGINT)").alias("s1_e6"),
        )
        # feeds si, sj, and the final join — one evaluation, three readers
        .transform(registry.track_persist)
    )
    si = s1.select(F.col("i"), F.col("s1_e6").alias("si_e6"))
    sj = s1.select(F.col("i").alias("j"), F.col("s1_e6").alias("sj_e6"))
    denom = (
        games.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .filter(F.col("si_e6") + F.col("sj_e6") > 0)
        .groupBy("i")
        .agg(
            F.sum(F.expr("g * 1000000000000 div (si_e6 + sj_e6)"))
            .cast("long")
            .alias("d")
        )
    )
    return (
        # denom is supplier-sized; broadcast avoids a sort-merge join of
        # two tiny aggregates (each side below any sane shuffle payoff)
        s1.join(F.broadcast(denom), "i")
        .select(
            F.col("i").alias("suppkey"),
            F.col("w").alias("wins"),
            F.col("gtot").alias("games"),
            F.expr("CAST(w * 1000000000000 div d AS BIGINT)").alias("strength_e6"),
        )
        .orderBy(F.col("strength_e6").desc(), "suppkey")
    )


# --------------------------------------------------------------------------
# IPF raking (2 full row+column iterations, quantized scaling factors)
# --------------------------------------------------------------------------

_IPF_ORACLE = """
WITH cells AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1, 2
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS total,
         CAST(count(DISTINCT source) AS BIGINT) AS n_src,
         CAST(count(DISTINCT lang) AS BIGINT) AS n_lang
  FROM cells
),
-- uniform targets: every source row and every lang column should carry
-- an equal share of the corpus (integer floor; the residual pennies
-- stay unallocated, which raking tolerates)
w0 AS (
  SELECT c.source, c.lang, c.n, t.total, t.n_src, t.n_lang,
         CAST(1000000 AS BIGINT) AS w
  FROM cells c CROSS JOIN tot t
),
r1 AS (  -- row scaling: w *= target_row / current_row_mass
  SELECT source, lang, n, total, n_src, n_lang,
         CAST(w * ((total // n_src) * 1000000 * 1000000 // sum(n * w) OVER (PARTITION BY source))
              // 1000000 AS BIGINT) AS w
  FROM w0
),
c1 AS (  -- column scaling
  SELECT source, lang, n, total, n_src, n_lang,
         CAST(w * ((total // n_lang) * 1000000 * 1000000 // sum(n * w) OVER (PARTITION BY lang))
              // 1000000 AS BIGINT) AS w
  FROM r1
),
r2 AS (
  SELECT source, lang, n, total, n_src, n_lang,
         CAST(w * ((total // n_src) * 1000000 * 1000000 // sum(n * w) OVER (PARTITION BY source))
              // 1000000 AS BIGINT) AS w
  FROM c1
),
c2 AS (
  SELECT source, lang, n, total, n_src, n_lang,
         CAST(w * ((total // n_lang) * 1000000 * 1000000 // sum(n * w) OVER (PARTITION BY lang))
              // 1000000 AS BIGINT) AS w
  FROM r2
)
SELECT source, lang, n AS n_docs, w AS weight_e6,
       CAST(n * w AS BIGINT) AS weighted_mass_e6
FROM c2
ORDER BY source, lang
"""


@register("corpus_raking_ipf", oracle=_IPF_ORACLE, tags=("llm", "sampling"))
def corpus_raking_ipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative proportional fitting (raking): rescale per-(source,
    lang) sampling weights until BOTH marginals hit their targets — the
    standard way to reweight a training corpus to a target source mix
    AND a target language mix simultaneously (neither marginal alone
    can fix the other's skew). Two full row+column Sinkhorn sweeps,
    uniform targets (total div n_sources per row, total div n_langs
    per column), every scaling factor computed as an exact BIGINT
    ratio in 1e-6 units and every weight re-quantized after each
    sweep, so the fixed-point prefix both engines compute is
    bit-identical. The cell table is O(sources x languages) — after
    the single corpus-wide groupBy, the iterations cost nothing at
    any scale, which is exactly why raking is THE production corpus
    mixer. Window sums over the cell table implement the marginal
    masses without a join per sweep."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("source", "lang").agg(F.count("*").cast("long").alias("n"))
    tot = cells.agg(
        F.sum("n").cast("long").alias("total"),
        F.countDistinct("source").cast("long").alias("n_src"),
        F.countDistinct("lang").cast("long").alias("n_lang"),
    )
    w = cells.crossJoin(F.broadcast(tot)).withColumn("w", F.lit(1_000_000).cast("long"))
    for axis_col, target_expr in (
        ("source", "total div n_src"),
        ("lang", "total div n_lang"),
        ("source", "total div n_src"),
        ("lang", "total div n_lang"),
    ):
        w = w.withColumn(
            "w",
            F.expr(
                f"CAST(w * (({target_expr}) * 1000000 * 1000000"
                f" div sum(n * w) OVER (PARTITION BY {axis_col}))"
                f" div 1000000 AS BIGINT)"
            ),
        )
    return w.select(
        "source",
        "lang",
        F.col("n").alias("n_docs"),
        F.col("w").alias("weight_e6"),
        (F.col("n") * F.col("w")).cast("long").alias("weighted_mass_e6"),
    ).orderBy("source", "lang")
