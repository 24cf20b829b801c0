"""Round-98 LLM ops, part 33: Dunning log-likelihood collocations and
Bowley quartile skewness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.functions import detmath
from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Dunning log-likelihood (G^2) bigram collocations
# --------------------------------------------------------------------------

_G2_TOPK = 20

_G2_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
bigrams AS (
  SELECT a.w AS w1, b.w AS w2
  FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM bigrams),
pair_n AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS k11 FROM bigrams GROUP BY w1, w2
),
left_n AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bigrams GROUP BY w1),
right_n AS (SELECT w2, CAST(count(*) AS BIGINT) AS c2 FROM bigrams GROUP BY w2),
cells AS (
  SELECT p.w1, p.w2, p.k11,
         l.c1 - p.k11 AS k12, r.c2 - p.k11 AS k21,
         t.n - l.c1 - r.c2 + p.k11 AS k22, t.n AS n
  FROM pair_n p
  JOIN left_n l ON l.w1 = p.w1
  JOIN right_n r ON r.w2 = p.w2
  CROSS JOIN tot t
),
-- G^2 = 2 * sum O ln(O n / (row_tot * col_tot)); ln of each cell's
-- integer-product ratio comes from the libm-free detmath kernel
-- (bit-identical in both engines — transcendental audit r9), and zero
-- cells contribute zero by limit via the CASE guards.
scored AS (
  SELECT w1, w2, k11, {{G2_EXPR}} AS g2_micro
  FROM {{G2_STAGED_CELLS}}
)
SELECT w1, w2, k11 AS pair_count, g2_micro,
       CAST(row_number() OVER (ORDER BY g2_micro DESC, w1, w2) AS BIGINT) AS rnk
FROM scored
QUALIFY rnk <= {_G2_TOPK}
ORDER BY rnk
"""

# det_ln of each cell's O*n / (rowtot*coltot) ratio: integer products
# stay inside BIGINT (k, n <= corpus bigram count; ~1e6 * 1e6 max).
_G2_STAGES = (
    detmath.det_ln_ratio_stages("k11 * n", "(k11 + k12) * (k11 + k21)", "lr11")
    + detmath.det_ln_ratio_stages("k12 * n", "(k11 + k12) * (k12 + k22)", "lr12")
    + detmath.det_ln_ratio_stages("k21 * n", "(k21 + k22) * (k11 + k21)", "lr21")
    + detmath.det_ln_ratio_stages("k22 * n", "(k21 + k22) * (k12 + k22)", "lr22")
)
_G2_EXPR = (
    "CAST(floor(2000000.0 * ("
    "  CASE WHEN k11 > 0 THEN k11 * lr11 ELSE 0.0 END"
    " + CASE WHEN k12 > 0 THEN k12 * lr12 ELSE 0.0 END"
    " + CASE WHEN k21 > 0 THEN k21 * lr21 ELSE 0.0 END"
    " + CASE WHEN k22 > 0 THEN k22 * lr22 ELSE 0.0 END"
    ") + 0.5) AS BIGINT)"
)
_G2_ORACLE = _G2_ORACLE.replace("{G2_EXPR}", _G2_EXPR).replace(
    "{G2_STAGED_CELLS}", detmath.stages_to_select(_G2_STAGES, "cells")
)


@register("text_dunning_collocations", oracle=_G2_ORACLE, tags=("text", "llm"))
def text_dunning_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunning log-likelihood (G^2) bigram collocations over the
    corpus: the 2x2 contingency table of each adjacent word pair
    scored by 2 sum O ln(O/E) — THE collocation statistic for sparse
    counts, because unlike PMI (`text_pmi_cooccurrence`, which
    explodes for rare pairs seen once) G^2 weights evidence by volume
    and stays chi-square distributed down to tiny cells. Top
    {_G2_TOPK} pairs by score. Exactness: all four contingency cells
    derive from three exact count aggregates (pair, left-marginal,
    right-marginal — no second corpus pass); each cell's O ln(O n /
    rowtot coltot) term quantizes micro before the 4-term sum. Plan:
    one explode + posexplode-style self-join for adjacency, three
    map-side-combinable groupBys over the bigram table, a broadcast
    scalar total, and one top-k window over the pair support."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    b = toks.select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pos_b"), F.col("w").alias("w2")
    )
    bigrams = toks.join(
        b, (F.col("doc_b") == F.col("doc_id")) & (F.col("pos_b") == F.col("pos") + 1)
    ).select(F.col("w").alias("w1"), "w2")
    registry.track_persist(bigrams)
    tot = bigrams.agg(F.count(F.lit(1)).cast("long").alias("n"))
    pair_n = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("k11"))
    left_n = bigrams.groupBy("w1").agg(F.count(F.lit(1)).cast("long").alias("c1"))
    right_n = bigrams.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("c2"))
    cells = (
        pair_n.join(left_n, "w1")
        .join(right_n, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "k11",
            (F.col("c1") - F.col("k11")).alias("k12"),
            (F.col("c2") - F.col("k11")).alias("k21"),
            (F.col("n") - F.col("c1") - F.col("c2") + F.col("k11")).alias("k22"),
            "n",
        )
    )

    scored = detmath.apply_stages(cells, _G2_STAGES).selectExpr(
        "w1", "w2", "k11 AS pair_count", f"{_G2_EXPR} AS g2_micro"
    )
    w_rank = Window.orderBy(F.col("g2_micro").desc(), "w1", "w2")
    return (
        scored.select("*", F.row_number().over(w_rank).cast("long").alias("rnk"))
        .filter(F.col("rnk") <= _G2_TOPK)
        .orderBy("rnk")
    )


# --------------------------------------------------------------------------
# Bowley quartile skewness of order values per segment
# --------------------------------------------------------------------------

_BOWLEY_ORACLE = """
WITH vals AS (
  SELECT c.c_mktsegment AS segment,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS v
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
),
ranked AS (
  SELECT segment, v,
         row_number() OVER (PARTITION BY segment ORDER BY v) AS rn,
         count(*) OVER (PARTITION BY segment) AS n
  FROM vals
),
-- exact type-1 (ceil) quartiles: Q_p = the ceil(p*n)-th order statistic,
-- an integer convention both engines can pin without interpolation
qs AS (
  SELECT segment,
         max(CASE WHEN rn = (n + 3) // 4 THEN v END) AS q1,
         max(CASE WHEN rn = (n + 1) // 2 THEN v END) AS q2,
         max(CASE WHEN rn = (3 * n + 1) // 4 THEN v END) AS q3,
         max(n) AS n
  FROM ranked
  WHERE rn IN ((n + 3) // 4, (n + 1) // 2, (3 * n + 1) // 4)
  GROUP BY segment
)
SELECT segment, CAST(n AS BIGINT) AS n_orders,
       CAST(q1 AS BIGINT) AS q1_cents, CAST(q2 AS BIGINT) AS q2_cents,
       CAST(q3 AS BIGINT) AS q3_cents,
       -- Bowley = (Q3 + Q1 - 2 Q2)/(Q3 - Q1), milli-quantized; negative
       -- numerators pair truncating div with // safely via CASE sign
       CAST(floor(CAST(q3 + q1 - 2 * q2 AS DOUBLE) / (q3 - q1) * 1000 + 0.5)
         AS BIGINT) AS bowley_milli
FROM qs
ORDER BY segment
"""


@register("agg_bowley_skewness", oracle=_BOWLEY_ORACLE, tags=("stats", "agg"))
def agg_bowley_skewness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bowley (quartile) skewness of order values per segment:
    (Q3 + Q1 - 2 Q2)/(Q3 - Q1) in [-1, 1] — the robust skewness that
    one billionaire order cannot move, where the third-moment skew of
    `agg_higher_moments` is cubic in outliers. Quartiles pin to the
    exact type-1 convention (the ceil(p n)-th order statistic — a real
    data value, no interpolation, so cross-engine equality is exact
    integer equality). The assembly is one pinned double division
    quantized to milli. Plan: one ranking window per segment; at 100
    TB the same statistic comes from the two-pass histogram-pruned
    order statistics of `agg_median_two_pass` — this op pins the
    semantics, that one the scale plan."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    vals = c.join(o, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
    )
    w_rank = Window.partitionBy("segment").orderBy("v")
    w_all = Window.partitionBy("segment")
    ranked = vals.select(
        "segment",
        "v",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    r1 = F.expr("(n + 3) div 4")
    r2 = F.expr("(n + 1) div 2")
    r3 = F.expr("(3 * n + 1) div 4")
    qs = (
        ranked.filter((F.col("rn") == r1) | (F.col("rn") == r2) | (F.col("rn") == r3))
        .groupBy("segment")
        .agg(
            F.max(F.when(F.col("rn") == r1, F.col("v"))).alias("q1"),
            F.max(F.when(F.col("rn") == r2, F.col("v"))).alias("q2"),
            F.max(F.when(F.col("rn") == r3, F.col("v"))).alias("q3"),
            F.max("n").alias("n"),
        )
    )
    return qs.select(
        "segment",
        F.col("n").cast("long").alias("n_orders"),
        F.col("q1").cast("long").alias("q1_cents"),
        F.col("q2").cast("long").alias("q2_cents"),
        F.col("q3").cast("long").alias("q3_cents"),
        F.floor(
            (F.col("q3") + F.col("q1") - 2 * F.col("q2")).cast("double")
            / (F.col("q3") - F.col("q1"))
            * 1000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("bowley_milli"),
    ).orderBy("segment")
