"""Round-67 analytics, part 66: exact two-feature Shapley R^2
decomposition and Heaps'-law vocabulary growth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Shapley decomposition of regression R^2 over two features
# --------------------------------------------------------------------------

_SHAP_ORACLE = """
WITH obs AS (
  SELECT CAST(l_quantity AS BIGINT) AS q,
         CAST(round(l_discount * 100) AS BIGINT) AS d,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem
),
g AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(q) AS HUGEINT) AS sq, CAST(sum(d) AS HUGEINT) AS sd,
         CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(q * q) AS HUGEINT) AS sqq, CAST(sum(d * d) AS HUGEINT) AS sdd,
         CAST(sum(q * d) AS HUGEINT) AS sqd, CAST(sum(q * y) AS HUGEINT) AS sqy,
         CAST(sum(d * y) AS HUGEINT) AS sdy, CAST(sum(y * y) AS HUGEINT) AS syy
  FROM obs
),
c AS (  -- centered moments (x n), cast to double for the closed forms
  SELECT CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) AS cqq,
         CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE) AS cdd,
         CAST(n AS DOUBLE) * CAST(sqd AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sd AS DOUBLE) AS cqd,
         CAST(n AS DOUBLE) * CAST(sqy AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sy AS DOUBLE) AS cqy,
         CAST(n AS DOUBLE) * CAST(sdy AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sy AS DOUBLE) AS cdy,
         CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS cyy
  FROM g
),
r2 AS (
  SELECT cqy * cqy / (cqq * cyy) AS r2_q,
         cdy * cdy / (cdd * cyy) AS r2_d,
         (cqy * (cdd * cqy - cqd * cdy) + cdy * (cqq * cdy - cqd * cqy))
           / (cyy * (cqq * cdd - cqd * cqd)) AS r2_full
  FROM c
)
SELECT f.feature,
       CAST(floor(CASE f.feature WHEN 'quantity' THEN r2_q ELSE r2_d END
                  * 1000000 + 0.5) AS BIGINT) AS r2_solo_e6,
       CAST(floor(r2_full * 1000000 + 0.5) AS BIGINT) AS r2_full_e6,
       CAST(floor(
         (0.5 * (CASE f.feature WHEN 'quantity' THEN r2_q ELSE r2_d END)
          + 0.5 * (r2_full - (CASE f.feature WHEN 'quantity' THEN r2_d ELSE r2_q END)))
         * 1000000 + 0.5) AS BIGINT) AS shapley_e6
FROM r2 CROSS JOIN (SELECT unnest(['quantity', 'discount']) AS feature) f
ORDER BY f.feature
"""


@register("ml_shapley_r2_features", oracle=_SHAP_ORACLE, tags=("ml", "stats"))
def ml_shapley_r2_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley decomposition of regression R^2 over the two
    price features (quantity, discount): phi_f = mean over orderings
    of f's marginal R^2 contribution — with two features that is the
    closed form 0.5*R2(f) + 0.5*(R2(full) - R2(other)), and the two
    phis sum to R2(full) by construction. Every subset's R^2 comes
    from the SAME single Gram-matrix pass as
    `ml_ridge_normal_equations` (this is why Shapley-on-R^2 is
    tractable at 100 TB when feature counts are small: 2^k closed
    forms over one aggregate, zero refits), evaluated as fixed
    double expressions over exact integer moments
    (`events_shapley_attribution` plays the same game over marketing
    channels). Plan: one map-side-combined aggregate + a 2-row
    constant fan-out."""
    li = load_table(spark, sf_dir, "lineitem")
    obs = li.select(
        F.col("l_quantity").cast("long").alias("q"),
        F.round(F.col("l_discount") * 100).cast("long").alias("d"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    dec = "decimal(38,0)"
    g = obs.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("q").cast(dec).alias("sq"),
        F.sum("d").cast(dec).alias("sd"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum(F.col("q") * F.col("q")).cast(dec).alias("sqq"),
        F.sum(F.col("d") * F.col("d")).cast(dec).alias("sdd"),
        F.sum(F.col("q") * F.col("d")).cast(dec).alias("sqd"),
        # cast BEFORE summing: y ~ 1e7 cents so sum(y*y) overflows BIGINT
        # at sf >= 0.1; the decimal accumulator is exact
        F.sum(F.col("q").cast(dec) * F.col("y")).cast(dec).alias("sqy"),
        F.sum(F.col("d").cast(dec) * F.col("y")).cast(dec).alias("sdy"),
        F.sum(F.col("y").cast(dec) * F.col("y")).cast(dec).alias("syy"),
    )
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    c = g.select(
        (d_("n") * d_("sqq") - d_("sq") * d_("sq")).alias("cqq"),
        (d_("n") * d_("sdd") - d_("sd") * d_("sd")).alias("cdd"),
        (d_("n") * d_("sqd") - d_("sq") * d_("sd")).alias("cqd"),
        (d_("n") * d_("sqy") - d_("sq") * d_("sy")).alias("cqy"),
        (d_("n") * d_("sdy") - d_("sd") * d_("sy")).alias("cdy"),
        (d_("n") * d_("syy") - d_("sy") * d_("sy")).alias("cyy"),
    )
    r2_q = F.col("cqy") * F.col("cqy") / (F.col("cqq") * F.col("cyy"))
    r2_d = F.col("cdy") * F.col("cdy") / (F.col("cdd") * F.col("cyy"))
    r2_full = (
        F.col("cqy") * (F.col("cdd") * F.col("cqy") - F.col("cqd") * F.col("cdy"))
        + F.col("cdy") * (F.col("cqq") * F.col("cdy") - F.col("cqd") * F.col("cqy"))
    ) / (F.col("cyy") * (F.col("cqq") * F.col("cdd") - F.col("cqd") * F.col("cqd")))
    r2 = c.select(r2_q.alias("r2_q"), r2_d.alias("r2_d"), r2_full.alias("r2_full"))
    feats = spark.createDataFrame([("quantity",), ("discount",)], "feature string")
    joined = r2.crossJoin(F.broadcast(feats))
    solo = F.when(F.col("feature") == "quantity", F.col("r2_q")).otherwise(F.col("r2_d"))
    other = F.when(F.col("feature") == "quantity", F.col("r2_d")).otherwise(F.col("r2_q"))
    return joined.select(
        "feature",
        F.floor(solo * 1_000_000 + F.lit(0.5)).cast("long").alias("r2_solo_e6"),
        F.floor(F.col("r2_full") * 1_000_000 + F.lit(0.5)).cast("long").alias("r2_full_e6"),
        F.floor(
            (0.5 * solo + 0.5 * (F.col("r2_full") - other)) * 1_000_000 + F.lit(0.5)
        )
        .cast("long")
        .alias("shapley_e6"),
    ).orderBy("feature")


# --------------------------------------------------------------------------
# Heaps'-law vocabulary growth fit
# --------------------------------------------------------------------------

_HEAPS_POINTS = 8

_HEAPS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
first_seen AS (
  SELECT w, CAST(min(doc_id) AS BIGINT) AS first_doc FROM tok GROUP BY w
),
per_doc AS (
  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tok FROM tok t GROUP BY t.doc_id
),
new_types AS (
  SELECT first_doc AS doc_id, CAST(count(*) AS BIGINT) AS n_new
  FROM first_seen GROUP BY first_doc
),
cum AS (
  SELECT p.doc_id,
         row_number() OVER (ORDER BY p.doc_id) AS r,
         CAST(sum(p.n_tok) OVER (ORDER BY p.doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok,
         CAST(sum(coalesce(nt.n_new, 0)) OVER (ORDER BY p.doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_typ
  FROM per_doc p LEFT JOIN new_types nt ON nt.doc_id = p.doc_id
),
nd AS (SELECT CAST(max(r) AS BIGINT) AS n_docs FROM cum),
pts AS (
  SELECT ln(CAST(c.cum_tok AS DOUBLE)) AS lx, ln(CAST(c.cum_typ AS DOUBLE)) AS ly
  FROM cum c CROSS JOIN nd
  WHERE c.r IN (SELECT CAST(ceil(j * nd2.n_docs / {_HEAPS_POINTS}.0) AS BIGINT)
                FROM (SELECT unnest(generate_series(1, {_HEAPS_POINTS})) AS j) js
                CROSS JOIN nd nd2)
),
fit AS (
  SELECT CAST(count(*) AS BIGINT) AS k, sum(lx) AS sx, sum(ly) AS sy,
         sum(lx * lx) AS sxx, sum(lx * ly) AS sxy
  FROM pts
)
SELECT (SELECT n_docs FROM nd) AS n_docs, k AS n_points,
       CAST(floor((k * sxy - sx * sy) / (k * sxx - sx * sx) * 1000000 + 0.5)
         AS BIGINT) AS heaps_beta_e6,
       CAST(floor((sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx) / k
                  * 1000000 + 0.5) AS BIGINT) AS ln_k_e6
FROM fit
"""


@register("corpus_heaps_law", oracle=_HEAPS_ORACLE, tags=("llm", "text"))
def corpus_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit V = K * N^beta of vocabulary growth: cumulative
    distinct types vs cumulative tokens in doc_id order, sampled at
    {_HEAPS_POINTS} evenly-spaced checkpoints and fit by log-log OLS —
    the planning curve that predicts tokenizer vocab pressure and
    dedup novelty yield as a corpus scales 1000x
    (`corpus_ngram_saturation` measures the same phenomenon at fixed
    n-gram order; the Heaps exponent EXTRAPOLATES it). The cumulative
    distinct count is computed without any windowed COUNT DISTINCT:
    each type attributes to its FIRST document (min(doc_id)) and a
    plain running sum of per-doc first-occurrence counts is exactly
    the vocabulary curve — the trick that makes this one shuffle per
    aggregate instead of a quadratic distinct-over-prefix. Checkpoint
    ranks, token counts, and type counts are exact integers; the OLS
    runs over {_HEAPS_POINTS} fixed points. On the synthetic fixture
    the fit reports beta = 0 exactly: the generator draws from a
    CLOSED ~31-type vocabulary, so the curve saturates at the first
    checkpoint — precisely the degenerate-corpus signal this
    diagnostic exists to catch (real web text sits near beta ~ 0.5).
    Plan: tokenize once, two
    wordcount aggregates, one doc-grain cumulative window, a
    constant-size fit."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    first_seen = tok.groupBy("w").agg(F.min("doc_id").cast("long").alias("first_doc"))
    per_doc = tok.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n_tok"))
    new_types = first_seen.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_new")
    )
    w_cum = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = (
        per_doc.join(new_types, "doc_id", "left")
        .select(
            "doc_id",
            F.row_number().over(Window.orderBy("doc_id")).alias("r"),
            F.sum("n_tok").over(w_cum).cast("long").alias("cum_tok"),
            F.sum(F.coalesce(F.col("n_new"), F.lit(0))).over(w_cum).cast("long").alias("cum_typ"),
        )
    )
    nd = cum.agg(F.max("r").cast("long").alias("n_docs"))
    ranks = spark.range(1, _HEAPS_POINTS + 1).select(F.col("id").alias("j"))
    checkpoints = nd.crossJoin(F.broadcast(ranks)).select(
        F.ceil(F.col("j") * F.col("n_docs") / float(_HEAPS_POINTS)).cast("long").alias("r")
    ).distinct()
    pts = cum.join(F.broadcast(checkpoints), "r").select(
        F.log(F.col("cum_tok").cast("double")).alias("lx"),
        F.log(F.col("cum_typ").cast("double")).alias("ly"),
    )
    fit = pts.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
    )
    slope = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return fit.crossJoin(F.broadcast(nd)).select(
        "n_docs",
        F.col("k").alias("n_points"),
        F.floor(slope * 1_000_000 + F.lit(0.5)).cast("long").alias("heaps_beta_e6"),
        F.floor((F.col("sy") - slope * F.col("sx")) / F.col("k") * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("ln_k_e6"),
    )
