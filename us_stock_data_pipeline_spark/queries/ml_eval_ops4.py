"""Round-10 ML operators, part 4: training IN the engine — an exact
decision stump and a naive-Bayes language classifier.

The ml_eval_ops family grades classifiers; this module TRAINS two on
the same deterministic corpus, entirely as SQL-shaped aggregation:
a depth-1 tree by exact Gini split search over the feature's value
support, and multinomial naive Bayes from token-class counts. Both
stay integer-exact until terminal display columns, so training is
reproducible bit-for-bit across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.queries.ml_eval_ops import _SCORED_SQL, _scored
from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Decision stump: exact Gini split search
# --------------------------------------------------------------------------

# Gini comparison in integers: for a split into (nL,pL | nR,pR),
# weighted gini = a_L/(n_L*N) + a_R/(n_R*N) with
# a = n^2 - p^2 - (n-p)^2.  Minimizing over thresholds compares
# fractions a_L/n_L + a_R/n_R, i.e. the integer a_L*n_R + a_R*n_L
# after multiplying by n_L*n_R — no floats in the argmin.
_STUMP_ORACLE = f"""
WITH {_SCORED_SQL},
support AS (
  SELECT score_milli,
         CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(y) AS BIGINT) AS pos
  FROM scored GROUP BY score_milli
),
tot AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS p FROM support
),
cum AS (
  SELECT score_milli,
         sum(cnt) OVER (ORDER BY score_milli) AS nl,
         sum(pos) OVER (ORDER BY score_milli) AS pl
  FROM support
),
cand AS (
  SELECT c.score_milli AS thr, c.nl, c.pl,
         t.n - c.nl AS nr, t.p - c.pl AS pr, t.n AS n, t.p AS p
  FROM cum c CROSS JOIN tot t
  WHERE c.nl < t.n
),
scored_splits AS (
  SELECT thr, nl, pl, nr, pr, n, p,
         (nl * nl - pl * pl - (nl - pl) * (nl - pl)) * nr
           + (nr * nr - pr * pr - (nr - pr) * (nr - pr)) * nl AS split_scaled
  FROM cand
)
SELECT CAST(thr AS BIGINT) AS threshold_milli,
       CAST(nl AS BIGINT) AS n_left, CAST(pl AS BIGINT) AS pos_left,
       CAST(nr AS BIGINT) AS n_right, CAST(pr AS BIGINT) AS pos_right,
       floor((CAST(nl * nl - pl * pl - (nl - pl) * (nl - pl) AS DOUBLE) / nl
              + CAST(nr * nr - pr * pr - (nr - pr) * (nr - pr) AS DOUBLE) / nr)
             / n * 1000000 + 0.5) / 1000000 AS weighted_gini,
       floor((CAST(n * n - p * p - (n - p) * (n - p) AS DOUBLE) / n) / n
             * 1000000 + 0.5) / 1000000 AS root_gini
FROM scored_splits
ORDER BY split_scaled, thr
LIMIT 1
"""


@register("ml_decision_stump", oracle=_STUMP_ORACLE, tags=("ml", "train"))
def ml_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a depth-1 decision tree (stump) on the stopword-rate
    feature with EXACT Gini split search: candidate thresholds are
    the feature's value support (compressed first — the same
    value-support trick as `stats_ks_two_sample`), cumulative
    class counts come from one ordered window, and the argmin
    compares the integer cross-multiplied form a_L*n_R + a_R*n_L so
    no float ever enters the decision — two engines (or two cluster
    partitionings) always pick the identical split. This is one
    boosting iteration's inner loop; at 100 TB the support
    compression is what makes it tractable (the window runs over
    distinct feature values, not rows). Plan: doc-level groupBy,
    support groupBy, one bounded window, broadcast totals, global
    top-1."""
    scored = _scored(spark, sf_dir)
    support = scored.groupBy("score_milli").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("y").cast("long").alias("pos"),
    )
    tot = support.agg(
        F.sum("cnt").cast("long").alias("n"), F.sum("pos").cast("long").alias("p")
    )
    w = Window.orderBy("score_milli").rowsBetween(Window.unboundedPreceding, 0)
    cum = support.select(
        F.col("score_milli").alias("thr"),
        F.sum("cnt").over(w).alias("nl"),
        F.sum("pos").over(w).alias("pl"),
    )
    cand = cum.crossJoin(F.broadcast(tot)).filter(F.col("nl") < F.col("n")).select(
        "thr",
        "nl",
        "pl",
        (F.col("n") - F.col("nl")).alias("nr"),
        (F.col("p") - F.col("pl")).alias("pr"),
        "n",
        "p",
    )
    a_l = F.col("nl") * F.col("nl") - F.col("pl") * F.col("pl") - (
        F.col("nl") - F.col("pl")
    ) * (F.col("nl") - F.col("pl"))
    a_r = F.col("nr") * F.col("nr") - F.col("pr") * F.col("pr") - (
        F.col("nr") - F.col("pr")
    ) * (F.col("nr") - F.col("pr"))
    a_root = F.col("n") * F.col("n") - F.col("p") * F.col("p") - (
        F.col("n") - F.col("p")
    ) * (F.col("n") - F.col("p"))
    splits = cand.withColumn("split_scaled", a_l * F.col("nr") + a_r * F.col("nl"))
    return (
        splits.orderBy("split_scaled", "thr")
        .limit(1)
        .select(
            F.col("thr").alias("threshold_milli"),
            F.col("nl").alias("n_left"),
            F.col("pl").alias("pos_left"),
            F.col("nr").alias("n_right"),
            F.col("pr").alias("pos_right"),
            (
                F.floor(
                    (a_l.cast("double") / F.col("nl") + a_r.cast("double") / F.col("nr"))
                    / F.col("n")
                    * 1000000
                    + F.lit(0.5)
                )
                / 1000000
            ).alias("weighted_gini"),
            (
                F.floor(
                    (a_root.cast("double") / F.col("n")) / F.col("n") * 1000000 + F.lit(0.5)
                )
                / 1000000
            ).alias("root_gini"),
        )
    )


# --------------------------------------------------------------------------
# Naive Bayes language classifier: train + confusion matrix
# --------------------------------------------------------------------------

# Sparse scoring identity: with add-1 smoothing,
#   score(doc, lang) = prior(lang)
#                    + n_tokens(doc) * ll0(lang)
#                    + sum_{w in doc seen with lang} c_w * (ll(w,lang) - ll0(lang))
# where ll0(lang) = ln(1 / (T_lang + V)) is the unseen-token
# log-likelihood. The correction join touches only OBSERVED
# (token, lang) pairs — the inverted-index shape — never vocab x langs
# per doc. All log terms are floor-quantized to 1e-9 integers before
# summation, so the per-doc argmax is an exact integer comparison.
_NB_ORACLE = """
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents
),
doc_tok AS (
  SELECT doc_id, max(lang) AS true_lang, w, CAST(count(*) AS BIGINT) AS c
  FROM tok GROUP BY doc_id, w
),
doc_len AS (
  SELECT doc_id, max(true_lang) AS true_lang, CAST(sum(c) AS BIGINT) AS n_tok
  FROM doc_tok GROUP BY doc_id
),
cls AS (
  SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS t_lang
  FROM tok GROUP BY lang
),
vocab AS (
  SELECT CAST(count(DISTINCT w) AS BIGINT) AS v,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_all
  FROM tok
),
wl AS (
  SELECT lang, w, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY lang, w
),
consts AS (
  SELECT c.lang, c.n_docs, c.t_lang, v.v, v.n_all,
         CAST(floor(ln(1.0 / (c.t_lang + v.v)) * 1000000000) AS BIGINT) AS ll0_e9,
         CAST(floor(ln(CAST(c.n_docs AS DOUBLE) / v.n_all) * 1000000000) AS BIGINT)
           AS prior_e9
  FROM cls c CROSS JOIN vocab v
),
ll AS (
  SELECT w.lang, w.w,
         CAST(floor(ln(CAST(w.cnt + 1 AS DOUBLE) / (k.t_lang + k.v)) * 1000000000)
              AS BIGINT) AS ll_e9,
         k.ll0_e9
  FROM wl w JOIN consts k ON k.lang = w.lang
),
corr AS (
  SELECT d.doc_id, l.lang,
         CAST(sum(d.c * (l.ll_e9 - l.ll0_e9)) AS BIGINT) AS corr_e9
  FROM doc_tok d JOIN ll l ON l.w = d.w
  GROUP BY d.doc_id, l.lang
),
scorespace AS (
  SELECT dl.doc_id, dl.true_lang, k.lang,
         k.prior_e9 + dl.n_tok * k.ll0_e9 + coalesce(c.corr_e9, 0) AS score_e9
  FROM doc_len dl
  CROSS JOIN consts k
  LEFT JOIN corr c ON c.doc_id = dl.doc_id AND c.lang = k.lang
),
pred AS (
  SELECT doc_id, true_lang, lang AS pred_lang,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score_e9 DESC, lang) AS rn
  FROM scorespace
)
SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
FROM pred WHERE rn = 1
GROUP BY true_lang, pred_lang
ORDER BY true_lang, pred_lang
"""


@register("ml_naive_bayes_lang", oracle=_NB_ORACLE, tags=("ml", "train", "text"), bench=True)
def ml_naive_bayes_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive Bayes trained in-engine: token-class counts
    with add-1 smoothing predict each document's language; output is
    the self-classification confusion matrix — the trainable upgrade
    of `text_language_id`'s fixed heuristic, built from the exact
    aggregation shapes a 100 TB corpus allows (token-class counts are
    vocab x 5 langs, bounded; the scoring join is the sparse
    inverted-index identity so each doc only joins tokens it
    contains). Every log term is floor-quantized to a 1e-9 integer
    BEFORE summation (the `text_unigram_logprob` discipline), making
    the per-doc argmax an exact integer comparison with a
    deterministic lexicographic tie-break. Plan: ONE tokenize+groupBy
    pass builds (doc, token, count) — persisted, since the model
    (token-class counts), the doc lengths, and the scoring correction
    all derive from it — the per-class constants and the vocab-sized
    log-likelihood table both broadcast, and the argmax is a struct-
    min hash aggregate (no window sort): min((-score, lang)) IS
    "highest score, lexicographically-first language on ties"."""
    docs = load_table(spark, sf_dir, "documents")
    doc_tok = (
        docs.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.max("lang").alias("true_lang"), F.count(F.lit(1)).cast("long").alias("c"))
        .transform(registry.track_persist)
    )
    doc_len = doc_tok.groupBy("doc_id").agg(
        F.max("true_lang").alias("true_lang"), F.sum("c").cast("long").alias("n_tok")
    )
    # model-side counts all fold out of doc_tok / the raw docs table:
    # t_lang = sum of per-doc counts; n_docs per lang needs no explode
    # (split(' ') never yields zero tokens, so every doc tokenizes).
    cls = doc_tok.groupBy(F.col("true_lang").alias("lang")).agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.sum("c").cast("long").alias("t_lang"),
    )
    vocab = doc_tok.agg(
        F.countDistinct("w").cast("long").alias("v"),
        F.countDistinct("doc_id").cast("long").alias("n_all"),
    )
    consts = cls.crossJoin(F.broadcast(vocab)).select(
        "lang",
        "n_docs",
        "t_lang",
        "v",
        F.floor(F.log(F.lit(1.0) / (F.col("t_lang") + F.col("v"))) * 1000000000)
        .cast("long")
        .alias("ll0_e9"),
        F.floor(
            F.log(F.col("n_docs").cast("double") / F.col("n_all")) * 1000000000
        )
        .cast("long")
        .alias("prior_e9"),
    )
    wl = doc_tok.groupBy(F.col("true_lang").alias("lang"), "w").agg(
        F.sum("c").cast("long").alias("cnt")
    )
    ll = wl.join(F.broadcast(consts.select("lang", "t_lang", "v", "ll0_e9")), "lang").select(
        "lang",
        "w",
        F.floor(
            F.log((F.col("cnt") + 1).cast("double") / (F.col("t_lang") + F.col("v")))
            * 1000000000
        )
        .cast("long")
        .alias("ll_e9"),
        "ll0_e9",
    )
    corr = (
        doc_tok.join(F.broadcast(ll), "w")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum(F.col("c") * (F.col("ll_e9") - F.col("ll0_e9")))
            .cast("long")
            .alias("corr_e9")
        )
    )
    scorespace = (
        doc_len.crossJoin(F.broadcast(consts.select("lang", "prior_e9", "ll0_e9")))
        .join(corr, ["doc_id", "lang"], "left")
        .select(
            "doc_id",
            "true_lang",
            "lang",
            (
                F.col("prior_e9")
                + F.col("n_tok") * F.col("ll0_e9")
                + F.coalesce(F.col("corr_e9"), F.lit(0))
            ).alias("score_e9"),
        )
    )
    # argmax without a window sort: min((-score, lang)) over each doc's
    # five candidate rows == row_number(score DESC, lang ASC) == 1.
    pred = scorespace.groupBy("doc_id", "true_lang").agg(
        F.min(F.struct((-F.col("score_e9")).alias("ns"), F.col("lang"))).alias("best")
    )
    return (
        pred.groupBy("true_lang", F.col("best.lang").alias("pred_lang"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("true_lang", "pred_lang")
    )
