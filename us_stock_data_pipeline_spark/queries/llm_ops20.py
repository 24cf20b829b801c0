"""Round-9 LLM-pipeline additions, part 20: context-window truncation
loss, lexicon hit-rate scoring, and Brier-score decomposition.

Three curation-stack gaps: how many training tokens fall off the end
of the context window (truncation loss), how often a screening
lexicon fires per source (the cheapest content filter there is), and
whether the quality classifier's probabilities mean anything
(Brier reliability/resolution — calibration's scalar summary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.queries.ml_eval_ops import _SCORED_SQL, _scored
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Context-window truncation loss
# --------------------------------------------------------------------------

_TRUNC_CTX = 256  # context window in whitespace tokens

_TRUNC_ORACLE = f"""
WITH tl AS (
  SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN tok > {_TRUNC_CTX} THEN 1 ELSE 0 END) AS BIGINT) AS n_truncated,
       CAST(sum(tok) AS BIGINT) AS tokens_total,
       CAST(sum(CASE WHEN tok > {_TRUNC_CTX} THEN tok - {_TRUNC_CTX} ELSE 0 END)
            AS BIGINT) AS tokens_lost,
       CAST(sum(CASE WHEN tok > {_TRUNC_CTX} THEN tok - {_TRUNC_CTX} ELSE 0 END) * 1000
            // sum(tok) AS BIGINT) AS lost_permille
FROM tl
GROUP BY source
ORDER BY source
"""


@register("corpus_truncation_loss", oracle=_TRUNC_ORACLE, tags=("llm", "agg"))
def corpus_truncation_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window truncation loss per source: with a {_TRUNC_CTX}-token
    window, how many documents overflow and what fraction of the
    corpus's tokens falls off the end — the number that decides
    between naive truncation and the chunking path (`doc_chunking`
    keeps those tokens; this query prices what skipping it costs).
    Token counts are exact whitespace-split lengths on the identical
    string in both engines; the loss rate is integer permille. Plan:
    one scan, one map-side-combined groupBy on source — the
    distributed state is three counters per source."""
    docs = load_table(spark, sf_dir, "documents")
    tl = docs.select(
        "source", F.size(F.split("text", " ")).cast("long").alias("tok")
    )
    over = F.when(F.col("tok") > _TRUNC_CTX, F.col("tok") - _TRUNC_CTX).otherwise(0)
    return (
        tl.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("tok") > _TRUNC_CTX, 1).otherwise(0))
            .cast("long")
            .alias("n_truncated"),
            F.sum("tok").cast("long").alias("tokens_total"),
            F.sum(over).cast("long").alias("tokens_lost"),
            F.expr(
                f"CAST(sum(CASE WHEN tok > {_TRUNC_CTX} THEN tok - {_TRUNC_CTX} ELSE 0 END)"
                " * 1000 div sum(tok) AS BIGINT)"
            ).alias("lost_permille"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Lexicon hit-rate screening
# --------------------------------------------------------------------------

# A screening lexicon (here: finance/risk vocabulary). Literal IN-list
# predicates compile to JVM-side hash lookups in whole-stage codegen —
# for a list this size that beats a broadcast join (no build side at
# all); swap to a broadcast join when the lexicon outgrows a literal.
_LEXICON = (
    "risk", "fraud", "loss", "crash", "default", "margin", "debt",
    "panic", "bubble", "crisis", "hedge", "leverage", "volatil",
    "bankrupt", "sell", "short",
)
_LEX_SQL = ", ".join(f"'{w}'" for w in _LEXICON)

_LEX_ORACLE = f"""
WITH tok AS (
  SELECT source,
         regexp_replace(lower(unnest(string_split(text, ' '))), '[^a-z]', '', 'g') AS w
  FROM documents
),
hits AS (
  SELECT source, w, CASE WHEN w IN ({_LEX_SQL}) THEN 1 ELSE 0 END AS hit
  FROM tok WHERE w <> ''
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(hit) AS BIGINT) AS n_hits,
       CAST(sum(hit) * 1000000 // count(*) AS BIGINT) AS hit_ppm,
       CAST(count(DISTINCT CASE WHEN hit = 1 THEN w END) AS BIGINT) AS n_distinct_hits
FROM hits
GROUP BY source
ORDER BY source
"""


@register("text_lexicon_hit_rate", oracle=_LEX_ORACLE, tags=("llm", "text"))
def text_lexicon_hit_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon hit-rate screening: normalize every token (lowercase,
    strip non-letters) and measure how often a fixed screening
    vocabulary fires per source — the cheapest content filter in any
    curation ladder (toxicity wordlists, compliance terms, domain
    keywords all run exactly this shape before anything model-based).
    The lexicon is a literal IN-list, which codegen compiles to a
    JVM-side hash probe per token: zero join, zero build side, the
    fastest possible membership test until the list outgrows a
    literal (then: broadcast join, same plan shape as
    `join_inline_code_table`). Hit rate is integer ppm. Plan: one
    scan, explode, one groupBy on source with a distinct-on-hit-word
    sub-aggregate bounded by the lexicon size."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select("source", F.explode(F.split("text", " ")).alias("raw_w"))
        .select(
            "source",
            F.regexp_replace(F.lower(F.col("raw_w")), "[^a-z]", "").alias("w"),
        )
        .filter(F.col("w") != "")
    )
    hit = F.when(F.col("w").isin(*_LEXICON), 1).otherwise(0)
    hits = tok.select("source", "w", hit.alias("hit"))
    return (
        hits.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("hit").cast("long").alias("n_hits"),
            F.expr("CAST(sum(hit) * 1000000 div count(*) AS BIGINT)").alias("hit_ppm"),
            F.countDistinct(F.when(F.col("hit") == 1, F.col("w")))
            .cast("long")
            .alias("n_distinct_hits"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Brier score decomposition (reliability / resolution / uncertainty)
# --------------------------------------------------------------------------

_BRIER_ORACLE = f"""
WITH {_SCORED_SQL},
binned AS (
  SELECT least(score_milli // 100, 9) AS bin,
         CAST(count(*) AS BIGINT) AS nb,
         CAST(sum(score_milli) AS BIGINT) AS sb,
         CAST(sum(y) AS BIGINT) AS yb,
         CAST(sum((score_milli - 1000 * y) * (score_milli - 1000 * y)) AS BIGINT) AS sq
  FROM scored GROUP BY 1
),
tot AS (
  SELECT CAST(sum(nb) AS BIGINT) AS n, CAST(sum(yb) AS BIGINT) AS ypos,
         CAST(sum(sq) AS BIGINT) AS sqtot
  FROM binned
)
SELECT t.n AS n_docs, t.ypos AS n_positive,
       floor(CAST(t.sqtot AS DOUBLE) / t.n / 1000000 * 1000000 + 0.5) / 1000000 AS brier,
       floor(sum(CAST(b.sb - 1000 * b.yb AS DOUBLE) * (b.sb - 1000 * b.yb) / b.nb)
             / t.n / 1000000 * 1000000 + 0.5) / 1000000 AS reliability,
       floor(sum(CAST(b.yb * t.n - t.ypos * b.nb AS DOUBLE)
                 * (b.yb * t.n - t.ypos * b.nb) / (CAST(b.nb AS DOUBLE) * t.n * t.n))
             / t.n * 1000000 + 0.5) / 1000000 AS resolution,
       floor(CAST(t.ypos AS DOUBLE) * (t.n - t.ypos) / (CAST(t.n AS DOUBLE) * t.n)
             * 1000000 + 0.5) / 1000000 AS uncertainty
FROM binned b CROSS JOIN tot t
GROUP BY t.n, t.ypos, t.sqtot
"""


@register("ml_brier_decomposition", oracle=_BRIER_ORACLE, tags=("ml", "eval"))
def ml_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score for the stopword-rate
    English classifier: brier = reliability - resolution +
    uncertainty (up to within-bin variance), over 10 probability
    bins — the scalar companion to `ml_calibration_bins`: reliability
    near 0 means the probabilities can be believed, resolution
    measures how much the classifier actually separates. Probabilities
    live as integer milli-scores, so every accumulated quantity —
    per-bin counts, score sums, label sums, squared errors — is an
    exact BIGINT, and the three decomposition terms are terminal
    double expressions quantized identically on both engines. Plan:
    two tiny aggregations over the per-doc scored table (bin-level,
    then global) — mergeable counters all the way down, one shuffle
    of at most 10 rows after the doc-level groupBy."""
    scored = _scored(spark, sf_dir)
    binned = scored.groupBy(
        F.least(F.expr("score_milli div 100"), F.lit(9)).alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("nb"),
        F.sum("score_milli").cast("long").alias("sb"),
        F.sum("y").cast("long").alias("yb"),
        F.sum(
            (F.col("score_milli") - 1000 * F.col("y"))
            * (F.col("score_milli") - 1000 * F.col("y"))
        )
        .cast("long")
        .alias("sq"),
    )
    tot = binned.agg(
        F.sum("nb").cast("long").alias("n"),
        F.sum("yb").cast("long").alias("ypos"),
        F.sum("sq").cast("long").alias("sqtot"),
    )
    j = binned.crossJoin(F.broadcast(tot))
    rel_term = (
        (F.col("sb") - 1000 * F.col("yb")).cast("double")
        * (F.col("sb") - 1000 * F.col("yb"))
        / F.col("nb")
    )
    res_term = (
        (F.col("yb") * F.col("n") - F.col("ypos") * F.col("nb")).cast("double")
        * (F.col("yb") * F.col("n") - F.col("ypos") * F.col("nb"))
        / (F.col("nb").cast("double") * F.col("n") * F.col("n"))
    )
    return (
        j.groupBy("n", "ypos", "sqtot")
        .agg(F.sum(rel_term).alias("rel_s"), F.sum(res_term).alias("res_s"))
        .select(
            F.col("n").alias("n_docs"),
            F.col("ypos").alias("n_positive"),
            (
                F.floor(F.col("sqtot").cast("double") / F.col("n") / 1000000 * 1000000 + F.lit(0.5))
                / 1000000
            ).alias("brier"),
            (F.floor(F.col("rel_s") / F.col("n") / 1000000 * 1000000 + F.lit(0.5)) / 1000000).alias(
                "reliability"
            ),
            (F.floor(F.col("res_s") / F.col("n") * 1000000 + F.lit(0.5)) / 1000000).alias(
                "resolution"
            ),
            (
                F.floor(
                    F.col("ypos").cast("double")
                    * (F.col("n") - F.col("ypos"))
                    / (F.col("n").cast("double") * F.col("n"))
                    * 1000000
                    + F.lit(0.5)
                )
                / 1000000
            ).alias("uncertainty"),
        )
    )
