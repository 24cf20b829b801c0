"""Round-24 LLM ops, part 27: Okapi BM25 retrieval scoring, Stupid
Backoff n-gram scoring, and contrastive negative sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Okapi BM25
# --------------------------------------------------------------------------

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_QUERY = ("table", "hash", "merge")
_BM25_TOPN = 50

_BM25_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
doclen AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id
),
corpus AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS tot_len
  FROM doclen
),
tf AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM tok
  WHERE w IN {_BM25_QUERY!r}
  GROUP BY doc_id, w
),
df AS (
  SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY w
),
scored AS (
  SELECT t.doc_id,
         CAST(floor(
           ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
           * (t.tf * ({_BM25_K1} + 1.0))
           / (t.tf + {_BM25_K1} * (1.0 - {_BM25_B}
              + {_BM25_B} * l.dl / (CAST(c.tot_len AS DOUBLE) / c.n_docs)))
           * 1000000 + 0.5) AS BIGINT) AS term_score_e6
  FROM tf t
  JOIN doclen l ON l.doc_id = t.doc_id
  JOIN df d ON d.w = t.w
  CROSS JOIN corpus c
)
SELECT doc_id, CAST(sum(term_score_e6) AS BIGINT) AS bm25_e6
FROM scored
GROUP BY doc_id
ORDER BY bm25_e6 DESC, doc_id
LIMIT {_BM25_TOPN}
"""


@register("text_bm25_scoring", oracle=_BM25_ORACLE, tags=("llm", "text", "search"))
def text_bm25_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 — the lexical-retrieval baseline every hybrid RAG
    stack still runs next to its embedding index — for the fixed query
    {_BM25_QUERY}: idf from the standard (N - df + 0.5)/(df + 0.5)
    log-odds, tf saturation at k1={_BM25_K1}, and length normalization
    at b={_BM25_B} against the exact corpus mean length. Every input
    to the double expression is an exact BIGINT (tf, df, dl, N, total
    length), the expression text is identical in both engines, and
    each TERM's score is quantized to 1e-6 BEFORE the cross-term sum
    — so the ranking is engine-stable to the hash. Plan: one
    tokenize+filter pass (the query IN-filter prunes the explode
    output to query terms only — at 100 TB this is an inverted-index
    probe, not a corpus scan per query), one tiny df/corpus aggregate
    broadcast back, one per-doc sum, a global top-{_BM25_TOPN}."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    doclen = tok.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    corpus = doclen.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("tot_len"),
    )
    tf = (
        tok.filter(F.col("w").isin(*_BM25_QUERY))
        .groupBy("doc_id", "w")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    df = tf.groupBy("w").agg(F.count("*").cast("long").alias("df"))
    scored = (
        tf.join(doclen, "doc_id")
        .join(F.broadcast(df), "w")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            F.floor(
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
                )
                * (F.col("tf") * (_BM25_K1 + 1.0))
                / (
                    F.col("tf")
                    + _BM25_K1
                    * (
                        1.0
                        - _BM25_B
                        + _BM25_B
                        * F.col("dl")
                        / (F.col("tot_len").cast("double") / F.col("n_docs"))
                    )
                )
                * 1_000_000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("term_score_e6"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("term_score_e6").cast("long").alias("bm25_e6"))
        .orderBy(F.col("bm25_e6").desc(), "doc_id")
        .limit(_BM25_TOPN)
    )


# --------------------------------------------------------------------------
# Stupid Backoff n-gram scoring
# --------------------------------------------------------------------------

_SB_ALPHA_E6 = 400_000  # 0.4, the canonical Stupid Backoff discount

_SB_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, p, w, lead(w) OVER (PARTITION BY doc_id ORDER BY p) AS w2
  FROM (
    SELECT doc_id, t.p, list_extract(string_split(text, ' '), t.p) AS w
    FROM documents,
         LATERAL unnest(generate_series(1, length(text)
           - length(replace(text, ' ', '')) + 1)) AS t(p)
  )
),
uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c1 FROM tok GROUP BY w),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok),
bi AS (
  SELECT w, w2, CAST(count(*) AS BIGINT) AS c2 FROM tok
  WHERE w2 IS NOT NULL GROUP BY w, w2
),
-- score every OBSERVED bigram under the backoff: seen bigram uses
-- c2/c1; the backoff branch (alpha * c2nd/N) is what an UNSEEN bigram
-- would get — emitted alongside so the oracle checks both branches
scores AS (
  SELECT b.w, b.w2,
         CAST(b.c2 * 1000000 // u1.c1 AS BIGINT) AS seen_score_e6,
         CAST({_SB_ALPHA_E6} * u2.c1 // t.n AS BIGINT) AS backoff_score_e6
  FROM bi b
  JOIN uni u1 ON u1.w = b.w
  JOIN uni u2 ON u2.w = b.w2
  CROSS JOIN tot t
)
SELECT w, w2, seen_score_e6, backoff_score_e6,
       CASE WHEN seen_score_e6 >= backoff_score_e6 THEN 1 ELSE 0 END
         AS bigram_informative
FROM scores
ORDER BY seen_score_e6 DESC, w, w2
LIMIT 100
"""


@register("text_stupid_backoff", oracle=_SB_ORACLE, tags=("llm", "text"))
def text_stupid_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid Backoff (Brants et al. 2007) — the web-scale LM scoring
    rule that skips normalization entirely: score(w2|w) = c(w,w2)/c(w)
    if the bigram was seen, else alpha * c(w2)/N with alpha=0.4. Both
    branches are EXACT integer divisions in 1e-6 units (count ratios
    — this is why Stupid Backoff suits a data engine: no discounting
    renormalization pass), emitted side by side per observed bigram
    with an informativeness flag (does seeing the history beat the
    backoff?). Plan: one positional tokenize (lead() for the bigram
    on the same doc sort), two count aggregates, broadcast-joined
    scoring — the model build is two groupBys at any corpus size."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("p", "w")
    ).withColumn(
        "w2", F.lead("w").over(Window.partitionBy("doc_id").orderBy("p"))
    )
    uni = tok.groupBy("w").agg(F.count("*").cast("long").alias("c1"))
    tot = tok.agg(F.count("*").cast("long").alias("n"))
    bi = (
        tok.filter(F.col("w2").isNotNull())
        .groupBy("w", "w2")
        .agg(F.count("*").cast("long").alias("c2"))
    )
    u1 = uni.select(F.col("w"), F.col("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c1").alias("c1_next"))
    scores = (
        bi.join(F.broadcast(u1), "w")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w",
            "w2",
            F.expr("CAST(c2 * 1000000 div c1 AS BIGINT)").alias("seen_score_e6"),
            F.expr(f"CAST({_SB_ALPHA_E6} * c1_next div n AS BIGINT)").alias(
                "backoff_score_e6"
            ),
        )
    )
    return (
        scores.select(
            "w",
            "w2",
            "seen_score_e6",
            "backoff_score_e6",
            F.when(F.col("seen_score_e6") >= F.col("backoff_score_e6"), 1)
            .otherwise(0)
            .alias("bigram_informative"),
        )
        .orderBy(F.col("seen_score_e6").desc(), "w", "w2")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Contrastive negative sampling
# --------------------------------------------------------------------------

_NEG_K = 4

_NEG_ORACLE = f"""
WITH anchors AS (
  SELECT doc_id, source, lang FROM documents WHERE doc_id % 10 = 0
),
cands AS (
  SELECT doc_id, source, lang FROM documents
),
ranked AS (
  SELECT a.doc_id AS anchor_id, c.doc_id AS negative_id, c.source AS neg_source,
         row_number() OVER (
           PARTITION BY a.doc_id
           ORDER BY CAST(('0x' || substring(md5(CAST(a.doc_id AS VARCHAR) || ':'
                       || CAST(c.doc_id AS VARCHAR)), 1, 12)) AS BIGINT),
                    c.doc_id) AS rn
  FROM anchors a JOIN cands c
    ON c.source <> a.source AND c.doc_id <> a.doc_id
)
SELECT anchor_id, negative_id, neg_source, CAST(rn AS BIGINT) AS neg_rank
FROM ranked WHERE rn <= {_NEG_K}
ORDER BY anchor_id, neg_rank
"""


@register("contrastive_negative_sampling", oracle=_NEG_ORACLE, tags=("llm", "sampling"))
def contrastive_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training
    (SimCLR/DPR-style): each anchor draws {_NEG_K} negatives from a
    DIFFERENT source (the standard "easy negative" pool — the
    hard-negative miner is `llm_ops19`'s job), ranked by a seeded
    md5 of the (anchor, candidate) pair so the sample is reproducible
    run to run — the property that makes contrastive batches
    re-buildable after a crash without shifting every epoch's
    pairing. Plan: anchors filter, a source-inequality join, one
    window top-k per anchor. At 100 TB the candidate pool per anchor
    is sampled FIRST (hash-bucket the candidates to ~1000 per
    anchor-shard) — the fixture-size all-pairs ranking keeps the
    oracle exact while documenting that cap as the scale path."""
    docs = load_table(spark, sf_dir, "documents")
    anchors = docs.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("anchor_id"), F.col("source").alias("a_source")
    )
    cands = docs.select(
        F.col("doc_id").alias("negative_id"), F.col("source").alias("neg_source")
    )
    from pyspark.sql import Window

    pair_hash = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("anchor_id").cast("string"),
                    F.lit(":"),
                    F.col("negative_id").cast("string"),
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("anchor_id").orderBy(pair_hash, "negative_id")
    return (
        anchors.join(
            cands,
            (F.col("neg_source") != F.col("a_source"))
            & (F.col("negative_id") != F.col("anchor_id")),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _NEG_K)
        .select(
            "anchor_id",
            "negative_id",
            "neg_source",
            F.col("rn").cast("long").alias("neg_rank"),
        )
        .orderBy("anchor_id", "neg_rank")
    )
