"""Round-7 additions: character-level exact-substring dedup (the
suffix-array dedup of Lee et al. 2022, re-expressed as a rolling
window-bucket join) and corpus BLEU with clipped modified n-gram
precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Exact-substring dedup (character level)
# --------------------------------------------------------------------------

_SUB_L = 40  # match length threshold, chars (the paper uses 50 BPE tokens)
_SUB_PLANT_MOD = 20
_SUB_PLANT_OFFSET = 2_000_000_000

_SUBSTRING_ORACLE = f"""
WITH base AS (
  SELECT doc_id, source, text FROM documents
),
planted AS (
  -- re-posted excerpts: a 120-char slice of every {_SUB_PLANT_MOD}th doc
  SELECT doc_id + {_SUB_PLANT_OFFSET} AS doc_id, 'repost' AS source,
         substr(text, 11, 120) AS text
  FROM base WHERE doc_id % {_SUB_PLANT_MOD} = 0
),
corpus AS (
  SELECT * FROM base UNION ALL SELECT * FROM planted
),
spans AS (
  SELECT doc_id, source,
         substr(text, CAST(p.p AS INTEGER), {_SUB_L}) AS gram
  FROM corpus,
       LATERAL (SELECT unnest(generate_series(1, length(text) - {_SUB_L} + 1)) AS p) p
  WHERE length(text) >= {_SUB_L}
),
dup_grams AS (
  SELECT gram FROM spans GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
)
SELECT s.source,
       CAST(count(*) AS BIGINT) AS n_dup_spans,
       CAST(count(DISTINCT s.gram) AS BIGINT) AS n_dup_grams,
       CAST(count(DISTINCT s.doc_id) AS BIGINT) AS n_docs_hit
FROM spans s JOIN dup_grams d USING (gram)
GROUP BY s.source
ORDER BY s.source
"""


@register(
    "dedup_exact_substring",
    oracle=_SUBSTRING_ORACLE,
    tags=("llm", "dedup", "text"),
)
def dedup_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-substring dedup (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better"): find every {L}-char substring
    that appears in >= 2 distinct documents — the character-level
    counterpart of doc-level MinHash, catching boilerplate, licenses,
    and re-posted excerpts that whole-doc similarity misses. Planted
    reposts (a 120-char excerpt of every 20th doc) guarantee known
    recall. The paper builds a suffix array; the Spark-first
    re-expression explodes each doc into its stride-1 rolling windows
    and finds duplicated windows with ONE groupBy on the window text —
    the same O(total_chars) work as the suffix-array scan, shuffled on
    a uniformly-distributed key (no skew by construction: windows are
    near-unique except actual duplicates). 100 TB notes: window rows
    carry only (hash, doc, source) — the 40-char gram itself can hash
    to 16 bytes map-side (kept as text here for oracle parity); stride
    >1 plus window-anchor selection (doc_winnowing_fingerprint, the
    sibling operator) is the standard bandwidth/recall dial; the
    second pass joining spans back to duplicated grams reuses the same
    gram-keyed exchange."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    planted = (
        docs.filter(F.col("doc_id") % _SUB_PLANT_MOD == 0)
        .select(
            (F.col("doc_id") + F.lit(_SUB_PLANT_OFFSET)).alias("doc_id"),
            F.lit("repost").alias("source"),
            F.substring("text", 11, 120).alias("text"),
        )
    )
    corpus = docs.unionByName(planted)
    spans = (
        corpus.filter(F.length("text") >= _SUB_L)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("text") - (_SUB_L - 1)),
                    lambda p: F.col("text").substr(p, F.lit(_SUB_L)),
                )
            ).alias("gram"),
        )
    )
    dup_grams = (
        spans.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    return (
        spans.join(dup_grams, "gram")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dup_spans"),
            F.countDistinct("gram").cast("long").alias("n_dup_grams"),
            F.countDistinct("doc_id").cast("long").alias("n_docs_hit"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Corpus BLEU (clipped modified n-gram precision + brevity penalty)
# --------------------------------------------------------------------------

_BLEU_UNK_STRIDE = 7

_BLEU_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ref_toks FROM documents
),
pair AS (
  SELECT doc_id, ref_toks,
         list_transform(list_zip(ref_toks, range(1, len(ref_toks) + 1)),
                        z -> CASE WHEN z[2] % {_BLEU_UNK_STRIDE} = 0
                                  THEN 'UNK' ELSE z[1] END) AS cand_toks
  FROM toks
),
grams AS (
  SELECT doc_id, n.n,
         list_transform(range(1, len(cand_toks) - n.n + 2),
                        i -> list_aggregate(list_slice(cand_toks, i, i + n.n - 1),
                                            'string_agg', ' ')) AS cand_g,
         list_transform(range(1, len(ref_toks) - n.n + 2),
                        i -> list_aggregate(list_slice(ref_toks, i, i + n.n - 1),
                                            'string_agg', ' ')) AS ref_g
  FROM pair, (SELECT unnest([1, 2, 3, 4]) AS n) n
),
cand_counts AS (
  SELECT doc_id, n, g, count(*) AS c
  FROM (SELECT doc_id, n, unnest(cand_g) AS g FROM grams)
  GROUP BY ALL
),
ref_counts AS (
  SELECT doc_id, n, g, count(*) AS r
  FROM (SELECT doc_id, n, unnest(ref_g) AS g FROM grams)
  GROUP BY ALL
),
clipped AS (
  SELECT c.n,
         CAST(sum(least(c.c, coalesce(r.r, 0))) AS BIGINT) AS num,
         CAST(sum(c.c) AS BIGINT) AS den
  FROM cand_counts c LEFT JOIN ref_counts r USING (doc_id, n, g)
  GROUP BY c.n
),
lens AS (
  SELECT CAST(sum(len(cand_toks)) AS BIGINT) AS cand_len,
         CAST(sum(len(ref_toks)) AS BIGINT) AS ref_len
  FROM pair
)
SELECT n, num, den,
       round(CAST(num AS DOUBLE) / den, 6) AS p_n,
       cand_len, ref_len
FROM clipped, lens
ORDER BY n
"""


@register("ml_bleu_ngram_precision", oracle=_BLEU_ORACLE, tags=("llm", "ml", "text"))
def ml_bleu_ngram_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus BLEU's core: CLIPPED modified n-gram precision for
    n=1..4 plus the corpus length totals the brevity penalty needs —
    the generation-eval metric every MT/summarization pipeline
    computes at fleet scale. Candidates derive deterministically from
    references (every 7th token masked to UNK) so both engines score
    the identical pair set. Clipping is the subtle part: a candidate
    n-gram only scores up to its count in THE SAME doc's reference
    (sum of least(c, r)), which is exactly one left join on
    (doc, n, gram) between two count tables — no cross-doc work, no
    gram table ever leaves its doc key. 100 TB shape: counts are
    map-side-combinable groupBys keyed by (doc, n, gram); the join
    key contains doc_id so Spark co-partitions both sides in one
    exchange each; numerators/denominators are exact BIGINTs (the
    only double is the final ratio)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("ref_toks"))
    pair = toks.withColumn(
        "cand_toks",
        F.transform(
            "ref_toks",
            lambda t, i: F.when((i + 1) % _BLEU_UNK_STRIDE == 0, F.lit("UNK")).otherwise(t),
        ),
    ).persist()

    def gram_counts(col: str, cname: str) -> DataFrame:
        g = pair.select(
            "doc_id",
            F.explode(F.array(*[F.lit(n) for n in (1, 2, 3, 4)])).alias("n"),
            F.col(col).alias("t"),
        ).select(
            "doc_id",
            "n",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - F.col("n") + 1),
                    lambda i: F.concat_ws(" ", F.slice("t", i, F.col("n"))),
                )
            ).alias("g"),
        )
        return g.groupBy("doc_id", "n", "g").agg(F.count(F.lit(1)).alias(cname))

    cand = gram_counts("cand_toks", "c")
    ref = gram_counts("ref_toks", "r")
    clipped = (
        cand.join(ref, ["doc_id", "n", "g"], "left")
        .groupBy("n")
        .agg(
            F.sum(F.least(F.col("c"), F.coalesce(F.col("r"), F.lit(0))))
            .cast("long")
            .alias("num"),
            F.sum("c").cast("long").alias("den"),
        )
    )
    lens = pair.agg(
        F.sum(F.size("cand_toks")).cast("long").alias("cand_len"),
        F.sum(F.size("ref_toks")).cast("long").alias("ref_len"),
    )
    return (
        clipped.crossJoin(F.broadcast(lens))
        .select(
            "n",
            "num",
            "den",
            F.round(F.col("num").cast("double") / F.col("den"), 6).alias("p_n"),
            "cand_len",
            "ref_len",
        )
        .orderBy("n")
    )
