"""LLM-data-pipeline operators, part 5: statistical quality filters —
the corpus-curation rules large-scale training pipelines run between
dedup and tokenization (unigram-LM scoring a la CCNet, benchmark
decontamination, repetition/boilerplate detection a la Gopher rules).

All three are inverted-index / partial-aggregate shapes: corpus
statistics are one groupBy, per-doc scoring is one join on the token
key — never a per-doc Python loop, never a dense matrix."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Unigram-LM cross-entropy (perplexity filter)
# --------------------------------------------------------------------------

_UNIGRAM_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
vocab AS (
  SELECT w, count(*) AS c FROM tok GROUP BY 1
),
total AS (SELECT sum(c) AS t FROM vocab)
SELECT
  tok.doc_id,
  CAST(count(*) AS BIGINT) AS n_tokens,
  round(-avg(ln(CAST(v.c AS DOUBLE) / total.t)), 4) AS cross_entropy
FROM tok JOIN vocab v USING (w) CROSS JOIN total
GROUP BY tok.doc_id
ORDER BY tok.doc_id
"""


@register("text_unigram_logprob", oracle=_UNIGRAM_ORACLE, tags=("llm", "text", "quality"))
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-entropy under the corpus's own unigram LM —
    the shape of the CCNet/KenLM perplexity filter (docs scoring far
    from the corpus distribution are boilerplate, spam, or the wrong
    language). The LM is one vocabulary groupBy; scoring is one join on
    the token key and an average of log-probs — at 100 TB the vocab
    table is Zipf-small relative to the corpus and broadcastable, and
    the production variant simply swaps in a trained KenLM table with
    the identical join shape."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    vocab = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").alias("t"))
    return (
        tok.join(vocab, "w")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(-F.avg(F.log(F.col("c").cast("double") / F.col("t"))), 4).alias(
                "cross_entropy"
            ),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Benchmark decontamination
# --------------------------------------------------------------------------

_CONTAMINATION_ORACLE = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(ws, i.g, i.g + 7), ' ') AS g
  FROM w, LATERAL (SELECT unnest(range(1, len(ws) - 6)) AS g) i
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id < 10),
hits AS (
  SELECT grams.doc_id, count(*) AS n_overlap
  FROM grams JOIN bench USING (g)
  WHERE grams.doc_id >= 10
  GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(h.n_overlap, 0) AS BIGINT) AS n_overlap,
       coalesce(h.n_overlap, 0) >= 3 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id >= 10
ORDER BY d.doc_id
"""


@register("text_contamination_check", oracle=_CONTAMINATION_ORACLE, tags=("llm", "text", "quality"))
def text_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: count each training doc's distinct
    8-gram overlaps with a held-out benchmark set (docs 0-9 stand in)
    and flag docs with >= 3 shared 8-grams — the eval-leakage gate every
    production training pipeline runs. The benchmark's distinct 8-grams
    are a broadcastable set (benchmarks are MBs, corpora are TBs); the
    check is one semi-join-shaped equi-join on the gram string plus a
    count — no pairwise doc comparison exists anywhere in the plan."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    grams8 = F.when(
        F.size(ws) >= 8,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(ws) - 7),
                lambda i: F.concat_ws(" ", F.slice(ws, i, F.lit(8))),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = docs.select("doc_id", F.explode(grams8).alias("g"))
    bench = grams.filter(F.col("doc_id") < 10).select("g").dropDuplicates()
    hits = (
        grams.filter(F.col("doc_id") >= 10)
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        docs.filter(F.col("doc_id") >= 10)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) >= 3).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Repetition / boilerplate detection
# --------------------------------------------------------------------------

_REPETITION_ORACLE = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tg AS (
  SELECT doc_id, array_to_string(list_slice(ws, i.g, i.g + 2), ' ') AS g
  FROM w, LATERAL (SELECT unnest(range(1, len(ws) - 1)) AS g) i
),
counts AS (
  SELECT doc_id, g, count(*) AS c FROM tg GROUP BY 1, 2
),
stats AS (
  SELECT doc_id, sum(c) AS n_trigrams, max(c) AS top_c FROM counts GROUP BY 1
)
SELECT doc_id,
       CAST(n_trigrams AS BIGINT) AS n_trigrams,
       round(CAST(top_c AS DOUBLE) / n_trigrams, 4) AS top_trigram_share,
       CAST(top_c AS DOUBLE) / n_trigrams > 0.2 AS is_repetitive
FROM stats
ORDER BY doc_id
"""


@register("text_repetition_ratio", oracle=_REPETITION_ORACLE, tags=("llm", "text", "quality"))
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition detector (Gopher-rule shape): the share of a doc's
    trigrams taken by its single most frequent trigram — boilerplate,
    scraped menus, and degenerate generations score high. Two stacked
    aggregations on the same doc_id-keyed shuffle (trigram counts, then
    per-doc max/sum); the threshold flag uses an exact rational so both
    engines agree bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    trigrams = F.when(
        F.size(ws) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 2),
            lambda i: F.concat_ws(" ", F.slice(ws, i, F.lit(3))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    counts = (
        docs.select("doc_id", F.explode(trigrams).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        counts.groupBy("doc_id")
        .agg(F.sum("c").alias("n_trigrams"), F.max("c").alias("top_c"))
        .select(
            "doc_id",
            F.col("n_trigrams").cast("long").alias("n_trigrams"),
            F.round(F.col("top_c").cast("double") / F.col("n_trigrams"), 4).alias(
                "top_trigram_share"
            ),
            (F.col("top_c").cast("double") / F.col("n_trigrams") > 0.2).alias("is_repetitive"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Per-source corpus scorecard (composite of the quality signals)
# --------------------------------------------------------------------------

_SCORECARD_ORACLE = """
WITH w AS (SELECT doc_id, source, text, string_split(text, ' ') AS ws FROM documents),
rep AS (
  SELECT doc_id, max(c) * 1.0 / sum(c) AS top_share FROM (
    SELECT doc_id, array_to_string(list_slice(ws, i.g, i.g + 2), ' ') AS g, count(*) AS c
    FROM w, LATERAL (SELECT unnest(range(1, len(ws) - 1)) AS g) i
    GROUP BY 1, 2
  ) GROUP BY doc_id
)
SELECT
  w.source,
  CAST(count(*) AS BIGINT) AS n_docs,
  round(1.0 - CAST(count(DISTINCT md5(w.text)) AS DOUBLE) / count(*), 4) AS dup_rate,
  CAST(round(avg(len(w.ws)), 0) AS BIGINT) AS avg_tokens,
  round(avg(rep.top_share), 4) AS avg_top_trigram_share,
  CAST(count(*) FILTER (WHERE rep.top_share > 0.2) AS BIGINT) AS n_repetitive
FROM w JOIN rep USING (doc_id)
GROUP BY 1
ORDER BY 1
"""


@register("pipeline_source_scorecard", oracle=_SCORECARD_ORACLE, tags=("llm", "quality", "pipeline"))
def pipeline_source_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus health scorecard: doc count, exact-dup rate,
    mean length, and repetition statistics rolled up by provenance —
    the dashboard a data-acquisition team reviews before admitting a
    source into the training mix. Each signal is itself a bounded
    aggregate (dup rate via distinct content hashes — 16 bytes per doc
    shuffled, never text; repetition via the trigram-count agg); the
    per-source rollup adds one tiny groupBy. Composite queries like
    this are why every signal is expression-based: they fuse into one
    DAG instead of N passes."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    trigrams = F.when(
        F.size(ws) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 2),
            lambda i: F.concat_ws(" ", F.slice(ws, i, F.lit(3))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    rep = (
        docs.select("doc_id", F.explode(trigrams).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg((F.max("c") * 1.0 / F.sum("c")).alias("top_share"))
    )
    return (
        docs.select("doc_id", "source", F.md5("text").alias("h"), F.size(ws).alias("n_tokens"))
        .join(rep, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(1.0 - F.countDistinct("h").cast("double") / F.count(F.lit(1)), 4).alias(
                "dup_rate"
            ),
            F.round(F.avg("n_tokens"), 0).cast("long").alias("avg_tokens"),
            F.round(F.avg("top_share"), 4).alias("avg_top_trigram_share"),
            F.sum((F.col("top_share") > 0.2).cast("long")).alias("n_repetitive"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Exact k-per-group sampling
# --------------------------------------------------------------------------

_K_PER_GROUP_ORACLE = """
SELECT event_type, event_id, user_id
FROM (
  SELECT event_type, event_id, user_id,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
  FROM events
)
WHERE rn <= 50
ORDER BY event_type, event_id
"""


@register("sample_k_per_group", oracle=_K_PER_GROUP_ORACLE, tags=("llm", "sampling"))
def sample_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly k examples per class, deterministically: rank rows within
    each group by the md5 of their key (a stable pseudo-random order
    both engines compute identically) and keep the first 50 — the
    "balanced few-shot / eval subset" builder. Unlike sampleBy()
    fractions, the output size per class is exact; unlike ORDER BY
    rand(), reruns and engines agree. Spark's WindowGroupLimit pushes
    the rank<=k cut below the shuffle, so only ~k rows per group leave
    the map side at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), F.col("event_id")
    )
    return (
        ev.select("event_type", "event_id", "user_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 50)
        .select("event_type", "event_id", "user_id")
        .orderBy("event_type", "event_id")
    )


# --------------------------------------------------------------------------
# Median absolute deviation (robust outlier score)
# --------------------------------------------------------------------------

_MAD_ORACLE = """
WITH med AS (
  SELECT event_type, median(value) AS med FROM events GROUP BY 1
),
mad AS (
  SELECT e.event_type, med.med, median(abs(e.value - med.med)) AS mad
  FROM events e JOIN med USING (event_type)
  GROUP BY e.event_type, med.med
)
SELECT event_type,
       round(med, 4) AS med,
       round(mad, 4) AS mad,
       CAST((SELECT count(*) FROM events e2
             WHERE e2.event_type = mad.event_type
               AND abs(e2.value - mad.med) > 3 * 1.4826 * mad.mad) AS BIGINT)
         AS n_outliers
FROM mad
ORDER BY event_type
"""


@register("agg_mad_robust", oracle=_MAD_ORACLE, tags=("analytics", "agg", "robust"))
def agg_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per group plus the count of 3-sigma
    (MAD-scaled) outliers — the robust alternative to z-scores when the
    data itself contains the outliers that would corrupt a mean/stddev
    threshold. Two median passes (center, then deviations) sharing the
    group key's partitioning, then a counting join — the standard
    robust-statistics shape; medians swap to KLL sketches when groups
    stop fitting a sort (agg_kll_quantiles is that path)."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(F.median(F.abs(F.col("value") - F.col("med"))).alias("mad"))
    )
    outliers = (
        ev.join(F.broadcast(mad), "event_type")
        .filter(F.abs(F.col("value") - F.col("med")) > 3 * 1.4826 * F.col("mad"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_outliers"))
    )
    return (
        mad.join(outliers, "event_type", "left")
        .select(
            "event_type",
            F.round("med", 4).alias("med"),
            F.round("mad", 4).alias("mad"),
            F.coalesce("n_outliers", F.lit(0)).alias("n_outliers"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Language mix per source
# --------------------------------------------------------------------------

_LANG_MIX_ORACLE = """
WITH counts AS (
  SELECT source, lang, count(*) AS c FROM documents GROUP BY 1, 2
),
tot AS (SELECT source, sum(c) AS t FROM counts GROUP BY 1),
dom AS (
  SELECT source, lang AS dominant_lang, c AS dom_c
  FROM (
    SELECT source, lang, c,
           row_number() OVER (PARTITION BY source ORDER BY c DESC, lang DESC) AS rn
    FROM counts
  ) WHERE rn = 1
)
SELECT c.source,
       CAST(count(*) AS BIGINT) AS n_langs,
       d.dominant_lang,
       round(CAST(d.dom_c AS DOUBLE) / t.t, 4) AS dominant_share
FROM counts c
JOIN tot t USING (source)
JOIN dom d ON d.source = c.source
GROUP BY c.source, d.dominant_lang, d.dom_c, t.t
ORDER BY c.source
"""


@register("corpus_language_mix", oracle=_LANG_MIX_ORACLE, tags=("llm", "quality"))
def corpus_language_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language composition per source: how many languages, which
    dominates, and its share — the first thing a curation review asks of
    a new crawl source (a 'German news' source that is 40% English is a
    labeling problem). One (source, lang) count aggregate feeds all
    three outputs; the dominant language ties break lexically via
    max_by on a (count, lang) struct so both engines pick the same
    winner."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    tot = counts.groupBy("source").agg(F.sum("c").alias("t"))
    dom = counts.groupBy("source").agg(
        F.max_by("lang", F.struct(F.col("c"), F.col("lang"))).alias("dominant_lang"),
        F.max("c").alias("dom_c"),
    )
    return (
        counts.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_langs"))
        .join(tot, "source")
        .join(dom, "source")
        .select(
            "source",
            "n_langs",
            "dominant_lang",
            F.round(F.col("dom_c").cast("double") / F.col("t"), 4).alias("dominant_share"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Curation yield funnel
# --------------------------------------------------------------------------

_YIELD_ORACLE = """
WITH w AS (SELECT doc_id, n_chars, string_split(text, ' ') AS ws FROM documents),
rep AS (
  SELECT doc_id, max(c) * 1.0 / sum(c) AS top_share FROM (
    SELECT doc_id, array_to_string(list_slice(ws, i.g, i.g + 2), ' ') AS g, count(*) AS c
    FROM w, LATERAL (SELECT unnest(range(1, len(ws) - 1)) AS g) i
    GROUP BY 1, 2
  ) GROUP BY doc_id
),
staged AS (
  SELECT w.doc_id,
         len(w.ws) >= 20 AND w.n_chars <= 2000 AS pass_length,
         rep.top_share <= 0.2 AS pass_repetition
  FROM w JOIN rep USING (doc_id)
)
SELECT
  CAST(count(*) AS BIGINT) AS n_input,
  CAST(count(*) FILTER (WHERE pass_length) AS BIGINT) AS n_after_length,
  CAST(count(*) FILTER (WHERE pass_length AND pass_repetition) AS BIGINT)
    AS n_after_repetition,
  round(CAST(count(*) FILTER (WHERE pass_length AND pass_repetition) AS DOUBLE)
        / count(*), 4) AS yield_rate
FROM staged
"""


@register("pipeline_curation_yield", oracle=_YIELD_ORACLE, tags=("llm", "quality", "pipeline"))
def pipeline_curation_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation yield funnel: how many documents survive each quality
    gate (length band, then repetition), and the final yield rate — the
    number that decides whether a crawl source is worth its storage.
    Gates are evaluated as boolean columns in ONE pass (conditional
    counts, not one filtered scan per stage), so adding a gate adds an
    expression, not a scan — the same single-pass discipline as
    events_funnel."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    trigrams = F.when(
        F.size(ws) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 2),
            lambda i: F.concat_ws(" ", F.slice(ws, i, F.lit(3))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    rep = (
        docs.select("doc_id", F.explode(trigrams).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg((F.max("c") * 1.0 / F.sum("c")).alias("top_share"))
    )
    staged = (
        docs.select("doc_id", "n_chars", F.size(ws).alias("n_tokens"))
        .join(rep, "doc_id")
        .select(
            ((F.col("n_tokens") >= 20) & (F.col("n_chars") <= 2000)).alias("pass_length"),
            (F.col("top_share") <= 0.2).alias("pass_repetition"),
        )
    )
    both = F.col("pass_length") & F.col("pass_repetition")
    return staged.agg(
        F.count(F.lit(1)).alias("n_input"),
        F.sum(F.col("pass_length").cast("long")).alias("n_after_length"),
        F.sum(both.cast("long")).alias("n_after_repetition"),
        F.round(F.sum(both.cast("long")).cast("double") / F.count(F.lit(1)), 4).alias(
            "yield_rate"
        ),
    )
