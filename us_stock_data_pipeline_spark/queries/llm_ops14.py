"""Round-7 LLM-data additions, part 14: hapax vocabulary analysis,
n-gram saturation curve, U-shaped multi-touch attribution, and
embedding centroid distances.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Hapax legomena vocabulary profile
# --------------------------------------------------------------------------

_HAPAX_ORACLE = """
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
),
freq AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS f FROM tok GROUP BY source, w
)
SELECT source,
       CAST(sum(f) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS vocab,
       CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
       CAST(sum(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS BIGINT) AS dis,
       floor(CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
             * 10000 + 0.5) / 10000 AS hapax_ratio
FROM freq
GROUP BY source
ORDER BY source
"""


@register("text_hapax_legomena", oracle=_HAPAX_ORACLE, tags=("llm", "text"))
def text_hapax_legomena(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax/dis legomena vocabulary profile per source: token count,
    vocabulary size, words seen exactly once and exactly twice, and
    the hapax share of vocabulary — the Good-Turing mass estimate that
    predicts how much NEW vocabulary more data from this source will
    bring (`text_zipf_slope` fits the frequency curve's shape; this
    measures its unseen tail). Pure explode -> two-level groupBy with
    full map-side combine on (source, word); the second agg runs on
    the vocabulary table, which is sublinear in corpus size. No UDFs,
    all exact integers but the one terminal ratio."""
    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select("source", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    return (
        freq.groupBy("source")
        .agg(
            F.sum("f").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("vocab"),
            F.sum(F.when(F.col("f") == 1, 1).otherwise(0)).cast("long").alias("hapax"),
            F.sum(F.when(F.col("f") == 2, 1).otherwise(0)).cast("long").alias("dis"),
            (
                F.floor(
                    F.sum(F.when(F.col("f") == 1, 1).otherwise(0)).cast("double")
                    / F.count(F.lit(1))
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("hapax_ratio"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# N-gram saturation curve (distinct/total by n)
# --------------------------------------------------------------------------

_SATURATION_NS = (1, 2, 3)

_SAT_ORACLE = """
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
grams AS (
  SELECT n.n AS n,
         unnest(list_transform(
           generate_series(1, len(toks) - n.n + 1),
           i -> array_to_string(list_slice(toks, i, i + n.n - 1), ' '))) AS g
  FROM tok, (SELECT unnest([1, 2, 3]) AS n) n
  WHERE len(toks) >= n.n
)
SELECT n,
       CAST(count(*) AS BIGINT) AS total_ngrams,
       CAST(count(DISTINCT g) AS BIGINT) AS distinct_ngrams,
       floor(CAST(count(DISTINCT g) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000
         AS novelty_ratio
FROM grams
GROUP BY n
ORDER BY n
"""


@register("corpus_ngram_saturation", oracle=_SAT_ORACLE, tags=("llm", "dedup"))
def corpus_ngram_saturation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram saturation curve: for n = 1..3, total vs distinct n-gram
    counts across the corpus and their ratio — the repetition-depth
    diagnostic that tells a dedup pipeline which shingle width
    separates boilerplate from fresh text (`dedup_ngram_jaccard` picks
    ONE n and dedups with it; this measures what each n would see).
    N-grams are generated JVM-side with transform over an index
    sequence + slice (no UDF); the distinct per n is Spark's partial
    hash distinct. The explode multiplies data by ~3x in-stage but
    shuffles once on the gram key; at 100 TB one would swap the exact
    count(distinct) for approx_count_distinct without touching the
    generation side."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.split("text", " ").alias("toks"))
    per_n = []
    for n in _SATURATION_NS:
        grams = tok.filter(F.size("toks") >= n).select(
            F.lit(n).alias("n"),
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(toks) - {n} + 1),"
                    f" i -> concat_ws(' ', slice(toks, i, {n})))"
                )
            ).alias("g"),
        )
        per_n.append(grams)
    allg = reduce(lambda a, b: a.unionByName(b), per_n)
    return (
        allg.groupBy("n")
        .agg(
            F.count(F.lit(1)).cast("long").alias("total_ngrams"),
            F.countDistinct("g").cast("long").alias("distinct_ngrams"),
            (
                F.floor(
                    F.countDistinct("g").cast("double")
                    / F.count(F.lit(1))
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("novelty_ratio"),
        )
        .orderBy("n")
    )


# --------------------------------------------------------------------------
# U-shaped (position-based) multi-touch attribution
# --------------------------------------------------------------------------

_UATTR_ORACLE = """
WITH fp AS (
  SELECT user_id, min(epoch_us(ts)) AS p_us
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
touches AS (
  SELECT e.user_id, e.event_type, epoch_us(e.ts) AS t_us, e.event_id
  FROM events e JOIN fp ON fp.user_id = e.user_id
  WHERE e.event_type <> 'purchase' AND epoch_us(e.ts) < fp.p_us
),
ranked AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY t_us, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS k
  FROM touches
),
credited AS (
  SELECT event_type,
         CAST(round(CASE WHEN k = 1 THEN 1000000.0
                         WHEN k = 2 THEN 500000.0
                         WHEN rn = 1 OR rn = k THEN 400000.0
                         ELSE 200000.0 / (k - 2) END) AS BIGINT) AS micro
  FROM ranked
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_touches,
       CAST(sum(micro) AS BIGINT) AS credit_micro,
       floor(CAST(sum(micro) AS DOUBLE) / 10000 + 0.5) / 100 AS credit
FROM credited
GROUP BY event_type
ORDER BY event_type
"""


@register("events_attribution_ushape", oracle=_UATTR_ORACLE, tags=("analytics", "attribution"))
def events_attribution_ushape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution: every touch
    before a user's first purchase shares credit 40% first / 40% last
    / 20% split across the middle — the marketing standard between
    the two extremes `events_attribution_last_touch` covers. Per-touch
    credit is QUANTIZED to integer micro-credits by an identical
    closed-form expression on both engines before summation, so the
    channel totals are exact integer sums no matter how Spark orders
    the partial aggregates. One semi-join against the first-purchase
    watermark (aggregate then join, both keyed on user_id), one
    user-partitioned rank window, one channel-keyed agg — two
    shuffles total, each on a natural key."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(us).alias("p_us"))
    )
    touches = (
        ev.filter(F.col("event_type") != "purchase")
        .join(fp, "user_id")
        .filter(us < F.col("p_us"))
        .select("user_id", "event_type", us.alias("t_us"), "event_id")
    )
    wu = Window.partitionBy("user_id")
    ranked = touches.select(
        "user_id",
        "event_type",
        F.row_number().over(wu.orderBy("t_us", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(wu).alias("k"),
    )
    micro = (
        F.round(
            F.when(F.col("k") == 1, F.lit(1000000.0))
            .when(F.col("k") == 2, F.lit(500000.0))
            .when((F.col("rn") == 1) | (F.col("rn") == F.col("k")), F.lit(400000.0))
            .otherwise(F.lit(200000.0) / (F.col("k") - 2))
        )
        .cast("long")
        .alias("micro")
    )
    credited = ranked.select("event_type", micro)
    return (
        credited.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            F.sum("micro").cast("long").alias("credit_micro"),
            (
                F.floor(F.sum("micro").cast("double") / 10000 + F.lit(0.5)) / 100
            ).alias("credit"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Embedding label-centroid distance matrix
# --------------------------------------------------------------------------

_CENTROID_ORACLE = """
WITH q AS (
  SELECT label, CAST(d.dim AS INTEGER) AS dim,
         CAST(round(CAST(embedding[d.dim] AS DOUBLE) * 10000) AS BIGINT) AS qv
  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS dim) d
),
cent AS (
  SELECT label, dim,
         CAST(sum(qv) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
  FROM q GROUP BY label, dim
),
pairs AS (
  SELECT a.label AS label_a, b.label AS label_b,
         sum(power(CAST(a.s AS DOUBLE) / a.n / 10000
                   - CAST(b.s AS DOUBLE) / b.n / 10000, 2)) AS d2
  FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
  GROUP BY a.label, b.label
)
SELECT CAST(label_a AS BIGINT) AS label_a,
       CAST(label_b AS BIGINT) AS label_b,
       floor(sqrt(d2) * 10000 + 0.5) / 10000 AS centroid_dist
FROM pairs
ORDER BY label_a, label_b
"""


@register("embedding_centroid_distance", oracle=_CENTROID_ORACLE, tags=("llm", "embedding"))
def embedding_centroid_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-label centroid distance matrix: mean vector per label,
    then Euclidean distance for every label pair — the
    cluster-separation readout that tells an embedding pipeline
    whether classes are collapsing (`embedding_norm_audit` checks
    magnitudes; this checks GEOMETRY between groups). Per-dim sums are
    exact integers over quantized components via posexplode + groupBy
    (label, dim) — the fact-scale work, fully map-side-combinable; the
    pair join runs on the labels x dims centroid table (hundreds of
    rows however big the corpus), grouped to labels^2/2 output rows.
    The 64-term distance sums are doubles of near-unit magnitude,
    rounded 4dp."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "label", F.posexplode("embedding").alias("pos", "v")
    ).select(
        "label",
        (F.col("pos") + 1).alias("dim"),
        F.round(F.col("v").cast("double") * 10000).cast("long").alias("qv"),
    )
    cent = q.groupBy("label", "dim").agg(
        F.sum("qv").cast("long").alias("s"), F.count(F.lit(1)).cast("long").alias("n")
    )
    a, b = cent.alias("a"), cent.alias("b")
    da = F.col("a.s").cast("double") / F.col("a.n") / 10000
    db = F.col("b.s").cast("double") / F.col("b.n") / 10000
    pairs = (
        a.join(
            b,
            (F.col("a.dim") == F.col("b.dim")) & (F.col("a.label") < F.col("b.label")),
        )
        .groupBy(
            F.col("a.label").alias("label_a"), F.col("b.label").alias("label_b")
        )
        .agg(F.sum(F.pow(da - db, F.lit(2))).alias("d2"))
    )
    return pairs.select(
        F.col("label_a").cast("long").alias("label_a"),
        F.col("label_b").cast("long").alias("label_b"),
        (F.floor(F.sqrt("d2") * 10000 + F.lit(0.5)) / 10000).alias("centroid_dist"),
    ).orderBy("label_a", "label_b")
