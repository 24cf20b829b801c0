"""LLM-data-pipeline operators, part 4: near-dup CLUSTER resolution
(the step after pair finding — connected components over the dup graph,
one canonical doc per cluster), TF-IDF term scoring, and deterministic
hash-based sampling for reproducible train-set construction.

These extend the dedup family (llm_ops.py / llm_ops2.py): MinHash/LSH
and n-gram Jaccard produce PAIRS; a real corpus pipeline must then
resolve pairs into clusters and keep one representative — that
resolution is `dedup_cluster_connected` below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Connected-components cluster resolution
# --------------------------------------------------------------------------

# The fixture corpus has no natural near-dup chains (verified: zero
# consecutive-doc trigram-Jaccard pairs >= 0.3 at sf0.01), so the edge
# set is PLANTED deterministically in-query, the same pattern
# dedup_embedding_cosine uses: doc i links to doc i-1 iff
# md5(i-1) starts below '8' (~50% edge density -> geometric run lengths,
# multi-hop chains up to ~log2(N) docs). Both engines compute the
# identical md5, so the oracle sees the identical graph.
_EDGE_COND_SQL = "substring(md5(CAST(d.doc_id - 1 AS VARCHAR)), 1, 1) < '8'"

_CLUSTER_ORACLE = f"""
WITH RECURSIVE par AS (
  SELECT d.doc_id AS id,
         CASE WHEN p.doc_id IS NOT NULL AND {_EDGE_COND_SQL}
              THEN d.doc_id - 1 ELSE d.doc_id END AS parent
  FROM documents d LEFT JOIN documents p ON p.doc_id = d.doc_id - 1
),
walk(id, cur) AS (
  SELECT id, parent FROM par
  UNION ALL
  SELECT w.id, p.parent FROM walk w JOIN par p ON p.id = w.cur WHERE p.parent <> w.cur
),
roots AS (SELECT id, min(cur) AS cluster_id FROM walk GROUP BY id),
sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM roots GROUP BY 1)
SELECT r.id AS doc_id, r.cluster_id, s.cluster_size,
       r.id = r.cluster_id AS is_canonical
FROM roots r JOIN sizes s USING (cluster_id)
ORDER BY doc_id
"""


@register("dedup_cluster_connected", oracle=_CLUSTER_ORACLE, tags=("llm", "dedup", "graph"))
def dedup_cluster_connected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolve near-dup EDGES into clusters with one canonical doc each —
    connected components by pointer doubling (label <- label[label]),
    which converges in O(log(chain length)) shuffle rounds instead of
    the O(chain length) of naive neighbor propagation. Each round is one
    self-equi-join on the label key; convergence is checked with a
    cheap emptiness probe. This is the dataflow GraphFrames/GraphX CC
    runs underneath; for arbitrary (non-forest) dup graphs the same
    loop runs over the large-star/small-star edge rewrite, identical
    round complexity. The reference has no dedup at all (SURVEY §1.4) —
    this is the 100 TB corpus-curation step its append-only design
    lacks."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    prev = docs.select((F.col("doc_id") + 1).alias("doc_id"), F.lit(1).alias("has_prev"))
    edge_cond = F.substring(F.md5((F.col("doc_id") - 1).cast("string")), 1, 1) < "8"
    labels = (
        docs.join(prev, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("has_prev").isNotNull() & edge_cond, F.col("doc_id") - 1)
            .otherwise(F.col("doc_id"))
            .alias("parent"),
        )
        .transform(registry.track_persist)
    )
    for _ in range(20):  # safety cap >> log2(corpus size); converges in ~5
        grand = labels.select(F.col("doc_id").alias("parent"), F.col("parent").alias("grand"))
        step = (
            labels.join(grand, "parent")
            .select("doc_id", F.col("parent").alias("old"), F.col("grand").alias("parent"))
            .transform(registry.track_persist)
        )
        # count(), not isEmpty(): the count fully materializes this
        # round's cache, so the next round reads cached blocks. A
        # partial probe (isEmpty/take) caches only the partitions it
        # touched and every later round recomputes the whole join chain
        # from the start — measured 127s vs 17s at sf0.1.
        changed = step.filter(F.col("old") != F.col("parent")).count()
        labels.unpersist()
        labels = step.select("doc_id", "parent")
        if changed == 0:
            break
    roots = labels.select("doc_id", F.col("parent").alias("cluster_id"))
    sizes = roots.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        roots.join(sizes, "cluster_id")
        .select(
            "doc_id",
            "cluster_id",
            "cluster_size",
            (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# TF-IDF term scoring
# --------------------------------------------------------------------------

_TFIDF_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
),
df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1
),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 4) AS score
  FROM tf JOIN df USING (term) CROSS JOIN n
  WHERE tf.doc_id < 100
),
ranked AS (
  SELECT doc_id, term, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
  FROM scored
)
SELECT doc_id, rnk, term, score FROM ranked WHERE rnk <= 3
ORDER BY doc_id, rnk
"""


@register("text_tfidf", oracle=_TFIDF_ORACLE, tags=("llm", "text"))
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (first 100 docs): the classic
    relevance/keyword-extraction score, as two partial-aggregable word
    counts (TF per doc, DF per term) joined on the term — the inverted-
    index shape again, never a dense matrix. IDF's N/df uses the full
    corpus even though output is limited to 100 docs (limiting df to the
    output slice would corrupt the statistic). Ties broken by term so
    the top-3 is deterministic on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.filter(F.col("doc_id") < 100)
        .join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 4).alias(
                "score"
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "rnk", "term", "score")
        .orderBy("doc_id", "rnk")
    )


# --------------------------------------------------------------------------
# Deterministic hash-based sampling
# --------------------------------------------------------------------------

_SAMPLE_ORACLE = """
WITH b AS (
  SELECT event_id, event_type,
         substring(md5(CAST(event_id AS VARCHAR)), 1, 2) AS bucket
  FROM events
)
SELECT event_id, event_type, bucket
FROM b
WHERE bucket < CASE event_type
  WHEN 'purchase' THEN 'zz'
  WHEN 'error'    THEN '40'
  WHEN 'click'    THEN '28'
  ELSE '14' END
ORDER BY event_id
"""


@register("sample_deterministic", oracle=_SAMPLE_ORACLE, tags=("llm", "sampling"))
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified DETERMINISTIC sampling: keep a row iff the first hex
    byte of md5(event_id) falls below a per-stratum threshold (purchase
    100%, error 25%, click ~16%, rest ~8%). Unlike rand()-based
    sample()/sampleBy(), the decision is a pure function of the key —
    reproducible across runs, engines, and retries (a training-data
    pipeline requirement: re-running a failed shard must select the
    SAME rows), join-stable (the same ids sample together in every
    table), and needs no seed plumbing. Map-side only: no shuffle, no
    state, and the filter composes with parquet scan pruning on any
    pre-partitioned layout."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.substring(F.md5(F.col("event_id").cast("string")), 1, 2)
    threshold = (
        F.when(F.col("event_type") == "purchase", "zz")
        .when(F.col("event_type") == "error", "40")
        .when(F.col("event_type") == "click", "28")
        .otherwise("14")
    )
    return (
        ev.select("event_id", "event_type", bucket.alias("bucket"), threshold.alias("thr"))
        .filter(F.col("bucket") < F.col("thr"))
        .select("event_id", "event_type", "bucket")
        .orderBy("event_id")
    )
