"""Round-58 analytics, part 57: mutual-kNN reciprocity audit and
Markov entropy rate of the event stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Mutual-kNN reciprocity (embedding-manifold health)
# --------------------------------------------------------------------------

_MKNN_K = 5
_MKNN_SAMPLE = 500  # fixed-size audit sample: the O(s^2) cost is constant

_MKNN_ORACLE = f"""
WITH sample AS (
  -- deterministic fixed-size sample by a portable integer mix: the
  -- reciprocity audit is a STATISTIC, so it runs on {_MKNN_SAMPLE}
  -- vectors no matter how big the corpus is (the unsampled graph is
  -- O(n^2) and measured 107x wall at 10x data before this cap)
  SELECT vec_id, label, embedding FROM (
    SELECT *, row_number() OVER (
      ORDER BY ((vec_id % 1048576) * 2654435761) % 2147483648, vec_id) AS hrank
    FROM embeddings
  ) WHERE hrank <= {_MKNN_SAMPLE}
),
pairs AS (
  SELECT a.vec_id AS src, a.label AS src_label, b.vec_id AS dst,
         list_cosine_similarity(
           list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
           list_transform(b.embedding, x -> CAST(x AS DOUBLE))) AS cos_sim
  FROM sample a JOIN sample b ON b.vec_id <> a.vec_id
),
ranked AS (
  SELECT src, src_label, dst,
         row_number() OVER (PARTITION BY src ORDER BY cos_sim DESC, dst) AS rnk
  FROM pairs
),
edges AS (
  SELECT src, src_label, dst FROM ranked WHERE rnk <= {_MKNN_K}
),
mutual AS (
  SELECT e.src_label, CAST(count(*) AS BIGINT) AS n_mutual
  FROM edges e JOIN edges r ON r.src = e.dst AND r.dst = e.src
  GROUP BY e.src_label
),
per_label AS (
  SELECT src_label, CAST(count(DISTINCT src) AS BIGINT) AS n_vecs,
         CAST(count(*) AS BIGINT) AS n_edges
  FROM edges GROUP BY src_label
)
SELECT p.src_label AS label, p.n_vecs, p.n_edges,
       CAST(coalesce(m.n_mutual, 0) AS BIGINT) AS n_mutual,
       CAST(coalesce(m.n_mutual, 0) * 1000000 // p.n_edges AS BIGINT) AS mutual_e6
FROM per_label p LEFT JOIN mutual m ON m.src_label = p.src_label
ORDER BY p.src_label
"""


@register("embedding_mutual_knn", oracle=_MKNN_ORACLE, tags=("llm", "similarity", "graph"))
def embedding_mutual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-kNN reciprocity per label: build the exact top-{_MKNN_K}
    cosine graph over the whole corpus and measure what fraction of
    edges are reciprocated — low reciprocity marks hub-dominated,
    unhealthy embedding manifolds where retrieval quality collapses
    (`embedding_hubness_audit` counts k-occurrence skew; reciprocity
    is the edge-level view, and SemDeDup-style pruning assumes it is
    high). Ranks are deterministic (cos DESC, id ASC tiebreak, same
    as `knn_bruteforce_cosine`); the mutual join is an exact
    self-equi-join on the (src,dst) edge set — k*n rows, tiny.
    SCALE: reciprocity is a statistic, so the graph builds over a
    DETERMINISTIC {_MKNN_SAMPLE}-vector sample (portable integer-mix
    ranking) — constant O(s^2) cost at any corpus size; the unsampled
    graph measured 107x wall at 10x data in docs/SCALE_CURVE.md before
    this cap. For exhaustive (non-audit) graphs swap the sample CTE
    for the `ann_ivf_cosine` bucketed candidate stream. Plan: one
    fixed-size self-join (build side broadcast), rank window keyed by
    src, then an edge-keyed equi-join at k*s scale."""
    emb_all = load_table(spark, sf_dir, "embeddings")
    w_sample = Window.orderBy(
        ((F.col("vec_id") % 1048576) * 2654435761) % 2147483648, F.col("vec_id")
    )
    emb = (
        emb_all.withColumn("hrank", F.row_number().over(w_sample))
        .filter(F.col("hrank") <= _MKNN_SAMPLE)
        .drop("hrank")
    )
    # the corpus lands as ONE parquet split; without an explicit fan-out the
    # O(s^2) scoring stage runs on a single task (measured 61 s at sf0.1 ->
    # ~4 s at 32-way). Broadcast the build side (the sample is fixed-size);
    # stream side repartitions to the executor width.
    a = emb.repartition(spark.sparkContext.defaultParallelism).select(
        F.col("vec_id").alias("src"), F.col("label").alias("src_label"),
        F.col("embedding").alias("ea"),
    )
    b = F.broadcast(
        emb.select(F.col("vec_id").alias("dst"), F.col("embedding").alias("eb"))
    )
    prod = F.zip_with("ea", "eb", lambda x, y: x.cast("double") * y.cast("double"))
    dot = F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)
    norm_a = F.sqrt(
        F.aggregate(F.col("ea"), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    norm_b = F.sqrt(
        F.aggregate(F.col("eb"), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    pairs = a.join(b, F.col("dst") != F.col("src")).select(
        "src", "src_label", "dst", (dot / (norm_a * norm_b)).alias("cos_sim")
    )
    w = Window.partitionBy("src").orderBy(F.desc("cos_sim"), F.asc("dst"))
    edges = (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _MKNN_K)
        .select("src", "src_label", "dst")
    )
    rev = edges.select(F.col("src").alias("r_src"), F.col("dst").alias("r_dst"))
    mutual = (
        edges.join(rev, (F.col("r_src") == F.col("dst")) & (F.col("r_dst") == F.col("src")))
        .groupBy("src_label")
        .agg(F.count(F.lit(1)).cast("long").alias("n_mutual"))
    )
    per_label = edges.groupBy("src_label").agg(
        F.countDistinct("src").cast("long").alias("n_vecs"),
        F.count(F.lit(1)).cast("long").alias("n_edges"),
    )
    return (
        per_label.join(mutual, "src_label", "left")
        .select(
            F.col("src_label").alias("label"),
            "n_vecs",
            "n_edges",
            F.coalesce(F.col("n_mutual"), F.lit(0)).cast("long").alias("n_mutual"),
            F.floor(
                F.coalesce(F.col("n_mutual"), F.lit(0)) * 1_000_000 / F.col("n_edges")
            )
            .cast("long")
            .alias("mutual_e6"),
        )
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# Markov entropy rate of the per-user event stream
# --------------------------------------------------------------------------

_ENTROPY_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type AS cur,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
  QUALIFY lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NOT NULL
),
trans AS (
  SELECT prev, cur, CAST(count(*) AS BIGINT) AS c FROM seq GROUP BY prev, cur
),
row_tot AS (
  SELECT prev, CAST(sum(c) AS BIGINT) AS ci FROM trans GROUP BY prev
),
tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS n,
         CAST(count(DISTINCT prev) AS BIGINT) AS n_states
  FROM trans
),
terms AS (  -- (c_ij/N) * log2(c_i. / c_ij), quantized e9 per cell -> exact sum
  SELECT CAST(floor(
           CAST(t.c AS DOUBLE) / tt.n
           * ln(CAST(r.ci AS DOUBLE) / t.c) / ln(2.0)
           * 1000000000 + 0.5) AS BIGINT) AS term_e9
  FROM trans t JOIN row_tot r ON r.prev = t.prev CROSS JOIN tot tt
)
SELECT tt.n AS n_transitions, tt.n_states,
       CAST(sum(term_e9) // 1000 AS BIGINT) AS entropy_rate_e6
FROM terms CROSS JOIN tot tt
GROUP BY tt.n, tt.n_states
"""


@register("events_entropy_rate", oracle=_ENTROPY_ORACLE, tags=("events", "stats"))
def events_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov entropy rate of the per-user event stream: H = sum_i
    pi_i H(row_i) = sum_ij (c_ij/N) log2(c_i./c_ij) bits/step over
    the empirical first-order transition matrix — the predictability
    ceiling for next-event models (H near log2(k) means the Markov
    signal is gone; `events_markov_transition` reports the matrix,
    this compresses it to the one number model-selection needs).
    Each cell's term quantizes to integer e9 BEFORE the cross-cell
    sum, so the distributed aggregation over the k^2 cells is
    order-free; the final e6 scaling is an integer floor-divide.
    Plan: one per-user lag window, a transition-matrix aggregate
    (k^2 tiny), broadcast totals — the window is the only stage that
    touches data volume."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"), F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    trans = seq.groupBy("prev", "cur").agg(F.count(F.lit(1)).cast("long").alias("c"))
    row_tot = trans.groupBy("prev").agg(F.sum("c").cast("long").alias("ci"))
    tot = trans.agg(
        F.sum("c").cast("long").alias("n"),
        F.countDistinct("prev").cast("long").alias("n_states"),
    )
    term = F.floor(
        F.col("c").cast("double")
        / F.col("n")
        * F.log(F.col("ci").cast("double") / F.col("c"))
        / F.log(F.lit(2.0))
        * 1_000_000_000
        + F.lit(0.5)
    ).cast("long")
    terms = (
        trans.join(F.broadcast(row_tot), "prev")
        .crossJoin(F.broadcast(tot))
        .select(term.alias("term_e9"), "n", "n_states")
    )
    return (
        terms.groupBy("n", "n_states")
        .agg(F.floor(F.sum("term_e9") / 1000).cast("long").alias("entropy_rate_e6"))
        .select(
            F.col("n").alias("n_transitions"),
            "n_states",
            "entropy_rate_e6",
        )
    )
