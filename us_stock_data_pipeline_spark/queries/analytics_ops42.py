"""Round-34 analytics, part 42: Markov matrix powers by squaring (k-step
transition probabilities) and embedding hubness auditing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# k-step transition probabilities via matrix power (squaring)
# --------------------------------------------------------------------------

_SQUARINGS = 3  # T^(2^3) = 8-step transition probabilities


def _matpow_oracle() -> str:
    """T as a relational edge list (src, dst, p_e6); squaring is a
    self-join + groupBy, repeated {_SQUARINGS} times, re-quantized to
    1e-6 after every squaring — the same generator emits both sides."""
    ctes = [
        """t0 AS MATERIALIZED (
  SELECT src, dst, CAST(n * 1000000 // sum(n) OVER (PARTITION BY src) AS BIGINT)
           AS p_e6
  FROM (
    SELECT s.event_type AS src, s.nxt AS dst, CAST(count(*) AS BIGINT) AS n
    FROM (
      SELECT event_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS nxt
      FROM events
    ) s
    WHERE s.nxt IS NOT NULL
    GROUP BY 1, 2
  )
)"""
    ]
    for i in range(1, _SQUARINGS + 1):
        prev = f"t{i - 1}"
        ctes.append(
            f"""t{i} AS MATERIALIZED (
  SELECT a.src, b.dst,
         CAST(sum(a.p_e6 * b.p_e6) // 1000000 AS BIGINT) AS p_e6
  FROM {prev} a JOIN {prev} b ON b.src = a.dst
  GROUP BY a.src, b.dst
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT src, dst, p_e6 AS p8_e6 FROM t{_SQUARINGS} ORDER BY src, dst"
    )


@register("events_markov_matrix_power", oracle=_matpow_oracle(), tags=("analytics", "graph"))
def events_markov_matrix_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-step Markov transition probabilities by MATRIX SQUARING over a
    relational edge list: T^8 in {_SQUARINGS} squarings instead of 7
    multiplies, each squaring a self-join on the shared state key plus
    a groupBy — the standard trick for "where will a session be 8
    clicks from now", and the relational form of dense matrix power
    (states x states rows, never a dense array). Every squaring
    re-quantizes to 1e-6 BIGINTs, so both engines walk the identical
    fixed-point trajectory (the oracle is the same loop unrolled into
    MATERIALIZED CTEs by the same generator — the k-core discipline).
    The one-step matrix itself comes from the per-user lead() pass
    `events_markov_transition` also uses. At 100 TB the edge list
    after the first aggregate is states^2 rows — constant — so the
    squarings are free; only the lead() pass touches facts."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    steps = (
        ev.select(
            "event_type", F.lead("event_type").over(w).alias("nxt")
        )
        .filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("nxt").alias("dst"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    t = steps.select(
        "src",
        "dst",
        F.expr(
            "CAST(n * 1000000 div sum(n) OVER (PARTITION BY src) AS BIGINT)"
        ).alias("p_e6"),
    )
    for _ in range(_SQUARINGS):
        a = t.select(F.col("src"), F.col("dst").alias("mid"), F.col("p_e6").alias("pa"))
        b = t.select(F.col("src").alias("mid"), F.col("dst"), F.col("p_e6").alias("pb"))
        t = (
            a.join(F.broadcast(b), "mid")
            .groupBy("src", "dst")
            .agg(
                F.expr("CAST(sum(pa * pb) div 1000000 AS BIGINT)").alias("p_e6")
            )
        )
    return t.select("src", "dst", F.col("p_e6").alias("p8_e6")).orderBy("src", "dst")


# --------------------------------------------------------------------------
# Embedding hubness audit
# --------------------------------------------------------------------------

_HUB_K = 3
_HUB_QUERY_MOD = 5  # every 5th vector queries; all vectors are candidates

_HUBNESS_ORACLE = f"""
WITH pairs AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         CAST(floor(list_cosine_similarity(
                      list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
                      list_transform(c.embedding, x -> CAST(x AS DOUBLE)))
                    * 10000 + 0.5) AS BIGINT) AS cos_e4
  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
  WHERE q.vec_id % {_HUB_QUERY_MOD} = 0
),
topk AS (
  SELECT qid, cid FROM (
    SELECT qid, cid,
           row_number() OVER (PARTITION BY qid ORDER BY cos_e4 DESC, cid) AS rk
    FROM pairs
  ) WHERE rk <= {_HUB_K}
),
occ AS (
  SELECT cid, CAST(count(*) AS BIGINT) AS k_occurrence FROM topk GROUP BY cid
)
SELECT k_occurrence, CAST(count(*) AS BIGINT) AS n_vectors
FROM occ
GROUP BY k_occurrence
ORDER BY k_occurrence
"""


@register("embedding_hubness_audit", oracle=_HUBNESS_ORACLE, tags=("llm", "embedding"))
def embedding_hubness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness audit — the high-dimensional retrieval pathology: a few
    "hub" vectors appear in a disproportionate share of other points'
    top-k lists, crowding out true neighbors (and skewing any
    kNN-based dedup or RAG recall). The k-occurrence distribution
    (how many vectors appear in exactly j of the query top-{_HUB_K}
    lists) is its standard measure: a long right tail = hubs. Cosines
    are quantized 1e-4 before ranking (the knn oracle's cross-engine
    precision contract; rank ties break deterministically on cid);
    every {_HUB_QUERY_MOD}th vector queries against the full
    candidate set — the same broadcast-queries/corpus-never-shuffles
    plan as knn_bruteforce_cosine, with the occurrence count one
    extra aggregate over the top-k edge list."""
    emb = load_table(spark, sf_dir, "embeddings")
    # norms are per-VECTOR, so compute them map-side in each projection
    # (once per vector) instead of inside the pair expression (once per
    # PAIR — the original folded qn/cn per pair, tripling the dominant
    # per-pair array work; measured 17s -> ~6s at sf0.1)
    norm = "sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * x), 0D, (acc, v) -> acc + v))"
    q = emb.filter(F.col("vec_id") % _HUB_QUERY_MOD == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.expr(norm).alias("qnorm"),
    )
    c = emb.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        F.expr(norm).alias("cnorm"),
    )
    dot = "aggregate(zip_with(qe, ce, (x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, v) -> acc + v)"
    pairs = (
        c.join(F.broadcast(q), F.col("cid") != F.col("qid"))
        .select(
            "qid",
            "cid",
            F.floor(
                F.expr(f"({dot}) / (qnorm * cnorm)") * 10_000 + F.lit(0.5)
            )
            .cast("long")
            .alias("cos_e4"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos_e4").desc(), "cid")
    topk = pairs.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= _HUB_K
    )
    occ = topk.groupBy("cid").agg(F.count("*").cast("long").alias("k_occurrence"))
    return (
        occ.groupBy("k_occurrence")
        .agg(F.count("*").cast("long").alias("n_vectors"))
        .orderBy("k_occurrence")
    )
