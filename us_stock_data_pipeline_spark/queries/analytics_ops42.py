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
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    # The 800k-pair brute-force cosine ran as per-pair zip_with+aggregate
    # HOFs (~5s at sf0.1 — allocation per pair, no real vectorization;
    # an unrolled 64-term codegen expression measured WORSE, 18s). Hand
    # whole candidate batches to numpy instead (guide §4.2) with the
    # arithmetic kept BIT-IDENTICAL to the HOF form: every accumulation
    # (dot products, norms) loops dim-by-dim in float64 — the same
    # left-to-right order as aggregate() — so cos_e4 round boundaries
    # cannot drift. The 1/{_HUB_QUERY_MOD} query matrix is built ONCE on
    # the driver from the same load_table frame and BROADCAST (guide
    # §3.1; r13's kernel pq.read_table'd the FULL embeddings file in
    # every task — O(table) I/O per task at scale, and a bare local
    # path that bypassed Spark's FS layer; advisor r13). float32
    # parquet values widen to float64 exactly on both paths, so the
    # cosines are unchanged. Each task computes its candidate slice's
    # per-query local top-k; the JVM window reduces the 32 local
    # top-k lists to the global one: per-partition top-k under the
    # identical (cos desc, cid asc) order is selection-monotone, so the
    # surviving rows are exactly the old plan's.
    k, mod = _HUB_K, _HUB_QUERY_MOD
    qpdf = (
        emb.filter(F.col("vec_id") % mod == 0)
        .select("vec_id", "embedding")
        .toPandas()
    )
    bc = spark.sparkContext.broadcast(
        (
            qpdf["vec_id"].to_numpy(),
            np.asarray(qpdf["embedding"].tolist(), dtype=np.float64)
            if len(qpdf)
            else np.zeros((0, 0)),
        )
    )

    def topk_kernel(batches):
        import numpy as np
        import pandas as pd

        qids, qm = bc.value
        if qids.size == 0:  # empty fixture: emit nothing (advisor r13)
            for _ in batches:
                pass
            return
        nq, dim = qm.shape
        qn = np.zeros(nq)
        for d in range(dim):  # sequential over dims == aggregate() order
            qn += qm[:, d] * qm[:, d]
        qn = np.sqrt(qn)
        for b in batches:
            cids = b["cid"].to_numpy()
            ce = np.asarray(b["ce"].tolist(), dtype=np.float64)
            nc = ce.shape[0]
            cn = np.zeros(nc)
            for d in range(dim):
                cn += ce[:, d] * ce[:, d]
            cn = np.sqrt(cn)
            acc = np.zeros((nc, nq))
            for d in range(dim):
                acc += ce[:, d : d + 1] * qm[:, d][None, :]
            e4 = np.floor(acc / (qn[None, :] * cn[:, None]) * 10_000 + 0.5).astype(
                np.int64
            )
            outq: list = []
            outc: list = []
            oute: list = []
            for j in range(nq):
                col = e4[:, j]
                idx = np.nonzero(cids != qids[j])[0]
                pick = idx[np.lexsort((cids[idx], -col[idx]))[:k]]
                outq.extend([qids[j]] * len(pick))
                outc.extend(cids[pick].tolist())
                oute.extend(col[pick].tolist())
            yield pd.DataFrame({"qid": outq, "cid": outc, "cos_e4": oute})

    cand = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
    # explicit width: the candidate side is a few MB, which AQE would
    # coalesce to one task and serialize the matmul on one core
    pairs = cand.repartition(spark.sparkContext.defaultParallelism).mapInPandas(
        topk_kernel, "qid long, cid long, cos_e4 long"
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
