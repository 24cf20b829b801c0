"""Round-19 analytics, part 30: Pareto skyline, Cohen's kappa
inter-annotator agreement, and MRR retrieval evaluation.

Three operator families the corpus did not yet cover: multi-objective
dominance (skyline), labeling-quality measurement (kappa), and ranked-
retrieval scoring (mean reciprocal rank). All exact-integer to the
final division so the DuckDB oracle hash-matches bit for bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Pareto skyline (2-D dominance via two window frames, no self-join)
# --------------------------------------------------------------------------

_SKYLINE_ORACLE = """
WITH metrics AS (
  SELECT l_suppkey AS suppkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents,
         CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT) AS n_returns
  FROM lineitem GROUP BY 1
),
flagged AS (
  SELECT suppkey, revenue_cents, n_returns,
         min(n_returns) OVER (
           ORDER BY revenue_cents DESC
           RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_above,
         min(n_returns) OVER (
           ORDER BY revenue_cents DESC
           RANGE BETWEEN CURRENT ROW AND CURRENT ROW) AS best_peer
  FROM metrics
)
SELECT suppkey, revenue_cents, n_returns
FROM flagged
WHERE (best_above IS NULL OR best_above > n_returns)
  AND best_peer = n_returns
ORDER BY revenue_cents DESC, suppkey
"""


@register("orders_pareto_skyline", oracle=_SKYLINE_ORACLE, tags=("analytics", "window"))
def orders_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-frontier query: the suppliers no other supplier
    dominates on (revenue UP, returned-line count DOWN) — the
    multi-objective shortlist ("best tradeoffs") that naive top-N by
    either axis misses. The textbook formulation is a quadratic
    NOT EXISTS self-join (the oracle's semantics); this plan replaces
    it with TWO RANGE-frame window minima on one revenue sort: a
    supplier is dominated iff some strictly-higher-revenue supplier
    has <= returns (frame UNBOUNDED..1 PRECEDING over the integer
    revenue axis = strictly greater revenue) or an equal-revenue peer
    has strictly fewer (the CURRENT ROW..CURRENT ROW peer frame).
    O(n log n) instead of O(n^2), one global sort — and at 100 TB the
    sort input is the post-aggregate supplier table (small), not
    lineitem; the skyline-specific work never touches raw facts.
    Revenue is exact cents, returns an exact count, so dominance is
    decided on integers."""
    li = load_table(spark, sf_dir, "lineitem")
    metrics = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("revenue_cents"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).cast("long").alias("n_returns"),
    )
    w_above = (
        Window.orderBy(F.col("revenue_cents").desc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_peer = Window.orderBy(F.col("revenue_cents").desc()).rangeBetween(0, 0)
    flagged = metrics.select(
        "suppkey",
        "revenue_cents",
        "n_returns",
        F.min("n_returns").over(w_above).alias("best_above"),
        F.min("n_returns").over(w_peer).alias("best_peer"),
    )
    return (
        flagged.filter(
            (F.col("best_above").isNull() | (F.col("best_above") > F.col("n_returns")))
            & (F.col("best_peer") == F.col("n_returns"))
        )
        .select("suppkey", "revenue_cents", "n_returns")
        .orderBy(F.col("revenue_cents").desc(), "suppkey")
    )


# --------------------------------------------------------------------------
# Cohen's kappa (inter-annotator agreement)
# --------------------------------------------------------------------------

_KAPPA_ORACLE = """
WITH labeled AS (
  SELECT source,
         n_chars % 3 AS a,
         (n_chars + doc_id) % 3 AS b
  FROM documents
),
cells AS (
  SELECT source, a, b, CAST(count(*) AS BIGINT) AS cnt
  FROM labeled GROUP BY 1, 2, 3
),
rmarg AS (SELECT source, a AS k, CAST(sum(cnt) AS BIGINT) AS r FROM cells GROUP BY 1, 2),
cmarg AS (SELECT source, b AS k, CAST(sum(cnt) AS BIGINT) AS c FROM cells GROUP BY 1, 2),
stats AS (
  SELECT cells.source,
         CAST(sum(cnt) AS BIGINT) AS n,
         CAST(coalesce(sum(cnt) FILTER (WHERE a = b), 0) AS BIGINT) AS agree
  FROM cells GROUP BY 1
),
pe AS (
  SELECT rmarg.source, CAST(sum(r * c) AS BIGINT) AS pe_num
  FROM rmarg JOIN cmarg ON rmarg.source = cmarg.source AND rmarg.k = cmarg.k
  GROUP BY 1
)
SELECT s.source, s.n AS n_docs, s.agree AS n_agree,
       CAST(floor(CAST(s.n * s.agree - p.pe_num AS DOUBLE)
                  / CAST(s.n * s.n - p.pe_num AS DOUBLE) * 1000000 + 0.5)
         AS BIGINT) AS kappa_e6
FROM stats s JOIN pe p ON s.source = p.source
ORDER BY s.source
"""


@register("stats_cohen_kappa", oracle=_KAPPA_ORACLE, tags=("stats", "llm"))
def stats_cohen_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between two
    annotators, the standard gate on label quality before training on
    human (or LLM-judge) labels. Two deterministic 3-class annotators
    derive from the document fixture (a = n_chars mod 3,
    b = (n_chars + doc_id) mod 3 — correlated through n_chars, so
    kappa is meaningfully > random for some sources). The algebra is
    kept rational: kappa = (n*agree - sum_k r_k*c_k) /
    (n^2 - sum_k r_k*c_k), assembled entirely from BIGINT counts and
    marginal products, with ONE double division quantized to 1e-6 at
    the end. Plan: one cell aggregate over (source, a, b) — tiny
    after reduction — then marginal re-aggregations and a broadcast-
    size join; at 100 TB the only full-data pass is the first
    groupBy, everything downstream is O(sources x classes)."""
    docs = load_table(spark, sf_dir, "documents")
    labeled = docs.select(
        "source",
        (F.col("n_chars") % 3).alias("a"),
        ((F.col("n_chars") + F.col("doc_id")) % 3).alias("b"),
    )
    cells = labeled.groupBy("source", "a", "b").agg(
        F.count("*").cast("long").alias("cnt")
    )
    rmarg = cells.groupBy("source", F.col("a").alias("k")).agg(
        F.sum("cnt").cast("long").alias("r")
    )
    cmarg = cells.groupBy("source", F.col("b").alias("k")).agg(
        F.sum("cnt").cast("long").alias("c")
    )
    stats = cells.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("n"),
        F.coalesce(F.sum(F.when(F.col("a") == F.col("b"), F.col("cnt"))), F.lit(0))
        .cast("long")
        .alias("agree"),
    )
    pe = (
        rmarg.join(cmarg, ["source", "k"])
        .groupBy("source")
        .agg(F.sum(F.col("r") * F.col("c")).cast("long").alias("pe_num"))
    )
    joined = stats.join(pe, "source")
    kappa = F.floor(
        (F.col("n") * F.col("agree") - F.col("pe_num")).cast("double")
        / (F.col("n") * F.col("n") - F.col("pe_num")).cast("double")
        * 1_000_000
        + F.lit(0.5)
    ).cast("long")
    return joined.select(
        "source",
        F.col("n").alias("n_docs"),
        F.col("agree").alias("n_agree"),
        kappa.alias("kappa_e6"),
    ).orderBy("source")


# --------------------------------------------------------------------------
# Mean reciprocal rank (ranked-retrieval evaluation)
# --------------------------------------------------------------------------

_MRR_ORACLE = """
WITH ranked AS (
  SELECT o_custkey, o_orderpriority,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders
),
per_query AS (
  SELECT o_custkey,
         coalesce(CAST(1000000000 //
                       (min(rnk) FILTER (WHERE o_orderpriority = '1-URGENT'))
                  AS BIGINT), 0) AS rr_e9
  FROM ranked GROUP BY 1
)
SELECT c.c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS n_queries,
       CAST(count(*) FILTER (WHERE q.rr_e9 > 0) AS BIGINT) AS n_hit,
       CAST(sum(q.rr_e9) // count(*) AS BIGINT) AS mrr_e9
FROM per_query q JOIN customer c ON q.o_custkey = c.c_custkey
GROUP BY 1
ORDER BY 1
"""


@register("ml_mrr_retrieval", oracle=_MRR_ORACLE, tags=("ml", "eval"))
def ml_mrr_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean Reciprocal Rank — the first-hit metric for search /
    RAG-retrieval eval. Each customer is a "query", their orders the
    ranked candidate list (by totalprice DESC with a deterministic
    orderkey tiebreak), and '1-URGENT' priority marks relevance; a
    query with no relevant candidate contributes rr = 0 (standard
    MRR, not the filtered variant). The whole metric stays in exact
    integers: reciprocal rank is the BIGINT floor-division
    1e9 div rank, and the segment mean is sum div count — no float
    enters the plan at all, so cross-engine hashing is trivially
    stable. Plan: one window over the custkey sort (rank + relevant-
    min fused in the same partition pass), one aggregate, one
    broadcast join to the customer dimension for the segment
    attribute."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    ranked = orders.select(
        "o_custkey",
        "o_orderpriority",
        F.row_number().over(w).alias("rnk"),
    )
    per_query = ranked.groupBy("o_custkey").agg(
        F.coalesce(
            F.expr(
                "CAST(1000000000 div min(CASE WHEN o_orderpriority = '1-URGENT'"
                " THEN rnk END) AS BIGINT)"
            ),
            F.lit(0),
        ).alias("rr_e9")
    )
    return (
        per_query.join(F.broadcast(cust), per_query.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").cast("long").alias("n_queries"),
            F.count(F.when(F.col("rr_e9") > 0, 1)).cast("long").alias("n_hit"),
            F.expr("CAST(sum(rr_e9) div count(*) AS BIGINT)").alias("mrr_e9"),
        )
        .orderBy("segment")
    )
