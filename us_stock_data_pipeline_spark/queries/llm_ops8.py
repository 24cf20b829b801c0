"""Round-5 operators, part 8: iterative graph analytics (PageRank over
the customer->supplier trade network), model-inference-as-expression
(logistic quality classifier), asymmetric containment dedup, A/B lift
with significance, and a bigram language-model scorer.

House contract: Spark-first DataFrame plans, identically-aliased DuckDB
oracles, floats rounded identically, 100 TB plan rationale in each
docstring. Deterministic "randomness" uses the repo's md5-hex idiom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# PageRank over the nation-level trade graph
# --------------------------------------------------------------------------

_PR_ITERS = 5
_PR_DAMP = 0.85

_EDGES_SQL = """
  SELECT cn.n_name AS src, sn.n_name AS dst, CAST(count(*) AS DOUBLE) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  GROUP BY 1, 2
"""

def _pr_iter_sql(prev: str, cur: str) -> str:
    return f""",
{cur} AS (
  SELECT n.n_name,
         0.15 / 25 + {_PR_DAMP} * coalesce(sum(i.r * m.p), 0) AS r
  FROM nodes n
  LEFT JOIN norm m ON m.dst = n.n_name
  LEFT JOIN {prev} i ON i.n_name = m.src
  GROUP BY n.n_name
)"""


_PAGERANK_ORACLE = (
    "WITH edges AS (" + _EDGES_SQL + "),\n"
    "norm AS (SELECT src, dst, w / sum(w) OVER (PARTITION BY src) AS p FROM edges),\n"
    "nodes AS (SELECT n_name FROM nation),\n"
    "it0 AS (SELECT n_name, 1.0 / 25 AS r FROM nodes)"
    + "".join(_pr_iter_sql(f"it{i}", f"it{i+1}") for i in range(_PR_ITERS))
    + f"""
SELECT n_name AS nation, round(r, 6) AS pagerank,
       CAST(row_number() OVER (ORDER BY r DESC, n_name) AS BIGINT) AS rnk
FROM it{_PR_ITERS}
ORDER BY rnk
"""
)


@register("graph_pagerank_trade", oracle=_PAGERANK_ORACLE, tags=("graph", "iterative"))
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the nation-level trade graph (edge i->j = customer
    nation i buys from supplier nation j, weighted by line count) — the
    repo's second iterative-relational algorithm after pointer-doubling
    connected components. The expensive part at 100 TB is the EDGE
    EXTRACTION: a lineitem x orders fact-fact shuffle join with four
    broadcast dim hops, then a groupBy to a <= |V|^2 edge table. The
    POWER ITERATION then runs on aggregated state that is KBs forever
    (nations don't grow with data volume), so each of the 5 iterations
    is a broadcast join + 25-group aggregate — no iteration ever
    re-touches the fact table, which is exactly how you schedule
    iterative graph algorithms on Spark: shrink first, iterate on the
    small fixed point. Damping 0.85, uniform init, dangling mass
    dropped identically on both sides."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("src"))), F.col("c_nationkey") == F.col("ck"))
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("dst"))), F.col("s_nationkey") == F.col("sk"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    # Persist the normalized edge table: every iteration's lineage would
    # otherwise re-embed (and re-execute) the 6-table fact join — the one
    # genuinely expensive subtree. Post-aggregation it is <= |V|^2 rows,
    # broadcast-sized at any data scale (same lazy-persist contract as
    # dedup_minhash_lsh's signature table).
    norm = edges.select(
        "src", "dst", (F.col("w") / F.sum("w").over(W.partitionBy("src"))).alias("p")
    ).transform(registry.track_persist)
    nodes = n.select("n_name")
    ranks = nodes.select("n_name", (F.lit(1.0) / 25).alias("r"))
    for _ in range(_PR_ITERS):
        contrib = (
            F.broadcast(ranks)
            .join(norm, ranks.n_name == norm.src)
            .groupBy(F.col("dst").alias("n_name"))
            .agg(F.sum(F.col("r") * F.col("p")).alias("inflow"))
        )
        ranks = nodes.join(F.broadcast(contrib), "n_name", "left").select(
            "n_name",
            (F.lit(0.15 / 25) + _PR_DAMP * F.coalesce("inflow", F.lit(0.0))).alias("r"),
        )
    rnk = F.row_number().over(W.orderBy(F.desc("r"), "n_name")).cast("long")
    return (
        ranks.select(
            F.col("n_name").alias("nation"),
            F.round("r", 6).alias("pagerank"),
            rnk.alias("rnk"),
        ).orderBy("rnk")
    )


# --------------------------------------------------------------------------
# Logistic quality classifier (inference as expression)
# --------------------------------------------------------------------------

_QC_ORACLE = """
WITH feats AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_words,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / len(string_split(text, ' ')) AS ttr,
         CAST(len(list_filter(string_split(text, ' '),
                              w -> w IN ('the', 'a', 'of', 'and'))) AS DOUBLE)
           / len(string_split(text, ' ')) AS stop_ratio,
         CAST(length(replace(text, ' ', '')) AS DOUBLE)
           / len(string_split(text, ' ')) AS mean_wlen
  FROM documents
),
scored AS (
  SELECT source,
         1.0 / (1.0 + exp(-(-3.0 + 0.01 * n_words + 1.5 * ttr
                            + 2.0 * stop_ratio + 0.2 * mean_wlen))) AS score
  FROM feats
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE score > 0.5) AS BIGINT) AS n_pass,
       round(avg(score), 4) AS avg_score
FROM scored
GROUP BY source
ORDER BY source
"""


@register("pipeline_quality_classifier", oracle=_QC_ORACLE, tags=("llm", "quality"))
def pipeline_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model inference as a Catalyst expression: a logistic quality
    classifier (the fastText-style filter every corpus pipeline runs)
    whose features — length, type-token ratio, stopword ratio, mean
    word length — and fixed trained weights are all JVM codegen. This
    is the 100 TB-relevant point: a linear/logistic model over
    engineered features needs NO Python, NO UDF, NO model server — the
    dot product and sigmoid inline into the same whole-stage codegen as
    the feature extraction, so classification runs at scan bandwidth
    map-side, and only the per-source scorecard (tiny) shuffles. The
    same shape carries any broadcast-weight linear model; heavier
    models are where `batch_padding_builder`'s micro-batching takes
    over."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    n_words = F.size(ws).cast("double")
    ttr = F.size(F.array_distinct(ws)).cast("double") / F.size(ws)
    stop_ratio = (
        F.size(
            F.filter(ws, lambda w: w.isin("the", "a", "of", "and"))
        ).cast("double")
        / F.size(ws)
    )
    mean_wlen = F.length(F.regexp_replace("text", " ", "")).cast("double") / F.size(ws)
    z = -3.0 + 0.01 * n_words + 1.5 * ttr + 2.0 * stop_ratio + 0.2 * mean_wlen
    score = 1.0 / (1.0 + F.exp(-z))
    return (
        docs.select("source", score.alias("score"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(F.col("score") > 0.5, 1)).alias("n_pass"),
            F.round(F.avg("score"), 4).alias("avg_score"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Asymmetric containment dedup (sub-document duplication)
# --------------------------------------------------------------------------

_CONTAIN_ORACLE = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tg AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(ws, i.g, i.g + 2), ' ') AS g
  FROM w, LATERAL (SELECT unnest(range(1, len(ws) - 1)) AS g) i
),
counts AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM tg GROUP BY doc_id),
rare AS (
  SELECT g FROM tg GROUP BY g HAVING count(*) BETWEEN 2 AND 4
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
  FROM tg a JOIN rare r ON a.g = r.g
  JOIN tg b ON b.g = a.g AND b.doc_id > a.doc_id
),
shared AS (
  SELECT c.doc_id_a, c.doc_id_b, CAST(count(*) AS BIGINT) AS n_shared
  FROM cand c
  JOIN tg a ON a.doc_id = c.doc_id_a
  JOIN tg b ON b.doc_id = c.doc_id_b AND b.g = a.g
  GROUP BY 1, 2
)
SELECT s.doc_id_a, s.doc_id_b, s.n_shared,
       round(CAST(s.n_shared AS DOUBLE) / ca.n, 4) AS containment_a,
       round(CAST(s.n_shared AS DOUBLE) / cb.n, 4) AS containment_b
FROM shared s
JOIN counts ca ON ca.doc_id = s.doc_id_a
JOIN counts cb ON cb.doc_id = s.doc_id_b
ORDER BY doc_id_a, doc_id_b
"""


@register("dedup_containment_ngram", oracle=_CONTAIN_ORACLE, tags=("llm", "dedup"))
def dedup_containment_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric CONTAINMENT dedup: C(A,B) = |ngrams(A) n ngrams(B)| /
    |ngrams(A)| — the measure that catches SUB-document duplication
    (a short doc quoted inside a long one scores ~1.0 from the short
    side while Jaccard stays low; resemblance vs containment per
    Broder). Candidate pairs come from RARE-shingle blocking: only
    trigrams appearing in 2-4 documents generate pairs, which is the
    exact inverted-index trick that keeps candidate generation
    sub-quadratic at 100 TB — ubiquitous shingles (stop-phrase blocks)
    are dropped by the frequency ceiling instead of exploding into
    O(df^2) pairs, and unique shingles pair nothing. Both the blocking
    join and the verification join are equi-joins on the shingle
    string; nothing is all-pairs."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    trigrams = F.when(
        F.size(ws) >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(ws) - 2),
                lambda i: F.concat_ws(" ", F.slice(ws, i, F.lit(3))),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    tg = docs.select("doc_id", F.explode(trigrams).alias("g"))
    counts = tg.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    rare = tg.groupBy("g").agg(F.count(F.lit(1)).alias("df")).filter(
        (F.col("df") >= 2) & (F.col("df") <= 4)
    ).select("g")
    ta = tg.alias("a")
    tb = tg.alias("b")
    cand = (
        ta.join(rare, "g")
        .join(tb, (F.col("b.g") == F.col("a.g")) & (F.col("b.doc_id") > F.col("a.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b")
        )
        .distinct()
    )
    shared = (
        cand.join(ta, F.col("a.doc_id") == F.col("doc_id_a"))
        .join(tb, (F.col("b.doc_id") == F.col("doc_id_b")) & (F.col("b.g") == F.col("a.g")))
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    ca = counts.select(F.col("doc_id").alias("doc_id_a"), F.col("n").alias("na"))
    cb = counts.select(F.col("doc_id").alias("doc_id_b"), F.col("n").alias("nb"))
    return (
        shared.join(ca, "doc_id_a")
        .join(cb, "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            "n_shared",
            F.round(F.col("n_shared").cast("double") / F.col("na"), 4).alias(
                "containment_a"
            ),
            F.round(F.col("n_shared").cast("double") / F.col("nb"), 4).alias(
                "containment_b"
            ),
        )
        .orderBy("doc_id_a", "doc_id_b")
    )


# --------------------------------------------------------------------------
# A/B test lift with two-proportion z-score
# --------------------------------------------------------------------------

_AB_ORACLE = """
WITH assigned AS (
  SELECT user_id,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 2
           AS variant,
         max(CASE WHEN event_type = 'purchase' AND value > 440 THEN 1 ELSE 0 END)
           AS converted
  FROM events
  GROUP BY user_id
),
rates AS (
  SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(converted) AS BIGINT) AS n_conv,
         avg(CAST(converted AS DOUBLE)) AS rate
  FROM assigned GROUP BY variant
),
pair AS (
  SELECT a.n_users AS n_a, b.n_users AS n_b, a.n_conv AS conv_a, b.n_conv AS conv_b,
         a.rate AS rate_a, b.rate AS rate_b,
         (a.n_conv + b.n_conv) * 1.0 / (a.n_users + b.n_users) AS p
  FROM (SELECT * FROM rates WHERE variant = 0) a,
       (SELECT * FROM rates WHERE variant = 1) b
)
SELECT n_a, n_b, conv_a, conv_b,
       round(rate_a, 6) AS rate_a, round(rate_b, 6) AS rate_b,
       round(rate_b - rate_a, 6) AS abs_lift,
       CASE WHEN p * (1 - p) = 0 THEN NULL
            ELSE round((rate_b - rate_a)
                       / sqrt(p * (1 - p) * (1.0 / n_a + 1.0 / n_b)), 4)
       END AS z_score
FROM pair
"""


@register("events_ab_test_lift", oracle=_AB_ORACLE, tags=("analytics", "stats"))
def events_ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: deterministic hash assignment of users to
    two variants (md5 bucketing — the SAME assignment every run and on
    every engine, which is how real experiment frameworks keep users
    sticky), per-user conversion collapse, then lift and the pooled
    two-proportion z-score. Plan: one shuffle on user_id for the
    conversion collapse, then a 2-row aggregate crossed into a 1-row
    readout — the statistics are driver-free expression arithmetic on
    broadcast-sized state. At 100 TB (billions of users) nothing
    changes: the per-user collapse is the only data-sized stage and
    it's a partial-agg groupBy."""
    ev = load_table(spark, sf_dir, "events")
    variant = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 2
    )
    assigned = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 440), 1
            ).otherwise(0)
        ).alias("converted")
    ).select(variant.alias("variant"), "converted")
    rates = assigned.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").cast("long").alias("n_conv"),
        F.avg(F.col("converted").cast("double")).alias("rate"),
    )
    a = rates.filter(F.col("variant") == 0).select(
        F.col("n_users").alias("n_a"),
        F.col("n_conv").alias("conv_a"),
        F.col("rate").alias("rate_a"),
    )
    b = rates.filter(F.col("variant") == 1).select(
        F.col("n_users").alias("n_b"),
        F.col("n_conv").alias("conv_b"),
        F.col("rate").alias("rate_b"),
    )
    pair = a.crossJoin(b).withColumn(
        "p",
        (F.col("conv_a") + F.col("conv_b"))
        * 1.0
        / (F.col("n_a") + F.col("n_b")),
    )
    return pair.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round("rate_a", 6).alias("rate_a"),
        F.round("rate_b", 6).alias("rate_b"),
        F.round(F.col("rate_b") - F.col("rate_a"), 6).alias("abs_lift"),
        F.when(F.col("p") * (1 - F.col("p")) == 0, F.lit(None)).otherwise(
            F.round(
                (F.col("rate_b") - F.col("rate_a"))
                / F.sqrt(
                    F.col("p")
                    * (1 - F.col("p"))
                    * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
                ),
                4,
            )
        ).alias("z_score"),
    )


# --------------------------------------------------------------------------
# Bigram language-model scorer
# --------------------------------------------------------------------------

_BIGRAM_ORACLE = """
WITH toks AS (
  SELECT doc_id, u.w, u.pos
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       LATERAL (SELECT unnest(ws) AS w, unnest(range(1, len(ws) + 1)) AS pos) u
),
bigrams AS (
  SELECT a.doc_id, a.w AS w1, b.w AS w2
  FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
),
c2 AS (SELECT w1, w2, CAST(count(*) AS DOUBLE) AS n2 FROM bigrams GROUP BY w1, w2),
c1 AS (SELECT w1, CAST(count(*) AS DOUBLE) AS n1 FROM bigrams GROUP BY w1),
v AS (SELECT CAST(count(DISTINCT w) AS DOUBLE) AS vocab FROM toks),
scored AS (
  SELECT bg.doc_id,
         ln((c2.n2 + 1.0) / (c1.n1 + v.vocab)) AS logp
  FROM bigrams bg
  JOIN c2 ON c2.w1 = bg.w1 AND c2.w2 = bg.w2
  JOIN c1 ON c1.w1 = bg.w1
  CROSS JOIN v
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(logp), 4) AS avg_logp
FROM scored
GROUP BY doc_id
ORDER BY doc_id
"""


@register("text_bigram_lm", oracle=_BIGRAM_ORACLE, tags=("llm", "quality"))
def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model scoring with add-one smoothing — the
    word-ORDER-aware upgrade of `text_unigram_logprob` (a doc with
    plausible vocabulary in scrambled order scores near the smoothing
    floor here, which is exactly the degenerate-text signal a unigram
    perplexity filter misses). Train and score in one plan: bigram and
    history counts are corpus-wide partial aggregates; scoring joins
    each document bigram to its counts on the (w1, w2) key — an
    inverted-index equi-join, never a vocab cross product; the scalar
    vocabulary size broadcasts as a 1-row crossJoin. At 100 TB the
    count tables follow Heaps'-law growth (corpus-sublinear) and the
    scoring join shuffles on bigram keys with heavy hitters handled by
    AQE skew splitting."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    nxt = F.lead("w").over(W.partitionBy("doc_id").orderBy("pos"))
    bigrams = (
        toks.select("doc_id", F.col("w").alias("w1"), nxt.alias("w2"))
        .filter(F.col("w2").isNotNull())
    )
    c2 = bigrams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("double").alias("n2")
    )
    c1 = bigrams.groupBy("w1").agg(F.count(F.lit(1)).cast("double").alias("n1"))
    v = toks.agg(F.countDistinct("w").cast("double").alias("vocab"))
    scored = (
        bigrams.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            F.log((F.col("n2") + 1.0) / (F.col("n1") + F.col("vocab"))).alias("logp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("logp"), 4).alias("avg_logp"),
        )
        .orderBy("doc_id")
    )
