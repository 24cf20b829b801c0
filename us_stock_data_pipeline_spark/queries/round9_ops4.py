"""Round-9 operators, part 4: Katz centrality (bounded-iteration linear
algebra on the trade graph), label-smoothing cross-entropy, and the
Wang-Isola alignment/uniformity embedding diagnostics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.functions import detmath
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# graph: Katz centrality on the nation trade graph (4 unrolled steps)
# --------------------------------------------------------------------------

_KATZ_ALPHA = "0.000002"  # attenuation (double literal; alpha * max_deg < 1)
_KATZ_ITERS = 4

# x_{t+1}(i) = 1e6 + floor(alpha * sum_j A(j, i) * x_t(j)): the walk sum
# stays exact (integer weights * integer scores summed exactly, one
# deterministic double multiply + floor per node per step).
_KATZ_STEP = "CAST(1000000 + floor({a} * CAST(s AS DOUBLE)) AS BIGINT)"


def _katz_oracle() -> str:
    steps = []
    prev = "x0"
    for t in range(1, _KATZ_ITERS + 1):
        steps.append(
            f"""x{t} AS (
  SELECT p.dst AS nation,
         {_KATZ_STEP.format(a=_KATZ_ALPHA)} AS x
  FROM (
    SELECT e.dst, CAST(sum(e.w * x.x) AS BIGINT) AS s
    FROM edges e JOIN {prev} x ON x.nation = e.src
    GROUP BY e.dst
  ) p
)"""
        )
        prev = f"x{t}"
    joined = ",\n".join(steps)
    return f"""
WITH edges AS (
  SELECT cn.n_name AS src, sn.n_name AS dst, CAST(count(*) AS BIGINT) AS w
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation cn ON cn.n_nationkey = c.c_nationkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation sn ON sn.n_nationkey = s.s_nationkey
  GROUP BY 1, 2
),
nodes AS (SELECT DISTINCT dst AS nation FROM edges),
x0 AS (
  SELECT nation, CAST(1000000 AS BIGINT) AS x
  FROM (SELECT DISTINCT src AS nation FROM edges
        UNION SELECT DISTINCT dst FROM edges)
),
{joined}
SELECT n.nation, x.x AS katz_micro,
       CAST(row_number() OVER (ORDER BY x.x DESC, n.nation) AS BIGINT) AS rnk
FROM nodes n JOIN x{_KATZ_ITERS} x ON x.nation = n.nation
ORDER BY n.nation
"""


@register("graph_katz_centrality", oracle=_katz_oracle(), tags=("graph", "analytics"))
def graph_katz_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Katz centrality on the customer-nation -> supplier-nation trade
    graph: x = sum_k alpha^k A^k 1, truncated at {_KATZ_ITERS} walk
    steps — the attenuated-walk importance measure that counts INDIRECT
    trade influence where degree counts only direct edges and PageRank
    (`graph_pagerank_trade`) normalizes mass away from high-volume
    nodes. Each unrolled step is one edges-to-scores equi-join + one
    groupBy (the same shuffle key both times), with the walk sum exact
    integer arithmetic and a single deterministic double multiply +
    floor per node per step — so the fixed-iteration result is
    value-exact cross-engine with NO driver loop (the iteration count
    is a compile-time unroll, the graph-linear-algebra analogue of
    `graph_pagerank_trade`'s bounded rounds). At 100 TB the edge
    aggregation is the only data-sized pass; every step after runs on
    the nations-sized score table."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("src")
    )
    sn = n.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("dst")
    )
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cnk"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("snk"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    from us_stock_data_pipeline_spark import registry as _registry

    edges = _registry.track_persist(edges)
    nodes = edges.select(F.col("dst").alias("nation")).distinct()
    x = (
        edges.select(F.col("src").alias("nation"))
        .union(edges.select("dst"))
        .distinct()
        .withColumn("x", F.lit(1_000_000).cast("long"))
    )
    for _ in range(_KATZ_ITERS):
        walked = (
            edges.join(x, edges.src == x.nation)
            .groupBy("dst")
            .agg(F.sum(F.col("w") * F.col("x")).cast("long").alias("s"))
        )
        x = walked.selectExpr(
            "dst AS nation", f"{_KATZ_STEP.format(a=_KATZ_ALPHA)} AS x"
        )
    return (
        nodes.join(x, "nation")
        .select(
            "nation",
            F.col("x").alias("katz_micro"),
            F.row_number()
            .over(Window.orderBy(F.col("x").desc(), "nation"))
            .cast("long")
            .alias("rnk"),
        )
        .orderBy("nation")
    )


# --------------------------------------------------------------------------
# ml: label-smoothing cross-entropy of a source-conditioned classifier
# --------------------------------------------------------------------------

_LS_EPS_NUM, _LS_EPS_DEN = 1, 10  # epsilon = 0.1 as an exact rational

# smoothed probability of the TRUE label for a doc of (source s, lang l):
#   q' = (1-eps) * c_sl / c_s + eps / K
#      = ((DEN-NUM) * c_sl * K + NUM * c_s) / (DEN * c_s * K)   exact ints
_LS_NUM = f"({_LS_EPS_DEN - _LS_EPS_NUM} * c_sl * k + {_LS_EPS_NUM} * c_s)"
_LS_DEN = f"({_LS_EPS_DEN} * c_s * k)"
_LS_STAGES = detmath.det_ln_ratio_stages(_LS_DEN, _LS_NUM, "ls_nll")
_LS_CELL = "CAST(round(ls_nll * 1000000) AS BIGINT)"

_LS_ORACLE = f"""
WITH cells AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS c_sl FROM documents
  GROUP BY source, lang
),
tot AS (SELECT source, CAST(sum(c_sl) AS BIGINT) AS c_s FROM cells GROUP BY source),
k AS (SELECT CAST(count(DISTINCT lang) AS BIGINT) AS k FROM documents),
scored AS (
  SELECT source, c_sl, {_LS_CELL} AS nll_e6
  FROM {detmath.stages_to_select(_LS_STAGES,
    "(SELECT c.source, c.c_sl, t.c_s, k.k FROM cells c JOIN tot t ON t.source = c.source CROSS JOIN k)")}
)
SELECT source,
       CAST(sum(c_sl) AS BIGINT) AS n_docs,
       CAST(sum(c_sl * nll_e6) // sum(c_sl) AS BIGINT) AS ce_smoothed_e6
FROM scored
GROUP BY source
ORDER BY source
"""


@register("ml_label_smoothing_ce", oracle=_LS_ORACLE, tags=("ml", "llm"))
def ml_label_smoothing_ce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LABEL-SMOOTHING cross-entropy — the regularized loss every
    modern classifier/LM trains with (q' = (1-eps)q + eps/K): here the
    'classifier' predicts a doc's language from its source's empirical
    language mix, and the per-source mean smoothed CE measures how
    predictable each source's language is (a purity diagnostic the
    plain entropy of `corpus_language_mix`-style rollups understates,
    because smoothing floors the loss exactly as training does).
    Exactness: eps = 1/10 is an exact rational, so the smoothed
    probability is a ratio of pure integers — det_ln of that ratio
    quantizes per (source, lang) CELL, and the doc-weighted mean is an
    exact integer floor-divide. Plan: one (source, lang) rollup + two
    broadcast scalars; nothing bigger than the cell table ever
    shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("c_sl")
    )
    tot = cells.groupBy("source").agg(F.sum("c_sl").cast("long").alias("c_s"))
    k = docs.agg(F.countDistinct("lang").cast("long").alias("k"))
    joined = cells.join(tot, "source").crossJoin(F.broadcast(k))
    scored = detmath.apply_stages(joined, _LS_STAGES).selectExpr(
        "source", "c_sl", f"{_LS_CELL} AS nll_e6"
    )
    return (
        scored.groupBy("source")
        .agg(
            F.sum("c_sl").cast("long").alias("n_docs"),
            F.expr(
                "CAST(sum(c_sl * nll_e6) div sum(c_sl) AS BIGINT)"
            ).alias("ce_smoothed_e6"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# embedding: Wang-Isola alignment & uniformity diagnostics
# --------------------------------------------------------------------------

_AU_N = 64  # vectors 0.._AU_N-1; positives are the (2k, 2k+1) pairs

_AU_DOT = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
    " list_transform(list_zip({a}, {b}), z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))),"
    " (acc, x) -> acc + x)"
)

# squared distance of L2-normalized vectors: d2 = 2 - 2 * cos(a, b);
# uniformity's exp(-2*d2) has arguments in [-8, 0] so det_exp terms
# quantized at 1e12 never vanish.
_AU_EXP_STAGES = detmath.det_exp_stages("-2.0 * d2", "au_e")
_AU_EQ = "CAST(floor(au_e * 1000000000000 + 0.5) AS BIGINT)"
_AU_LN_STAGES = detmath.det_ln_int_stages("sum_eq", "au_ln_sum") + \
    detmath.det_ln_int_stages("n_pairs", "au_ln_n")

_AU_FINAL = (
    "CAST(floor((au_ln_sum - au_ln_n - 27.631021115928547) * 1000000 + 0.5)"
    " AS BIGINT)"
)


_AU_ORACLE = f"""
WITH probe AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < {_AU_N}
),
pairs AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
         2.0 - 2.0 * ({_AU_DOT.format(a="a.embedding", b="b.embedding")}
           / (sqrt({_AU_DOT.format(a="a.embedding", b="a.embedding")})
              * sqrt({_AU_DOT.format(a="b.embedding", b="b.embedding")}))) AS d2
  FROM probe a JOIN probe b ON a.vec_id < b.vec_id
),
align AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pos_pairs,
         CAST(sum(CAST(floor(d2 * 1000000 + 0.5) AS BIGINT)) // count(*) AS BIGINT)
           AS alignment_e6
  FROM pairs WHERE ia % 2 = 0 AND ib = ia + 1
),
usum AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pairs, CAST(sum(e_q) AS BIGINT) AS sum_eq
  FROM (SELECT {_AU_EQ} AS e_q
        FROM {detmath.stages_to_select(_AU_EXP_STAGES, "pairs")})
),
uni AS (
  SELECT n_pairs, {_AU_FINAL} AS uniformity_e6
  FROM {detmath.stages_to_select(_AU_LN_STAGES, "usum")}
)
SELECT a.n_pos_pairs, a.alignment_e6, u.n_pairs, u.uniformity_e6
FROM align a CROSS JOIN uni u
"""


@register(
    "embedding_alignment_uniformity",
    oracle=_AU_ORACLE,
    tags=("llm", "embedding", "stats"),
)
def embedding_alignment_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wang & Isola (2020) ALIGNMENT and UNIFORMITY — the two numbers
    that explain why a contrastive embedding space works: alignment =
    mean squared distance between positive pairs (smaller = positives
    collapse together), uniformity = ln mean exp(-2 d^2) over all
    pairs of a fixed probe set (closer to 0 = vectors bunch up; very
    negative = they spread over the sphere). Complements
    `ml_infonce_loss_audit` (the LOSS) with the geometry diagnostics.
    Exactness: distances come from strict-left-fold cosines on
    L2-normalized vectors (d2 = 2 - 2cos; sqrt is IEEE-exact),
    alignment quantizes each pair to e6 before the exact integer mean,
    and uniformity is det_ln of the exact integer sum of 1e12-quantized
    det_exp terms minus ln(n) and ln(1e12). Plan: the probe set is
    fixed-size ({_AU_N} vectors), so the pair grid is a broadcast
    self-join — constant work regardless of corpus size (the audit you
    run per training checkpoint, not per shard)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < _AU_N
    )

    def dot(a: str, b: str) -> str:
        return (
            f"aggregate(zip_with({a}, {b}, (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)),"
            " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )

    a = emb.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
    pairs = a.join(F.broadcast(b), F.col("ia") < F.col("ib")).selectExpr(
        "ia",
        "ib",
        f"2.0 - 2.0 * ({dot('va', 'vb')}"
        f" / (sqrt({dot('va', 'va')}) * sqrt({dot('vb', 'vb')}))) AS d2",
    )
    pos = pairs.filter((F.col("ia") % 2 == 0) & (F.col("ib") == F.col("ia") + 1))
    align = pos.select(
        F.expr("CAST(floor(d2 * 1000000 + 0.5) AS BIGINT)").alias("d2_e6")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_pos_pairs"),
        F.expr("CAST(sum(d2_e6) div count(*) AS BIGINT)").alias("alignment_e6"),
    )
    uq = detmath.apply_stages(pairs, _AU_EXP_STAGES).selectExpr(f"{_AU_EQ} AS e_q")
    usum = uq.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("e_q").cast("long").alias("sum_eq"),
    )
    uni = detmath.apply_stages(usum, _AU_LN_STAGES).selectExpr(
        "n_pairs", f"{_AU_FINAL} AS uniformity_e6"
    )
    return align.crossJoin(uni).select(
        "n_pos_pairs", "alignment_e6", "n_pairs", "uniformity_e6"
    )





# --------------------------------------------------------------------------
# ETL: versioned-table TAGS (named immutable refs) and RESTORE (rollback)
# --------------------------------------------------------------------------

# After the 3 overlapping ingest batches (full, x2 from Jan 10, x3 from
# Jan 25 — the versioned_ops staging), the tag pins v2 and the restore
# makes head v4 = v2's manifest; the oracle recomputes both states from
# the raw fixture with the same closed-form restatement rule.
_TAG_RESTORE_ORACLE = """
WITH v2 AS (
  SELECT event_type,
         round(sum(round(round(value, 4) * CASE
             WHEN ts >= TIMESTAMP '2024-01-10' THEN 2 ELSE 1 END, 4)), 2) AS s
  FROM events GROUP BY event_type
)
SELECT event_type,
       CAST(2 AS BIGINT) AS tagged_version,
       s AS sum_tagged,
       s AS sum_after_restore,
       CAST(4 AS BIGINT) AS head_after_restore
FROM v2
ORDER BY event_type
"""


@register(
    "etl_versioned_tag_restore",
    oracle=_TAG_RESTORE_ORACLE,
    tags=("etl", "sink", "merge", "versioned"),
)
def etl_versioned_tag_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named TAGS + RESTORE on the versioned table — the two snapshot
    operations a lakehouse user reaches for after time travel: a tag is
    an immutable named ref (Iceberg tag semantics: CAS-published,
    create-only, vacuum-protected) pinning 'the snapshot run X trained
    on' by NAME, and restore_version commits a NEW head whose manifest
    is byte-for-byte an old version's — the metadata-only bad-deploy
    undo (Delta RESTORE): no data moves, every intervening version
    stays readable. Here: three merges land v1..v3, the tag pins v2,
    restore(2) commits v4 = v2's manifest, and the hashed output pins
    (a) the tag resolves to 2, (b) reading BY TAG equals the oracle's
    closed-form v2 state, (c) the post-restore HEAD equals the same
    state, (d) the head is version 4 — so a regression in ref
    resolution, restore, or manifest carry-forward flips the hash.
    Both reads are manifest-pruned scans; the restore itself touches
    zero data bytes at any scale."""
    from us_stock_data_pipeline_spark.etl.versioned import (
        create_tag,
        current_version,
        read_versioned,
        restore_version,
    )
    from us_stock_data_pipeline_spark.queries.versioned_ops import (
        _ingest_three_batches,
    )

    root = _ingest_three_batches(spark, sf_dir)
    tagged_ver = create_tag(spark, root, "before-x3", version=2)
    restore_version(spark, root, 2)
    head = current_version(spark, root)
    by_tag = (
        read_versioned(spark, root, ref="before-x3")
        .groupBy("event_type")
        .agg(F.round(F.sum("px"), 2).alias("sum_tagged"))
    )
    head_read = (
        read_versioned(spark, root)
        .groupBy("event_type")
        .agg(F.round(F.sum("px"), 2).alias("sum_after_restore"))
    )
    return (
        by_tag.join(head_read, "event_type")
        .select(
            "event_type",
            F.lit(tagged_ver).cast("long").alias("tagged_version"),
            "sum_tagged",
            "sum_after_restore",
            F.lit(head).cast("long").alias("head_after_restore"),
        )
        .orderBy("event_type")
    )
