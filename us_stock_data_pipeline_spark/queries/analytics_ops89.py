"""Round-95 analytics, part 89: SCD Type 3 dimension reshape and
multi-key blocking union for fuzzy dedup recall.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# SCD Type 3: current + prior value columns per user
# --------------------------------------------------------------------------

_SCD3_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
),
cur AS (
  SELECT user_id, event_type AS current_type, ts AS current_ts
  FROM ordered WHERE rn = 1
),
-- prior value = the most recent event whose type DIFFERS from current
prior AS (
  SELECT o.user_id, o.event_type AS prior_type,
         row_number() OVER (PARTITION BY o.user_id
                            ORDER BY o.ts DESC, o.event_id DESC) AS prn
  FROM ordered o JOIN cur c ON c.user_id = o.user_id
  WHERE o.event_type <> c.current_type
)
SELECT c.user_id, c.current_type,
       p.prior_type,
       CAST(CASE WHEN p.prior_type IS NULL THEN 0 ELSE 1 END AS BIGINT)
         AS has_prior
FROM cur c LEFT JOIN (SELECT user_id, prior_type FROM prior WHERE prn = 1) p
  ON p.user_id = c.user_id
ORDER BY c.user_id
"""


@register("etl_scd3_prior_value", oracle=_SCD3_ORACLE, tags=("etl", "dimension"))
def etl_scd3_prior_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 3 dimension reshape: one row per entity carrying the
    CURRENT attribute value plus the immediately PRIOR distinct value
    in side-by-side columns — the limited-history pattern for 'show me
    who recently changed segment' dashboards, completing the SCD
    ladder next to Type 2's full row history (`etl_scd2_dimension`)
    and the CDC latest-row snapshot (Type 1, `dedup_latest_snapshot`).
    Semantics pinned: prior = the latest event whose value DIFFERS
    from the current one (consecutive duplicates of the current value
    collapse), ties broken by (ts, event_id) exactly as the SCD2 op
    does. Plan: one (user) shuffle shared by both ranking windows; the
    differs-from-current filter is a broadcast-sized self-join on the
    per-user current row."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    ordered = ev.select(
        "user_id", "event_type", "ts", "event_id", F.row_number().over(w).alias("rn")
    )
    cur = ordered.filter(F.col("rn") == 1).select(
        "user_id", F.col("event_type").alias("current_type")
    )
    joined = ordered.join(cur, "user_id").filter(
        F.col("event_type") != F.col("current_type")
    )
    w2 = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    prior = (
        joined.select(
            "user_id",
            "current_type",
            F.col("event_type").alias("prior_type"),
            F.row_number().over(w2).alias("prn"),
        )
        .filter(F.col("prn") == 1)
        .select("user_id", "prior_type")
    )
    return (
        cur.join(prior, "user_id", "left")
        .select(
            "user_id",
            "current_type",
            "prior_type",
            F.when(F.col("prior_type").isNull(), 0).otherwise(1).cast("long").alias("has_prior"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Multi-key blocking union: prefix-block + length-block, then verify
# --------------------------------------------------------------------------

_MB_BLOCK_CAP = 50
_MB_EDIT_MAX = 25

_MULTIBLOCK_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, text, substr(text, 1, 12) AS pfx,
         n_chars // 10 AS lenb, split_part(text, ' ', 1) AS w1
  FROM documents
),
-- key 1: 12-char prefix; key 2: (length bucket, first word). Hot blocks
-- above the cap drop (the standard blocking guard)
k1 AS (
  SELECT pfx AS k FROM docs GROUP BY pfx HAVING count(*) <= {_MB_BLOCK_CAP}
),
p1 AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM docs a JOIN docs b ON b.pfx = a.pfx AND b.doc_id > a.doc_id
  JOIN k1 ON k1.k = a.pfx
),
k2 AS (
  SELECT lenb, w1 FROM docs GROUP BY lenb, w1 HAVING count(*) <= {_MB_BLOCK_CAP}
),
p2 AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM docs a JOIN docs b ON b.lenb = a.lenb AND b.w1 = a.w1
                          AND b.doc_id > a.doc_id
  JOIN k2 ON k2.lenb = a.lenb AND k2.w1 = a.w1
),
cands AS (SELECT id_a, id_b FROM p1 UNION SELECT id_a, id_b FROM p2),
verified AS (
  -- |len_a - len_b| lower-bounds the edit distance: the cheap filter
  -- runs BEFORE the O(n*m) levenshtein, pruning most candidates
  SELECT c.id_a, c.id_b,
         CAST(levenshtein(substr(da.text, 1, 300), substr(db.text, 1, 300))
           AS BIGINT) AS edit_dist
  FROM cands c
  JOIN docs da ON da.doc_id = c.id_a
  JOIN docs db ON db.doc_id = c.id_b
  WHERE abs(length(da.text) - length(db.text)) <= {_MB_EDIT_MAX}
)
SELECT id_a, id_b, edit_dist
FROM verified
WHERE edit_dist <= {_MB_EDIT_MAX}
ORDER BY id_a, id_b
"""


@register("dedup_multiblock_union", oracle=_MULTIBLOCK_ORACLE, tags=("dedup", "llm"))
def dedup_multiblock_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key blocking union for fuzzy dedup: candidate pairs come
    from the UNION of two independent blocking keys — a 12-char text
    prefix AND a (length-bucket, first-word) composite — then verify
    with exact edit distance. One blocking key misses pairs whose
    difference happens to hit that key (an edit in the first 12 chars
    escapes prefix blocking but not the length block, and vice versa);
    the union is the standard recall booster in record-linkage
    pipelines, with each block capped at {_MB_BLOCK_CAP} rows (the
    `graph_link_prediction_jaccard` hot-key guard) so the pair fan-out
    is bounded per key at any corpus size. The UNION is set-semantics
    so pairs found by both keys dedupe before the expensive verify —
    candidates-only, never all-pairs. Verification is Spark's built-in
    levenshtein vs DuckDB's — cross-engine exact integers — windowed to
    the first 300 chars with a length-difference prefilter, because the
    O(n*m) DP on full documents is the classic verify-stage cost bomb
    (full-text confirmation belongs to a second pass over the few
    surviving pairs)."""
    d = load_table(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id",
        "text",
        F.substring("text", 1, 12).alias("pfx"),
        F.expr("n_chars div 10").alias("lenb"),
        F.split_part(F.col("text"), F.lit(" "), F.lit(1)).alias("w1"),
    )
    registry.track_persist(docs)
    k1 = docs.groupBy("pfx").agg(F.count(F.lit(1)).alias("c1")).filter(
        F.col("c1") <= _MB_BLOCK_CAP
    )
    a1 = docs.join(k1.select("pfx"), "pfx")
    b1 = a1.select(F.col("pfx"), F.col("doc_id").alias("id_b"))
    p1 = a1.select("pfx", F.col("doc_id").alias("id_a")).join(
        b1, "pfx"
    ).filter(F.col("id_b") > F.col("id_a")).select("id_a", "id_b")
    k2 = docs.groupBy("lenb", "w1").agg(F.count(F.lit(1)).alias("c2")).filter(
        F.col("c2") <= _MB_BLOCK_CAP
    )
    a2 = docs.join(k2.select("lenb", "w1"), ["lenb", "w1"])
    b2 = a2.select("lenb", "w1", F.col("doc_id").alias("id_b"))
    p2 = a2.select("lenb", "w1", F.col("doc_id").alias("id_a")).join(
        b2, ["lenb", "w1"]
    ).filter(F.col("id_b") > F.col("id_a")).select("id_a", "id_b")
    cands = p1.union(p2).distinct()
    ta = docs.select(F.col("doc_id").alias("id_a"), F.col("text").alias("text_a"))
    tb = docs.select(F.col("doc_id").alias("id_b"), F.col("text").alias("text_b"))
    return (
        cands.join(ta, "id_a")
        .join(tb, "id_b")
        .filter(
            F.abs(F.length("text_a") - F.length("text_b")) <= _MB_EDIT_MAX
        )
        # explicit width: AQE's byte-based coalescing sees a few MB of
        # candidate rows and schedules ONE task, serializing the O(n*m)
        # levenshtein DP on one core (measured 4.5s -> spread over 32)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            "id_a",
            "id_b",
            # thresholded levenshtein (Spark 3.5+): banded O(n*k) DP that
            # returns the EXACT distance when <= threshold and -1 above
            # it — identical surviving rows and values, ~6x less DP work
            # at k=25 vs the full O(n*m) (guide §1.2 per-task work). The
            # -1 sentinel must not pass the <= filter, hence between().
            F.levenshtein(
                F.substring("text_a", 1, 300),
                F.substring("text_b", 1, 300),
                _MB_EDIT_MAX,
            )
            .cast("long")
            .alias("edit_dist"),
        )
        .filter(F.col("edit_dist").between(0, _MB_EDIT_MAX))
        .orderBy("id_a", "id_b")
    )
