"""LLM-data-pipeline operators, part 7 (round 5): weighted reservoir
sampling, a from-first-principles count-min sketch, last-touch
attribution, weighted median, int8 embedding quantization, product-
quantization ANN (completing the brute/LSH/IVF/PQ family), and
curriculum staging for training-order construction.

House contract throughout: Spark-first DataFrame plan, identically-
aliased DuckDB oracle (value-hash checkable), floats rounded identically
on both sides, docstring carries the 100 TB plan rationale. Cross-engine
determinism for anything "random" uses the repo's md5-hex idiom:
``conv(substring(md5(x),1,8),16,10)`` in Spark ==
``CAST('0x'||substr(md5(x),1,8) AS UBIGINT)`` in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Weighted reservoir sampling (Efraimidis-Spirakis A-ES)
# --------------------------------------------------------------------------

_WRS_ORACLE = """
WITH keyed AS (
  SELECT event_id, event_type, value,
         ln((CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
                  AS UBIGINT) + 1) / 4294967296.0) / value AS k
  FROM events
  WHERE value > 0
)
SELECT event_id, event_type, round(value, 2) AS w, round(k, 6) + 0.0 AS es_key
FROM keyed
ORDER BY k DESC, event_id
LIMIT 100
"""


@register("sample_weighted_reservoir", oracle=_WRS_ORACLE, tags=("llm", "sampling"))
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis A-ES):
    each row draws key u^(1/w) — here its log form ln(u)/w — from a
    DETERMINISTIC uniform u = (md5(event_id)[0:8] + 1) / 2^32, and the
    global top-k by key is an exact weighted sample. This is THE
    distributed weighted sampler: no sequential reservoir state, each
    partition computes keys map-side and the `orderBy().limit(k)`
    compiles to TakeOrderedAndProject — per-partition top-k heaps, only
    k rows per partition reach the driver-side merge, never a full sort.
    At 100 TB: one scan, k*n_partitions rows moved, no shuffle of the
    corpus. The deterministic u doubles as reproducibility — the same
    corpus always yields the same training subset (same property the
    repo's `sample_deterministic` exploits). Zero-weight rows are
    filtered first — A-ES is defined for w > 0 (P(select) -> 0 as
    w -> 0 anyway, and ln(u)/0 is the sf0.1 fixture's division-by-zero
    landmine this filter defuses)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    u = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        + 1.0
    ) / 4294967296.0
    keyed = ev.select(
        "event_id",
        "event_type",
        "value",
        (F.log(u) / F.col("value")).alias("k"),
    )
    return (
        keyed.orderBy(F.desc("k"), "event_id")
        .limit(100)
        .select(
            "event_id",
            "event_type",
            F.round("value", 2).alias("w"),
            # + 0.0 folds IEEE negative zero to +0.0 (DuckDB's round()
            # yields -0.0 for tiny negatives; Spark's yields +0.0)
            (F.round("k", 6) + F.lit(0.0)).alias("es_key"),
        )
    )


# --------------------------------------------------------------------------
# Count-min sketch, from first principles
# --------------------------------------------------------------------------

_CMS_DEPTH = 3
_CMS_WIDTH = 32

_CMS_ORACLE = f"""
WITH rows_d AS (SELECT i FROM generate_series(0, {_CMS_DEPTH - 1}) AS t(i)),
hashed AS (
  SELECT d.i AS depth,
         CAST(('0x' || substr(md5(CAST(d.i AS VARCHAR) || ':' || e.event_type), 1, 8))
              AS UBIGINT) % {_CMS_WIDTH} AS bucket
  FROM events e, rows_d d
),
sketch AS (
  SELECT depth, bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM hashed GROUP BY depth, bucket
),
items AS (SELECT DISTINCT event_type FROM events),
item_buckets AS (
  SELECT it.event_type, d.i AS depth,
         CAST(('0x' || substr(md5(CAST(d.i AS VARCHAR) || ':' || it.event_type), 1, 8))
              AS UBIGINT) % {_CMS_WIDTH} AS bucket
  FROM items it, rows_d d
),
est AS (
  SELECT ib.event_type, min(s.cnt) AS est_cnt
  FROM item_buckets ib JOIN sketch s USING (depth, bucket)
  GROUP BY ib.event_type
),
truth AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS true_cnt
  FROM events GROUP BY event_type
)
SELECT e.event_type, t.true_cnt, e.est_cnt, e.est_cnt - t.true_cnt AS overcount
FROM est e JOIN truth t USING (event_type)
ORDER BY event_type
"""


@register("agg_count_min_sketch", oracle=_CMS_ORACLE, tags=("sketch", "agg"))
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch built from first principles (sibling of the
    repo's Bloom filter / HLL / Theta / KLL family): d={_CMS_DEPTH} hash
    rows x w={_CMS_WIDTH} counters, update = +1 at (i, h_i(x)), point
    query = min over rows — estimates never undercount, collisions only
    overcount. The sketch is built as a two-stage partial aggregate on a
    (depth, bucket) key space of d*w cells: at 100 TB the corpus never
    shuffles — each task folds its partition into <=96 counters and only
    KB-sized sketch state crosses the wire, the same mergeability that
    makes CMS the standard streaming heavy-hitter sketch. The query side
    joins the d-row bucket table for each probed item against the
    d*w-cell sketch — both broadcast-sized at any corpus scale."""
    ev = load_table(spark, sf_dir, "events")
    depths = F.array(*[F.lit(i) for i in range(_CMS_DEPTH)])

    def bucket(depth_col, item_col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(depth_col.cast("string"), F.lit(":"), item_col)),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % _CMS_WIDTH
        )

    hashed = ev.select(F.explode(depths).alias("depth"), "event_type").select(
        "depth", bucket(F.col("depth"), F.col("event_type")).alias("bucket")
    )
    sketch = hashed.groupBy("depth", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    items = ev.select("event_type").distinct()
    item_buckets = items.select(
        "event_type", F.explode(depths).alias("depth")
    ).select("event_type", "depth", bucket(F.col("depth"), F.col("event_type")).alias("bucket"))
    est = (
        item_buckets.join(F.broadcast(sketch), ["depth", "bucket"])
        .groupBy("event_type")
        .agg(F.min("cnt").alias("est_cnt"))
    )
    truth = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("true_cnt"))
    return (
        est.join(truth, "event_type")
        .select(
            "event_type",
            "true_cnt",
            "est_cnt",
            (F.col("est_cnt") - F.col("true_cnt")).alias("overcount"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Last-touch attribution
# --------------------------------------------------------------------------

_ATTRIB_ORACLE = """
WITH w AS (
  SELECT user_id, event_id, ts, event_type, value,
         max(CASE WHEN event_type = 'click' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts
  FROM events
)
SELECT user_id, event_id AS purchase_event_id, round(value, 2) AS revenue,
       last_click_ts,
       (epoch_us(ts) - epoch_us(last_click_ts)) // 60000000 AS mins_since_click
FROM w
WHERE event_type = 'purchase' AND last_click_ts IS NOT NULL
ORDER BY user_id, purchase_event_id
"""


@register("events_attribution_last_touch", oracle=_ATTRIB_ORACLE, tags=("analytics", "window"))
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase is credited to the user's
    most recent preceding click. Expressed as a conditional running max
    over a (user, time)-ordered window — because the frame is ordered by
    ts, `max(CASE click THEN ts END) OVER (... 1 PRECEDING)` IS the last
    click without a self-join or as-of join. One shuffle on user_id
    serves the whole query; the filter to purchases happens after the
    window map-side. At 100 TB this is the textbook sessionized-window
    shape: per-user state is a single running timestamp, no state blowup
    on heavy users, and AQE's skew splitting handles hot user_ids since
    the window partitions by the same key the shuffle hashed on."""
    ev = load_table(spark, sf_dir, "events")
    win = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    last_click = F.max(
        F.when(F.col("event_type") == "click", F.col("ts"))
    ).over(win)
    return (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            "event_type",
            "value",
            last_click.alias("last_click_ts"),
        )
        .filter((F.col("event_type") == "purchase") & F.col("last_click_ts").isNotNull())
        .select(
            "user_id",
            F.col("event_id").alias("purchase_event_id"),
            F.round("value", 2).alias("revenue"),
            "last_click_ts",
            F.expr(
                "(unix_micros(ts) - unix_micros(last_click_ts)) div 60000000"
            ).alias("mins_since_click"),
        )
        .orderBy("user_id", "purchase_event_id")
    )


# --------------------------------------------------------------------------
# Weighted median
# --------------------------------------------------------------------------

_WMEDIAN_ORACLE = """
WITH cum AS (
  SELECT l_returnflag, l_extendedprice,
         sum(l_quantity) OVER (PARTITION BY l_returnflag
                               ORDER BY l_extendedprice, l_orderkey, l_linenumber
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tw
  FROM lineitem
)
SELECT l_returnflag, round(min(l_extendedprice), 2) AS weighted_median
FROM cum
WHERE cw >= tw / 2
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("agg_weighted_median", oracle=_WMEDIAN_ORACLE, tags=("agg", "window"))
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (price weighted by quantity) via the cumulative-
    weight formulation: sort the group by value, take the first value
    whose running weight crosses half the total. Both windows — the
    running sum and the per-group total — share ONE shuffle on the group
    key (Catalyst reuses the exchange; the repo's
    `test_scd2_single_shuffle_for_both_windows` pins the same pattern).
    The quantile crossing is then a map-side filter + a min aggregate on
    the handful of crossing rows. Exact, not approximate — the weighted
    generalization percentile_approx can't express. At 100 TB the
    per-group sort is the cost; it rides the shuffle's spillable sort,
    never a driver-side collect."""
    li = load_table(spark, sf_dir, "lineitem")
    by_grp = W.partitionBy("l_returnflag")
    run = by_grp.orderBy("l_extendedprice", "l_orderkey", "l_linenumber").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    cum = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum("l_quantity").over(run).alias("cw"),
        F.sum("l_quantity").over(by_grp).alias("tw"),
    )
    return (
        cum.filter(F.col("cw") >= F.col("tw") / 2)
        .groupBy("l_returnflag")
        .agg(F.round(F.min("l_extendedprice"), 2).alias("weighted_median"))
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Int8 embedding quantization
# --------------------------------------------------------------------------

_QUANT_ORACLE = """
WITH dims AS (SELECT i FROM generate_series(1, 64) AS t(i)),
flat AS (
  SELECT e.vec_id, e.label, d.i AS dim, CAST(embedding[d.i] AS DOUBLE) AS v
  FROM embeddings e, dims d
),
stats AS (SELECT dim, min(v) AS lo, max(v) AS hi FROM flat GROUP BY dim),
q AS (
  SELECT f.vec_id, f.label, f.v,
         s.lo + round((f.v - s.lo) / ((s.hi - s.lo) / 255.0))
              * ((s.hi - s.lo) / 255.0) AS vq
  FROM flat f JOIN stats s USING (dim)
),
per_vec AS (
  SELECT vec_id, label,
         avg((v - vq) * (v - vq)) AS mse,
         max(abs(v - vq)) AS maxerr
  FROM q GROUP BY vec_id, label
)
SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       round(avg(mse) * 1e6, 3) AS avg_mse_e6,
       round(max(maxerr) * 1e3, 3) AS max_abs_err_e3
FROM per_vec
GROUP BY label
ORDER BY label
"""


@register("embedding_quantize_int8", oracle=_QUANT_ORACLE, tags=("llm", "ann", "embedding"))
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension min/max int8 quantization of the embedding corpus —
    the 4x storage/bandwidth reduction every large-scale ANN deployment
    applies before indexing — with a reconstruction-error audit (MSE and
    max abs error per label) that tells you whether downstream recall
    will survive. Plan shape for 100 TB: pass 1 computes 64 (dim, lo,
    hi) cells via partial aggregates (corpus never shuffles — only
    per-partition minmax state merges); the 64-row scale table then
    BROADCASTS back for the quantize + error pass, so pass 2 is entirely
    map-side followed by a partial-agg rollup to one row per label.
    Explode-then-aggregate is used on BOTH sides so the oracle's
    arbitrary-order float sums and Spark's agree to well past the
    3-decimal rounding."""
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "pos", "v"
        ),
    ).select("vec_id", "label", (F.col("pos") + 1).alias("dim"), "v")
    stats = flat.groupBy("dim").agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    scale = (F.col("hi") - F.col("lo")) / 255.0
    q = flat.join(F.broadcast(stats), "dim").select(
        "vec_id",
        "label",
        "v",
        (F.col("lo") + F.round((F.col("v") - F.col("lo")) / scale) * scale).alias("vq"),
    )
    err = F.col("v") - F.col("vq")
    per_vec = q.groupBy("vec_id", "label").agg(
        F.avg(err * err).alias("mse"), F.max(F.abs(err)).alias("maxerr")
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("mse") * 1e6, 3).alias("avg_mse_e6"),
            F.round(F.max("maxerr") * 1e3, 3).alias("max_abs_err_e3"),
        )
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# Product-quantization ANN (ADC)
# --------------------------------------------------------------------------

_PQ_M = 4  # subspaces
_PQ_SUB = 16  # dims per subspace
_PQ_K = 8  # centroids per subspace (codebook = subvectors of vec_id < 8)

_PQ_ORACLE = f"""
WITH dims AS (SELECT i FROM generate_series(1, 64) AS t(i)),
flat AS (
  SELECT e.vec_id, d.i AS dim,
         (d.i - 1) // {_PQ_SUB} AS m, (d.i - 1) % {_PQ_SUB} AS j,
         CAST(embedding[d.i] AS DOUBLE) AS v
  FROM embeddings e, dims d
),
cb AS (SELECT vec_id AS cid, m, j, v FROM flat WHERE vec_id < {_PQ_K}),
assign AS (
  SELECT f.vec_id, f.m, c.cid,
         sum((f.v - c.v) * (f.v - c.v)) AS d2
  FROM flat f JOIN cb c ON f.m = c.m AND f.j = c.j
  GROUP BY f.vec_id, f.m, c.cid
),
codes AS (
  SELECT vec_id, m, cid AS code FROM (
    SELECT vec_id, m, cid,
           row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, cid) AS rn
    FROM assign
  ) WHERE rn = 1
),
lut AS (
  SELECT f.vec_id AS qid, f.m, c.cid,
         sum((f.v - c.v) * (f.v - c.v)) AS d2
  FROM flat f JOIN cb c ON f.m = c.m AND f.j = c.j
  WHERE f.vec_id % 50 = 0
  GROUP BY f.vec_id, f.m, c.cid
),
adc AS (
  SELECT l.qid, cd.vec_id, sum(l.d2) AS adist
  FROM codes cd JOIN lut l ON cd.m = l.m AND cd.code = l.cid
  GROUP BY l.qid, cd.vec_id
),
ranked AS (
  SELECT qid, vec_id, adist,
         row_number() OVER (PARTITION BY qid ORDER BY round(adist, 4), vec_id)
           AS rnk
  FROM adc WHERE qid != vec_id
)
SELECT qid, CAST(rnk AS BIGINT) AS rnk, vec_id, round(adist, 4) AS adist
FROM ranked WHERE rnk <= 5
ORDER BY qid, rnk
"""


@register("ann_pq_adc", oracle=_PQ_ORACLE, tags=("llm", "ann", "embedding"))
def ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation —
    the fourth leg of the repo's similarity family (brute-force, LSH,
    IVF, now PQ — the memory-bound regime's answer: 64 float dims
    compress to M={_PQ_M} byte codes). Encode: split each vector into M
    subvectors, assign each to its nearest of K={_PQ_K} subspace
    centroids (codebook = subvectors of the first K vectors — a real
    deployment k-means's this offline; deterministic seeding keeps the
    oracle exact). Query: per (query, subspace) a K-entry distance LUT,
    and the approximate distance is a SUM OF LUT LOOKUPS — no float math
    against the corpus at query time. 100 TB plan: the codebook (KBs)
    broadcasts for map-side encoding (corpus never shuffles to encode);
    the LUT (n_q x M x K rows) broadcasts for scoring, so the only
    shuffle is the final groupBy/top-k on (query, vec) partial
    distances. Spark side computes subvector distances with
    zip_with+aggregate in JVM codegen over double-cast arrays —
    identical element order to the oracle's grouped sum, rounded to 4
    decimals on both sides."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("vd")
    )
    subs = emb.select(
        "vec_id",
        F.posexplode(
            F.array(
                *[F.slice("vd", m * _PQ_SUB + 1, _PQ_SUB) for m in range(_PQ_M)]
            )
        ).alias("m", "sub"),
    )
    cb = subs.filter(F.col("vec_id") < _PQ_K).select(
        F.col("vec_id").alias("cid"), "m", F.col("sub").alias("csub")
    )

    def l2sq(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    assign = subs.join(F.broadcast(cb), "m").select(
        "vec_id", "m", "cid", l2sq(F.col("sub"), F.col("csub")).alias("d2")
    )
    rn = F.row_number().over(W.partitionBy("vec_id", "m").orderBy("d2", "cid"))
    codes = (
        assign.withColumn("rn", rn).filter(F.col("rn") == 1).select(
            "vec_id", "m", F.col("cid").alias("code")
        )
    )
    lut = (
        subs.filter(F.col("vec_id") % 50 == 0)
        .join(F.broadcast(cb), "m")
        .select(
            F.col("vec_id").alias("qid"),
            "m",
            "cid",
            l2sq(F.col("sub"), F.col("csub")).alias("d2"),
        )
    )
    adc = (
        codes.join(
            F.broadcast(lut),
            (codes.m == lut.m) & (codes.code == lut.cid),
        )
        .groupBy("qid", "vec_id")
        .agg(F.sum("d2").alias("adist"))
        .filter(F.col("qid") != F.col("vec_id"))
    )
    # Rank by the ROUNDED distance: the fixture's planted near-dup
    # vectors produce mathematically-equal ADC distances whose unrounded
    # doubles differ in the last ulp between engines (grouped-sum order),
    # flipping rank-1 at sf0.1. Rounding to the output precision before
    # ranking makes vec_id the deciding tie-break on both sides.
    rnk = F.row_number().over(
        W.partitionBy("qid").orderBy(F.round("adist", 4), "vec_id")
    )
    return (
        adc.withColumn("rnk", rnk.cast("long"))
        .filter(F.col("rnk") <= 5)
        .select("qid", "rnk", "vec_id", F.round("adist", 4).alias("adist"))
        .orderBy("qid", "rnk")
    )


# --------------------------------------------------------------------------
# Curriculum staging
# --------------------------------------------------------------------------

_CURRICULUM_ORACLE = """
WITH scored AS (
  SELECT doc_id, n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')), 6) AS ttr
  FROM documents
),
staged AS (
  SELECT doc_id, n_chars, n_words, ttr,
         ntile(4) OVER (ORDER BY n_words * (1.0 - ttr), doc_id) AS stage
  FROM scored
)
SELECT CAST(stage AS BIGINT) AS stage,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(n_words) AS BIGINT) AS min_words,
       CAST(max(n_words) AS BIGINT) AS max_words,
       round(avg(n_words), 3) AS avg_words,
       round(avg(ttr), 4) AS avg_ttr
FROM staged
GROUP BY stage
ORDER BY stage
"""


@register("curriculum_difficulty_stages", oracle=_CURRICULUM_ORACLE, tags=("llm", "assembly"))
def curriculum_difficulty_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum construction for training-order scheduling: score each
    document's difficulty as length x repetitiveness (n_words * (1 -
    type-token ratio) — longer and more repetitive reads as harder to
    learn from cleanly), then cut the corpus into 4 ordered stages with
    ntile. The tie-break on doc_id makes the stage assignment fully
    deterministic. ntile needs a global order — at 100 TB you'd swap it
    for the repo's `feature_binning_ntile` approach at percentile
    boundaries (approx quantiles -> map-side bucket assignment) rather
    than a single-partition sort; at audit scale the exact ntile is the
    point, and the output is the per-stage scorecard (tiny), not the
    staged corpus itself."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    scored = docs.select(
        "doc_id",
        "n_chars",
        F.size(words).cast("long").alias("n_words"),
        F.round(
            F.size(F.array_distinct(words)).cast("double") / F.size(words), 6
        ).alias("ttr"),
    )
    stage = F.ntile(4).over(
        W.orderBy(F.col("n_words") * (1.0 - F.col("ttr")), "doc_id")
    )
    staged = scored.select(
        "doc_id", "n_words", "ttr", stage.cast("long").alias("stage")
    )
    return (
        staged.groupBy("stage")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_words").alias("min_words"),
            F.max("n_words").alias("max_words"),
            F.round(F.avg("n_words"), 3).alias("avg_words"),
            F.round(F.avg("ttr"), 4).alias("avg_ttr"),
        )
        .orderBy("stage")
    )
