"""Round-7 ML feature/eval operators, part 2: lift/gains deciles,
leave-one-out target encoding, Neyman-allocation stratified sampling,
and quantile normalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.queries.ml_eval_ops import _SCORED_SQL, _scored
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Lift / cumulative-gains deciles
# --------------------------------------------------------------------------

_LIFT_ORACLE = f"""
WITH {_SCORED_SQL},
deciled AS (
  SELECT y, ntile(10) OVER (ORDER BY score_milli DESC, doc_id) AS decile
  FROM scored
),
per AS (
  SELECT decile,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS n_pos
  FROM deciled GROUP BY decile
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(n_pos) AS BIGINT) AS pt FROM per
)
SELECT decile, n, n_pos,
       floor(CAST(n_pos AS DOUBLE) / n * 10000 + 0.5) / 10000 AS response_rate,
       floor(CAST(sum(n_pos) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
                  AS DOUBLE) / max(tot.pt) * 10000 + 0.5) / 10000 AS cum_gain,
       floor((CAST(n_pos AS DOUBLE) / n)
             / (CAST(max(tot.pt) AS DOUBLE) / max(tot.nt)) * 10000 + 0.5) / 10000
         AS lift
FROM per, tot
GROUP BY decile, n, n_pos
ORDER BY decile
"""


@register("ml_lift_deciles", oracle=_LIFT_ORACLE, tags=("ml", "eval"))
def ml_lift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-gains / lift table for the stopword-rate English
    classifier: rank the population by score, cut into deciles, and
    report each decile's response rate, cumulative share of all
    positives captured, and lift over the base rate — the
    campaign-targeting readout that tells you "mailing the top 30%
    captures 62% of responders" (`ml_auc_roc` summarizes the same
    ranking to one number; this shows WHERE the ranking earns it).
    ntile runs over the scored table with a doc_id tiebreak so both
    engines cut identical deciles; all counts are exact and the three
    ratios are terminal divisions. Plan: score in one groupBy, a
    single global sort of the SCORED table (doc-cardinality, not
    token-cardinality), a 10-row agg."""
    scored = _scored(spark, sf_dir)
    deciled = scored.select(
        "y",
        F.ntile(10)
        .over(Window.orderBy(F.col("score_milli").desc(), "doc_id"))
        .alias("decile"),
    )
    per = deciled.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
    )
    tot = per.agg(
        F.sum("n").cast("long").alias("nt"), F.sum("n_pos").cast("long").alias("pt")
    )
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)

    def r4(c):
        return F.floor(c * 10000 + F.lit(0.5)) / 10000

    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n",
            "n_pos",
            r4(F.col("n_pos").cast("double") / F.col("n")).alias("response_rate"),
            r4(
                F.sum("n_pos").over(w_cum).cast("double") / F.col("pt")
            ).alias("cum_gain"),
            r4(
                (F.col("n_pos").cast("double") / F.col("n"))
                / (F.col("pt").cast("double") / F.col("nt"))
            ).alias("lift"),
        )
        .orderBy("decile")
    )


# --------------------------------------------------------------------------
# Leave-one-out target encoding
# --------------------------------------------------------------------------

_LOO_ORACLE = """
WITH base AS (
  SELECT l_suppkey,
         CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END AS t
  FROM lineitem
),
stats AS (
  SELECT l_suppkey,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(t) AS BIGINT) AS sum_t
  FROM base GROUP BY l_suppkey
),
loo AS (
  SELECT b.l_suppkey, s.n, s.sum_t,
         CAST(s.sum_t - b.t AS DOUBLE) / (s.n - 1) AS enc
  FROM base b JOIN stats s USING (l_suppkey)
  WHERE s.n > 1
)
SELECT l_suppkey, max(n) AS n, max(sum_t) AS sum_t,
       floor(min(enc) * 1000000 + 0.5) / 1000000 AS enc_min,
       floor(max(enc) * 1000000 + 0.5) / 1000000 AS enc_max,
       floor(avg(enc) * 1000000 + 0.5) / 1000000 AS enc_mean
FROM loo
GROUP BY l_suppkey
ORDER BY l_suppkey
"""


@register("feature_target_encoding_loo", oracle=_LOO_ORACLE, tags=("ml", "feature"))
def feature_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of supplier id against a
    deep-discount target: each row's categorical feature becomes the
    target mean of its OWN group excluding itself — the leakage-safe
    categorical encoder gradient-boosting pipelines reach for when a
    key has too many levels to one-hot. LOO needs only (n, sum_t) per
    group joined back to each row: one groupBy plus one broadcast-size
    join against the per-category stats table — no per-row subquery,
    no window over the fact. Encodings are (sum_t - t)/(n-1), exact
    integers divided once; the per-category min/max/mean summary keeps
    the verification output compact while pinning the full row-level
    distribution's endpoints."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        "l_suppkey", F.when(F.col("l_discount") > 0.05, 1).otherwise(0).alias("t")
    )
    stats = base.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("t").cast("long").alias("sum_t"),
    )
    loo = (
        base.join(F.broadcast(stats), "l_suppkey")
        .filter(F.col("n") > 1)
        .select(
            "l_suppkey",
            "n",
            "sum_t",
            (
                (F.col("sum_t") - F.col("t")).cast("double") / (F.col("n") - 1)
            ).alias("enc"),
        )
    )

    def r6(c):
        return F.floor(c * 1000000 + F.lit(0.5)) / 1000000

    return (
        loo.groupBy("l_suppkey")
        .agg(
            F.max("n").alias("n"),
            F.max("sum_t").alias("sum_t"),
            r6(F.min("enc")).alias("enc_min"),
            r6(F.max("enc")).alias("enc_max"),
            r6(F.avg("enc")).alias("enc_mean"),
        )
        .orderBy("l_suppkey")
    )


# --------------------------------------------------------------------------
# Neyman-allocation stratified sampling plan
# --------------------------------------------------------------------------

_NEYMAN_BUDGET = 1000

_NEYMAN_ORACLE = f"""
WITH s AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_h,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sx,
         CAST(sum(CAST(round(value * 100) AS BIGINT)
                  * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sxx
  FROM events GROUP BY event_type
),
sd AS (
  SELECT event_type, n_h,
         floor(sqrt((CAST(sxx AS DOUBLE) * n_h - CAST(sx AS DOUBLE) * sx)
                    / (CAST(n_h AS DOUBLE) * (n_h - 1))) / 100 * 10000 + 0.5) / 10000
           AS s_h
  FROM s
),
alloc AS (
  SELECT event_type, n_h, s_h,
         n_h * s_h / sum(n_h * s_h) OVER () * {_NEYMAN_BUDGET} AS raw_alloc
  FROM sd
),
fl AS (
  SELECT event_type, n_h, s_h,
         CAST(floor(raw_alloc) AS BIGINT) AS base_n,
         raw_alloc - floor(raw_alloc) AS rem,
         CAST({_NEYMAN_BUDGET} - sum(CAST(floor(raw_alloc) AS BIGINT)) OVER ()
              AS BIGINT) AS short
  FROM alloc
)
SELECT event_type, n_h, s_h,
       base_n + CASE WHEN row_number() OVER (ORDER BY rem DESC, event_type) <= short
                     THEN 1 ELSE 0 END AS n_alloc
FROM fl
ORDER BY event_type
"""


@register("sample_stratified_neyman", oracle=_NEYMAN_ORACLE, tags=("sampling", "stats"))
def sample_stratified_neyman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-allocation stratified sampling plan: split a fixed
    1000-row budget across event-type strata proportionally to
    N_h * S_h, so volatile strata get more samples — the
    variance-optimal allocation (`sample_k_per_group` allocates
    equally; this allocates optimally). Stddev comes from EXACT
    integer sums (n*Sxx - Sx^2 over cents) and is quantized to 4dp
    BEFORE the allocation arithmetic, so both engines divide identical
    doubles; integerization is floor + largest-remainder with a
    deterministic tiebreak, guaranteeing the allocations sum exactly
    to the budget. One map-side-combined pass over the fact table;
    everything after is strata-cardinality."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_h"),
        F.sum(cents).cast("long").alias("sx"),
        F.sum(cents * cents).cast("long").alias("sxx"),
    )
    sd = s.select(
        "event_type",
        "n_h",
        (
            F.floor(
                F.sqrt(
                    (F.col("sxx").cast("double") * F.col("n_h")
                     - F.col("sx").cast("double") * F.col("sx"))
                    / (F.col("n_h").cast("double") * (F.col("n_h") - 1))
                )
                / 100
                * 10000
                + F.lit(0.5)
            )
            / 10000
        ).alias("s_h"),
    )
    w_all = Window.partitionBy()
    alloc = sd.select(
        "event_type",
        "n_h",
        "s_h",
        (
            F.col("n_h") * F.col("s_h")
            / F.sum(F.col("n_h") * F.col("s_h")).over(w_all)
            * _NEYMAN_BUDGET
        ).alias("raw_alloc"),
    )
    fl = alloc.select(
        "event_type",
        "n_h",
        "s_h",
        F.floor("raw_alloc").cast("long").alias("base_n"),
        (F.col("raw_alloc") - F.floor("raw_alloc")).alias("rem"),
        (
            F.lit(_NEYMAN_BUDGET) - F.sum(F.floor("raw_alloc").cast("long")).over(w_all)
        )
        .cast("long")
        .alias("short"),
    )
    rn = F.row_number().over(Window.orderBy(F.col("rem").desc(), "event_type"))
    return fl.select(
        "event_type",
        "n_h",
        "s_h",
        (F.col("base_n") + F.when(rn <= F.col("short"), 1).otherwise(0)).alias(
            "n_alloc"
        ),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Quantile normalization (cross-group rank-mean mapping)
# --------------------------------------------------------------------------

_QNORM_TOP = 50

_QNORM_ORACLE = f"""
WITH ranked AS (
  SELECT event_type,
         CAST(round(value * 100) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn
  FROM events
)
SELECT rn,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(min(cents) AS BIGINT) AS min_cents,
       CAST(max(cents) AS BIGINT) AS max_cents,
       floor(avg(CAST(cents AS DOUBLE)) / 100 * 10000 + 0.5) / 10000 AS norm_value
FROM ranked
WHERE rn <= {_QNORM_TOP}
GROUP BY rn
ORDER BY rn
"""


@register("quantile_normalize", oracle=_QNORM_ORACLE, tags=("ml", "feature"))
def quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization (the microarray / batch-effect standard):
    rank values within each group, then replace each rank's value with
    the CROSS-GROUP mean at that rank, forcing every group onto one
    common distribution. This emits the normalization curve itself —
    the first {_QNORM_TOP} ranks' reference values plus the min/max
    spread being averaged away — which is the reusable artifact a
    pipeline broadcasts to remap full data. Ranks are tie-broken by
    event_id so both engines agree row-for-row; the mean is over
    exact integer cents. One rank window per group (single shuffle on
    event_type), one rank-keyed agg over the top slice."""
    ev = load_table(spark, sf_dir, "events")
    ranked = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("value", "event_id"))
        .alias("rn"),
    ).filter(F.col("rn") <= _QNORM_TOP)
    return (
        ranked.groupBy("rn")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.min("cents").cast("long").alias("min_cents"),
            F.max("cents").cast("long").alias("max_cents"),
            (
                F.floor(F.avg(F.col("cents").cast("double")) / 100 * 10000 + F.lit(0.5))
                / 10000
            ).alias("norm_value"),
        )
        .orderBy("rn")
    )
