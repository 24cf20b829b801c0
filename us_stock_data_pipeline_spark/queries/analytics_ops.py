"""Event-analytics operators: ordered funnels, retention cohorts, VWAP/
TWAP bars, rolling z-score anomaly detection, and distribution entropy.

The product-analytics query family every event warehouse runs daily —
each one expressed as partial-aggregable groupBys and windows so the
same plan survives a 1000-executor shuffle (no per-user collect, no
driver loops)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Ordered funnel
# --------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'signup' GROUP BY 1
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t1
  WHERE e.event_type = 'view' GROUP BY 1
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t2
  WHERE e.event_type = 'purchase' GROUP BY 1
)
SELECT
  CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_signup,
  CAST((SELECT count(*) FROM s2) AS BIGINT) AS n_view_after,
  CAST((SELECT count(*) FROM s3) AS BIGINT) AS n_purchase_after,
  round(CAST((SELECT count(*) FROM s2) AS DOUBLE)
        / (SELECT count(*) FROM s1), 4) AS view_rate,
  round(CAST((SELECT count(*) FROM s3) AS DOUBLE)
        / (SELECT count(*) FROM s1), 4) AS purchase_rate
"""


@register("events_funnel", oracle=_FUNNEL_ORACLE, tags=("analytics", "funnel"))
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered 3-step funnel (signup -> view -> purchase) in a
    SINGLE scan and a SINGLE user_id shuffle: each stage timestamp is a
    conditional min window over the user partition, and later stages
    reference earlier stages' window columns — three sequential window
    projects over one partitioning, then one global roll-up. (The naive
    per-stage groupBy+join formulation scanned events 11 times; at
    100 TB the scan count IS the query cost for a 1-row answer.)"""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    staged = (
        ev.select("user_id", "event_type", "ts")
        .withColumn("t1", F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w))
        .withColumn(
            "t2",
            F.min(
                F.when((F.col("event_type") == "view") & (F.col("ts") > F.col("t1")), F.col("ts"))
            ).over(w),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")), F.col("ts")
                )
            ).over(w),
        )
        .groupBy("user_id")
        .agg(F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3"))
    )
    return staged.agg(
        F.count("t1").alias("n_signup"),
        F.count("t2").alias("n_view_after"),
        F.count("t3").alias("n_purchase_after"),
        F.round(F.count("t2").cast("double") / F.count("t1"), 4).alias("view_rate"),
        F.round(F.count("t3").cast("double") / F.count("t1"), 4).alias("purchase_rate"),
    )


# --------------------------------------------------------------------------
# Retention cohorts
# --------------------------------------------------------------------------

_RETENTION_ORACLE = """
WITH first AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY 1
),
act AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events
)
SELECT
  f.cohort_week,
  CAST(date_diff('day', f.cohort_week, a.wk) / 7 AS BIGINT) AS week_offset,
  CAST(count(*) AS BIGINT) AS n_users
FROM act a JOIN first f USING (user_id)
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("events_retention", oracle=_RETENTION_ORACLE, tags=("analytics", "retention"))
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: cohort = ISO week of a user's first
    event; each (cohort, week-offset) cell counts users active that many
    weeks later. Two aggregations and one join, all shuffled on user_id
    then on the (cohort, offset) pair — the distinct-activity table is
    pre-deduped per (user, week) so the final count is a plain count,
    not count(DISTINCT) over raw events."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    act = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
    ).dropDuplicates()
    return (
        act.join(first, "user_id")
        .select(
            "cohort_week",
            (F.datediff("wk", "cohort_week") / 7).cast("long").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


# --------------------------------------------------------------------------
# VWAP / TWAP bars
# --------------------------------------------------------------------------

_VWAP_ORACLE = """
SELECT
  CAST(date_trunc('day', ts) AS DATE) AS day,
  event_type AS symbol,
  floor(sum(value * (event_id % 100 + 1)) / sum(event_id % 100 + 1) * 10000 + 0.5) / 10000 AS vwap,
  floor(avg(value) * 10000 + 0.5) / 10000 AS twap,
  CAST(sum(event_id % 100 + 1) AS BIGINT) AS volume
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("bars_vwap_twap", oracle=_VWAP_ORACLE, tags=("stock", "agg"))
def bars_vwap_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily VWAP and TWAP per symbol (events-as-ticks: event_type is
    the symbol, value the price, and a deterministic event_id-derived
    quantity stands in for trade size — the fixture has no volume
    column). One partial-aggregable groupBy; the volume-weighted mean is
    sum(p*v)/sum(v), never a collect-and-loop. Parity flavor: the
    reference stores vw from the wire (`ingest_massive.py:70`) but never
    recomputes it; here it is derived, which is what a surveillance
    pipeline must do from raw ticks."""
    ev = load_table(spark, sf_dir, "events")
    vol = F.col("event_id") % 100 + 1
    return (
        ev.groupBy(
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
            F.col("event_type").alias("symbol"),
        )
        .agg(
            # floor(x*1e4+0.5)/1e4 instead of round(x, 4): means/ratios of
            # the 2dp fixture values are exact decimals that land ON round
            # boundaries (e.g. 2301.74/80 = 28.77175), where Spark
            # (HALF_UP on decimal repr) and DuckDB (binary value) round
            # opposite ways. The floor form computes bit-identically in
            # double arithmetic on both engines (positive values only).
            (F.floor(F.sum(F.col("value") * vol) / F.sum(vol) * 10000 + 0.5) / 10000).alias("vwap"),
            (F.floor(F.avg("value") * 10000 + 0.5) / 10000).alias("twap"),
            F.sum(vol).cast("long").alias("volume"),
        )
        .orderBy("day", "symbol")
    )


# --------------------------------------------------------------------------
# Rolling z-score anomaly detection
# --------------------------------------------------------------------------

_ZSCORE_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day, avg(value) AS v
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT event_type, day, v,
    avg(v) OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS mu,
    stddev_samp(v) OVER (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS sd,
    count(v) OVER (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS n
  FROM daily
)
SELECT event_type, day, floor(v * 10000 + 0.5) / 10000 AS v, round((v - mu) / sd, 4) AS zscore
FROM w
WHERE n >= 3 AND sd > 1e-9
ORDER BY event_type, day
"""


@register("anomaly_rolling_zscore", oracle=_ZSCORE_ORACLE, tags=("analytics", "window"))
def anomaly_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score of the daily mean vs its own trailing 7-day
    window (excluding today — the detector must not see the point it
    scores). Window partitioned by the series key; with real ticker
    symbols the key is high-cardinality and the sort is per-partition,
    never global (same shape as bars_technical_indicators). Warm-up rows
    (n<3) and flat windows (sd~0) are excluded rather than emitting
    NaN/inf — both engines agree on the guard."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.avg("value").alias("v"))
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-7, -1)
    scored = daily.select(
        "event_type",
        "day",
        "v",
        F.avg("v").over(w).alias("mu"),
        F.stddev_samp("v").over(w).alias("sd"),
        F.count("v").over(w).alias("n"),
    )
    return (
        scored.filter((F.col("n") >= 3) & (F.col("sd") > 1e-9))
        .select(
            "event_type",
            "day",
            (F.floor(F.col("v") * 10000 + 0.5) / 10000).alias("v"),
            F.round((F.col("v") - F.col("mu")) / F.col("sd"), 4).alias("zscore"),
        )
        .orderBy("event_type", "day")
    )


# --------------------------------------------------------------------------
# Distribution entropy
# --------------------------------------------------------------------------

_ENTROPY_ORACLE = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS c FROM events GROUP BY 1, 2
),
t AS (SELECT user_id, sum(c) AS n FROM c GROUP BY 1)
SELECT
  c.user_id,
  round(-sum((CAST(c.c AS DOUBLE) / t.n) * ln(CAST(c.c AS DOUBLE) / t.n)), 4) AS entropy,
  CAST(count(*) AS BIGINT) AS n_types
FROM c JOIN t USING (user_id)
GROUP BY c.user_id
ORDER BY user_id
"""


@register("agg_entropy", oracle=_ENTROPY_ORACLE, tags=("analytics", "agg"))
def agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type mix — the behavioral-
    diversity score (and, on documents, the char/token-distribution
    quality filter LLM corpus pipelines use). Two groupBys on the same
    user_id key (one partitioning, reused) and a broadcast-size join;
    the -sum(p ln p) fold is a plain aggregate, computed identically on
    both engines."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    t = c.groupBy("user_id").agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    return (
        c.join(t, "user_id")
        .groupBy("user_id")
        .agg(
            F.round(-F.sum(p * F.log(p)), 4).alias("entropy"),
            F.count(F.lit(1)).alias("n_types"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Cross-series correlation matrix
# --------------------------------------------------------------------------

_CORR_ORACLE = """
WITH daily AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         avg(value) AS close
  FROM events GROUP BY 1, 2
)
SELECT a.symbol AS symbol_a, b.symbol AS symbol_b,
       round(corr(a.close, b.close), 4) AS correlation,
       CAST(count(*) AS BIGINT) AS n_days
FROM daily a JOIN daily b ON a.day = b.day AND a.symbol < b.symbol
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("bars_correlation_matrix", oracle=_CORR_ORACLE, tags=("stock", "agg", "join"))
def bars_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise correlation of daily closes across all symbol pairs —
    the cross-sectional risk matrix. The self-join aligns series on the
    DAY key, so the pair blow-up is bounded by symbols-per-day (k², with
    k symbols), never by history length; corr() is a single-pass
    partial-aggregable moment. With thousands of symbols the same plan
    holds — the day-keyed join shuffles each day's k closes once, and
    the k² pair space IS the output, not an intermediate."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).agg(F.avg("value").alias("close"))
    a = daily.select(F.col("symbol").alias("symbol_a"), "day", F.col("close").alias("close_a"))
    b = daily.select(F.col("symbol").alias("symbol_b"), "day", F.col("close").alias("close_b"))
    return (
        a.join(b, "day")
        .filter(F.col("symbol_a") < F.col("symbol_b"))
        .groupBy("symbol_a", "symbol_b")
        .agg(
            F.round(F.corr("close_a", "close_b"), 4).alias("correlation"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .orderBy("symbol_a", "symbol_b")
    )


# --------------------------------------------------------------------------
# Pure band (range-only) join via time-bucket binning
# --------------------------------------------------------------------------

_BANDED_ORACLE = """
SELECT c.event_id AS click_id, p.event_id AS purchase_id,
       round(p.value, 4) AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
ORDER BY click_id, purchase_id
"""


@register("join_range_banded", oracle=_BANDED_ORACLE, tags=("join", "range"), bench=True)
def join_range_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-ONLY join (no equi key): every click matched to every
    purchase in the following hour, across all users. A naive
    formulation is a cartesian product with a filter — quadratic and
    plan-asserted against in tests. The scale technique is BAND
    BINNING: bucket both sides into interval-width bins, explode each
    probe row into its two candidate bins (a 1-hour window can only
    span bins b and b+1), equi-join on the bin, then apply the exact
    band predicate to the co-located candidates. Shuffle volume is
    2x probe + 1x build on a dense integer key, never |A|x|B|; at
    100 TB with temporally skewed bins, the bin key gets a salt
    compound exactly like join_salted_skew. DuckDB's oracle uses its
    native IEJoin for the same semantics."""
    ev = load_table(spark, sf_dir, "events")
    hour_bin = lambda c: (F.unix_timestamp(c) / 3600).cast("long")  # noqa: E731
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
        F.explode(
            F.array(hour_bin(F.col("ts")), hour_bin(F.col("ts")) + 1)
        ).alias("bin"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        F.col("value"),
        hour_bin(F.col("ts")).alias("bin"),
    )
    return (
        # shuffled-hash on the dense bin key: both sides arrive unsorted,
        # so sort-merge pays two sorts the per-bin hash build skips; the
        # build side is bounded by purchases-per-bin (the same density
        # the banding already relies on — a temporally hot bin gets the
        # salt compound either way). Measured ~10% at sf0.1 (guide §3.1).
        clicks.join(purchases.hint("shuffle_hash"), "bin")
        .filter(
            (F.col("p_ts") > F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR"))
        )
        .select("click_id", "purchase_id", F.round("value", 4).alias("purchase_value"))
        .orderBy("click_id", "purchase_id")
    )


# --------------------------------------------------------------------------
# Winsorization (outlier capping)
# --------------------------------------------------------------------------

_WINSORIZE_ORACLE = """
WITH bounds AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS lo,
         quantile_cont(value, 0.95) AS hi
  FROM events GROUP BY 1
)
SELECT e.event_id, e.event_type,
       round(e.value, 4) AS value,
       round(CASE WHEN e.value < b.lo THEN b.lo
                  WHEN e.value > b.hi THEN b.hi
                  ELSE e.value END, 4) AS value_capped,
       (e.value < b.lo OR e.value > b.hi) AS was_clipped
FROM events e JOIN bounds b USING (event_type)
ORDER BY e.event_id
"""


@register("clean_winsorize", oracle=_WINSORIZE_ORACLE, tags=("analytics", "cleaning"))
def clean_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization: cap each value at its group's [p05, p95] — the
    standard outlier treatment before feature scaling / loss-sensitive
    training. Bounds come from one per-group aggregate (exact
    percentile here; agg_kll_quantiles is the sketch path when groups
    don't fit a sort) joined back broadcast-small; the cap itself is a
    map-side CASE. Emits the clipped flag so downstream can audit how
    much signal the cap destroyed."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.05)).alias("lo"),
        F.percentile("value", F.lit(0.95)).alias("hi"),
    )
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
            F.round(
                F.when(F.col("value") < F.col("lo"), F.col("lo"))
                .when(F.col("value") > F.col("hi"), F.col("hi"))
                .otherwise(F.col("value")),
                4,
            ).alias("value_capped"),
            ((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))).alias(
                "was_clipped"
            ),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# Equi-depth feature binning
# --------------------------------------------------------------------------

_BINNING_ORACLE = """
WITH binned AS (
  SELECT event_type, value,
         ntile(10) OVER (PARTITION BY event_type ORDER BY value, event_id) AS bin
  FROM events
)
SELECT event_type, CAST(bin AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n,
       round(min(value), 4) AS lo,
       round(max(value), 4) AS hi,
       round(avg(value), 4) AS mean_val
FROM binned
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("feature_binning_ntile", oracle=_BINNING_ORACLE, tags=("analytics", "window", "ml"))
def feature_binning_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) binning per group with per-bin stats — the
    feature-discretization step before monotonic-feature models and the
    shape of every histogram-equalized feature store column. ntile ties
    are broken by event_id so bin assignment is a total order both
    engines agree on. One window + one groupBy, both on the group key
    (a high-cardinality symbol/feature id at scale, never a global
    sort)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.select("event_type", "value", F.ntile(10).over(w).alias("bin"))
        .groupBy("event_type", "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 4).alias("lo"),
            F.round(F.max("value"), 4).alias("hi"),
            F.round(F.avg("value"), 4).alias("mean_val"),
        )
        .select("event_type", F.col("bin").cast("long").alias("bin"), "n", "lo", "hi", "mean_val")
        .orderBy("event_type", "bin")
    )


# --------------------------------------------------------------------------
# Cumulative unique users over time
# --------------------------------------------------------------------------

_CUMULATIVE_ORACLE = """
WITH first_seen AS (
  SELECT user_id, CAST(date_trunc('day', min(ts)) AS DATE) AS first_day
  FROM events GROUP BY 1
),
daily AS (
  SELECT first_day AS day, count(*) AS new_users FROM first_seen GROUP BY 1
)
SELECT day,
       CAST(new_users AS BIGINT) AS new_users,
       CAST(sum(new_users) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cumulative_users
FROM daily
ORDER BY day
"""


@register("events_cumulative_uniques", oracle=_CUMULATIVE_ORACLE, tags=("analytics", "window"))
def events_cumulative_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-growth curve: daily NEW users (first-seen compaction) and
    the running cumulative unique count. The naive formulation —
    count(DISTINCT user) over an expanding window — holds every
    historical id in window state; compacting to first-seen dates first
    turns it into a daily count plus a running SUM over a tiny series
    (the growth-accounting identity: cumulative uniques = cumsum of
    first-appearances). The final window is over days, not users — KBs
    of state at any corpus size."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("first_day")
    )
    daily = first_seen.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        daily.select(
            "day",
            "new_users",
            F.sum("new_users").over(w).alias("cumulative_users"),
        )
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# Markov transition matrix over event sequences
# --------------------------------------------------------------------------

_MARKOV_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events
),
pairs AS (
  SELECT event_type AS from_type, next_type AS to_type, count(*) AS c
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY 1, 2
),
totals AS (
  SELECT from_type, sum(c) AS t FROM pairs GROUP BY 1
)
SELECT p.from_type, p.to_type,
       CAST(p.c AS BIGINT) AS n_transitions,
       round(CAST(p.c AS DOUBLE) / t.t, 4) AS probability
FROM pairs p JOIN totals t USING (from_type)
ORDER BY from_type, to_type
"""


@register("events_markov_transition", oracle=_MARKOV_ORACLE, tags=("analytics", "sequence"))
def events_markov_transition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for each
    (from, to) event-type pair, the transition count and row-normalized
    probability. Consecutive pairs come from ONE lead window per user
    (deterministic under timestamp ties via event_id); the matrix is a
    k^2-bounded aggregate however long the histories are — the
    behavioral-model fit that runs on full clickstreams precisely
    because nothing in the plan is proportional to sequence length
    except the initial scan."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n_transitions").alias("t"))
    return (
        pairs.join(totals, "from_type")
        .select(
            "from_type",
            "to_type",
            "n_transitions",
            F.round(F.col("n_transitions").cast("double") / F.col("t"), 4).alias("probability"),
        )
        .orderBy("from_type", "to_type")
    )


# --------------------------------------------------------------------------
# Longest activity streak (gaps-and-islands on the calendar)
# --------------------------------------------------------------------------

_STREAK_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events
),
runs AS (
  SELECT user_id, day,
         day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER)
           AS run_key
  FROM days
),
streaks AS (
  SELECT user_id, count(*) AS streak_len, min(day) AS streak_start
  FROM runs GROUP BY user_id, run_key
)
SELECT user_id,
       CAST(max(streak_len) AS BIGINT) AS longest_streak,
       CAST(count(*) AS BIGINT) AS n_streaks
FROM streaks
GROUP BY user_id
ORDER BY user_id
"""


@register("events_activity_streaks", oracle=_STREAK_ORACLE, tags=("analytics", "window"))
def events_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — calendar
    gaps-and-islands: distinct active days, then day minus its row
    number is constant within a consecutive run (the classic island
    key), so streaks are one groupBy away. Differs from
    etl_sessionization_gaps (timestamp-gap sessions): the island key
    here is arithmetic on the calendar, no gap threshold. All shuffles
    on user_id; the distinct-day compaction bounds everything downstream
    by active-days, not raw events."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).dropDuplicates()
    w = Window.partitionBy("user_id").orderBy("day")
    runs = days.select(
        "user_id",
        "day",
        F.date_sub("day", F.row_number().over(w)).alias("run_key"),
    )
    streaks = runs.groupBy("user_id", "run_key").agg(F.count(F.lit(1)).alias("streak_len"))
    return (
        streaks.groupBy("user_id")
        .agg(
            F.max("streak_len").alias("longest_streak"),
            F.count(F.lit(1)).alias("n_streaks"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Log returns and realized volatility
# --------------------------------------------------------------------------

_VOLATILITY_ORACLE = """
WITH daily AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         arg_max(value, event_id) AS close
  FROM events GROUP BY 1, 2
),
rets AS (
  SELECT symbol, day, close,
         ln(close / lag(close) OVER (PARTITION BY symbol ORDER BY day)) AS log_ret
  FROM daily
)
SELECT symbol,
       CAST(count(log_ret) AS BIGINT) AS n_returns,
       round(avg(log_ret), 6) AS mean_ret,
       round(stddev_samp(log_ret), 6) AS daily_vol,
       round(stddev_samp(log_ret) * sqrt(252), 6) AS annualized_vol
FROM rets
GROUP BY symbol
ORDER BY symbol
"""


@register("bars_volatility", oracle=_VOLATILITY_ORACLE, tags=("stock", "window", "agg"))
def bars_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily log returns (lag window per symbol) rolled into realized
    and annualized volatility — the risk number every stock pipeline
    publishes. The return series needs one per-symbol lag; the
    volatility is a plain partial-aggregable stddev over it, so the
    whole risk sweep is one symbol-keyed shuffle however long the
    history (parity flavor: the reference stores bars but computes no
    derived risk at all — SURVEY §1.1)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).agg(F.max_by("value", "event_id").alias("close"))
    w = Window.partitionBy("symbol").orderBy("day")
    rets = daily.select(
        "symbol",
        F.log(F.col("close") / F.lag("close").over(w)).alias("log_ret"),
    )
    return (
        rets.groupBy("symbol")
        .agg(
            F.count("log_ret").alias("n_returns"),
            F.round(F.avg("log_ret"), 6).alias("mean_ret"),
            F.round(F.stddev_samp("log_ret"), 6).alias("daily_vol"),
            F.round(F.stddev_samp("log_ret") * F.sqrt(F.lit(252.0)), 6).alias("annualized_vol"),
        )
        .orderBy("symbol")
    )
