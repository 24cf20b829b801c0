"""Round-52 analytics, part 50: range-based volatility estimators
(Parkinson + Garman-Klass), historical VaR / expected shortfall, and
Cramér's V categorical-independence strength.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Range-based volatility: Parkinson and Garman-Klass estimators
# --------------------------------------------------------------------------

_RANGE_VOL_ORACLE = """
WITH ohlc AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_min(value, event_id) * 100) AS BIGINT) AS open_cents,
         CAST(round(max(value) * 100) AS BIGINT) AS high_cents,
         CAST(round(min(value) * 100) AS BIGINT) AS low_cents,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS close_cents
  FROM events GROUP BY 1, 2
),
terms AS (
  SELECT symbol,
         ln(CAST(high_cents AS DOUBLE) / low_cents)
           * ln(CAST(high_cents AS DOUBLE) / low_cents) AS hl2,
         ln(CAST(close_cents AS DOUBLE) / open_cents)
           * ln(CAST(close_cents AS DOUBLE) / open_cents) AS co2
  FROM ohlc WHERE low_cents > 0 AND open_cents > 0
)
SELECT symbol, CAST(count(*) AS BIGINT) AS n_days,
       CAST(floor(sqrt(sum(hl2) / (4.0 * ln(2.0) * count(*))) * 1000000 + 0.5)
         AS BIGINT) AS parkinson_e6,
       CAST(floor(sqrt(sum(0.5 * hl2 - (2.0 * ln(2.0) - 1.0) * co2) / count(*))
                  * 1000000 + 0.5) AS BIGINT) AS garman_klass_e6
FROM terms
GROUP BY symbol
ORDER BY symbol
"""


@register("bars_range_volatility", oracle=_RANGE_VOL_ORACLE, tags=("stock", "stats"))
def bars_range_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parkinson and Garman-Klass daily volatility — the range-based
    estimators that squeeze ~5-7x the efficiency of close-to-close
    stddev (`bars_volatility`) out of the same tape by using the
    intraday high-low spread (Parkinson) and the open/close drift
    correction (Garman-Klass).  Per-day terms are deterministic
    functions of exact integer OHLC cents; each per-day GK term is
    provably non-negative (|ln C/O| <= |ln H/L| and 0.5 - (2ln2 - 1)
    > 0) so the sqrt never sees a negative sum.  Both estimators
    quantize once at 1e-6.  Plan: one groupBy to daily OHLC, one tiny
    per-symbol aggregate — no window, no self-join, so the shape is a
    pure two-level map-side-combine tree that scales to any tape
    length."""
    ev = load_table(spark, sf_dir, "events")
    ohlc = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.round(F.min_by("value", "event_id") * 100).cast("long").alias("open_cents"),
        F.round(F.max("value") * 100).cast("long").alias("high_cents"),
        F.round(F.min("value") * 100).cast("long").alias("low_cents"),
        F.round(F.max_by("value", "event_id") * 100).cast("long").alias("close_cents"),
    )
    hl = F.log(F.col("high_cents").cast("double") / F.col("low_cents"))
    co = F.log(F.col("close_cents").cast("double") / F.col("open_cents"))
    terms = ohlc.filter((F.col("low_cents") > 0) & (F.col("open_cents") > 0)).select(
        "symbol", (hl * hl).alias("hl2"), (co * co).alias("co2")
    )
    ln2 = F.log(F.lit(2.0))
    parkinson = F.sqrt(F.sum("hl2") / (4.0 * ln2 * F.count(F.lit(1))))
    gk = F.sqrt(
        F.sum(0.5 * F.col("hl2") - (2.0 * ln2 - 1.0) * F.col("co2"))
        / F.count(F.lit(1))
    )
    return (
        terms.groupBy("symbol")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.floor(parkinson * 1_000_000 + F.lit(0.5)).cast("long").alias("parkinson_e6"),
            F.floor(gk * 1_000_000 + F.lit(0.5)).cast("long").alias("garman_klass_e6"),
        )
        .orderBy("symbol")
    )


# --------------------------------------------------------------------------
# Historical VaR + expected shortfall (rank-exact, integer basis points)
# --------------------------------------------------------------------------

_VAR_ALPHA_PCT = 5  # 95% VaR

_VAR_ES_ORACLE = f"""
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS close_cents
  FROM events GROUP BY 1, 2
),
rets AS (
  SELECT symbol,
         CAST(floor((close_cents - lag(close_cents) OVER w) * 10000.0
                    / lag(close_cents) OVER w + 0.5) AS BIGINT) AS ret_bp
  FROM closes WINDOW w AS (PARTITION BY symbol ORDER BY day)
  QUALIFY lag(close_cents) OVER w IS NOT NULL
),
ranked AS (
  SELECT symbol, ret_bp,
         row_number() OVER (PARTITION BY symbol ORDER BY ret_bp) AS rn,
         CAST(count(*) OVER (PARTITION BY symbol) AS BIGINT) AS n
  FROM rets
),
cut AS (
  SELECT symbol, n,
         greatest(1, CAST(ceil(n * {_VAR_ALPHA_PCT} / 100.0) AS BIGINT)) AS k
  FROM ranked GROUP BY symbol, n
)
SELECT r.symbol, c.n AS n_rets, c.k AS k_tail,
       CAST(max(CASE WHEN r.rn = c.k THEN r.ret_bp END) AS BIGINT) AS var_bp,
       CAST(floor(avg(CASE WHEN r.rn <= c.k THEN CAST(r.ret_bp AS DOUBLE) END) + 0.5)
         AS BIGINT) AS es_bp
FROM ranked r JOIN cut c ON c.symbol = r.symbol
GROUP BY r.symbol, c.n, c.k
ORDER BY r.symbol
"""


@register("bars_var_expected_shortfall", oracle=_VAR_ES_ORACLE, tags=("stock", "stats"))
def bars_var_expected_shortfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historical 95% VaR and expected shortfall per symbol — the
    risk-desk pair where VaR is the k-th worst daily return (k =
    ceil(0.05 n), rank-exact, no interpolation so both engines pick
    the identical order statistic) and ES averages the k-worst tail
    (a multiset selected purely by value order, so tie-breaking
    cannot change it).  Returns are integer basis points quantized
    BEFORE ranking, making every comparison exact.  Plan: daily
    rollup, one (symbol, day) window for lag + one (symbol, ret)
    window for ranking, then a per-symbol aggregate — the tail scan
    rides the rank window's sort, no extra shuffle."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.round(F.max_by("value", "event_id") * 100).cast("long").alias("close_cents")
    )
    w = Window.partitionBy("symbol").orderBy("day")
    prev = F.lag("close_cents").over(w)
    rets = (
        closes.select(
            "symbol",
            prev.alias("prev_c"),
            F.col("close_cents").alias("c"),
        )
        .filter(F.col("prev_c").isNotNull())
        .select(
            "symbol",
            F.floor((F.col("c") - F.col("prev_c")) * 10000.0 / F.col("prev_c") + F.lit(0.5))
            .cast("long")
            .alias("ret_bp"),
        )
    )
    w_rank = Window.partitionBy("symbol").orderBy("ret_bp")
    w_all = Window.partitionBy("symbol")
    ranked = rets.select(
        "symbol",
        "ret_bp",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("n"),
    )
    k = F.greatest(F.lit(1).cast("long"), F.ceil(F.col("n") * _VAR_ALPHA_PCT / 100.0))
    return (
        ranked.withColumn("k", k)
        .groupBy("symbol", "n", "k")
        .agg(
            F.max(F.when(F.col("rn") == F.col("k"), F.col("ret_bp"))).cast("long").alias("var_bp"),
            F.floor(
                F.avg(F.when(F.col("rn") <= F.col("k"), F.col("ret_bp").cast("double")))
                + F.lit(0.5)
            )
            .cast("long")
            .alias("es_bp"),
        )
        .select(
            "symbol",
            F.col("n").alias("n_rets"),
            F.col("k").alias("k_tail"),
            "var_bp",
            "es_bp",
        )
        .orderBy("symbol")
    )


# --------------------------------------------------------------------------
# Cramér's V: strength of association between two categoricals
# --------------------------------------------------------------------------

_CRAMER_ORACLE = """
WITH base AS (
  SELECT event_type AS etype,
         datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7 AS wd
  FROM events
),
obs AS (
  SELECT etype, wd, CAST(count(*) AS BIGINT) AS o FROM base GROUP BY 1, 2
),
margins AS (
  SELECT etype, CAST(sum(o) AS BIGINT) AS row_n FROM obs GROUP BY etype
),
cols AS (
  SELECT wd, CAST(sum(o) AS BIGINT) AS col_n FROM obs GROUP BY wd
),
tot AS (
  SELECT CAST(sum(o) AS BIGINT) AS n,
         CAST(count(DISTINCT etype) AS BIGINT) AS r,
         CAST(count(DISTINCT wd) AS BIGINT) AS c
  FROM obs
),
chi AS (
  SELECT sum(
           (o - CAST(m.row_n AS DOUBLE) * col_n / t.n)
           * (o - CAST(m.row_n AS DOUBLE) * col_n / t.n)
           / (CAST(m.row_n AS DOUBLE) * col_n / t.n)
         ) AS chi2
  FROM obs JOIN margins m USING (etype) JOIN cols USING (wd) CROSS JOIN tot t
)
SELECT t.n AS n_events, t.r AS n_rows, t.c AS n_cols,
       CAST((t.r - 1) * (t.c - 1) AS BIGINT) AS dof,
       CAST(floor(chi.chi2 * 10000 + 0.5) AS BIGINT) AS chi2_e4,
       CAST(floor(sqrt(chi.chi2 / (t.n * least(t.r - 1, t.c - 1))) * 1000000 + 0.5)
         AS BIGINT) AS cramers_v_e6
FROM chi CROSS JOIN tot t
"""


@register("stats_cramers_v", oracle=_CRAMER_ORACLE, tags=("stats",))
def stats_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V for event-type x weekday — the [0,1] effect-size
    companion to the chi-square independence test (chi-square alone
    grows with n; V normalizes by n*(min(r,c)-1) so "how MUCH does
    behavior differ by weekday" is comparable across corpus sizes).
    The weekday bucket is an engine-neutral day-index mod 7 (both
    engines' native dow functions disagree on week start).  The
    contingency table, margins, and totals are exact integers; chi2
    accumulates in double and quantizes at 1e-4, V at 1e-6.  Plan:
    one groupBy to the r x c table (tiny), margins derived from it,
    everything after the first aggregate is broadcast-sized."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.col("event_type").alias("etype"),
        (
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")) % 7
        ).alias("wd"),
    )
    obs = base.groupBy("etype", "wd").agg(F.count(F.lit(1)).cast("long").alias("o"))
    margins = obs.groupBy("etype").agg(F.sum("o").cast("long").alias("row_n"))
    cols = obs.groupBy("wd").agg(F.sum("o").cast("long").alias("col_n"))
    tot = obs.agg(
        F.sum("o").cast("long").alias("n"),
        F.countDistinct("etype").cast("long").alias("r"),
        F.countDistinct("wd").cast("long").alias("c"),
    )
    joined = obs.join(F.broadcast(margins), "etype").join(F.broadcast(cols), "wd").crossJoin(
        F.broadcast(tot)
    )
    expected = F.col("row_n").cast("double") * F.col("col_n") / F.col("n")
    chi2 = F.sum((F.col("o") - expected) * (F.col("o") - expected) / expected)
    out = joined.groupBy("n", "r", "c").agg(chi2.alias("chi2"))
    return out.select(
        F.col("n").alias("n_events"),
        F.col("r").alias("n_rows"),
        F.col("c").alias("n_cols"),
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("long").alias("dof"),
        F.floor(F.col("chi2") * 10000 + F.lit(0.5)).cast("long").alias("chi2_e4"),
        F.floor(
            F.sqrt(F.col("chi2") / (F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1)))
            * 1_000_000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("cramers_v_e6"),
    )
