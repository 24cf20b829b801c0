"""Round-68 analytics, part 67: Lo-MacKinlay variance-ratio test and
Haar wavelet energy decomposition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Lo-MacKinlay variance ratio test (overlapping q-period returns)
# --------------------------------------------------------------------------

_VR_QS = (2, 5, 10)

_VR_ORACLE = f"""
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS close_cents
  FROM events GROUP BY 1, 2
),
rets AS (
  SELECT symbol, row_number() OVER w AS i,
         CAST(floor((close_cents - lag(close_cents) OVER w) * 10000.0
                    / lag(close_cents) OVER w + 0.5) AS BIGINT) AS r
  FROM closes WINDOW w AS (PARTITION BY symbol ORDER BY day)
  QUALIFY lag(close_cents) OVER w IS NOT NULL
),
base AS (
  SELECT symbol, CAST(count(*) AS HUGEINT) AS n1,
         CAST(sum(r) AS HUGEINT) AS s1, CAST(sum(r * r) AS HUGEINT) AS ss1
  FROM rets GROUP BY symbol
),
qret AS (  -- overlapping q-period returns via a q-row window sum
  SELECT r.symbol, q.q,
         CAST(sum(r.r) OVER (PARTITION BY r.symbol, q.q ORDER BY r.i
              ROWS BETWEEN CURRENT ROW AND (q.q - 1) FOLLOWING) AS BIGINT) AS rq,
         count(*) OVER (PARTITION BY r.symbol, q.q ORDER BY r.i
              ROWS BETWEEN CURRENT ROW AND (q.q - 1) FOLLOWING) AS cnt
  FROM rets r JOIN (SELECT unnest(ARRAY{list(_VR_QS)}) AS q) q ON true
),
qsums AS (
  SELECT symbol, q, CAST(count(*) AS HUGEINT) AS nq,
         CAST(sum(rq) AS HUGEINT) AS sq, CAST(sum(rq * rq) AS HUGEINT) AS ssq
  FROM qret WHERE cnt = q GROUP BY symbol, q
)
SELECT b.symbol, CAST(s.q AS BIGINT) AS q, CAST(s.nq AS BIGINT) AS n_windows,
       CAST(floor(
         ((CAST(s.ssq AS DOUBLE) - CAST(s.sq AS DOUBLE) * CAST(s.sq AS DOUBLE)
             / CAST(s.nq AS DOUBLE)) / CAST(s.nq AS DOUBLE))
         / (s.q * (CAST(b.ss1 AS DOUBLE) - CAST(b.s1 AS DOUBLE) * CAST(b.s1 AS DOUBLE)
              / CAST(b.n1 AS DOUBLE)) / CAST(b.n1 AS DOUBLE))
         * 1000000 + 0.5) AS BIGINT) AS vr_e6,
       CAST(floor(
         (((CAST(s.ssq AS DOUBLE) - CAST(s.sq AS DOUBLE) * CAST(s.sq AS DOUBLE)
              / CAST(s.nq AS DOUBLE)) / CAST(s.nq AS DOUBLE))
          / (s.q * (CAST(b.ss1 AS DOUBLE) - CAST(b.s1 AS DOUBLE) * CAST(b.s1 AS DOUBLE)
               / CAST(b.n1 AS DOUBLE)) / CAST(b.n1 AS DOUBLE)) - 1.0)
         / sqrt(2.0 * (2 * s.q - 1) * (s.q - 1) / (3.0 * s.q * CAST(b.n1 AS DOUBLE)))
         * 10000 + 0.5) AS BIGINT) AS z_e4
FROM qsums s JOIN base b ON b.symbol = s.symbol
ORDER BY b.symbol, s.q
"""


@register("stats_variance_ratio", oracle=_VR_ORACLE, tags=("stats", "stock"))
def stats_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lo-MacKinlay variance-ratio test: VR(q) = Var(q-day overlapping
    returns) / (q * Var(1-day returns)) with its homoskedastic
    z-statistic, for q in {_VR_QS} — the random-walk test that
    separates momentum (VR > 1) from mean reversion (VR < 1) and is
    the standard cross-check on `timeseries_hurst_exponent` (they
    must agree in direction; VR adds a significance scale).
    Overlapping q-sums are exact integers off one forward-frame
    window; all variance moments are exact HUGEINT/decimal sums, so
    VR and z are fixed double expressions. Plan: returns window, a
    broadcast q fan-out, one more per-(symbol,q) frame window riding
    the SAME (symbol, i) sort, two aggregates — linear in days."""
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
            F.row_number().over(w).alias("i"),
            prev.alias("prev_c"),
            F.col("close_cents").alias("c"),
        )
        .filter(F.col("prev_c").isNotNull())
        .select(
            "symbol",
            "i",
            F.floor((F.col("c") - F.col("prev_c")) * 10000.0 / F.col("prev_c") + F.lit(0.5))
            .cast("long")
            .alias("r"),
        )
    )
    dec = "decimal(38,0)"
    base = rets.groupBy("symbol").agg(
        F.count(F.lit(1)).cast(dec).alias("n1"),
        F.sum("r").cast(dec).alias("s1"),
        F.sum(F.col("r") * F.col("r")).cast(dec).alias("ss1"),
    )
    # one bounded forward-frame window per q (the frame bound must be a
    # literal); all three ride the same (symbol, i) sort
    parts = []
    for q in _VR_QS:
        w_fq = (
            Window.partitionBy("symbol")
            .orderBy("i")
            .rowsBetween(Window.currentRow, q - 1)
        )
        parts.append(
            rets.select(
                "symbol",
                F.lit(q).cast("long").alias("q"),
                F.sum("r").over(w_fq).cast("long").alias("rq"),
                F.count(F.lit(1)).over(w_fq).alias("cnt"),
            ).filter(F.col("cnt") == q)
        )
    qret = parts[0]
    for p_ in parts[1:]:
        qret = qret.unionAll(p_)
    qsums = qret.groupBy("symbol", "q").agg(
        F.count(F.lit(1)).cast(dec).alias("nq"),
        F.sum("rq").cast(dec).alias("sq"),
        F.sum(F.col("rq") * F.col("rq")).cast(dec).alias("ssq"),
    )
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    var_q = (d_("ssq") - d_("sq") * d_("sq") / d_("nq")) / d_("nq")
    var_1 = (d_("ss1") - d_("s1") * d_("s1") / d_("n1")) / d_("n1")
    vr = var_q / (F.col("q") * var_1)
    z = (vr - 1.0) / F.sqrt(
        2.0 * (2 * F.col("q") - 1) * (F.col("q") - 1) / (3.0 * F.col("q") * d_("n1"))
    )
    return (
        qsums.join(base, "symbol")
        .select(
            "symbol",
            F.col("q").cast("long").alias("q"),
            F.col("nq").cast("long").alias("n_windows"),
            F.floor(vr * 1_000_000 + F.lit(0.5)).cast("long").alias("vr_e6"),
            F.floor(z * 10_000 + F.lit(0.5)).cast("long").alias("z_e4"),
        )
        .orderBy("symbol", "q")
    )


# --------------------------------------------------------------------------
# Haar wavelet energy decomposition of daily revenue
# --------------------------------------------------------------------------

_HAAR_LEVELS = (1, 2, 3, 4)

_HAAR_LEVEL_SQL = "\n  UNION ALL ".join(
    f"""SELECT {k} AS lvl, dd // {2**k} AS blk,
         CAST(sum(CASE WHEN (dd // {2**(k-1)}) % 2 = 0 THEN cents ELSE 0 END) AS BIGINT) AS left_sum,
         CAST(sum(CASE WHEN (dd // {2**(k-1)}) % 2 = 1 THEN cents ELSE 0 END) AS BIGINT) AS right_sum,
         CAST(count(*) AS BIGINT) AS n_days
  FROM daily GROUP BY 1, 2 HAVING count(*) = {2**k}"""
    for k in _HAAR_LEVELS
)

_HAAR_ORACLE = f"""
WITH daily AS (
  SELECT datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS dd,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
levels AS (
  {_HAAR_LEVEL_SQL}
),
energy AS (
  SELECT lvl, CAST(count(*) AS BIGINT) AS n_blocks,
         CAST(sum(CAST(left_sum - right_sum AS HUGEINT)
                  * CAST(left_sum - right_sum AS HUGEINT)) AS HUGEINT) AS e
  FROM levels GROUP BY lvl
),
tot AS (SELECT CAST(sum(e) AS HUGEINT) AS te FROM energy)
SELECT CAST(e.lvl AS BIGINT) AS level, e.n_blocks,
       CAST(e.e * 1000000 // t.te AS BIGINT) AS energy_share_e6
FROM energy e CROSS JOIN tot t
ORDER BY e.lvl
"""


@register("timeseries_haar_energy", oracle=_HAAR_ORACLE, tags=("timeseries", "stats"))
def timeseries_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unnormalized Haar wavelet energy by scale: at level k, revenue
    sums over adjacent 2^(k-1)-day half-blocks are differenced and
    squared — the multi-resolution answer to "is revenue variation
    day-to-day noise or week-scale swings"
    (`timeseries_periodogram` localizes FREQUENCY; Haar localizes
    SCALE and tolerates the non-stationarity that wrecks a DFT; only
    complete 2^k-day blocks enter, pinned by HAVING count = 2^k).
    Every half-block sum and difference is an exact integer; block
    energies sum exactly (HUGEINT/decimal), and the per-level share
    is an integer floor-divide — the whole decomposition is
    float-free. Plan: date-grain aggregate, then one groupBy per
    level over constant-width epoch-day buckets (a 4-way union of
    map-side-combined aggregates; no window, no join)."""
    od = load_table(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")).alias("dd")
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("long").alias("cents"))
    dec = "decimal(38,0)"
    parts = []
    for k in _HAAR_LEVELS:
        half = F.floor(F.col("dd") / (2 ** (k - 1))) % 2
        parts.append(
            daily.groupBy(F.floor(F.col("dd") / (2**k)).alias("blk"))
            .agg(
                F.sum(F.when(half == 0, F.col("cents")).otherwise(0)).cast("long").alias("left_sum"),
                F.sum(F.when(half == 1, F.col("cents")).otherwise(0)).cast("long").alias("right_sum"),
                F.count(F.lit(1)).alias("n_days"),
            )
            .filter(F.col("n_days") == 2**k)
            .select(F.lit(k).cast("long").alias("lvl"), "left_sum", "right_sum")
        )
    levels = parts[0]
    for p_ in parts[1:]:
        levels = levels.unionAll(p_)
    diff = (F.col("left_sum") - F.col("right_sum")).cast(dec)
    energy = levels.groupBy("lvl").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum(diff * diff).cast(dec).alias("e"),
    )
    tot = energy.agg(F.sum("e").cast(dec).alias("te"))
    return (
        energy.crossJoin(F.broadcast(tot))
        .select(
            F.col("lvl").alias("level"),
            "n_blocks",
            # decimal `div` truncates like DuckDB's HUGEINT // (values are
            # non-negative, so truncation == floor); a double division here
            # would round past 2^53 and an unquantized decimal `/` rounds
            # HALF_UP at result scale
            F.expr("CAST((e * 1000000) div te AS BIGINT)").alias("energy_share_e6"),
        )
        .orderBy("level")
    )
