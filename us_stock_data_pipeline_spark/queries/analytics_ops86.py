"""Round-92 analytics, part 86: relative-rotation (RRG) quadrants vs
an equal-weight benchmark, and a t-closeness privacy audit via exact
1-D earth-mover's distance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Relative rotation: RS spread vs equal-weight benchmark + momentum quadrant
# --------------------------------------------------------------------------

_RRG_MOM_LAG = 5

_RRG_ORACLE = f"""
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
based AS (
  -- each series rebases to its own first close in integer bp
  SELECT symbol, day,
         c * 10000 // first_value(c) OVER (PARTITION BY symbol ORDER BY day)
           AS idx_bp
  FROM closes
),
bench AS (
  -- equal-weight benchmark: mean of the rebased series, exact via // count
  SELECT day, CAST(sum(idx_bp) // count(*) AS BIGINT) AS bench_bp
  FROM based GROUP BY day
),
rs AS (
  SELECT b.symbol, b.day, b.idx_bp - e.bench_bp AS rs_bp,
         row_number() OVER (PARTITION BY b.symbol ORDER BY b.day) AS rn
  FROM based b JOIN bench e ON e.day = b.day
),
mom AS (
  SELECT symbol, day, rs_bp,
         rs_bp - lag(rs_bp, {_RRG_MOM_LAG})
                   OVER (PARTITION BY symbol ORDER BY day) AS mom_bp,
         rn
  FROM rs
)
SELECT symbol, day, CAST(rs_bp AS BIGINT) AS rs_bp, CAST(mom_bp AS BIGINT) AS mom_bp,
       CASE WHEN rs_bp >= 0 AND mom_bp >= 0 THEN 'leading'
            WHEN rs_bp >= 0 AND mom_bp < 0 THEN 'weakening'
            WHEN rs_bp < 0 AND mom_bp < 0 THEN 'lagging'
            ELSE 'improving' END AS quadrant
FROM mom
WHERE rn > {_RRG_MOM_LAG}
ORDER BY symbol, day
"""


@register("bars_relative_rotation", oracle=_RRG_ORACLE, tags=("stock", "window"))
def bars_relative_rotation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-rotation (RRG-style) classification: each symbol
    rebases to first-close = 10000 bp, the equal-weight mean of those
    rebased series is the benchmark, RS = own index minus benchmark,
    momentum = RS change over {_RRG_MOM_LAG} days, and the (RS, mom)
    signs name the quadrant — leading / weakening / lagging /
    improving, the sector-rotation readout that single-series
    indicators can't give because it's RELATIVE strength
    (`bars_momentum_backtest` ranks absolute returns; rotation tracks
    position vs the peer set). Exactness: rebasing and the benchmark
    mean use positive-only integer division; RS and momentum are then
    exact integer differences — no floats anywhere. Plan: one
    first_value window per symbol, one per-day aggregate for the
    benchmark (symbol-count-sized), one join back, one lag — two
    keyed shuffles total over the daily rollup."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"))
    w = Window.partitionBy("symbol").orderBy("day")
    based = closes.select(
        "symbol",
        "day",
        F.expr("c * 10000").alias("c1e4"),
        F.first("c").over(w).alias("c0"),
    ).select("symbol", "day", F.expr("c1e4 div c0").alias("idx_bp"))
    bench = based.groupBy("day").agg(
        F.expr("sum(idx_bp) div count(*)").cast("long").alias("bench_bp")
    )
    rs = based.join(bench, "day").select(
        "symbol",
        "day",
        (F.col("idx_bp") - F.col("bench_bp")).alias("rs_bp"),
        F.row_number().over(w).alias("rn"),
    )
    mom = rs.select(
        "symbol",
        "day",
        "rs_bp",
        (F.col("rs_bp") - F.lag("rs_bp", _RRG_MOM_LAG).over(w)).alias("mom_bp"),
        "rn",
    )
    return (
        mom.filter(F.col("rn") > _RRG_MOM_LAG)
        .select(
            "symbol",
            "day",
            F.col("rs_bp").cast("long").alias("rs_bp"),
            F.col("mom_bp").cast("long").alias("mom_bp"),
            F.when((F.col("rs_bp") >= 0) & (F.col("mom_bp") >= 0), "leading")
            .when((F.col("rs_bp") >= 0) & (F.col("mom_bp") < 0), "weakening")
            .when((F.col("rs_bp") < 0) & (F.col("mom_bp") < 0), "lagging")
            .otherwise("improving")
            .alias("quadrant"),
        )
        .orderBy("symbol", "day")
    )


# --------------------------------------------------------------------------
# t-closeness audit: exact 1-D EMD between class and global distributions
# --------------------------------------------------------------------------

_TC_BINS = 10

_TCLOSENESS_ORACLE = f"""
WITH binned AS (
  -- quasi-identifier class = (nation, mktsegment); ordered sensitive
  -- attribute = account-balance decile bin (fixed-width over the
  -- TPC-H acctbal range [-1000, 10000])
  SELECT n.n_name AS nation, c.c_mktsegment AS segment,
         least(greatest((CAST(round(c.c_acctbal * 100) AS BIGINT) + 100000)
                        * {_TC_BINS} // 1100000, 0), {_TC_BINS} - 1) AS bin
  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
),
cls AS (
  SELECT nation, segment, bin, CAST(count(*) AS BIGINT) AS cnt
  FROM binned GROUP BY nation, segment, bin
),
ghist AS (SELECT bin, CAST(count(*) AS BIGINT) AS g FROM binned GROUP BY bin),
tots AS (
  SELECT CAST(sum(g) AS BIGINT) AS big_n FROM ghist
),
class_n AS (
  SELECT nation, segment, CAST(sum(cnt) AS BIGINT) AS n_cls
  FROM cls GROUP BY nation, segment
),
-- dense (class x bin) grid so missing bins count as zero mass
grid AS (
  SELECT cn.nation, cn.segment, cn.n_cls, g.bin, g.g, coalesce(c2.cnt, 0) AS cnt
  FROM class_n cn
  CROSS JOIN ghist g
  LEFT JOIN cls c2 ON c2.nation = cn.nation AND c2.segment = cn.segment
                  AND c2.bin = g.bin
),
cums AS (
  -- scaled CDF gap at each bin: cum_cnt * N - cum_g * n_cls, EXACT BIGINT
  SELECT nation, segment, n_cls, bin,
         abs(sum(cnt) OVER w * (SELECT big_n FROM tots)
             - sum(g) OVER w * n_cls) AS gap
  FROM grid
  WINDOW w AS (PARTITION BY nation, segment ORDER BY bin ROWS UNBOUNDED PRECEDING)
)
SELECT nation, segment, CAST(max(n_cls) AS BIGINT) AS n_class,
       -- EMD = sum(gap) / ((bins-1) * n_cls * N), quantized micro
       CAST(sum(gap) AS BIGINT) AS gap_scaled_sum,
       CAST(floor(CAST(sum(gap) AS DOUBLE)
                  / ({_TC_BINS} - 1) / max(n_cls) / (SELECT big_n FROM tots)
                  * 1000000 + 0.5) AS BIGINT) AS emd_micro
FROM cums
GROUP BY nation, segment
ORDER BY emd_micro DESC, nation, segment
LIMIT 20
"""


@register("privacy_t_closeness_emd", oracle=_TCLOSENESS_ORACLE, tags=("compliance", "privacy"))
def privacy_t_closeness_emd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit: for each quasi-identifier class (nation x
    segment), the earth-mover's distance between the class's account-
    balance distribution and the global one — the privacy criterion
    BEYOND k-anonymity and l-diversity (`privacy_k_anonymity` counts
    rows and distinct values; t-closeness catches a class whose
    salary histogram skews rich even with many distinct values). For
    an ORDERED attribute the EMD has the exact closed form
    sum_j |CDF_class(j) - CDF_global(j)| / (m-1), and the CDF gap
    computes as cum_cnt x N - cum_g x n_class — exact cross-scaled
    BIGINT, no per-class float until one final normalization. The top
    20 worst classes surface for release review. Plan: one fact
    groupBy to the (class, bin) grid (cardinality-bounded), a dense
    re-grid against the global histogram, one ordered window over
    {_TC_BINS} bins per class."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    binned = c.join(
        F.broadcast(n.select("n_nationkey", "n_name")), c.c_nationkey == F.col("n_nationkey")
    ).select(
        F.col("n_name").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.least(
            F.greatest(
                F.expr(
                    f"(CAST(round(c_acctbal * 100) AS BIGINT) + 100000) * {_TC_BINS} div 1100000"
                ),
                F.lit(0),
            ),
            F.lit(_TC_BINS - 1),
        ).alias("bin"),
    )
    cls = binned.groupBy("nation", "segment", "bin").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    glob = binned.groupBy("bin").agg(F.count(F.lit(1)).cast("long").alias("g"))
    big_n = glob.agg(F.sum("g").cast("long").alias("big_n"))
    class_n = cls.groupBy("nation", "segment").agg(F.sum("cnt").cast("long").alias("n_cls"))
    grid = (
        class_n.crossJoin(F.broadcast(glob))
        .join(cls, ["nation", "segment", "bin"], "left")
        .select(
            "nation",
            "segment",
            "n_cls",
            "bin",
            "g",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
        )
        .crossJoin(F.broadcast(big_n))
    )
    w = Window.partitionBy("nation", "segment").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cums = grid.select(
        "nation",
        "segment",
        "n_cls",
        "big_n",
        F.abs(
            F.sum("cnt").over(w) * F.col("big_n") - F.sum("g").over(w) * F.col("n_cls")
        ).alias("gap"),
    )
    return (
        cums.groupBy("nation", "segment")
        .agg(
            F.max("n_cls").cast("long").alias("n_class"),
            F.sum("gap").cast("long").alias("gap_scaled_sum"),
            F.floor(
                F.sum("gap").cast("double")
                / (_TC_BINS - 1)
                / F.max("n_cls")
                / F.max("big_n")
                * 1000000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("emd_micro"),
        )
        .orderBy(F.col("emd_micro").desc(), "nation", "segment")
        .limit(20)
    )
