"""Round-8 operators, part 1: real PCM-WAV audio decode, Z-order
clustering for data skipping, Black-Scholes pricing, Corwin-Schultz
high-low spread, triple-barrier labeling, Engle-Granger cointegration.

Float-parity discipline (see docs/ and the dickey-fuller pattern in
analytics_ops59.py): quantize every per-row float to an integer BEFORE
any cross-row aggregation (so sum order can't diverge between engines),
keep each double expression a single fixed tree shared verbatim between
the Spark plan and the DuckDB oracle, and emit `floor(x*1eK + 0.5)`
BIGINT outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.functions import detmath
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# multimodal: REAL mono PCM16 RIFF/WAVE decode (audio twin of PPM/PNG)
# --------------------------------------------------------------------------

_WAV_N = 64

_WAV_ORACLE = f"""
WITH ids AS (
  SELECT doc_id, source FROM documents WHERE doc_id % 11 = 0
),
t AS (SELECT unnest(generate_series(0, {_WAV_N - 1})) AS t),
samples AS (
  SELECT i.doc_id, i.source,
         (i.doc_id * 31 + t.t * 97) % 2001 - 1000 AS s
  FROM ids i CROSS JOIN t
)
SELECT source,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_clips,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum(s) AS BIGINT) AS sum_s,
       CAST(sum(abs(s)) AS BIGINT) AS sum_abs,
       CAST(sum(s * s) AS BIGINT) AS energy,
       CAST(0 AS BIGINT) AS n_bad_rate
FROM samples
GROUP BY source
ORDER BY source
"""


@register("multimodal_wav_pcm_decode", oracle=_WAV_ORACLE, tags=("llm", "multimodal", "udf"))
def multimodal_wav_pcm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END REAL **audio** decode — the third live codec after PPM
    and PNG: every 11th document gets a 64-sample mono PCM16 clip
    rendered as a genuine RIFF/WAVE file (canonical header, fmt chunk,
    word-aligned chunk walk), the payloads ride a binary column through
    Arrow-batched mapInPandas, and functions/multimodal.py's
    ``decode_wav_pcm16`` walks the RIFF chunks with stdlib struct and
    reinterprets the data chunk as int16 with numpy — no stub, no
    external codec (PCM is uncompressed audio's real on-disk format;
    MP3/OGG plug into the same batch kernel when a codec lib exists).
    The oracle enumerates the encoder's affine-mod samples in SQL, so
    the decoded integer sample sums / |s| sums / energies are verified
    bit-exactly — a true encode -> bytes -> decode -> verify cycle.
    Plan: one scan, one Arrow encode stage, one Arrow decode stage, one
    rollup; payload bytes never visit the driver."""
    import pandas as pd

    from us_stock_data_pipeline_spark.functions.multimodal import (
        encode_wav_pcm16,
        wav_decode_batch,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 11 == 0)
        .select("doc_id", "source")
    )

    def encode_batch(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "source": pdf["source"],
                    "payload": [
                        encode_wav_pcm16(int(d), _WAV_N) for d in pdf["doc_id"]
                    ],
                }
            )

    def decode_with_source(batches):
        for pdf in batches:
            src = pdf[["doc_id", "source"]]
            stats = next(wav_decode_batch(iter([pdf[["doc_id", "payload"]]])))
            yield src.merge(stats, on="doc_id")

    blobs = docs.mapInPandas(
        encode_batch, "doc_id long, source string, payload binary"
    )
    decoded = blobs.mapInPandas(
        decode_with_source,
        "doc_id long, source string, sample_rate long, n_samples long,"
        " sum_s long, sum_abs long, energy long",
    )
    return (
        decoded.groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_clips"),
            F.sum("n_samples").cast("long").alias("n_samples"),
            F.sum("sum_s").cast("long").alias("sum_s"),
            F.sum("sum_abs").cast("long").alias("sum_abs"),
            F.sum("energy").cast("long").alias("energy"),
            F.sum(F.when(F.col("sample_rate") != 8000, 1).otherwise(0))
            .cast("long")
            .alias("n_bad_rate"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# ETL: Z-order clustering manifest (multi-dimensional data skipping)
# --------------------------------------------------------------------------

# Morton interleave of two 10-bit keys via the classic part1by1 bit
# spread. Built programmatically (balanced by construction) as a SQL
# fragment shared VERBATIM by the Spark plan (F.expr) and the DuckDB
# oracle: decimal mask constants, `* 2^k` instead of engine-specific
# shift operators.


def _part1by1(x: str) -> str:
    e = f"({x})"
    for mul, mask in (
        (256, 16711935),  # 0x00FF00FF
        (16, 252645135),  # 0x0F0F0F0F
        (4, 858993459),  # 0x33333333
        (2, 1431655765),  # 0x55555555
    ):
        e = f"(({e} | ({e} * {mul})) & {mask})"
    return e


def _morton(x_expr: str, y_expr: str) -> str:
    """z = spread(x) + 2*spread(y): bits land on disjoint even/odd
    positions, so `+` IS the interleave (portable, no `|` precedence
    differences)."""
    return f"({_part1by1(x_expr)} + 2 * {_part1by1(y_expr)})"


_Z_EXPR = _morton("l_partkey % 1024", "l_suppkey % 1024")

_ZORDER_ORACLE = f"""
WITH z AS (
  SELECT l_partkey % 1024 AS px, l_suppkey % 1024 AS sx,
         {_Z_EXPR} AS z
  FROM lineitem
),
b AS (SELECT px, sx, z, z // 65536 AS bucket FROM z)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(px) AS BIGINT) AS px_min, CAST(max(px) AS BIGINT) AS px_max,
       CAST(min(sx) AS BIGINT) AS sx_min, CAST(max(sx) AS BIGINT) AS sx_max,
       CAST((max(px) - min(px) + 1) * (max(sx) - min(sx) + 1) AS BIGINT)
         AS bbox_area
FROM b
GROUP BY bucket
ORDER BY bucket
"""


@register("etl_zorder_clustering", oracle=_ZORDER_ORACLE, tags=("etl", "layout", "scale"))
def etl_zorder_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER (Morton-curve) clustering manifest — the lakehouse
    multi-dimensional data-skipping layout (Delta OPTIMIZE ZORDER BY /
    Iceberg sort orders): interleave the bits of two filter columns
    (part key, supplier key; 10 bits each) into one 20-bit Morton code,
    cluster rows into fixed z-ranges (bucket = z div 2^16 -> 16 files),
    and emit each bucket's per-dimension min/max bounding box — exactly
    the footer stats a reader prunes on. Because the Morton curve keeps
    both dimensions locally contiguous, every bucket's bbox_area is
    ~1/16th of the full domain in BOTH dimensions at once, which a
    single-column sort cannot do — the property that makes two-predicate
    scans skip ~15/16 of files at 100 TB. The interleave is pure integer
    arithmetic (shared SQL fragment, no UDF); the production write path
    is `repartitionByRange(z)` + sortWithinPartitions before the sink,
    both exchange-free beyond the one range shuffle. Plan: one scan, one
    map-side z computation, one groupBy."""
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(
        F.expr("l_partkey % 1024").alias("px"),
        F.expr("l_suppkey % 1024").alias("sx"),
        F.expr(_Z_EXPR).alias("z"),
    ).withColumn("bucket", F.expr("z div 65536"))
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("px").cast("long").alias("px_min"),
            F.max("px").cast("long").alias("px_max"),
            F.min("sx").cast("long").alias("sx_min"),
            F.max("sx").cast("long").alias("sx_max"),
            (
                (F.max("px") - F.min("px") + 1) * (F.max("sx") - F.min("sx") + 1)
            )
            .cast("long")
            .alias("bbox_area"),
        )
        .withColumn("bucket", F.col("bucket").cast("long"))
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# Shared: daily closes in integer cents (the repo's bar-building idiom)
# --------------------------------------------------------------------------


def _daily_closes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"))


_CLOSES_SQL = """
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
"""

# --------------------------------------------------------------------------
# finance: Black-Scholes call/put from realized vol (closed form)
# --------------------------------------------------------------------------

# Abramowitz-Stegun 7.1.26 normal CDF — ONE fixed double tree shared
# verbatim by both engines ({d} = the standardized argument).
_NCDF = (
    "(CASE WHEN ({d}) >= 0 THEN "
    "1.0 - 0.3989422804014327 * exp(-(({d}) * ({d})) / 2.0) * "
    "((1.0 / (1.0 + 0.2316419 * ({d}))) * (0.319381530 + (1.0 / (1.0 + 0.2316419 * ({d}))) * "
    "(-0.356563782 + (1.0 / (1.0 + 0.2316419 * ({d}))) * (1.781477937 + (1.0 / (1.0 + 0.2316419 * ({d}))) * "
    "(-1.821255978 + 1.330274429 * (1.0 / (1.0 + 0.2316419 * ({d})))))))) "
    "ELSE "
    "0.3989422804014327 * exp(-(({d}) * ({d})) / 2.0) * "
    "((1.0 / (1.0 - 0.2316419 * ({d}))) * (0.319381530 + (1.0 / (1.0 - 0.2316419 * ({d}))) * "
    "(-0.356563782 + (1.0 / (1.0 - 0.2316419 * ({d}))) * (1.781477937 + (1.0 / (1.0 - 0.2316419 * ({d}))) * "
    "(-1.821255978 + 1.330274429 * (1.0 / (1.0 - 0.2316419 * ({d}))))))))"
    " END)"
)

# Per-symbol scalar pipeline after integer moment sums (r=0.02, T=0.25):
# sig2 = annualized variance of quantized log returns, S = spot, K =
# nearest-dollar strike. One tree, both engines.
_BS_COMMON = """
  sel AS (
    SELECT symbol,
           CAST(sum(re10) AS BIGINT) AS s1,
           CAST(sum(r2e13) AS BIGINT) AS s2,
           CAST(count(*) AS BIGINT) AS n,
           CAST(max_by(c, day) AS BIGINT) AS last_c
    FROM rets GROUP BY symbol
  ),
  params AS (
    SELECT symbol, n,
           CAST(last_c AS DOUBLE) / 100.0 AS spot,
           floor(CAST(last_c AS DOUBLE) / 100.0 + 0.5) AS strike,
           sqrt(((CAST(s2 AS DOUBLE) / 1e13
                  - (CAST(s1 AS DOUBLE) / 1e10) * (CAST(s1 AS DOUBLE) / 1e10)
                    / CAST(n AS DOUBLE))
                 / (CAST(n AS DOUBLE) - 1.0)) * 252.0) AS sig
    FROM sel WHERE n > 2 AND last_c >= 50
  ),
  d AS (
    SELECT symbol, n, spot, strike, sig,
           (ln(spot / strike) + (0.02 + sig * sig / 2.0) * 0.25)
             / (sig * 0.5) AS d1,
           (ln(spot / strike) + (0.02 + sig * sig / 2.0) * 0.25)
             / (sig * 0.5) - sig * 0.5 AS d2
    FROM params WHERE sig > 0
  )
"""


def _bs_sql(prefix: str) -> str:
    nd1 = _NCDF.replace("{d}", "d1")
    nd2 = _NCDF.replace("{d}", "d2")
    return f"""
WITH closes AS ({_CLOSES_SQL}),
rets AS (
  SELECT symbol, day, c,
         CAST(floor(ln(CAST(c AS DOUBLE) / CAST(lag_c AS DOUBLE)) * 1e10 + 0.5) AS BIGINT) AS re10,
         CAST(floor((CAST(floor(ln(CAST(c AS DOUBLE) / CAST(lag_c AS DOUBLE)) * 1e10 + 0.5) AS BIGINT) / 1e10)
                    * (CAST(floor(ln(CAST(c AS DOUBLE) / CAST(lag_c AS DOUBLE)) * 1e10 + 0.5) AS BIGINT) / 1e10)
                    * 1e13 + 0.5) AS BIGINT) AS r2e13
  FROM ({prefix}) WHERE lag_c IS NOT NULL AND lag_c > 0 AND c > 0
),
{_BS_COMMON}
SELECT symbol, n AS n_days,
       CAST(floor(spot * 100 + 0.5) AS BIGINT) AS spot_cents,
       CAST(floor(strike * 100 + 0.5) AS BIGINT) AS strike_cents,
       CAST(floor(sig * 1e6 + 0.5) AS BIGINT) AS sigma_e6,
       CAST(floor((spot * {nd1} - strike * exp(-0.005) * {nd2}) * 1e4 + 0.5) AS BIGINT) AS call_e4,
       CAST(floor((spot * {nd1} - strike * exp(-0.005) * {nd2}
                   - spot + strike * exp(-0.005)) * 1e4 + 0.5) AS BIGINT) AS put_e4
FROM d
ORDER BY symbol
"""


_BS_ORACLE = _bs_sql(
    "SELECT symbol, day, c, lag(c) OVER (PARTITION BY symbol ORDER BY day) AS lag_c FROM closes"
)


@register("finance_black_scholes", oracle=_BS_ORACLE, tags=("finance", "stats"))
def finance_black_scholes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Black-Scholes European call/put priced from REALIZED volatility:
    per symbol, annualize the sample variance of daily log returns
    (sigma), take spot = last close and strike = nearest dollar, and
    evaluate the closed form with an Abramowitz-Stegun normal CDF
    (max err 7.5e-8) — no external math libs, the SAME polynomial
    fragment evaluated by both engines. Cross-engine float discipline:
    every per-row log return is quantized to 1e-10 BEFORE summation
    (so sum order can't diverge), the variance/d1/d2/price pipeline is
    one fixed double tree, outputs are floor(x*1eK+0.5) BIGINTs. Plan:
    daily rollup -> one lag window -> per-symbol moment aggregate ->
    scalar math; the heavy input pass is one shuffle on symbol, fully
    map-side-combined at any scale."""
    closes = _daily_closes(spark, sf_dir)
    w = Window.partitionBy("symbol").orderBy("day")
    withlag = closes.withColumn("lag_c", F.lag("c").over(w))
    rets = (
        withlag.filter("lag_c IS NOT NULL AND lag_c > 0 AND c > 0")
        .withColumn(
            "re10",
            F.expr(
                "CAST(floor(ln(CAST(c AS DOUBLE) / CAST(lag_c AS DOUBLE)) * 1e10 + 0.5) AS BIGINT)"
            ),
        )
        .withColumn(
            "r2e13",
            F.expr(
                "CAST(floor((re10 / 1e10) * (re10 / 1e10) * 1e13 + 0.5) AS BIGINT)"
            ),
        )
    )
    sel = rets.groupBy("symbol").agg(
        F.sum("re10").cast("long").alias("s1"),
        F.sum("r2e13").cast("long").alias("s2"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("max_by(c, day)").cast("long").alias("last_c"),
    )
    params = sel.filter("n > 2 AND last_c >= 50").selectExpr(
        "symbol",
        "n",
        "CAST(last_c AS DOUBLE) / 100.0 AS spot",
        "floor(CAST(last_c AS DOUBLE) / 100.0 + 0.5) AS strike",
        "sqrt(((CAST(s2 AS DOUBLE) / 1e13"
        "  - (CAST(s1 AS DOUBLE) / 1e10) * (CAST(s1 AS DOUBLE) / 1e10)"
        "    / CAST(n AS DOUBLE))"
        " / (CAST(n AS DOUBLE) - 1.0)) * 252.0) AS sig",
    )
    d = params.filter("sig > 0").selectExpr(
        "symbol",
        "n",
        "spot",
        "strike",
        "sig",
        "(ln(spot / strike) + (0.02 + sig * sig / 2.0) * 0.25) / (sig * 0.5) AS d1",
        "(ln(spot / strike) + (0.02 + sig * sig / 2.0) * 0.25) / (sig * 0.5) - sig * 0.5 AS d2",
    )
    nd1 = _NCDF.replace("{d}", "d1")
    nd2 = _NCDF.replace("{d}", "d2")
    return d.selectExpr(
        "symbol",
        "n AS n_days",
        "CAST(floor(spot * 100 + 0.5) AS BIGINT) AS spot_cents",
        "CAST(floor(strike * 100 + 0.5) AS BIGINT) AS strike_cents",
        "CAST(floor(sig * 1e6 + 0.5) AS BIGINT) AS sigma_e6",
        f"CAST(floor((spot * {nd1} - strike * exp(-0.005) * {nd2}) * 1e4 + 0.5) AS BIGINT) AS call_e4",
        f"CAST(floor((spot * {nd1} - strike * exp(-0.005) * {nd2}"
        " - spot + strike * exp(-0.005)) * 1e4 + 0.5) AS BIGINT) AS put_e4",
    ).orderBy("symbol")


# --------------------------------------------------------------------------
# bars: Corwin-Schultz high-low spread estimator
# --------------------------------------------------------------------------

_HILO_SQL = """
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(max(value) * 100) AS BIGINT) AS h,
         CAST(round(min(value) * 100) AS BIGINT) AS l
  FROM events GROUP BY 1, 2
"""

# Staged on the libm-free detmath kernels (ln of integer cents ratios,
# det_exp for the alpha->spread logistic): bit-identical doubles in
# both engines, so the 1e-9 quantization below can never straddle a
# boundary differently (transcendental audit r9). k = 3-2*sqrt(2);
# sqrt is IEEE-exact and stays a builtin.
_CS_STAGES = (
    detmath.det_ln_ratio_stages("h", "l", "cs_lr1")
    + detmath.det_ln_ratio_stages("hp", "lp", "cs_lr2")
    + detmath.det_ln_ratio_stages("greatest(h, hp)", "least(l, lp)", "cs_lrg")
    + [
        ("cs_beta", "(cs_lr1) * (cs_lr1) + (cs_lr2) * (cs_lr2)"),
        (
            "cs_alpha",
            "(sqrt(2.0 * cs_beta) - sqrt(cs_beta)) / (3.0 - 2.0 * sqrt(2.0))"
            " - sqrt((cs_lrg * cs_lrg) / (3.0 - 2.0 * sqrt(2.0)))",
        ),
    ]
    + detmath.det_exp_stages("cs_alpha", "cs_ea")
)
_CS_S = "(2.0 * (cs_ea - 1.0) / (1.0 + cs_ea))"

_CS_ORACLE = f"""
WITH hilo AS ({_HILO_SQL}),
pairs AS (
  SELECT symbol, day, h, l,
         lag(h) OVER w AS hp, lag(l) OVER w AS lp
  FROM hilo WINDOW w AS (PARTITION BY symbol ORDER BY day)
),
est AS (
  SELECT symbol,
         CAST(floor({_CS_S} * 1e9 + 0.5) AS BIGINT) AS s_e9
  FROM {detmath.stages_to_select(_CS_STAGES,
    "(SELECT * FROM pairs WHERE hp IS NOT NULL AND l > 0 AND lp > 0 AND h >= l AND hp >= lp)")}
)
SELECT symbol,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(floor(CAST(sum(s_e9) AS DOUBLE) / count(*) + 0.5) AS BIGINT)
         AS mean_spread_e9,
       CAST(sum(CASE WHEN s_e9 < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative
FROM est
GROUP BY symbol
ORDER BY symbol
"""


@register("bars_corwin_schultz_spread", oracle=_CS_ORACLE, tags=("bars", "finance", "microstructure"))
def bars_corwin_schultz_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corwin-Schultz (2012) bid-ask spread estimator from daily
    high/low ranges alone — the microstructure complement to
    `bars_roll_spread` (serial-covariance family): the high-low ratio
    embeds both variance AND spread, and two-day overlapping ranges
    let the closed form separate them (beta from two single-day
    ranges, gamma from the two-day range, alpha via the
    3-2*sqrt(2) identity, spread = 2(e^a-1)/(1+e^a)). Negative daily
    estimates are kept (reported via n_negative) and averaged, per the
    paper's baseline treatment. Floats: h/l are exact integer cents,
    each day's estimate is ONE shared double tree quantized to 1e-9
    BEFORE the per-symbol mean (integer sums, no sum-order drift).
    Plan: daily rollup -> one lag window -> per-symbol aggregate; one
    shuffle on symbol end to end."""
    ev = load_table(spark, sf_dir, "events")
    hilo = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.round(F.max("value") * 100).cast("long").alias("h"),
        F.round(F.min("value") * 100).cast("long").alias("l"),
    )
    w = Window.partitionBy("symbol").orderBy("day")
    pairs = hilo.withColumn("hp", F.lag("h").over(w)).withColumn(
        "lp", F.lag("l").over(w)
    )
    est = detmath.apply_stages(
        pairs.filter("hp IS NOT NULL AND l > 0 AND lp > 0 AND h >= l AND hp >= lp"),
        _CS_STAGES,
    ).selectExpr("symbol", f"CAST(floor({_CS_S} * 1e9 + 0.5) AS BIGINT) AS s_e9")
    return (
        est.groupBy("symbol")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.expr(
                "CAST(floor(CAST(sum(s_e9) AS DOUBLE) / count(*) + 0.5) AS BIGINT)"
            ).alias("mean_spread_e9"),
            F.sum(F.when(F.col("s_e9") < 0, 1).otherwise(0))
            .cast("long")
            .alias("n_negative"),
        )
        .orderBy("symbol")
    )


# --------------------------------------------------------------------------
# bars: triple-barrier labeling (Lopez de Prado)
# --------------------------------------------------------------------------

_TB_H = 5  # horizon days
_TB_LABEL = (
    "CASE "
    + " ".join(
        f"WHEN c{k} * 100 >= c * 102 THEN 1 WHEN c{k} * 100 <= c * 98 THEN -1"
        for k in range(1, _TB_H + 1)
    )
    + " ELSE 0 END"
)
_TB_DAYS = (
    "CASE "
    + " ".join(
        f"WHEN c{k} * 100 >= c * 102 OR c{k} * 100 <= c * 98 THEN {k}"
        for k in range(1, _TB_H + 1)
    )
    + f" ELSE {_TB_H} END"
)
_TB_LEADS_SQL = ", ".join(
    f"lead(c, {k}) OVER w AS c{k}" for k in range(1, _TB_H + 1)
)

_TB_ORACLE = f"""
WITH closes AS ({_CLOSES_SQL}),
leads AS (
  SELECT symbol, day, c, {_TB_LEADS_SQL}
  FROM closes WINDOW w AS (PARTITION BY symbol ORDER BY day)
),
labeled AS (
  SELECT symbol, {_TB_LABEL} AS label, {_TB_DAYS} AS days
  FROM leads WHERE c{_TB_H} IS NOT NULL
)
SELECT symbol, CAST(label AS BIGINT) AS label,
       CAST(count(*) AS BIGINT) AS n_entries,
       CAST((sum(days) * 100) // count(*) AS BIGINT) AS avg_days_e2
FROM labeled
GROUP BY symbol, label
ORDER BY symbol, label
"""


@register("bars_triple_barrier_label", oracle=_TB_ORACLE, tags=("bars", "llm", "labeling"))
def bars_triple_barrier_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triple-barrier labeling (Lopez de Prado, *Advances in Financial
    ML*) — THE standard way to turn raw bars into supervised-learning
    targets: every day is an entry; the label is which barrier the
    close touches FIRST over the next {H} days — profit-take at +2%
    (+1), stop-loss at -2% (-1), or the time barrier (0) — plus the
    realized holding period. Barrier tests are pure integer-cents
    inequalities (c_k*100 vs c*102 / c*98: no division, no doubles
    anywhere), the horizon unrolls to {H} lead() columns on ONE
    symbol-ordered window, and the first-touch CASE evaluates
    day-by-day in order, so label and days come from the same scan.
    At 100 TB this is one shuffle on symbol and a fixed 5-column
    widening — no self-join, no fan-out; entries without a full
    horizon are dropped (standard embargo).""".replace("{H}", str(_TB_H))
    closes = _daily_closes(spark, sf_dir)
    w = Window.partitionBy("symbol").orderBy("day")
    leads = closes.select(
        "symbol",
        "c",
        *[F.lead("c", k).over(w).alias(f"c{k}") for k in range(1, _TB_H + 1)],
    )
    labeled = leads.filter(F.col(f"c{_TB_H}").isNotNull()).selectExpr(
        "symbol", f"{_TB_LABEL} AS label", f"{_TB_DAYS} AS days"
    )
    return (
        labeled.groupBy("symbol", "label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_entries"),
            F.expr("CAST((sum(days) * 100) div count(*) AS BIGINT)").alias(
                "avg_days_e2"
            ),
        )
        .withColumn("label", F.col("label").cast("long"))
        .orderBy("symbol", "label")
    )


# --------------------------------------------------------------------------
# bars: Engle-Granger two-step cointegration test on symbol pairs
# --------------------------------------------------------------------------

# Step 1: OLS y~x from exact integer moments. Step 2: residuals
# quantized to millicents, then the same drift-free Dickey-Fuller
# moment algebra as stats_dickey_fuller on the residual series.
_EG_ORACLE = f"""
WITH closes AS ({_CLOSES_SQL}),
pairs AS (
  SELECT a.symbol AS sym_x, b.symbol AS sym_y, a.day,
         a.c AS x, b.c AS y
  FROM closes a JOIN closes b ON a.day = b.day AND a.symbol < b.symbol
),
mom AS (
  SELECT sym_x, sym_y,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(x * y) AS BIGINT) AS sxy
  FROM pairs GROUP BY sym_x, sym_y
),
fit AS (
  SELECT sym_x, sym_y, n,
         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS beta,
         (CAST(sy AS DOUBLE) - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * CAST(sx AS DOUBLE))
           / CAST(n AS DOUBLE) AS alpha
  FROM mom
  WHERE CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) > CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AND n > 3
),
resid AS (
  SELECT p.sym_x, p.sym_y, p.day, f.n, f.beta, f.alpha,
         CAST(floor((CAST(p.y AS DOUBLE) - f.alpha - f.beta * CAST(p.x AS DOUBLE)) * 1e3 + 0.5) AS BIGINT) AS e
  FROM pairs p JOIN fit f ON p.sym_x = f.sym_x AND p.sym_y = f.sym_y
),
dfp AS (
  SELECT sym_x, sym_y, n, beta,
         lag(e) OVER w AS xl, e - lag(e) OVER w AS d
  FROM resid WINDOW w AS (PARTITION BY sym_x, sym_y ORDER BY day)
  QUALIFY lag(e) OVER w IS NOT NULL
),
dfm AS (
  SELECT sym_x, sym_y, beta,
         CAST(count(*) AS BIGINT) AS m,
         CAST(sum(xl) AS BIGINT) AS sxl, CAST(sum(d) AS BIGINT) AS sd,
         CAST(sum(xl * xl) AS BIGINT) AS sxx2, CAST(sum(xl * d) AS BIGINT) AS sxd,
         CAST(sum(d * d) AS BIGINT) AS sdd
  FROM dfp GROUP BY sym_x, sym_y, beta
),
dft AS (
  SELECT sym_x, sym_y, beta, m, sxx2,
         CAST(sxd AS DOUBLE) / CAST(sxx2 AS DOUBLE) AS g,
         (CAST(sdd AS DOUBLE) - (CAST(sxd AS DOUBLE) / CAST(sxx2 AS DOUBLE)) * CAST(sxd AS DOUBLE))
           / (CAST(m AS DOUBLE) - 1.0) AS s2
  FROM dfm WHERE sxx2 > 0 AND m > 2
)
SELECT sym_x, sym_y, CAST(m + 1 AS BIGINT) AS n_days,
       CAST(floor(beta * 1e6 + 0.5) AS BIGINT) AS beta_e6,
       CAST(floor(g / sqrt(s2 / CAST(sxx2 AS DOUBLE)) * 1e4 + 0.5) AS BIGINT) AS df_t_e4
FROM dft
WHERE s2 > 0
ORDER BY sym_x, sym_y
"""


@register("bars_engle_granger_pairs", oracle=_EG_ORACLE, tags=("bars", "stats", "timeseries"))
def bars_engle_granger_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engle-Granger two-step cointegration test over every symbol
    pair — the statistical gate for `bars_pairs_spread` trading: step 1
    fits the long-run hedge ratio by OLS (closed form from exact
    integer moments), step 2 runs a drift-free Dickey-Fuller regression
    on the residual spread (same moment algebra as
    `stats_dickey_fuller`) — a strongly negative t on the residuals
    means the pair co-moves and the spread mean-reverts. Float
    discipline: prices are integer cents, OLS beta/alpha is one fixed
    double tree, each residual is quantized to millicents BEFORE the DF
    moments (which are then exact BIGINT sums). Plan: one daily rollup,
    one day-aligned self-join (pairs of a ~thousands-row dim at any
    scale: symbols x days, never raw events), two symbol-pair windows,
    two moment aggregates. The pair fan-out is quadratic in SYMBOL
    count only — at a production universe you band it by sector, never
    by row count."""
    closes = _daily_closes(spark, sf_dir)
    a = closes.select(
        F.col("symbol").alias("sym_x"), "day", F.col("c").alias("x")
    )
    b = closes.select(
        F.col("symbol").alias("sym_y"), "day", F.col("c").alias("y")
    )
    pairs = a.join(b, "day").filter(F.col("sym_x") < F.col("sym_y"))
    mom = pairs.groupBy("sym_x", "sym_y").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    fit = (
        mom.filter(
            "CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) > CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AND n > 3"
        )
        .selectExpr(
            "sym_x",
            "sym_y",
            "n",
            "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
            " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS beta",
            "(CAST(sy AS DOUBLE) - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
            " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * CAST(sx AS DOUBLE))"
            " / CAST(n AS DOUBLE) AS alpha",
        )
    )
    resid = pairs.join(F.broadcast(fit), ["sym_x", "sym_y"]).selectExpr(
        "sym_x",
        "sym_y",
        "day",
        "beta",
        "CAST(floor((CAST(y AS DOUBLE) - alpha - beta * CAST(x AS DOUBLE)) * 1e3 + 0.5) AS BIGINT) AS e",
    )
    w = Window.partitionBy("sym_x", "sym_y").orderBy("day")
    dfp = (
        resid.withColumn("xl", F.lag("e").over(w))
        .withColumn("d", F.col("e") - F.col("xl"))
        .filter("xl IS NOT NULL")
    )
    dfm = dfp.groupBy("sym_x", "sym_y", "beta").agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("xl").cast("long").alias("sxl"),
        F.sum("d").cast("long").alias("sd"),
        F.sum(F.col("xl") * F.col("xl")).cast("long").alias("sxx2"),
        F.sum(F.col("xl") * F.col("d")).cast("long").alias("sxd"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("sdd"),
    )
    dft = dfm.filter("sxx2 > 0 AND m > 2").selectExpr(
        "sym_x",
        "sym_y",
        "beta",
        "m",
        "sxx2",
        "CAST(sxd AS DOUBLE) / CAST(sxx2 AS DOUBLE) AS g",
        "(CAST(sdd AS DOUBLE) - (CAST(sxd AS DOUBLE) / CAST(sxx2 AS DOUBLE)) * CAST(sxd AS DOUBLE))"
        " / (CAST(m AS DOUBLE) - 1.0) AS s2",
    )
    return dft.filter("s2 > 0").selectExpr(
        "sym_x",
        "sym_y",
        "CAST(m + 1 AS BIGINT) AS n_days",
        "CAST(floor(beta * 1e6 + 0.5) AS BIGINT) AS beta_e6",
        "CAST(floor(g / sqrt(s2 / CAST(sxx2 AS DOUBLE)) * 1e4 + 0.5) AS BIGINT) AS df_t_e4",
    ).orderBy("sym_x", "sym_y")
