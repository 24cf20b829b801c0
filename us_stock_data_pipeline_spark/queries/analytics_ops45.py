"""Round-40 analytics, part 45: fixed-frequency periodogram (DFT power
at candidate periods) and recency-decay engagement scoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.functions import detmath
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Periodogram at candidate periods
# --------------------------------------------------------------------------

_PERIODS = (3, 7, 14)

_PERIODOGRAM_ORACLE = f"""
WITH closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS close_cents
  FROM closes_src
),
indexed AS (
  SELECT symbol, close_cents,
         row_number() OVER (PARTITION BY symbol ORDER BY day) - 1 AS t,
         CAST(sum(close_cents) OVER (PARTITION BY symbol) // count(*) OVER (PARTITION BY symbol) AS BIGINT) AS mean_cents
  FROM closes
),
ladder AS (SELECT unnest(ARRAY{list(_PERIODS)}) AS period),
-- cos/sin come from the libm-free detmath kernels on the PHASE-reduced
-- argument 2*pi*(t mod p)/p — bit-identical doubles in both engines
-- (transcendental audit r9), so the 1e3 quantization cannot straddle.
terms AS (
  SELECT symbol, period,
         CAST(floor((close_cents - mean_cents) * pg_cos * 1000 + 0.5) AS BIGINT)
           AS c_term_q,
         CAST(floor((close_cents - mean_cents) * pg_sin * 1000 + 0.5) AS BIGINT)
           AS s_term_q
  FROM {{PG_STAGED}}
)
SELECT symbol, period,
       CAST(sum(c_term_q) AS BIGINT) AS cos_sum_q,
       CAST(sum(s_term_q) AS BIGINT) AS sin_sum_q,
       CAST(floor(sqrt(CAST(sum(c_term_q) AS DOUBLE) * sum(c_term_q)
                       + CAST(sum(s_term_q) AS DOUBLE) * sum(s_term_q)) / 1000
                  + 0.5) AS BIGINT) AS amplitude_cents
FROM terms
GROUP BY symbol, period
ORDER BY symbol, period
"""


_PG_ARG = f"2.0 * {detmath.PI} * CAST(t % period AS DOUBLE) / CAST(period AS DOUBLE)"
_PG_STAGES = (
    [("pg_arg", _PG_ARG)]
    + detmath.det_cos_stages("pg_arg", "pg_cos")
    + detmath.det_sin_stages("pg_arg", "pg_sin")
)


def _periodogram_oracle() -> str:
    return _PERIODOGRAM_ORACLE.replace(
        "FROM closes_src",
        "FROM events GROUP BY 1, 2",
    ).replace(
        "{PG_STAGED}",
        detmath.stages_to_select(
            _PG_STAGES, "(SELECT i.*, l.period FROM indexed i CROSS JOIN ladder l)"
        ),
    )


@register("timeseries_periodogram", oracle=_periodogram_oracle(), tags=("timeseries", "stats"))
def timeseries_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-frequency periodogram: the DFT power of the demeaned close
    series at candidate periods {_PERIODS} days — "is there a weekly
    cycle?" answered with the actual spectral estimate instead of the
    weekday-mean heuristic (`timeseries_weekday_index` measures the
    shape; this measures the STRENGTH at each frequency, including
    ones that don't align with calendar buckets). Each cos/sin term
    is demeaned with the exact integer mean, evaluated as one
    identical double expression, and micro-quantized BEFORE the sum —
    the reduction-order discipline — so the spectral sums are exact
    BIGINTs; amplitude takes one sqrt at the end. Full-series DFT at
    fixed k is a single aggregate — no FFT needed when the question
    names its frequencies, which at 100 TB is the difference between
    a groupBy and a per-key gather."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(
        F.round(F.max_by("value", "event_id") * 100).cast("long").alias("close_cents")
    )
    w = Window.partitionBy("symbol")
    indexed = closes.select(
        "symbol",
        "close_cents",
        (F.row_number().over(w.orderBy("day")) - 1).alias("t"),
        F.expr(
            "CAST(sum(close_cents) OVER (PARTITION BY symbol)"
            " div count(*) OVER (PARTITION BY symbol) AS BIGINT)"
        ).alias("mean_cents"),
    )
    ladder = F.array(*[F.lit(p) for p in _PERIODS])
    terms = detmath.apply_stages(
        indexed.select(
            "symbol",
            "close_cents",
            "t",
            "mean_cents",
            F.explode(ladder).alias("period"),
        ),
        _PG_STAGES,
    ).selectExpr(
        "symbol",
        "period",
        "CAST(floor((close_cents - mean_cents) * pg_cos * 1000 + 0.5) AS BIGINT) AS c_term_q",
        "CAST(floor((close_cents - mean_cents) * pg_sin * 1000 + 0.5) AS BIGINT) AS s_term_q",
    )
    return (
        terms.groupBy("symbol", F.col("period").cast("long").alias("period"))
        .agg(
            F.sum("c_term_q").cast("long").alias("cos_sum_q"),
            F.sum("s_term_q").cast("long").alias("sin_sum_q"),
        )
        .select(
            "symbol",
            "period",
            "cos_sum_q",
            "sin_sum_q",
            F.floor(
                F.sqrt(
                    F.col("cos_sum_q").cast("double") * F.col("cos_sum_q")
                    + F.col("sin_sum_q").cast("double") * F.col("sin_sum_q")
                )
                / 1000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("amplitude_cents"),
        )
        .orderBy("symbol", "period")
    )


# --------------------------------------------------------------------------
# Recency-decay engagement score
# --------------------------------------------------------------------------

_DECAY_HALF_LIFE_DAYS = 7

# decay weight via the libm-free det_exp kernel on the clamped exponent
# (below -40 the quantized term is exactly 0 in both engines anyway, and
# the clamp keeps det_exp's power-of-two shift inside BIGINT).
_DECAY_X = (
    f"greatest(-{detmath.LN2} * ((age_us) / 86400000000.0)"
    f" / {_DECAY_HALF_LIFE_DAYS}, -40.0)"
)
_DECAY_STAGES = [("dk_x", _DECAY_X)] + detmath.det_exp_stages("dk_x", "dk_w")
_DECAY_TERM = "CAST(floor(dk_w * CAST(round(value * 100) AS BIGINT) * 1000 + 0.5) AS BIGINT)"

_DECAY_ORACLE = f"""
WITH head AS (SELECT max(ts) AS now FROM events),
scored AS (
  SELECT user_id, {_DECAY_TERM} AS term_q
  FROM {detmath.stages_to_select(_DECAY_STAGES,
    "(SELECT e.user_id, e.value, epoch_us(h.now) - epoch_us(e.ts) AS age_us FROM events e CROSS JOIN head h)")}
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(term_q) AS BIGINT) AS engagement_milli_cents
FROM scored
GROUP BY user_id
ORDER BY user_id
"""


@register("events_decay_engagement", oracle=_DECAY_ORACLE, tags=("analytics",))
def events_decay_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-decayed engagement score: each event contributes
    value * 2^(-age/half-life) with a {_DECAY_HALF_LIFE_DAYS}-day
    half-life — the standard freshness-weighted activity metric that
    a plain 30-day count approximates badly (a burst 29 days ago
    counts like yesterday's). Ages are exact integer micros against
    the corpus head timestamp, each decayed term is one identical
    double expression micro-quantized to 1e-3 cents BEFORE the
    per-user sum, and the total is an exact BIGINT. At scale the
    decay weight is computable incrementally (multiply yesterday's
    score by the daily decay factor and add today's) — this batch
    form is the backfill/repair path of that incremental metric.
    Plan: one 1-row head aggregate broadcast, one user rollup."""
    ev = load_table(spark, sf_dir, "events")
    head = ev.agg(F.max("ts").alias("now"))
    aged = ev.crossJoin(F.broadcast(head)).select(
        "user_id",
        "value",
        (F.unix_micros("now") - F.unix_micros("ts")).alias("age_us"),
    )
    scored = detmath.apply_stages(aged, _DECAY_STAGES).selectExpr(
        "user_id", f"{_DECAY_TERM} AS term_q"
    )
    return (
        scored.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("term_q").cast("long").alias("engagement_milli_cents"),
        )
        .orderBy("user_id")
    )
