"""UDF surface demos: scalar pandas_udf and grouped applyInPandas.

These exist to prove the Arrow-vectorized Python path (SURVEY §2B "UDF
surface"; parity ancestors U1/U2 — the reference's row normalizers are
driver-side Python that an engine replaces with vectorized kernels).
Rule applied everywhere else in this repo: built-ins first; Python only
when the semantics genuinely need it — and then always Arrow-batched,
never row-at-a-time.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register


@register(
    "udf_zscore_by_group",
    oracle="""
SELECT
  event_id,
  event_type,
  round((value - avg(value)    OVER (PARTITION BY event_type))
        / stddev_samp(value)   OVER (PARTITION BY event_type), 4) AS zscore
FROM events
ORDER BY event_id
""",
    tags=("udf",),
)
def udf_zscore_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-event_type z-score computed in a
    pandas kernel (ddof=1 == stddev_samp). One shuffle on the group key;
    each group lands in one Arrow batch. The oracle is the equivalent
    window formulation — which is also the pure-SQL way to write this;
    the UDF exists to exercise the grouped-map path."""
    ev = load_table(spark, sf_dir, "events")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf["value"].std(ddof=1)
        z = (pdf["value"] - pdf["value"].mean()) / std
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "event_type": pdf["event_type"], "zscore": z.round(4)}
        )

    out = ev.select("event_id", "event_type", "value").groupBy("event_type").applyInPandas(
        zscore, schema="event_id long, event_type string, zscore double"
    )
    return out.orderBy("event_id")


@register(
    "pandas_udf_vowel_stats",
    oracle="""
SELECT
  doc_id,
  CAST(len(regexp_extract_all(text, '[aeiou]')) AS BIGINT) AS n_vowels,
  round(CAST(len(regexp_extract_all(text, '[aeiou]')) AS DOUBLE) / length(text), 4) AS vowel_ratio
FROM documents
ORDER BY doc_id
""",
    tags=("udf",),
)
def pandas_udf_vowel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf (Arrow-vectorized string kernel): vowel counts
    per document. Batch-at-a-time pandas `str.count` — the 10-100x-faster
    alternative to a row-at-a-time Python UDF."""

    @F.pandas_udf("long")
    def n_vowels(s: pd.Series) -> pd.Series:
        return s.str.count("[aeiou]").astype("int64")

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", n_vowels("text").alias("n_vowels"), F.length("text").alias("tl"))
        .select(
            "doc_id",
            "n_vowels",
            F.round(F.col("n_vowels").cast("double") / F.col("tl"), 4).alias("vowel_ratio"),
        )
        .orderBy("doc_id")
    )


ASOF_PANDAS_ORACLE = """
SELECT
  p.event_id,
  p.user_id,
  p.ts,
  (SELECT max(c.ts) FROM events c
    WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
  ) AS last_click_ts
FROM events p
WHERE p.event_type = 'purchase'
ORDER BY p.event_id
"""


@register("join_asof_pandas", oracle=ASOF_PANDAS_ORACLE, tags=("join", "asof", "udf"))
def join_asof_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The as-of join AGAIN, through the Arrow escape hatch: cogrouped
    applyInPandas running pandas.merge_asof — the pattern for when as-of
    semantics grow beyond what a window expresses (tolerance bands,
    nearest-direction, multiple value columns). Same oracle as the
    window formulation (join_asof), so the two implementations are
    proven interchangeable.

    Batch-size lesson (measured): cogrouping directly on user_id made
    one Arrow batch per user — 1500 kernel invocations of ~15ms fixed
    pandas overhead each, 25s total at sf0.1. Cogrouping on a COARSE
    bucket (user_id % 32) and letting merge_asof's `by=` handle the
    per-user alignment inside each batch is the same semantics with 32
    kernel invocations — 0.9s. The shuffle key changes, the algorithm
    doesn't; at cluster scale pick bucket count ~ a few x executor
    count."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    bucket = F.pmod("user_id", F.lit(32)).cast("int").alias("bucket")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", bucket)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", bucket
    )

    def asof(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        left = left.sort_values("ts")
        if right.empty:
            out = left.copy()
            out["last_click_ts"] = pd.NaT
            return out[["event_id", "user_id", "ts", "last_click_ts"]]
        right = right.sort_values("ts").rename(columns={"ts": "last_click_ts"})
        out = pd.merge_asof(
            left,
            right[["user_id", "last_click_ts"]],
            left_on="ts",
            right_on="last_click_ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        )
        return out[["event_id", "user_id", "ts", "last_click_ts"]]

    out_schema = "event_id long, user_id long, ts timestamp, last_click_ts timestamp"
    return (
        purchases.groupBy("bucket")
        .cogroup(clicks.groupBy("bucket"))
        .applyInPandas(asof, out_schema)
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# Recursive indicator: EMA via applyInPandas
# --------------------------------------------------------------------------

_EMA_ORACLE = """
WITH RECURSIVE bars0 AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         arg_max(value, event_id) AS close
  FROM events GROUP BY 1, 2
),
bars AS (
  SELECT symbol, day, close,
         row_number() OVER (PARTITION BY symbol ORDER BY day) AS rn
  FROM bars0
),
ema(symbol, day, close, rn, ema) AS (
  SELECT symbol, day, close, rn, close FROM bars WHERE rn = 1
  UNION ALL
  SELECT b.symbol, b.day, b.close, b.rn, 0.2 * b.close + 0.8 * e.ema
  FROM bars b JOIN ema e ON b.symbol = e.symbol AND b.rn = e.rn + 1
)
SELECT symbol, day, round(close, 4) AS close, round(ema, 4) AS ema
FROM ema
ORDER BY symbol, day
"""


@register("bars_ema", oracle=_EMA_ORACLE, tags=("udf", "stock", "recursive"), bench=True)
def bars_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential moving average over daily closes — the canonical
    operator Spark's built-ins genuinely CANNOT express: ema_t depends
    on ema_{t-1}, and window frames can't recurse. This is exactly the
    case the architecture reserves for applyInPandas: one shuffle on the
    series key, each series arrives as a single Arrow batch, and the
    recursion is a per-group kernel. The kernel writes the recursion
    explicitly (0.2*x + 0.8*prev) rather than pandas ewm() so the
    floating-point expression is bit-identical to the oracle's recursive
    CTE. Per-symbol history fits one executor by construction (a series
    that doesn't is chunked by date with carried-in state — same kernel,
    seeded first row)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).agg(F.max_by("value", "event_id").alias("close"))

    def ema_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        out = [0.0] * len(pdf)
        prev = None
        for i, x in enumerate(pdf["close"]):
            prev = x if prev is None else 0.2 * x + 0.8 * prev
            out[i] = prev
        pdf["ema"] = out
        return pdf[["symbol", "day", "close", "ema"]]

    out_schema = "symbol string, day date, close double, ema double"
    return (
        daily.groupBy("symbol")
        .applyInPandas(ema_kernel, out_schema)
        .select("symbol", "day", F.round("close", 4).alias("close"), F.round("ema", 4).alias("ema"))
        .orderBy("symbol", "day")
    )
