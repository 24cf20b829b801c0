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
    applyInPandas running pandas.merge_asof per user_id — the pattern for
    when as-of semantics grow beyond what a window expresses (tolerance
    bands, nearest-direction, multiple value columns). Same oracle as the
    window formulation (join_asof), so the two implementations are proven
    interchangeable. Scale shape: both sides shuffle once on the key;
    each group's sort happens in-kernel; Arrow moves columns, not rows.
    The window form stays JVM-side and is preferred when it suffices."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
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
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(asof, out_schema)
        .orderBy("event_id")
    )
