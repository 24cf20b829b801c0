"""Round-96 source formats, part 9: fixed-width mainframe-style file
parsing and the count-distinct-over-window rewrite.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register


def _stage_dir(sf_dir: str, kind: str) -> str:
    key = hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), "us_sdps_landing", key, kind)


# --------------------------------------------------------------------------
# Fixed-width file landing (mainframe extract layout)
# --------------------------------------------------------------------------

# layout: user_id [8] event_id [10] event_type [10, right-padded]
#         value_cents [12, zero-padded with sign column]
_FW_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(user_id) AS BIGINT) AS min_user,
       CAST(max(user_id) AS BIGINT) AS max_user,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def _stage_fixed_width(spark: SparkSession, sf_dir: str) -> str:
    """Render events as a fixed-width text extract, once per sf_dir."""
    path = _stage_dir(sf_dir, "fixedwidth")
    marker = os.path.join(path, "_SUCCESS")
    src = os.path.join(sf_dir, "events.parquet")
    if os.path.exists(marker) and os.stat(marker).st_mtime < os.stat(src).st_mtime:
        import shutil

        shutil.rmtree(path, ignore_errors=True)
    if not os.path.exists(marker):
        line = F.concat(
            F.lpad(F.col("user_id").cast("string"), 8, "0"),
            F.lpad(F.col("event_id").cast("string"), 10, "0"),
            F.rpad(F.col("event_type"), 10, " "),
            F.lpad(F.round(F.col("value") * 100).cast("long").cast("string"), 12, "0"),
        )
        (
            load_table(spark, sf_dir, "events")
            .select(line.alias("value"))
            .write.mode("overwrite")
            .text(path)
        )
    return path


@register("source_fixed_width_parse", oracle=_FW_ORACLE, tags=("source", "text"))
def source_fixed_width_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width extract parsing: events render to an 40-char
    mainframe-style layout (zero-padded numerics, right-padded text,
    no delimiters at all), land as plain text, and parse back with
    pure substring arithmetic — the layout COBOL copybooks, card
    feeds, and many bank/exchange EOD files still use, and the one
    format `spark.read.csv` cannot touch (`source_csv_dialect` handles
    quoting; here there is nothing to quote). Parsing is substr +
    trim + cast in the scan stage — JVM codegen, map-side, zero
    Python. The aggregate must reproduce the source parquet's exact
    per-type counts, user-id range, and cent totals, proving the
    render -> land -> parse loop lossless including padding
    round-trips. One groupBy after the parse."""
    path = _stage_fixed_width(spark, sf_dir)
    lines = spark.read.text(path)
    parsed = lines.select(
        F.substring("value", 1, 8).cast("long").alias("user_id"),
        F.trim(F.substring("value", 19, 10)).alias("event_type"),
        F.substring("value", 29, 12).cast("long").alias("cents"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("user_id").cast("long").alias("min_user"),
            F.max("user_id").cast("long").alias("max_user"),
            F.sum("cents").cast("long").alias("value_cents"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# COUNT(DISTINCT) OVER window via the dense_rank rewrite
# --------------------------------------------------------------------------

_WCD_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
-- reference semantics: cumulative COUNT(DISTINCT type) per user as of
-- each event (DuckDB window frames don't allow DISTINCT either, so the
-- oracle uses the same first-seen-flag identity from the other side)
flagged AS (
  SELECT user_id, rn, event_type, ts, event_id,
         CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) = 1
              THEN 1 ELSE 0 END AS first_seen
  FROM ordered
)
SELECT user_id, CAST(rn AS BIGINT) AS event_seq,
       CAST(sum(first_seen) OVER (PARTITION BY user_id ORDER BY rn
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS distinct_types_so_far
FROM flagged
WHERE rn <= 5
ORDER BY user_id, event_seq
"""


@register("window_count_distinct_rewrite", oracle=_WCD_ORACLE, tags=("window", "rewrite"))
def window_count_distinct_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT x) OVER a running window — which Spark (and
    ANSI SQL windows generally) REJECT outright — via the standard
    rewrite: flag each row that is the FIRST occurrence of its value
    within the partition (a second ranking window keyed by the value),
    then a plain running SUM of the flags. The first five events per
    user emit their cumulative distinct-type count. This is the
    pattern every 'unique items seen so far' feature needs, and the
    dual ranking must repeat the outer window's EXACT (ts, event_id)
    tiebreak or equal-timestamp rows permute flags (the two-window
    ordering trap the verify playbook documents). Both windows share
    one (user) shuffle; the first-seen flag needs a second sort by
    (type, ts) inside it — no join, no state beyond the sort."""
    ev = load_table(spark, sf_dir, "events")
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        F.row_number().over(w_seq).alias("rn"),
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias("first_seen"),
    )
    w_cum = Window.partitionBy("user_id").orderBy("rn").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        flagged.select(
            "user_id",
            F.col("rn").cast("long").alias("event_seq"),
            F.sum("first_seen").over(w_cum).cast("long").alias("distinct_types_so_far"),
        )
        .filter(F.col("event_seq") <= 5)
        .orderBy("user_id", "event_seq")
    )
