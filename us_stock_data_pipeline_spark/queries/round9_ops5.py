"""Round-9 operators, part 5: pinball-loss quantile-forecast
evaluation (URL-canonicalization dedup already exists as
``dedup_url_canonical`` in llm_ops9 — the registry-first check caught
the near-duplicate before registration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# ml: pinball (quantile) loss of a per-group quantile forecast
# --------------------------------------------------------------------------

_PINBALL_TAU_NUM, _PINBALL_TAU_DEN = 9, 10  # tau = 0.9

_PINBALL_ORACLE = f"""
WITH vals AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
),
ranked AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type ORDER BY cents, 1) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM vals
),
-- type-1 (ceil-rank) 90th-percentile forecast per group: an exact order
-- statistic, no interpolation
q AS (
  SELECT event_type,
         CAST(max(CASE WHEN rn = ({_PINBALL_TAU_NUM} * n + {_PINBALL_TAU_DEN} - 1)
                            // {_PINBALL_TAU_DEN} THEN cents END) AS BIGINT) AS qf
  FROM ranked GROUP BY event_type
),
-- pinball loss at 10x scale so tau stays integer:
--   10 * L = 9*(y-q) if y >= q else 1*(q-y)
loss AS (
  SELECT v.event_type, q.qf,
         CASE WHEN v.cents >= q.qf THEN {_PINBALL_TAU_NUM} * (v.cents - q.qf)
              ELSE ({_PINBALL_TAU_DEN} - {_PINBALL_TAU_NUM}) * (q.qf - v.cents)
         END AS l10
  FROM vals v JOIN q ON q.event_type = v.event_type
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_obs,
       CAST(max(qf) AS BIGINT) AS q90_cents,
       CAST(sum(l10) AS BIGINT) AS pinball_sum_x10,
       CAST(sum(l10) // count(*) AS BIGINT) AS pinball_mean_x10
FROM loss
GROUP BY event_type
ORDER BY event_type
"""


@register("ml_pinball_loss", oracle=_PINBALL_ORACLE, tags=("ml", "stats", "forecast"))
def ml_pinball_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PINBALL (quantile) loss — the scoring rule quantile forecasts are
    judged by (M5/GEFCom, every P90 capacity forecast): L_tau(y, q) =
    tau*(y-q) if y >= q else (1-tau)*(q-y), evaluated here for each
    group's own type-1 90th-percentile as the forecast (the in-sample
    baseline a real forecaster must beat). The loss is kept at 10x
    scale so tau = 9/10 stays exact INTEGER arithmetic end-to-end —
    cents are exact, the order-statistic forecast is an exact rank
    pick, and sums/means are integer floor-divides. Complements the
    point-forecast metrics (`forecast_theil_u2`, MSE decompositions)
    with the quantile-calibration one. Plan: one ranked window pass for
    the quantile, one broadcast join back, one rollup — two shuffles on
    the same group key."""
    ev = load_table(spark, sf_dir, "events")
    vals = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("cents", F.lit(1))
    ranked = vals.select(
        "event_type",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("event_type")).alias("n"),
    )
    q = ranked.groupBy("event_type").agg(
        F.max(
            F.when(
                F.col("rn")
                == F.expr(
                    f"({_PINBALL_TAU_NUM} * n + {_PINBALL_TAU_DEN} - 1)"
                    f" div {_PINBALL_TAU_DEN}"
                ),
                F.col("cents"),
            )
        )
        .cast("long")
        .alias("qf")
    )
    loss = vals.join(F.broadcast(q), "event_type").select(
        "event_type",
        "qf",
        F.when(
            F.col("cents") >= F.col("qf"),
            _PINBALL_TAU_NUM * (F.col("cents") - F.col("qf")),
        )
        .otherwise(
            (_PINBALL_TAU_DEN - _PINBALL_TAU_NUM) * (F.col("qf") - F.col("cents"))
        )
        .alias("l10"),
    )
    return (
        loss.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_obs"),
            F.max("qf").cast("long").alias("q90_cents"),
            F.sum("l10").cast("long").alias("pinball_sum_x10"),
            F.expr("CAST(sum(l10) div count(*) AS BIGINT)").alias("pinball_mean_x10"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# ETL: versioned-table metadata tables (DESCRIBE HISTORY / table.files)
# --------------------------------------------------------------------------

# After the standard 3-batch staging: v1 writes all 5 partitions, v2 and
# v3 restate all 5 (every event_type has rows past both cutoffs in the
# fixture), no DVs, no stats. The oracle states that shape in closed
# form, joined with the per-version restated row counts.
_HISTORY_ORACLE = """
WITH counts AS (
  SELECT CAST(count(*) AS BIGINT) AS n_all,
         CAST(count(*) FILTER (WHERE ts >= TIMESTAMP '2024-01-10') AS BIGINT) AS n_v2,
         CAST(count(*) FILTER (WHERE ts >= TIMESTAMP '2024-01-25') AS BIGINT) AS n_v3
  FROM events
)
SELECT v.version,
       CAST(5 AS BIGINT) AS n_partitions,
       CAST(5 AS BIGINT) AS n_partitions_written,
       CAST(0 AS BIGINT) AS n_deletion_vectors,
       CASE v.version WHEN 1 THEN c.n_all WHEN 2 THEN c.n_v2 ELSE c.n_v3 END
         AS n_rows_written
FROM (SELECT unnest([1, 2, 3]) AS version) v
CROSS JOIN counts c
ORDER BY v.version
"""


@register(
    "etl_versioned_history",
    oracle=_HISTORY_ORACLE,
    tags=("etl", "sink", "versioned"),
)
def etl_versioned_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg/Delta **DESCRIBE HISTORY** as a queryable DataFrame —
    the audit surface a lakehouse operator reads first: one row per
    committed version with the partitions the commit owns vs WROTE
    (carried-forward vs restated), live deletion vectors, and the
    per-version restated row count (joined from time-travel reads).
    versioned_history() itself is a driver-side manifest walk —
    metadata only, constant cost in table size — exactly how
    `table.history()` works on Iceberg; the row counts here add one
    pinned read per version to make the output value-checkable. The
    oracle restates the expected commit shape in closed form from the
    raw fixture (every event_type has rows past both restatement
    cutoffs, so every commit touches all 5 partitions)."""
    from us_stock_data_pipeline_spark.etl.versioned import (
        read_versioned,
        versioned_history,
    )
    from us_stock_data_pipeline_spark.queries.versioned_ops import (
        _ingest_three_batches,
    )

    root = _ingest_three_batches(spark, sf_dir)
    hist = versioned_history(spark, root).select(
        "version", "n_partitions", "n_partitions_written", "n_deletion_vectors"
    )
    cuts = {1: None, 2: "2024-01-10", 3: "2024-01-25"}
    counts = []
    for v in (1, 2, 3):
        c = read_versioned(spark, root, version=v)
        if cuts[v]:
            # the v-th batch restates exactly the rows past its cutoff
            # (counting by changed px would undercount: a zero px is
            # unchanged under the x2/x3 restatement)
            c = c.filter(F.col("ts") >= F.lit(cuts[v]).cast("timestamp"))
        counts.append(
            c.agg(
                F.lit(v).cast("long").alias("version"),
                F.count(F.lit(1)).cast("long").alias("n_rows_written"),
            )
        )
    written = counts[0]
    for df in counts[1:]:
        written = written.unionByName(df)
    return hist.join(written, "version").orderBy("version")


# --------------------------------------------------------------------------
# ETL: SCD Type 4 (current dimension + separate history table)
# --------------------------------------------------------------------------

_SCD4_ORACLE = """
WITH changes AS (
  SELECT user_id, event_type AS attr, ts, event_id,
         lag(event_type) OVER w AS prev_attr
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
survivors AS (
  SELECT user_id, attr, ts AS valid_from,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ver
  FROM changes WHERE prev_attr IS NULL OR attr <> prev_attr
),
-- SCD4 split: the CURRENT table holds one row per key (latest version,
-- no validity machinery); the HISTORY table holds every superseded row
current_t AS (
  SELECT user_id, attr, ver FROM survivors
  QUALIFY ver = max(ver) OVER (PARTITION BY user_id)
),
history_t AS (
  SELECT user_id, attr, ver FROM survivors
  QUALIFY ver < max(ver) OVER (PARTITION BY user_id)
)
SELECT 'current' AS table_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(DISTINCT attr) AS BIGINT) AS n_attrs,
       CAST(sum(ver) AS BIGINT) AS sum_versions
FROM current_t
UNION ALL
SELECT 'history',
       CAST(count(*) AS BIGINT),
       CAST(count(DISTINCT user_id) AS BIGINT),
       CAST(count(DISTINCT attr) AS BIGINT),
       CAST(coalesce(sum(ver), 0) AS BIGINT)
FROM history_t
ORDER BY table_type
"""


@register("etl_scd4_history_table", oracle=_SCD4_ORACLE, tags=("etl", "dimension"))
def etl_scd4_history_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension **Type 4**: the change stream splits
    into a lean CURRENT table (one row per key, latest attribute, no
    validity columns — the table OLTP lookups hit) and a separate
    HISTORY table holding every superseded version — the pattern teams
    pick over SCD2 (`etl_scd2_dimension`) when the hot path must stay
    narrow and audits are rare. Change detection is the same
    lag-collapse as SCD2 (consecutive identical values merge), then
    ONE max-version window splits current from history — both windows
    ride the same user_id shuffle, so the whole build is one exchange.
    Output pins both tables' shapes (row/user/attr counts and the
    version checksum); at 100 TB the history table appends and the
    current table is a keyed upsert — exactly the two sinks
    `etl_merge_upsert` and the versioned table provide."""
    ev = load_table(spark, sf_dir, "events")
    w_ev = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = ev.select(
        "user_id",
        F.col("event_type").alias("attr"),
        "ts",
        "event_id",
        F.lag("event_type").over(w_ev).alias("prev_attr"),
    ).filter(F.col("prev_attr").isNull() | (F.col("attr") != F.col("prev_attr")))
    survivors = changes.select(
        "user_id",
        "attr",
        F.row_number().over(w_ev).alias("ver"),
    )
    w_u = Window.partitionBy("user_id")
    tagged = survivors.withColumn("max_ver", F.max("ver").over(w_u))

    def shape(df, name: str):
        return df.agg(
            F.lit(name).alias("table_type"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.countDistinct("attr").cast("long").alias("n_attrs"),
            F.coalesce(F.sum("ver"), F.lit(0)).cast("long").alias("sum_versions"),
        )

    cur = shape(tagged.filter(F.col("ver") == F.col("max_ver")), "current")
    hist = shape(tagged.filter(F.col("ver") < F.col("max_ver")), "history")
    return cur.unionByName(hist).orderBy("table_type")


# --------------------------------------------------------------------------
# ETL: versioned-table orphan audit (read-only fsck)
# --------------------------------------------------------------------------

# Protocol-determined shape after the 3-batch staging + one simulated
# crashed writer (fully-written attempt dir + tmp manifest, never
# published): with keep_last=2 the retained manifests are v2/v3, each
# merge restates all 5 partitions so each version owns ONE dir ->
# live = {v2, v3}, orphans = {v1's dir, the crashed attempt}, one stale
# tmp manifest, one expired manifest (v1). The live snapshot's row count
# pins that the audit is read-only.
_ORPHAN_ORACLE = """
SELECT CAST(2 AS BIGINT) AS n_orphan_dirs,
       CAST(1 AS BIGINT) AS n_stale_tmp_manifests,
       CAST(1 AS BIGINT) AS n_expired_manifests,
       CAST(2 AS BIGINT) AS n_live_dirs,
       CAST(count(*) AS BIGINT) AS n_rows_live
FROM events
"""


@register(
    "etl_versioned_orphan_audit",
    oracle=_ORPHAN_ORACLE,
    tags=("etl", "sink", "versioned", "ops"),
)
def etl_versioned_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read-only **fsck** for the versioned table: classify everything
    on disk that no retained manifest references — exactly what a
    vacuum would reclaim, surfaced as an audit instead of a delete
    (the ops dashboard number whose growth means crashed writers or
    lost commit races). The fixture run commits three merges, then
    simulates a writer that crashed BETWEEN data write and manifest
    publish (a fully-written attempt dir + a .tmp manifest — the
    exact pre-publish state of the commit protocol); with keep_last=2
    the audit must report the superseded v1 dir plus the crashed
    attempt as orphans, one stale tmp manifest, one expired manifest,
    two live dirs — and the head snapshot must still read every row
    (the audit touches nothing). All counts are protocol-determined;
    the hashed row count proves read-only-ness. Driver-side metadata
    walk — constant cost in data size."""
    import posixpath

    from us_stock_data_pipeline_spark.etl.versioned import (
        _write_file,
        read_versioned,
        versioned_orphans,
    )
    from us_stock_data_pipeline_spark.queries.versioned_ops import (
        _ingest_three_batches,
    )

    root = _ingest_three_batches(spark, sf_dir)
    # simulate the crash: attempt dir written, manifest never published
    crashed = posixpath.join(root, "versions", "v00000004-deadbeef")
    read_versioned(spark, root).limit(1).write.mode("overwrite").parquet(crashed)
    _write_file(spark, posixpath.join(root, "manifests", ".tmp_crashed.json"), "{}")
    audit = versioned_orphans(spark, root, keep_last=2)
    n_rows_live = read_versioned(spark, root).count()
    return spark.createDataFrame(
        [
            (
                len(audit["orphan_version_dirs"]),
                len(audit["stale_tmp_manifests"]),
                len(audit["expired_manifests"]),
                len(audit["live_version_dirs"]),
                n_rows_live,
            )
        ],
        "n_orphan_dirs long, n_stale_tmp_manifests long,"
        " n_expired_manifests long, n_live_dirs long, n_rows_live long",
    )
