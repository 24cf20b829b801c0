"""Round-12 additions: the versioned table becomes SQL-addressable.

The reference addresses its Delta tables BY NAME through the metastore
(`ingest_1m_session.py:204-209`: spark.table-style access to
bars_1m_raw / session tables); until round 11 this engine's versioned
table was reachable only via Python library calls. `etl/vcatalog.py`
closes that gap with a catalog view layer + SQL front-end, and these
queries drive it end-to-end under the driver's oracle gate.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# versioned table via spark.sql: name + all three time-travel syntaxes
# --------------------------------------------------------------------------

# Deterministic lifecycle: v1 writes per-nation counts (band = nk % 5),
# tag 'baseline' pins v1, v2 rewrites bands 0-1 with val+1. The SQL
# statement joins the CURRENT view against VERSION AS OF 1 (numeric),
# VERSION AS OF 'baseline' (ref) and TIMESTAMP AS OF v1's committed_at
# (wall-clock resolution) — all three must resolve to the same snapshot,
# so v1/tag/ts sums are equal by construction and the oracle computes
# both generations straight from `customer`.
_SQL_TT_ORACLE = """
WITH base AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nk,
         CAST(c_nationkey % 5 AS BIGINT) AS band,
         CAST(count(*) AS BIGINT) AS n
  FROM customer GROUP BY 1, 2
)
SELECT band,
       CAST(sum(n + CASE WHEN band IN (0, 1) THEN 1 ELSE 0 END) AS BIGINT)
         AS cur_sum,
       CAST(sum(n) AS BIGINT) AS v1_sum,
       CAST(sum(n) AS BIGINT) AS tag_sum,
       CAST(sum(n) AS BIGINT) AS ts_sum,
       CAST(count(*) AS BIGINT) AS n_keys
FROM base
GROUP BY band
ORDER BY band
"""


@register(
    "etl_versioned_sql_timetravel",
    oracle=_SQL_TT_ORACLE,
    tags=("etl", "versioned", "sql"),
    round=12,
)
def etl_versioned_sql_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned table read BY NAME through ``spark.sql``, with all
    three time-travel syntaxes in ONE statement (etl/vcatalog.py,
    round 12; reference ancestor: the Delta table names at
    `ingest_1m_session.py:204-209`): ``register_versioned`` pins the
    manifest snapshot as a temp view whose plan is the plain JVM
    parquet scan — manifest-level pruning decides the file list,
    Catalyst still owns pushdown/pruning/codegen — and
    ``versioned_sql`` rewrites `VERSION AS OF <n>`, `VERSION AS OF
    '<tag>'` and `TIMESTAMP AS OF '<ts>'` (resolved against the
    manifests' committed_at clocks) into lazily-registered snapshot
    views before handing the statement to vanilla spark.sql. Snapshot
    resolution is one manifest read — metadata-only, constant in table
    size, which is what makes SQL time travel interactive at 100 TB."""
    import shutil
    import tempfile
    import uuid as _uuid

    from us_stock_data_pipeline_spark.etl.vcatalog import (
        register_versioned,
        unregister_versioned,
        versioned_sql,
    )
    from us_stock_data_pipeline_spark.etl.versioned import (
        _read_manifest_doc,
        create_tag,
        versioned_merge_upsert,
    )

    base = (
        load_table(spark, sf_dir, "customer")
        .groupBy(
            F.col("c_nationkey").cast("long").alias("nk"),
            (F.col("c_nationkey") % 5).cast("long").alias("band"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("val"))
        # reused by every commit below: cache the per-nation rollup so
        # each staging write reads 25 cached rows, not customer (guide §5)
        .transform(registry.track_persist)
    )
    root = tempfile.mkdtemp(prefix=f"us_sdps_vsql_{_uuid.uuid4().hex[:8]}_")
    name = f"vtab_{_uuid.uuid4().hex[:8]}"
    try:
        versioned_merge_upsert(
            spark, base, root, key_cols=("nk",), partition_cols=("band",)
        )
        create_tag(spark, root, "baseline", 1)
        t1 = _read_manifest_doc(spark, root, 1)["committed_at"]
        # TIMESTAMP AS OF t1 must resolve to v1: guarantee v2's clock is
        # strictly later (commits take ~100ms of Spark jobs anyway; this
        # guard just makes the ordering a certainty, not a near-certainty)
        import time as _time

        from us_stock_data_pipeline_spark.etl.versioned import _now_ms

        while _now_ms(spark) <= t1:
            _time.sleep(0.002)
        updates = base.filter(F.col("band").isin(0, 1)).withColumn(
            "val", F.col("val") + 1
        )
        versioned_merge_upsert(
            spark, updates, root, key_cols=("nk",), partition_cols=("band",)
        )
        ts_lit = _dt.datetime.fromtimestamp(
            t1 / 1000, _dt.timezone.utc
        ).strftime("%Y-%m-%d %H:%M:%S.%f")
        register_versioned(spark, name, root)
        out = versioned_sql(
            spark,
            f"""
            SELECT c.band,
                   CAST(sum(c.val) AS BIGINT) AS cur_sum,
                   CAST(sum(v.val) AS BIGINT) AS v1_sum,
                   CAST(sum(t.val) AS BIGINT) AS tag_sum,
                   CAST(sum(s.val) AS BIGINT) AS ts_sum,
                   CAST(count(*) AS BIGINT) AS n_keys
            FROM {name} c
            JOIN {name} VERSION AS OF 1 v ON c.nk = v.nk
            JOIN {name} VERSION AS OF 'baseline' t ON c.nk = t.nk
            JOIN {name} TIMESTAMP AS OF '{ts_lit}' s ON c.nk = s.nk
            GROUP BY c.band
            ORDER BY c.band
            """,
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        unregister_versioned(spark, name)
        shutil.rmtree(root, ignore_errors=True)


# --------------------------------------------------------------------------
# streaming CHANGE DATA FEED source (readStream over the commit log)
# --------------------------------------------------------------------------

# Deterministic lifecycle: v1 base (per-nation counts, band = nk % 5),
# v2 upserts bands 0-1 with val+1 (every key's value changes ->
# update_postimage), v3 inserts shifted keys (nk+1000, band 9, val=nk),
# v4 DV-deletes keys {0, 1}. The stream starts AFTER v1
# (startingversion=1) and the per-commit change rows aggregate to
# closed-form expressions over `customer`.
_CDF_STREAM_ORACLE = """
WITH base AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nk,
         CAST(c_nationkey % 5 AS BIGINT) AS band,
         CAST(count(*) AS BIGINT) AS n
  FROM customer GROUP BY 1, 2
)
SELECT * FROM (
  SELECT CAST(2 AS BIGINT) AS commit_version,
         'update_postimage' AS change_type,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(n + 1) AS BIGINT) AS sum_val
  FROM base WHERE band IN (0, 1)
  UNION ALL
  SELECT CAST(3 AS BIGINT), 'insert',
         CAST(count(*) AS BIGINT), CAST(sum(nk) AS BIGINT)
  FROM base
  UNION ALL
  SELECT CAST(4 AS BIGINT), 'delete',
         CAST(count(*) AS BIGINT), CAST(NULL AS BIGINT)
  FROM base WHERE nk IN (0, 1)
) t
ORDER BY commit_version
"""


@register(
    "stream_versioned_cdf_source",
    oracle=_CDF_STREAM_ORACLE,
    tags=("streaming", "versioned"),
    round=12,
)
def stream_versioned_cdf_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGE DATA FEED as a STREAM SOURCE (etl/cdf_stream.py, round 12
    — the source half whose sink half is `stream_versioned_upsert`;
    Delta's `readStream.option('readChangeFeed')` re-expressed on the
    manifest protocol via the Spark 4 Python DataSource streaming API).
    Offsets ARE table versions: `latestOffset` lists manifests,
    `partitions` diffs consecutive manifests' partition POINTERS
    (driver-side dict compare, metadata only — a commit touching 2 of a
    million partitions schedules 2 tasks), and each executor task
    pyarrow-diffs ONE partition's pre/post files into
    insert/update_postimage/delete rows. Batch equivalence with
    `read_changes` is pinned per commit in tests/test_cdf_stream.py;
    here the streamed feed aggregates to a closed form the oracle
    recomputes from `customer`."""
    import shutil
    import tempfile
    import uuid as _uuid

    from us_stock_data_pipeline_spark.etl.cdf_stream import register_cdf_source
    from us_stock_data_pipeline_spark.etl.versioned import (
        versioned_delete,
        versioned_merge_upsert,
    )

    base = (
        load_table(spark, sf_dir, "customer")
        .groupBy(
            F.col("c_nationkey").cast("long").alias("nk"),
            (F.col("c_nationkey") % 5).cast("long").alias("band"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("val"))
        # reused by every commit below: cache the per-nation rollup so
        # each staging write reads 25 cached rows, not customer (guide §5)
        .transform(registry.track_persist)
    )
    root = tempfile.mkdtemp(prefix=f"us_sdps_cdfsrc_{_uuid.uuid4().hex[:8]}_")
    sink = f"cdf_feed_{_uuid.uuid4().hex[:8]}"
    try:
        versioned_merge_upsert(
            spark, base, root, key_cols=("nk",), partition_cols=("band",)
        )
        v2 = base.filter(F.col("band").isin(0, 1)).withColumn(
            "val", F.col("val") + 1
        )
        versioned_merge_upsert(
            spark, v2, root, key_cols=("nk",), partition_cols=("band",)
        )
        v3 = base.select(
            (F.col("nk") + 1000).alias("nk"),
            F.lit(9).cast("long").alias("band"),
            F.col("nk").alias("val"),
        )
        versioned_merge_upsert(
            spark, v3, root, key_cols=("nk",), partition_cols=("band",)
        )
        versioned_delete(
            spark,
            spark.createDataFrame([(0,), (1,)], "nk long"),
            root,
            key_cols=("nk",),
        )
        register_cdf_source(spark)
        feed = (
            spark.readStream.format("versioned_cdf")
            .option("path", root)
            .option("keycols", "nk")
            .option("tableschema", "nk long, band long, val long")
            .option("startingversion", "1")
            .load()
        )
        q = (
            feed.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        out = (
            spark.table(sink)
            .groupBy(
                F.col("_commit_version").alias("commit_version"),
                F.col("_change_type").alias("change_type"),
            )
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("val").cast("long").alias("sum_val"),
            )
            .orderBy("commit_version")
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# --------------------------------------------------------------------------
# spill evidence: external (out-of-core) window execution, hash-exact
# --------------------------------------------------------------------------

_SPILL_ORACLE = """
WITH r AS (
  SELECT l_returnflag,
         sum(CAST(floor(l_quantity) AS BIGINT)) OVER (
           PARTITION BY l_returnflag
           ORDER BY l_orderkey, l_linenumber, l_quantity
           ROWS UNBOUNDED PRECEDING) AS rq
  FROM lineitem
)
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(rq) AS BIGINT) AS sum_running_qty,
       TRUE AS spilled
FROM r
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register(
    "scale_window_spill_external",
    oracle=_SPILL_ORACLE,
    tags=("scale", "window"),
    round=12,
)
def scale_window_spill_external(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPILL EVIDENCE for the memory-bound story (round 12, VERDICT r11
    #4): the per-partition running-sum window is executed with
    `spark.sql.windowExec.buffer.spill.threshold` forced far below the
    partition size (rows/48, floor 4096 — bounding the spill-FILE count
    so merge-time readahead buffers stay constant; see the inline
    comment), so every returnflag partition (15k+ rows at sf0.01, 200k+
    at sf0.1) runs in EXTERNAL mode — Spark's ExternalAppendOnlyUnsafeRowArray
    spills the partition buffer to disk and streams it back. The
    `spilled` column is read from the engine's OWN task metrics
    (diagnostics.spill_bytes_recent walks the SQL status store's
    'spill size' per plan node), and the aggregate is integer-exact, so
    the oracle proves out-of-core execution changed NOTHING about the
    results — the operator's answer is the same whether state fits in
    memory or not, which is the property a 1000-executor job actually
    relies on when a skewed partition exceeds its executor's memory.
    tests/test_spill.py additionally pins spilled-vs-in-memory equality
    and >0 spill bytes; docs/SCALE.md records the measured spill sizes."""
    from pyspark.sql import Window

    from us_stock_data_pipeline_spark.diagnostics import spill_bytes_recent

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_quantity"
    )
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    agg = (
        li.withColumn("rq", F.sum(F.floor("l_quantity").cast("long")).over(w))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("rq").cast("long").alias("sum_running_qty"),
        )
        .orderBy("l_returnflag")
    )
    # Size the threshold so the spill-FILE count stays bounded (~16 per
    # partition) at ANY input scale: every open spill reader allocates
    # MB-scale readahead buffers at merge time, so a fixed small
    # threshold turns 10x data into 10x concurrently-open files and
    # OOMs a default-heap driver session (observed at sf0.1 under a
    # vanilla 1g session: 600k rows / 4096 = ~146 spill files per
    # partition). Spill BYTES still grow with data; file count doesn't.
    n_rows = li.count()
    threshold = str(max(4096, n_rows // 48))
    key_mem = "spark.sql.windowExec.buffer.in.memory.threshold"
    key_spill = "spark.sql.windowExec.buffer.spill.threshold"
    prev_mem = spark.conf.get(key_mem, None)
    prev_spill = spark.conf.get(key_spill, None)
    spark.conf.set(key_mem, threshold)
    spark.conf.set(key_spill, threshold)
    try:
        rows = agg.collect()
    finally:
        for key, prev in ((key_mem, prev_mem), (key_spill, prev_spill)):
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
    spilled = spill_bytes_recent(spark, last_n=4).get("Window", 0) > 0
    return spark.createDataFrame(rows, agg.schema).withColumn(
        "spilled", F.lit(bool(spilled))
    )


# --------------------------------------------------------------------------
# DESCRIBE HISTORY / RESTORE through the SQL front-end
# --------------------------------------------------------------------------

# v1 full write (one partition per distinct band), v2 rewrites bands
# 0-1, v3 = RESTORE TABLE ... TO VERSION AS OF 1. All history columns
# are closed-form except the partition counts, which derive from the
# distinct bands present in customer. The query returns `DESCRIBE
# HISTORY <name> LIMIT 2` (constant-cost interactive form): versions 2
# and 3 only — proving the limited walk reads just the recent tail.
_SQL_HIST_ORACLE = """
WITH bands AS (
  SELECT DISTINCT CAST(c_nationkey % 5 AS BIGINT) AS band FROM customer
),
n_bands AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM bands),
n_low AS (
  SELECT CAST(count(*) AS BIGINT) AS nl FROM bands WHERE band IN (0, 1)
)
SELECT v.version,
       (SELECT nb FROM n_bands) AS n_partitions,
       CASE WHEN v.version = 2 THEN (SELECT nl FROM n_low)
            ELSE CAST(0 AS BIGINT) END AS n_partitions_written,
       CAST(0 AS BIGINT) AS n_deletion_vectors,
       CASE WHEN v.version = 3 THEN CAST(1 AS BIGINT) END AS restored_from
FROM (VALUES (CAST(2 AS BIGINT)), (CAST(3 AS BIGINT))) AS v(version)
ORDER BY v.version
"""


@register(
    "etl_versioned_sql_history",
    oracle=_SQL_HIST_ORACLE,
    tags=("etl", "versioned", "sql"),
    round=12,
)
def etl_versioned_sql_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`DESCRIBE HISTORY <name> LIMIT n` and `RESTORE TABLE <name> TO
    VERSION AS OF n` through the SQL front-end (etl/vcatalog.py):
    metadata statements route to the manifest walks, and LIMIT makes
    the walk read ONLY the n most recent manifests — a table with ten
    thousand commits answers its interactive history query at the cost
    of n manifest reads, not ten thousand. RESTORE commits a new
    version pointing at the old snapshot and swings the registered
    view, exactly Delta's RESTORE semantics (history is preserved —
    version 3 records `restored_from = 1`)."""
    import shutil
    import tempfile
    import uuid as _uuid

    from us_stock_data_pipeline_spark.etl.vcatalog import (
        register_versioned,
        unregister_versioned,
        versioned_sql,
    )
    from us_stock_data_pipeline_spark.etl.versioned import versioned_merge_upsert

    base = (
        load_table(spark, sf_dir, "customer")
        .groupBy(
            F.col("c_nationkey").cast("long").alias("nk"),
            (F.col("c_nationkey") % 5).cast("long").alias("band"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("val"))
        # reused by every commit below: cache the per-nation rollup so
        # each staging write reads 25 cached rows, not customer (guide §5)
        .transform(registry.track_persist)
    )
    root = tempfile.mkdtemp(prefix=f"us_sdps_vhist_{_uuid.uuid4().hex[:8]}_")
    name = f"vhist_{_uuid.uuid4().hex[:8]}"
    try:
        versioned_merge_upsert(
            spark, base, root, key_cols=("nk",), partition_cols=("band",)
        )
        updates = base.filter(F.col("band").isin(0, 1)).withColumn(
            "val", F.col("val") + 1
        )
        versioned_merge_upsert(
            spark, updates, root, key_cols=("nk",), partition_cols=("band",)
        )
        register_versioned(spark, name, root)
        versioned_sql(spark, f"RESTORE TABLE {name} TO VERSION AS OF 1")
        out = versioned_sql(spark, f"DESCRIBE HISTORY {name} LIMIT 2").select(
            "version",
            "n_partitions",
            "n_partitions_written",
            "n_deletion_vectors",
            "restored_from",
        ).orderBy("version")
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        unregister_versioned(spark, name)
        shutil.rmtree(root, ignore_errors=True)


# --------------------------------------------------------------------------
# CDF stream -> foreachBatch MERGE: incremental mart maintenance loop
# --------------------------------------------------------------------------

# Final mart state after replaying the feed: base with bands 0-1
# incremented (v2), shifted inserts (v3), minus DV-deleted keys {0, 1}
# (v4). Note nk 0 and 1 are IN bands 0/1, so their incremented rows are
# deleted again — the oracle drops them from the updated set.
_CDF_MERGE_ORACLE = """
WITH base AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nk,
         CAST(c_nationkey % 5 AS BIGINT) AS band,
         CAST(count(*) AS BIGINT) AS n
  FROM customer GROUP BY 1, 2
),
final AS (
  SELECT nk, band,
         n + CASE WHEN band IN (0, 1) THEN 1 ELSE 0 END AS val
  FROM base WHERE nk NOT IN (0, 1)
  UNION ALL
  SELECT nk + 1000 AS nk, CAST(9 AS BIGINT) AS band, nk AS val FROM base
)
SELECT band,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(val) AS BIGINT) AS sum_val
FROM final
GROUP BY band
ORDER BY band
"""


@register(
    "stream_versioned_cdf_to_mart",
    oracle=_CDF_MERGE_ORACLE,
    tags=("streaming", "versioned"),
    round=12,
)
def stream_versioned_cdf_to_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE incremental-materialization loop (VERDICT r11 #3's
    production pattern): `readStream` over the versioned table's change
    feed -> `foreachBatch` applying each microbatch's NET change set
    (per key, the last change in version order wins — the standard
    CDC-MERGE dedup) to a downstream mart — inserts/updates via the
    versioned MERGE, deletes via a deletion-vector commit. The mart is
    seeded from the v1 snapshot, the stream replays v2..v4, and the
    mart's final state must equal the source's head snapshot exactly
    (the oracle recomputes it from `customer`). At 100 TB this is how a
    derived table tracks a base table without rescanning it: per
    microbatch, work is proportional to the CHANGED partitions only —
    manifest-diff planning upstream, partition-pruned MERGE downstream."""
    import shutil
    import tempfile
    import uuid as _uuid

    from us_stock_data_pipeline_spark.etl.cdf_stream import register_cdf_source
    from us_stock_data_pipeline_spark.etl.versioned import (
        read_versioned,
        versioned_delete,
        versioned_merge_upsert,
    )

    base = (
        load_table(spark, sf_dir, "customer")
        .groupBy(
            F.col("c_nationkey").cast("long").alias("nk"),
            (F.col("c_nationkey") % 5).cast("long").alias("band"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("val"))
        # reused by every commit below: cache the per-nation rollup so
        # each staging write reads 25 cached rows, not customer (guide §5)
        .transform(registry.track_persist)
    )
    src = tempfile.mkdtemp(prefix=f"us_sdps_cdfm_src_{_uuid.uuid4().hex[:8]}_")
    mart = tempfile.mkdtemp(prefix=f"us_sdps_cdfm_mart_{_uuid.uuid4().hex[:8]}_")
    try:
        versioned_merge_upsert(
            spark, base, src, key_cols=("nk",), partition_cols=("band",)
        )
        # seed the mart from the v1 snapshot (the one full copy ever made)
        versioned_merge_upsert(
            spark,
            read_versioned(spark, src, version=1),
            mart,
            key_cols=("nk",),
            partition_cols=("band",),
        )
        v2 = base.filter(F.col("band").isin(0, 1)).withColumn(
            "val", F.col("val") + 1
        )
        versioned_merge_upsert(
            spark, v2, src, key_cols=("nk",), partition_cols=("band",)
        )
        v3 = base.select(
            (F.col("nk") + 1000).alias("nk"),
            F.lit(9).cast("long").alias("band"),
            F.col("nk").alias("val"),
        )
        versioned_merge_upsert(
            spark, v3, src, key_cols=("nk",), partition_cols=("band",)
        )
        versioned_delete(
            spark,
            spark.createDataFrame([(0,), (1,)], "nk long"),
            src,
            key_cols=("nk",),
        )
        register_cdf_source(spark)
        feed = (
            spark.readStream.format("versioned_cdf")
            .option("path", src)
            .option("keycols", "nk")
            .option("tableschema", "nk long, band long, val long")
            .option("startingversion", "1")
            .load()
        )

        def apply_changes(batch, _epoch):
            # One microbatch may span several commits; the mart only
            # ever serves its FINAL snapshot, so apply the batch's NET
            # effect — per key the LAST change in version order wins
            # (the standard foreachBatch CDC-MERGE dedup): one MERGE
            # commit for keys whose last change is an upsert, one
            # DELETE commit for keys whose last change is a delete.
            # Bounded commits per microbatch instead of up to two per
            # source commit, and ONE action over the persisted batch
            # decides which commits are needed, replacing r13's
            # versions-collect + 2 isEmpty probes per commit (guide
            # §5; VERDICT r13 next-round #1). Equivalence: within a
            # commit a key appears at most once, so (nk, version) is
            # unique and row_number is deterministic; replaying
            # changes key-by-key in version order ends at exactly the
            # last change's post-state.
            from pyspark.sql import Window

            batch = batch.persist()
            try:
                w = Window.partitionBy("nk").orderBy(
                    F.col("_commit_version").desc()
                )
                last = (
                    batch.withColumn("_rn", F.row_number().over(w))
                    .filter(F.col("_rn") == 1)
                    .withColumn(
                        "_is_del", F.col("_change_type") == "delete"
                    )
                    .persist()
                )
                kinds = {
                    r[0] for r in last.select("_is_del").distinct().collect()
                }
                if False in kinds:
                    versioned_merge_upsert(
                        spark,
                        last.filter(~F.col("_is_del")).select(
                            "nk", "band", "val"
                        ),
                        mart,
                        key_cols=("nk",),
                        partition_cols=("band",),
                    )
                if True in kinds:
                    versioned_delete(
                        spark,
                        last.filter(F.col("_is_del")).select("nk"),
                        mart,
                        key_cols=("nk",),
                    )
                last.unpersist()
            finally:
                batch.unpersist()

        q = (
            feed.writeStream.foreachBatch(apply_changes)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        out = (
            read_versioned(spark, mart)
            .groupBy("band")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("val").cast("long").alias("sum_val"),
            )
            .orderBy("band")
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(mart, ignore_errors=True)


# --------------------------------------------------------------------------
# full DML through the SQL front-end
# --------------------------------------------------------------------------

_SQL_DML_ORACLE = """
WITH base AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nk,
         CAST(c_nationkey % 5 AS BIGINT) AS band,
         CAST(count(*) AS BIGINT) AS n
  FROM customer GROUP BY 1, 2
),
final AS (
  SELECT nk, band, n + CASE WHEN band = 2 THEN 5 ELSE 0 END AS val
  FROM base WHERE nk % 7 <> 0
  UNION ALL
  SELECT nk + 1000 AS nk, CAST(9 AS BIGINT) AS band, n AS val
  FROM base WHERE (nk + 1000) % 7 <> 0
)
SELECT band,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(val) AS BIGINT) AS sum_val
FROM final
GROUP BY band
ORDER BY band
"""


@register(
    "etl_versioned_sql_dml",
    oracle=_SQL_DML_ORACLE,
    tags=("etl", "versioned", "sql"),
    round=12,
)
def etl_versioned_sql_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full DML on the versioned table through plain SQL statements
    (etl/vcatalog.py round 12): ``INSERT INTO t (cols) SELECT ... FROM
    t`` (a MERGE commit — and a self-read, safe because the merge
    stages its input against the pre-commit snapshot before touching
    the manifest), ``UPDATE t SET val = val + 5 WHERE band = 2``
    (reads matching rows off the registered view, rewrites only their
    partitions), and ``DELETE FROM t WHERE nk % 7 = 0`` (a
    deletion-vector commit: kilobytes, zero data rewrite — at 100 TB
    the difference between a DELETE statement costing a table rewrite
    and costing a key-list upload). Every statement commits one
    version; `VERSION AS OF 1` still serves the pre-DML snapshot, so
    the audit trail survives the edits."""
    import shutil
    import tempfile
    import uuid as _uuid

    from us_stock_data_pipeline_spark.etl.vcatalog import (
        register_versioned,
        unregister_versioned,
        versioned_sql,
    )
    from us_stock_data_pipeline_spark.etl.versioned import versioned_merge_upsert

    base = (
        load_table(spark, sf_dir, "customer")
        .groupBy(
            F.col("c_nationkey").cast("long").alias("nk"),
            (F.col("c_nationkey") % 5).cast("long").alias("band"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("val"))
        # reused by every commit below: cache the per-nation rollup so
        # each staging write reads 25 cached rows, not customer (guide §5)
        .transform(registry.track_persist)
    )
    root = tempfile.mkdtemp(prefix=f"us_sdps_vdml_{_uuid.uuid4().hex[:8]}_")
    name = f"vdml_{_uuid.uuid4().hex[:8]}"
    try:
        versioned_merge_upsert(
            spark, base, root, key_cols=("nk",), partition_cols=("band",)
        )
        register_versioned(
            spark, name, root, key_cols=("nk",), partition_cols=("band",)
        )
        versioned_sql(
            spark,
            f"INSERT INTO {name} (nk, band, val) "
            f"SELECT nk + 1000, CAST(9 AS BIGINT), val FROM {name}",
        )
        versioned_sql(
            spark, f"UPDATE {name} SET val = val + 5 WHERE band = 2"
        )
        versioned_sql(spark, f"DELETE FROM {name} WHERE nk % 7 = 0")
        out = (
            spark.table(name)
            .groupBy("band")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("val").cast("long").alias("sum_val"),
            )
            .orderBy("band")
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        unregister_versioned(spark, name)
        shutil.rmtree(root, ignore_errors=True)


# --------------------------------------------------------------------------
# MERGE INTO through the SQL front-end
# --------------------------------------------------------------------------

# target: per-nation counts. source: every nation with val = n+10 for
# even nk / 0 for odd, plus shifted rows (nk+1000). Clause order:
#   WHEN MATCHED AND s.val > t.val THEN UPDATE SET *   (even nk)
#   WHEN MATCHED THEN DELETE                           (odd nk: 0 <= n)
#   WHEN NOT MATCHED THEN INSERT *                     (shifted rows)
_SQL_MERGE_ORACLE = """
WITH base AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nk,
         CAST(c_nationkey % 5 AS BIGINT) AS band,
         CAST(count(*) AS BIGINT) AS n
  FROM customer GROUP BY 1, 2
),
final AS (
  SELECT nk, band, n + 10 AS val FROM base WHERE nk % 2 = 0
  UNION ALL
  SELECT nk + 1000 AS nk, CAST(9 AS BIGINT) AS band, nk AS val FROM base
)
SELECT band,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(val) AS BIGINT) AS sum_val
FROM final
GROUP BY band
ORDER BY band
"""


@register(
    "etl_versioned_sql_merge_into",
    oracle=_SQL_MERGE_ORACLE,
    tags=("etl", "versioned", "sql"),
    round=12,
)
def etl_versioned_sql_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``MERGE INTO`` — the Delta workhorse statement — through the SQL
    front-end (etl/vcatalog.py `_merge_into`, round 12): conditional
    UPDATE SET *, fall-through DELETE, and INSERT * in ONE statement,
    first-applicable-clause-wins per source row. Execution is one left
    join evaluating matched-ness and every clause condition, then ONE
    merge commit for the update+insert rows (touched partitions only)
    and ONE deletion-vector commit for the delete keys — at 100 TB a
    MERGE's cost is the changed partitions plus a key-list upload,
    never a table rewrite. The ON clause is validated to be exactly
    the registered key equality (anything else would silently change
    upsert-by-key semantics and is rejected loudly)."""
    import shutil
    import tempfile
    import uuid as _uuid

    from us_stock_data_pipeline_spark.etl.vcatalog import (
        register_versioned,
        unregister_versioned,
        versioned_sql,
    )
    from us_stock_data_pipeline_spark.etl.versioned import versioned_merge_upsert

    base = (
        load_table(spark, sf_dir, "customer")
        .groupBy(
            F.col("c_nationkey").cast("long").alias("nk"),
            (F.col("c_nationkey") % 5).cast("long").alias("band"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("val"))
        # reused by every commit below: cache the per-nation rollup so
        # each staging write reads 25 cached rows, not customer (guide §5)
        .transform(registry.track_persist)
    )
    root = tempfile.mkdtemp(prefix=f"us_sdps_vmrg_{_uuid.uuid4().hex[:8]}_")
    name = f"vmrg_{_uuid.uuid4().hex[:8]}"
    src_view = f"vmrg_src_{_uuid.uuid4().hex[:8]}"
    try:
        versioned_merge_upsert(
            spark, base, root, key_cols=("nk",), partition_cols=("band",)
        )
        register_versioned(
            spark, name, root, key_cols=("nk",), partition_cols=("band",)
        )
        src = base.select(
            "nk",
            "band",
            F.when(F.col("nk") % 2 == 0, F.col("val") + 10)
            .otherwise(F.lit(0))
            .cast("long")
            .alias("val"),
        ).unionByName(
            base.select(
                (F.col("nk") + 1000).alias("nk"),
                F.lit(9).cast("long").alias("band"),
                F.col("nk").cast("long").alias("val"),
            )
        )
        src.createOrReplaceTempView(src_view)
        versioned_sql(
            spark,
            f"""
            MERGE INTO {name} AS t USING {src_view} AS s ON t.nk = s.nk
            WHEN MATCHED AND s.val > t.val THEN UPDATE SET *
            WHEN MATCHED THEN DELETE
            WHEN NOT MATCHED THEN INSERT *
            """,
        )
        out = (
            spark.table(name)
            .groupBy("band")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("val").cast("long").alias("sum_val"),
            )
            .orderBy("band")
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        spark.catalog.dropTempView(src_view)
        unregister_versioned(spark, name)
        shutil.rmtree(root, ignore_errors=True)
