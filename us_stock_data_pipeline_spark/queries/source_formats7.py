"""Round-49 sources, part 7: recursive file lookup over nested landing
directories, and the explicit null-ordering pin.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register
from us_stock_data_pipeline_spark.session import ensure_session_confs

# --------------------------------------------------------------------------
# Recursive file lookup
# --------------------------------------------------------------------------

_RECURSE_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("source_recursive_lookup", oracle=_RECURSE_ORACLE, tags=("source",))
def source_recursive_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recursiveFileLookup over an ARBITRARILY NESTED landing tree
    (vendor drops arrive as dated/nested folders, not a flat dir or a
    hive layout): the option walks every subdirectory WITHOUT
    interpreting path segments as partition columns — the opposite
    trade from `source_partitioned_scan`, where the layout IS the
    schema. The fixture stages events into a 3-deep unpredictable
    tree; the rollup must equal the flat-table oracle exactly,
    proving no file is missed or double-read. At 100 TB the listing
    itself is the cost — recursive listing is driver-side by default,
    which is WHY production prefers a partition-aware layout or a
    manifest; this op is the escape hatch for trees you don't
    control."""
    ensure_session_confs(spark)
    src = os.path.join(sf_dir, "events.parquet")
    base = os.path.join(
        tempfile.gettempdir(),
        "us_sdps_recurse",
        hashlib.sha1(sf_dir.encode()).hexdigest()[:12],
    )
    marker = os.path.join(base, "_staged_ok")
    src_stat = os.stat(src)
    if not (
        os.path.exists(marker) and os.stat(marker).st_mtime >= src_stat.st_mtime
    ):
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "event_type", "value"
        )
        # an uneven nested tree: depth varies per branch
        for i, path in enumerate(
            ("a/2024/01", "a/2024/02/week1", "b/misc", "b/misc/deep/deeper")
        ):
            ev.filter(F.col("event_id") % 4 == i).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(base, "tree", path))
        with open(marker, "w") as fh:
            fh.write("ok")
    landed = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(os.path.join(base, "tree"))
    )
    return (
        landed.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("total_cents"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Explicit null-ordering pin
# --------------------------------------------------------------------------

_NULLORD_ORACLE = """
WITH scored AS (
  SELECT c_custkey,
         CASE WHEN c_acctbal < 0 THEN NULL
              ELSE CAST(round(c_acctbal * 100) AS BIGINT) END AS pos_bal
  FROM customer
)
SELECT c_custkey, pos_bal,
       row_number() OVER (ORDER BY pos_bal ASC NULLS LAST, c_custkey) AS rank_nl,
       row_number() OVER (ORDER BY pos_bal ASC NULLS FIRST, c_custkey) AS rank_nf
FROM scored
ORDER BY c_custkey
LIMIT 200
"""


@register("sort_null_ordering_pin", oracle=_NULLORD_ORACLE, tags=("sql", "window"))
def sort_null_ordering_pin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS FIRST / NULLS LAST pin — the cross-engine trap
    this repo's oracle discipline exists for: Spark's ASC default is
    NULLS FIRST, DuckDB's is NULLS LAST, so any ranking over a
    nullable key that omits the modifier silently permutes rows
    between engines (and between any two SQL engines a migration
    spans). Both rankings are computed with the modifier SPELLED OUT,
    plus a unique tiebreak — the two rules every portable ORDER BY
    needs. Negative balances are nulled to create a real null
    population. The two rank columns differ by exactly the null-count
    offset, which the test asserts."""
    scored = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, None)
        .otherwise(F.round(F.col("c_acctbal") * 100).cast("long"))
        .alias("pos_bal"),
    )
    from pyspark.sql import Window

    w_nl = Window.orderBy(F.col("pos_bal").asc_nulls_last(), "c_custkey")
    w_nf = Window.orderBy(F.col("pos_bal").asc_nulls_first(), "c_custkey")
    return (
        scored.select(
            "c_custkey",
            "pos_bal",
            F.row_number().over(w_nl).alias("rank_nl"),
            F.row_number().over(w_nf).alias("rank_nf"),
        )
        .orderBy("c_custkey")
        .limit(200)
    )
