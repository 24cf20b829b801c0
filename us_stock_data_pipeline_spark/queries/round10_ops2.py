"""Round-10 operators, part 2: the GEO/SPATIAL family — real geohash
base-32 encoding (bit-interleave subdivision, the storage/bucketing key
every geo pipeline shards on) and the grid-blocked spatial distance
join (candidate generation linear in points x 9 cells, never O(n^2)).

The fixtures carry no coordinates, so both queries synthesize a
deterministic planar point set from customer/supplier keys in integer
micro-degrees — closed-form, so the DuckDB oracles replay everything
exactly (geodesic wraparound/curvature is out of scope: the BUCKETING
and BLOCKING patterns, not geodesy, are the operators; a haversine
refinement slots into the final filter as one more expression).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# geo: geohash bucketing (base-32 of the lon/lat bit interleave)
# --------------------------------------------------------------------------

# Synthetic planar coordinates in integer micro-degrees:
#   lat_e6 = (key * 7919)   % 180e6 - 90e6   in [-90e6, 90e6)
#   lon_e6 = (key * 104729) % 360e6 - 180e6  in [-180e6, 180e6)
_LAT_E6 = "((CAST(({k}) AS BIGINT) * 7919) % 180000000 - 90000000)"
_LON_E6 = "((CAST(({k}) AS BIGINT) * 104729) % 360000000 - 180000000)"

_GH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _part1by1(x: str) -> str:
    """Bit spread (Morton part1by1) as a portable SQL fragment — same
    construction as etl_zorder_clustering (round8_ops.py), shared
    verbatim between the Spark plan and the DuckDB oracle."""
    e = f"({x})"
    for mul, mask in (
        (256, 16711935),
        (16, 252645135),
        (4, 858993459),
        (2, 1431655765),
    ):
        e = f"(({e} | ({e} * {mul})) & {mask})"
    return e


def _geohash25(key: str) -> str:
    """25-bit geohash integer (precision 5) of the synthetic point for
    `key`: standard geohash binary subdivision = 13 longitude bits at
    even positions (MSB = longitude), 12 latitude bits at odd — i.e.
    Morton(lon13, lat12), spread(x) + 2*spread(y)."""
    # Integer division written as CAST(floor(a / b) AS BIGINT): portable
    # to BOTH engines (Spark has no //, DuckDB / is float). Exact here:
    # non-negative operands far inside 2^53, and a non-exact quotient is
    # at least 1/b from any integer while the double ulp is ~1e-12, so
    # rounding can never cross the floor boundary.
    lon_bits = (
        f"CAST(floor(((({_LON_E6.format(k=key)}) + 180000000) * 8192)"
        f" / 360000000) AS BIGINT)"
    )
    lat_bits = (
        f"CAST(floor(((({_LAT_E6.format(k=key)}) + 90000000) * 4096)"
        f" / 180000000) AS BIGINT)"
    )
    return f"({_part1by1(lon_bits)} + 2 * {_part1by1(lat_bits)})"


def _geohash5_str(g25: str) -> str:
    """Base-32 string of a 25-bit geohash int: five 5-bit groups, MSB
    first, through the standard geohash alphabet (no a/i/l/o). substr
    is 1-based in BOTH Spark SQL and DuckDB."""
    chars = [
        f"substr('{_GH_ALPHABET}', CAST(floor(({g25}) / {1 << (20 - 5 * i)})"
        f" AS INTEGER) % 32 + 1, 1)"
        for i in range(5)
    ]
    return "(" + " || ".join(chars) + ")"


_GEOHASH_ORACLE = f"""
WITH pts AS (
  SELECT c_custkey, c_nationkey,
         {_geohash5_str(_geohash25('c_custkey'))} AS geohash5
  FROM customer
),
b AS (
  SELECT geohash5,
         CAST(count(*) AS BIGINT) AS n_points,
         CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
         CAST(min(c_custkey) AS BIGINT) AS min_key,
         CAST(sum(c_custkey) AS BIGINT) AS sum_keys
  FROM pts GROUP BY geohash5
)
SELECT geohash5, n_points, n_nations, min_key, sum_keys
FROM b
ORDER BY n_points DESC, geohash5
LIMIT 20
"""


@register("geo_geohash_bucket", oracle=_GEOHASH_ORACLE, tags=("geo", "scale"))
def geo_geohash_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEOHASH bucketing — the spatial shard key every geo pipeline
    stores/joins on (Uber H3's ancestor; geohash prefixes nest, so one
    string column serves every zoom level): REAL base-32 geohash,
    precision 5, computed as the standard binary subdivision = a
    Morton interleave of 13 longitude + 12 latitude bits (lon at the
    MSB, the geohash bit order) followed by five 5-bit groups through
    the 0-9b-z alphabet (no a/i/l/o). The bit spread is the same
    portable SQL fragment as etl_zorder_clustering, shared VERBATIM
    between the Spark plan (one F.expr, stays in whole-stage codegen —
    no UDF) and the DuckDB oracle; tests/test_geo_ops.py pins the
    encoding against the canonical (57.64911, 10.40744) -> 'u4pru'
    reference vector. Top-20 densest buckets with nation spread. Plan:
    one pushed scan, map-side hash agg on the bucket key, one
    exchange; at 100 TB the geohash column is what you'd PARTITION BY,
    making every bounding-box query a partition-pruned scan."""
    g5 = _geohash5_str(_geohash25("c_custkey"))
    return (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey", F.expr(g5).alias("geohash5"))
        .groupBy("geohash5")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.countDistinct("c_nationkey").cast("long").alias("n_nations"),
            F.min("c_custkey").cast("long").alias("min_key"),
            F.sum("c_custkey").cast("long").alias("sum_keys"),
        )
        .orderBy(F.desc("n_points"), "geohash5")
        .limit(20)
    )


# --------------------------------------------------------------------------
# geo: grid-blocked distance join (3x3 neighborhood candidates)
# --------------------------------------------------------------------------

_CELL_E6 = 1_000_000  # 1-degree grid cells
_R_E6 = 500_000  # query radius 0.5 degrees: R <= cell => 3x3 complete
_R2 = _R_E6 * _R_E6

_GRID_ORACLE = f"""
WITH cust AS (
  SELECT c_custkey AS ck,
         {_LAT_E6.format(k='c_custkey')} AS lat, {_LON_E6.format(k='c_custkey')} AS lon
  FROM customer
),
supp AS (
  SELECT s_suppkey AS sk, s_nationkey,
         {_LAT_E6.format(k='s_suppkey * 31 + 7')} AS lat,
         {_LON_E6.format(k='s_suppkey * 31 + 7')} AS lon
  FROM supplier
),
pairs AS (
  SELECT s.s_nationkey, s.sk,
         (s.lat - c.lat) * (s.lat - c.lat) + (s.lon - c.lon) * (s.lon - c.lon) AS d2
  FROM supp s JOIN cust c
    ON (s.lat - c.lat) * (s.lat - c.lat) + (s.lon - c.lon) * (s.lon - c.lon) <= {_R2}
)
SELECT CAST(s_nationkey AS BIGINT) AS nationkey,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT sk) AS BIGINT) AS n_suppliers_matched,
       CAST(min(d2) AS BIGINT) AS min_d2,
       CAST(sum(d2) AS BIGINT) AS sum_d2
FROM pairs
GROUP BY s_nationkey
ORDER BY nationkey
"""


@register("geo_grid_distance_join", oracle=_GRID_ORACLE, tags=("geo", "join", "scale"))
def geo_grid_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRID-BLOCKED spatial distance join — the pattern that makes
    "find everything within R" scale: snap points to a grid of
    cell >= R, explode ONE side into its 3x3 neighbor cells (candidate
    generation linear in points x 9, never the O(n^2) cross join the
    oracle runs), equi-join on the cell key, exact distance filter
    last. Radius 0.5 deg vs 1-deg cells guarantees the 3x3 neighborhood
    is COMPLETE (every pair within R shares or neighbors a cell), so
    the blocked join returns exactly the oracle's theta-join pairs —
    tests/test_geo_ops.py pins completeness on planted near pairs.
    Distances are exact BIGINT squared micro-degrees (planar synthetic
    space; a haversine refinement is one more expression in the final
    filter). Plan: two pushed scans, a 9x map-side explode of the
    smaller supplier side, one equi-exchange on the cell key, exact
    filter, hash agg — the same shape at any scale, and the cell key
    is what a 100 TB layout would bucket/partition by."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck"),
        F.expr(_LAT_E6.format(k="c_custkey")).alias("lat"),
        F.expr(_LON_E6.format(k="c_custkey")).alias("lon"),
    ).select(
        "ck", "lat", "lon",
        F.floor((F.col("lat") + 90_000_000) / _CELL_E6).alias("gy"),
        F.floor((F.col("lon") + 180_000_000) / _CELL_E6).alias("gx"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("sk"),
        "s_nationkey",
        F.expr(_LAT_E6.format(k="s_suppkey * 31 + 7")).alias("slat"),
        F.expr(_LON_E6.format(k="s_suppkey * 31 + 7")).alias("slon"),
    )
    # Explode the SMALLER side into its 3x3 neighborhood so the big
    # side is shuffled once on its own cell, un-replicated.
    neigh = supp.select(
        "sk", "s_nationkey", "slat", "slon",
        F.explode(
            F.expr(
                f"flatten(transform(sequence(-1, 1), dy -> "
                f"transform(sequence(-1, 1), dx -> struct("
                f"floor((slat + 90000000) / {_CELL_E6}) + dy AS gy, "
                f"floor((slon + 180000000) / {_CELL_E6}) + dx AS gx))))"
            )
        ).alias("cell"),
    ).select("sk", "s_nationkey", "slat", "slon", "cell.gy", "cell.gx")
    d2 = (F.col("slat") - F.col("lat")) * (F.col("slat") - F.col("lat")) + (
        F.col("slon") - F.col("lon")
    ) * (F.col("slon") - F.col("lon"))
    pairs = (
        neigh.join(cust, ["gy", "gx"])
        .select("sk", "s_nationkey", d2.alias("d2"))
        .filter(F.col("d2") <= _R2)
    )
    return (
        pairs.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.countDistinct("sk").cast("long").alias("n_suppliers_matched"),
            F.min("d2").cast("long").alias("min_d2"),
            F.sum("d2").cast("long").alias("sum_d2"),
        )
        .select(
            F.col("s_nationkey").cast("long").alias("nationkey"),
            "n_pairs",
            "n_suppliers_matched",
            "min_d2",
            "sum_d2",
        )
        .orderBy("nationkey")
    )


# --------------------------------------------------------------------------
# ETL: versioned-table BRANCH lifecycle (fork -> diverge -> merge back)
# --------------------------------------------------------------------------

_BR_ORACLE = """
WITH base AS (
  SELECT c_nationkey AS nk, c_nationkey % 5 AS band,
         CAST(count(*) AS BIGINT) AS n_cust,
         CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM customer GROUP BY c_nationkey
),
final AS (
  SELECT nk, band, n_cust,
         CASE WHEN band IN (0, 1) THEN cents * 2 + 1
              WHEN band IN (3, 4) THEN cents * 3 + 2
              ELSE cents END AS cents
  FROM base
)
SELECT CAST(band AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n_nations,
       CAST(sum(n_cust) AS BIGINT) AS n_cust,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM final
GROUP BY band
ORDER BY band
"""


@register(
    "etl_versioned_branch_merge",
    oracle=_BR_ORACLE,
    tags=("etl", "versioned", "scale"),
)
def etl_versioned_branch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VERSIONED-TABLE BRANCHES end to end — the Iceberg-refs / LakeFS
    "dev branch for a risky backfill" workflow on plain parquet
    (etl/versioned.py, round 10): (1) commit a per-nation aggregate
    table partitioned by nation band, (2) ``create_branch`` forks a
    ZERO-COPY writable branch (its manifest points into main's data
    pool; nothing is rewritten; the fork is vacuum-pinned by an
    internal tag), (3) the branch rewrites bands 0-1 while MAIN
    concurrently rewrites bands 3-4 — each invisible to the other
    (snapshot isolation both ways), (4) ``merge_branch`` overlays the
    branch's changed partitions onto main's head in one CAS commit,
    moving branch-written dirs into main's pool metadata-only; a
    same-partition divergence would raise BranchConflictError instead
    (tests/test_versioned.py pins conflicts, DV merges, fork-pin
    vacuum survival, and gap-tolerant history). The final state — branch
    changes + concurrent main changes + untouched band 2 — is verified
    against a closed-form oracle. At 100 TB every step here is
    metadata-bound: fork cost = one manifest copy, merge cost = one
    manifest publish + per-dir renames, zero data bytes copied."""
    import shutil
    import tempfile
    import uuid as _uuid

    from us_stock_data_pipeline_spark.etl.versioned import (
        _branch_root,
        create_branch,
        merge_branch,
        read_versioned,
        versioned_merge_upsert,
    )

    base = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cust"),
            F.sum(F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("cents"),
        )
        .select("nk", (F.col("nk") % 5).alias("band"), "n_cust", "cents")
    )
    root = tempfile.mkdtemp(prefix=f"us_sdps_branch_{_uuid.uuid4().hex[:8]}_")
    try:
        versioned_merge_upsert(
            spark, base, root, key_cols=("nk",), partition_cols=("band",)
        )
        create_branch(spark, root, "fix")
        broot = _branch_root(root, "fix")
        snap = read_versioned(spark, root)
        branch_updates = snap.filter(F.col("band").isin(0, 1)).select(
            "nk", "band", "n_cust", (F.col("cents") * 2 + 1).alias("cents")
        )
        versioned_merge_upsert(
            spark, branch_updates, broot, key_cols=("nk",), partition_cols=("band",)
        )
        main_updates = snap.filter(F.col("band").isin(3, 4)).select(
            "nk", "band", "n_cust", (F.col("cents") * 3 + 2).alias("cents")
        )
        versioned_merge_upsert(
            spark, main_updates, root, key_cols=("nk",), partition_cols=("band",)
        )
        merge_branch(spark, root, "fix")
        final = read_versioned(spark, root)
        out = (
            final.groupBy("band")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_nations"),
                F.sum("n_cust").cast("long").alias("n_cust"),
                F.sum("cents").cast("long").alias("sum_cents"),
            )
            .select(
                F.col("band").cast("long").alias("band"),
                "n_nations",
                "n_cust",
                "sum_cents",
            )
            .orderBy("band")
        )
        # Materialize before the tempdir vanishes: the returned frame
        # must not re-scan deleted files when the driver collects it.
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# --------------------------------------------------------------------------
# SQL scripting (Spark 4 BEGIN..END control flow)
# --------------------------------------------------------------------------

_SCRIPT_K = 1000  # keep doubling while at least this many orders remain

# Oracle: the WHILE loop's fixpoint in closed form. count(cents >= x) is
# non-increasing in x, so "double thr while count(>= thr*2) >= K"
# terminates at the largest power of two 2^m with count(>= 2^m) >= K
# (thr starts at 1 = 2^0; the fixture guarantees count(>= 2) >= K so the
# loop runs at least once and m >= 1).
_SCRIPT_ORACLE = f"""
WITH t AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders
),
js AS (SELECT unnest(generate_series(0, 62)) AS j),
c AS (
  SELECT j, (SELECT count(*) FROM t WHERE cents >= (CAST(1 AS BIGINT) << j)) AS n
  FROM js
),
m AS (SELECT max(j) AS m FROM c WHERE n >= {_SCRIPT_K})
SELECT CAST((CAST(1 AS BIGINT) << m.m) AS BIGINT) AS thr_cents,
       CAST(m.m AS BIGINT) AS n_doublings,
       CAST((SELECT n FROM c WHERE j = m.m) AS BIGINT) AS n_at_thr,
       CAST((SELECT n FROM c WHERE j = m.m + 1) AS BIGINT) AS n_above_double
FROM m
"""


@register("sql_scripting_control_flow", oracle=_SCRIPT_ORACLE, tags=("sql", "modern"))
def sql_scripting_control_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL SCRIPTING (Spark 4 ``BEGIN .. END``): procedural control flow
    — DECLARE'd session-scoped variables, a WHILE loop whose condition
    is a scalar subquery over the data, and SET reassignment — running
    entirely inside the SQL engine (the Databricks/ANSI SQL/PSM
    scripting surface; no driver-side Python loop). The script doubles
    a cents threshold while at least {_SCRIPT_K} orders still clear the
    doubled value — the classic "find the knee by geometric probing"
    maintenance script — and returns the fixpoint threshold, the
    doubling count, and the counts at/above it. The oracle computes the
    SAME fixpoint in closed form (count(>= x) is monotone, so the loop
    terminates at the largest power of two keeping >= K orders),
    proving the iteration semantics, not just syntax. Each loop
    iteration is one scan-count job; at 100 TB you'd layer this on the
    zone-mapped versioned table so each probe is metadata-pruned."""
    from us_stock_data_pipeline_spark.catalog import register_views

    register_views(spark, sf_dir, ["orders"])
    return spark.sql(f"""
      BEGIN
        DECLARE thr BIGINT DEFAULT 1;
        DECLARE n_doublings BIGINT DEFAULT 0;
        WHILE (SELECT count(*) FROM orders
               WHERE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) >= thr * 2)
              >= {_SCRIPT_K} DO
          SET thr = thr * 2;
          SET n_doublings = n_doublings + 1;
        END WHILE;
        SELECT thr AS thr_cents,
               n_doublings,
               (SELECT CAST(count(*) AS BIGINT) FROM orders
                WHERE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) >= thr)
                 AS n_at_thr,
               (SELECT CAST(count(*) AS BIGINT) FROM orders
                WHERE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) >= thr * 2)
                 AS n_above_double;
      END
    """)


# --------------------------------------------------------------------------
# UDTF: polymorphic (analyze-time dynamic schema) — Spark 4 extensibility
# --------------------------------------------------------------------------

_POLY_BUCKETS = 4

_POLY_ORACLE = f"""
WITH t AS (
  SELECT o_orderpriority AS pri,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
b AS (
  SELECT pri, cents,
         least(CAST(cents * {_POLY_BUCKETS} // (SELECT max(cents) + 1 FROM t) AS BIGINT),
               {_POLY_BUCKETS - 1}) AS bucket
  FROM t
)
SELECT pri,
       CAST(sum(CASE WHEN bucket = 0 THEN 1 ELSE 0 END) AS BIGINT) AS bucket_0,
       CAST(sum(CASE WHEN bucket = 1 THEN 1 ELSE 0 END) AS BIGINT) AS bucket_1,
       CAST(sum(CASE WHEN bucket = 2 THEN 1 ELSE 0 END) AS BIGINT) AS bucket_2,
       CAST(sum(CASE WHEN bucket = 3 THEN 1 ELSE 0 END) AS BIGINT) AS bucket_3
FROM b
GROUP BY pri
ORDER BY pri
"""


@register("udtf_polymorphic_histogram", oracle=_POLY_ORACLE, tags=("udf", "modern"))
def udtf_polymorphic_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 ``analyze()``): the table
    function's OUTPUT SCHEMA is computed at analysis time from its
    arguments — here a histogram UDTF whose bucket-count argument
    determines how many ``bucket_i`` columns exist (the static-
    returnType twin is ``udtf_installment_expand``; this is the dynamic
    half of the UDTF surface, the Spark-4 feature that lets one
    function serve any width). The UDTF buckets each row's cents value
    into k equal-width bins below a supplied max and emits one
    indicator row, aggregated per priority; the oracle replays the
    bucketing with integer CASE arithmetic. Scale note: the UDTF is a
    per-row map (no state, no skew); analysis-time schema work costs
    nothing at runtime."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import LongType, StructField, StructType

    from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult

    class BucketIndicator:
        @staticmethod
        def analyze(row: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            k = int(n.value)
            return AnalyzeResult(
                StructType(
                    [StructField("pri", row.dataType["pri"].dataType)]
                    + [StructField(f"bucket_{i}", LongType()) for i in range(k)]
                )
            )

        def eval(self, row, n: int):
            k = int(n)
            cents = row["cents"]
            mx = row["mx"]
            b = min(cents * k // (mx + 1), k - 1)
            yield tuple([row["pri"]] + [1 if i == b else 0 for i in range(k)])

    poly = udtf(BucketIndicator)
    spark.udtf.register("bucket_indicator", poly)

    from us_stock_data_pipeline_spark.catalog import register_views

    register_views(spark, sf_dir, ["orders"])
    return spark.sql(f"""
      WITH t AS (
        SELECT named_struct(
                 'pri', o_orderpriority,
                 'cents', CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT),
                 'mx', (SELECT max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                        FROM orders)
               ) AS row
        FROM orders
      )
      SELECT pri,
             {", ".join(f"CAST(sum(bucket_{i}) AS BIGINT) AS bucket_{i}" for i in range(_POLY_BUCKETS))}
      FROM t, LATERAL bucket_indicator(row, {_POLY_BUCKETS})
      GROUP BY pri
      ORDER BY pri
    """)


# --------------------------------------------------------------------------
# multimodal: ADAM7-interlaced PNG decode (completes the PNG rung)
# --------------------------------------------------------------------------

_A7_W = 10  # deliberately NOT multiples of 8: partial Adam7 passes
_A7_H = 6

_ADAM7_ORACLE = f"""
WITH ids AS (
  SELECT doc_id, source FROM documents WHERE doc_id % 29 = 0
),
xs AS (SELECT unnest(range(0, {_A7_W})) AS x),
ys AS (SELECT unnest(range(0, {_A7_H})) AS y),
px AS (
  SELECT i.doc_id, i.source,
         (i.doc_id * 7 + xs.x * 13 + ys.y * 17) % 256 AS r,
         (i.doc_id * 11 + xs.x * 3 + ys.y * 5) % 256 AS g,
         (i.doc_id * 13 + xs.x * 19 + ys.y * 23) % 256 AS b
  FROM ids i CROSS JOIN xs CROSS JOIN ys
)
SELECT source,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_imgs,
       CAST(count(*) AS BIGINT) AS n_pixels,
       CAST(sum(r) AS BIGINT) AS sum_r,
       CAST(sum(g) AS BIGINT) AS sum_g,
       CAST(sum(b) AS BIGINT) AS sum_b
FROM px
GROUP BY source
ORDER BY source
"""


@register(
    "multimodal_png_adam7_decode",
    oracle=_ADAM7_ORACLE,
    tags=("llm", "multimodal", "udf"),
)
def multimodal_png_adam7_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADAM7-INTERLACED PNG decode — the progressive layout real web
    PNGs carry (and the previously-unsupported half of the PNG rung:
    `multimodal_png_decode` covers interlace 0): every 29th document
    gets a 10x6 RGB card (deliberately NOT a multiple of 8, so several
    of the seven passes are PARTIAL and the 1-px-wide passes hit the
    left-edge filter boundary) encoded as a real interlace-1 PNG —
    seven independently filtered sub-images in the standard pass grid,
    each cycling all five PNG filters — and ``decode_png``
    (functions/multimodal.py) inflates once, unfilters per pass, and
    scatters each pass into the output grid. Interlacing is a lossless
    REORDERING, so the oracle is the same closed-form pixel enumeration
    as the sequential card. Plan: one scan, one Arrow encode stage, one
    Arrow decode stage, one rollup."""
    import pandas as pd

    from us_stock_data_pipeline_spark.functions.multimodal import (
        encode_png,
        png_decode_batch,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 29 == 0)
        .select("doc_id", "source")
    )

    def encode_batch(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "source": pdf["source"],
                    "payload": [
                        encode_png(int(d), _A7_W, _A7_H, interlace=True)
                        for d in pdf["doc_id"]
                    ],
                }
            )

    def decode_with_source(batches):
        for pdf in batches:
            src = pdf[["doc_id", "source"]]
            for out in png_decode_batch(iter([pdf[["doc_id", "payload"]]])):
                yield out.merge(src, on="doc_id", how="left")

    blobs = docs.mapInPandas(
        encode_batch, "doc_id long, source string, payload binary"
    )
    decoded = blobs.mapInPandas(
        decode_with_source,
        "doc_id long, width long, height long, sum_r long, sum_g long,"
        " sum_b long, source string",
    )
    return (
        decoded.groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_imgs"),
            F.sum(F.col("width") * F.col("height")).cast("long").alias("n_pixels"),
            F.sum("sum_r").cast("long").alias("sum_r"),
            F.sum("sum_g").cast("long").alias("sum_g"),
            F.sum("sum_b").cast("long").alias("sum_b"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# multimodal: audio FEATURE EXTRACTION — Walsh-Hadamard band energies
# --------------------------------------------------------------------------

_WHT_N = 64
_WHT_STRIDE = 31

_WHT_ORACLE = f"""
WITH ids AS (
  SELECT doc_id, source FROM documents WHERE doc_id % {_WHT_STRIDE} = 0
),
t AS (SELECT unnest(generate_series(0, {_WHT_N - 1})) AS t),
k AS (SELECT unnest(generate_series(0, {_WHT_N - 1})) AS k),
s AS (
  SELECT i.doc_id, i.source, t.t,
         (i.doc_id * 31 + t.t * 97) % 2001 - 1000 AS s
  FROM ids i CROSS JOIN t
),
c AS (
  SELECT s.doc_id, s.source, k.k,
         sum(s.s * (1 - 2 * (bit_count(CAST(k.k AS BIGINT) & CAST(s.t AS BIGINT)) % 2))) AS c
  FROM s CROSS JOIN k
  GROUP BY s.doc_id, s.source, k.k
),
e AS (
  SELECT doc_id, source,
         sum(CASE WHEN k < {_WHT_N // 4} THEN c * c ELSE 0 END) AS e0,
         sum(CASE WHEN k >= {_WHT_N // 4} AND k < {_WHT_N // 2} THEN c * c ELSE 0 END) AS e1,
         sum(CASE WHEN k >= {_WHT_N // 2} AND k < {3 * _WHT_N // 4} THEN c * c ELSE 0 END) AS e2,
         sum(CASE WHEN k >= {3 * _WHT_N // 4} THEN c * c ELSE 0 END) AS e3
  FROM c GROUP BY doc_id, source
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_clips,
       CAST(sum(e0) AS BIGINT) AS e_band0,
       CAST(sum(e1) AS BIGINT) AS e_band1,
       CAST(sum(e2) AS BIGINT) AS e_band2,
       CAST(sum(e3) AS BIGINT) AS e_band3,
       CAST(0 AS BIGINT) AS parseval_gap
FROM e
GROUP BY source
ORDER BY source
"""


@register(
    "multimodal_audio_hadamard_features",
    oracle=_WHT_ORACLE,
    tags=("llm", "multimodal", "udf"),
)
def multimodal_audio_hadamard_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio FEATURE EXTRACTION — the stage between decode and model
    input: every {_WHT_STRIDE}th document's PCM16 WAV clip is decoded
    and passed through a fast WALSH-HADAMARD transform (a real DSP
    transform whose ±1 basis makes band energies EXACT integers, so the
    full decode -> transform -> band-energy pipeline is bit-verifiable
    — the property an FFT spectrogram can't give an oracle), emitting 4
    sequency-band energies per clip plus an in-kernel PARSEVAL witness
    (sum of squared coefficients must equal N x signal energy; the
    hashed column pins it to zero, so a transform regression flips the
    hash, not just a log line). The oracle replays the transform as the
    explicit (-1)^popcount(k AND t) matrix via bit_count parity — the
    kernel's O(N log N) butterfly must match the O(N^2) definition
    exactly. Plan: one scan, one Arrow encode stage, one Arrow
    transform stage (vectorized across the batch), one rollup."""
    import pandas as pd

    from us_stock_data_pipeline_spark.functions.multimodal import (
        encode_wav_pcm16,
        wav_hadamard_batch,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % _WHT_STRIDE == 0)
        .select("doc_id", "source")
    )

    def encode_batch(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "source": pdf["source"],
                    "payload": [encode_wav_pcm16(int(d), _WHT_N) for d in pdf["doc_id"]],
                }
            )

    def features_with_source(batches):
        for pdf in batches:
            src = pdf[["doc_id", "source"]]
            for out in wav_hadamard_batch(iter([pdf[["doc_id", "payload"]]])):
                yield out.merge(src, on="doc_id", how="left")

    blobs = docs.mapInPandas(
        encode_batch, "doc_id long, source string, payload binary"
    )
    feats = blobs.mapInPandas(
        features_with_source,
        "doc_id long, e_band0 long, e_band1 long, e_band2 long,"
        " e_band3 long, parseval_gap long, source string",
    )
    return (
        feats.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clips"),
            F.sum("e_band0").cast("long").alias("e_band0"),
            F.sum("e_band1").cast("long").alias("e_band1"),
            F.sum("e_band2").cast("long").alias("e_band2"),
            F.sum("e_band3").cast("long").alias("e_band3"),
            F.sum(F.abs(F.col("parseval_gap"))).cast("long").alias("parseval_gap"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# tokenizer: BPE ENCODE (greedy merge-table inference)
# --------------------------------------------------------------------------

# Ordered merge table. Each merge rewrites a 2-symbol pair to ONE fresh
# symbol (Greek letters — absent from the ASCII fixture text), so after
# every step each token is exactly one codepoint and length() IS the
# token count. Greedy leftmost non-overlapping replacement is exactly
# BPE inference, and replace() has those semantics in BOTH engines.
_BPE_MERGES = (
    ("th", "θ"),
    ("θe", "Θ"),  # 'the'
    ("in", "ι"),
    ("an", "α"),
    ("er", "ε"),
    ("re", "ρ"),
    ("on", "ο"),
    ("αd", "Δ"),  # 'and'
    ("or", "ω"),
    ("at", "τ"),
)


def _bpe_chain(col: str) -> str:
    """The merge chain as ONE SQL fragment shared verbatim by the Spark
    plan and the DuckDB oracle: replace(replace(... lower(col) ...))."""
    e = f"lower({col})"
    for pair, sym in _BPE_MERGES:
        e = f"replace({e}, '{pair}', '{sym}')"
    return e


_BPE_ORACLE = f"""
WITH t AS (
  SELECT lang,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length({_bpe_chain('text')}) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(sum(n_chars - n_tokens) AS BIGINT) AS merges_applied,
       CAST(sum(n_tokens) * 10000 // sum(n_chars) AS BIGINT) AS compression_e4
FROM t
GROUP BY lang
ORDER BY lang
"""


@register("tokenizer_bpe_encode", oracle=_BPE_ORACLE, tags=("llm", "tokenizer", "text"))
def tokenizer_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODE — actual tokenizer INFERENCE, not just pair counting
    (`text_bpe_pair_counts` is the training half): apply an ordered
    merge table greedily to every document and measure the resulting
    token counts. The encoding trick that makes this exactly
    SQL-expressible: every merge output is ONE fresh codepoint, so at
    each stage a token is exactly one character, greedy leftmost
    non-overlapping `replace` IS the BPE merge step (e.g. 'lll' with
    merge ll->Λ gives 'Λl', never 'lΛ'), and `length()` after the chain
    is the token count. The whole encoder is one codegen-resident
    expression tree (no UDF, no shuffle before the final rollup) shared
    VERBATIM with the oracle. Emits per-language doc counts, chars,
    tokens, merges applied, and the compression ratio in e4 fixed-point
    — the fertility/compression readout a tokenizer-ablation pipeline
    compares across candidate merge tables. At 100 TB: a map-side
    expression over the text column; cost is one scan."""
    from us_stock_data_pipeline_spark.catalog import register_views

    register_views(spark, sf_dir, ["documents"])
    return spark.sql(f"""
      WITH t AS (
        SELECT lang,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(length({_bpe_chain('text')}) AS BIGINT) AS n_tokens
        FROM documents
      )
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
             CAST(sum(n_chars - n_tokens) AS BIGINT) AS merges_applied,
             CAST(sum(n_tokens) * 10000 div sum(n_chars) AS BIGINT) AS compression_e4
      FROM t
      GROUP BY lang
      ORDER BY lang
    """)


# --------------------------------------------------------------------------
# geo: point-in-polygon (integer ray casting, shared fragment)
# --------------------------------------------------------------------------

# A deliberately NON-CONVEX test polygon in micro-degrees (an arrow/
# chevron shape spanning a quarter of the synthetic domain), vertices
# counter-clockwise. Integer coordinates make every crossing test an
# exact BIGINT cross product — no epsilons, no floats.
_PIP_POLY = (
    (-90_000_000, -45_000_000),
    (0, -60_000_000),
    (90_000_000, -45_000_000),
    (60_000_000, 0),
    (90_000_000, 45_000_000),
    (0, 20_000_000),
    (-90_000_000, 45_000_000),
    (-60_000_000, 0),
)


def _pip_count(px: str, py: str) -> str:
    """Ray-casting crossing count as one shared SQL fragment: for each
    polygon edge, the horizontal ray from (px, py) crosses iff the edge
    spans the ray's level (half-open: y1 <= py XOR y2 <= py, which
    handles vertex-level points consistently) and the exact integer
    cross product places the intersection strictly right of px."""
    terms = []
    n = len(_PIP_POLY)
    for i in range(n):
        x1, y1 = _PIP_POLY[i]
        x2, y2 = _PIP_POLY[(i + 1) % n]
        cross = f"(({x2} - {x1}) * (({py}) - {y1}) - (({px}) - {x1}) * ({y2} - {y1}))"
        side = f"{cross} > 0" if y2 > y1 else f"{cross} < 0"
        terms.append(
            f"CASE WHEN (({y1} <= ({py})) <> ({y2} <= ({py}))) AND ({side})"
            f" THEN 1 ELSE 0 END"
        )
    return "(" + " + ".join(terms) + ")"


_PIP_ORACLE = f"""
WITH pts AS (
  SELECT c_custkey, c_nationkey,
         {_LON_E6.format(k='c_custkey')} AS px,
         {_LAT_E6.format(k='c_custkey')} AS py
  FROM customer
),
flagged AS (
  SELECT c_custkey, c_nationkey,
         ({_pip_count('px', 'py')}) % 2 AS inside
  FROM pts
)
SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
       CAST(count(*) AS BIGINT) AS n_points,
       CAST(sum(inside) AS BIGINT) AS n_inside,
       CAST(sum(CASE WHEN inside = 1 THEN c_custkey ELSE 0 END) AS BIGINT)
         AS sum_inside_keys
FROM flagged
GROUP BY c_nationkey
ORDER BY nationkey
"""


@register("geo_point_in_polygon", oracle=_PIP_ORACLE, tags=("geo", "scale"))
def geo_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-POLYGON — the geofence predicate (is this point inside
    the delivery zone / jurisdiction / crawl region): classic ray
    casting against a NON-CONVEX 8-vertex polygon, with every crossing
    test an EXACT BIGINT cross product (integer micro-degree
    coordinates mean no epsilon, no float divergence — the same
    robustness trick real geometry engines buy with adaptive-precision
    arithmetic). The half-open vertex rule (y1 <= py XOR y2 <= py)
    counts a vertex-level crossing exactly once. The whole classifier
    unrolls to one codegen-resident expression (8 CASE terms) shared
    VERBATIM with the oracle; tests/test_geo_ops.py pins it against an
    independent matplotlib-free winding implementation plus hand-placed
    inside/outside/notch points. Per-nation containment counts. At
    100 TB: a map-side expression — and composed with
    `geo_geohash_bucket`, the polygon's covering geohash set turns this
    scan into a partition-pruned one."""
    pip = _pip_count("px", "py")
    return (
        load_table(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            "c_nationkey",
            F.expr(_LON_E6.format(k="c_custkey")).alias("px"),
            F.expr(_LAT_E6.format(k="c_custkey")).alias("py"),
        )
        .select(
            "c_custkey",
            "c_nationkey",
            (F.expr(pip) % 2).alias("inside"),
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.sum("inside").cast("long").alias("n_inside"),
            F.sum(F.when(F.col("inside") == 1, F.col("c_custkey")).otherwise(0))
            .cast("long")
            .alias("sum_inside_keys"),
        )
        .select(
            F.col("c_nationkey").cast("long").alias("nationkey"),
            "n_points",
            "n_inside",
            "sum_inside_keys",
        )
        .orderBy("nationkey")
    )
