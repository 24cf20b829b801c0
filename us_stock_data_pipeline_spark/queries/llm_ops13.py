"""Round-6 LLM-pipeline additions, part 13: PCA top principal
component by power iteration over an exact integer covariance matrix.

The companion to `embedding_effective_dim` (which measures HOW MANY
directions matter) — this extracts the dominant direction itself, the
building block for PCA whitening, embedding drift monitoring, and
Matryoshka-style dimension ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.registry import register

_DIMS = 64
_PCA_ITERS = 3
_PCA_SCALE = 100  # component quantization: round(x*100), |x| < 0.6 -> |q| <= 60


def _pca_iter_sql(vprev: str, k: int) -> str:
    """One power-iteration step: multiply the exact-int scaled covariance
    by the quantized vector, then renormalize to +-10000 via one double
    division (floor(x+0.5) half-up, engine-neutral)."""
    return f"""
raw{k} AS (
  SELECT c.d1 AS d, sum(c.cv * v.v) AS raw
  FROM cmat c JOIN {vprev} v ON c.d2 = v.d
  GROUP BY c.d1
),
m{k} AS (SELECT max(abs(raw)) AS m FROM raw{k}),
v{k} AS (
  SELECT d, CAST(floor(CAST(raw AS DOUBLE) / CAST(m.m AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS v
  FROM raw{k}, m{k} m
)"""


_PCA_ORACLE = f"""
WITH pts AS (
  SELECT vec_id, dims.d,
         CAST(round(CAST(embedding[dims.d] AS DOUBLE) * {_PCA_SCALE}) AS BIGINT) AS x
  FROM embeddings, (SELECT unnest(range(1, {_DIMS + 1})) AS d) dims
),
sums AS (
  SELECT d, CAST(sum(x) AS BIGINT) AS sx FROM pts GROUP BY d
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
sxy AS (
  SELECT a.d AS d1, b.d AS d2, CAST(sum(a.x * b.x) AS BIGINT) AS sxy
  FROM pts a JOIN pts b USING (vec_id)
  GROUP BY a.d, b.d
),
cmat AS (
  -- n*Sxy - Sx*Sy: the covariance matrix scaled by n^2, exact int64
  SELECT s.d1, s.d2, nn.n * s.sxy - sa.sx * sb.sx AS cv
  FROM sxy s
  JOIN sums sa ON sa.d = s.d1
  JOIN sums sb ON sb.d = s.d2
  CROSS JOIN nn
),
v0 AS (SELECT d, CAST(10000 AS BIGINT) AS v FROM sums),
{','.join(_pca_iter_sql(f'v{k - 1}' if k > 1 else 'v0', k) for k in range(1, _PCA_ITERS + 1))}
SELECT CAST(d AS BIGINT) AS dim, v / 10000.0 AS loading
FROM v{_PCA_ITERS}
ORDER BY dim
"""


@register("embedding_pca_power_iteration", oracle=_PCA_ORACLE, tags=("llm", "embedding", "ml"))
def embedding_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding corpus by 3-step power
    iteration — run ENTIRELY in exact arithmetic except one
    renormalizing division per step. The covariance matrix is carried
    n^2-scaled (C = n*Sxy - Sx*Sy, exact int64 from quantized
    components), the iterate is re-quantized to +-1e4 after each
    multiply, so the matrix-vector products — the accumulations that
    steer convergence — can never drift between engines; the same
    no-float-mean trick as `timeseries_acf`, lifted to matrices.
    Plan shape: ONE corpus pass builds Sxy via a per-vector self-join
    on the dim explosion (at 100 TB this becomes a mapInPandas in-row
    outer product straight into the same (d1, d2) groupBy — identical
    shuffle, dims^2-sized output); after that every iteration touches
    only the dims^2 = 4096-row matrix and a 64-row vector — driver-free
    broadcast joins of sketch-sized state, the shrink-then-iterate
    discipline of `graph_pagerank_trade`. At larger n the int64
    product headroom (|C|*1e4*dims < 2^63 up to n~2e4 at this scale
    factor) promotes to DECIMAL(38,0) with no other change."""
    emb = load_table(spark, sf_dir, "embeddings")
    pts = (
        emb.select("vec_id", F.posexplode("embedding").alias("d", "val"))
        .select(
            "vec_id",
            "d",
            F.round(F.col("val").cast("double") * _PCA_SCALE).cast("long").alias("x"),
        )
        .transform(registry.track_persist)
    )
    sums = pts.groupBy("d").agg(F.sum("x").cast("long").alias("sx"))
    nn = emb.agg(F.count(F.lit(1)).cast("long").alias("n"))
    a, b = pts.alias("a"), pts.alias("b")
    sxy = (
        a.join(b, "vec_id")
        .groupBy(F.col("a.d").alias("d1"), F.col("b.d").alias("d2"))
        .agg(F.sum(F.col("a.x") * F.col("b.x")).cast("long").alias("sxy"))
    )
    sa = sums.select(F.col("d").alias("d1"), F.col("sx").alias("sx1"))
    sb = sums.select(F.col("d").alias("d2"), F.col("sx").alias("sx2"))
    cmat = (
        sxy.join(F.broadcast(sa), "d1")
        .join(F.broadcast(sb), "d2")
        .crossJoin(F.broadcast(nn))
        .select(
            "d1",
            "d2",
            (F.col("n") * F.col("sxy") - F.col("sx1") * F.col("sx2")).alias("cv"),
        )
        .transform(registry.track_persist)
    )
    v = sums.select("d", F.lit(10000).cast("long").alias("v"))
    for _ in range(_PCA_ITERS):
        raw = (
            cmat.join(F.broadcast(v.withColumnRenamed("d", "d2")), "d2")
            .groupBy(F.col("d1").alias("d"))
            .agg(F.sum(F.col("cv") * F.col("v")).alias("raw"))
        )
        m = raw.agg(F.max(F.abs(F.col("raw"))).alias("m"))
        v = raw.crossJoin(F.broadcast(m)).select(
            "d",
            F.floor(
                F.col("raw").cast("double") / F.col("m").cast("double") * 10000 + F.lit(0.5)
            )
            .cast("long")
            .alias("v"),
        )
    # +1: the oracle's dim ids are 1-based (DuckDB list indexing); keep
    # the public column identical on both sides
    return v.select(
        (F.col("d") + 1).cast("long").alias("dim"), (F.col("v") / 10000.0).alias("loading")
    ).orderBy("dim")
