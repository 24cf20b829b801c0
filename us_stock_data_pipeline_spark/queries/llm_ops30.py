"""Round-44 LLM ops, part 30: REAL multimodal transform — 2x2
average-pool downsampling on the live PPM decode path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

_PPM_W = 8
_PPM_H = 8

# The encoder's channels are affine-mod-256 in (doc_id, x, y)
# (functions/multimodal.py:encode_ppm); the oracle enumerates the 64
# pixels, average-pools each 2x2 block with floor division, and sums the
# pooled channels — the bit-exact expectation for what the REAL
# decode -> pool kernel must produce from the bytes.
_POOL_ORACLE = f"""
WITH ids AS (
  SELECT doc_id, source FROM documents WHERE doc_id % 7 = 0
),
grid AS (
  SELECT x.x, y.y
  FROM (SELECT unnest(generate_series(0, {_PPM_W - 1})) AS x) x
  CROSS JOIN (SELECT unnest(generate_series(0, {_PPM_H - 1})) AS y) y
),
pixels AS (
  SELECT i.doc_id, i.source, g.x // 2 AS px, g.y // 2 AS py,
         (i.doc_id * 7 + g.x * 13 + g.y * 17) % 256 AS r,
         (i.doc_id * 11 + g.x * 3 + g.y * 5) % 256 AS gch,
         (i.doc_id * 13 + g.x * 19 + g.y * 23) % 256 AS b
  FROM ids i CROSS JOIN grid g
),
pooled AS (
  SELECT doc_id, source, px, py,
         CAST(sum(r) // 4 AS BIGINT) AS pr,
         CAST(sum(gch) // 4 AS BIGINT) AS pg,
         CAST(sum(b) // 4 AS BIGINT) AS pb
  FROM pixels GROUP BY doc_id, source, px, py
)
SELECT source,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_images,
       CAST(sum(pr) AS BIGINT) AS pooled_sum_r,
       CAST(sum(pg) AS BIGINT) AS pooled_sum_g,
       CAST(sum(pb) AS BIGINT) AS pooled_sum_b
FROM pooled
GROUP BY source
ORDER BY source
"""


@register("multimodal_ppm_downsample", oracle=_POOL_ORACLE, tags=("llm", "multimodal", "udf"))
def multimodal_ppm_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image TRANSFORM on the live codec path: encode the test
    cards as binary PPM, ship Arrow batches through mapInPandas,
    decode with pure numpy, 2x2 AVERAGE-POOL each image (floor
    division — the integer semantics both sides pin), and roll up the
    pooled channel sums — a true decode -> transform -> verify cycle,
    extending `multimodal_ppm_decode` from "can read bytes" to "can
    compute on pixels" (the resize/thumbnail stage every vision-data
    pipeline runs; a JPEG pipeline plugs its codec into the SAME
    kernel). The oracle enumerates the encoder's affine pixels and
    pools them in SQL, so the numpy pooling is verified bit-exactly
    against what the bytes must contain. Payload bytes never visit
    the driver."""
    import numpy as np
    import pandas as pd

    from us_stock_data_pipeline_spark.functions.multimodal import (
        decode_ppm,
        encode_ppm,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 7 == 0)
        .select("doc_id", "source")
    )

    def encode_batch(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "source": pdf["source"],
                    "payload": [
                        encode_ppm(int(d), _PPM_W, _PPM_H) for d in pdf["doc_id"]
                    ],
                }
            )

    def pool_batch(batches):
        for pdf in batches:
            out = {"doc_id": [], "source": [], "pr": [], "pg": [], "pb": []}
            for doc_id, source, payload in zip(
                pdf["doc_id"], pdf["source"], pdf["payload"]
            ):
                img = decode_ppm(bytes(payload)).astype(np.int64)
                h, w, _ = img.shape
                # 2x2 average pool with floor division, exactly as the
                # SQL oracle floors the block sums
                pooled = (
                    img.reshape(h // 2, 2, w // 2, 2, 3).sum(axis=(1, 3)) // 4
                )
                sums = pooled.reshape(-1, 3).sum(axis=0)
                out["doc_id"].append(int(doc_id))
                out["source"].append(source)
                out["pr"].append(int(sums[0]))
                out["pg"].append(int(sums[1]))
                out["pb"].append(int(sums[2]))
            yield pd.DataFrame(out)

    blobs = docs.mapInPandas(
        encode_batch, "doc_id long, source string, payload binary"
    )
    pooled = blobs.mapInPandas(
        pool_batch, "doc_id long, source string, pr long, pg long, pb long"
    )
    return (
        pooled.groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_images"),
            F.sum("pr").cast("long").alias("pooled_sum_r"),
            F.sum("pg").cast("long").alias("pooled_sum_g"),
            F.sum("pb").cast("long").alias("pooled_sum_b"),
        )
        .orderBy("source")
    )
