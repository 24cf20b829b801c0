"""Round-44 tests: PPM downsample transform."""

from __future__ import annotations

import numpy as np

from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.functions.multimodal import decode_ppm, encode_ppm

SF = "/root/testdata/sf0.001"


def test_pool_kernel_matches_direct_numpy():
    img = decode_ppm(encode_ppm(42, 8, 8)).astype(np.int64)
    pooled = img.reshape(4, 2, 4, 2, 3).sum(axis=(1, 3)) // 4
    # brute force the same pooling
    for py in range(4):
        for px in range(4):
            block = img[2 * py : 2 * py + 2, 2 * px : 2 * px + 2]
            want = block.reshape(-1, 3).sum(axis=0) // 4
            assert (pooled[py, px] == want).all()


def test_downsample_query_sources_and_bounds(spark):
    rows = registry.queries()["multimodal_ppm_downsample"](spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_sources = docs.select("source").distinct().count()
    assert len(rows) == n_sources
    for r in rows:
        # pooled image is 4x4=16 px, channels <= 255
        cap = r.n_images * 16 * 255
        assert 0 < r.pooled_sum_r <= cap
        assert 0 < r.pooled_sum_g <= cap
        assert 0 < r.pooled_sum_b <= cap
