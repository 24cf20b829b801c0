"""LSH recall on planted neighbor pairs — proves the SCALE.md §7 claim
that the random-hyperplane bucketing keeps recall while bucket count is
dialed up with corpus size.

The fixture embeddings have no natural near-duplicates (FIXTURES.md), so
neighbors are PLANTED: 100 corpus vectors are perturbed with small seeded
Gaussian noise (cosine ~0.9999 to their base), and candidate-generation
recall is the fraction of planted pairs whose perturbed copy lands in the
same bucket as its base — the event that makes the pair a candidate for
exact verification in ann_lsh_cosine / dedup_embedding_cosine.

Theory check the numbers should track: P(one sign bit flips) = theta/pi
per plane (theta = planted angle ~0.014 rad), so expected recall at n
planes is (1 - theta/pi)^n — ~0.98 at 4 planes, ~0.965 at 8. Both
asserted >= 0.9 with margin.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.queries.llm_ops import (
    _MAX_PLANES,
    lsh_bucket_expr,
    planes_for_corpus,
)

SF_DIR = "/root/testdata/sf0.1"
N_PLANTED = 100
_EPS = 0.015  # relative noise scale -> cosine ~0.9999


def _planted_frame(spark):
    base = (
        load_table(spark, SF_DIR, "embeddings")
        .filter(F.col("vec_id") < N_PLANTED)
        .select("vec_id", "embedding")
        .toPandas()
    )
    rng = np.random.RandomState(2024)
    rows = []
    for _, r in base.iterrows():
        v = np.asarray(r["embedding"], dtype=np.float64)
        noise = rng.standard_normal(v.shape) * _EPS * np.linalg.norm(v) / np.sqrt(v.size)
        rows.append((int(r["vec_id"]), [float(x) for x in (v + noise)]))
    planted = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "perturbed"]),
    )
    return base, planted


@pytest.mark.parametrize("n_planes", [4, 8])
def test_recall_on_planted_pairs(spark, n_planes):
    _, planted = _planted_frame(spark)
    corpus = load_table(spark, SF_DIR, "embeddings").filter(F.col("vec_id") < N_PLANTED)
    base_b = corpus.select(
        "vec_id", lsh_bucket_expr("embedding", n_planes).alias("b_base")
    )
    pert_b = planted.select(
        "vec_id", lsh_bucket_expr("perturbed", n_planes).alias("b_pert")
    )
    hits = (
        base_b.join(pert_b, "vec_id")
        .agg(F.avg((F.col("b_base") == F.col("b_pert")).cast("double")).alias("recall"))
        .collect()[0]["recall"]
    )
    assert hits >= 0.9, f"recall {hits:.3f} at {n_planes} planes"


def test_wider_buckets_stay_populated(spark):
    # Dialing planes 4 -> 8 must actually widen the bucket space (the
    # scale lever is real, not a no-op on this data).
    emb = load_table(spark, SF_DIR, "embeddings")
    n4 = emb.select(lsh_bucket_expr("embedding", 4).alias("b")).distinct().count()
    n8 = emb.select(lsh_bucket_expr("embedding", 8).alias("b")).distinct().count()
    assert n4 <= 16 and n8 <= 256
    assert n8 > n4 * 4, f"8 planes only produced {n8} buckets vs {n4} at 4"


def test_planes_for_corpus_scales():
    # The sizing rule grows bucket count with corpus size and respects
    # the clamp — the documented 100 TB lever.
    assert planes_for_corpus(2_000) == 4
    assert planes_for_corpus(1_000_000) == 8
    assert planes_for_corpus(1_000_000_000) == _MAX_PLANES
    assert planes_for_corpus(10**13) == _MAX_PLANES
    widths = [planes_for_corpus(10**k) for k in range(3, 13)]
    assert widths == sorted(widths)
