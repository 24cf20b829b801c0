"""LLM-data-pipeline operators, part 2: embedding-cosine near-duplicate
detection, IVF-style ANN (coarse-quantizer inverted lists), and multimodal
frame sampling through mapInPandas.

The embeddings fixture has no natural near-duplicates (max pairwise cosine
~0.51 at sf0.01), so the dedup query PLANTS them deterministically inside
the query itself — a shifted copy of every 20th vector — identically on
both engines; the operator then has real positives to find and the oracle
hash checks exact agreement on which pairs survive bucketing + verify.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.queries.llm_ops import _bucket_expr, _bucket_sql, _dot, _norm
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Embedding-cosine near-duplicate pairs (LSH-bucketed, exact-verified)
# --------------------------------------------------------------------------

_PLANT_STRIDE = 20  # every 20th vector gets a planted near-duplicate
_PLANT_OFFSET = 1_000_000  # planted copies get vec_id + offset
_PLANT_SHIFT = 0.01  # additive shift per component (cosine stays ~0.999)

DEDUP_EMB_ORACLE = f"""
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
),
planted AS (
  SELECT vec_id + {_PLANT_OFFSET} AS vec_id,
         list_transform(emb, x -> x + {_PLANT_SHIFT}) AS emb
  FROM base WHERE vec_id % {_PLANT_STRIDE} = 0
),
corpus AS (
  SELECT * FROM base UNION ALL SELECT * FROM planted
),
bucketed AS (
  SELECT vec_id, emb, {_bucket_sql('emb')} AS bucket FROM corpus
),
pairs AS (
  SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
         list_cosine_similarity(a.emb, b.emb) AS cos_sim
  FROM bucketed a
  JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT vec_id_a, vec_id_b, round(cos_sim, 4) AS cos_sim
FROM pairs WHERE cos_sim >= 0.98
ORDER BY vec_id_a, vec_id_b
"""


@register("dedup_embedding_cosine", oracle=DEDUP_EMB_ORACLE, tags=("llm", "dedup", "similarity"))
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: random-hyperplane LSH buckets
    -> same-bucket candidate join -> exact cosine verify at 0.98.

    Scale shape: identical to MinHash-LSH dedup but in vector space — ONE
    shuffle of the corpus on a 1-byte bucket key, candidates only within
    buckets (never O(n^2)), exact verification on the tiny candidate set.
    Near-duplicates land in the same bucket unless the shift flips a
    hyperplane sign, which both engines decide identically — so even the
    operator's recall profile is oracle-checked."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    planted = base.filter(F.col("vec_id") % _PLANT_STRIDE == 0).select(
        (F.col("vec_id") + F.lit(_PLANT_OFFSET)).alias("vec_id"),
        F.transform("emb", lambda x: x + F.lit(_PLANT_SHIFT)).alias("emb"),
    )
    corpus = base.unionByName(planted)
    bucketed = corpus.select("vec_id", "emb", _bucket_expr("emb").alias("bucket"))
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_id_a"),
        F.col("b.vec_id").alias("vec_id_b"),
        (
            _dot(F.col("a.emb"), F.col("b.emb"))
            / (_norm(F.col("a.emb")) * _norm(F.col("b.emb")))
        ).alias("cos_sim"),
    )
    return (
        pairs.filter(F.col("cos_sim") >= 0.98)
        .select("vec_id_a", "vec_id_b", F.round("cos_sim", 4).alias("cos_sim"))
        .orderBy("vec_id_a", "vec_id_b")
    )


# --------------------------------------------------------------------------
# IVF-style ANN: coarse quantizer (fixed seeded centroids) + inverted lists
# --------------------------------------------------------------------------

_N_CENTROIDS = 8
_NPROBE = 2
_CENTROIDS = np.random.RandomState(11).standard_normal((_N_CENTROIDS, 64)).round(6)


def _centroid_values_sql() -> str:
    rows = []
    for cid in range(_N_CENTROIDS):
        lits = ", ".join(repr(float(v)) for v in _CENTROIDS[cid])
        rows.append(f"({cid}, [{lits}])")
    return ",\n  ".join(rows)


ANN_IVF_ORACLE = f"""
WITH centroids AS (
  SELECT * FROM (VALUES
  {_centroid_values_sql()}
  ) AS t(cid, cvec)
),
corpus AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings
),
dists AS (
  SELECT c.vec_id, k.cid,
         list_dot_product(c.emb, c.emb)
         - 2 * list_dot_product(c.emb, list_transform(k.cvec, x -> CAST(x AS DOUBLE)))
         + list_dot_product(list_transform(k.cvec, x -> CAST(x AS DOUBLE)),
                            list_transform(k.cvec, x -> CAST(x AS DOUBLE))) AS d2
  FROM corpus c CROSS JOIN centroids k
),
ranked AS (
  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS crn
  FROM dists
),
assigned AS (SELECT vec_id, cid FROM ranked WHERE crn = 1),
probes   AS (SELECT vec_id, cid FROM ranked WHERE crn <= {_NPROBE} AND vec_id < 10),
scored AS (
  SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
         list_cosine_similarity(q.emb, e.emb) AS cos_sim
  FROM probes p
  JOIN assigned a ON a.cid = p.cid AND a.vec_id <> p.vec_id
  JOIN corpus q ON q.vec_id = p.vec_id
  JOIN corpus e ON e.vec_id = a.vec_id
),
topk AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, round(cos_sim, 4) AS cos_sim, CAST(rnk AS BIGINT) AS rnk
FROM topk WHERE rnk <= 3
ORDER BY query_id, rnk
"""


@register("ann_ivf_cosine", oracle=ANN_IVF_ORACLE, tags=("llm", "similarity"))
def ann_ivf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate nearest neighbors: a fixed seeded coarse
    quantizer (8 centroids) partitions the corpus into inverted lists by
    nearest-centroid; queries probe their nprobe=2 nearest lists only.

    Scale shape: the centroid table is broadcast (KBs at any scale); the
    corpus is assigned in one map-side pass (no shuffle) and then
    shuffles ONCE on the centroid id — the inverted-list build. Queries
    touch nprobe/K of the corpus instead of all of it; on a real system
    the assignment is computed at ingest and stored as a partition
    column, making probes partition-pruned scans. Centroids are fixed
    constants here so the approximate result is exactly reproducible on
    the oracle; production swaps in k-means-trained centroids (same
    plan)."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    # One parsed VALUES clause instead of createDataFrame: building the
    # 8x64 literal table through Python/Arrow costs ~0.5s of plan-build
    # per call; the SQL parse is one round-trip (same lesson as the LSH
    # bucket expression in llm_ops._bucket_expr).
    values_sql = ", ".join(
        "({}, array({}))".format(
            cid, ", ".join(f"{float(v)!r}D" for v in _CENTROIDS[cid])
        )
        for cid in range(_N_CENTROIDS)
    )
    centroids = spark.sql(
        f"SELECT CAST(col1 AS INT) AS cid, col2 AS cvec FROM VALUES {values_sql}"
    )
    d2 = (
        _dot("emb", "emb")
        - 2 * _dot("emb", "cvec")
        + _dot("cvec", "cvec")
    ).alias("d2")
    dists = corpus.crossJoin(F.broadcast(centroids)).select("vec_id", "cid", d2)
    crn = F.row_number().over(W.partitionBy("vec_id").orderBy("d2", "cid"))
    ranked = dists.withColumn("crn", crn)
    assigned = ranked.filter(F.col("crn") == 1).select("vec_id", "cid")
    probes = ranked.filter((F.col("crn") <= _NPROBE) & (F.col("vec_id") < 10)).select(
        F.col("vec_id").alias("query_id"), "cid"
    )
    qvec = corpus.select(F.col("vec_id").alias("query_id"), F.col("emb").alias("qe"))
    scored = (
        F.broadcast(probes.join(qvec, "query_id"))
        .join(assigned, "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(corpus, "vec_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (_dot("qe", "emb") / (_norm("qe") * _norm("emb"))).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("query_id", "neighbor_id", F.round("cos_sim", 4).alias("cos_sim"), F.col("rnk").cast("long").alias("rnk"))
        .orderBy("query_id", "rnk")
    )


# --------------------------------------------------------------------------
# Multimodal frame sampling (mapInPandas over binary payloads)
# --------------------------------------------------------------------------

_FRAME_BYTES = 16
_FRAME_STRIDE = 4  # keep every 4th frame

FRAME_SAMPLE_ORACLE = f"""
SELECT
  doc_id,
  fi                                                    AS frame_idx,
  least({_FRAME_BYTES}, length(text) - fi * {_FRAME_BYTES}) AS frame_len,
  substr(text, fi * {_FRAME_BYTES} + 1, 4)              AS frame_head
FROM documents,
  LATERAL (
    SELECT unnest(range(0, CAST(ceil(length(text) / {_FRAME_BYTES}.0) AS BIGINT), {_FRAME_STRIDE})) AS fi
  )
ORDER BY doc_id, frame_idx
"""


@register("multimodal_frame_sample", oracle=FRAME_SAMPLE_ORACLE, tags=("llm", "multimodal"))
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling over opaque binary payloads: each
    document's bytes stand in for an encoded clip; mapInPandas slices
    fixed-size "frames" and keeps every 4th (the decode itself is the
    deterministic byte-slicing stub — a real deployment swaps in
    pyav/ffmpeg per batch, same signature, same schema; see
    functions/multimodal.py).

    Scale shape: mapInPandas streams Arrow batches executor-side — bytes
    never visit the driver, output cardinality expands ~len/64 per row,
    and the expansion happens after the scan so input partition sizing
    (maxPartitionBytes) still governs memory. The oracle replays the
    slicing arithmetic in SQL over the same payloads."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )

    def sample_frames(batches):
        for pdf in batches:
            out_doc, out_idx, out_len, out_head = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                n_frames = -(-len(raw) // _FRAME_BYTES)
                for fi in range(0, n_frames, _FRAME_STRIDE):
                    frame = raw[fi * _FRAME_BYTES : (fi + 1) * _FRAME_BYTES]
                    out_doc.append(doc_id)
                    out_idx.append(fi)
                    out_len.append(len(frame))
                    out_head.append(frame[:4].decode("utf-8", errors="replace"))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int64"),
                    "frame_len": pd.Series(out_len, dtype="int64"),
                    "frame_head": pd.Series(out_head, dtype="object"),
                }
            )

    out_schema = "doc_id long, frame_idx long, frame_len long, frame_head string"
    return docs.mapInPandas(sample_frames, out_schema).orderBy("doc_id", "frame_idx")


# --------------------------------------------------------------------------
# Word n-gram (shingle) Jaccard dedup
# --------------------------------------------------------------------------

NGRAM_JACCARD_ORACLE = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
tg AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(ws, i.g, i.g + 2), ' ') AS g
  FROM w, LATERAL (SELECT unnest(range(1, len(ws) - 1)) AS g) i
),
counts AS (
  SELECT doc_id, count(*) AS n FROM tg GROUP BY doc_id
),
shared AS (
  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, count(*) AS n_shared
  FROM tg a JOIN tg b ON b.doc_id = a.doc_id + 1 AND a.g = b.g
  GROUP BY 1, 2
)
SELECT
  s.doc_id_a, s.doc_id_b,
  round(CAST(s.n_shared AS DOUBLE) / (ca.n + cb.n - s.n_shared), 4) AS jaccard
FROM shared s
JOIN counts ca ON ca.doc_id = s.doc_id_a
JOIN counts cb ON cb.doc_id = s.doc_id_b
ORDER BY doc_id_a
"""


@register("dedup_ngram_jaccard", oracle=NGRAM_JACCARD_ORACLE, tags=("llm", "dedup"))
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-trigram (3-shingle) Jaccard between consecutive doc_ids — the
    n-gram-level exact near-dup measure (stricter than word-set Jaccard:
    shared vocabulary in a different order scores ~0). Shingling is a JVM
    HOF (sequence + slice + concat_ws); the pair scores come from an
    inverted-index equi-join on the shingle — the same join shape MinHash
    banding approximates sub-quadratically, making this the exact oracle
    for small candidate sets and the verify stage at scale."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    trigrams = F.when(
        F.size(ws) >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(ws) - 2),
                lambda i: F.concat_ws(" ", F.slice(ws, i, F.lit(3))),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    # r14 (guide §2.3/§5): the shingle string never leaves the projection
    # that builds it — xxhash64 it to a long right after the explode (the
    # join/aggregation keys carry 8 bytes instead of ~25-byte strings;
    # the hash stays internal, only counts surface in the output), and
    # persist the hashed gram stream: it feeds BOTH pair-join sides, and
    # unpersisted each side re-ran the interpreted shingling HOF.
    # In-session A/B at sf0.1: 3.9s -> 2.4s, output bit-identical.
    from us_stock_data_pipeline_spark import registry as _registry

    tg = _registry.track_persist(
        docs.select("doc_id", F.explode(trigrams).alias("g0")).select(
            "doc_id", F.xxhash64("g0").alias("g")
        )
    )
    counts = tg.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = tg.alias("a")
    b = tg.alias("b")
    shared = (
        a.join(b, (F.col("b.doc_id") == F.col("a.doc_id") + 1) & (F.col("a.g") == F.col("b.g")))
        .groupBy(F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(counts.withColumnRenamed("doc_id", "doc_id_a").withColumnRenamed("n", "na"), "doc_id_a")
        .join(counts.withColumnRenamed("doc_id", "doc_id_b").withColumnRenamed("n", "nb"), "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            F.round(
                F.col("n_shared").cast("double") / (F.col("na") + F.col("nb") - F.col("n_shared")), 4
            ).alias("jaccard"),
        )
        .orderBy("doc_id_a")
    )


# --------------------------------------------------------------------------
# Edit-distance fuzzy matching
# --------------------------------------------------------------------------


@register(
    "text_edit_distance",
    oracle="""
SELECT
  a.doc_id AS doc_id_a,
  b.doc_id AS doc_id_b,
  levenshtein(substr(a.text, 1, 30), substr(b.text, 1, 30)) AS edit_dist,
  round(1.0 - levenshtein(substr(a.text, 1, 30), substr(b.text, 1, 30))
        / greatest(length(substr(a.text, 1, 30)), length(substr(b.text, 1, 30))), 4)
    AS similarity
FROM documents a
JOIN documents b ON b.doc_id = a.doc_id + 1
ORDER BY doc_id_a
""",
    tags=("llm", "text", "fuzzy"),
)
def text_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein edit distance between consecutive documents' prefixes —
    the character-level fuzzy-match primitive (entity resolution, OCR-noise
    dedup). Edit distance is O(len^2) per pair, so production NEVER runs it
    all-pairs: it is the verify stage behind a blocking key (here the
    consecutive-id join stands in for the block), exactly like exact-Jaccard
    behind MinHash bands. Prefix-bounding (30 chars) caps per-pair cost —
    both engines compute the identical value."""
    docs = load_table(spark, sf_dir, "documents")
    a = docs.select(F.col("doc_id").alias("doc_id_a"), F.substring("text", 1, 30).alias("ta"))
    b = docs.select(F.col("doc_id").alias("doc_id_b"), F.substring("text", 1, 30).alias("tb"))
    dist = F.levenshtein("ta", "tb")
    return (
        a.join(b, F.col("doc_id_b") == F.col("doc_id_a") + 1)
        .select(
            "doc_id_a",
            "doc_id_b",
            dist.alias("edit_dist"),
            F.round(
                1.0 - dist / F.greatest(F.length("ta"), F.length("tb")), 4
            ).alias("similarity"),
        )
        .orderBy("doc_id_a")
    )


# --------------------------------------------------------------------------
# Composite corpus-curation pipeline (the training-data flagship)
# --------------------------------------------------------------------------

CORPUS_PIPELINE_ORACLE = """
WITH stats AS (
  SELECT doc_id, text, lang, source,
         len(string_split(text, ' ')) AS n_tokens,
         CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the','a','of','and'))) AS DOUBLE)
           / len(string_split(text, ' ')) AS stop_ratio
  FROM documents
),
quality AS (
  SELECT * FROM stats WHERE n_tokens >= 10 AND stop_ratio <= 0.6
),
deduped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM quality
  ) WHERE rn = 1
)
SELECT
  lang,
  count(*)                               AS n_docs,
  CAST(sum(n_tokens) AS BIGINT)          AS total_tokens,
  round(avg(n_tokens), 2)                AS avg_tokens,
  count(DISTINCT source)                 AS n_sources
FROM deduped
WHERE lang IN ('en', 'de', 'fr', 'es')
GROUP BY lang
ORDER BY lang
"""


@register(
    "pipeline_corpus_curation",
    oracle=CORPUS_PIPELINE_ORACLE,
    tags=("llm", "pipeline", "flagship"),
    bench=True,
)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composite training-corpus curation pipeline, end to end in one
    lazy plan: quality filter (token count + stopword ratio) -> exact
    dedup (keep lowest doc_id per content hash) -> language allowlist ->
    per-language corpus accounting. This is the shape every pretraining
    data refresh runs nightly; at 100 TB it is exactly two shuffles — one
    on the content hash (dedup), one on lang (final rollup) — because the
    quality stats are per-row expressions fused into the scan, and
    Catalyst pipelines the filters into both sides. Swap the exact-dedup
    stage for dedup_minhash_lsh's band join to get the fuzzy version with
    the same surrounding plan."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    stats = docs.select(
        "doc_id",
        "text",
        "lang",
        "source",
        F.size(words).alias("n_tokens"),
        (
            F.size(F.filter(words, lambda w: w.isin("the", "a", "of", "and"))).cast("double")
            / F.size(words)
        ).alias("stop_ratio"),
    )
    quality = stats.filter((F.col("n_tokens") >= 10) & (F.col("stop_ratio") <= 0.6))
    w = W.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = quality.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        deduped.filter(F.col("lang").isin("en", "de", "fr", "es"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 2).alias("avg_tokens"),
            F.countDistinct("source").alias("n_sources"),
        )
        .orderBy("lang")
    )
