"""Round-5 LLM-pipeline operators, part 10: audio chunk planning over
binary metadata, RAKE-style keyword extraction, and Matryoshka
truncation recall — extending the multimodal, keyword, and embedding
families.

House contract: Spark-first plans, identically-aliased DuckDB oracles,
floats rounded identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Audio chunk planning (multimodal metadata arithmetic)
# --------------------------------------------------------------------------

_SAMPLE_RATE = 16_000
_BYTES_PER_SAMPLE = 2
_CHUNK_S = 30
_OVERLAP_S = 5

_AUDIO_CHUNK_ORACLE = f"""
WITH meta AS (
  SELECT doc_id,
         n_chars * 1000 AS payload_bytes,
         (n_chars * 1000) / ({_SAMPLE_RATE} * {_BYTES_PER_SAMPLE} * 1.0)
           AS duration_s
  FROM documents
),
chunks AS (
  SELECT doc_id, payload_bytes, duration_s,
         CAST(i.i AS BIGINT) AS chunk_idx,
         i.i * ({_CHUNK_S} - {_OVERLAP_S}) AS start_s
  FROM meta,
       LATERAL (SELECT unnest(range(0,
           CAST(ceil(greatest(duration_s - {_OVERLAP_S}, 0.000001)
                     / ({_CHUNK_S} - {_OVERLAP_S})) AS BIGINT))) AS i) i
)
SELECT doc_id, chunk_idx,
       CAST(start_s AS BIGINT) AS start_s,
       round(least(start_s + {_CHUNK_S}, duration_s), 4) AS end_s,
       CAST(least(start_s + {_CHUNK_S}, duration_s) * {_SAMPLE_RATE}
            - start_s * {_SAMPLE_RATE} AS BIGINT) AS n_samples
FROM chunks
WHERE doc_id < 100
ORDER BY doc_id, chunk_idx
"""


@register("multimodal_audio_chunk_plan", oracle=_AUDIO_CHUNK_ORACLE, tags=("llm", "multimodal"))
def multimodal_audio_chunk_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio chunk planning — the scheduling half of a speech pipeline
    (Whisper-style 30s windows with 5s overlap), computed ENTIRELY from
    typed metadata: duration derives from payload byte length at a
    declared sample rate, chunk boundaries from sequence()+explode, and
    only the PLAN rows (doc, chunk, offsets, sample counts) move — the
    binary payload itself is untouched until the decode stage
    (`multimodal_binary_meta`'s mapInPandas) consumes the plan. This
    metadata/payload split is the core multimodal-at-scale discipline:
    planning is KB-sized arithmetic the optimizer can see, decoding is
    the expensive opaque stage you schedule with it. (Fixture docs
    stand in for audio via n_chars*1000 synthetic byte lengths.)"""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    step = _CHUNK_S - _OVERLAP_S
    meta = docs.select(
        "doc_id",
        (F.col("n_chars") * 1000).alias("payload_bytes"),
        (
            (F.col("n_chars") * 1000)
            / float(_SAMPLE_RATE * _BYTES_PER_SAMPLE)
        ).alias("duration_s"),
    )
    n_chunks = F.ceil(
        F.greatest(F.col("duration_s") - _OVERLAP_S, F.lit(1e-6)) / step
    ).cast("long")
    chunks = meta.select(
        "doc_id",
        "duration_s",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    ).select(
        "doc_id",
        "duration_s",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        (F.col("chunk_idx") * step).alias("start_s"),
    )
    end_s = F.least(F.col("start_s") + _CHUNK_S, F.col("duration_s"))
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.col("start_s").cast("long").alias("start_s"),
        F.round(end_s, 4).alias("end_s"),
        (end_s * _SAMPLE_RATE - F.col("start_s") * _SAMPLE_RATE)
        .cast("long")
        .alias("n_samples"),
    ).orderBy("doc_id", "chunk_idx")


# --------------------------------------------------------------------------
# RAKE-style keyword extraction
# --------------------------------------------------------------------------

_RAKE_STOPWORDS = "('the', 'a', 'of', 'and')"

_RAKE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, u.w, u.pos
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       LATERAL (SELECT unnest(ws) AS w,
                       unnest(range(1, len(ws) + 1)) AS pos) u
),
content AS (SELECT * FROM toks WHERE w NOT IN {_RAKE_STOPWORDS}),
pairs AS (
  SELECT a.w AS w1, b.w AS w2
  FROM content a
  JOIN content b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
),
freq AS (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM content GROUP BY w),
deg AS (
  SELECT w, CAST(count(*) AS BIGINT) AS degree
  FROM (SELECT w1 AS w FROM pairs UNION ALL SELECT w2 FROM pairs)
  GROUP BY w
),
scored AS (
  SELECT f.w, f.freq, coalesce(d.degree, 0) AS degree,
         round((f.freq + coalesce(d.degree, 0)) * 1.0 / f.freq, 4) AS rake_score
  FROM freq f LEFT JOIN deg d ON d.w = f.w
),
ranked AS (
  SELECT w, freq, degree, rake_score,
         row_number() OVER (ORDER BY rake_score DESC, w) AS rnk
  FROM scored
)
SELECT CAST(rnk AS BIGINT) AS rnk, w, freq, degree, rake_score
FROM ranked WHERE rnk <= 15
ORDER BY rnk
"""


@register("text_keyword_rake", oracle=_RAKE_ORACLE, tags=("llm", "text"))
def text_keyword_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE-style keyword scoring: stopwords split the token stream
    into content runs; each content word scores deg(w)/freq(w) (degree
    = co-occurrence with adjacent content words), ranking words that
    appear in longer multi-word phrases above merely-frequent ones —
    the classic unsupervised keyword extractor. Degree comes from the
    adjacent-pair stream (lead over (doc, pos), the bigram kernel),
    frequency from the token stream; both are partial aggregates over
    Heaps'-law-sized vocabulary tables and the final ranking is
    TakeOrderedAndProject over the vocabulary, never the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "w")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "w")
    content = toks.filter(~F.col("w").isin("the", "a", "of", "and"))
    nxt_w = F.lead("w").over(W.partitionBy("doc_id").orderBy("pos"))
    nxt_pos = F.lead("pos").over(W.partitionBy("doc_id").orderBy("pos"))
    pairs = (
        content.select("doc_id", "pos", "w", nxt_w.alias("w2"), nxt_pos.alias("pos2"))
        .filter(F.col("pos2") == F.col("pos") + 1)
        .select(F.col("w").alias("w1"), "w2")
    )
    freq = content.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    deg = (
        pairs.select(F.col("w1").alias("w"))
        .unionAll(pairs.select(F.col("w2").alias("w")))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    scored = freq.join(deg, "w", "left").select(
        "w",
        "freq",
        F.coalesce("degree", F.lit(0)).alias("degree"),
        F.round(
            (F.col("freq") + F.coalesce("degree", F.lit(0))) * 1.0 / F.col("freq"), 4
        ).alias("rake_score"),
    )
    rnk = F.row_number().over(W.orderBy(F.desc("rake_score"), "w")).cast("long")
    return (
        scored.withColumn("rnk", rnk)
        .filter(F.col("rnk") <= 15)
        .select("rnk", "w", "freq", "degree", "rake_score")
        .orderBy("rnk")
    )


# --------------------------------------------------------------------------
# Matryoshka truncation recall
# --------------------------------------------------------------------------

_MRL_DIMS = (16, 64)
_MRL_K = 5

_MRL_ORACLE = f"""
WITH dims AS (SELECT i FROM generate_series(1, 64) AS t(i)),
flat AS (
  SELECT e.vec_id, d.i AS dim, CAST(embedding[d.i] AS DOUBLE) AS v
  FROM embeddings e, dims d
),
queries AS (SELECT DISTINCT vec_id AS qid FROM embeddings WHERE vec_id % 100 = 0),
scores AS (
  SELECT q.qid, f.vec_id, f.dim <= 16 AS in16,
         f.v * qf.v AS prod
  FROM queries q
  JOIN flat qf ON qf.vec_id = q.qid
  JOIN flat f ON f.dim = qf.dim AND f.vec_id != q.qid
),
agg AS (
  SELECT qid, vec_id,
         sum(CASE WHEN in16 THEN prod ELSE 0 END) AS dot16,
         sum(prod) AS dot64
  FROM scores GROUP BY qid, vec_id
),
top16 AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
             ORDER BY dot16 DESC, vec_id) AS rn FROM agg
  ) WHERE rn <= {_MRL_K}
),
top64 AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
             ORDER BY dot64 DESC, vec_id) AS rn FROM agg
  ) WHERE rn <= {_MRL_K}
)
SELECT t64.qid,
       CAST(count(*) AS BIGINT) AS k,
       CAST(count(t16.vec_id) AS BIGINT) AS overlap,
       round(count(t16.vec_id) * 1.0 / count(*), 4) AS recall_at_k
FROM top64 t64
LEFT JOIN top16 t16 ON t16.qid = t64.qid AND t16.vec_id = t64.vec_id
GROUP BY t64.qid
ORDER BY t64.qid
"""


@register("embedding_matryoshka_recall", oracle=_MRL_ORACLE, tags=("llm", "ann", "embedding"))
def embedding_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation audit: how much top-k retrieval quality
    survives truncating 64-dim embeddings to their first 16 dims —
    recall@k of the truncated ranking against the full-dimension
    ranking, per query. This is the measurement that decides whether
    MRL-style prefix truncation (4x cheaper storage and distance math)
    is safe for a given embedding model. Both dot products come from
    ONE zip_with pass (the 16-dim score is a prefix sum via slice), so
    the corpus is scored once; rankings are WindowGroupLimit top-k and
    the recall join touches k rows per query. The oracle replays the
    same arithmetic through an unnest/groupBy formulation."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("vd")
    )
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("vd").alias("qd")
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    scored = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            dot(F.slice("vd", 1, 16), F.slice("qd", 1, 16)).alias("dot16"),
            dot(F.col("vd"), F.col("qd")).alias("dot64"),
        )
    )
    rn16 = F.row_number().over(W.partitionBy("qid").orderBy(F.desc("dot16"), "vec_id"))
    rn64 = F.row_number().over(W.partitionBy("qid").orderBy(F.desc("dot64"), "vec_id"))
    flagged = scored.select(
        "qid", "vec_id", rn16.alias("rn16"), rn64.alias("rn64")
    ).filter((F.col("rn16") <= _MRL_K) | (F.col("rn64") <= _MRL_K))
    return (
        flagged.groupBy("qid")
        .agg(
            F.count(F.when(F.col("rn64") <= _MRL_K, 1)).alias("k"),
            F.count(
                F.when((F.col("rn64") <= _MRL_K) & (F.col("rn16") <= _MRL_K), 1)
            ).alias("overlap"),
            F.round(
                F.count(
                    F.when((F.col("rn64") <= _MRL_K) & (F.col("rn16") <= _MRL_K), 1)
                )
                * 1.0
                / F.count(F.when(F.col("rn64") <= _MRL_K, 1)),
                4,
            ).alias("recall_at_k"),
        )
        .orderBy("qid")
    )
