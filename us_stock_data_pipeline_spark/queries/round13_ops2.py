"""Round-13 operators, part 2 — retrieval fusion and pipeline QA.

- `search_hybrid_rrf` — hybrid retrieval: lexical BM25 leg + dense
  cosine leg fused with Reciprocal Rank Fusion (Cormack et al., SIGIR
  2009), the standard first-stage ranker of every hybrid RAG stack.
- `quality_expectations_audit` — a Deequ-style data-quality
  expectation suite (completeness / uniqueness / bounds / referential
  ordering) computed in ONE scan of lineitem and emitted as one row
  per check with an exact fixed-point metric and a pass verdict.
- `storage_parquet_raw_write` — the pure-Python parquet WRITER
  (`functions/parquet_write.py`) exercised distributed: every task
  serializes its rows to real parquet bytes (thrift-compact footer,
  v1 pages, RLE def levels, in-repo Snappy) and the bytes are read
  back by BOTH pyarrow and the in-repo raw reader before aggregation.

Reference scope note: sanantachat/us-stock-data-pipeline is ingest-only
(784 LoC, no retrieval or QA surface); these operators extend the
§2B/2C/2D target surface for LLM-training-data pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Hybrid retrieval: BM25 + cosine fused by Reciprocal Rank Fusion
# --------------------------------------------------------------------------

_RRF_K = 60  # the canonical RRF constant from the original paper
_RRF_QUERY = ("table", "hash", "merge")
_RRF_K1 = 1.2
_RRF_B = 0.75
_RRF_QVEC_ID = 0  # dense query = the embedding of vec_id 0
_RRF_TOPN = 20

_HYBRID_RRF_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
doclen AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id
),
corpus AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS tot_len
  FROM doclen
),
tf AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM tok
  WHERE w IN {_RRF_QUERY!r}
  GROUP BY doc_id, w
),
df AS (
  SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY w
),
lex_scored AS (
  SELECT t.doc_id,
         CAST(floor(
           ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
           * (t.tf * ({_RRF_K1} + 1.0))
           / (t.tf + {_RRF_K1} * (1.0 - {_RRF_B}
              + {_RRF_B} * l.dl / (CAST(c.tot_len AS DOUBLE) / c.n_docs)))
           * 1000000 + 0.5) AS BIGINT) AS term_score_e6
  FROM tf t
  JOIN doclen l ON l.doc_id = t.doc_id
  JOIN df d ON d.w = t.w
  CROSS JOIN corpus c
),
lex AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY sum(term_score_e6) DESC, doc_id) AS r_lex
  FROM lex_scored GROUP BY doc_id
),
q AS (
  SELECT embedding AS qe FROM embeddings WHERE vec_id = {_RRF_QVEC_ID}
),
dense AS (
  SELECT e.vec_id AS doc_id,
         row_number() OVER (
           ORDER BY list_cosine_similarity(
             list_transform(q.qe, x -> CAST(x AS DOUBLE)),
             list_transform(e.embedding, x -> CAST(x AS DOUBLE))) DESC,
           e.vec_id) AS r_dense
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> {_RRF_QVEC_ID}
),
fused AS (
  SELECT coalesce(l.doc_id, d.doc_id) AS doc_id,
         CAST(coalesce(l.r_lex, 0) AS BIGINT) AS r_lex,
         CAST(coalesce(d.r_dense, 0) AS BIGINT) AS r_dense,
         CAST(floor(
           (CASE WHEN l.doc_id IS NULL THEN 0.0
                 ELSE 1000000.0 / ({_RRF_K} + l.r_lex) END)
           + (CASE WHEN d.doc_id IS NULL THEN 0.0
                   ELSE 1000000.0 / ({_RRF_K} + d.r_dense) END)
           + 0.5) AS BIGINT) AS rrf_e6
  FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id
)
SELECT doc_id, r_lex, r_dense, rrf_e6
FROM fused
ORDER BY rrf_e6 DESC, doc_id
LIMIT {_RRF_TOPN}
"""


@register(
    "search_hybrid_rrf",
    oracle=_HYBRID_RRF_ORACLE,
    tags=("llm", "similarity", "search"),
    round=13,
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with Reciprocal Rank Fusion: a lexical BM25 leg
    over `documents` (exact-integer inputs, per-term score quantized to
    1e-6 before the cross-term sum — the `text_bm25_scoring` scheme) and
    a dense cosine leg over `embeddings` against a fixed query vector
    (JVM `zip_with`+`aggregate` fold, the `knn_bruteforce_cosine`
    scheme), fused as sum(1e6/(k+rank)) with k=60 — ranks are exact
    BIGINTs so the fusion arithmetic is engine-stable. Plan: the BM25 leg
    prunes the exploded token stream with the query IN-filter (an
    inverted-index probe at 100 TB, not a corpus scan), the dense leg
    broadcasts ONE query row against the corpus (no corpus shuffle), and
    both legs' rankings are single-key windows over already-tiny scored
    sets. The full-outer fusion join runs on two ranked lists of at most
    corpus size — in practice top-capped by each leg upstream."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    # ---- lexical leg: BM25 (same fixed-point scheme as text_bm25_scoring)
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    doclen = tok.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    corpus = doclen.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("tot_len"),
    )
    tf = (
        tok.filter(F.col("w").isin(*_RRF_QUERY))
        .groupBy("doc_id", "w")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("w").agg(F.count("*").cast("long").alias("df"))
    term = (
        tf.join(doclen, "doc_id")
        .join(F.broadcast(dfreq), "w")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            F.floor(
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
                )
                * (F.col("tf") * (_RRF_K1 + 1.0))
                / (
                    F.col("tf")
                    + _RRF_K1
                    * (
                        1.0
                        - _RRF_B
                        + _RRF_B
                        * F.col("dl")
                        / (F.col("tot_len").cast("double") / F.col("n_docs"))
                    )
                )
                * 1_000_000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("term_score_e6"),
        )
    )
    lex = (
        term.groupBy("doc_id")
        .agg(F.sum("term_score_e6").alias("bm25_e6"))
        .select(
            "doc_id",
            F.row_number()
            .over(W.orderBy(F.desc("bm25_e6"), F.asc("doc_id")))
            .cast("long")
            .alias("r_lex"),
        )
    )

    # ---- dense leg: cosine vs ONE broadcast query vector
    def _dot(a, b):
        prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
        return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)

    def _norm(a):
        return F.sqrt(
            F.aggregate(
                a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
            )
        )

    qvec = emb.filter(F.col("vec_id") == _RRF_QVEC_ID).select(
        F.col("embedding").alias("qe")
    )
    dense = (
        emb.filter(F.col("vec_id") != _RRF_QVEC_ID)
        .crossJoin(F.broadcast(qvec))
        .select(
            F.col("vec_id").alias("doc_id"),
            (
                _dot(F.col("qe"), F.col("embedding"))
                / (_norm(F.col("qe")) * _norm(F.col("embedding")))
            ).alias("cos_sim"),
        )
        .select(
            "doc_id",
            F.row_number()
            .over(W.orderBy(F.desc("cos_sim"), F.asc("doc_id")))
            .cast("long")
            .alias("r_dense"),
        )
    )

    # ---- RRF fusion: exact-integer ranks -> engine-stable double sum
    fused = (
        lex.withColumnRenamed("doc_id", "l_id")
        .join(
            dense.withColumnRenamed("doc_id", "d_id"),
            F.col("l_id") == F.col("d_id"),
            "full_outer",
        )
        .select(
            F.coalesce(F.col("l_id"), F.col("d_id")).alias("doc_id"),
            F.coalesce(F.col("r_lex"), F.lit(0)).cast("long").alias("r_lex"),
            F.coalesce(F.col("r_dense"), F.lit(0)).cast("long").alias("r_dense"),
            F.floor(
                F.when(
                    F.col("r_lex").isNull(), F.lit(0.0)
                ).otherwise(F.lit(1_000_000.0) / (_RRF_K + F.col("r_lex")))
                + F.when(
                    F.col("r_dense").isNull(), F.lit(0.0)
                ).otherwise(F.lit(1_000_000.0) / (_RRF_K + F.col("r_dense")))
                + F.lit(0.5)
            )
            .cast("long")
            .alias("rrf_e6"),
        )
    )
    return fused.orderBy(F.desc("rrf_e6"), F.asc("doc_id")).limit(_RRF_TOPN)


# --------------------------------------------------------------------------
# Deequ-style data-quality expectation suite
# --------------------------------------------------------------------------

_QA_ORACLE = """
WITH m AS (
  SELECT
    CAST(count(*) AS BIGINT)                                   AS n_rows,
    CAST(count(l_orderkey) AS BIGINT)                          AS nn_orderkey,
    CAST(count(l_shipdate) AS BIGINT)                          AS nn_shipdate,
    CAST(count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT) AS n_pk,
    CAST(min(l_quantity) AS BIGINT)                            AS min_qty,
    CAST(max(l_quantity) AS BIGINT)                            AS max_qty,
    CAST(floor(min(l_discount) * 100 + 0.5) AS BIGINT)         AS min_disc_e2,
    CAST(floor(max(l_discount) * 100 + 0.5) AS BIGINT)         AS max_disc_e2,
    CAST(count(*) FILTER (WHERE l_linestatus NOT IN ('O', 'F')) AS BIGINT)
                                                               AS n_bad_status,
    CAST(count(*) FILTER (WHERE l_returnflag NOT IN ('A', 'N', 'R')) AS BIGINT)
                                                               AS n_bad_flag,
    CAST(count(*) FILTER (WHERE l_extendedprice <= 0) AS BIGINT)
                                                               AS n_nonpos_price
  FROM lineitem
)
SELECT * FROM (
  SELECT 'completeness_l_orderkey' AS check_name,
         CAST(floor(1000000.0 * nn_orderkey / n_rows + 0.5) AS BIGINT) AS metric_e6,
         nn_orderkey = n_rows AS passed FROM m
  UNION ALL
  SELECT 'completeness_l_shipdate',
         CAST(floor(1000000.0 * nn_shipdate / n_rows + 0.5) AS BIGINT),
         nn_shipdate = n_rows FROM m
  UNION ALL
  SELECT 'uniqueness_pk',
         CAST(floor(1000000.0 * n_pk / n_rows + 0.5) AS BIGINT),
         n_pk = n_rows FROM m
  UNION ALL
  SELECT 'range_quantity_1_50', max_qty - min_qty,
         min_qty >= 1 AND max_qty <= 50 FROM m
  UNION ALL
  SELECT 'range_discount_0_10pct', max_disc_e2 - min_disc_e2,
         min_disc_e2 >= 0 AND max_disc_e2 <= 10 FROM m
  UNION ALL
  SELECT 'domain_linestatus', n_bad_status, n_bad_status = 0 FROM m
  UNION ALL
  SELECT 'domain_returnflag', n_bad_flag, n_bad_flag = 0 FROM m
  UNION ALL
  SELECT 'positive_extendedprice', n_nonpos_price, n_nonpos_price = 0 FROM m
)
ORDER BY check_name
"""


@register(
    "quality_expectations_audit",
    oracle=_QA_ORACLE,
    tags=("etl", "quality"),
    round=13,
)
def quality_expectations_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style expectation suite: 8 data-quality checks
    (completeness, composite-key uniqueness, value ranges, domain
    membership, positivity) verified in ONE
    aggregation pass over lineitem — the metrics all reduce to
    count/min/max forms with map-side partial aggregation, so the whole
    audit costs one scan + one 1-row shuffle regardless of table size;
    the per-check rows are then exploded driver-free with `stack`.
    Fractional metrics are quantized to 1e-6 from exact BIGINT
    numerators/denominators so the verdict row hashes identically in
    both engines. This is the pre-publish gate a 100 TB pipeline runs
    before a versioned-table commit (pairs with the CHECK-constraint
    enforcement in `etl_versioned_sql_constraints`)."""
    li = load_table(spark, sf_dir, "lineitem")
    m = li.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.count("l_orderkey").cast("long").alias("nn_orderkey"),
        F.count("l_shipdate").cast("long").alias("nn_shipdate"),
        F.count_distinct(F.struct("l_orderkey", "l_linenumber"))
        .cast("long")
        .alias("n_pk"),
        F.min("l_quantity").cast("long").alias("min_qty"),
        F.max("l_quantity").cast("long").alias("max_qty"),
        F.floor(F.min("l_discount") * 100 + F.lit(0.5)).cast("long").alias("min_disc_e2"),
        F.floor(F.max("l_discount") * 100 + F.lit(0.5)).cast("long").alias("max_disc_e2"),
        F.count(F.when(~F.col("l_linestatus").isin("O", "F"), 1))
        .cast("long")
        .alias("n_bad_status"),
        F.count(F.when(~F.col("l_returnflag").isin("A", "N", "R"), 1))
        .cast("long")
        .alias("n_bad_flag"),
        F.count(F.when(F.col("l_extendedprice") <= 0, 1))
        .cast("long")
        .alias("n_nonpos_price"),
    )
    checks = m.select(
        F.expr(
            """stack(8,
              'completeness_l_orderkey',
                CAST(floor(1000000.0 * nn_orderkey / n_rows + 0.5) AS BIGINT),
                nn_orderkey = n_rows,
              'completeness_l_shipdate',
                CAST(floor(1000000.0 * nn_shipdate / n_rows + 0.5) AS BIGINT),
                nn_shipdate = n_rows,
              'uniqueness_pk',
                CAST(floor(1000000.0 * n_pk / n_rows + 0.5) AS BIGINT),
                n_pk = n_rows,
              'range_quantity_1_50', max_qty - min_qty,
                min_qty >= 1 AND max_qty <= 50,
              'range_discount_0_10pct', max_disc_e2 - min_disc_e2,
                min_disc_e2 >= 0 AND max_disc_e2 <= 10,
              'domain_linestatus', n_bad_status, n_bad_status = 0,
              'domain_returnflag', n_bad_flag, n_bad_flag = 0,
              'positive_extendedprice', n_nonpos_price, n_nonpos_price = 0
            ) AS (check_name, metric_e6, passed)"""
        )
    )
    return checks.orderBy("check_name")


# --------------------------------------------------------------------------
# storage: pure-Python parquet WRITER, distributed write->read round trip
# --------------------------------------------------------------------------

_PQ_WRITE_ORACLE = """
SELECT CAST(c_nationkey AS BIGINT) AS nk,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(c_custkey) AS BIGINT) AS sum_key,
       CAST(count(*) FILTER (WHERE c_custkey % 9 = 0) AS BIGINT) AS n_nulled,
       CAST(sum(length(c_name)) FILTER (WHERE c_custkey % 9 <> 0) AS BIGINT)
         AS sum_name_len,
       CAST(sum(c_custkey % 97) AS BIGINT) AS sum_quarters
FROM customer
GROUP BY 1
ORDER BY 1
"""


@register(
    "storage_parquet_raw_write",
    oracle=_PQ_WRITE_ORACLE,
    tags=("storage", "multimodal"),
    round=13,
)
def storage_parquet_raw_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-Python parquet WRITER (round 13) distributed: each
    mapInPandas task serializes ITS batch of customer rows to a complete
    parquet file in memory with `functions/parquet_write.py` (thrift
    COMPACT footer, v1 data pages, PLAIN values, RLE def levels, min/max
    statistics, in-repo Snappy compression), then the SAME task reads
    the bytes back through TWO independent decoders — pyarrow's C++
    reader and the in-repo `parquet_raw.read_column` — and raises if
    either disagrees with the input batch. The decoded (not the
    original) rows feed the aggregate, so the hash-match vs DuckDB
    proves the full write->read loop preserved every value, null, and
    UTF-8 string byte. Per-task in-memory files with no driver-side
    bytes is the 100 TB shape: a bulk export/validate job writes one
    file per task exactly like this, and Snappy/stats/footer bytes are
    produced by the engine's own codec implementations rather than a
    library."""
    cust = load_table(spark, sf_dir, "customer").selectExpr(
        "CAST(c_custkey AS BIGINT) AS ck",
        "CAST(c_nationkey AS BIGINT) AS nk",
        "CASE WHEN c_custkey % 9 = 0 THEN NULL ELSE c_name END AS nm",
        "CAST(c_custkey % 97 AS DOUBLE) * 0.25 AS quarter",
    )

    def roundtrip(batches):
        import io

        import pandas as pd
        import pyarrow.parquet as pq

        from us_stock_data_pipeline_spark.functions.parquet_raw import read_column
        from us_stock_data_pipeline_spark.functions.parquet_write import (
            CODEC_SNAPPY,
            PQ_BYTE_ARRAY,
            PQ_DOUBLE,
            PQ_INT64,
            write_parquet,
        )

        for b in batches:
            if b.empty:
                continue
            ck = [int(v) for v in b["ck"]]
            nk = [int(v) for v in b["nk"]]
            nm = [None if v is None else str(v) for v in b["nm"].astype(object).where(b["nm"].notna(), None)]
            qt = [float(v) for v in b["quarter"]]
            buf = write_parquet(
                [
                    ("ck", PQ_INT64, False, ck),
                    ("nk", PQ_INT64, False, nk),
                    ("nm", PQ_BYTE_ARRAY, True, nm),
                    ("quarter", PQ_DOUBLE, False, qt),
                ],
                codec=CODEC_SNAPPY,
                page_rows=256,
                # dict+snappy v1 = Spark's own default layout; nk (25
                # values) dict-encodes, ck (unique) falls back to PLAIN
                use_dictionary=True,
            )
            # decoder 1: pyarrow C++
            t = pq.read_table(io.BytesIO(buf))
            if (
                t.column("ck").to_pylist() != ck
                or t.column("nk").to_pylist() != nk
                or t.column("nm").to_pylist() != nm
                or t.column("quarter").to_pylist() != qt
            ):
                raise ValueError("pyarrow read-back mismatch")
            # decoder 2: the in-repo raw page reader
            if (
                read_column(buf, "ck") != ck
                or read_column(buf, "nk") != nk
                or read_column(buf, "nm")
                != [None if v is None else v.encode("utf-8") for v in nm]
                or read_column(buf, "quarter") != qt
            ):
                raise ValueError("raw-reader read-back mismatch")
            yield pd.DataFrame(
                {
                    "ck": t.column("ck").to_pylist(),
                    "nk": t.column("nk").to_pylist(),
                    "nm_len": [
                        None if v is None else len(v) for v in t.column("nm").to_pylist()
                    ],
                    "quarter": t.column("quarter").to_pylist(),
                }
            )

    decoded = cust.mapInPandas(
        roundtrip, "ck long, nk long, nm_len long, quarter double"
    )
    return (
        decoded.groupBy("nk")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("ck").cast("long").alias("sum_key"),
            F.sum(F.when(F.col("nm_len").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_nulled"),
            F.sum("nm_len").cast("long").alias("sum_name_len"),
            F.floor(F.sum(F.col("quarter") * 4) + F.lit(0.5))
            .cast("long")
            .alias("sum_quarters"),
        )
        .orderBy("nk")
    )
