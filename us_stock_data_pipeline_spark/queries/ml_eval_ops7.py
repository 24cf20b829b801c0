"""Round-39 ML eval, part 7: walk-forward cross-validation and
embedding triplet-violation rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Walk-forward (expanding-window) cross-validation
# --------------------------------------------------------------------------

_WF_ORACLE = """
WITH data AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS fold_month,
         o_orderpriority AS prio,
         CAST(round(o_totalprice * 100) AS BIGINT) AS y
  FROM orders
),
folds AS (SELECT DISTINCT fold_month FROM data),
models AS (  -- for each fold month: mean trained on STRICTLY EARLIER months
  SELECT f.fold_month, d.prio, CAST(sum(d.y) // count(*) AS BIGINT) AS pred
  FROM folds f JOIN data d ON d.fold_month < f.fold_month
  GROUP BY f.fold_month, d.prio
),
scored AS (
  SELECT d.fold_month, abs(d.y - m.pred) AS err
  FROM data d JOIN models m
    ON m.fold_month = d.fold_month AND m.prio = d.prio
)
SELECT fold_month,
       CAST(count(*) AS BIGINT) AS n_test,
       CAST(sum(err) // count(*) AS BIGINT) AS mae_cents
FROM scored
GROUP BY fold_month
ORDER BY fold_month
"""


@register("ml_walk_forward_cv", oracle=_WF_ORACLE, tags=("ml", "eval", "timeseries"))
def ml_walk_forward_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walk-forward (expanding-window) cross-validation — the ONLY
    valid CV for time-ordered data: each month's model trains on
    strictly earlier months, so information never flows backward
    (random k-fold leaks the future into the past and overstates
    accuracy; `ml_kfold_cv` is that protocol for exchangeable rows,
    this is its temporal counterpart). The complementary-join trick
    carries over: joining data to the fold table on
    fold_month > train_month fits EVERY expanding-window model in one
    aggregate. The first month has no history and drops out naturally
    (no model row). MAE is exact integer cents per fold — the
    month-over-month MAE trend is the drift signal a deployed model's
    retraining schedule reads. Plan: one fan-out join bounded by the
    month count, one model aggregate, one scoring join, one rollup."""
    data = load_table(spark, sf_dir, "orders").select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("fold_month"),
        F.col("o_orderpriority").alias("prio"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("y"),
    )
    folds = data.select("fold_month").distinct().withColumnRenamed(
        "fold_month", "f_month"
    )
    models = (
        data.join(F.broadcast(folds), F.col("fold_month") < F.col("f_month"))
        .groupBy("f_month", "prio")
        .agg(F.expr("CAST(sum(y) div count(*) AS BIGINT)").alias("pred"))
    )
    scored = data.join(
        F.broadcast(models),
        (F.col("f_month") == F.col("fold_month")) & (models.prio == data.prio),
    ).select("fold_month", F.abs(F.col("y") - F.col("pred")).alias("err"))
    return (
        scored.groupBy("fold_month")
        .agg(
            F.count("*").cast("long").alias("n_test"),
            F.expr("CAST(sum(err) div count(*) AS BIGINT)").alias("mae_cents"),
        )
        .orderBy("fold_month")
    )


# --------------------------------------------------------------------------
# Embedding triplet-violation rate
# --------------------------------------------------------------------------

_TRIPLET_MARGIN_E4 = 500  # cosine margin 0.05


def _pick(role: str) -> str:
    """Deterministic partner choice: rank candidates by a seeded pair
    hash, take rank 1 — the reproducible-sampling idiom."""
    return (
        f"CAST(('0x' || substring(md5('{role}:' || CAST(a.vec_id AS VARCHAR) || ':'"
        f" || CAST(c.vec_id AS VARCHAR)), 1, 12)) AS BIGINT)"
    )


_TRIPLET_ORACLE = f"""
WITH anchors AS (
  SELECT vec_id, embedding, label FROM embeddings WHERE vec_id % 5 = 0
),
pos AS (
  SELECT a.vec_id AS aid, c.vec_id AS pid,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY {_pick("pos")}, c.vec_id) AS rk
  FROM anchors a JOIN embeddings c
    ON c.label = a.label AND c.vec_id <> a.vec_id
),
neg AS (
  SELECT a.vec_id AS aid, c.vec_id AS nid,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY {_pick("neg")}, c.vec_id) AS rk
  FROM anchors a JOIN embeddings c ON c.label <> a.label
),
triplets AS (
  SELECT p.aid, p.pid, n.nid FROM pos p JOIN neg n ON n.aid = p.aid
  WHERE p.rk = 1 AND n.rk = 1
),
scored AS (
  SELECT t.aid,
         CAST(floor(list_cosine_similarity(
                list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
                list_transform(pe.embedding, x -> CAST(x AS DOUBLE)))
              * 10000 + 0.5) AS BIGINT) AS cos_pos_e4,
         CAST(floor(list_cosine_similarity(
                list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
                list_transform(ne.embedding, x -> CAST(x AS DOUBLE)))
              * 10000 + 0.5) AS BIGINT) AS cos_neg_e4
  FROM triplets t
  JOIN embeddings a ON a.vec_id = t.aid
  JOIN embeddings pe ON pe.vec_id = t.pid
  JOIN embeddings ne ON ne.vec_id = t.nid
)
SELECT CAST(count(*) AS BIGINT) AS n_triplets,
       CAST(sum(CASE WHEN cos_pos_e4 < cos_neg_e4 + {_TRIPLET_MARGIN_E4}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
       CAST(sum(CASE WHEN cos_pos_e4 < cos_neg_e4 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hard_violations
FROM scored
"""


@register("embedding_triplet_violations", oracle=_TRIPLET_ORACLE, tags=("llm", "embedding", "eval"))
def embedding_triplet_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triplet-violation rate — the metric-learning health check: for
    deterministic (anchor, same-label positive, other-label negative)
    triplets, how often does cos(a,p) fail to beat cos(a,n) by the
    margin? A high rate means the embedding space does not respect the
    labels (retrieval and SemDeDup both degrade). Partners are picked
    by seeded pair-hash rank (reproducible epochs — the
    contrastive_negative_sampling idiom), cosines at the knn 1e-4
    precision contract, the margin in the same units. Plan: two
    blocked rank joins pick partners, three point lookups join the
    vectors back, one global reduce."""
    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") % 5 == 0).select(
        F.col("vec_id").alias("aid"),
        F.col("label").alias("a_label"),
    )
    cand = emb.select(
        F.col("vec_id").alias("cid"), F.col("label").alias("c_label")
    )

    def pick(role: str, same_label: bool) -> DataFrame:
        pair_hash = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"{role}:"),
                        F.col("aid").cast("string"),
                        F.lit(":"),
                        F.col("cid").cast("string"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")
        cond = (
            (F.col("c_label") == F.col("a_label")) & (F.col("cid") != F.col("aid"))
            if same_label
            else (F.col("c_label") != F.col("a_label"))
        )
        w = Window.partitionBy("aid").orderBy(pair_hash, "cid")
        return (
            anchors.join(cand, cond)
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("aid", F.col("cid").alias(f"{role}_id"))
        )

    triplets = pick("pos", True).join(pick("neg", False), "aid")
    vec = emb.select("vec_id", "embedding")

    def cos(a: str, b: str) -> F.Column:
        dot = f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, v) -> acc + v)"
        na = f"aggregate(transform({a}, x -> CAST(x AS DOUBLE) * x), 0D, (acc, v) -> acc + v)"
        nb = f"aggregate(transform({b}, x -> CAST(x AS DOUBLE) * x), 0D, (acc, v) -> acc + v)"
        return F.floor(
            F.expr(f"({dot}) / (sqrt({na}) * sqrt({nb}))") * 10_000 + F.lit(0.5)
        ).cast("long")

    scored = (
        triplets.join(vec.withColumnsRenamed({"vec_id": "aid", "embedding": "ae"}), "aid")
        .join(vec.withColumnsRenamed({"vec_id": "pos_id", "embedding": "pe"}), "pos_id")
        .join(vec.withColumnsRenamed({"vec_id": "neg_id", "embedding": "ne"}), "neg_id")
        .select(cos("ae", "pe").alias("cos_pos_e4"), cos("ae", "ne").alias("cos_neg_e4"))
    )
    return scored.agg(
        F.count("*").cast("long").alias("n_triplets"),
        F.sum(
            F.when(
                F.col("cos_pos_e4") < F.col("cos_neg_e4") + _TRIPLET_MARGIN_E4, 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_violations"),
        F.sum(F.when(F.col("cos_pos_e4") < F.col("cos_neg_e4"), 1).otherwise(0))
        .cast("long")
        .alias("n_hard_violations"),
    )
