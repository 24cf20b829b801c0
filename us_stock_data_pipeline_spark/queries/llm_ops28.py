"""Round-29 LLM ops, part 28: best-of-n reward scaling and MoE router
load-balance auditing — serving/training-side operators for modern LLM
stacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Best-of-n reward curve (disjoint-block estimator)
# --------------------------------------------------------------------------

_BON_NS = (1, 2, 4, 8)

_BON_ORACLE = f"""
WITH scored AS (
  -- deterministic "reward model": a seeded hash score per sample,
  -- plus a quality tilt from document length so the curve is not flat
  SELECT doc_id,
         CAST(('0x' || substring(md5('rm:' || CAST(doc_id AS VARCHAR)), 1, 8))
           AS BIGINT) % 1000000 + n_chars AS reward,
         CAST(('0x' || substring(md5('blk:' || CAST(doc_id AS VARCHAR)), 1, 8))
           AS BIGINT) AS block_key
  FROM documents
),
ladder AS (SELECT unnest(ARRAY{list(_BON_NS)}) AS n),
ranked AS (
  SELECT l.n, s.reward,
         row_number() OVER (PARTITION BY l.n ORDER BY s.block_key, s.doc_id) AS rk
  FROM scored s CROSS JOIN ladder l
),
blocks AS (
  SELECT n, (rk - 1) // n AS block_id, CAST(max(reward) AS BIGINT) AS best
  FROM ranked
  GROUP BY n, block_id
  HAVING count(*) = n
)
SELECT n,
       CAST(count(*) AS BIGINT) AS n_blocks,
       CAST(sum(best) // count(*) AS BIGINT) AS mean_best_reward
FROM blocks
GROUP BY n
ORDER BY n
"""


@register("rlhf_best_of_n_curve", oracle=_BON_ORACLE, tags=("llm", "rlhf", "eval"))
def rlhf_best_of_n_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-of-n scaling curve — how much reward does sampling n
    candidates and keeping the argmax buy? The unbiased disjoint-block
    estimator: shuffle samples into a seeded deterministic order
    (hash block key), cut consecutive blocks of n, average the block
    maxima — blocks never share a sample, so the estimate is the
    true E[max of n iid draws] without the correlation bias of
    overlapping resampling. Rewards are a seeded-hash reward model
    with a length tilt; everything is exact integers, and the
    resulting curve must be monotone in n (pinned by test) — the
    shape that calibrates best-of-n serving cost against reward gain.
    Plan: one scored scan, a 4-rung ladder fan-out, one rank window
    per rung, one block max + mean."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit("rm:"), F.col("doc_id").cast("string"))), 1, 8),
                16,
                10,
            ).cast("long")
            % 1_000_000
            + F.col("n_chars")
        ).alias("reward"),
        F.conv(
            F.substring(F.md5(F.concat(F.lit("blk:"), F.col("doc_id").cast("string"))), 1, 8),
            16,
            10,
        )
        .cast("long")
        .alias("block_key"),
    )
    from pyspark.sql import Window

    ladder = F.array(*[F.lit(n) for n in _BON_NS])
    ranked = scored.select(
        "reward", "block_key", "doc_id", F.explode(ladder).alias("n")
    ).select(
        "n",
        "reward",
        F.row_number()
        .over(Window.partitionBy("n").orderBy("block_key", "doc_id"))
        .alias("rk"),
    )
    blocks = (
        ranked.groupBy("n", F.expr("(rk - 1) div n").alias("block_id"))
        .agg(F.max("reward").cast("long").alias("best"), F.count("*").alias("cnt"))
        .filter(F.col("cnt") == F.col("n"))
    )
    return (
        blocks.groupBy(F.col("n").cast("long").alias("n"))
        .agg(
            F.count("*").cast("long").alias("n_blocks"),
            F.expr("CAST(sum(best) div count(*) AS BIGINT)").alias("mean_best_reward"),
        )
        .orderBy("n")
    )


# --------------------------------------------------------------------------
# MoE router load-balance audit
# --------------------------------------------------------------------------

_MOE_EXPERTS = 8

_MOE_ORACLE = f"""
WITH tokens AS (
  SELECT CAST(('0x' || substring(md5(w), 1, 12)) AS BIGINT) % {_MOE_EXPERTS}
           AS expert
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
),
loads AS (
  SELECT expert, CAST(count(*) AS BIGINT) AS n_tokens FROM tokens GROUP BY expert
),
tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS n FROM loads)
SELECT l.expert,
       l.n_tokens,
       CAST(l.n_tokens * 1000000 // t.n AS BIGINT) AS load_share_e6,
       -- per-expert entropy term -p*ln(p), micro-quantized
       CAST(floor(-(CAST(l.n_tokens AS DOUBLE) / t.n)
                  * ln(CAST(l.n_tokens AS DOUBLE) / t.n) * 1000000 + 0.5)
         AS BIGINT) AS entropy_term_e6,
       -- switch-transformer aux loss term: E * f_i * P_i with P_i = f_i
       -- under the hash router (token->expert is deterministic)
       CAST({_MOE_EXPERTS} * l.n_tokens * 1000000 // t.n * l.n_tokens // t.n
         AS BIGINT) AS aux_loss_term_e6
FROM loads l CROSS JOIN tot t
ORDER BY l.expert
"""


@register("moe_load_balance_audit", oracle=_MOE_ORACLE, tags=("llm", "serving"))
def moe_load_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-of-Experts router load audit: hash-route every token to
    one of {_MOE_EXPERTS} experts (the deterministic stand-in for a
    learned router) and report per-expert load share, the entropy
    terms whose sum measures balance (ln {_MOE_EXPERTS} = perfectly
    uniform), and the Switch-Transformer auxiliary-loss terms
    E * f_i * P_i — the quantity a training loop adds to the loss to
    PREVENT expert collapse, computed here as the batch audit a data
    pipeline runs over token dumps to diagnose it. Load shares and
    aux terms are exact integer ratios; only the entropy term touches
    a double (identical ln expression both engines, micro-quantized).
    Plan: one tokenize + one {_MOE_EXPERTS}-row aggregate — the audit
    is free at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(F.explode(F.split("text", " ")).alias("w")).select(
        (
            F.conv(F.substring(F.md5("w"), 1, 12), 16, 10).cast("long") % _MOE_EXPERTS
        ).alias("expert")
    )
    loads = tokens.groupBy("expert").agg(F.count("*").cast("long").alias("n_tokens"))
    tot = loads.agg(F.sum("n_tokens").cast("long").alias("n"))
    joined = loads.crossJoin(F.broadcast(tot))
    p = F.col("n_tokens").cast("double") / F.col("n")
    return joined.select(
        F.col("expert").cast("long").alias("expert"),
        "n_tokens",
        F.expr("CAST(n_tokens * 1000000 div n AS BIGINT)").alias("load_share_e6"),
        F.floor(-p * F.log(p) * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("entropy_term_e6"),
        F.expr(
            f"CAST({_MOE_EXPERTS} * n_tokens * 1000000 div n * n_tokens div n"
            " AS BIGINT)"
        ).alias("aux_loss_term_e6"),
    ).orderBy("expert")
