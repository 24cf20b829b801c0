"""Round-10 operators, part 3: GRPO group-relative advantages (the
critic-free RLHF normalization of Shao et al. 2024).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# RLHF: GRPO group-relative advantage normalization
# --------------------------------------------------------------------------

_GRPO_G = 200  # responses sharing (o_custkey % G) form one "prompt group"

# adv = (r - mean) / std over the group simplifies to EXACT integers up
# to one IEEE sqrt: adv = (n*r - sum) / sqrt(n*sum_sq - sum^2). Both
# engines evaluate the IDENTICAL expression tree on identical BIGINTs,
# and sqrt is exactly rounded by IEEE-754, so the e4 quantization is
# engine-proof (the fragility class is libm transcendentals and float
# SUM order — neither appears here; see tools/transcendental_audit.py).
_GRPO_ORACLE = f"""
WITH r AS (
  SELECT o_orderkey, o_orderpriority,
         o_custkey % {_GRPO_G} AS grp,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS reward
  FROM orders
),
g AS (
  SELECT grp,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(reward) AS BIGINT) AS s,
         CAST(sum(reward * reward) AS BIGINT) AS ss
  FROM r GROUP BY grp
),
adv AS (
  SELECT r.o_orderpriority,
         CAST(floor((g.n * r.reward - g.s) * 10000.0
                    / sqrt(CAST(g.n AS DOUBLE) * CAST(g.ss AS DOUBLE)
                           - CAST(g.s AS DOUBLE) * CAST(g.s AS DOUBLE)) + 0.5)
              AS BIGINT) AS adv_e4
  FROM r JOIN g USING (grp)
  WHERE g.n >= 2
    AND CAST(g.n AS DOUBLE) * CAST(g.ss AS DOUBLE)
        - CAST(g.s AS DOUBLE) * CAST(g.s AS DOUBLE) > 0
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_responses,
       CAST(sum(adv_e4) AS BIGINT) AS sum_adv_e4,
       CAST(min(adv_e4) AS BIGINT) AS min_adv_e4,
       CAST(max(adv_e4) AS BIGINT) AS max_adv_e4
FROM adv
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("rlhf_grpo_advantage", oracle=_GRPO_ORACLE, tags=("llm", "rlhf"))
def rlhf_grpo_advantage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRPO group-relative advantages (Shao et al. 2024, DeepSeekMath —
    the critic-free PPO replacement modern RLHF runs use): responses
    sharing a prompt group are normalized against EACH OTHER,
    advantage_i = (r_i - mean(group)) / std(group), no value network.
    The whole computation collapses to adv = (n*r - sum) /
    sqrt(n*sum_sq - sum^2): the numerator and the group sums are exact
    BIGINTs; the discriminant is formed in DOUBLE (its products pass
    2^63 at sf0.1 group sizes) by the IDENTICAL IEEE expression tree in
    both engines, and IEEE multiply/subtract/sqrt are exactly rounded —
    so the e4 advantages hash-match without any detmath machinery (the
    fragility class is libm and float SUM order, neither used). Degenerate
    groups (n < 2 or zero variance) are excluded, as real GRPO
    implementations do. Plan: one scan, one group agg, one broadcast
    join back (the group table is tiny), one rollup — at 100 TB the
    group stats are a map-side partial aggregate and the join
    broadcasts; nothing shuffles the response table twice."""
    r = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        (F.col("o_custkey") % _GRPO_G).alias("grp"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("reward"),
    )
    g = r.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("reward").cast("long").alias("s"),
        F.sum(F.col("reward") * F.col("reward")).cast("long").alias("ss"),
    )
    # The discriminant is computed in DOUBLE in BOTH engines (sf0.1
    # group sizes overflow BIGINT on n*ss and s*s): each factor is an
    # exact BIGINT, the products/subtraction are the IDENTICAL IEEE
    # expression tree on both sides, so rounding is engine-proof — the
    # hash contract needs tree identity, not integer exactness.
    disc = F.col("n").cast("double") * F.col("ss").cast("double") - F.col(
        "s"
    ).cast("double") * F.col("s").cast("double")
    adv = (
        r.join(F.broadcast(g), "grp")
        .filter((F.col("n") >= 2) & (disc > 0))
        .select(
            "o_orderpriority",
            F.floor(
                (F.col("n") * F.col("reward") - F.col("s")) * 10000.0
                / F.sqrt(disc)
                + 0.5
            )
            .cast("long")
            .alias("adv_e4"),
        )
    )
    return (
        adv.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_responses"),
            F.sum("adv_e4").cast("long").alias("sum_adv_e4"),
            F.min("adv_e4").cast("long").alias("min_adv_e4"),
            F.max("adv_e4").cast("long").alias("max_adv_e4"),
        )
        .orderBy("o_orderpriority")
    )
