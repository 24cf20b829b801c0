"""Round-9 operators, part 3: sequential Elo ratings (stateful rating
recursion with a recursive-CTE oracle) and an InfoNCE contrastive-loss
audit over in-batch negatives — two training-loop primitives the surface
lacked.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.functions import detmath
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# ml: sequential Elo ratings over daily pairwise return duels
# --------------------------------------------------------------------------

_ELO_START = 1_500_000  # milli rating points
_ELO_K = 32.0
_ELO_BUCKET_MILLI = 25_000  # one expected-score bucket per 25 rating points

# E(diff) = 1/(1+10^(-d/400)) tabulated at bucket midpoints as PYTHON
# integer literals: both engines look up the SAME e6 value for the same
# bucket, so no transcendental ever runs at query time.
_ELO_E_TABLE = [
    round(1_000_000 / (1 + 10 ** (-(b * 25) / 400))) for b in range(-16, 17)
]
_ELO_E_SQL = "[" + ", ".join(str(v) for v in _ELO_E_TABLE) + "]"

# shared integer update pieces (floor() on BOTH sides — DuckDB's // would
# truncate toward zero on negatives while Python's // floors):
#   bucket = clamp(floor((ra - rb) / 25000), -16, 16)
#   delta  = floor(32 * (S_e6 - E_e6) / 1000)   (milli points, zero-sum)


def _elo_bucket(ra: int, rb: int) -> int:
    return max(-16, min(16, math.floor((ra - rb) / 25000.0)))


def _elo_delta(s_e6: int, e_e6: int) -> int:
    return math.floor(_ELO_K * (s_e6 - e_e6) / 1000.0)


_ELO_ORACLE = f"""
WITH RECURSIVE closes AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
rets AS (
  SELECT symbol, day,
         CAST(floor((c - lag(c) OVER w) * 10000.0 / lag(c) OVER w + 0.5)
           AS BIGINT) AS r
  FROM closes WINDOW w AS (PARTITION BY symbol ORDER BY day)
  QUALIFY lag(c) OVER w IS NOT NULL
),
matches AS (
  SELECT row_number() OVER (ORDER BY a.day, a.symbol, b.symbol) AS idx,
         a.symbol AS sa, b.symbol AS sb,
         CASE WHEN a.r > b.r THEN 1000000
              WHEN a.r < b.r THEN 0 ELSE 500000 END AS s_e6
  FROM rets a JOIN rets b ON b.day = a.day AND a.symbol < b.symbol
),
syms AS (SELECT DISTINCT symbol FROM rets),
-- the rating VECTOR rides each recursion row as a list of structs so the
-- recursive term references the working table exactly once; the delta is
-- hoisted into a derived subquery (DuckDB forbids subqueries inside
-- lambdas) using list_filter to pull both players' current ratings
elo(i, rs) AS (
  SELECT 0, list(struct_pack(symbol := symbol, r := CAST({_ELO_START} AS BIGINT)))
  FROM syms
  UNION ALL
  SELECT idx,
         list_transform(rs0, x -> struct_pack(
           symbol := x.symbol,
           r := x.r + CASE WHEN x.symbol = sa THEN delta
                           WHEN x.symbol = sb THEN -delta
                           ELSE CAST(0 AS BIGINT) END))
  FROM (
    SELECT m.idx, m.sa, m.sb, p.rs AS rs0,
           CAST(floor({_ELO_K} * (m.s_e6 -
             {_ELO_E_SQL}[CAST(greatest(least(floor(
               (list_filter(p.rs, y -> y.symbol = m.sa)[1].r
                - list_filter(p.rs, y -> y.symbol = m.sb)[1].r)
               / 25000.0), 16.0), -16.0) AS BIGINT) + 17]
           ) / 1000.0) AS BIGINT) AS delta
    FROM elo p JOIN matches m ON m.idx = p.i + 1
  )
),
final AS (
  SELECT rs FROM elo ORDER BY i DESC LIMIT 1
),
wins AS (
  SELECT symbol, CAST(count(*) AS BIGINT) AS n_matches,
         CAST(sum(win) AS BIGINT) AS n_wins
  FROM (
    SELECT sa AS symbol, CASE WHEN s_e6 = 1000000 THEN 1 ELSE 0 END AS win FROM matches
    UNION ALL
    SELECT sb, CASE WHEN s_e6 = 0 THEN 1 ELSE 0 END FROM matches
  ) GROUP BY symbol
)
SELECT w.symbol, w.n_matches, w.n_wins, CAST(x.r AS BIGINT) AS rating_milli
FROM final f, unnest(f.rs) AS t(x)
JOIN wins w ON w.symbol = x.symbol
ORDER BY w.symbol
"""


@register("ml_elo_ratings", oracle=_ELO_ORACLE, tags=("ml", "rlhf", "recursive"))
def ml_elo_ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential ELO ratings over daily pairwise return duels — the
    ORDER-DEPENDENT rating system (each update depends on both players'
    current ratings) that batch MM fits like `rlhf_bradley_terry`
    deliberately ignore: Elo is what leaderboards (chess, LMSYS arena)
    actually run, and its arrival-order dependence is the whole point.
    The recursion is a true sequential fold, so it runs as an
    applyInPandas kernel over the (calendar-bounded) match list while
    the ORACLE re-derives it as a recursive CTE carrying the rating
    vector as a list-of-structs (one working row per step). Exactness:
    ratings are integer milli-points, expected scores come from a
    33-entry Python-literal table indexed by the clamped rating-diff
    bucket (no logistic at query time), and both the bucket and the
    K*(S-E) update use floor() on both sides (DuckDB's // truncates on
    negatives). Updates are zero-sum by construction (delta_b =
    -delta_a). Scale: the duel list is days x C(symbols,2) — calendar-
    bounded — and the kernel ships ONE Arrow batch; at 100 TB the data-
    touching work is the daily-close rollup, one shuffle."""
    ev = load_table(spark, sf_dir, "events")
    closes = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"))
    w = Window.partitionBy("symbol").orderBy("day")
    rets = (
        closes.select("symbol", "day", F.lag("c").over(w).alias("p"), "c")
        .filter(F.col("p").isNotNull())
        .select(
            "symbol",
            "day",
            F.floor((F.col("c") - F.col("p")) * 10000.0 / F.col("p") + F.lit(0.5))
            .cast("long")
            .alias("r"),
        )
    )
    a = rets.select(F.col("symbol").alias("sa"), "day", F.col("r").alias("ra"))
    b = rets.select(F.col("symbol").alias("sb"), F.col("day").alias("day_b"), F.col("r").alias("rb"))
    matches = (
        a.join(b, (F.col("day_b") == F.col("day")) & (F.col("sa") < F.col("sb")))
        .select(
            "day",
            "sa",
            "sb",
            F.when(F.col("ra") > F.col("rb"), 1_000_000)
            .when(F.col("ra") < F.col("rb"), 0)
            .otherwise(500_000)
            .cast("long")
            .alias("s_e6"),
        )
        .withColumn("g", F.lit(1))
    )

    def elo_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["day", "sa", "sb"]).reset_index(drop=True)
        ratings: dict[str, int] = {}
        stats: dict[str, list[int]] = {}
        for s in set(pdf["sa"]) | set(pdf["sb"]):
            ratings[s] = _ELO_START
            stats[s] = [0, 0]  # matches, wins
        for sa, sb, s_e6 in zip(pdf["sa"], pdf["sb"], pdf["s_e6"]):
            e_e6 = _ELO_E_TABLE[_elo_bucket(ratings[sa], ratings[sb]) + 16]
            d = _elo_delta(int(s_e6), e_e6)
            ratings[sa] += d
            ratings[sb] -= d
            stats[sa][0] += 1
            stats[sb][0] += 1
            if s_e6 == 1_000_000:
                stats[sa][1] += 1
            elif s_e6 == 0:
                stats[sb][1] += 1
        return pd.DataFrame(
            {
                "symbol": sorted(ratings),
                "n_matches": [stats[s][0] for s in sorted(ratings)],
                "n_wins": [stats[s][1] for s in sorted(ratings)],
                "rating_milli": [ratings[s] for s in sorted(ratings)],
            }
        )

    out_schema = "symbol string, n_matches long, n_wins long, rating_milli long"
    return (
        matches.groupBy("g")
        .applyInPandas(elo_kernel, out_schema)
        .orderBy("symbol")
    )


# --------------------------------------------------------------------------
# ml: InfoNCE contrastive loss audit with in-batch negatives
# --------------------------------------------------------------------------

_NCE_PAIRS = 32  # anchors 0,2,4..62 paired with positives 1,3..63
_NCE_INV_TAU = "10.0"  # 1/temperature as a double literal

# cosine similarity via strict left folds (dot and both norms), scaled by
# 1/tau; per-anchor max shift bounds exponents in [-20, 0] so det_exp
# terms quantized at 1e12 are never zero, and the loss is a det_ln ratio
# of exact integer sums.
_NCE_DOT = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
    " list_transform(list_zip({a}, {b}), z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))),"
    " (acc, x) -> acc + x)"
)

_NCE_STAGES = [("nc_x", "x - mx")] + detmath.det_exp_stages("nc_x", "nc_w")
_NCE_WQ = "CAST(floor(nc_w * 1000000000000 + 0.5) AS BIGINT)"
_NCE_LOSS_STAGES = detmath.det_ln_ratio_stages("sum_wq", "pos_wq", "nc_loss")

_NCE_ORACLE = f"""
WITH anchors AS (
  SELECT vec_id AS aid, embedding AS av FROM embeddings
  WHERE vec_id % 2 = 0 AND vec_id < {2 * _NCE_PAIRS}
),
cands AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings
  WHERE vec_id % 2 = 1 AND vec_id < {2 * _NCE_PAIRS}
),
scored AS (
  SELECT a.aid, c.cid,
         {_NCE_DOT.format(a="a.av", b="c.cv")}
           / (sqrt({_NCE_DOT.format(a="a.av", b="a.av")})
              * sqrt({_NCE_DOT.format(a="c.cv", b="c.cv")}))
           * {_NCE_INV_TAU} AS x
  FROM anchors a CROSS JOIN cands c
),
shifted AS (
  SELECT aid, cid, x, max(x) OVER (PARTITION BY aid) AS mx FROM scored
),
wq AS (
  SELECT aid, cid, {_NCE_WQ} AS w_q
  FROM {detmath.stages_to_select(_NCE_STAGES, "shifted")}
),
per_anchor AS (
  SELECT aid,
         CAST(sum(w_q) AS BIGINT) AS sum_wq,
         CAST(max(CASE WHEN cid = aid + 1 THEN w_q END) AS BIGINT) AS pos_wq,
         CAST(sum(CASE WHEN w_q > (SELECT w2.w_q FROM wq w2
                                   WHERE w2.aid = wq.aid AND w2.cid = wq.aid + 1)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_above_pos
  FROM wq GROUP BY aid
)
SELECT CAST(aid AS BIGINT) AS anchor_id, pos_wq, sum_wq,
       CAST(n_above_pos + 1 AS BIGINT) AS pos_rank,
       CAST(floor(nc_loss * 1000000 + 0.5) AS BIGINT) AS loss_e6
FROM {detmath.stages_to_select(_NCE_LOSS_STAGES, "per_anchor")}
ORDER BY anchor_id
"""


@register("ml_infonce_loss_audit", oracle=_NCE_ORACLE, tags=("ml", "llm", "embedding"))
def ml_infonce_loss_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfoNCE contrastive loss with IN-BATCH NEGATIVES — the training
    objective behind CLIP/SimCLR/sentence-embedding models, audited
    over deterministic pairs (anchor 2k vs positive 2k+1, every other
    positive serving as a negative — exactly the in-batch trick).
    Per anchor: loss = -ln(exp(s+/tau) / sum_c exp(s_c/tau)) plus the
    positive's rank among candidates (rank 1 = the batch is 'easy').
    Exactness: cosine similarities are strict left folds (same
    addition order both engines; sqrt is IEEE-exact), the softmax is
    max-shifted det_exp quantized to 1e12 integers (exponents bounded
    in [-20, 0] by |cos| <= 1, so no clamp and no zero terms), and the
    loss is det_ln of a ratio of exact integer sums. Plan: the
    anchor x candidate grid is batch-sized (B^2, the same cost the
    training step pays), scored map-side after one broadcast; at
    100 TB you shard batches, not this plan."""
    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.filter(
        (F.col("vec_id") % 2 == 0) & (F.col("vec_id") < 2 * _NCE_PAIRS)
    ).select(F.col("vec_id").alias("aid"), F.col("embedding").alias("av"))
    cands = emb.filter(
        (F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 2 * _NCE_PAIRS)
    ).select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))

    def dot(a: str, b: str) -> str:
        return (
            f"aggregate(zip_with({a}, {b}, (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)),"
            " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )

    scored = anchors.crossJoin(F.broadcast(cands)).selectExpr(
        "aid",
        "cid",
        f"{dot('av', 'cv')} / (sqrt({dot('av', 'av')}) * sqrt({dot('cv', 'cv')}))"
        f" * {_NCE_INV_TAU} AS x",
    )
    shifted = scored.withColumn(
        "mx", F.max("x").over(Window.partitionBy("aid"))
    )
    wq = detmath.apply_stages(shifted, _NCE_STAGES).selectExpr(
        "aid", "cid", f"{_NCE_WQ} AS w_q"
    )
    pos = wq.filter(F.col("cid") == F.col("aid") + 1).select(
        F.col("aid").alias("aid_p"), F.col("w_q").alias("pos_wq")
    )
    per_anchor = (
        wq.join(F.broadcast(pos), wq.aid == pos.aid_p)
        .groupBy("aid")
        .agg(
            F.sum("w_q").cast("long").alias("sum_wq"),
            F.max("pos_wq").cast("long").alias("pos_wq"),
            F.sum(F.when(F.col("w_q") > F.col("pos_wq"), 1).otherwise(0))
            .cast("long")
            .alias("n_above_pos"),
        )
    )
    return (
        detmath.apply_stages(per_anchor, _NCE_LOSS_STAGES)
        .selectExpr(
            "CAST(aid AS BIGINT) AS anchor_id",
            "pos_wq",
            "sum_wq",
            "CAST(n_above_pos + 1 AS BIGINT) AS pos_rank",
            "CAST(floor(nc_loss * 1000000 + 0.5) AS BIGINT) AS loss_e6",
        )
        .orderBy("anchor_id")
    )
