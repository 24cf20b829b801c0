"""Round-88 analytics, part 82: unrestricted Damerau-Levenshtein
distance (Lowrance-Wagner kernel vs the engine builtin) and a 2-state
Kleinberg-style burst filter with exact integer Viterbi costs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Damerau-Levenshtein (unrestricted) over adjacent part names per brand
# --------------------------------------------------------------------------

_DL_TOPK = 5

_DL_ORACLE = f"""
WITH names AS (
  SELECT DISTINCT p_brand AS brand, p_name AS name FROM part
),
ranked AS (
  SELECT brand, name,
         row_number() OVER (PARTITION BY brand ORDER BY name) AS rn
  FROM names
),
pairs AS (
  SELECT brand, rn, name AS name_a,
         lead(name) OVER (PARTITION BY brand ORDER BY rn) AS name_b
  FROM ranked WHERE rn <= {_DL_TOPK}
)
SELECT brand, CAST(rn AS BIGINT) AS pair_idx, name_a, name_b,
       CAST(damerau_levenshtein(name_a, name_b) AS BIGINT) AS dl_distance
FROM pairs
WHERE name_b IS NOT NULL
ORDER BY brand, pair_idx
"""


def _dl_distance(sa: pd.Series, sb: pd.Series) -> pd.Series:
    """Unrestricted Damerau-Levenshtein (Lowrance-Wagner): transposed
    characters may later be edited between, unlike the OSA restriction
    ('ca'->'abc' is 2 here, 3 under OSA)."""
    out = []
    for a, b in zip(sa, sb):
        n, m = len(a), len(b)
        maxd = n + m
        d = [[maxd] * (m + 2) for _ in range(n + 2)]
        for i in range(n + 1):
            d[i + 1][1] = i
        for j in range(m + 1):
            d[1][j + 1] = j
        da: dict[str, int] = {}
        for i in range(1, n + 1):
            db = 0
            for j in range(1, m + 1):
                k = da.get(b[j - 1], 0)
                l_ = db
                if a[i - 1] == b[j - 1]:
                    cost = 0
                    db = j
                else:
                    cost = 1
                d[i + 1][j + 1] = min(
                    d[i][j] + cost,
                    d[i + 1][j] + 1,
                    d[i][j + 1] + 1,
                    d[k][l_] + (i - k - 1) + 1 + (j - l_ - 1),
                )
            da[a[i - 1]] = i
        out.append(d[n + 1][m + 1])
    return pd.Series(out)


@register("text_damerau_levenshtein", oracle=_DL_ORACLE, tags=("text", "udf", "dedup"))
def text_damerau_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unrestricted Damerau-Levenshtein distance between adjacent part
    names within each brand: Levenshtein plus TRANSPOSITIONS as a unit
    edit, the right metric for typo-shaped fuzzy matching ('form' vs
    'from' is 1 here, 2 under plain `text_edit_distance`). Spark has
    no built-in, so the Lowrance-Wagner DP — the FULL variant where a
    transposed pair may be edited between later, which the common OSA
    shortcut forbids — runs as an Arrow-batched pandas UDF; the oracle
    is DuckDB's native damerau_levenshtein, making this a true
    independent-implementation cross-check of a nontrivial algorithm
    (probed: 'ca'->'abc' = 2, so the builtin is the unrestricted
    variant). Distances are exact small integers. Plan: distinct-name
    dedup, one per-brand window for the adjacent pairing, kernel over
    dimension-sized pairs; at corpus scale the pairing stays inside
    each blocking key exactly like `dedup_survivor_pick`."""
    p = load_table(spark, sf_dir, "part")
    names = p.select(F.col("p_brand").alias("brand"), F.col("p_name").alias("name")).distinct()
    w = Window.partitionBy("brand").orderBy("name")
    ranked = names.select("brand", "name", F.row_number().over(w).alias("rn")).filter(
        F.col("rn") <= _DL_TOPK
    )
    w2 = Window.partitionBy("brand").orderBy("rn")
    pairs = ranked.select(
        "brand",
        F.col("rn").cast("long").alias("pair_idx"),
        F.col("name").alias("name_a"),
        F.lead("name").over(w2).alias("name_b"),
    ).filter(F.col("name_b").isNotNull())
    from pyspark.sql.functions import pandas_udf

    dl = pandas_udf(_dl_distance, "long")
    return pairs.select(
        "brand", "pair_idx", "name_a", "name_b", dl("name_a", "name_b").alias("dl_distance")
    ).orderBy("brand", "pair_idx")


# --------------------------------------------------------------------------
# Kleinberg-style 2-state burst filter: exact integer Viterbi costs
# --------------------------------------------------------------------------

# per-state emission cost for an inter-event gap g (days, integer):
# cost_s = RATE_s * g - LOGRATE_s, all in exact integer micro-nats;
# the high state doubles the rate. Switching cost GAMMA discourages
# flapping. Rates are per-day micro-nats chosen for daily event data.
_B_RATE0 = 500_000       # lambda0 = 0.5/day in micro
_B_LOGR0 = -693_147      # round(ln(0.5) * 1e6)
_B_RATE1 = 2_000_000     # lambda1 = 2/day in micro
_B_LOGR1 = 693_147       # round(ln(2.0) * 1e6)
_B_GAMMA = 1_000_000     # state-switch cost, micro-nats

_BURST_ORACLE = f"""
WITH RECURSIVE daily AS (
  SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events GROUP BY 1, 2
),
gaps AS (
  SELECT symbol, row_number() OVER w - 1 AS rn,
         CAST(date_diff('day', lag(day) OVER w, day) AS BIGINT) AS g
  FROM daily WINDOW w AS (PARTITION BY symbol ORDER BY day)
  QUALIFY lag(day) OVER w IS NOT NULL
),
-- forward Viterbi over 2 states with exact integer costs: c0/c1 are the
-- cheapest path costs ending in low/high state; burst_steps counts steps
-- where the high state is strictly cheaper
vit(symbol, rn, c0, c1, burst_steps) AS (
  SELECT symbol, rn,
         {_B_RATE0} * g - {_B_LOGR0},
         {_B_RATE1} * g - {_B_LOGR1} + {_B_GAMMA},
         CASE WHEN {_B_RATE1} * g - {_B_LOGR1} + {_B_GAMMA}
                   < {_B_RATE0} * g - {_B_LOGR0} THEN 1 ELSE 0 END
  FROM gaps WHERE rn = 1
  UNION ALL
  SELECT g.symbol, g.rn,
         least(v.c0, v.c1 + {_B_GAMMA}) + {_B_RATE0} * g.g - {_B_LOGR0},
         least(v.c1, v.c0 + {_B_GAMMA}) + {_B_RATE1} * g.g - {_B_LOGR1},
         v.burst_steps
         + CASE WHEN least(v.c1, v.c0 + {_B_GAMMA}) + {_B_RATE1} * g.g - {_B_LOGR1}
                     < least(v.c0, v.c1 + {_B_GAMMA}) + {_B_RATE0} * g.g - {_B_LOGR0}
                THEN 1 ELSE 0 END
  FROM gaps g JOIN vit v ON g.symbol = v.symbol AND g.rn = v.rn + 1
),
final AS (
  SELECT symbol, max(rn) AS n_gaps FROM vit GROUP BY symbol
)
SELECT f.symbol, CAST(f.n_gaps AS BIGINT) AS n_gaps,
       CAST(v.c0 AS BIGINT) AS cost_low_micro,
       CAST(v.c1 AS BIGINT) AS cost_high_micro,
       CAST(v.burst_steps AS BIGINT) AS burst_steps
FROM final f JOIN vit v ON v.symbol = f.symbol AND v.rn = f.n_gaps
ORDER BY f.symbol
"""


@register("events_kleinberg_burst", oracle=_BURST_ORACLE, tags=("analytics", "udf", "recursive"))
def events_kleinberg_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kleinberg-style 2-state burst filter over per-symbol activity
    gaps: a low-rate and a double-rate state with a switching penalty,
    solved by the forward Viterbi recursion c_s(t) = min over prev
    state (+gamma if switching) + emission cost — the principled burst
    detector (vs `events_alert_debounce`'s fixed cooldown), and a DP
    whose two coupled running minima no window frame can express.
    Emission costs are EXACT integer micro-nats (rate*gap - log-rate,
    with the two log-rate constants pre-quantized), so the kernel and
    the recursive-CTE oracle agree exactly forever. Output per symbol:
    terminal path costs for both states and how many steps the high
    state was strictly cheaper (a burstiness readout that needs no
    backtrace). Plan: daily-presence rollup, one shuffle on symbol,
    applyInPandas kernel with O(1) state per step."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.lit(1).alias("one"))
    w = Window.partitionBy("symbol").orderBy("day")
    gaps = (
        daily.select(
            "symbol",
            "day",
            F.datediff(F.col("day"), F.lag("day").over(w)).cast("long").alias("g"),
        )
        .filter(F.col("g").isNotNull())
    )

    def burst_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        c0 = c1 = None
        bursts = 0
        for g in pdf["g"]:
            g = int(g)
            e0 = _B_RATE0 * g - _B_LOGR0
            e1 = _B_RATE1 * g - _B_LOGR1
            if c0 is None:
                c0, c1 = e0, e1 + _B_GAMMA
            else:
                c0, c1 = (
                    min(c0, c1 + _B_GAMMA) + e0,
                    min(c1, c0 + _B_GAMMA) + e1,
                )
            if c1 < c0:
                bursts += 1
        return pd.DataFrame(
            {
                "symbol": [pdf["symbol"].iloc[0]],
                "n_gaps": [len(pdf)],
                "cost_low_micro": [c0],
                "cost_high_micro": [c1],
                "burst_steps": [bursts],
            }
        )

    out_schema = (
        "symbol string, n_gaps long, cost_low_micro long, "
        "cost_high_micro long, burst_steps long"
    )
    return gaps.groupBy("symbol").applyInPandas(burst_kernel, out_schema).orderBy("symbol")
