"""Round-12 stock, part 26: turtle-style Donchian breakout backtest —
a true position STATE MACHINE, the second operator family (after
`bars_ema`'s recursion) that Spark's declarative surface genuinely
cannot express: whether today opens a trade depends on whether
yesterday's state was flat, which depends on the whole path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

_ENTRY_N = 20  # enter long on close > prior 20-day high
_EXIT_N = 10  # exit on close < prior 10-day low

# The walk is the recursive part; the Donchian channels are plain
# windows computed BEFORE the recursion on both engines, so the state
# machine only compares exact integers. Convention pins: entries need a
# full prior-20 window; exit evaluates before entry (no same-day flip);
# an open position is force-closed at the final close.
_TURTLE_ORACLE = f"""
WITH RECURSIVE daily AS (
  SELECT event_type AS symbol,
         CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
bars AS (
  SELECT symbol, day, c,
         row_number() OVER w AS rn,
         count(*) OVER (PARTITION BY symbol) AS n,
         CASE WHEN row_number() OVER w > {_ENTRY_N}
              THEN max(c) OVER (w ROWS BETWEEN {_ENTRY_N} PRECEDING AND 1 PRECEDING)
              END AS high20,
         CASE WHEN row_number() OVER w > {_EXIT_N}
              THEN min(c) OVER (w ROWS BETWEEN {_EXIT_N} PRECEDING AND 1 PRECEDING)
              END AS low10
  FROM daily
  WINDOW w AS (PARTITION BY symbol ORDER BY day)
),
walk(symbol, rn, n, c, pos, entry_c, exited, pnl) AS (
  SELECT symbol, rn, n, c, 0, CAST(0 AS BIGINT), 0, CAST(0 AS BIGINT)
  FROM bars WHERE rn = 1
  UNION ALL
  SELECT b.symbol, b.rn, b.n, b.c,
         CASE WHEN w.pos = 1 AND b.c < b.low10 THEN 0
              WHEN w.pos = 0 AND b.high20 IS NOT NULL AND b.c > b.high20 THEN 1
              ELSE w.pos END,
         CASE WHEN w.pos = 0 AND b.high20 IS NOT NULL AND b.c > b.high20 THEN b.c
              WHEN w.pos = 1 AND b.c < b.low10 THEN CAST(0 AS BIGINT)
              ELSE w.entry_c END,
         CASE WHEN w.pos = 1 AND b.c < b.low10 THEN 1 ELSE 0 END,
         CASE WHEN w.pos = 1 AND b.c < b.low10 THEN b.c - w.entry_c
              ELSE CAST(0 AS BIGINT) END
  FROM bars b JOIN walk w ON b.symbol = w.symbol AND b.rn = w.rn + 1
),
trades AS (
  SELECT symbol, pnl, 0 AS forced FROM walk WHERE exited = 1
  UNION ALL
  SELECT symbol, c - entry_c AS pnl, 1 AS forced
  FROM walk WHERE rn = n AND pos = 1
)
SELECT symbol,
       CAST(count(*) AS BIGINT) AS n_trades,
       CAST(sum(CASE WHEN pnl > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_wins,
       CAST(sum(pnl) AS BIGINT) AS total_pnl_cents,
       CAST(max(pnl) AS BIGINT) AS best_trade_cents,
       CAST(min(pnl) AS BIGINT) AS worst_trade_cents,
       CAST(sum(forced) AS BIGINT) AS n_forced_exits
FROM trades
GROUP BY symbol
ORDER BY symbol
"""


@register("bars_turtle_backtest", oracle=_TURTLE_ORACLE, tags=("stock", "udf", "recursive"), bench=True)
def bars_turtle_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turtle-style Donchian breakout backtest: enter long when the
    close breaks the prior {_ENTRY_N}-day high, exit when it breaks
    the prior {_EXIT_N}-day low, force-close at the end — a position
    STATE MACHINE whose today depends on the entire path, the exact
    semantics window frames cannot recurse over (same architectural
    slot as `bars_ema`, reserved for applyInPandas). The Donchian
    channels are plain Spark windows on exact integer cents computed
    BEFORE the kernel, so the Python walk only compares integers —
    bit-identical to the oracle's recursive CTE, which replays the
    same walk one row per step. Convention pins (same on both sides):
    exit evaluates before entry, no same-day flip, entries need a
    full prior window. Per-symbol history arrives as one Arrow batch
    on one shuffle; output is the per-symbol trade ledger summary.
    At 100 TB the walk parallelizes per symbol — state is O(1) per
    series, and a series longer than one batch chunks by date with
    carried-in (pos, entry) state, same kernel."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.round(F.max_by("value", "event_id") * 100).cast("long").alias("c"))
    w = Window.partitionBy("symbol").orderBy("day")
    bars = daily.select(
        "symbol",
        "day",
        "c",
        F.row_number().over(w).alias("rn"),
        F.when(
            F.row_number().over(w) > _ENTRY_N,
            F.max("c").over(w.rowsBetween(-_ENTRY_N, -1)),
        ).alias("high20"),
        F.when(
            F.row_number().over(w) > _EXIT_N,
            F.min("c").over(w.rowsBetween(-_EXIT_N, -1)),
        ).alias("low10"),
    )

    def turtle_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rn").reset_index(drop=True)
        sym = pdf["symbol"].iloc[0]
        pos, entry = 0, 0
        pnls: list[int] = []
        forced: list[int] = []
        for i in range(1, len(pdf)):  # rn=1 row is the flat seed
            c = int(pdf["c"].iloc[i])
            high20 = pdf["high20"].iloc[i]
            low10 = pdf["low10"].iloc[i]
            if pos == 1 and not pd.isna(low10) and c < int(low10):
                pnls.append(c - entry)
                forced.append(0)
                pos, entry = 0, 0
            elif pos == 0 and not pd.isna(high20) and c > int(high20):
                pos, entry = 1, c
        if pos == 1:
            pnls.append(int(pdf["c"].iloc[len(pdf) - 1]) - entry)
            forced.append(1)
        if not pnls:
            return pd.DataFrame(
                columns=[
                    "symbol",
                    "n_trades",
                    "n_wins",
                    "total_pnl_cents",
                    "best_trade_cents",
                    "worst_trade_cents",
                    "n_forced_exits",
                ]
            )
        return pd.DataFrame(
            {
                "symbol": [sym],
                "n_trades": [len(pnls)],
                "n_wins": [sum(1 for p in pnls if p > 0)],
                "total_pnl_cents": [sum(pnls)],
                "best_trade_cents": [max(pnls)],
                "worst_trade_cents": [min(pnls)],
                "n_forced_exits": [sum(forced)],
            }
        )

    out_schema = (
        "symbol string, n_trades long, n_wins long, total_pnl_cents long,"
        " best_trade_cents long, worst_trade_cents long, n_forced_exits long"
    )
    return (
        bars.groupBy("symbol").applyInPandas(turtle_kernel, out_schema).orderBy("symbol")
    )
