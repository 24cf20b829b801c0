"""Bar schemas, declared once as StructType constants.

Parity: the reference declares RAW_SCHEMA identically in two places
(`symbols(historical)/schemas.py:6-15` and
`1m-seesion-pipeline/schemas.py:10-21`) and declares — but never
enforces — a strict curated AGG_SCHEMA
(`1m-seesion-pipeline/schemas.py:29-41`: "Type must strict + stable",
volume/trades LongType, yet the written data keeps them Double).
This engine enforces the declared contract: CURATED_SCHEMA is what
`bars.curate` actually produces.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Wire format (Polygon/Massive-style aggregate bars): t = epoch millis,
# o/h/l/c = prices, v = volume, vw = vwap, n = trade count. All nullable —
# the API omits fields; null-preservation is part of the contract.
RAW_SCHEMA = T.StructType(
    [
        T.StructField("t", T.LongType(), True),
        T.StructField("o", T.DoubleType(), True),
        T.StructField("h", T.DoubleType(), True),
        T.StructField("l", T.DoubleType(), True),
        T.StructField("c", T.DoubleType(), True),
        T.StructField("v", T.DoubleType(), True),
        T.StructField("vw", T.DoubleType(), True),
        T.StructField("n", T.DoubleType(), True),
    ]
)

# Curated (silver) bar: the reference's AGG_SCHEMA contract, enforced.
CURATED_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("symbol", T.StringType(), False),
        T.StructField("open", T.DoubleType(), True),
        T.StructField("high", T.DoubleType(), True),
        T.StructField("low", T.DoubleType(), True),
        T.StructField("close", T.DoubleType(), True),
        T.StructField("volume", T.LongType(), True),
        T.StructField("vwap", T.DoubleType(), True),
        T.StructField("trades", T.LongType(), True),
    ]
)

SESSION_BANDS = {
    # Inclusive hhmm bands in America/New_York — exact parity with
    # `1m-seesion-pipeline/utils.py:7-19`.
    "premarket": (400, 929),
    "regular": (930, 1600),
    "afterhours": (1601, 2000),
}
