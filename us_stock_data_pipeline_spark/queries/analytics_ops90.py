"""Round-97 analytics, part 90: IRR via fixed-step bisection — an
iterative numerical root-finder with an exact recursive-CTE oracle.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

_IRR_ITERS = 24
_IRR_HI = 10.0  # 1000% upper bracket

# pinned (1+r)^t up to t=6 by explicit left-assoc multiplication, so both
# engines run identical IEEE ops (library pow() is not guaranteed
# correctly rounded and may differ in the last ulp across runtimes)
_POW_SQL = """CASE t WHEN 0 THEN 1.0 WHEN 1 THEN {u} WHEN 2 THEN {u}*{u}
  WHEN 3 THEN {u}*{u}*{u} WHEN 4 THEN {u}*{u}*{u}*{u}
  WHEN 5 THEN {u}*{u}*{u}*{u}*{u} ELSE {u}*{u}*{u}*{u}*{u}*{u} END"""

_IRR_ORACLE = f"""
WITH RECURSIVE rev AS (
  SELECT n.n_name AS nation,
         year(o.o_orderdate) - (SELECT min(year(o_orderdate)) FROM orders) AS t,
         CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY n.n_name, year(o.o_orderdate)
),
-- year-0 revenue is the capital outlay (negative); later years pay back
cf AS (
  SELECT nation, t, CASE WHEN t = 0 THEN -cents ELSE cents END AS cf
  FROM rev
),
brackets AS (
  -- bisection needs a sign change on [0, {_IRR_HI}]: NPV(0) = sum cf > 0
  -- and NPV({_IRR_HI}) < 0 (per-term micro-quantized, order-free)
  SELECT nation FROM cf GROUP BY nation
  HAVING sum(cf) > 0
     AND sum(CAST(floor(CAST(cf AS DOUBLE)
                        / ({_POW_SQL.format(u=(1.0 + _IRR_HI))}) * 1000000 + 0.5)
                  AS BIGINT)) < 0
),
bis(nation, it, lo, hi) AS (
  -- seeds MUST cast to DOUBLE: bare 0.0/10.0 literals type the recursion
  -- as DECIMAL(3,1) in DuckDB and every midpoint silently rounds
  SELECT nation, 0, CAST(0.0 AS DOUBLE), CAST({_IRR_HI} AS DOUBLE)
  FROM brackets
  UNION ALL
  SELECT s.nation, s.it + 1,
         CASE WHEN s.npv > 0 THEN s.mid ELSE s.lo END,
         CASE WHEN s.npv > 0 THEN s.hi ELSE s.mid END
  FROM (
    SELECT b.nation, b.it, b.lo, b.hi, (b.lo + b.hi) / 2 AS mid,
           sum(CAST(floor(CAST(c.cf AS DOUBLE)
                          / ({_POW_SQL.format(u="(1.0 + (b.lo + b.hi) / 2)")})
                          * 1000000 + 0.5) AS BIGINT)) AS npv
    FROM bis b JOIN cf c ON c.nation = b.nation
    WHERE b.it < {_IRR_ITERS}
    GROUP BY b.nation, b.it, b.lo, b.hi
  ) s
)
SELECT nation,
       CAST(floor((lo + hi) / 2 * 1000000 + 0.5) AS BIGINT) AS irr_micro
FROM bis WHERE it = {_IRR_ITERS}
ORDER BY nation
"""


def _pow_chain(u: float, t: int) -> float:
    """Left-assoc repeated multiplication, mirroring the SQL CASE."""
    r = 1.0
    for _ in range(t):
        r = r * u
    return r


@register("finance_irr_bisection", oracle=_IRR_ORACLE, tags=("finance", "udf", "recursive"))
def finance_irr_bisection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Internal rate of return per nation via {_IRR_ITERS} fixed
    bisection steps: the first-year order revenue is the capital
    outlay, later years the payback, and IRR is the discount rate
    where NPV crosses zero — the canonical ITERATIVE NUMERICAL
    root-finder, a workload class (fixed-point solvers) beyond the
    closed-form batteries (`finance_amortization_schedule` inverts in
    closed form; IRR has none past 4 periods by Abel-Ruffini).
    Determinism engineering: bisection midpoints are dyadic rationals
    (exact in binary floating point), (1+r)^t expands to pinned
    left-assoc multiplication chains (library pow() is not correctly-
    rounded and can differ across runtimes), and each NPV term
    micro-quantizes before the order-free integer sum — so all
    {_IRR_ITERS} iterations agree bit-for-bit between the
    applyInPandas kernel and the recursive-CTE oracle. Plan: one
    dim-broadcast rollup to (nation, year) cashflows, then a kernel
    over 25 tiny groups; iterations never re-touch facts."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    y0 = o.agg(F.min(F.year("o_orderdate")).alias("y0"))
    rev = (
        o.join(F.broadcast(c.select("c_custkey", "c_nationkey")), o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_name")), F.col("c_nationkey") == F.col("n_nationkey"))
        .crossJoin(F.broadcast(y0))
        .groupBy(F.col("n_name").alias("nation"), (F.year("o_orderdate") - F.col("y0")).alias("t"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
    )
    cf = rev.select(
        "nation", "t", F.when(F.col("t") == 0, -F.col("cents")).otherwise(F.col("cents")).alias("cf")
    )

    def irr_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        flows = list(zip(pdf["t"].astype(int), pdf["cf"].astype(int)))

        def npv_q(r: float) -> int:
            return sum(
                math.floor(cfv / _pow_chain(1.0 + r, int(t)) * 1_000_000 + 0.5)
                for t, cfv in flows
            )

        if not (sum(cfv for _, cfv in flows) > 0 and npv_q(_IRR_HI) < 0):
            return pd.DataFrame({"nation": [], "irr_micro": []})
        lo, hi = 0.0, _IRR_HI
        for _ in range(_IRR_ITERS):
            mid = (lo + hi) / 2
            if npv_q(mid) > 0:
                lo = mid
            else:
                hi = mid
        return pd.DataFrame(
            {
                "nation": [pdf["nation"].iloc[0]],
                "irr_micro": [math.floor((lo + hi) / 2 * 1_000_000 + 0.5)],
            }
        )

    out_schema = "nation string, irr_micro long"
    return cf.groupBy("nation").applyInPandas(irr_kernel, out_schema).orderBy("nation")
