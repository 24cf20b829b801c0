"""Pool-scaling adjudication for the two perf-weak tails (VERDICT r10
item 5): `dedup_exact_substring` (2.87x at 10x) and `dedup_lsh_scurve`
(2.00x at 10x), both carrying an "input-bound on a saturated fixed pool,
constant output" justification that has not yet been pinned by a second
measurement.

The discriminating experiment on a fixed local[32] pool is a THIRD data
point, 5x, built with the same semantics-preserving inflation as the 10x
fixture (tools/scale_curve.py): once the pool is saturated, an
input-bound plan's wall grows ~linearly in input, so the INCREMENTAL
ratio t(10x)/t(5x) sits near the data ratio 2.0. A super-linear plan
defect (e.g. candidate pairs growing quadratically with corpus size)
shows t(10x)/t(5x) well above 2 — the 1x->10x ratio alone cannot
distinguish the two, because 1x underfills the pool and absorbs work for
free. (local[64] oversubscription is NOT used: the host has exactly 32
cores, so extra threads measure scheduler noise, not capacity.)

Verdict rule printed per query: input_bound_confirmed iff
t10/t5 <= 2.3 (data ratio 2.0 + 15% timing slack).

Usage: python tools/pool_scaling.py [base_sf_dir]   # append to docs
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import us_stock_data_pipeline_spark  # noqa: F401
from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.catalog import TABLES
from us_stock_data_pipeline_spark.session import get_spark

import tools.scale_curve as sc

OUT5 = "/tmp/us_sdps_scale5"
# default = the r10 perf-weak pair; extra query names may be passed as
# argv (e.g. `python tools/pool_scaling.py sf_dir ml_naive_bayes_lang`)
QUERIES = ["dedup_exact_substring", "dedup_lsh_scurve"]
REPS = 3


def build5(spark):
    marker = os.path.join(OUT5, "_BUILT")
    src_mtime = max(
        os.stat(os.path.join(sc.BASE, f"{t}.parquet")).st_mtime for t in TABLES
    )
    if os.path.exists(marker) and os.stat(marker).st_mtime > src_mtime:
        return
    import shutil

    shutil.rmtree(OUT5, ignore_errors=True)
    os.makedirs(OUT5, exist_ok=True)
    old = sc.N_REP
    sc.N_REP = 5
    try:
        for t in TABLES:
            sc._inflate(spark, t).write.mode("overwrite").parquet(
                os.path.join(OUT5, f"{t}.parquet")
            )
    finally:
        sc.N_REP = old
    open(marker, "w").close()


def _time(fn, spark, sf_dir):
    best = float("inf")
    n = 0
    for _ in range(REPS):
        t0 = time.time()
        n = len(fn(spark, sf_dir).toPandas())
        best = min(best, time.time() - t0)
    return round(best, 3), n


def main():
    names = sys.argv[2:] if len(sys.argv) > 2 else QUERIES
    spark = get_spark("pool-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    sc.build(spark)  # the 10x fixture
    build5(spark)
    qs = registry.queries()
    out = []
    for name in names:
        t1, n1 = _time(qs[name], spark, sc.BASE)
        t5, n5 = _time(qs[name], spark, OUT5)
        t10, n10 = _time(qs[name], spark, sc.OUT)
        incr = round(t10 / t5, 2)
        rec = {
            "query": name,
            "sec_1x": t1,
            "sec_5x": t5,
            "sec_10x": t10,
            "rows": [n1, n5, n10],
            "ratio_1_to_5": round(t5 / t1, 2),
            "ratio_5_to_10": incr,
            "ratio_1_to_10": round(t10 / t1, 2),
            "input_bound_confirmed": incr <= 2.3,
        }
        out.append(rec)
        print(f"# {name}: 1x={t1}s 5x={t5}s 10x={t10}s  t10/t5={incr}x", file=sys.stderr)
    print(json.dumps({"pool_scaling": out}, indent=1))


if __name__ == "__main__":
    main()
