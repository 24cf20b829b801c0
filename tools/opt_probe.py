"""Optimization probe: per-query plan capture + noop-sink timing.

For each named query: builds the DataFrame (timing the fn() call, which
for versioned-table/streaming operators contains the real work), writes
`.explain("formatted")` to plans/<tag>/<name>_<suffix>.txt, then times
the noop-sink execution of the returned frame (guide §1.4) best-of-N.

Usage:
    python tools/opt_probe.py [--sf DIR] [--tag r13] [--suffix before]
                              [--reps 3] query [query ...]
Prints one JSON line: {name: {"build_s":..,"exec_s":..,"total_s":..}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import us_stock_data_pipeline_spark  # noqa: F401
from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default="r13")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = get_spark("opt-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plan_dir = os.path.join(root, "plans", args.tag)
    os.makedirs(plan_dir, exist_ok=True)

    qs = registry.queries()
    out: dict[str, dict] = {}
    for name in args.queries:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"opt-probe warm: {name}")
        # warm-up rep (codegen, file-status caches) — not measured
        try:
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(f"# {name}: WARM ERROR {e}", file=sys.stderr)
            continue
        if not args.no_plan:
            path = os.path.join(plan_dir, f"{name}_{args.suffix}.txt")
            with open(path, "w", encoding="utf-8") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        # Report the best-total rep's OWN build/exec split (advisor r13
        # low): independent minima across reps could come from different
        # reps and not sum to total_s, confusing before/after comparisons.
        best_b = best_e = best_t = float("inf")
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"opt-probe: {name}")
            t0 = time.time()
            df = fn(spark, args.sf)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            if t2 - t0 < best_t:
                best_b, best_e, best_t = t1 - t0, t2 - t1, t2 - t0
        out[name] = {
            "build_s": round(best_b, 3),
            "exec_s": round(best_e, 3),
            "total_s": round(best_t, 3),
        }
        print(f"# {name}: build={best_b:.2f}s exec={best_e:.2f}s", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
