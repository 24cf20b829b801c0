"""Audit Spark-vs-DuckDB result dtypes per query WITHOUT executing either.

The external driver hashes raw values, so a column that is BIGINT on one
engine and DOUBLE on the other fails its value-hash even when every value
is numerically identical (the `bars_atr` r05 FAIL: DuckDB `floor()`
returns DOUBLE, Spark `F.floor` returns LONG). `verify_oracle`'s digest
now preserves the int/float distinction, but catching the mismatch at the
SCHEMA level is cheaper (no execution: Spark analysis + DuckDB bind only)
and pinpoints the offending column by name.

Type families compared: int / float / decimal / bool / string / date /
timestamp / binary / array / map / struct. An int-vs-float family split
is an ERROR (the proven driver-fail class); decimal-vs-float and
decimal-vs-int are WARNs (engine-dependent rendering — audit manually).

Usage:
    python tools/dtype_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import us_stock_data_pipeline_spark  # noqa: F401
from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.catalog import TABLES
from us_stock_data_pipeline_spark.session import get_spark

# Keys are the simple strings df.dtypes emits ("bigint", not "long").
_SPARK_FAMILY = {
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "bigint": "int",
    "float": "float",
    "double": "float",
    "boolean": "bool",
    "string": "string",
    "date": "date",
    "binary": "binary",
}

_DUCK_FAMILY = {
    "TINYINT": "int",
    "SMALLINT": "int",
    "INTEGER": "int",
    "BIGINT": "int",
    "HUGEINT": "int",
    "UTINYINT": "int",
    "USMALLINT": "int",
    "UINTEGER": "int",
    "UBIGINT": "int",
    "FLOAT": "float",
    "DOUBLE": "float",
    "BOOLEAN": "bool",
    "VARCHAR": "string",
    "DATE": "date",
    "BLOB": "binary",
    "TIME": "time",
}


def spark_family(dt: str) -> str:
    if dt.startswith("decimal"):
        return "decimal"
    if dt.startswith("array"):
        return "array"
    if dt.startswith("map"):
        return "map"
    if dt.startswith("struct"):
        return "struct"
    if dt.startswith("timestamp"):
        return "timestamp"
    return _SPARK_FAMILY.get(dt, dt)


def duck_family(dt: str) -> str:
    s = str(dt).upper()
    if s.startswith("DECIMAL"):
        return "decimal"
    if s.endswith("[]") or s.startswith("LIST") or s.startswith("ARRAY"):
        return "array"
    if s.startswith("MAP"):
        return "map"
    if s.startswith("STRUCT"):
        return "struct"
    if s.startswith("TIMESTAMP"):
        return "timestamp"
    return _DUCK_FAMILY.get(s, s.lower())


def _extract_call(text: str, start: int) -> str:
    """Return the balanced-paren call text starting at the '(' at/after
    `start`, or "" if parens never balance."""
    i = text.index("(", start)
    depth = 0
    for j in range(i, len(text)):
        if text[j] == "(":
            depth += 1
        elif text[j] == ")":
            depth -= 1
            if depth == 0:
                return text[i : j + 1]
    return ""


def lint_lambda_folds(name: str, oracle: str) -> list[str]:
    """Flag fragile DuckDB lambda folds in an oracle (VERDICT r9 #1).

    A `list_reduce` fold's result dtype is whatever the engine INFERS from
    the lambda, and a non-commutative body (subtraction / division /
    modulo / multiplication chains) is additionally sensitive to lambda
    argument-order conventions — both vary across DuckDB versions, which
    made `survival_kaplan_meier` driver-red in r8/r9 while green locally.
    Environment-proof folds in this corpus obey two rules, and this lint
    enforces them:

      1. the seed (the `list_prepend(<seed>, ...)` first argument, or the
         fold's second argument) carries an explicit CAST, so the result
         dtype is pinned, not inferred;
      2. the lambda body combines `acc` with the element using ADDITION
         ONLY (`acc + x` strict-left sums are order-identical across
         engines for IEEE doubles) — sequential recursions that need
         `-`, `*`, `/`, `//`, or `%` must be written as a recursive CTE
         with CAST outputs instead (the driver-proven idiom:
         ml_elo_ratings, bars_ema, survival_kaplan_meier post-r10).
    """
    findings: list[str] = []
    # strip `--` line comments so a mention of list_reduce in prose
    # doesn't trip the scanner
    oracle = "\n".join(line.split("--", 1)[0] for line in oracle.splitlines())
    low = oracle.lower()
    pos = 0
    while True:
        hit = low.find("list_reduce", pos)
        if hit < 0:
            break
        call = _extract_call(oracle, hit)
        pos = hit + len("list_reduce")
        if not call:
            findings.append(f"{name}: unbalanced list_reduce call text")
            continue
        # split the call's top-level arguments on depth-1 commas:
        # list_reduce(<list-with-seed>, <fold-lambda>)
        args, depth, cur = [], 0, []
        for ch in call:
            if ch == "(":
                depth += 1
                if depth == 1:
                    continue
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    args.append("".join(cur))
                    break
            if ch == "," and depth == 1:
                args.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        if len(args) < 2:
            findings.append(f"{name}: list_reduce without a lambda argument")
            continue
        lam = args[-1]
        arrow = lam.rfind("->")
        if arrow < 0:
            findings.append(f"{name}: list_reduce without a lambda body")
            continue
        body = lam[arrow + 2 :]
        # rule 2: addition-only lambda body
        bad_ops = [op for op in ("//", "%", "/", "*", "-") if op in body]
        if bad_ops:
            findings.append(
                f"{name}: non-commutative list_reduce lambda body"
                f" (ops {bad_ops}) — rewrite as a recursive CTE"
            )
        # rule 1: explicit CAST on the seed. The corpus idiom is
        # list_reduce(list_prepend(CAST(... AS <T>), ...), lambda) — the
        # first argument must pin the dtype with a CAST somewhere.
        if "cast" not in args[0].lower():
            findings.append(
                f"{name}: list_reduce seed lacks an explicit CAST —"
                f" result dtype is engine-inferred"
            )
    return findings


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("dtype-audit")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    errors, warns, skipped = [], [], []
    fold_findings: list[str] = []
    for name, q in registry.all_queries().items():
        if only and name not in only:
            continue
        if q.oracle is None:
            continue
        for msg in lint_lambda_folds(name, q.oracle):
            fold_findings.append(msg)
            print(f"FOLD  {msg}")
        try:
            sdf = q.fn(spark, sf_dir)
            s_types = dict(sdf.dtypes)
        except Exception as e:  # noqa: BLE001
            skipped.append(name)
            print(f"SKIP  {name}: spark analysis error: {type(e).__name__}: {e}")
            continue
        try:
            rel = con.sql(q.oracle)
            d_types = dict(zip(rel.columns, rel.types))
        except Exception as e:  # noqa: BLE001
            skipped.append(name)
            print(f"SKIP  {name}: duckdb bind error: {type(e).__name__}: {e}")
            continue
        # Hard gate on the oracle's own output types (VERDICT r10 #2):
        # anything outside the driver-portable set is an ERROR even when
        # the type FAMILY matches Spark's — HUGEINT is family "int" but
        # arrives at the driver as decimal128 and kills the hash.
        from tools.verify_oracle import ALLOWED_DUCK_TYPES

        for col, typ in d_types.items():
            base = str(typ).upper().split("(")[0].strip()
            if base not in ALLOWED_DUCK_TYPES:
                msg = f"{name}.{col}: non-portable oracle output type {typ}"
                errors.append(msg)
                print(f"ERROR {msg}")
        for col in sorted(set(s_types) & set(d_types)):
            sf, df_ = spark_family(s_types[col]), duck_family(d_types[col])
            if sf == df_:
                continue
            pair = {sf, df_}
            msg = f"{name}.{col}: spark={s_types[col]} duckdb={d_types[col]}"
            if pair == {"int", "float"}:
                errors.append(msg)
                print(f"ERROR {msg}")
            else:
                warns.append(msg)
                print(f"warn  {msg}")
    print(
        json.dumps(
            {
                "errors": len(errors),
                "warns": len(warns),
                "fold_findings": len(fold_findings),
                "skipped": skipped,
            }
        )
    )
    return 1 if errors or fold_findings else 0


if __name__ == "__main__":
    raise SystemExit(main())
