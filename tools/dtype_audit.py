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
    for name, q in registry.all_queries().items():
        if only and name not in only:
            continue
        if q.oracle is None:
            continue
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
                "skipped": skipped,
            }
        )
    )
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
