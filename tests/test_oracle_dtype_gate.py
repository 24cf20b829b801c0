"""Corpus-wide gate: no registered oracle may emit a DuckDB output
column typed outside the driver-portable set.

Why: the external driver hashes TYPE-SENSITIVELY (Arrow), while this
repo's local digest fetches DuckDB results via fetchall(), which folds
HUGEINT down to plain Python int — so an uncast windowed ``sum(BIGINT)``
(promoted to HUGEINT by DuckDB) hashed green locally for three rounds
while the driver kept ``survival_kaplan_meier`` red (VERDICT r10
What's-wrong #1/#2). This test binds every oracle (no execution, no
Spark) and fails on any non-portable output type, so the class cannot
hide again.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import us_stock_data_pipeline_spark  # noqa: F401
from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.catalog import TABLES
from tools.verify_oracle import ALLOWED_DUCK_TYPES, oracle_type_problems

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def test_every_oracle_portable(con):
    bad = {}
    n = 0
    for name, q in registry.all_queries().items():
        if q.oracle is None:
            continue
        n += 1
        try:
            probs = oracle_type_problems(con, q.oracle)
        except Exception as e:  # noqa: BLE001 — bind errors surface elsewhere
            probs = [f"<bind error: {type(e).__name__}: {e}>"]
        if probs:
            bad[name] = probs
    assert n > 600, f"registry import looks broken: only {n} oracles seen"
    assert not bad, f"non-portable oracle output types: {bad}"


def test_gate_catches_hugeint_window_sum(con):
    """Fails-on-purpose: the exact survival_kaplan_meier signature — an
    uncast windowed sum over BIGINT promotes to HUGEINT and must be
    flagged."""
    sql = (
        "SELECT o_orderkey, sum(o_custkey) OVER (ORDER BY o_orderkey) AS run "
        "FROM orders LIMIT 5"
    )
    probs = oracle_type_problems(con, sql)
    assert probs == ["run:HUGEINT"], probs
    fixed = (
        "SELECT o_orderkey, CAST(sum(o_custkey) OVER (ORDER BY o_orderkey) AS BIGINT)"
        " AS run FROM orders LIMIT 5"
    )
    assert oracle_type_problems(con, fixed) == []


def test_gate_catches_decimal_float_unsigned(con):
    assert oracle_type_problems(con, "SELECT CAST(1 AS DECIMAL(10,2)) AS x") == [
        "x:DECIMAL(10,2)"
    ]
    assert oracle_type_problems(con, "SELECT CAST(1 AS FLOAT) AS x") == ["x:FLOAT"]
    assert oracle_type_problems(con, "SELECT CAST(1 AS UBIGINT) AS x") == ["x:UBIGINT"]
    assert oracle_type_problems(con, "SELECT CAST(1 AS BIGINT) AS x") == []


def test_allowed_set_is_tight():
    assert ALLOWED_DUCK_TYPES == {
        "BIGINT",
        "INTEGER",
        "DOUBLE",
        "VARCHAR",
        "DATE",
        "TIMESTAMP",
        "TIMESTAMP_NS",
        "BOOLEAN",
    }
