"""The full oracle sweep as a pytest surface: every registered query
compared to its DuckDB oracle (row count, schema, value hash — the same
checks the external correctness driver applies, including its pandas
canonicalizer's crash-on-unhashable behavior), one parametrized test per
query so a regression names the query that broke.

Deselected by default (see pytest.ini); run with:

    python -m pytest tests/test_oracle_gate.py -m oracle -q

Scale factor defaults to the driver's sf0.01 and can be pointed at any
fixture dir via SPARK_GRAFT_ORACLE_SF (the pre-round-end sweep runs it at
sf0.1 to catch rounding-boundary and sum-order divergences).
"""

from __future__ import annotations

import os

import pytest

from us_stock_data_pipeline_spark import registry

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")

_NAMES = list(registry.queries().keys())


@pytest.mark.oracle
@pytest.mark.parametrize("name", _NAMES)
def test_query_matches_oracle(name: str, spark) -> None:
    from tools.verify_oracle import run_duckdb, table_digest

    q = registry.all_queries()[name]
    sdf = q.fn(spark, SF_DIR)
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols = sdf.columns

    # The official driver's canonicalizer sort_values()s by every column
    # and raises on unhashable cells (numpy arrays from ArrayType output);
    # replicate so such a query fails here, not in the official run.
    import pandas as pd

    pd.DataFrame(s_rows, columns=s_cols).sort_values(by=sorted(s_cols))

    if q.oracle is None:
        assert s_rows, f"{name}: rows-only query returned no rows"
        return

    d_cols, d_rows = run_duckdb(q.oracle, SF_DIR)
    assert len(s_rows) == len(d_rows), f"{name}: rowcount {len(s_rows)} vs {len(d_rows)}"
    assert sorted(s_cols) == sorted(d_cols), f"{name}: schema {sorted(s_cols)} vs {sorted(d_cols)}"
    assert table_digest(s_cols, s_rows) == table_digest(d_cols, d_rows), (
        f"{name}: value-hash mismatch"
    )
