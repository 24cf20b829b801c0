"""Spill evidence (round 12, VERDICT r11 #4): the forced-external window
run must (a) record >0 'spill size' in the engine's own SQL metrics and
(b) produce EXACTLY the rows of the fits-in-memory run."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from us_stock_data_pipeline_spark.diagnostics import (
    _parse_size_bytes,
    max_spill_bytes_recent,
    spill_bytes_recent,
)
from us_stock_data_pipeline_spark.queries.round12_ops import (
    scale_window_spill_external,
)

SF_DIR = "/root/testdata/sf0.01"


def test_parse_size_bytes():
    assert _parse_size_bytes("384.0 MiB") == int(384.0 * (1 << 20))
    assert _parse_size_bytes("0.0 B") == 0
    assert _parse_size_bytes(None) == 0
    assert _parse_size_bytes("total (min, med, max): 1.5 KiB (0.0 B, 1.0 KiB, 1.5 KiB)") == 1536
    assert _parse_size_bytes("12 GB") == 12 * (1 << 30)


def test_forced_spill_records_metrics_and_matches_in_memory(spark):
    out = scale_window_spill_external(spark, SF_DIR)
    rows = {r.l_returnflag: (r.n_rows, r.sum_running_qty) for r in out.collect()}
    assert all(r.spilled for r in out.collect()), "window must have spilled"
    sizes = spill_bytes_recent(spark, last_n=6)
    assert sizes.get("Window", 0) > 0, f"no Window spill recorded: {sizes}"
    assert max_spill_bytes_recent(spark, last_n=6) > 0
    # in-memory reference run (default thresholds: no forced spill)
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_quantity"
    )
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ref = {
        r.l_returnflag: (r.n_rows, r.sum_running_qty)
        for r in li.withColumn(
            "rq", F.sum(F.floor("l_quantity").cast("long")).over(w)
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("rq").cast("long").alias("sum_running_qty"),
        )
        .collect()
    }
    assert rows == ref, "external-mode results diverged from in-memory"
