"""Round-25 extensibility, part 4: grouped applyInArrow — the last
un-exercised tier of Spark 4's Arrow UDF ladder (scalar arrow-UDF and
mapInArrow live in extensibility_ops3; cogrouped pandas in udf_ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

_APPLY_ARROW_ORACLE = """
SELECT event_type AS symbol,
       CAST(count(*) AS BIGINT) AS n_trades,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS flow_cents,
       CAST(max(CAST(round(value * 100) AS BIGINT))
            - min(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS range_cents,
       CAST(arg_max(CAST(round(value * 100) AS BIGINT), event_id) AS BIGINT)
         AS last_cents
FROM events
GROUP BY 1
ORDER BY 1
"""


@register("udf_apply_in_arrow", oracle=_APPLY_ARROW_ORACLE, tags=("udf", "extensibility"))
def udf_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GroupedData.applyInArrow — the grouped-kernel tier of the Arrow
    UDF ladder: each symbol's rows arrive as ONE pyarrow.Table
    (zero-copy off the wire, no pandas conversion tax), the kernel
    runs vectorized pyarrow.compute, and one Table comes back. This is
    the tier a real media/feature kernel wants when it needs the whole
    group (unlike mapInArrow's arbitrary batches) but not pandas
    semantics (NaN coercion, index overhead — the classic
    applyInPandas papercuts). The kernel here computes per-symbol
    trade stats, integer-exact, bit-matched to the plain aggregate
    oracle — proving the exchange is lossless. Plan: one shuffle on
    the group key, same as any groupBy; the Python boundary costs one
    Arrow round-trip per group."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.col("event_type").alias("symbol"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )

    def stats(table: pa.Table) -> pa.Table:
        cents = table.column("cents")
        last_idx = pc.index(
            table.column("event_id"), pc.max(table.column("event_id"))
        ).as_py()
        return pa.table(
            {
                "symbol": [table.column("symbol")[0].as_py()],
                "n_trades": pa.array([table.num_rows], pa.int64()),
                "flow_cents": pa.array([pc.sum(cents).as_py()], pa.int64()),
                "range_cents": pa.array(
                    [pc.max(cents).as_py() - pc.min(cents).as_py()], pa.int64()
                ),
                "last_cents": pa.array([cents[last_idx].as_py()], pa.int64()),
            }
        )

    out = ev.groupBy("symbol").applyInArrow(
        stats,
        "symbol string, n_trades long, flow_cents long,"
        " range_cents long, last_cents long",
    )
    return out.orderBy("symbol")
