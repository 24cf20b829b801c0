"""Generated columns for the versioned table (round 13) — Delta's
`GENERATED ALWAYS AS (expr)` feature: a column whose value is always
computed from other columns, typically used as the partition column
(partition by `year(ts)` while queries filter on `ts`), with
PARTITION-FILTER DERIVATION: a range predicate on the BASE column is
translated into a manifest-level partition filter on the GENERATED
column, so time-range queries prune partitions they never name.

Scope (the same shapes Delta derives filters for, minus the exotic
ones): `YEAR(col)`, `MONTH(col)` (1-12), `CAST(col AS DATE)`. The
derived filter is a SAFE SUPERSET — it may keep a boundary partition
the row filter then empties, never the reverse — which is the only
correctness contract partition pruning needs.

Write-path semantics (Delta's): a write that omits the generated
column gets it computed; a write that supplies it gets VALIDATED
against the expression (any mismatching row fails the write);
assignments directly to a generated column are rejected; an UPDATE to
the base column recomputes the generated value (and, when the
generated column partitions the table, moves the row atomically).

Reference: Delta Lake generated columns (public docs/protocol);
the reference repo (sanantachat/us-stock-data-pipeline) has no
catalog surface — this extends SURVEY.md SS2C.
"""

from __future__ import annotations

import re
from datetime import date, datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_YEAR_RE = re.compile(r"^\s*YEAR\s*\(\s*(\w+)\s*\)\s*$", re.IGNORECASE)
_MONTH_RE = re.compile(r"^\s*MONTH\s*\(\s*(\w+)\s*\)\s*$", re.IGNORECASE)
_CAST_DATE_RE = re.compile(
    r"^\s*CAST\s*\(\s*(\w+)\s+AS\s+DATE\s*\)\s*$", re.IGNORECASE
)


def parse_generation_expr(expr: str) -> tuple[str, str]:
    """(kind, base_col) for a supported generation expression; raises
    on anything else — an unparseable expression could not have a
    derivable partition filter, and silently accepting it would turn
    'partition pruning' into 'full scans that look pruned'."""
    for kind, rx in (("year", _YEAR_RE), ("month", _MONTH_RE), ("date", _CAST_DATE_RE)):
        m = rx.match(expr)
        if m:
            return kind, m.group(1)
    raise ValueError(
        f"unsupported generation expression {expr!r} "
        "(YEAR(col) / MONTH(col) / CAST(col AS DATE))"
    )


def generation_bases(generated_cols: dict[str, str]) -> dict[str, str]:
    """generated column -> its base column."""
    return {g: parse_generation_expr(e)[1] for g, e in generated_cols.items()}


def apply_generated(
    df: DataFrame,
    generated_cols: dict[str, str],
    validate: bool = True,
) -> DataFrame:
    """Compute every generated column on `df`. A column the writer
    already supplied is validated row-by-row against the expression
    first (one batch-sized job; any mismatch fails the write — Delta's
    rule), then replaced by the computed value so downstream layout
    decisions always see the canonical form."""
    for gen_col, expr in generated_cols.items():
        parse_generation_expr(expr)  # reject unsupported shapes loudly
        computed = F.expr(expr)
        if gen_col in df.columns and validate:
            bad = df.filter(~F.col(gen_col).eqNullSafe(computed)).limit(1)
            row = bad.collect()
            if row:
                raise ValueError(
                    f"generated column {gen_col!r} violates its expression "
                    f"{expr!r}: first mismatching row {row[0].asDict()!r}"
                )
        df = df.withColumn(gen_col, computed)
    return df


def _as_ts(v) -> datetime:
    if isinstance(v, datetime):
        return v
    if isinstance(v, date):
        return datetime(v.year, v.month, v.day)
    if isinstance(v, str):
        return datetime.fromisoformat(v)
    raise TypeError(f"cannot interpret bound {v!r} as a timestamp")


def derive_partition_filter(
    generated_cols: dict[str, str],
    base_col: str,
    lo,
    hi,
):
    """Partition filter (for `read_versioned(partition_filter=...)`)
    derived from the predicate `lo <= base_col < hi`, or None when no
    generated partition column is built on `base_col`. The filter is a
    safe superset: boundary partitions stay in."""
    lo_ts, hi_ts = _as_ts(lo), _as_ts(hi)
    checks = []
    for gen_col, expr in generated_cols.items():
        kind, base = parse_generation_expr(expr)
        if base != base_col:
            continue
        if kind == "year":
            lo_v, hi_v = lo_ts.year, hi_ts.year
            checks.append((gen_col, lambda s, a=lo_v, b=hi_v: a <= int(s) <= b))
        elif kind == "month":
            if (hi_ts.year * 12 + hi_ts.month) - (
                lo_ts.year * 12 + lo_ts.month
            ) >= 12:
                continue  # a >=12-month span covers every month value
            months = {
                m % 12 or 12
                for m in range(
                    lo_ts.year * 12 + lo_ts.month,
                    hi_ts.year * 12 + hi_ts.month + 1,
                )
            }
            checks.append((gen_col, lambda s, ms=months: int(s) in ms))
        elif kind == "date":
            lo_d, hi_d = lo_ts.date().isoformat(), hi_ts.date().isoformat()
            checks.append((gen_col, lambda s, a=lo_d, b=hi_d: a <= s <= b))
    if not checks:
        return None

    def keep(part_values: dict) -> bool:
        for col, ck in checks:
            v = part_values.get(col)
            if v is not None and not ck(v):
                return False
        return True

    return keep
