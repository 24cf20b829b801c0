"""Audit every oracle for transcendental-boundary fragility in hashed output.

Round-8's one driver-red (`survival_kaplan_meier`) hash-matched locally at
both scales but failed on the driver host — the hashed columns were computed
through `ln`/`exp` and quantized with `round`/`floor`, so a libm (or DuckDB
version) whose transcendentals differ from ours by even a few ulps can flip
a value sitting near a rounding boundary. This tool makes that failure class
mechanically checkable: for each registered oracle whose SQL calls a
transcendental, it re-runs the oracle with EVERY transcendental call
multiplied by (1 ± eps) — simulating a foreign libm that is eps-relative
different — and checks the value digest (same digest as verify_oracle) is
invariant.

Two tiers:
  * eps = 1e-12 (~4500 ulps at 1.0): any flip is a REAL fragility — a
    plausible cross-platform libm difference changes the hashed output.
    These must be fixed (quantize to exact integers, or drop the
    transcendental-derived column from the hashed output).
  * eps = 1e-9: aggressive tier, flags sensitivity to engine-VERSION level
    differences (different polynomial approximations across DuckDB
    releases). Informational — listed in the artifact, fixed when cheap.

Usage:
    python tools/transcendental_audit.py [sf_dir] [query ...]

Writes docs/TRANSCENDENTAL_AUDIT.json and exits non-zero on tier-1 flags.
"""

from __future__ import annotations

import json
import os
import re
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import us_stock_data_pipeline_spark  # noqa: F401
from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.catalog import TABLES
from tools.verify_oracle import table_digest

# sqrt/cbrt are correctly rounded by IEEE-754 and excluded; everything
# else below is implementation-defined and may differ across libms.
_FUNCS = (
    "ln",
    "log",
    "log2",
    "log10",
    "exp",
    "power",
    "pow",
    "sin",
    "cos",
    "tan",
    "asin",
    "acos",
    "atan",
    "atan2",
    "sinh",
    "cosh",
    "tanh",
    "asinh",
    "acosh",
    "atanh",
    "erf",
    "gamma",
    "lgamma",
)

_CALL_RE = re.compile(r"(?<![A-Za-z0-9_])(" + "|".join(_FUNCS) + r")\s*\(", re.IGNORECASE)


def _match_paren(sql: str, open_idx: int) -> int:
    """Index of the ')' matching the '(' at open_idx (skips string literals)."""
    depth = 0
    i = open_idx
    n = len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            i += 1
            while i < n and sql[i] != "'":
                i += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise ValueError("unbalanced parens")


def perturb_sql(sql: str, eps: float) -> tuple[str, int]:
    """Wrap every transcendental call f(...) as (f(...)*(1+eps)).

    Post-multiplication inside its own parens is precedence-safe in any
    surrounding expression (unary minus, division, exponent chains).
    Returns (new_sql, number_of_calls_wrapped).
    """
    out: list[str] = []
    pos = 0
    count = 0
    while True:
        m = _CALL_RE.search(sql, pos)
        if m is None:
            out.append(sql[pos:])
            break
        open_idx = sql.index("(", m.end() - 1)
        close_idx = _match_paren(sql, open_idx)
        inner, ninner = perturb_sql(sql[open_idx + 1 : close_idx], eps)
        count += 1 + ninner
        out.append(sql[pos : m.start()])
        out.append(f"({m.group(1)}({inner})*(1+{eps!r}))")
        pos = close_idx + 1
    return "".join(out), count


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    def digest(sql: str) -> str:
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        return table_digest(cols, cur.fetchall())

    flagged_tier1: list[dict] = []
    flagged_tier2: list[dict] = []
    clean: list[str] = []
    errors: list[str] = []
    n_with_transcendentals = 0
    for name, q in registry.all_queries().items():
        if only and name not in only:
            continue
        if q.oracle is None or not _CALL_RE.search(q.oracle):
            continue
        n_with_transcendentals += 1
        try:
            base = digest(q.oracle)
        except Exception as e:  # noqa: BLE001
            errors.append(f"{name}: base oracle error: {e}")
            continue
        verdicts = {}
        for eps in (1e-12, -1e-12, 1e-9, -1e-9):
            psql, ncalls = perturb_sql(q.oracle, eps)
            try:
                verdicts[eps] = (digest(psql) == base, ncalls)
            except Exception as e:  # noqa: BLE001
                errors.append(f"{name}: perturbed({eps}) error: {e}")
                verdicts[eps] = (True, ncalls)
        t1_bad = [e for e in (1e-12, -1e-12) if not verdicts[e][0]]
        t2_bad = [e for e in (1e-9, -1e-9) if not verdicts[e][0]]
        ncalls = verdicts[1e-12][1]
        if t1_bad:
            flagged_tier1.append({"query": name, "eps": t1_bad, "calls": ncalls})
            print(f"FRAGILE(ulp)     {name}: hash flips at eps={t1_bad} ({ncalls} calls)")
        elif t2_bad:
            flagged_tier2.append({"query": name, "eps": t2_bad, "calls": ncalls})
            print(f"fragile(version) {name}: hash flips at eps={t2_bad} ({ncalls} calls)")
        else:
            clean.append(name)
            print(f"ok               {name}: invariant under +-1e-9 ({ncalls} calls)")
    report = {
        "sf_dir": sf_dir,
        "oracles_with_transcendentals": n_with_transcendentals,
        "tier1_ulp_fragile": flagged_tier1,
        "tier2_version_fragile": flagged_tier2,
        "clean": len(clean),
        "errors": errors,
    }
    if not only:
        out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "docs", "TRANSCENDENTAL_AUDIT.json")
        with open(out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {out}")
    print(json.dumps({k: (len(v) if isinstance(v, list) else v) for k, v in report.items()}))
    return 1 if flagged_tier1 else 0


if __name__ == "__main__":
    raise SystemExit(main())
