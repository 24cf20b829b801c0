"""Hilbert clustering key: the unrolled SQL/Column xy2d transform pinned
against an independent d2xy reference, plus the locality property that
is the whole reason to prefer it over Z-order."""

from __future__ import annotations

import duckdb

from us_stock_data_pipeline_spark.queries.round11_ops import (
    _H_CTES,
    _H_LAST,
    _HBITS,
    _HN,
)


def _ref_d2xy(n: int, d: int) -> tuple[int, int]:
    """Independent INVERSE Hilbert transform (classic d2xy): walks the
    curve position back to coordinates — no shared code with the
    forward SQL fragment under test."""
    x = y = 0
    t = d
    s = 1
    while s < n:
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        t //= 4
        s *= 2
    return x, y


def _sql_xy2d_all() -> dict[tuple[int, int], int]:
    """Evaluate the oracle's chained-CTE forward transform for every
    cell of the grid."""
    sql = f"""
    WITH binned AS (
      SELECT a.g AS pb, b.g AS db, CAST(0 AS BIGINT) AS cents,
             CAST(0 AS BIGINT) AS dayno
      FROM (SELECT unnest(range(0, {_HN})) AS g) a,
           (SELECT unnest(range(0, {_HN})) AS g) b
    ),
    {_H_CTES}
    SELECT pb, db, d FROM {_H_LAST}
    """
    return {(int(r[0]), int(r[1])): int(r[2]) for r in duckdb.sql(sql).fetchall()}


def test_forward_matches_independent_inverse():
    fwd = _sql_xy2d_all()
    assert len(fwd) == _HN * _HN
    for d in range(_HN * _HN):
        x, y = _ref_d2xy(_HN, d)
        assert fwd[(x, y)] == d, (x, y, d, fwd[(x, y)])


def test_hilbert_is_a_space_filling_path():
    """Bijection onto 0..n^2-1 and every consecutive pair of curve
    positions is Manhattan-ADJACENT — total path length n^2 - 1."""
    fwd = _sql_xy2d_all()
    inv = {d: xy for xy, d in fwd.items()}
    assert sorted(inv) == list(range(_HN * _HN))
    total = 0
    for d in range(1, _HN * _HN):
        (x1, y1), (x2, y2) = inv[d - 1], inv[d]
        step = abs(x1 - x2) + abs(y1 - y2)
        assert step == 1, (d, inv[d - 1], inv[d])
        total += step
    assert total == _HN * _HN - 1  # 255


def test_hilbert_beats_zorder_locality():
    """The quantified claim in the query docstring: full-grid path
    length 255 for Hilbert vs Z-order's quadrant-seam teleports."""
    fwd = _sql_xy2d_all()
    inv = {d: xy for xy, d in fwd.items()}
    z_inv = {}
    for x in range(_HN):
        for y in range(_HN):
            z = 0
            for i in range(_HBITS):
                z |= ((x >> i) & 1) << (2 * i + 1)
                z |= ((y >> i) & 1) << (2 * i)
            z_inv[z] = (x, y)
    def path(m):
        return sum(
            abs(m[d - 1][0] - m[d][0]) + abs(m[d - 1][1] - m[d][1])
            for d in range(1, _HN * _HN)
        )
    hp, zp = path(inv), path(z_inv)
    assert hp == 255
    assert zp == 480  # Z-order's quadrant-seam jumps: 1.88x longer
    assert zp > 1.8 * hp
