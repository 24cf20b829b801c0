"""Geo/spatial family tests (round 10): geohash encoding pinned against
the canonical reference vector and an independent bit-interleave
implementation; grid-blocking completeness (3x3 neighborhood covers
every pair within R when R <= cell)."""

from __future__ import annotations

import duckdb
import numpy as np

from us_stock_data_pipeline_spark.queries.round10_ops2 import (
    _CELL_E6,
    _GH_ALPHABET,
    _LAT_E6,
    _LON_E6,
    _R2,
    _geohash25,
    _geohash5_str,
)


def _ref_geohash5(lat_e6: int, lon_e6: int) -> str:
    """Independent scalar geohash: classic interval-halving, 25 bits
    alternating lon-first, base-32 — no shared code with the SQL
    fragment under test."""
    lat_lo, lat_hi = -90e6, 90e6
    lon_lo, lon_hi = -180e6, 180e6
    bits = []
    for i in range(25):
        if i % 2 == 0:  # longitude
            mid = (lon_lo + lon_hi) / 2
            if lon_e6 >= mid:
                bits.append(1)
                lon_lo = mid
            else:
                bits.append(0)
                lon_hi = mid
        else:  # latitude
            mid = (lat_lo + lat_hi) / 2
            if lat_e6 >= mid:
                bits.append(1)
                lat_lo = mid
            else:
                bits.append(0)
                lat_hi = mid
    val = int("".join(map(str, bits)), 2)
    return "".join(_GH_ALPHABET[(val >> (20 - 5 * i)) & 31] for i in range(5))


def _sql_geohash5_for_coords(lat_e6: int, lon_e6: int) -> str:
    """Evaluate the production SQL fragment in DuckDB for explicit
    coordinates by substituting keys the synth formulas invert to."""
    frag = _geohash5_str(_geohash25("k")).replace(
        _LON_E6.format(k="k"), f"CAST({lon_e6} AS BIGINT)"
    ).replace(_LAT_E6.format(k="k"), f"CAST({lat_e6} AS BIGINT)")
    return duckdb.sql(f"SELECT {frag} AS g").fetchone()[0]


def test_geohash_canonical_reference_vector():
    # The classic example: (57.64911, 10.40744) -> 'u4pru' at precision 5.
    assert _ref_geohash5(57_649_110, 10_407_440) == "u4pru"
    assert _sql_geohash5_for_coords(57_649_110, 10_407_440) == "u4pru"


def test_geohash_fragment_matches_independent_reference():
    con = duckdb.connect()
    frag = _geohash5_str(_geohash25("k"))
    rows = con.sql(
        f"SELECT k, {frag} AS g FROM (SELECT unnest(generate_series(1, 500)) AS k)"
    ).fetchall()
    for k, g in rows:
        lat = (k * 7919) % 180_000_000 - 90_000_000
        lon = (k * 104729) % 360_000_000 - 180_000_000
        assert g == _ref_geohash5(lat, lon), k


def test_geohash_corner_cases():
    # Poles/antimeridian edges of the synthetic domain stay in range
    # and encode without the 13/12-bit fields overflowing.
    for lat, lon in [
        (-90_000_000, -180_000_000),
        (89_999_999, 179_999_999),
        (0, 0),
        (-1, -1),
    ]:
        g = _sql_geohash5_for_coords(lat, lon)
        assert len(g) == 5 and all(c in _GH_ALPHABET for c in g)
        assert g == _ref_geohash5(lat, lon)


def test_grid_blocking_is_complete_for_radius():
    """Every (supplier, customer) pair within R^2 must land in cells
    that differ by at most 1 on each axis — the invariant that makes
    the 3x3 neighborhood join EXACTLY equal to the O(n^2) oracle."""
    sk = np.arange(1, 1001, dtype=np.int64)
    ck = np.arange(1, 5001, dtype=np.int64)
    s_key = sk * 31 + 7
    s_lat = (s_key * 7919) % 180_000_000 - 90_000_000
    s_lon = (s_key * 104729) % 360_000_000 - 180_000_000
    c_lat = (ck * 7919) % 180_000_000 - 90_000_000
    c_lon = (ck * 104729) % 360_000_000 - 180_000_000
    dlat = s_lat[:, None] - c_lat[None, :]
    dlon = s_lon[:, None] - c_lon[None, :]
    within = dlat * dlat + dlon * dlon <= _R2
    assert within.sum() > 0  # the fixture-scale key space produces pairs
    s_gy = (s_lat + 90_000_000) // _CELL_E6
    s_gx = (s_lon + 180_000_000) // _CELL_E6
    c_gy = (c_lat + 90_000_000) // _CELL_E6
    c_gx = (c_lon + 180_000_000) // _CELL_E6
    si, ci = np.nonzero(within)
    assert (np.abs(s_gy[si] - c_gy[ci]) <= 1).all()
    assert (np.abs(s_gx[si] - c_gx[ci]) <= 1).all()


# --------------------------------------------------------------------------
# Point-in-polygon (round 10)
# --------------------------------------------------------------------------

from us_stock_data_pipeline_spark.queries.round10_ops2 import _PIP_POLY, _pip_count


def _ref_inside(px: int, py: int) -> bool:
    """Independent crossing-number implementation (float intersection,
    classic textbook form) — no shared code with the SQL fragment."""
    n = len(_PIP_POLY)
    inside = False
    for i in range(n):
        x1, y1 = _PIP_POLY[i]
        x2, y2 = _PIP_POLY[(i + 1) % n]
        if (y1 <= py) != (y2 <= py):
            x_int = x1 + (x2 - x1) * (py - y1) / (y2 - y1)
            if px < x_int:
                inside = not inside
    return inside


def _sql_inside(px: int, py: int) -> int:
    frag = _pip_count(f"CAST({px} AS BIGINT)", f"CAST({py} AS BIGINT)")
    return duckdb.sql(f"SELECT ({frag}) % 2 AS i").fetchone()[0]


def test_pip_hand_placed_points():
    # Deep inside the chevron body, inside the notch (OUT), far outside,
    # left wing, right wing.
    cases = [
        ((0, -40_000_000), 1),    # center body
        ((0, 30_000_000), 0),     # inside the top notch -> outside
        ((0, 80_000_000), 0),     # above everything
        ((65_000_000, 20_000_000), 1),   # right wing interior
        ((-65_000_000, 20_000_000), 1),  # left wing interior
        ((-80_000_000, 0), 0),    # left of the H pinch vertex at its level
        ((-100_000_000, 0), 0),   # west of the polygon
        ((0, -70_000_000), 0),    # below the bottom vertex
    ]
    for (px, py), want in cases:
        assert _sql_inside(px, py) == want, (px, py)
        assert int(_ref_inside(px, py)) == want, (px, py)


def test_pip_fragment_matches_independent_reference():
    rng = np.random.default_rng(3)
    px = rng.integers(-180_000_000, 180_000_000, 400)
    py = rng.integers(-90_000_000, 90_000_000, 400)
    frag = _pip_count("px", "py")
    rows = duckdb.sql(
        "SELECT px, py, (" + frag + ") % 2 AS i FROM "
        "(SELECT CAST(unnest(?) AS BIGINT) px, CAST(unnest(?) AS BIGINT) py)",
        params=[px.tolist(), py.tolist()],
    ).fetchall()
    for x, y, got in rows:
        assert got == int(_ref_inside(x, y)), (x, y)


# --------------------------------------------------------------------------
# round 11: polygon JOIN blocking completeness (planted boundary cases)
# --------------------------------------------------------------------------

from us_stock_data_pipeline_spark.queries.round11_ops import (  # noqa: E402
    _PPJ_CELL,
    _PPJ_MAXX,
    _PPJ_MAXY,
    _PPJ_MINX,
    _PPJ_MINY,
    _PPJ_N_POLYS,
    _PPJ_OX,
    _PPJ_OY,
    _PPJ_POLY,
    _ppj_crossings,
)


def _ppj_center(p: int) -> tuple[int, int]:
    ox = (p * 2654435761) % 340_000_000 - 170_000_000
    oy = (p * 320800857) % 160_000_000 - 80_000_000
    return ox, oy


def _ppj_ref_inside(px: int, py: int, ox: int, oy: int) -> bool:
    """Independent float crossing test against the scaled octagon."""
    x, y = px - ox, py - oy
    n = len(_PPJ_POLY)
    inside = False
    for i in range(n):
        x1, y1 = _PPJ_POLY[i]
        x2, y2 = _PPJ_POLY[(i + 1) % n]
        if (y1 <= y) != (y2 <= y):
            x_int = x1 + (x2 - x1) * (y - y1) / (y2 - y1)
            if x < x_int:
                inside = not inside
    return inside


def _ppj_covered_cells(ox: int, oy: int) -> set[tuple[int, int]]:
    lo_gy = (oy + _PPJ_MINY + 90_000_000) // _PPJ_CELL
    hi_gy = (oy + _PPJ_MAXY + 90_000_000) // _PPJ_CELL
    lo_gx = (ox + _PPJ_MINX + 180_000_000) // _PPJ_CELL
    hi_gx = (ox + _PPJ_MAXX + 180_000_000) // _PPJ_CELL
    return {
        (gy, gx)
        for gy in range(lo_gy, hi_gy + 1)
        for gx in range(lo_gx, hi_gx + 1)
    }


def test_polygon_join_constants_match_sql_fragments():
    """The python helpers above must mirror the SQL center fragments."""
    for p in (0, 1, 7, 63):
        lit = f"CAST({p} AS BIGINT)"  # bare literals are INT32 in DuckDB
        row = duckdb.sql(
            f"SELECT {_PPJ_OX.format(p=lit)} AS ox, {_PPJ_OY.format(p=lit)} AS oy"
        ).fetchone()
        assert (row[0], row[1]) == _ppj_center(p)


def test_polygon_join_blocking_complete_planted_boundaries():
    """Every point INSIDE a polygon must land in one of the polygon's
    bbox-covered cells (else the blocked join silently drops the pair).
    Planted: polygon-center points, near-vertex points just inside each
    vertex, notch points, points straddling cell boundaries (polygon
    deliberately chosen whose center sits near a cell corner), and a
    dense deterministic lattice over each polygon's bbox."""
    for p in range(_PPJ_N_POLYS):
        ox, oy = _ppj_center(p)
        cells = _ppj_covered_cells(ox, oy)
        planted = [(ox, oy - 4_000_000)]
        # just inside each vertex (pull 1% toward the centroid)
        for vx, vy in _PPJ_POLY:
            planted.append((ox + vx - vx // 100, oy + vy - vy // 100))
        # bbox lattice
        for dx in range(_PPJ_MINX, _PPJ_MAXX + 1, 900_000):
            for dy in range(_PPJ_MINY, _PPJ_MAXY + 1, 750_000):
                planted.append((ox + dx, oy + dy))
        for px, py in planted:
            if _ppj_ref_inside(px, py, ox, oy):
                cell = ((py + 90_000_000) // _PPJ_CELL, (px + 180_000_000) // _PPJ_CELL)
                assert cell in cells, (p, px, py, cell, sorted(cells))


def test_polygon_join_fragment_matches_independent_reference():
    """The exact-integer SQL crossing fragment (shared verbatim with the
    oracle) agrees with the independent float implementation on random
    and planted boundary points."""
    rng = np.random.default_rng(11)
    for p in (0, 5, 33):
        ox, oy = _ppj_center(p)
        px = rng.integers(ox - 12_000_000, ox + 12_000_000, 300)
        py = rng.integers(oy - 9_000_000, oy + 9_000_000, 300)
        frag = _ppj_crossings(f"(px - {ox})", f"(py - {oy})")
        rows = duckdb.sql(
            "SELECT px, py, (" + frag + ") % 2 AS i FROM "
            "(SELECT CAST(unnest(?) AS BIGINT) px, CAST(unnest(?) AS BIGINT) py)",
            params=[px.tolist(), py.tolist()],
        ).fetchall()
        for x, y, got in rows:
            assert got == int(_ppj_ref_inside(x, y, ox, oy)), (p, x, y)


def test_polygon_join_blocked_equals_bruteforce(spark):
    """End-to-end equivalence on a planted point set: the grid-blocked
    Spark join returns EXACTLY the brute-force pair set, including
    points sitting on cell boundaries and polygon edges."""
    from pyspark.sql import functions as F

    pts = []
    k = 0
    for p in (0, 9, 17, 40, 63):
        ox, oy = _ppj_center(p)
        for dx, dy in [
            (0, -4_000_000),          # interior
            (0, 2_500_000),           # notch region
            (-8_900_000, 0),          # near left pinch (outside)
            (8_000_000, -3_000_000),  # right wing
            (0, _PPJ_MINY),           # ON the bottom vertex
            (_PPJ_MINX, 0),           # ON the left pinch vertex
        ]:
            pts.append((k, ox + dx, oy + dy))
            k += 1
    pdf = spark.createDataFrame(pts, "ck long, px long, py long")
    brute = set()
    for p in range(_PPJ_N_POLYS):
        ox, oy = _ppj_center(p)
        for ck, px, py in pts:
            frag = _ppj_crossings(
                f"(CAST({px} AS BIGINT) - CAST({ox} AS BIGINT))",
                f"(CAST({py} AS BIGINT) - CAST({oy} AS BIGINT))",
            )
            if duckdb.sql(f"SELECT ({frag}) % 2").fetchone()[0] == 1:
                brute.add((p, ck))
    assert brute, "planted set must produce at least one containment"
    cells = pdf.select(
        "ck", "px", "py",
        F.expr(f"(py + 90000000) div {_PPJ_CELL}").alias("gy"),
        F.expr(f"(px + 180000000) div {_PPJ_CELL}").alias("gx"),
    )
    polys = spark.range(_PPJ_N_POLYS).select(
        F.col("id").alias("p"),
        F.expr(_PPJ_OX.format(p="id")).alias("ox"),
        F.expr(_PPJ_OY.format(p="id")).alias("oy"),
    )
    covered = polys.select(
        "p", "ox", "oy",
        F.explode(
            F.expr(
                f"flatten(transform("
                f"sequence((oy + {_PPJ_MINY} + 90000000) div {_PPJ_CELL},"
                f"         (oy + {_PPJ_MAXY} + 90000000) div {_PPJ_CELL}),"
                f" gy -> transform("
                f"sequence((ox + {_PPJ_MINX} + 180000000) div {_PPJ_CELL},"
                f"         (ox + {_PPJ_MAXX} + 180000000) div {_PPJ_CELL}),"
                f" gx -> struct(gy AS gy, gx AS gx))))"
            )
        ).alias("cell"),
    ).select("p", "ox", "oy", F.col("cell.gy").alias("gy"), F.col("cell.gx").alias("gx"))
    blocked = (
        cells.join(covered, ["gy", "gx"])
        .filter(F.expr(_ppj_crossings("(px - ox)", "(py - oy)")) % 2 == 1)
        .select("p", "ck")
    )
    got = {(r["p"], r["ck"]) for r in blocked.collect()}
    assert got == brute
