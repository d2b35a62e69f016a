"""Cell grid + tile assignment tests, incl. SQL parity and ring properties."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from geocoding_toolbox_ray.functions import cells, tiles

RNG = np.random.default_rng(42)


def _random_points(n=500):
    x = RNG.uniform(cells.X0, cells.X0 + cells.EXTENT, n)
    y = RNG.uniform(cells.Y0, cells.Y0 + cells.EXTENT, n)
    return x, y


def test_cell_roundtrip_center():
    x, y = _random_points()
    c = cells.cell_encode(x, y)
    cx, cy = cells.cell_center(c)
    s = cells.cell_size()
    assert np.all(np.abs(cx - x) <= s / 2 + 1e-9)
    assert np.all(np.abs(cy - y) <= s / 2 + 1e-9)


def test_cell_encode_sql_parity():
    x, y = _random_points(1000)
    expect = cells.cell_encode(x, y)
    con = duckdb.connect()
    con.execute("CREATE TABLE pts AS SELECT * FROM (SELECT unnest(?) AS x, unnest(?) AS y)",
                [x.tolist(), y.tolist()])
    got = con.execute(
        "SELECT " + cells.cell_encode_sql("x", "y") + " FROM pts"
    ).fetchnumpy()
    got = next(iter(got.values()))
    assert np.array_equal(np.asarray(got, np.int64), expect)


def test_ring_cells_properties():
    c = int(cells.cell_encode(np.array([350_000.0]), np.array([4_250_000.0]))[0])
    ring0 = cells.ring_cells(c, 0)
    assert ring0.tolist() == [c]
    ring1 = cells.ring_cells(c, 1)
    assert len(ring1) == 8
    ring2 = cells.ring_cells(c, 2)
    assert len(ring2) == 16
    # disk = union of rings 0..r
    disk = set(cells.disk_cells(c, 2).tolist())
    union = set(ring0.tolist()) | set(ring1.tolist()) | set(ring2.tolist())
    assert disk == union
    # all ring-1 cells are at Chebyshev distance 1
    n = 1 << cells.DEFAULT_RES
    ix, iy = c % n, c // n
    for rc in ring1.tolist():
        assert max(abs(rc % n - ix), abs(rc // n - iy)) == 1


@settings(max_examples=50, deadline=None)
@given(st.integers(0, (1 << 18) - 1), st.integers(1, 3))
def test_ring_count_interior(cell_idx, ring):
    n = 1 << cells.DEFAULT_RES
    ix = cell_idx % n
    iy = cell_idx // (1 << 9) % n
    # clamp to interior so no edge clipping
    ix = min(max(ix, ring), n - 1 - ring)
    iy = min(max(iy, ring), n - 1 - ring)
    c = iy * n + ix
    assert len(cells.ring_cells(c, ring)) == 8 * ring


def test_tile_assign_sql_parity():
    x, y = _random_points(1000)
    tx, ty = tiles.tile_assign(x, y)
    con = duckdb.connect()
    con.execute("CREATE TABLE pts AS SELECT * FROM (SELECT unnest(?) AS x, unnest(?) AS y)",
                [x.tolist(), y.tolist()])
    sx, sy = tiles.tile_assign_sql("x", "y")
    res = con.execute(f"SELECT {sx} AS tx, {sy} AS ty FROM pts").fetchnumpy()
    assert np.array_equal(np.asarray(res["tx"], np.int64), tx)
    assert np.array_equal(np.asarray(res["ty"], np.int64), ty)


def test_tile_monotonic():
    # larger x -> larger-or-equal tx; larger y -> smaller-or-equal ty (slippy)
    x = np.linspace(cells.X0, cells.X0 + cells.EXTENT, 100)
    y = np.full(100, 4_200_000.0)
    tx, _ = tiles.tile_assign(x, y)
    assert np.all(np.diff(tx) >= 0)
    y2 = np.linspace(cells.Y0, cells.Y0 + cells.EXTENT, 100)
    x2 = np.full(100, 350_000.0)
    _, ty = tiles.tile_assign(x2, y2)
    assert np.all(np.diff(ty) <= 0)


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_no_point_near_tile_boundary(sf):
    """The tile/raster oracles compare floor() of a transcendental formula
    computed by two engines (numpy vs DuckDB), which can differ in the last
    ulp.  Audit: every derived point's mercator fraction is far (>1e-6
    tiles) from an integer boundary at BOTH tile and pixel resolution, so
    a 1-ulp disagreement can never flip a floor() — the hash comparison
    cannot flake on this data."""
    import duckdb

    con = duckdb.connect()
    lat_span = con.execute(
        f"""
        WITH q AS (
          SELECT ({tiles.LAT0!r} + (({tiles.Y0!r} +
                 CAST((l_orderkey * 241 + l_partkey * 13) % 4096 AS DOUBLE) * 125.0)
                 - {tiles.Y0!r}) * ({tiles.LAT_SPAN!r} / {tiles.EXTENT!r})) AS lat,
                 ({tiles.LON0!r} + (CAST((l_orderkey * 131 + l_linenumber * 17) % 4096 AS DOUBLE) * 125.0)
                 * ({tiles.LON_SPAN!r} / {tiles.EXTENT!r})) AS lon
          FROM '/root/testdata/{sf}/lineitem.parquet'
        ),
        f AS (
          SELECT ((lon + 180.0) / 360.0 * 1048576.0) AS fx,
                 ((1.0 - ln(tan(lat * pi() / 180.0) + 1.0 / cos(lat * pi() / 180.0)) / pi()) / 2.0 * 1048576.0) AS fy
          FROM q
        )
        SELECT min(least(abs(fx - round(fx)), abs(fy - round(fy)))) FROM f
        """
    ).fetchone()[0]
    # 1048576 = 2^12 tiles * 256 px: the finest floor() any oracle takes
    assert lat_span > 1e-6, lat_span
