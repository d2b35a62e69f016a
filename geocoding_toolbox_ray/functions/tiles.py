"""ZXY web-mercator tile assignment (SURVEY.md §2.8 F10, north_star).

The engine's working CRS is planar UTM-12N-style meters (the reference's
default WKID 26912, ``/root/reference/src/agrcgeocoding/geocode.py:25``).
Tile assignment first maps (x, y) meters to (lon, lat) degrees via the
fixed affine anchored at the fixture extent (exact, deterministic — no
projection library in this sandbox), then applies the standard slippy-map
web-mercator tiling:

    tx = floor((lon + 180) / 360 * 2^z)
    ty = floor((1 - ln(tan(lat*pi/180) + 1/cos(lat*pi/180)) / pi) / 2 * 2^z)

Both numpy and DuckDB evaluate the same IEEE-double formula; the SQL
builder renders it token-for-token.
"""

from __future__ import annotations

import numpy as np

from .cells import EXTENT, X0, Y0

LON0 = -114.05
LAT0 = 37.0
LON_SPAN = 5.0
LAT_SPAN = 5.0
DEFAULT_ZOOM = 12


def to_lonlat(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    lon = LON0 + (x - X0) * (LON_SPAN / EXTENT)
    lat = LAT0 + (y - Y0) * (LAT_SPAN / EXTENT)
    return lon, lat


def tile_assign(x: np.ndarray, y: np.ndarray, zoom: int = DEFAULT_ZOOM) -> tuple[np.ndarray, np.ndarray]:
    """(x, y) meters -> (tile_x, tile_y) int64 at ``zoom``."""
    lon, lat = to_lonlat(x, y)
    n = float(1 << zoom)
    tx = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    lat_rad = lat * (np.pi / 180.0)
    ty = np.floor(
        (1.0 - np.log(np.tan(lat_rad) + 1.0 / np.cos(lat_rad)) / np.pi) / 2.0 * n
    ).astype(np.int64)
    return tx, ty


def tile_assign_sql(x_expr: str, y_expr: str, zoom: int = DEFAULT_ZOOM) -> tuple[str, str]:
    """DuckDB expressions (tx, ty) matching tile_assign bit-for-bit."""
    n = float(1 << zoom)
    lon = f"({LON0!r} + ({x_expr} - {X0!r}) * ({LON_SPAN!r} / {EXTENT!r}))"
    lat = f"({LAT0!r} + ({y_expr} - {Y0!r}) * ({LAT_SPAN!r} / {EXTENT!r}))"
    lat_rad = f"({lat} * (pi() / 180.0))"
    tx = f"CAST(floor(({lon} + 180.0) / 360.0 * {n!r}) AS BIGINT)"
    ty = (
        "CAST(floor((1.0 - ln(tan({lr}) + 1.0 / cos({lr})) / pi()) / 2.0 * {n}) AS BIGINT)"
    ).format(lr=lat_rad, n=repr(n))
    return tx, ty
