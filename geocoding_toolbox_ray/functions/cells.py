"""Spatial cell encoding (the engine's H3/S2 stand-in).

Per SURVEY.md §2.8 F9 / BASELINE.json north_star: a from-scratch,
engine-wide-consistent cell id over the planar working CRS (UTM-12N-style
meters, the reference's default WKID 26912,
``/root/reference/src/agrcgeocoding/geocode.py:25``).  We use a square
power-of-two grid over a fixed Utah-sized extent:

    res r  ->  2^r x 2^r cells over [X0, X0+EXTENT) x [Y0, Y0+EXTENT)
    ix = clip(floor((x - X0) / s), 0, 2^r - 1),  s = EXTENT / 2^r
    cell = iy * 2^r + ix        (row-major int64)

Row-major (not Hilbert/Morton) keeps the id SQL-expressible with plain
arithmetic — locality only matters for range scans, and the engine
partitions by *hash* of the cell, so curve order buys nothing here.
Neighbor rings (for the kNN fallback, SURVEY.md J4) are the Chebyshev
rings ix±d, iy±d.

At res 9 a cell is 1 km — the matcher's partitioning key; skewed urban
cells are salted downstream (SURVEY.md §4.1).
"""

from __future__ import annotations

import numpy as np

X0 = 200_000.0
Y0 = 4_000_000.0
EXTENT = 512_000.0  # meters; covers the Utah UTM-12N envelope used by fixtures
DEFAULT_RES = 9     # 1 km cells


def cell_size(res: int = DEFAULT_RES) -> float:
    return EXTENT / (1 << res)


def cell_encode(x: np.ndarray, y: np.ndarray, res: int = DEFAULT_RES) -> np.ndarray:
    """Vectorized (x, y) meters -> int64 cell id."""
    n = 1 << res
    s = EXTENT / n
    ix = np.clip(np.floor((np.asarray(x, np.float64) - X0) / s), 0, n - 1).astype(np.int64)
    iy = np.clip(np.floor((np.asarray(y, np.float64) - Y0) / s), 0, n - 1).astype(np.int64)
    return iy * n + ix


def cell_decode(cell: np.ndarray, res: int = DEFAULT_RES) -> tuple[np.ndarray, np.ndarray]:
    """cell id -> (ix, iy)."""
    n = 1 << res
    cell = np.asarray(cell, np.int64)
    return cell % n, cell // n


def cell_center(cell: np.ndarray, res: int = DEFAULT_RES) -> tuple[np.ndarray, np.ndarray]:
    n = 1 << res
    s = EXTENT / n
    ix, iy = cell_decode(cell, res)
    return X0 + (ix + 0.5) * s, Y0 + (iy + 0.5) * s


def ring_cells(cell: int, ring: int, res: int = DEFAULT_RES) -> np.ndarray:
    """Cell ids at exact Chebyshev distance ``ring`` (ring 0 = the cell itself).

    Cells falling outside the grid are dropped.
    """
    n = 1 << res
    ix, iy = int(cell) % n, int(cell) // n
    if ring == 0:
        return np.array([cell], np.int64)
    d = ring
    xs, ys = [], []
    for ox in range(-d, d + 1):
        for oy in (-d, d):
            xs.append(ix + ox)
            ys.append(iy + oy)
    for oy in range(-d + 1, d):
        for ox in (-d, d):
            xs.append(ix + ox)
            ys.append(iy + oy)
    xs = np.array(xs, np.int64)
    ys = np.array(ys, np.int64)
    ok = (xs >= 0) & (xs < n) & (ys >= 0) & (ys < n)
    return ys[ok] * n + xs[ok]


def disk_cells(cell: int, radius: int, res: int = DEFAULT_RES) -> np.ndarray:
    """All cell ids within Chebyshev distance ``radius`` (inclusive)."""
    n = 1 << res
    ix, iy = int(cell) % n, int(cell) // n
    ox = np.arange(max(0, ix - radius), min(n, ix + radius + 1), dtype=np.int64)
    oy = np.arange(max(0, iy - radius), min(n, iy + radius + 1), dtype=np.int64)
    gx, gy = np.meshgrid(ox, oy)
    return (gy * n + gx).ravel()


def cell_encode_sql(x_expr: str, y_expr: str, res: int = DEFAULT_RES) -> str:
    """DuckDB expression for cell_encode — identical arithmetic (BIGINT)."""
    n = 1 << res
    s = repr(EXTENT / n)
    ix = (
        "LEAST(GREATEST(CAST(floor(({x} - {x0}) / {s}) AS BIGINT), 0), {m})"
    ).format(x=x_expr, x0=repr(X0), s=s, m=n - 1)
    iy = (
        "LEAST(GREATEST(CAST(floor(({y} - {y0}) / {s}) AS BIGINT), 0), {m})"
    ).format(y=y_expr, y0=repr(Y0), s=s, m=n - 1)
    return f"({iy} * {n} + {ix})"


# ------------------------------------------------------------- geohash
#: base32 alphabet of classic geohash (no a,i,l,o)
GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
GEOHASH_CHARS = 6                 # 6 chars = 30 bits = 15 bits per axis
GEOHASH_BITS_PER_AXIS = 15


def geohash_encode(x: np.ndarray, y: np.ndarray, chars: int = GEOHASH_CHARS) -> np.ndarray:
    """Planar geohash over the engine grid: interleave the top bits of the
    2^15-resolution cell indices (x in the odd/higher positions, the
    classic lon-first convention) and emit base32 strings.

    Pure integer bit arithmetic — the DuckDB oracle
    (``oracle.geohash_expr_sql``) builds the identical value from the same
    constants, term by term.
    """
    n = 1 << GEOHASH_BITS_PER_AXIS
    s = EXTENT / n
    ix = np.clip(np.floor((np.asarray(x, np.float64) - X0) / s), 0, n - 1).astype(np.int64)
    iy = np.clip(np.floor((np.asarray(y, np.float64) - Y0) / s), 0, n - 1).astype(np.int64)
    z = np.zeros(len(ix), np.int64)
    for k in range(GEOHASH_BITS_PER_AXIS):
        z |= ((ix >> k) & 1) << (2 * k + 1)
        z |= ((iy >> k) & 1) << (2 * k)
    alph = np.array(list(GEOHASH_ALPHABET), dtype="U1")
    total_bits = 2 * GEOHASH_BITS_PER_AXIS
    out = alph[(z >> (total_bits - 5)) & 31]
    for j in range(1, chars):
        out = np.char.add(out, alph[(z >> (total_bits - 5 * (j + 1))) & 31])
    return out.astype(object)
