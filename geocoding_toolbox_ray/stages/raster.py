"""Raster <-> vector tile operators (north_star: "raster<->vector tile
assignment for ZXY web-mercator output tiles").

* ``rasterize_sparse`` (vector -> raster): points -> sparse per-tile pixel
  counts at ``tile_px`` resolution.  Global pixel indices are computed
  first (``gx = floor(mercator_fraction * 2^z * px)``) and the tile id is
  derived as ``gx // px`` so tile and pixel can never disagree by a
  floating-point ulp.
* ``vectorize_centroids`` (raster -> vector): sparse pixel counts -> one
  weighted centroid point per pixel (inverse web-mercator) — the path
  that turns an aggregated heat raster back into a point layer.

Round-trip invariant (tested): rasterizing the vectorized centroids
reproduces the sparse raster exactly (a pixel centroid falls in its own
pixel).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.tiles import DEFAULT_ZOOM, to_lonlat

TILE_PX = 256


def global_pixel(x: np.ndarray, y: np.ndarray, zoom: int = DEFAULT_ZOOM, px: int = TILE_PX):
    """(x, y) meters -> global pixel indices (gx, gy) at zoom."""
    lon, lat = to_lonlat(x, y)
    n = float(1 << zoom) * px
    gx = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    lat_rad = lat * (np.pi / 180.0)
    gy = np.floor(
        (1.0 - np.log(np.tan(lat_rad) + 1.0 / np.cos(lat_rad)) / np.pi) / 2.0 * n
    ).astype(np.int64)
    return gx, gy


def global_pixel_sql(x_expr: str, y_expr: str, zoom: int = DEFAULT_ZOOM, px: int = TILE_PX):
    from ..functions.tiles import EXTENT, LAT0, LAT_SPAN, LON0, LON_SPAN, X0, Y0

    n = float((1 << zoom) * px)
    lon = f"({LON0!r} + ({x_expr} - {X0!r}) * ({LON_SPAN!r} / {EXTENT!r}))"
    lat = f"({LAT0!r} + ({y_expr} - {Y0!r}) * ({LAT_SPAN!r} / {EXTENT!r}))"
    lat_rad = f"({lat} * (pi() / 180.0))"
    gx = f"CAST(floor(({lon} + 180.0) / 360.0 * {n!r}) AS BIGINT)"
    gy = (
        "CAST(floor((1.0 - ln(tan({lr}) + 1.0 / cos({lr})) / pi()) / 2.0 * {n}) AS BIGINT)"
    ).format(lr=lat_rad, n=repr(n))
    return gx, gy


def rasterize_partial(batch: pa.Table, zoom: int = DEFAULT_ZOOM, px: int = TILE_PX) -> pa.Table:
    """map_batches body: (qx, qy) points -> partial sparse raster rows
    (tile_x, tile_y, px_x, px_y, part_n)."""
    gx, gy = global_pixel(
        np.asarray(batch["qx"].to_numpy(zero_copy_only=False), np.float64),
        np.asarray(batch["qy"].to_numpy(zero_copy_only=False), np.float64),
        zoom,
        px,
    )
    key = gx * (np.int64(1) << 32) + gy
    uniq, counts = np.unique(key, return_counts=True)
    ugx = uniq >> 32
    ugy = uniq & ((np.int64(1) << 32) - 1)
    return pa.table(
        {
            "tile_x": pa.array(ugx // px, pa.int64()),
            "tile_y": pa.array(ugy // px, pa.int64()),
            "px_x": pa.array(ugx % px, pa.int64()),
            "px_y": pa.array(ugy % px, pa.int64()),
            "part_n": pa.array(counts.astype(np.int64), pa.int64()),
        }
    )


def rasterize_sparse(points, zoom: int = DEFAULT_ZOOM, px: int = TILE_PX, nbuckets: int = 64):
    """points Dataset (qx, qy) -> sparse raster Dataset
    (tile_x, tile_y, px_x, px_y, n) with pre-aggregated partials.

    The pixel key has raster cardinality (millions of groups at scale), so
    the final reduce hashes the composite pixel key into coarse buckets
    and sums vectorized inside each bucket — never a Ray groupby on the
    4-column pixel key itself (Ray aggregate cost scales with group
    count)."""
    partial = points.map_batches(
        lambda t: rasterize_partial(t, zoom, px), batch_format="pyarrow"
    )

    def _bucketed(t: pa.Table) -> pa.Table:
        tx = np.asarray(t["tile_x"].to_numpy(zero_copy_only=False), np.int64)
        ty = np.asarray(t["tile_y"].to_numpy(zero_copy_only=False), np.int64)
        pxx = np.asarray(t["px_x"].to_numpy(zero_copy_only=False), np.int64)
        pxy = np.asarray(t["px_y"].to_numpy(zero_copy_only=False), np.int64)
        key = ((tx * px + pxx) << np.int64(32)) + (ty * px + pxy)
        bucket = (key * 2654435761 % 2**32) % nbuckets
        return pa.table(
            {
                "bucket": pa.array(bucket, pa.int64()),
                "key": pa.array(key, pa.int64()),
                "part_n": t["part_n"],
            }
        )

    def _reduce(g):
        s = g.groupby("key", sort=False)["part_n"].sum()
        key = s.index.to_numpy(np.int64)
        gx = key >> 32
        gy = key & ((np.int64(1) << 32) - 1)
        import pandas as pd

        return pd.DataFrame(
            {
                "tile_x": gx // px,
                "tile_y": gy // px,
                "px_x": gx % px,
                "px_y": gy % px,
                "n": s.to_numpy(np.int64),
            }
        )

    return (
        partial.map_batches(_bucketed, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_reduce, batch_format="pandas")
    )


def vectorize_centroids(batch: pa.Table, zoom: int = DEFAULT_ZOOM, px: int = TILE_PX) -> pa.Table:
    """map_batches body: sparse raster rows -> pixel-centroid points
    (lon, lat, weight) via inverse web-mercator."""
    n = float(1 << zoom) * px
    gx = (
        np.asarray(batch["tile_x"].to_numpy(zero_copy_only=False), np.int64) * px
        + np.asarray(batch["px_x"].to_numpy(zero_copy_only=False), np.int64)
    )
    gy = (
        np.asarray(batch["tile_y"].to_numpy(zero_copy_only=False), np.int64) * px
        + np.asarray(batch["px_y"].to_numpy(zero_copy_only=False), np.int64)
    )
    lon = (gx + 0.5) / n * 360.0 - 180.0
    lat = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * (gy + 0.5) / n))))
    return pa.table(
        {
            "lon": pa.array(lon, pa.float64()),
            "lat": pa.array(lat, pa.float64()),
            "weight": batch["n"],
        }
    )
