"""Tile-partitioned output (SURVEY.md build step 8: tile groupby output).

Writes geocoded matches as ZXY-partitioned parquet —
``out_dir/z={zoom}/x={tile_x}/y={tile_y}/*.parquet`` via Ray Data's
hive-style ``partition_cols`` — the layout a tile server reads directly
and a rerun can prune by key range.  The tile assignment itself is the
oracle-checked ``functions/tiles`` kernel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.tiles import DEFAULT_ZOOM, tile_assign


def assign_tiles_batch(batch: pa.Table, zoom: int = DEFAULT_ZOOM) -> pa.Table:
    """11-column geocode output batch -> matched rows with z/x/y columns."""
    m = batch.filter(pc.is_null(batch["message"]))
    if m.num_rows == 0:
        return pa.table(
            {
                **{f.name: pa.array([], f.type) for f in m.schema},
                "z": pa.array([], pa.int64()),
                "tile_x": pa.array([], pa.int64()),
                "tile_y": pa.array([], pa.int64()),
            }
        )
    tx, ty = tile_assign(
        np.asarray(m["x"].to_numpy(zero_copy_only=False), np.float64),
        np.asarray(m["y"].to_numpy(zero_copy_only=False), np.float64),
        zoom,
    )
    return (
        m.append_column("z", pa.array(np.full(m.num_rows, zoom, np.int64)))
        .append_column("tile_x", pa.array(tx, pa.int64()))
        .append_column("tile_y", pa.array(ty, pa.int64()))
    )


def write_tiles(geocoded, out_dir: str, zoom: int = DEFAULT_ZOOM) -> str:
    """Geocoded Dataset -> hive-partitioned per-tile parquet output."""
    tiled = geocoded.map_batches(
        lambda t: assign_tiles_batch(t, zoom), batch_format="pyarrow"
    )
    tiled.write_parquet(out_dir, partition_cols=["z", "tile_x", "tile_y"])
    return out_dir
