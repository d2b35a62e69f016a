"""Output spatial-reference projection (the reference's ``spatial_reference``
parameter, ``/root/reference/src/agrcgeocoding/geocode.py:25,115,204`` —
WKID 26912 default; any Esri WKID accepted by the API).

Local engine support:

* 26912 — native working CRS (UTM-12N-style meters): identity.
* 4326  — lon/lat degrees via the engine's fixed affine (``tiles.to_lonlat``)
          — exact arithmetic, oracle-checkable.
* 3857  — web-mercator meters from the 4326 affine (ln/tan; 1-ulp
          differences between engines possible, so not oracle-hashed).

Error rows keep x = y = 0 in every CRS, exactly like the reference's
error-row shape (geocode.py:182).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .cells import EXTENT, X0, Y0
from .tiles import LAT0, LON0, LAT_SPAN, LON_SPAN

_MERC_R = 20037508.342789244

SUPPORTED_WKIDS = (26912, 4326, 3857)


def project_xy(x: np.ndarray, y: np.ndarray, wkid: int) -> tuple[np.ndarray, np.ndarray]:
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    if wkid == 26912:
        return x, y
    lon = LON0 + (x - X0) * (LON_SPAN / EXTENT)
    lat = LAT0 + (y - Y0) * (LAT_SPAN / EXTENT)
    if wkid == 4326:
        return lon, lat
    if wkid == 3857:
        mx = lon * (_MERC_R / 180.0)
        my = np.log(np.tan((90.0 + lat) * (np.pi / 360.0))) * (_MERC_R / np.pi)
        return mx, my
    raise ValueError(f"unsupported spatial_reference wkid: {wkid}")


def project_output_batch(batch: pa.Table, wkid: int) -> pa.Table:
    """Project the matched rows of an 11-column geocode output batch;
    error rows (message non-null) keep x = y = 0."""
    if wkid == 26912:
        return batch
    x = np.asarray(batch["x"].to_numpy(zero_copy_only=False), np.float64)
    y = np.asarray(batch["y"].to_numpy(zero_copy_only=False), np.float64)
    px, py = project_xy(x, y, wkid)
    matched = pc.is_null(batch["message"]).to_numpy(zero_copy_only=False)
    out_x = np.where(matched, px, 0.0)
    out_y = np.where(matched, py, 0.0)
    return batch.set_column(
        batch.schema.get_field_index("x"), "x", pa.array(out_x, pa.float64())
    ).set_column(
        batch.schema.get_field_index("y"), "y", pa.array(out_y, pa.float64())
    )


def project_xy_sql(x_expr: str, y_expr: str, wkid: int) -> tuple[str, str]:
    """DuckDB expressions matching project_xy (26912 / 4326 only — 3857 uses
    transcendentals whose last ulp is not portable across engines)."""
    if wkid == 26912:
        return x_expr, y_expr
    if wkid == 4326:
        lon = f"({LON0!r} + ({x_expr} - {X0!r}) * ({LON_SPAN!r} / {EXTENT!r}))"
        lat = f"({LAT0!r} + ({y_expr} - {Y0!r}) * ({LAT_SPAN!r} / {EXTENT!r}))"
        return lon, lat
    raise ValueError(f"no SQL builder for wkid {wkid}")
