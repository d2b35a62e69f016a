"""Deterministic synthetic reference tables.

The reference toolbox queries server-side Utah locator layers it never
ships (``/root/reference/src/agrcgeocoding/geocode.py:198-208`` is the only
observable surface).  Our offline engine needs local stand-ins:

* ``address_points`` — the locator layer (FIXTURES.md §7): one row per
  known address with standardized form, display form, zone (city + ZIP5),
  UTM-12N-style coordinates, address grid and locator tier.
* ``parcels`` — polygon layer (FIXTURES.md §8): one rectangle parcel per
  address point (packed flat-ring representation) plus covering cells.

Everything is a pure function of module constants — no RNG, no clock — so
the DuckDB oracle can inline the *same* table as a ``VALUES`` literal
(``address_points_values_sql``) and hash-match the engine bit-for-bit.
The tables are intentionally small (480 points); at deployment scale the
same schema is read from Parquet (``read_address_points``) and broadcast
via ``ray.put`` (see ``state/index.py``).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.cells import DEFAULT_RES, cell_encode
from ..functions.cleanse import cleanse_street
from ..functions.standardize import standardize

#: (city, zip5, center_x, center_y) — Utah-flavored, inside the cell grid extent.
CITIES: tuple[tuple[str, str, float, float], ...] = (
    ("delta", "84624", 330_000.0, 4_360_000.0),
    ("salt lake city", "84101", 425_000.0, 4_512_000.0),
    ("provo", "84601", 445_000.0, 4_455_000.0),
    ("ogden", "84401", 418_000.0, 4_565_000.0),
    ("moab", "84532", 625_000.0, 4_270_000.0),
    ("logan", "84321", 432_000.0, 4_620_000.0),
    ("st george", "84770", 270_000.0, 4_110_000.0),
    ("vernal", "84078", 600_000.0, 4_470_000.0),
)

STREETS: tuple[str, ...] = ("MAIN", "STATE", "CENTER", "SR 6", "200", "UNIVERSITY AVE")
#: streets served by the road-centerline locator tier rather than address points
_CENTERLINE_STREETS = frozenset({"SR 6", "200"})
DIRECTIONS_ABBR = ("N", "S", "E", "W")
HOUSES_PER_STREET = 10

PARCEL_HALF = 10.0  # rectangle parcel half-width in meters

#: the reference's normal.csv fixture addresses (tests/normal.csv:2-6, Delta UT)
#: included verbatim so the conformance suite matches them at score 100.
EXTRA_DELTA_ADDRESSES: tuple[str, ...] = (
    "259 W MAIN",
    "154 E MAIN",
    "39 N SR 6",
    "358 N SR 6",
    "677 N SR 6",
)

ADDRESS_POINTS_SCHEMA = pa.schema(
    [
        ("point_id", pa.int64()),
        ("addr_std", pa.string()),
        ("match_address", pa.string()),
        ("zone", pa.string()),
        ("zip", pa.string()),
        ("x", pa.float64()),
        ("y", pa.float64()),
        ("address_grid", pa.string()),
        ("locator", pa.string()),
    ]
)


POBOX_PER_CITY = 5

#: highway-alias streets (round-4 grammar depth): standardized forms
#: "us highway 89" / "highway 40", served by the centerline tier.
HIGHWAY_STREETS: tuple[str, ...] = ("US 89", "HWY 40")


def _address_point_rows(
    include_pobox: bool = False,
    include_highways: bool = False,
    include_intersections: bool = False,
) -> list[dict]:
    rows = []
    pid = 0
    for ci, (city, zip5, cx, cy) in enumerate(CITIES):
        for si, street in enumerate(STREETS):
            for h in range(1, HOUSES_PER_STREET + 1):
                pid += 1
                d = DIRECTIONS_ABBR[h % 4]
                raw = f"{h} {d} {street}"
                rows.append(
                    {
                        "point_id": pid,
                        "addr_std": standardize(cleanse_street(raw)),
                        "match_address": raw,
                        "zone": city,
                        "zip": zip5,
                        "x": cx + si * 400.0 + float(h * 37 % 200),
                        "y": cy + (h % 4) * 250.0 + float(h * 30),
                        "address_grid": city.upper(),
                        "locator": (
                            "RoadCenterlines" if street in _CENTERLINE_STREETS else "AddressPoints"
                        ),
                    }
                )
    city, zip5, cx, cy = CITIES[0]  # delta
    for k, raw in enumerate(EXTRA_DELTA_ADDRESSES):
        pid += 1
        rows.append(
            {
                "point_id": pid,
                "addr_std": standardize(cleanse_street(raw)),
                "match_address": raw,
                "zone": city,
                "zip": zip5,
                "x": cx + 5000.0 + k * 100.0,
                "y": cy + 5000.0 + k * 120.0,
                "address_grid": city.upper(),
                "locator": "AddressPoints",
            }
        )
    if include_pobox:
        # PO Box delivery points, reachable only when the reference's
        # ``pobox`` flag is 'true' (geocode.py:27,117,205 — default 'false')
        for ci, (city, zip5, cx, cy) in enumerate(CITIES):
            for k in range(1, POBOX_PER_CITY + 1):
                pid += 1
                raw = f"PO BOX {k}"
                rows.append(
                    {
                        "point_id": pid,
                        "addr_std": standardize(cleanse_street(raw)),
                        "match_address": raw,
                        "zone": city,
                        "zip": zip5,
                        "x": cx - 3000.0 - k * 40.0,
                        "y": cy - 3000.0 - k * 55.0,
                        "address_grid": city.upper(),
                        "locator": "AddressPoints",
                    }
                )
    if include_highways:
        # highway-alias centerline points, appended LAST so point_ids of
        # every other tier are stable whichever flags are set
        for ci, (city, zip5, cx, cy) in enumerate(CITIES):
            for si, street in enumerate(HIGHWAY_STREETS):
                for h in range(1, HOUSES_PER_STREET + 1):
                    pid += 1
                    d = DIRECTIONS_ABBR[h % 4]
                    raw = f"{h} {d} {street}"
                    rows.append(
                        {
                            "point_id": pid,
                            "addr_std": standardize(cleanse_street(raw)),
                            "match_address": raw,
                            "zone": city,
                            "zip": zip5,
                            "x": cx + (8 + si) * 400.0 + float(h * 41 % 200),
                            "y": cy + (h % 4) * 250.0 + float(h * 26),
                            "address_grid": city.upper(),
                            "locator": "RoadCenterlines",
                        }
                    )
    if include_intersections:
        # intersection points (round-5 grammar depth): one point per
        # unordered street pair per city, appended LAST so point_ids of
        # every other tier stay stable whichever flags are set.  addr_std
        # is the CANONICAL match key (standardized sides, smaller side
        # first) — the same ordering the match-key reorder applies to
        # inputs; match_address keeps the raw "A & B" form.
        for ci, (city, zip5, cx, cy) in enumerate(CITIES):
            for si in range(len(STREETS)):
                for sj in range(si + 1, len(STREETS)):
                    pid += 1
                    sa = standardize(cleanse_street(STREETS[si]))
                    sb = standardize(cleanse_street(STREETS[sj]))
                    lo_s, hi_s = (sa, sb) if sa <= sb else (sb, sa)
                    rows.append(
                        {
                            "point_id": pid,
                            "addr_std": f"{lo_s} and {hi_s}",
                            "match_address": f"{STREETS[si]} & {STREETS[sj]}",
                            "zone": city,
                            "zip": zip5,
                            "x": cx + (si * len(STREETS) + sj) * 150.0 + 37.0,
                            "y": cy + (si + sj * 2) * 90.0 + 11.0,
                            "address_grid": city.upper(),
                            "locator": "RoadCenterlines",
                        }
                    )
    return rows


def address_points_table(
    include_pobox: bool = False,
    include_highways: bool = False,
    include_intersections: bool = False,
) -> pa.Table:
    """The deterministic address-point reference layer (485 rows; +40 PO Box
    delivery points when ``include_pobox``; +160 highway centerline points
    when ``include_highways``; +120 intersection points when
    ``include_intersections``)."""
    rows = _address_point_rows(include_pobox, include_highways, include_intersections)
    cols = {name: [r[name] for r in rows] for name in ADDRESS_POINTS_SCHEMA.names}
    return pa.table(cols, schema=ADDRESS_POINTS_SCHEMA)


def address_points_values_sql(
    alias: str = "ap",
    include_pobox: bool = False,
    include_highways: bool = False,
    include_intersections: bool = False,
) -> str:
    """The same table as a DuckDB VALUES CTE body: ``{alias}(cols...) AS (VALUES ...)``."""
    rows = _address_point_rows(include_pobox, include_highways, include_intersections)
    parts = []
    for r in rows:
        parts.append(
            "({pid}, '{astd}', '{ma}', '{zone}', '{zip}', {x!r}, {y!r}, '{grid}', '{loc}')".format(
                pid=r["point_id"],
                astd=r["addr_std"].replace("'", "''"),
                ma=r["match_address"].replace("'", "''"),
                zone=r["zone"].replace("'", "''"),
                zip=r["zip"],
                x=r["x"],
                y=r["y"],
                grid=r["address_grid"].replace("'", "''"),
                loc=r["locator"],
            )
        )
    cols = ", ".join(ADDRESS_POINTS_SCHEMA.names)
    return f"{alias}({cols}) AS (VALUES\n" + ",\n".join(parts) + ")"


# ------------------------------------------------------------------ parcels

PARCELS_SCHEMA = pa.schema(
    [
        ("parcel_id", pa.string()),
        ("rings", pa.list_(pa.list_(pa.float64()))),
        ("h3_cells", pa.list_(pa.int64())),
    ]
)


def parcels_table(res: int = DEFAULT_RES) -> pa.Table:
    """One axis-aligned rectangle parcel centered on each address point.

    ``rings`` is the packed flat-pair polygon representation (SURVEY.md J3):
    ``list<list<float64>>`` where each inner list is ``[x0,y0, x1,y1, ...]``
    closed (first pair == last pair); first ring is the exterior.
    ``h3_cells`` are the covering cells of the parcel's bbox at ``res``.
    """
    import numpy as np

    rows = _address_point_rows()
    parcel_ids, rings, cell_lists = [], [], []
    for r in rows:
        x, y = r["x"], r["y"]
        x0, x1 = x - PARCEL_HALF, x + PARCEL_HALF
        y0, y1 = y - PARCEL_HALF, y + PARCEL_HALF
        parcel_ids.append(f"P{r['point_id']}")
        rings.append([[x0, y0, x1, y0, x1, y1, x0, y1, x0, y0]])
        corners_x = np.array([x0, x1, x0, x1])
        corners_y = np.array([y0, y0, y1, y1])
        cell_lists.append(sorted(set(cell_encode(corners_x, corners_y, res).tolist())))
    return pa.table(
        {"parcel_id": parcel_ids, "rings": rings, "h3_cells": cell_lists},
        schema=PARCELS_SCHEMA,
    )


def parcels_bbox_values_sql(alias: str = "parcels") -> str:
    """Rectangle parcels as (parcel_id, xmin, ymin, xmax, ymax) VALUES CTE body.

    The oracle checks containment on the bbox form; the engine runs the
    general ray-crossing kernel over the packed rings — identical answers
    for axis-aligned rectangles with interior query points.
    """
    rows = _address_point_rows()
    parts = []
    for r in rows:
        x, y = r["x"], r["y"]
        parts.append(
            "('P{pid}', {x0!r}, {y0!r}, {x1!r}, {y1!r})".format(
                pid=r["point_id"],
                x0=x - PARCEL_HALF,
                y0=y - PARCEL_HALF,
                x1=x + PARCEL_HALF,
                y1=y + PARCEL_HALF,
            )
        )
    return f"{alias}(parcel_id, xmin, ymin, xmax, ymax) AS (VALUES\n" + ",\n".join(parts) + ")"


# ------------------------------------------------------------ road segments

def _road_segment_rows() -> list[dict]:
    """Polyline road layer for map-matching: consecutive house points of
    each centerline-tier street form segments (9 per street per city).
    All endpoint coordinates are integral meters (same formulas as
    ``_address_point_rows``), so every snap-distance quantity downstream
    is exact int64."""
    rows = []
    sid = 0
    for ci, (city, zip5, cx, cy) in enumerate(CITIES):
        for si, street in enumerate(STREETS):
            if street not in _CENTERLINE_STREETS:
                continue
            pts = []
            for h in range(1, HOUSES_PER_STREET + 1):
                pts.append(
                    (
                        cx + si * 400.0 + float(h * 37 % 200),
                        cy + (h % 4) * 250.0 + float(h * 30),
                    )
                )
            for (ax, ay), (bx, by) in zip(pts[:-1], pts[1:]):
                sid += 1
                rows.append(
                    {
                        "seg_id": sid,
                        "ax": ax,
                        "ay": ay,
                        "bx": bx,
                        "by": by,
                        "len2": int((bx - ax) ** 2 + (by - ay) ** 2),
                    }
                )
    return rows


def road_segments_values_sql(alias: str = "segs") -> str:
    rows = _road_segment_rows()
    parts = [
        f"({r['seg_id']}, {r['ax']!r}, {r['ay']!r}, {r['bx']!r}, {r['by']!r}, {r['len2']})"
        for r in rows
    ]
    return f"{alias}(seg_id, ax, ay, bx, by, len2) AS (VALUES\n" + ",\n".join(parts) + ")"
