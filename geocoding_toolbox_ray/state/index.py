"""Compiled geocode index — the broadcast small side of the match join.

Replaces the server-side locator state the reference selects with its
``locators`` parameter (``/root/reference/src/agrcgeocoding/geocode.py:26,
128, 205``).  Built once on the driver from the address-point table,
``ray.put`` once, and ``ray.get`` once per matcher actor in ``__init__``
(SURVEY.md T2) — never re-shipped per batch.

Contents:

* an exact probe table keyed by ``(zone_key, addr_std)`` — zone_key is the
  lowercased cleansed zone; every point is reachable under both its city
  name and its ZIP5 (the reference API accepts either as the zone);
* per-zone candidate arrays for the fuzzy scored tier (SURVEY.md J2);
* a cell -> point lookup (sorted int64 cells + searchsorted spans) for the
  kNN ring-expansion fallback (SURVEY.md J4).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.cells import DEFAULT_RES, cell_encode


@dataclass
class GeocodeIndex:
    exact: pd.DataFrame            # zone_key, addr_std, x, y, match_address, address_grid, locator, point_id
    zone_groups: dict              # zone_key -> int ndarray of row positions into `points`
    points: pd.DataFrame           # point_id, addr_std, match_address, x, y, address_grid, locator
    cells_sorted: np.ndarray = field(default=None)   # sorted cell ids (parallel to cell_order)
    cell_order: np.ndarray = field(default=None)     # row positions into `points`, cell-sorted
    res: int = DEFAULT_RES

    @staticmethod
    def build(address_points: pa.Table, locators: str = "all", res: int = DEFAULT_RES) -> "GeocodeIndex":
        """Compile the index; ``locators`` filters the participating tiers
        ('all' | 'addressPoints' | 'roadCenterlines', reference default 'all',
        geocode.py:26)."""
        df = address_points.to_pandas()
        if locators == "addressPoints":
            df = df[df["locator"] == "AddressPoints"]
        elif locators == "roadCenterlines":
            df = df[df["locator"] == "RoadCenterlines"]
        elif locators != "all":
            from ..errors import InvalidConfigurationException

            # build-time fail-fast: the local analogue of the reference's
            # InvalidAPIKeyException abort (geocode.py:217-219, 299-308)
            raise InvalidConfigurationException(f"unknown locators selector: {locators!r}")
        df = df.reset_index(drop=True)

        # every point reachable under city-name key and zip key
        by_name = df.assign(zone_key=df["zone"])
        by_zip = df.assign(zone_key=df["zip"])
        keyed = pd.concat([by_name, by_zip], ignore_index=True)
        exact = keyed[
            ["zone_key", "addr_std", "x", "y", "match_address", "address_grid", "locator", "point_id"]
        ]
        # Real address-point layers can carry duplicate (zone_key, addr_std)
        # rows (e.g. zone == zip); the Acero left join in the matcher would
        # fan out one output row per duplicate, breaking the one-row-per-input
        # contract. Keep min point_id — the oracle's tie-break (ADVICE r1).
        exact = (
            exact.sort_values("point_id", kind="mergesort")
            .drop_duplicates(["zone_key", "addr_std"], keep="first")
            .reset_index(drop=True)
        )

        zone_groups: dict[str, np.ndarray] = {}
        for zone_key, grp in keyed.groupby("zone_key"):
            # positions into the original df (keyed holds df's index duplicated)
            zone_groups[zone_key] = grp.index.to_numpy() % len(df)

        cells = cell_encode(df["x"].to_numpy(), df["y"].to_numpy(), res)
        order = np.argsort(cells, kind="stable")
        return GeocodeIndex(
            exact=exact,
            zone_groups=zone_groups,
            points=df[["point_id", "addr_std", "match_address", "x", "y", "address_grid", "locator"]],
            cells_sorted=cells[order],
            cell_order=order,
            res=res,
        )

    def points_in_cells(self, cells: np.ndarray) -> np.ndarray:
        """Row positions (into ``points``) of all reference points in ``cells``."""
        lo = np.searchsorted(self.cells_sorted, cells, side="left")
        hi = np.searchsorted(self.cells_sorted, cells, side="right")
        if len(cells) == 0:
            return np.zeros(0, np.int64)
        return np.concatenate(
            [self.cell_order[a:b] for a, b in zip(lo, hi)]
        ) if np.any(hi > lo) else np.zeros(0, np.int64)
