"""Vectorized even-odd ray-crossing point-in-polygon kernel.

Operates on the packed flat-ring polygon representation (SURVEY.md J3 /
FIXTURES.md §8): ``rings: list<list<float64>>`` with each inner list
``[x0,y0, x1,y1, ..., x0,y0]`` (closed; first ring exterior, further rings
holes — even-odd counting handles holes with no special casing).

The kernel is edge-parallel numpy: candidate (point, polygon) pairs are
expanded to (pair, edge) rows with ``np.repeat`` gathers, the crossing
predicate is evaluated elementwise, and crossings are reduced per pair
with ``np.bincount`` — no Python loop over points or polygons.
"""

from __future__ import annotations

import numpy as np


class PackedPolygons:
    """Column-major edge soup for a set of polygons."""

    __slots__ = ("ex0", "ey0", "ex1", "ey1", "edge_start", "edge_count", "n_poly",
                 "bbox_min_x", "bbox_min_y", "bbox_max_x", "bbox_max_y")

    def __init__(self, rings_per_poly: list[list[list[float]]]):
        ex0, ey0, ex1, ey1 = [], [], [], []
        edge_start, edge_count = [], []
        bminx, bminy, bmaxx, bmaxy = [], [], [], []
        for rings in rings_per_poly:
            edge_start.append(len(ex0))
            pminx = pminy = np.inf
            pmaxx = pmaxy = -np.inf
            for ring in rings:
                arr = np.asarray(ring, np.float64).reshape(-1, 2)
                xs, ys = arr[:, 0], arr[:, 1]
                ex0.extend(xs[:-1]); ey0.extend(ys[:-1])
                ex1.extend(xs[1:]); ey1.extend(ys[1:])
                pminx = min(pminx, xs.min()); pmaxx = max(pmaxx, xs.max())
                pminy = min(pminy, ys.min()); pmaxy = max(pmaxy, ys.max())
            edge_count.append(len(ex0) - edge_start[-1])
            bminx.append(pminx); bminy.append(pminy)
            bmaxx.append(pmaxx); bmaxy.append(pmaxy)
        self.ex0 = np.asarray(ex0, np.float64)
        self.ey0 = np.asarray(ey0, np.float64)
        self.ex1 = np.asarray(ex1, np.float64)
        self.ey1 = np.asarray(ey1, np.float64)
        self.edge_start = np.asarray(edge_start, np.int64)
        self.edge_count = np.asarray(edge_count, np.int64)
        self.n_poly = len(rings_per_poly)
        self.bbox_min_x = np.asarray(bminx, np.float64)
        self.bbox_min_y = np.asarray(bminy, np.float64)
        self.bbox_max_x = np.asarray(bmaxx, np.float64)
        self.bbox_max_y = np.asarray(bmaxy, np.float64)

    # ------------------------------------------------------------------
    def contains_pairs(self, px: np.ndarray, py: np.ndarray, poly_idx: np.ndarray) -> np.ndarray:
        """Even-odd containment for candidate pairs.

        px, py: (P,) point coords;  poly_idx: (P,) polygon index per pair.
        Returns bool (P,).
        """
        px = np.asarray(px, np.float64)
        py = np.asarray(py, np.float64)
        poly_idx = np.asarray(poly_idx, np.int64)
        P = len(px)
        if P == 0:
            return np.zeros(0, bool)
        counts = self.edge_count[poly_idx]
        starts = self.edge_start[poly_idx]
        total = int(counts.sum())
        if total == 0:
            return np.zeros(P, bool)
        pair_of_edge = np.repeat(np.arange(P, dtype=np.int64), counts)
        # edge index within the flat soup: start[pair] + running offset
        offs = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(counts)[:-1]]), counts
        )
        e = np.repeat(starts, counts) + offs
        x0, y0 = self.ex0[e], self.ey0[e]
        x1, y1 = self.ex1[e], self.ey1[e]
        qx, qy = px[pair_of_edge], py[pair_of_edge]
        straddle = (y0 > qy) != (y1 > qy)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x1 - x0) * (qy - y0) / (y1 - y0) + x0
        cross = straddle & (qx < xint)
        ncross = np.bincount(pair_of_edge, weights=cross.astype(np.float64), minlength=P)
        return (ncross.astype(np.int64) % 2) == 1


def polygon_areas(pp: PackedPolygons) -> np.ndarray:
    """Shoelace area per polygon over the packed edge soup (one
    ``np.add.reduceat`` — no Python loop).  Holes wound opposite the
    exterior subtract automatically through the signed sum; the fixture
    rectangles are single-ring with integral coordinates, so every
    cross product is exact in float64 (all magnitudes < 2^53)."""
    if pp.n_poly == 0:
        return np.zeros(0, np.float64)
    cross = pp.ex0 * pp.ey1 - pp.ex1 * pp.ey0
    signed = np.add.reduceat(cross, pp.edge_start)
    return np.abs(signed) * 0.5
