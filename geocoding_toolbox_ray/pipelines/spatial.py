"""Spatial query pipelines: PIP join, kNN join, cell encode, tile assign.

Query points are derived from ``lineitem`` with pure integer/double
arithmetic mirrored in the oracle SQL (see ``oracle.py``):

* anchored points (PIP / kNN): a reference point chosen by
  ``pid = 1 + ((l_orderkey*7 + l_linenumber) % 600)`` (ids > 480 drop out)
  offset by a deterministic (dx, dy) — inside / outside / neighbor-parcel
  mix;
* uniform points (cells / tiles): lattice points
  ``X0 + ((l_orderkey*131 + l_linenumber*17) % 4096) * 125.0`` etc.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.cells import X0, Y0, cell_encode
from ..functions.tiles import tile_assign
from ..sources.synthetic import address_points_table, parcels_table

_AP_CACHE: dict = {}


def _ap_arrays():
    """address-point coords indexable by point_id-1 (point_id is 1..N sequential)."""
    if "xy" not in _AP_CACHE:
        t = address_points_table()
        _AP_CACHE["xy"] = (
            np.asarray(t["x"].to_numpy(), np.float64),
            np.asarray(t["y"].to_numpy(), np.float64),
        )
    return _AP_CACHE["xy"]


DX_BY_MOD3 = (3.0, 12.0, -2.0)
DY_BY_MOD2 = (4.0, -50.0)


def derive_anchored_points(batch: pa.Table) -> pa.Table:
    """lineitem batch -> (query_id, qx, qy) anchored at reference points."""
    ok = np.asarray(batch["l_orderkey"].to_numpy(zero_copy_only=False), np.int64)
    ln = np.asarray(batch["l_linenumber"].to_numpy(zero_copy_only=False), np.int64)
    ax, ay = _ap_arrays()
    pid = 1 + (ok * 7 + ln) % 600
    keep = pid <= len(ax)
    ok, ln, pid = ok[keep], ln[keep], pid[keep]
    dx = np.array(DX_BY_MOD3, np.float64)[ok % 3]
    dy = np.array(DY_BY_MOD2, np.float64)[ln % 2]
    return pa.table(
        {
            "query_id": pa.array(ok * 10 + ln, pa.int64()),
            "qx": pa.array(ax[pid - 1] + dx, pa.float64()),
            "qy": pa.array(ay[pid - 1] + dy, pa.float64()),
        }
    )


def derive_uniform_points(batch: pa.Table) -> pa.Table:
    """lineitem batch -> (query_id, qx, qy) on the 125 m lattice."""
    ok = np.asarray(batch["l_orderkey"].to_numpy(zero_copy_only=False), np.int64)
    ln = np.asarray(batch["l_linenumber"].to_numpy(zero_copy_only=False), np.int64)
    pk = np.asarray(batch["l_partkey"].to_numpy(zero_copy_only=False), np.int64)
    qx = X0 + ((ok * 131 + ln * 17) % 4096).astype(np.float64) * 125.0
    qy = Y0 + ((ok * 241 + pk * 13) % 4096).astype(np.float64) * 125.0
    return pa.table(
        {
            "query_id": pa.array(ok * 10 + ln, pa.int64()),
            "qx": pa.array(qx, pa.float64()),
            "qy": pa.array(qy, pa.float64()),
        }
    )


# ------------------------------------------------------------ pipelines

def _lineitem(sf_dir: str, columns, override_num_blocks: int | None = None):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=columns,
        override_num_blocks=override_num_blocks,
    )


def pip_join(sf_dir: str):
    """Anchored points -> containing parcel (or null) via the PIP actor stage."""
    import ray

    from ..stages.spatial import ParcelIndex, PipStage

    pts = _lineitem(sf_dir, ["l_orderkey", "l_linenumber"]).map_batches(
        derive_anchored_points, batch_format="pyarrow"
    )
    index_ref = ray.put(ParcelIndex.build(parcels_table()))
    return pts.map_batches(
        PipStage,
        fn_constructor_kwargs={"parcel_index_ref": index_ref},
        batch_format="pyarrow",
        batch_size=16384,
        concurrency=(1, 8),
    )


def knn_join(sf_dir: str):
    """Anchored points -> exact nearest reference point via ring expansion."""
    import ray

    from ..state.index import GeocodeIndex
    from ..stages.spatial import KnnStage

    pts = _lineitem(sf_dir, ["l_orderkey", "l_linenumber"]).map_batches(
        derive_anchored_points, batch_format="pyarrow"
    )
    index_ref = ray.put(GeocodeIndex.build(address_points_table()))
    return pts.map_batches(
        KnnStage,
        fn_constructor_kwargs={"index_ref": index_ref},
        batch_format="pyarrow",
        batch_size=16384,
        concurrency=(1, 8),
    )


def cell_encode_lineitem(sf_dir: str):
    def _f(batch: pa.Table) -> pa.Table:
        pts = derive_uniform_points(batch)
        cell = cell_encode(
            pts["qx"].to_numpy(zero_copy_only=False),
            pts["qy"].to_numpy(zero_copy_only=False),
        )
        return pa.table({"query_id": pts["query_id"], "cell": pa.array(cell, pa.int64())})

    return _lineitem(sf_dir, ["l_orderkey", "l_linenumber", "l_partkey"]).map_batches(
        _f, batch_format="pyarrow"
    )


def tile_assign_lineitem(sf_dir: str):
    def _f(batch: pa.Table) -> pa.Table:
        pts = derive_uniform_points(batch)
        tx, ty = tile_assign(
            pts["qx"].to_numpy(zero_copy_only=False),
            pts["qy"].to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {
                "query_id": pts["query_id"],
                "tile_x": pa.array(tx, pa.int64()),
                "tile_y": pa.array(ty, pa.int64()),
            }
        )

    return _lineitem(sf_dir, ["l_orderkey", "l_linenumber", "l_partkey"]).map_batches(
        _f, batch_format="pyarrow"
    )


def tile_counts(sf_dir: str):
    """Per-tile point counts with partial aggregation before the shuffle:
    each batch emits one row per tile it saw, then a small groupby sums the
    partials (the pre-aggregate pattern for the skewed wide step)."""
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        pts = derive_uniform_points(batch)
        tx, ty = tile_assign(
            pts["qx"].to_numpy(zero_copy_only=False),
            pts["qy"].to_numpy(zero_copy_only=False),
        )
        key = tx * (1 << 20) + ty
        uniq, counts = np.unique(key, return_counts=True)
        return pa.table(
            {
                "tile_x": pa.array(uniq >> 20, pa.int64()),
                "tile_y": pa.array(uniq & ((1 << 20) - 1), pa.int64()),
                "partial_n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    ds = _lineitem(sf_dir, ["l_orderkey", "l_linenumber", "l_partkey"]).map_batches(
        _partial, batch_format="pyarrow"
    )
    return ds.groupby(["tile_x", "tile_y"]).aggregate(Sum("partial_n", alias_name="n"))


PYRAMID_LEVELS = 4  # DEFAULT_ZOOM down to DEFAULT_ZOOM-3


def tile_pyramid(sf_dir: str, levels: int = PYRAMID_LEVELS):
    """Tile-pyramid rollup: per-tile counts at ``levels`` zoom levels in
    ONE pass — slippy-tile parents are exact integer halvings of child
    coordinates (floor composes: tile at z-1 == tile at z // 2), so
    every level's partial counts come from the same per-batch tile
    assignment and ride one bounded groupby keyed on the packed
    (zoom, tx, ty) int64.  The standard web-map pyramid build, exact in
    SQL (integer division rollup)."""
    from ray.data.aggregate import Sum

    from ..functions.tiles import DEFAULT_ZOOM, tile_assign

    def _partial(batch: pa.Table) -> pa.Table:
        pts = derive_uniform_points(batch)
        tx, ty = tile_assign(
            pts["qx"].to_numpy(zero_copy_only=False),
            pts["qy"].to_numpy(zero_copy_only=False),
        )
        keys = []
        for lv in range(levels):
            z = DEFAULT_ZOOM - lv
            keys.append(
                (np.int64(z) << np.int64(40))
                | ((tx >> lv) << np.int64(20))
                | (ty >> lv)
            )
        key = np.concatenate(keys)
        uniq, counts = np.unique(key, return_counts=True)
        return pa.table(
            {
                "zoom": pa.array(uniq >> 40, pa.int64()),
                "tile_x": pa.array((uniq >> 20) & ((1 << 20) - 1), pa.int64()),
                "tile_y": pa.array(uniq & ((1 << 20) - 1), pa.int64()),
                "partial_n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    ds = _lineitem(sf_dir, ["l_orderkey", "l_linenumber", "l_partkey"]).map_batches(
        _partial, batch_format="pyarrow"
    )
    return ds.groupby(["zoom", "tile_x", "tile_y"]).aggregate(
        Sum("partial_n", alias_name="n")
    )


def tile_counts_salted(sf_dir: str, salt: int = 8, hot_threshold: int = 20):
    """``tile_counts`` computed through the HOT-KEY SALTING path
    (SURVEY.md §4.1, wired per VERDICT r1 #7): a cheap pre-pass detects
    tiles above ``hot_threshold`` rows, each hot tile's rows are split
    across ``salt`` deterministic sub-keys so no single reducer sees the
    whole hot group, and a tiny second combine de-salts.  Output is
    identical to ``tile_counts`` (same DuckDB oracle hash).

    This is the template for any skewed raw-row groupby where per-batch
    partial pre-aggregation can't absorb the skew (e.g. distinct-heavy or
    holistic aggregates over Salt-Lake-valley cells)."""
    from ray.data.aggregate import Count, Sum

    from ..stages.salt import add_salted_key, detect_hot_keys

    def _keyed(batch: pa.Table) -> pa.Table:
        pts = derive_uniform_points(batch)
        tx, ty = tile_assign(
            pts["qx"].to_numpy(zero_copy_only=False),
            pts["qy"].to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {
                "query_id": pts["query_id"],
                "key": pa.array(tx * (1 << 20) + ty, pa.int64()),
            }
        )

    keyed = _lineitem(sf_dir, ["l_orderkey", "l_linenumber", "l_partkey"]).map_batches(
        _keyed, batch_format="pyarrow"
    )
    hot = detect_hot_keys(keyed, "key", hot_threshold)
    salted = keyed.map_batches(
        lambda t: add_salted_key(t, "key", "query_id", hot, salt),
        batch_format="pyarrow",
    )
    per_salt = salted.groupby("salted_key").aggregate(Count(alias_name="n_part"))

    def _desalt(t: pa.Table) -> pa.Table:
        key = np.asarray(t["salted_key"].to_numpy(zero_copy_only=False), np.int64) // salt
        return pa.table(
            {
                "tile_x": pa.array(key >> 20, pa.int64()),
                "tile_y": pa.array(key & ((1 << 20) - 1), pa.int64()),
                "n_part": t["n_part"],
            }
        )

    return (
        per_salt.map_batches(_desalt, batch_format="pyarrow")
        .groupby(["tile_x", "tile_y"])
        .aggregate(Sum("n_part", alias_name="n"))
    )


def knn_topk_join(sf_dir: str, k: int = 3):
    """Exact k-NN (ranked) via ring expansion with the k-th-neighbor bound."""
    import ray

    from ..state.index import GeocodeIndex
    from ..stages.spatial import KnnKStage

    pts = _lineitem(sf_dir, ["l_orderkey", "l_linenumber"]).map_batches(
        derive_anchored_points, batch_format="pyarrow"
    )
    index_ref = ray.put(GeocodeIndex.build(address_points_table()))
    return pts.map_batches(
        KnnKStage,
        fn_constructor_kwargs={"index_ref": index_ref, "k": k},
        batch_format="pyarrow",
        batch_size=16384,
        concurrency=(1, 8),
    )


RADIUS_JOIN_M = 120.0  # distance-join radius (meters)


def derive_anchored_points_qty(batch: pa.Table) -> pa.Table:
    """``derive_anchored_points`` plus an integer measure column
    ``qty = floor(l_quantity + 0.5)`` (TPC-H quantities are integral)."""
    ok = np.asarray(batch["l_orderkey"].to_numpy(zero_copy_only=False), np.int64)
    ln = np.asarray(batch["l_linenumber"].to_numpy(zero_copy_only=False), np.int64)
    qt = np.asarray(batch["l_quantity"].to_numpy(zero_copy_only=False), np.float64)
    ax, ay = _ap_arrays()
    pid = 1 + (ok * 7 + ln) % 600
    keep = pid <= len(ax)
    ok, ln, pid, qt = ok[keep], ln[keep], pid[keep], qt[keep]
    dx = np.array(DX_BY_MOD3, np.float64)[ok % 3]
    dy = np.array(DY_BY_MOD2, np.float64)[ln % 2]
    return pa.table(
        {
            "query_id": pa.array(ok * 10 + ln, pa.int64()),
            "qx": pa.array(ax[pid - 1] + dx, pa.float64()),
            "qy": pa.array(ay[pid - 1] + dy, pa.float64()),
            "qty": pa.array(np.floor(qt + 0.5).astype(np.int64), pa.int64()),
        }
    )


def radius_join(sf_dir: str, radius: float = RADIUS_JOIN_M):
    """Distance join: every (anchored point, reference point) pair within
    ``radius`` meters — the spatial range-join primitive (DWithin)."""
    import ray

    from ..state.index import GeocodeIndex
    from ..stages.spatial import RadiusStage

    pts = _lineitem(sf_dir, ["l_orderkey", "l_linenumber"]).map_batches(
        derive_anchored_points, batch_format="pyarrow"
    )
    index_ref = ray.put(GeocodeIndex.build(address_points_table()))
    return pts.map_batches(
        RadiusStage,
        fn_constructor_kwargs={"index_ref": index_ref, "radius": radius},
        batch_format="pyarrow",
        batch_size=16384,
        concurrency=(1, 8),
    )


def parcel_zonal_stats(sf_dir: str):
    """Zonal statistics: per-parcel count and quantity sum over all
    anchored points strictly inside the parcel (vector zonal summary).
    Per-batch ``np.bincount`` partials ride a groupby bounded by the
    parcel layer (485 groups), never by input rows."""
    import ray
    from ray.data.aggregate import Sum

    from ..stages.spatial import ParcelIndex, ZonalStage

    pts = _lineitem(sf_dir, ["l_orderkey", "l_linenumber", "l_quantity"]).map_batches(
        derive_anchored_points_qty, batch_format="pyarrow"
    )
    index_ref = ray.put(ParcelIndex.build(parcels_table()))
    partials = pts.map_batches(
        ZonalStage,
        fn_constructor_kwargs={"parcel_index_ref": index_ref},
        batch_format="pyarrow",
        batch_size=16384,
        concurrency=(1, 8),
    )
    return partials.groupby("parcel_id").aggregate(
        Sum("partial_n", alias_name="n_points"),
        Sum("partial_qty", alias_name="sum_qty"),
    )


REVERSE_MAX_D_M = 2000.0  # reverse-geocode cutoff (meters)


def reverse_geocode_lineitem(sf_dir: str, max_d: float = REVERSE_MAX_D_M):
    """Reverse geocoding: uniform lattice points -> nearest address point
    within ``max_d`` meters (sentinel -1 / NULL columns beyond the cutoff).
    The fixed candidate disk keeps open-desert queries O(1)."""
    import ray

    from ..state.index import GeocodeIndex
    from ..stages.spatial import ReverseGeocodeStage

    pts = _lineitem(sf_dir, ["l_orderkey", "l_linenumber", "l_partkey"]).map_batches(
        derive_uniform_points, batch_format="pyarrow"
    )
    index_ref = ray.put(GeocodeIndex.build(address_points_table()))

    # task stage with a per-worker-process stage cache (the matcher's
    # make_matcher_fn recipe): actor-pool spin-up dominated small runs
    # (22.5 s at sf0.01 vs 2.5 s at sf0.1 with concurrency=(1, 8));
    # tasks reuse warm workers and keep read/compute elastic.
    from ..stages.spatial import make_reverse_geocode_fn

    return pts.map_batches(
        make_reverse_geocode_fn(index_ref, max_d),
        batch_format="pyarrow",
        batch_size=16384,
    )


def geohash_lineitem(sf_dir: str):
    """Uniform lattice points -> planar base32 geohash strings (the
    third cell-code family next to square cells and ZXY tiles)."""
    from ..functions.cells import geohash_encode

    def _f(batch: pa.Table) -> pa.Table:
        pts = derive_uniform_points(batch)
        gh = geohash_encode(
            pts["qx"].to_numpy(zero_copy_only=False),
            pts["qy"].to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {"query_id": pts["query_id"], "geohash": pa.array(gh, pa.string())}
        )

    return _lineitem(sf_dir, ["l_orderkey", "l_linenumber", "l_partkey"]).map_batches(
        _f, batch_format="pyarrow"
    )


# --------------------------------------------- big-big cell-shuffle join

CELL_JOIN_RADIUS_M = 800.0
CELL_JOIN_RES = 9  # 1 km cells: cell_size >= radius so ONE ring suffices


def spatial_cell_join(sf_dir: str, radius: float = CELL_JOIN_RADIUS_M, mult: int = 1):
    """Big-big distance join via the explicit cell shuffle (the north
    star's ``groupby(h3_cell)`` exchange): BOTH sides are
    input-proportional — anchored points (A) and uniform lattice points
    (B) — so no broadcast fits.  B replicates to its 3x3 neighbor cells
    (the standard spatial-join replication; cell size >= radius makes one
    ring provably sufficient), both streams hash-bucket on the target
    cell, and each bounded bucket pairs the sides with ONE vectorized
    merge + exact d2 filter.  Pairs appear exactly once: A lives in one
    cell, B once per distinct target cell.

    The DuckDB oracle replicates B to the same 9 offsets and
    equality-joins on the packed cell — identical replication plan, so
    the float d2 column hashes bit-for-bit.

    ``mult`` (bench-only, default 1 = the oracle-checked shape) derives
    ``mult`` B points per lineitem row at shifted lattice positions with
    distinct qids — the scaling-run knob that makes the exchange
    compute-bound at small sf (at sf0.1 the default input finishes in
    ~4 s, so fixed shuffle latency dominates any efficiency measurement).
    """
    from ..functions.cells import EXTENT, X0, Y0
    from ..stages.dedup import TARGET_BUCKET_ROWS, _mix_bucket

    import pyarrow.parquet as pq

    n_li = int(pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows)
    nbuckets = max(16, n_li * (1 + int(mult)) // TARGET_BUCKET_ROWS + 1)
    ncell = 1 << CELL_JOIN_RES
    s = EXTENT / ncell
    r2 = float(radius) * float(radius)

    def _cells(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        ix = np.floor((x - X0) / s).astype(np.int64)
        iy = np.floor((y - Y0) / s).astype(np.int64)
        return ix, iy

    # Replication pruning (the semi-join pushdown at the exchange): a B
    # replica headed for a target cell with no A rows contributes nothing.
    # A's possible cells are a pure function of the anchored-point
    # constants (485 reference points x the fixed dx/dy offsets), so the
    # pruning set costs no data pass here; in the general big-big case
    # the same set comes from a cheap distinct-cells scan of A (it is
    # tiny: occupied cells, not rows).  Output-invariant, shuffle volume
    # drops by the empty-map fraction (~99% on this corpus).
    ax, ay = _ap_arrays()
    parts = []
    for dx in DX_BY_MOD3:
        for dy in DY_BY_MOD2:
            aix, aiy = _cells(ax + dx, ay + dy)
            parts.append(aiy * ncell + aix)
    a_cells = np.unique(np.concatenate(parts))

    def _tag_a(batch: pa.Table) -> pa.Table:
        pts = derive_anchored_points(batch)
        x = pts["qx"].to_numpy(zero_copy_only=False)
        y = pts["qy"].to_numpy(zero_copy_only=False)
        ix, iy = _cells(x, y)
        cell = iy * ncell + ix
        return pa.table(
            {
                "bucket": pa.array(_mix_bucket(cell, np.zeros(len(cell), np.int64), nbuckets)),
                "cell": pa.array(cell, pa.int64()),
                "side": pa.array(np.zeros(len(cell), np.int64)),
                "qid": pts["query_id"],
                "x": pa.array(np.asarray(x, np.float64)),
                "y": pa.array(np.asarray(y, np.float64)),
            }
        )

    def _uniform_mult(batch: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """mult B points per row: lattice shifts (j*29, j*53) per copy j,
        qids disjoint per copy (base*mult + j)."""
        ok = np.asarray(batch["l_orderkey"].to_numpy(zero_copy_only=False), np.int64)
        ln = np.asarray(batch["l_linenumber"].to_numpy(zero_copy_only=False), np.int64)
        pk = np.asarray(batch["l_partkey"].to_numpy(zero_copy_only=False), np.int64)
        xs, ys, qs = [], [], []
        for j in range(int(mult)):
            xs.append(X0 + ((ok * 131 + ln * 17 + j * 29) % 4096).astype(np.float64) * 125.0)
            ys.append(Y0 + ((ok * 241 + pk * 13 + j * 53) % 4096).astype(np.float64) * 125.0)
            qs.append((ok * 10 + ln) * int(mult) + j)
        return np.concatenate(xs), np.concatenate(ys), np.concatenate(qs)

    def _tag_b9(batch: pa.Table) -> pa.Table:
        if int(mult) > 1:
            x, y, qid = _uniform_mult(batch)
        else:
            pts = derive_uniform_points(batch)
            x = np.asarray(pts["qx"].to_numpy(zero_copy_only=False), np.float64)
            y = np.asarray(pts["qy"].to_numpy(zero_copy_only=False), np.float64)
            qid = np.asarray(pts["query_id"].to_numpy(zero_copy_only=False), np.int64)
        ix, iy = _cells(x, y)
        n = len(x)
        reps = 9
        idx = np.repeat(np.arange(n), reps)
        off = np.tile(np.arange(9, dtype=np.int64), n)
        tix = ix[idx] + off % 3 - 1
        tiy = iy[idx] + off // 3 - 1
        tcell = tiy * ncell + tix
        # replication pruning: drop replicas bound for A-free cells
        pos = np.searchsorted(a_cells, tcell)
        pos[pos >= len(a_cells)] = 0
        keep = a_cells[pos] == tcell
        tcell, idx = tcell[keep], idx[keep]
        return pa.table(
            {
                "bucket": pa.array(_mix_bucket(tcell, np.zeros(len(tcell), np.int64), nbuckets)),
                "cell": pa.array(tcell, pa.int64()),
                "side": pa.array(np.ones(len(tcell), np.int64)),
                "qid": pa.array(qid[idx], pa.int64()),
                "x": pa.array(x[idx]),
                "y": pa.array(y[idx]),
            }
        )

    import pandas as pd
    import ray.data as rd

    # Pin the read block count to the DATA volume (round-4 verdict #3):
    # the sort shuffle's partition count equals its input block count,
    # which otherwise follows read parallelism = CPU count — a 16-cpu
    # run paid 64 partitions' fixed overhead where a 4-cpu run paid 24
    # on the SAME input (inversion under co-tenant load).  Per side,
    # one block per TARGET_BUCKET_ROWS-ish span, never a function of
    # the cluster size; at real scale this grows with the input.
    nblocks = max(4, int(nbuckets + 1) // 2)
    a = _lineitem(
        sf_dir, ["l_orderkey", "l_linenumber"], override_num_blocks=nblocks
    ).map_batches(_tag_a, batch_format="pyarrow")
    b = _lineitem(
        sf_dir,
        ["l_orderkey", "l_linenumber", "l_partkey"],
        override_num_blocks=nblocks,
    ).map_batches(_tag_b9, batch_format="pyarrow")

    def _pair(g: pd.DataFrame) -> pd.DataFrame:
        # numpy span-gather equi-join on cell (round-4 rewrite): the
        # earlier pandas merge allocated object-heavy frames per bucket
        # and throttled multi-core scaling exactly like the round-2
        # matcher (allocator pressure) — sort B once, searchsorted A's
        # cells, expand spans with repeat/arange, all flat int64/float64
        side = g["side"].to_numpy(np.int64)
        cell = g["cell"].to_numpy(np.int64)
        qid = g["qid"].to_numpy(np.int64)
        x = g["x"].to_numpy(np.float64)
        y = g["y"].to_numpy(np.float64)
        a_m = side == 0
        b_m = ~a_m
        if not a_m.any() or not b_m.any():
            return pd.DataFrame(
                {"a_id": pd.array([], "int64"), "b_id": pd.array([], "int64"),
                 "d2": pd.array([], "float64")}
            )
        ac, aq, ax_, ay_ = cell[a_m], qid[a_m], x[a_m], y[a_m]
        bc, bq, bx_, by_ = cell[b_m], qid[b_m], x[b_m], y[b_m]
        order = np.argsort(bc, kind="stable")
        bc_s, bq_s, bx_s, by_s = bc[order], bq[order], bx_[order], by_[order]
        lo = np.searchsorted(bc_s, ac, side="left")
        hi = np.searchsorted(bc_s, ac, side="right")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return pd.DataFrame(
                {"a_id": pd.array([], "int64"), "b_id": pd.array([], "int64"),
                 "d2": pd.array([], "float64")}
            )
        ai = np.repeat(np.arange(len(ac)), counts)
        # concatenated per-span ranges: global arange minus each span's
        # shifted start offset, plus the span's lo
        starts = np.cumsum(counts) - counts
        bi = np.arange(total, dtype=np.int64) - np.repeat(starts, counts) + np.repeat(lo, counts)
        dx = ax_[ai] - bx_s[bi]
        dy = ay_[ai] - by_s[bi]
        d2 = dx * dx + dy * dy
        keep = d2 <= r2
        return pd.DataFrame(
            {"a_id": aq[ai[keep]], "b_id": bq_s[bi[keep]], "d2": d2[keep]}
        )

    return a.union(b).groupby("bucket").map_groups(_pair, batch_format="pandas")
