"""PIP kernel property tests (vs a naive scalar reference) + spatial stage
unit tests."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from geocoding_toolbox_ray.functions.pip import PackedPolygons


def naive_pip(px, py, rings):
    """Scalar even-odd reference implementation."""
    inside = False
    for ring in rings:
        arr = np.asarray(ring, float).reshape(-1, 2)
        for (x0, y0), (x1, y1) in zip(arr[:-1], arr[1:]):
            if (y0 > py) != (y1 > py):
                xint = (x1 - x0) * (py - y0) / (y1 - y0) + x0
                if px < xint:
                    inside = not inside
    return inside


SQUARE = [[0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0, 0.0, 0.0]]
CONCAVE = [[0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 5.0, 5.0, 0.0, 10.0, 0.0, 0.0]]  # notch at top
HOLED = [
    [0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0, 0.0, 0.0],
    [4.0, 4.0, 6.0, 4.0, 6.0, 6.0, 4.0, 6.0, 4.0, 4.0],  # hole
]


@pytest.mark.parametrize(
    "poly,pt,expect",
    [
        (SQUARE, (5.0, 5.0), True),
        (SQUARE, (-1.0, 5.0), False),
        (SQUARE, (11.0, 5.0), False),
        (CONCAVE, (5.0, 8.0), False),  # inside notch
        (CONCAVE, (2.0, 2.0), True),
        (HOLED, (5.0, 5.0), False),    # inside hole
        (HOLED, (2.0, 2.0), True),
        (HOLED, (4.5, 2.0), True),
    ],
)
def test_pip_known_cases(poly, pt, expect):
    pp = PackedPolygons([poly])
    got = pp.contains_pairs(np.array([pt[0]]), np.array([pt[1]]), np.array([0]))
    assert bool(got[0]) == expect


@settings(max_examples=200, deadline=None)
@given(
    st.floats(-2, 12).filter(lambda v: abs(v - round(v)) > 1e-6),
    st.floats(-2, 12).filter(lambda v: abs(v - round(v)) > 1e-6),
    st.sampled_from([SQUARE, CONCAVE, HOLED]),
)
def test_pip_matches_naive(px, py, poly):
    pp = PackedPolygons([poly])
    got = pp.contains_pairs(np.array([px]), np.array([py]), np.array([0]))
    assert bool(got[0]) == naive_pip(px, py, poly)


@settings(max_examples=50, deadline=None)
@given(st.integers(3, 10), st.integers(0, 1000))
def test_pip_random_convex_polygons(nv, seed):
    rng = np.random.default_rng(seed)
    angles = np.sort(rng.uniform(0, 2 * np.pi, nv))
    r = rng.uniform(2, 5)
    cx, cy = rng.uniform(-3, 3, 2)
    xs = cx + r * np.cos(angles)
    ys = cy + r * np.sin(angles)
    ring = np.column_stack([xs, ys])
    ring = np.vstack([ring, ring[0]])
    poly = [ring.ravel().tolist()]
    pp = PackedPolygons([poly])
    pts = rng.uniform(-8, 8, (50, 2))
    got = pp.contains_pairs(pts[:, 0], pts[:, 1], np.zeros(50, np.int64))
    expect = [naive_pip(x, y, poly) for x, y in pts]
    assert got.tolist() == expect


def test_pip_stage_batch():
    import pyarrow as pa

    from geocoding_toolbox_ray.sources.synthetic import address_points_table, parcels_table
    from geocoding_toolbox_ray.stages.spatial import ParcelIndex, PipStage

    ap = address_points_table().to_pandas()
    stage = object.__new__(PipStage)
    stage.index = ParcelIndex.build(parcels_table())

    batch = pa.table(
        {
            "query_id": pa.array([1, 2, 3], pa.int64()),
            # inside parcel of point 1; far outside; inside parcel of point 480
            "qx": pa.array(
                [ap.x[0] + 3.0, ap.x[0] + 100.0, ap.x[479] - 2.0], pa.float64()
            ),
            "qy": pa.array([ap.y[0] - 4.0, ap.y[0], ap.y[479] + 4.0], pa.float64()),
        }
    )
    out = stage(batch).to_pandas()
    assert out["parcel_id"].tolist() == ["P1", None, "P480"]


def test_knn_stage_exact_vs_bruteforce():
    import pyarrow as pa

    from geocoding_toolbox_ray.sources.synthetic import address_points_table
    from geocoding_toolbox_ray.state.index import GeocodeIndex
    from geocoding_toolbox_ray.stages.spatial import KnnStage

    idx = GeocodeIndex.build(address_points_table())
    stage = KnnStage(idx)

    rng = np.random.default_rng(7)
    from geocoding_toolbox_ray.functions.cells import EXTENT, X0, Y0

    qx = rng.uniform(X0, X0 + EXTENT, 300)
    qy = rng.uniform(Y0, Y0 + EXTENT, 300)
    out = stage(
        pa.table(
            {
                "query_id": pa.array(np.arange(300), pa.int64()),
                "qx": pa.array(qx, pa.float64()),
                "qy": pa.array(qy, pa.float64()),
            }
        )
    ).to_pandas()

    d2 = (qx[:, None] - stage.px[None, :]) ** 2 + (qy[:, None] - stage.py[None, :]) ** 2
    brute = stage.pid[np.argmin(d2, axis=1)]
    assert out["nn_point_id"].to_numpy().tolist() == brute.tolist()


def test_polygon_areas_shoelace():
    """Shoelace kernel: rectangles, triangles, and a holed polygon
    (opposite-winding hole subtracts through the signed sum)."""
    import numpy as np

    from geocoding_toolbox_ray.functions.pip import PackedPolygons, polygon_areas

    rect = [[0.0, 0.0, 4.0, 0.0, 4.0, 3.0, 0.0, 3.0, 0.0, 0.0]]
    tri = [[0.0, 0.0, 6.0, 0.0, 0.0, 6.0, 0.0, 0.0]]
    # 10x10 exterior CCW with a 2x2 hole wound CW
    holed = [
        [0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0, 0.0, 0.0],
        [4.0, 4.0, 4.0, 6.0, 6.0, 6.0, 6.0, 4.0, 4.0, 4.0],
    ]
    areas = polygon_areas(PackedPolygons([rect, tri, holed]))
    assert areas.tolist() == [12.0, 18.0, 96.0]


def test_snap_blocked_matches_dense_on_large_layer():
    """Cell-blocked snap == brute-force dense snap on a 20k-segment layer
    (round-4 verdict #8: the dense (N x S) pass would be ~20k x batch
    rows — the blocked path must stay complete for radius R at a segment
    count where dense does not fit a production batch).  Deterministic
    pseudo-layer, integral coords, seg_ids ascending."""
    import numpy as np

    from geocoding_toolbox_ray.queries import (
        SNAP_CELL_M,
        SNAP_RADIUS_M,
        _build_snap_cells,
        snap_blocked,
    )

    S, N = 20_000, 500
    i = np.arange(S, dtype=np.int64)
    ax = (i * 2654435761) % 1_000_000
    ay = (i * 40503 + 7) % 1_000_000
    bx = ax + (i * 97) % 3000 - 1500
    by = ay + (i * 131) % 3000 - 1500
    keep = (bx != ax) | (by != ay)  # zero-length segments out (len2 > 0)
    ax, ay, bx, by = ax[keep], ay[keep], bx[keep], by[keep]
    seg = {
        "ax": ax, "ay": ay, "bx": bx, "by": by,
        "sid": np.arange(1, len(ax) + 1, dtype=np.int64),
        "len2": (bx - ax) ** 2 + (by - ay) ** 2,
    }
    j = np.arange(N, dtype=np.int64)
    qx = (j * 9176 + 123) % 1_000_000
    qy = (j * 30323 + 45) % 1_000_000
    qid = j

    index = _build_snap_cells(seg, SNAP_RADIUS_M, SNAP_CELL_M)
    got = snap_blocked(qx, qy, qid, seg, index, SNAP_RADIUS_M, SNAP_CELL_M)

    # dense reference (N x S fits only at test size)
    abx, aby = seg["bx"] - seg["ax"], seg["by"] - seg["ay"]
    dxa = qx[:, None] - seg["ax"][None, :]
    dya = qy[:, None] - seg["ay"][None, :]
    dxb = qx[:, None] - seg["bx"][None, :]
    dyb = qy[:, None] - seg["by"][None, :]
    dot = dxa * abx[None, :] + dya * aby[None, :]
    l2 = seg["len2"][None, :]
    num = np.where(
        dot <= 0,
        (dxa * dxa + dya * dya) * l2,
        np.where(dot >= l2, (dxb * dxb + dyb * dyb) * l2,
                 (dxa * dxa + dya * dya) * l2 - dot * dot),
    )
    ok = num <= SNAP_RADIUS_M * SNAP_RADIUS_M * l2
    key = np.where(ok, num.astype(np.float64) / l2, np.inf)
    best = np.argmin(key, axis=1)
    has = ok[np.arange(N), best]
    exp = {
        int(qid[k]): (
            int(seg["sid"][best[k]]),
            int(num[k, best[k]]),
            int(seg["len2"][best[k]]),
        )
        for k in range(N)
        if has[k]
    }
    got_map = {
        int(r.query_id): (int(r.seg_id), int(r.d2_num), int(r.len2))
        for r in got.itertuples()
    }
    assert len(exp) > 50  # the layer actually produces matches
    assert got_map == exp
