"""Unit tests for the late-round-3 operator primitives, beyond oracle
parity: the Misra-Gries superset guarantee, semi/anti join strategy
equivalence, upsert semantics, and tile-cover containment."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

SF_DIR = "/root/testdata/sf0.001"


def test_mg_trim_superset_guarantee():
    """Every token with count > n/cap MUST survive mg_trim/mg_merge."""
    from geocoding_toolbox_ray.stages.sketch import mg_merge, mg_trim

    rng = np.random.RandomState(7)
    # zipf-ish counts over 500 tokens, merged from 10 random partitions
    tokens = [f"t{i}" for i in range(500)]
    counts = (rng.zipf(1.5, 500) * 3).astype(np.int64)
    n = int(counts.sum())
    cap = 32
    parts = []
    for _ in range(10):
        d = {}
        for t, c in zip(tokens, counts):
            share = int(c // 10)
            if share:
                d[t] = share
        parts.append(mg_trim(d, cap))
    acc = {}
    for p in parts:
        acc = mg_merge(acc, p, cap)
    heavy = {t for t, c in zip(tokens, counts) if (c // 10) * 10 * cap > n * 10}
    # guarantee applies to the mass actually inserted (shares x 10)
    inserted = {t: (c // 10) * 10 for t, c in zip(tokens, counts)}
    tot = sum(inserted.values())
    must_survive = {t for t, c in inserted.items() if c * (cap + 1) > tot}
    assert must_survive <= set(acc), must_survive - set(acc)


def test_semi_anti_partition_left(ray_session):
    """semi(L, R) and anti(L, R) partition L exactly, on BOTH strategies."""
    import ray.data as rd

    from geocoding_toolbox_ray.stages.join import hash_join

    left = rd.from_items([{"k": i, "x": i * 10} for i in range(50)])
    right = rd.from_items([{"k": i} for i in range(0, 50, 3)])
    for strat in ("broadcast", "shuffle"):
        semi = hash_join(left, right, "k", [], strategy=strat, how="semi").to_pandas()
        anti = hash_join(left, right, "k", [], strategy=strat, how="anti").to_pandas()
        assert sorted(semi["k"]) == [i for i in range(50) if i % 3 == 0]
        assert sorted(anti["k"]) == [i for i in range(50) if i % 3 != 0]
        assert len(semi) + len(anti) == 50


def test_orders_upsert_semantics(ray_session):
    from geocoding_toolbox_ray.queries import UPSERT_BUMP_CENTS, UPSERT_PCT, orders_upsert

    out = orders_upsert(SF_DIR).to_pandas()
    k = out["o_orderkey"].to_numpy(np.int64)
    updated = ((k * 2654435761) % 4294967296) % 100 < UPSERT_PCT
    assert (out.loc[updated, "version"] == 2).all()
    assert (out.loc[~updated, "version"] == 1).all()
    assert out["o_orderkey"].is_unique


def test_tile_cover_contains_point_tile(ray_session):
    """Each point's own tile must be inside its buffer cover."""
    import ray.data as rd

    from geocoding_toolbox_ray.functions.tiles import tile_assign
    from geocoding_toolbox_ray.pipelines.spatial import derive_uniform_points
    from geocoding_toolbox_ray.queries import tile_cover_lineitem

    cover = tile_cover_lineitem(SF_DIR).to_pandas()
    pts = (
        rd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                        columns=["l_orderkey", "l_linenumber", "l_partkey"])
        .map_batches(derive_uniform_points, batch_format="pyarrow")
        .to_pandas()
    )
    tx, ty = tile_assign(pts["qx"].to_numpy(), pts["qy"].to_numpy())
    own = set(zip(pts["query_id"].to_numpy(np.int64), tx, ty))
    got = set(zip(cover["query_id"].to_numpy(np.int64),
                  cover["tile_x"].to_numpy(np.int64),
                  cover["tile_y"].to_numpy(np.int64)))
    assert own <= got


def test_knn_graph_symmetric_sanity(ray_session):
    """rank-1 neighbor dot must be the row's max off-diagonal dot."""
    from geocoding_toolbox_ray.queries import knn_graph

    g = knn_graph(SF_DIR).to_pandas()
    r1 = g[g["rank"] == 1].set_index("vec_id")["dot_q"]
    per_vec_max = g.groupby("vec_id")["dot_q"].max()
    assert (r1 == per_vec_max[r1.index]).all()
    # k rows per vector, ranks 1..k dense
    sizes = g.groupby("vec_id")["rank"].agg(["size", "min", "max"])
    assert (sizes["min"] == 1).all() and (sizes["size"] == sizes["max"]).all()
