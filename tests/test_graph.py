"""PageRank (stages/graph.py): exact-integer semantics, path equivalence,
dangling-node policy."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geocoding_toolbox_ray.stages.graph import (
    PR_DAMP_DEN,
    PR_DAMP_NUM,
    PR_SCALE,
    _pagerank_numpy,
    pagerank,
)


def _edges_ds(src, dst):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array(np.asarray(src, np.int64)),
                "dst": pa.array(np.asarray(dst, np.int64)),
            }
        )
    )


def _run(src, dst, **kw) -> pd.DataFrame:
    return (
        pagerank(_edges_ds(src, dst), **kw)
        .to_pandas()
        .sort_values("node_id")
        .reset_index(drop=True)
    )


def test_small_vs_distributed_paths_identical(ray_session):
    """The single-task fast path and the per-iteration aggregate path must
    produce bit-identical ranks (integer arithmetic has no merge-order
    freedom to hide behind)."""
    rng = np.random.RandomState(7)
    src = rng.randint(0, 40, 300)
    dst = rng.randint(0, 40, 300)
    keep = src != dst
    pk = np.unique(src[keep].astype(np.int64) * 64 + dst[keep])
    s, d = pk // 64, pk % 64
    a = _run(s, d)  # fast path (under the small-graph threshold)
    b = _run(s, d, small_graph_edges=0)  # forced distributed path
    assert a.equals(b)
    assert a["pr_score"].sum() <= PR_SCALE


def test_star_graph_ranks(ray_session):
    """Hub-and-spoke: the hub must outrank every leaf, leaves tie."""
    leaves = np.arange(1, 9)
    src = np.concatenate([leaves, np.zeros(8, np.int64)])
    dst = np.concatenate([np.zeros(8, np.int64), leaves])
    df = _run(src, dst)
    hub = df.loc[df["node_id"] == 0, "pr_score"].iloc[0]
    leaf = df.loc[df["node_id"] != 0, "pr_score"]
    assert (leaf < hub).all()
    assert leaf.nunique() == 1


def test_dangling_node_leaks_mass():
    """A dst-only node contributes nothing (no redistribution) — the SQL
    deg-join semantics.  2-node chain 0->1: node 1 keeps only damped
    inflow + base; total mass < PR_SCALE."""
    rank = _pagerank_numpy(
        np.array([0]), np.array([1]), 2, 3, PR_SCALE, PR_DAMP_NUM, PR_DAMP_DEN
    )
    assert rank.sum() < PR_SCALE
    assert rank[1] > rank[0]  # the sink accumulates, the source only has base


def test_uniform_cycle_is_uniform():
    """On a directed cycle every node keeps exactly the initial mass
    (rank//1 passes through whole): fixed point of the integer iteration."""
    n = 10
    si = np.arange(n)
    di = (si + 1) % n
    r1 = _pagerank_numpy(si, di, n, 1, PR_SCALE, PR_DAMP_NUM, PR_DAMP_DEN)
    r5 = _pagerank_numpy(si, di, n, 5, PR_SCALE, PR_DAMP_NUM, PR_DAMP_DEN)
    assert len(set(r1.tolist())) == 1
    assert np.array_equal(r1, r5)


def test_empty_edges(ray_session):
    out = pagerank(_edges_ds(np.zeros(0, np.int64), np.zeros(0, np.int64)))
    assert out.count() == 0
    # (to_pandas drops columns on an empty Dataset — assert on the schema)
    assert out.schema().names == ["node_id", "pr_score"]


@pytest.mark.parametrize("forced_small", [True, False])
def test_pagerank_suppliers_oracle_parity_both_paths(ray_session, forced_small):
    """sf0.001 parity against the unrolled-CTE DuckDB oracle for BOTH
    execution paths (the driver only ever sees the size-selected one)."""
    import duckdb

    import geocoding_toolbox_ray.stages.graph as G
    from geocoding_toolbox_ray import oracle, queries

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    odf = con.execute(oracle.pagerank_suppliers_sql()).df()

    orig = G.PR_SMALL_GRAPH_EDGES
    try:
        G.PR_SMALL_GRAPH_EDGES = orig if forced_small else 0
        res = (
            queries.pagerank_suppliers(sf)
            .to_pandas()
            .sort_values("node_id")
            .reset_index(drop=True)
        )
    finally:
        G.PR_SMALL_GRAPH_EDGES = orig
    assert res.equals(odf)


def test_weighted_small_vs_distributed_identical(ray_session):
    """pagerank_weighted: single-task and streaming-aggregate paths must
    be bit-identical, and weight-1 edges must reproduce plain pagerank
    only when out-degrees are 1 (per-edge floor vs per-node floor
    otherwise differ — asserted structurally, not numerically)."""
    import ray.data as rd

    from geocoding_toolbox_ray.stages.graph import pagerank_weighted

    rng = np.random.RandomState(11)
    src = rng.randint(0, 30, 200).astype(np.int64)
    dst = rng.randint(0, 30, 200).astype(np.int64)
    keep = src != dst
    pk = np.unique(src[keep] * 64 + dst[keep])
    s, d = pk // 64, pk % 64
    w = (pk % 7 + 1).astype(np.int64)

    def ds():
        return rd.from_arrow(
            pa.table({"src": pa.array(s), "dst": pa.array(d), "w": pa.array(w)})
        )

    a = pagerank_weighted(ds()).to_pandas().sort_values("node_id").reset_index(drop=True)
    b = (
        pagerank_weighted(ds(), small_graph_edges=0)
        .to_pandas()
        .sort_values("node_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    assert a["pr_score"].sum() <= PR_SCALE
    # heavier inbound weight -> higher rank: node receiving all weight
    hub_src = np.array([1, 2, 3], np.int64)
    hub_dst = np.array([0, 0, 0], np.int64)
    hub_w = np.array([5, 5, 5], np.int64)
    hub = (
        pagerank_weighted(
            rd.from_arrow(
                pa.table(
                    {
                        "src": pa.array(np.concatenate([hub_src, hub_dst])),
                        "dst": pa.array(np.concatenate([hub_dst, hub_src])),
                        "w": pa.array(np.concatenate([hub_w, hub_w])),
                    }
                )
            )
        )
        .to_pandas()
        .set_index("node_id")["pr_score"]
    )
    assert (hub.loc[0] > hub.drop(0)).all()


def test_betweenness_matches_naive(ray_session):
    """Brandes vs a naive all-pairs BFS path-counting reference on a
    random graph + closed-form pins (path and star graphs)."""
    import itertools

    import ray.data as rd

    from geocoding_toolbox_ray.stages.graph import betweenness_centrality

    def naive_btw(edge_set, nodes):
        adj = {x: set() for x in nodes}
        for a, b in edge_set:
            adj[a].add(b)
            adj[b].add(a)
        btw = {x: 0.0 for x in nodes}
        for s, t in itertools.combinations(sorted(nodes), 2):
            # BFS shortest-path DAG from s
            import collections

            dist = {s: 0}
            paths = {s: 1}
            qu = collections.deque([s])
            while qu:
                x = qu.popleft()
                for y in adj[x]:
                    if y not in dist:
                        dist[y] = dist[x] + 1
                        paths[y] = 0
                        qu.append(y)
                    if dist[y] == dist[x] + 1:
                        paths[y] += paths[x]
            if t not in dist:
                continue
            # count paths through each intermediate v:
            # paths_s(v) * paths(v -> t along the s-BFS DAG) / paths_s(t)
            for v in nodes:
                if v in (s, t) or v not in dist:
                    continue
                if dist[v] + _bfs_dist(adj, v, t) == dist[t]:
                    btw[v] += paths[v] * _count_paths(adj, dist, v, t) / paths[t]
        return btw

    def _bfs_dist(adj, a, b):
        import collections

        dist = {a: 0}
        qu = collections.deque([a])
        while qu:
            x = qu.popleft()
            if x == b:
                return dist[x]
            for y in adj[x]:
                if y not in dist:
                    dist[y] = dist[x] + 1
                    qu.append(y)
        return 10**9

    def _count_paths(adj, dist_s, v, t):
        # number of shortest v->t paths that EXTEND the s->v prefix:
        # BFS from v restricted to strictly increasing dist_s levels
        import collections

        dv = {v: 1}
        order = collections.deque([v])
        while order:
            x = order.popleft()
            for y in adj[x]:
                if dist_s.get(y) == dist_s[x] + 1:
                    if y not in dv:
                        dv[y] = 0
                        order.append(y)
                    dv[y] += dv[x]
        return dv.get(t, 0)

    rng = np.random.RandomState(3)
    nodes = list(range(12))
    all_pairs = [(a, b) for a in nodes for b in nodes if a < b]
    take = rng.choice(len(all_pairs), 20, replace=False)
    edge_set = [all_pairs[i] for i in take]
    src = np.array([a for a, _ in edge_set], np.int64)
    dst = np.array([b for _, b in edge_set], np.int64)
    got = (
        betweenness_centrality(
            rd.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
        )
        .to_pandas()
        .set_index("node_id")["btw_micro"]
    )
    exp = naive_btw(edge_set, set(src) | set(dst))
    for v, val in exp.items():
        assert abs(got.get(v, 0) - round(val * 1e6)) <= 2, (v, val, got.get(v))

    # closed-form: path 0-1-2-3-4 -> center 2 lies on 4 pairs' paths
    p_src = np.array([0, 1, 2, 3], np.int64)
    p_dst = np.array([1, 2, 3, 4], np.int64)
    path = (
        betweenness_centrality(
            rd.from_arrow(pa.table({"src": pa.array(p_src), "dst": pa.array(p_dst)}))
        )
        .to_pandas()
        .set_index("node_id")["btw_micro"]
    )
    assert path[2] == 4_000_000 and path[0] == 0 and path[1] == 3_000_000
