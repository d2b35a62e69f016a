#!/usr/bin/env python
"""Benchmark harness.

Runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, ...}

``bench.py --scaling`` runs the headline pipeline in two fresh processes
at num_cpus=4 and num_cpus=16 (N and 4N; overridable via GRAFT_SCALE_LO/HI)
on the same input and reports both throughputs plus the scaling efficiency
(the sandbox stand-in for the north rule's two-cluster-size criterion;
see BASELINE.md for why 8->32 is hardware-capped on this VM).
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
PAGES_CACHE_ROOT = os.environ.get("GRAFT_PAGES_CACHE", "/tmp/graft_pages")


#: headline corpus size multiplier (pages per orders row): large enough that
#: the 32-cpu run is compute-bound, not startup/latency-bound
PAGES_MULT = int(os.environ.get("GRAFT_BENCH_PAGES_MULT", "48"))


def _pages_count() -> int:
    import pyarrow.parquet as pq

    n_orders = pq.read_metadata(f"{SF_DIR}/orders.parquet").num_rows
    return int(n_orders) * PAGES_MULT


def _consume(result) -> int:
    """Force full execution; return row count."""
    import pandas as pd

    if isinstance(result, pd.DataFrame):
        return len(result)
    return result.count()


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        # benign worker-side schema-mix warnings (empty buckets, pandas vs
        # arrow blocks) would otherwise interleave with the one JSON line
        log_to_driver=False,
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from geocoding_toolbox_ray import queries as q
    from geocoding_toolbox_ray.config import PipelineConfig
    from geocoding_toolbox_ray.pipelines.geocode import geocode_pages, read_pages
    from geocoding_toolbox_ray.sources.pages import materialize_pages_parquet

    n_pages = _pages_count()
    pages_dir = os.path.join(PAGES_CACHE_ROOT, f"n{n_pages}")
    materialize_pages_parquet(n_pages, pages_dir)  # cached, untimed

    # warm the OS page cache so we measure compute + shuffle, not cold disk
    for t in ("orders", "lineitem", "documents", "embeddings", "events"):
        with open(f"{SF_DIR}/{t}.parquet", "rb") as fh:
            fh.read()
    for root, _, fs in os.walk(pages_dir):
        for f in fs:
            with open(os.path.join(root, f), "rb") as fh:
                fh.read()

    # external load snapshot: this sandbox VM shares CPUs with other tenants
    # (load averages of 8-14 with zero of our processes were observed);
    # recorded so throughput numbers can be read against machine conditions
    load0 = round(os.getloadavg()[0], 1)

    # untimed warmup: spin up worker processes so timings are steady-state
    import ray.data as rd

    rd.range(100_000).map_batches(lambda t: t, batch_format="pyarrow").count()

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        rows[name] = _consume(fn())
        timings[name] = round(time.perf_counter() - t0, 3)

    def timed_best(name, fn, reps):
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            rows[name] = _consume(fn())
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)

    cfg = PipelineConfig(batch_size=8192)
    if os.environ.get("GRAFT_SCALING_QUERIES") == "1":
        # per-query scaling mode (VERDICT r3 #4): the headline plus the
        # three most expensive shuffle-bearing pipelines, best-of-2 each.
        # dedup_clusters and spatial_cell_join get COMPUTE-BOUND inputs
        # (24x-replicated docs near-dup graph; 4x B-side point
        # derivation) — at the oracle-checked sf0.1 defaults both finish
        # in seconds, so a 4v16 ratio measures fixed latency, not scaling.
        from geocoding_toolbox_ray.pipelines.curate import curate_pages
        from geocoding_toolbox_ray.pipelines.spatial import spatial_cell_join
        from geocoding_toolbox_ray.stages.dedup import (
            dedup_clusters as _cc,
            minhash_dup_pairs as _mh,
        )

        # dedup_clusters scaling input: documents replicated REP x with a
        # distinct per-copy suffix — each doc's copies form a bounded
        # REP-clique of genuine near-dups (diameter 1, predictable pair
        # count), unlike the pages corpus whose near-dup graph density
        # exploded the first attempt (58 min lo leg at 1.8M pages)
        REP = 24
        import numpy as _np
        import pyarrow as _pa

        def _docs_x():
            import ray.data as rd

            def _rep(t: _pa.Table) -> _pa.Table:
                ids = _np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), _np.int64)
                texts = t["text"].to_pylist()
                out_ids = _np.repeat(ids * REP, REP) + _np.tile(
                    _np.arange(REP, dtype=_np.int64), len(ids)
                )
                out_txt = [s + f" copyvariant {j}" for s in texts for j in range(REP)]
                return _pa.table(
                    {"doc_id": _pa.array(out_ids), "text": _pa.array(out_txt, _pa.string())}
                )

            return rd.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
            ).map_batches(_rep, batch_format="pyarrow")

        import pyarrow.parquet as _pq

        n_docs_x = int(_pq.read_metadata(f"{SF_DIR}/documents.parquet").num_rows) * REP

        def _cc_docs():
            pairs = _mh(_docs_x(), n_docs=n_docs_x)
            return _cc(pairs.drop_columns(["est_jaccard_permille"]))

        scaling_queries = {
            "geocode_pages": lambda: geocode_pages(read_pages(pages_dir), cfg),
            "curate_pages": lambda: curate_pages(read_pages(pages_dir)),
            # pair GENERATION alone is compute-dominated; the full
            # clustering adds CC rounds whose 2 co-group shuffles each
            # carry a fixed ~2-4 s dispatch floor that no cpu count
            # removes at sf0.1 (rounds = diameter; at real scale the
            # per-round WORK dominates that floor)
            "minhash_pairs_x24": lambda: _mh(_docs_x(), n_docs=n_docs_x),
            "dedup_clusters_x24": _cc_docs,
            "spatial_cell_join_x4": lambda: spatial_cell_join(SF_DIR, mult=4),
        }
        only = os.environ.get("GRAFT_SCALE_ONE")
        for name, fn in scaling_queries.items():
            if only and name != only:
                continue
            timed_best(name, fn, 2)
    elif os.environ.get("GRAFT_HEADLINE_ONLY") == "1":
        # scaling mode: best-of-3 to damp noisy-neighbor variance on this VM
        timed_best("geocode_pages", lambda: geocode_pages(read_pages(pages_dir), cfg), 3)
    else:
        timed("geocode_pages", lambda: geocode_pages(read_pages(pages_dir), cfg))
    if (
        os.environ.get("GRAFT_HEADLINE_ONLY") != "1"
        and os.environ.get("GRAFT_SCALING_QUERIES") != "1"
    ):
        timed("geocode_orders", lambda: q.geocode_orders(SF_DIR))
        timed("knn_join", lambda: q.knn_join(SF_DIR))
        timed("pip_join", lambda: q.pip_join(SF_DIR))
        timed("tile_counts", lambda: q.tile_counts(SF_DIR))
        timed("dedup_exact", lambda: q.dedup_exact(SF_DIR))
        timed("minhash_dup_pairs", lambda: q.minhash_dup_pairs(SF_DIR))
        timed("ann_topk_quantized", lambda: q.ann_topk_quantized(SF_DIR))
        timed("events_window", lambda: q.events_window(SF_DIR))
        timed("q1_pricing_summary", lambda: q.q1_pricing_summary(SF_DIR))
        # round-2 additions: exact-Jaccard near-dup, CC clustering, vocab top-k
        timed("ngram_jaccard_pairs", lambda: q.ngram_jaccard_pairs(SF_DIR))
        timed("dedup_clusters", lambda: q.dedup_clusters(SF_DIR))
        timed("token_histogram", lambda: q.token_histogram(SF_DIR))
        # webtext curation headline: lang + quality + exact dedup over the
        # same pages corpus the geocode headline reads
        from geocoding_toolbox_ray.pipelines.curate import curate_pages

        timed("curate_pages", lambda: curate_pages(read_pages(pages_dir)))
        # hot-key COUNT(DISTINCT) through the salted two-phase shuffle
        # (the naive-vs-salted skew comparison runs in `bench.py --skew`
        # so the per-round bench total stays comparable across rounds)
        timed(
            "distinct_orders_per_returnflag_salted",
            lambda: q.distinct_orders_per_returnflag_salted(SF_DIR),
        )
        # round-3 addition: iterative graph analytics (exact-integer
        # PageRank; measures the distributed distinct-edge derivation +
        # the size-selected iteration path)
        timed("pagerank_suppliers", lambda: q.pagerank_suppliers(SF_DIR))
        # late round-3 additions: broadcast-matmul kNN graph, CDC upsert
        # (union + one bucketed shuffle), vectorized flat-map tile cover
        timed("knn_graph", lambda: q.knn_graph(SF_DIR))
        timed("orders_upsert", lambda: q.orders_upsert(SF_DIR))
        timed("tile_cover_lineitem", lambda: q.tile_cover_lineitem(SF_DIR))
        # late round-3 spatial wave: distance join, zonal stats, gated
        # reverse geocode, full-outer co-group
        timed("points_within_radius", lambda: q.points_within_radius(SF_DIR))
        timed("parcel_zonal_stats", lambda: q.parcel_zonal_stats(SF_DIR))
        timed("reverse_geocode_lineitem", lambda: q.reverse_geocode_lineitem(SF_DIR))
        timed("customer_status_full_join", lambda: q.customer_status_full_join(SF_DIR))
        # big-big distance join: the explicit cell-shuffle exchange with
        # replication pruning (no broadcast side anywhere)
        timed("spatial_cell_join", lambda: q.spatial_cell_join(SF_DIR))
        # second-session additions: multi-dim star join (fact streams,
        # dims broadcast) and focal 3x3 map algebra over the sparse raster
        timed("q5_nation_revenue", lambda: q.q5_nation_revenue(SF_DIR))
        timed("raster_focal_sum", lambda: q.raster_focal_sum(SF_DIR))
        # round-4 additions: 6-way join with per-year share (q8 plan) and
        # market-basket pair mining (order-bucket pair generation)
        timed("q7_volume_shipping", lambda: q.q7_volume_shipping(SF_DIR))
        timed("basket_brand_pairs", lambda: q.basket_brand_pairs(SF_DIR))
        # round-5 additions: weighted centrality (streaming per-iteration
        # aggregate) and the cell-blocked map-matching snap
        timed(
            "weighted_pagerank_suppliers",
            lambda: q.weighted_pagerank_suppliers(SF_DIR),
        )
        timed("snap_points_to_roads", lambda: q.snap_points_to_roads(SF_DIR))

    total = round(sum(timings.values()), 3)
    geocode_rows_per_s = (
        round(rows["geocode_pages"] / timings["geocode_pages"], 1)
        if timings.get("geocode_pages", 0) > 0
        else None
    )
    out = {
        "metric": "graft_bench_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "rows": rows,
        "geocode_pages_rows_per_s": geocode_rows_per_s,
        "n_pages": n_pages,
        "loadavg_before_others": load0,
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    import subprocess

    def one(ncpu: int, query: str) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_SCALING_QUERIES="1",
            GRAFT_SCALE_ONE=query,
        )
        # pin the whole process tree to ncpu physical cores: Ray's raylet /
        # object-store / serialization threads otherwise spill onto idle
        # cores beyond num_cpus, inflating the small-cluster baseline (an
        # un-pinned "4-cpu" leg measured ~25% faster than 4 cores' worth)
        cmd = [sys.executable, os.path.abspath(__file__)]
        import shutil as _shutil

        if _shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{ncpu - 1}"] + cmd
        proc = subprocess.run(cmd, env=env, capture_output=True, text=True, check=True)
        return json.loads(proc.stdout.strip().splitlines()[-1])

    # N and 4N parallelism levels (the north rule's two cluster sizes).
    # 4 vs 16 keeps both levels inside this VM's linear range: a pure-CPU
    # probe shows the sandbox's 32 vCPUs deliver only ~3.3x the cycles of 8
    # (hypervisor throttling), capping ANY 8->32 measurement at ~0.83
    # before software overheads; see BASELINE.md.
    #
    # Per-query ADJACENT legs (round-4 methodology fix): each query runs
    # its lo leg and hi leg back to back in fresh processes, so co-tenant
    # drift between the two legs of one query is minutes, not the length
    # of a whole leg batch (a batched-leg run measured curate at 0.47 and
    # 0.98 in consecutive attempts purely from load drift).
    lo, hi = int(os.environ.get("GRAFT_SCALE_LO", "4")), int(os.environ.get("GRAFT_SCALE_HI", "16"))
    names = [
        "geocode_pages",
        "curate_pages",
        "minhash_pairs_x24",
        "dedup_clusters_x24",
        "spatial_cell_join_x4",
    ]
    sec_lo: dict[str, float] = {}
    sec_hi: dict[str, float] = {}
    loads: dict[str, list] = {}
    tp_lo = tp_hi = None
    for name in names:
        r_lo = one(lo, name)
        r_hi = one(hi, name)
        sec_lo[name] = r_lo["queries"][name]
        sec_hi[name] = r_hi["queries"][name]
        loads[name] = [
            r_lo.get("loadavg_before_others"),
            r_hi.get("loadavg_before_others"),
        ]
        if name == "geocode_pages":
            tp_lo = r_lo["geocode_pages_rows_per_s"]
            tp_hi = r_hi["geocode_pages_rows_per_s"]
    eff = round((tp_hi / tp_lo) / (hi / lo), 3)
    per_query = {
        name: round((sec_lo[name] / sec_hi[name]) / (hi / lo), 3) for name in names
    }
    return {
        "metric": "scaling_efficiency",
        "value": eff,
        "unit": "ratio",
        "num_cpus_lo": lo,
        "num_cpus_hi": hi,
        "rows_per_s_lo": tp_lo,
        "rows_per_s_hi": tp_hi,
        "per_query_efficiency": per_query,
        "queries_sec_lo": sec_lo,
        "queries_sec_hi": sec_hi,
        "loadavg_per_query": loads,
        "sf": SF_DIR,
    }


def run_skew() -> dict:
    """Planted-skew COUNT(DISTINCT) comparison (VERDICT r2 #6): one key
    holds ~94% of 16M rows — the naive wide step leaves one straggler
    reducer holding 15M rows while the value-salted variant splits it
    into 32 balanced sub-groups.  Prints one JSON line with both times."""
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        log_to_driver=False,
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geocoding_toolbox_ray.stages.salt import (
        naive_distinct_count,
        salted_distinct_count,
    )

    rd.range(100_000).map_batches(lambda t: t, batch_format="pyarrow").count()
    n_skew = 16_000_000

    def _skew_rows(t: pa.Table) -> pa.Table:
        ids = t["id"].to_numpy()
        m = ids % 16
        k = np.where(m < 15, "hot", np.char.add("cold", (ids % 7).astype("U1")))
        v = (ids * 2654435761) % (n_skew // 2)
        return pa.table(
            {
                "k": pa.array(k.tolist(), pa.string()),
                "v": pa.array(v.astype(np.int64), pa.int64()),
            }
        )

    def _skew_ds():
        return rd.range(n_skew).map_batches(
            _skew_rows, batch_format="pyarrow", batch_size=65536
        )

    res = {}
    for name, fn in (
        ("naive", lambda: naive_distinct_count(_skew_ds(), "k", "v")),
        ("salted", lambda: salted_distinct_count(_skew_ds(), "k", "v", salt=32)),
    ):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn().to_pandas()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        res[name] = round(best, 1)
    out = {
        "metric": "skew_distinct_naive_vs_salted",
        "naive_sec": res["naive"],
        "salted_sec": res["salted"],
        "speedup": round(res["naive"] / res["salted"], 2),
        "n_rows": n_skew,
        "num_cpus": NUM_CPUS,
        "loadavg": round(os.getloadavg()[0], 1),
    }
    ray.shutdown()
    return out


def run_stats() -> None:
    """Print the headline pipeline's per-operator ds.stats() breakdown —
    the measure-don't-guess view used to tune batch/block geometry."""
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from geocoding_toolbox_ray.config import PipelineConfig
    from geocoding_toolbox_ray.pipelines.geocode import geocode_pages, read_pages
    from geocoding_toolbox_ray.sources.pages import materialize_pages_parquet

    n_pages = _pages_count()
    pages_dir = os.path.join(PAGES_CACHE_ROOT, f"n{n_pages}")
    materialize_pages_parquet(n_pages, pages_dir)
    out = geocode_pages(read_pages(pages_dir), PipelineConfig(batch_size=8192))
    mat = out.materialize()
    sys.stderr.write(mat.stats() + "\n")
    ray.shutdown()


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--skew" in sys.argv:
        print(json.dumps(run_skew()))
    elif "--stats" in sys.argv:
        run_stats()
    else:
        print(json.dumps(run_bench()))
