"""Driver-facing Ray Data query callables (the ``queries()`` registry).

Each function takes ``sf_dir`` and returns a Dataset / pandas DataFrame /
pyarrow Table whose column names AND dtypes match the corresponding
``oracle.py`` SQL exactly.  Ray is initialised by the caller; nothing here
calls ``ray.init``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .config import PipelineConfig
from .functions.cleanse import cleanse_street_arrow, cleanse_zone_arrow
from .pipelines.candidates import derive_candidates
from .pipelines.geocode import geocode_candidates


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _nrows(sf_dir: str, table: str) -> int:
    """Row count from parquet metadata only (no data scan) — used to size
    shuffle bucket counts proportionally to the input."""
    import pyarrow.parquet as pq

    return int(pq.read_metadata(f"{sf_dir}/{table}.parquet").num_rows)


# ------------------------------------------------------------- geocoding

def geocode_orders(sf_dir: str):
    """Flagship oracle-checked pipeline: orders -> derived candidates ->
    cleanse/standardize/match -> 11-column reference output."""
    orders = _read(sf_dir, "orders", columns=["o_orderkey"])
    cands = orders.map_batches(derive_candidates, batch_format="pyarrow")
    return geocode_candidates(cands, PipelineConfig())


def geocode_orders_dedup(sf_dir: str):
    """Pipeline-level N1: geocode each DISTINCT (street, zone) once, then
    hash-join results back to every input row — identical 11-column
    output to geocode_orders (same oracle), the right trade when
    duplication is extreme."""
    from .pipelines.geocode import geocode_candidates_dedup

    orders = _read(sf_dir, "orders", columns=["o_orderkey"])
    cands = orders.map_batches(derive_candidates, batch_format="pyarrow")
    return geocode_candidates_dedup(cands, PipelineConfig())


def counters_report(sf_dir: str) -> pd.DataFrame:
    """Run counters (reference geocode.py:136-163) as a 1-row table."""
    from ray.data.aggregate import Count, Sum

    out = geocode_orders(sf_dir)
    out = out.map_batches(
        lambda t: pa.table(
            {
                "matched": pa.array(
                    np.asarray(pa.compute.is_null(t["message"]).to_numpy(zero_copy_only=False), np.int64)
                ),
                "score": t["score"],
            }
        ),
        batch_format="pyarrow",
    )
    agg = out.aggregate(
        Count(alias_name="total"),
        Sum("matched", alias_name="success"),
        Sum("score", alias_name="score_sum"),
    )
    total = int(agg["total"]) if agg else 0
    success = int(agg["success"]) if agg else 0
    fail = total - success
    failure_rate = (
        int(np.floor(100.0 * fail / total + 0.5)) if total else None
    )
    avg_score = (
        int(np.floor(float(agg["score_sum"]) / success + 0.5)) if success else None
    )
    # Nullable Int64 only on the zero-row / zero-success paths so they
    # return NULL like the DuckDB oracle instead of raising (ADVICE r1);
    # the populated path keeps plain int64 to hash-match the oracle.
    def _col(v):
        return pd.array([v], dtype="int64" if v is not None else "Int64")

    return pd.DataFrame(
        {
            "total": _col(total),
            "success": _col(success),
            "fail": _col(fail),
            "failure_rate": _col(failure_rate),
            "avg_score": _col(avg_score),
        }
    )


# ----------------------------------------------------------- conformance

def cleanse_street_documents(sf_dir: str):
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"], "street_clean": cleanse_street_arrow(t["text"])}
        ),
        batch_format="pyarrow",
    )


def cleanse_zone_orders(sf_dir: str):
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])

    def _f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        synth = pc.cast(pc.add(t["o_orderkey"], 800_000), pa.string())
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "zone_clean": cleanse_zone_arrow(synth),
                "zone_clean_text": cleanse_zone_arrow(t["o_orderpriority"]),
            }
        )

    return orders.map_batches(_f, batch_format="pyarrow")


# -------------------------------------------------------------- spatial

def pip_join(sf_dir: str):
    from .pipelines.spatial import pip_join as _pip

    return _pip(sf_dir)


def knn_join(sf_dir: str):
    from .pipelines.spatial import knn_join as _knn

    return _knn(sf_dir)


def points_within_radius(sf_dir: str):
    """Spatial distance join (DWithin): all (anchored point, reference
    point) pairs within RADIUS_JOIN_M meters via cell-disk candidates +
    exact d2 predicate."""
    from .pipelines.spatial import radius_join as _f

    return _f(sf_dir)


def parcel_zonal_stats(sf_dir: str):
    """Zonal statistics: per-parcel point count + quantity sum (vector
    zonal summary; partial bincount per batch, parcel-bounded groupby)."""
    from .pipelines.spatial import parcel_zonal_stats as _f

    return _f(sf_dir)


def reverse_geocode_lineitem(sf_dir: str):
    """Reverse geocoding: nearest address point within the cutoff for each
    uniform lattice point (sentinel/NULL beyond it)."""
    from .pipelines.spatial import reverse_geocode_lineitem as _f

    return _f(sf_dir)


def cell_encode_lineitem(sf_dir: str):
    from .pipelines.spatial import cell_encode_lineitem as _f

    return _f(sf_dir)


def geohash_lineitem(sf_dir: str):
    """Base32 planar geohash per uniform lattice point (bit-interleave
    cell code, exact integer arithmetic in engine AND oracle)."""
    from .pipelines.spatial import geohash_lineitem as _f

    return _f(sf_dir)


#: deterministic integer LR weights over the hashed feature space:
#: W[d] = (d * KNUTH) % (2*LR_WEIGHT_SPAN + 1) - LR_WEIGHT_SPAN
LR_WEIGHT_SPAN = 1000


def quality_lr_score(sf_dir: str):
    """Batched model inference: score every document with a (fixed,
    integer) logistic-regression-style weight vector over the signed
    hashed bag-of-words features — the classifier-scoring stage of a
    curation pipeline.  The weight vector is broadcast ONCE via ray.put
    (zero-copy numpy on every read) and each batch reduces
    token-contributions with one bincount; exact integers end to end, so
    the DuckDB oracle replicates the dot product bit-for-bit."""
    import ray

    from .functions.text import rolling_fingerprint_batch, ws_tokens

    K = FEAT_HASH_DIMS
    span = LR_WEIGHT_SPAN
    dims = np.arange(K, dtype=np.int64)
    weights = (dims * 2654435761) % (2 * span + 1) - span
    w_ref = ray.put(weights)

    def _f(df: pd.DataFrame) -> pd.DataFrame:
        w = ray.get(w_ref)
        toks: list[str] = []
        lens: list[int] = []
        for s in df["text"]:
            ts = ws_tokens(s.lower())
            toks.extend(ts)
            lens.append(len(ts))
        doc_id = df["doc_id"].to_numpy(np.int64)
        score = np.zeros(len(df), np.int64)
        if toks:
            owner = np.repeat(np.arange(len(df)), np.asarray(lens, np.int64))
            h = rolling_fingerprint_batch(toks)
            dim = h % K
            sign = np.where((h // K) % 2 == 0, 1, -1).astype(np.int64)
            contrib = w[dim] * sign
            score = np.bincount(
                owner, weights=contrib.astype(np.float64), minlength=len(df)
            ).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": doc_id,
                "lr_score": score,
                "accepted": (score >= 0).astype(np.int64),
            }
        )

    return _docs(sf_dir).map_batches(_f, batch_format="pandas")


def spatial_cell_join(sf_dir: str):
    """Big-big distance join through the explicit cell shuffle (no
    broadcast side): see pipelines/spatial.spatial_cell_join."""
    from .pipelines.spatial import spatial_cell_join as _f

    return _f(sf_dir)


def documents_sink_roundtrip(sf_dir: str):
    """Partitioned-parquet sink verification: write documents hive-
    partitioned by lang under /tmp (the resumable-output layout), read
    the store back, and reduce to per-lang row counts + an
    order-independent content checksum — the oracle computes the same
    from the source table, so a green hash proves the sink+readback path
    loses nothing (the anti-entropy check every ingest pipeline runs)."""
    import os
    import shutil

    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    out = f"/tmp/graft_sink_roundtrip/{os.path.basename(os.path.normpath(sf_dir))}"
    shutil.rmtree(out, ignore_errors=True)
    _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"]).write_parquet(
        out, partition_cols=["lang"]
    )
    back = rd.read_parquet(out)

    def _h(t: pa.Table) -> pa.Table:
        k = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), np.int64)
        nc = np.asarray(t["n_chars"].to_numpy(zero_copy_only=False), np.int64)
        h = ((k % CHECKSUM_M) * CHECKSUM_K + nc % CHECKSUM_M) % CHECKSUM_M
        return pa.table({"lang": t["lang"], "h": pa.array(h)})

    return (
        back.map_batches(_h, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Count(alias_name="n_rows"), Sum("h", alias_name="checksum"))
    )


def key_uniqueness_audit(sf_dir: str) -> pd.DataFrame:
    """Data-quality key audit: row count vs distinct-key count per
    candidate key (lineitem's (orderkey, linenumber) is knowingly
    non-unique in this corpus — the audit's positive case).  Distinct
    counts run as per-batch dedup partials + a coarse-bucket distinct
    reduce; only three scalar rows reach the driver."""

    def _distinct_count(table: str, cols: list[str], pack) -> tuple[int, int]:
        ds = _read(sf_dir, table, columns=cols)

        def _part(t: pa.Table) -> pa.Table:
            k = pack(t)
            u = np.unique(k)
            return pa.table(
                {
                    "bucket": pa.array((u * 2654435761 % 2**32) % SESSION_BUCKETS, pa.int64()),
                    "k": pa.array(u, pa.int64()),
                    "n": pa.array(np.ones(len(u), np.int64)),
                }
            )

        def _cnt(g: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"nd": pd.array([g["k"].nunique()], "int64")}
            )

        nd = (
            ds.map_batches(_part, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(_cnt, batch_format="pandas")
            .to_pandas()["nd"]
            .sum()
        )
        return _nrows(sf_dir, table), int(nd)

    rows = []
    n, nd = _distinct_count(
        "orders", ["o_orderkey"], lambda t: np.asarray(t["o_orderkey"].to_numpy(zero_copy_only=False), np.int64)
    )
    rows.append(("orders.o_orderkey", n, nd))
    n, nd = _distinct_count(
        "lineitem",
        ["l_orderkey", "l_linenumber"],
        lambda t: np.asarray(t["l_orderkey"].to_numpy(zero_copy_only=False), np.int64) * 10
        + np.asarray(t["l_linenumber"].to_numpy(zero_copy_only=False), np.int64),
    )
    rows.append(("lineitem.(o_orderkey,l_linenumber)", n, nd))
    n, nd = _distinct_count(
        "events", ["event_id"], lambda t: np.asarray(t["event_id"].to_numpy(zero_copy_only=False), np.int64)
    )
    rows.append(("events.event_id", n, nd))
    return pd.DataFrame(
        {
            "key_name": [r[0] for r in rows],
            "n_rows": pd.array([r[1] for r in rows], "int64"),
            "n_distinct": pd.array([r[2] for r in rows], "int64"),
            "n_dup_rows": pd.array([r[1] - r[2] for r in rows], "int64"),
        }
    )


def doc_type_token_ratio(sf_dir: str):
    """Lexical-diversity curation signal: per-doc type-token ratio in
    exact integers.  Distinctness is counted over the shared rolling-
    polynomial token hash on BOTH sides (COUNT(DISTINCT hash) in SQL), so
    hash collisions — if any — collapse identically and the permille
    stays bit-equal.  One sort per batch, no shuffle."""
    from .functions.text import rolling_fingerprint_batch, ws_tokens

    def _f(df: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        lens: list[int] = []
        for s in df["text"]:
            ts = ws_tokens(s.lower())
            toks.extend(ts)
            lens.append(len(ts))
        n_tok = np.asarray(lens, np.int64)
        n_distinct = np.zeros(len(df), np.int64)
        if toks:
            owner = np.repeat(np.arange(len(df)), n_tok)
            h = rolling_fingerprint_batch(toks)
            key = owner * (np.int64(1) << 32) + h  # hash < 2^31: exact pack
            ks = np.sort(key)
            firsts = np.concatenate([[True], ks[1:] != ks[:-1]])
            n_distinct = np.bincount(
                (ks[firsts] >> 32).astype(np.int64), minlength=len(df)
            ).astype(np.int64)
        ttr = np.where(n_tok > 0, 1000 * n_distinct // np.maximum(n_tok, 1), 0)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "n_tokens": n_tok,
                "n_distinct": n_distinct,
                "ttr_permille": ttr.astype(np.int64),
            }
        )

    return _docs(sf_dir).map_batches(_f, batch_format="pandas")


#: coverage-interval length (days) hung off each order date
COVERAGE_SPAN_DAYS = 7


def customer_coverage_days(sf_dir: str):
    """Interval-union coverage: each order opens a [day, day+7) service
    window; per customer, the number of DISTINCT covered days — the
    classic merge-overlapping-intervals sweep, vectorized inside coarse
    customer buckets as a grouped running-max (cummax) pass, exact
    integer days.  The SQL oracle uses the standard windowed
    MAX(...) OVER (... ROWS UNBOUNDED PRECEDING AND 1 PRECEDING) form."""

    def _cover(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "day_num", "o_orderkey"], kind="mergesort")
        ck = g["o_custkey"].to_numpy(np.int64)
        s = g["day_num"].to_numpy(np.int64)
        e = s + COVERAGE_SPAN_DAYS
        first = np.concatenate([[True], ck[1:] != ck[:-1]])
        seg = np.cumsum(first) - 1  # per-customer group id in sort order
        # prev_max[i] = max interval end over EARLIER rows of the same
        # customer (the merge-overlaps sweep), C-level grouped cummax
        prev_max = pd.Series(e).groupby(seg).cummax().shift(1).to_numpy()
        prev_max[first] = -(10**15)  # group starts: no earlier interval
        new_start = np.maximum(s, prev_max.astype(np.int64))
        contrib = np.maximum(0, e - new_start)
        out = pd.DataFrame({"ck": ck, "c": contrib}).groupby("ck", sort=False)["c"].sum()
        return pd.DataFrame(
            {
                "o_custkey": out.index.to_numpy(np.int64),
                "covered_days": out.to_numpy(np.int64),
            }
        )

    return (
        _orders_customer_bucketed(sf_dir)
        .groupby("bucket")
        .map_groups(_cover, batch_format="pandas")
    )


def parcel_tile_cover(sf_dir: str):
    """Polygon -> raster tile cover: every ZXY tile overlapping each
    parcel's bbox (rectangle == geometry for this layer), the vectorized
    np.repeat flat-map — the vector->raster direction of the tiling pair."""
    import ray.data as rd

    from .functions.tiles import tile_assign
    from .sources.synthetic import PARCEL_HALF, address_points_table

    ap = address_points_table().select(["point_id", "x", "y"])

    def _cover(t: pa.Table) -> pa.Table:
        pid = np.asarray(t["point_id"].to_numpy(zero_copy_only=False), np.int64)
        x = np.asarray(t["x"].to_numpy(zero_copy_only=False), np.float64)
        y = np.asarray(t["y"].to_numpy(zero_copy_only=False), np.float64)
        h = PARCEL_HALF
        tx0, ty0 = tile_assign(x - h, y + h)
        tx1, ty1 = tile_assign(x + h, y - h)
        cx = tx1 - tx0 + 1
        cy = ty1 - ty0 + 1
        reps = cx * cy
        idx = np.repeat(np.arange(len(pid)), reps)
        start = np.cumsum(reps) - reps
        o = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(start, reps)
        parcel_id = np.array([f"P{int(p)}" for p in pid], object)
        return pa.table(
            {
                "parcel_id": pa.array(parcel_id[idx], pa.string()),
                "tile_x": pa.array(tx0[idx] + o // cy[idx]),
                "tile_y": pa.array(ty0[idx] + o % cy[idx]),
            }
        )

    return rd.from_arrow(ap).map_batches(_cover, batch_format="pyarrow")


def address_point_density(sf_dir: str):
    """Spatial density map: per reference point, how many anchored query
    points fall within the distance-join radius — the radius join's
    pair stream pre-aggregated per batch, reduced over a point-bounded
    groupby (485 groups max)."""
    from ray.data.aggregate import Sum

    from .pipelines.spatial import radius_join

    pairs = radius_join(sf_dir)

    def _partial(t: pa.Table) -> pa.Table:
        pid = np.asarray(t["point_id"].to_numpy(zero_copy_only=False), np.int64)
        uniq, counts = np.unique(pid, return_counts=True)
        return pa.table(
            {
                "point_id": pa.array(uniq, pa.int64()),
                "partial_n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    return (
        pairs.map_batches(_partial, batch_format="pyarrow")
        .groupby("point_id")
        .aggregate(Sum("partial_n", alias_name="n_within"))
    )


def url_canonicalize(sf_dir: str):
    """Crawl-ingest URL canonicalization: lowercase scheme/host, strip
    default port + fragment + utm_* tracking params — one RE2 rule chain
    shared verbatim with the DuckDB oracle (functions/urls.py)."""
    import ray.data as rd

    from .functions.urls import canonicalize_urls, messy_urls

    n = 2 * _nrows(sf_dir, "orders")

    def _f(batch: pa.Table) -> pa.Table:
        idx = np.asarray(batch["id"].to_numpy(zero_copy_only=False), np.int64)
        raw = pa.array(messy_urls(idx), pa.string())
        return pa.table(
            {
                "i": batch["id"],
                "url_raw": raw,
                "url_canonical": canonicalize_urls(raw),
            }
        )

    return rd.range(n).map_batches(_f, batch_format="pyarrow")


#: decayed-value window: the newest event weighs 2^(W-1), the W-th newest 1
DECAY_WINDOW = 8


def events_decayed_value(sf_dir: str):
    """Per-user exponentially-decayed recent value (recency score): the
    last DECAY_WINDOW events by (ts, event_id) weighted 2^(W-1-lag), in
    exact integer cents — the feature-store freshness aggregate.  Coarse
    user-hash buckets, one sort + grouped cumcount per bucket."""

    events = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])

    def _prep(t: pa.Table) -> pa.Table:
        uid = np.asarray(t["user_id"].to_numpy(zero_copy_only=False), np.int64)
        vint = np.floor(
            np.asarray(t["value"].to_numpy(zero_copy_only=False), np.float64) * 100.0
            + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array((uid * 2654435761 % 2**32) % SESSION_BUCKETS, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "ts_us": t["ts"].cast(pa.int64()),
                "event_id": t["event_id"],
                "vint": pa.array(vint, pa.int64()),
            }
        )

    def _decay(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["user_id", "ts_us", "event_id"], ascending=[True, False, False],
            kind="mergesort",
        )
        lag = g.groupby("user_id", sort=False).cumcount().to_numpy(np.int64)
        w = np.where(lag < DECAY_WINDOW, np.int64(1) << (DECAY_WINDOW - 1 - np.minimum(lag, DECAY_WINDOW - 1)), 0)
        contrib = g["vint"].to_numpy(np.int64) * w
        agg = pd.DataFrame({"user_id": g["user_id"].to_numpy(np.int64), "c": contrib})
        out = agg.groupby("user_id", sort=False)["c"].sum()
        return pd.DataFrame(
            {
                "user_id": out.index.to_numpy(np.int64),
                "decayed_cents": out.to_numpy(np.int64),
            }
        )

    return (
        events.map_batches(_prep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_decay, batch_format="pandas")
    )


def _orders_status_agg(sf_dir: str, status: str, n_alias: str, cents_alias: str):
    """Per-customer (count, cents sum) over orders of one status — per-batch
    np.unique partials, combined vectorized inside coarse customer-hash
    buckets (group-count rule: one dispatch per bucket, not per customer)."""

    orders = _read(
        sf_dir, "orders", columns=["o_custkey", "o_orderstatus", "o_totalprice"]
    )

    def _partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.equal(t["o_orderstatus"], status)
        ck = np.asarray(
            pc.filter(t["o_custkey"], keep).to_numpy(zero_copy_only=False), np.int64
        )
        cents = np.floor(
            np.asarray(
                pc.filter(t["o_totalprice"], keep).to_numpy(zero_copy_only=False),
                np.float64,
            )
            * 100.0
            + 0.5
        ).astype(np.int64)
        uniq, inv, counts = np.unique(ck, return_inverse=True, return_counts=True)
        sums = np.bincount(inv, weights=cents.astype(np.float64)).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array((uniq * 2654435761 % 2**32) % SESSION_BUCKETS, pa.int64()),
                "o_custkey": pa.array(uniq, pa.int64()),
                "pn": pa.array(counts.astype(np.int64), pa.int64()),
                "pc": pa.array(sums, pa.int64()),
            }
        )

    def _combine(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("o_custkey", sort=False)[["pn", "pc"]].sum()
        return pd.DataFrame(
            {
                "o_custkey": agg.index.to_numpy(np.int64),
                n_alias: agg["pn"].to_numpy(np.int64),
                cents_alias: agg["pc"].to_numpy(np.int64),
            }
        )

    return (
        orders.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_combine, batch_format="pandas")
    )


def customer_status_full_join(sf_dir: str):
    """FULL OUTER join through the generic hash-join operator: customers
    with only-finished orders, only-open orders, or both — genuine
    two-sided orphans.  Both sides pre-aggregate per customer, then the
    bucketed co-group emits every orphan exactly once (full outer cannot
    broadcast)."""
    from .stages.join import hash_join

    f = _orders_status_agg(sf_dir, "F", "n_f", "cents_f")
    o = _orders_status_agg(sf_dir, "O", "n_o", "cents_o")
    return hash_join(
        f,
        o,
        key="o_custkey",
        right_cols=["n_o", "cents_o"],
        how="full",
        strategy="shuffle",
        left_rows=_nrows(sf_dir, "customer"),
        fill={"n_f": 0, "cents_f": 0, "n_o": 0, "cents_o": 0},
    )


#: TPC-H-Q6-shaped parameters (exact-integer revenue: cents x permille)
Q6_YEAR = 1996
Q6_MAX_QTY = 24
Q6_DPERM_LO, Q6_DPERM_HI = 50, 70


def q6_forecast_revenue(sf_dir: str) -> pd.DataFrame:
    """Filter+sum with READ-level pushdown: the shipdate-year and quantity
    predicates run inside the parquet scan (row groups that miss the range
    never leave storage); the discount band is exact-integer permille
    applied per batch; revenue is summed as cents x permille int64."""
    import datetime

    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    flt = (
        (pc.field("l_shipdate") >= datetime.datetime(Q6_YEAR, 1, 1))
        & (pc.field("l_shipdate") < datetime.datetime(Q6_YEAR + 1, 1, 1))
        & (pc.field("l_quantity") < float(Q6_MAX_QTY))
    )
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount"],
        filter=flt,
    )

    def _partial(t: pa.Table) -> pa.Table:
        price = np.asarray(t["l_extendedprice"].to_numpy(zero_copy_only=False), np.float64)
        disc = np.asarray(t["l_discount"].to_numpy(zero_copy_only=False), np.float64)
        cents = np.floor(price * 100 + 0.5).astype(np.int64)
        dperm = np.floor(disc * 1000 + 0.5).astype(np.int64)
        band = (dperm >= Q6_DPERM_LO) & (dperm <= Q6_DPERM_HI)
        return pa.table(
            {
                "partial_rev": pa.array([int((cents[band] * dperm[band]).sum())], pa.int64()),
                "partial_n": pa.array([int(band.sum())], pa.int64()),
            }
        )

    agg = ds.map_batches(_partial, batch_format="pyarrow").aggregate(
        Sum("partial_rev", alias_name="revenue_scaled"),
        Sum("partial_n", alias_name="n_rows"),
    )
    return pd.DataFrame(
        {
            "revenue_scaled": pd.array([int(agg["revenue_scaled"])], "int64"),
            "n_rows": pd.array([int(agg["n_rows"])], "int64"),
        }
    )


def nation_trade_coverage(sf_dir: str) -> pd.DataFrame:
    """Set coverage per nation (INTERSECT / EXCEPT as one flagged table):
    supplier and customer counts roll up via per-batch partials into a
    25-group aggregate; the tiny nation dimension joins driver-side."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    def _counts(table: str, key: str, alias: str):
        def _partial(t: pa.Table) -> pa.Table:
            k = np.asarray(t[key].to_numpy(zero_copy_only=False), np.int64)
            uniq, counts = np.unique(k, return_counts=True)
            return pa.table(
                {
                    "nationkey": pa.array(uniq, pa.int64()),
                    "partial_n": pa.array(counts.astype(np.int64), pa.int64()),
                }
            )

        ds = _read(sf_dir, table, columns=[key]).map_batches(
            _partial, batch_format="pyarrow"
        )
        df = (
            ds.groupby("nationkey")
            .aggregate(Sum("partial_n", alias_name=alias))
            .to_pandas()
        )
        return df

    sup = _counts("supplier", "s_nationkey", "n_suppliers")
    cus = _counts("customer", "c_nationkey", "n_customers")
    nation = (
        pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
        .to_pandas()
    )
    out = nation.merge(
        sup, left_on="n_nationkey", right_on="nationkey", how="left"
    ).merge(cus, left_on="n_nationkey", right_on="nationkey", how="left")
    has_s = out["n_suppliers"].notna()
    has_c = out["n_customers"].notna()
    return pd.DataFrame(
        {
            "n_nationkey": out["n_nationkey"],
            "n_name": out["n_name"],
            "n_suppliers": out["n_suppliers"].fillna(0).astype(np.int64),
            "n_customers": out["n_customers"].fillna(0).astype(np.int64),
            "has_supplier": has_s.to_numpy().astype(np.int64),
            "has_customer": has_c.to_numpy().astype(np.int64),
        }
    )


def tile_assign_lineitem(sf_dir: str):
    from .pipelines.spatial import tile_assign_lineitem as _f

    return _f(sf_dir)


def tile_counts(sf_dir: str):
    from .pipelines.spatial import tile_counts as _f

    return _f(sf_dir)


def tile_counts_salted(sf_dir: str):
    """tile_counts through the hot-key salting path — identical output,
    same oracle (the salted shuffle is an internal detail)."""
    from .pipelines.spatial import tile_counts_salted as _f

    return _f(sf_dir)


def tile_pyramid(sf_dir: str):
    """Web-map pyramid build: per-tile counts at 4 zoom levels in one
    pass (parents = exact integer halvings of child tiles)."""
    from .pipelines.spatial import tile_pyramid as _f

    return _f(sf_dir)


def distinct_orders_per_returnflag_salted(sf_dir: str):
    """COUNT(DISTINCT l_orderkey) per l_returnflag via the two-phase
    VALUE-salted shuffle (VERDICT r2 #6): l_returnflag has only 3 values
    — the textbook hot-key distinct that per-batch count pre-aggregation
    cannot absorb.  Same oracle as the unsalted twin."""
    import ray.data as rd

    from .stages.salt import salted_distinct_count

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_orderkey"]
    )
    return salted_distinct_count(ds, "l_returnflag", "l_orderkey", salt=16)


def distinct_orders_per_returnflag(sf_dir: str):
    """The unsalted twin: wide step keyed on the 3-value hot key itself —
    parallelism-capped baseline kept for the bench comparison."""
    import ray.data as rd

    from .stages.salt import naive_distinct_count

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_orderkey"]
    )
    return naive_distinct_count(ds, "l_returnflag", "l_orderkey")


# ------------------------------------------------------- text analysis

def _docs(sf_dir: str, columns=("doc_id", "text")):
    return _read(sf_dir, "documents", columns=list(columns))


def token_count_documents(sf_dir: str):
    from .functions.text import token_count

    def _f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy(np.int64), "n_tokens": token_count(df["text"])}
        )

    return _docs(sf_dir).map_batches(_f, batch_format="pandas")


def lang_id_documents(sf_dir: str):
    from .functions.text import lang_id

    def _f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy(np.int64), "lang_pred": lang_id(df["text"])}
        )

    return _docs(sf_dir).map_batches(_f, batch_format="pandas")


def quality_documents(sf_dir: str):
    from .functions.text import quality_features

    def _f(df: pd.DataFrame) -> pd.DataFrame:
        feats = quality_features(df["text"])
        out = {"doc_id": df["doc_id"].to_numpy(np.int64)}
        out.update(feats)
        return pd.DataFrame(out)

    return _docs(sf_dir).map_batches(_f, batch_format="pandas")


def doc_fingerprint(sf_dir: str):
    from .functions.text import md5_hex

    def _f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy(np.int64), "fp": md5_hex(df["text"])}
        )

    return _docs(sf_dir).map_batches(_f, batch_format="pandas")


DOC_BUCKETS = 64


def _crc_bucket(values, nb: int = DOC_BUCKETS) -> np.ndarray:
    import zlib

    return np.fromiter(
        (zlib.crc32(v.encode("utf-8")) % nb for v in values), np.int64, count=len(values)
    )


def dedup_exact(sf_dir: str):
    """Exact dedup: content-hash groups -> representative + multiplicity.
    The hash key has corpus cardinality, so the reduce runs as coarse hash
    buckets + vectorized pandas groupby within each bucket (a Ray groupby
    keyed on fp itself costs ~0.25 ms PER GROUP — linear in corpus size)."""
    from .functions.text import md5_hex

    def _f(df: pd.DataFrame) -> pd.DataFrame:
        fp = md5_hex(df["text"])
        return pd.DataFrame(
            {
                "bucket": _crc_bucket(fp),
                "fp": fp,
                "doc_id": df["doc_id"].to_numpy(np.int64),
            }
        )

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("fp", sort=False)["doc_id"].agg(["min", "size"])
        return pd.DataFrame(
            {
                "fp": agg.index.to_numpy(object),
                "keep_doc_id": agg["min"].to_numpy(np.int64),
                "dup_count": agg["size"].to_numpy(np.int64),
            }
        )

    return (
        _docs(sf_dir)
        .map_batches(_f, batch_format="pandas")
        .groupby("bucket")
        .map_groups(_reduce, batch_format="pandas")
    )


# ------------------------------------------------------------ dedup (near)

def minhash_dup_pairs(sf_dir: str):
    from .stages.dedup import minhash_dup_pairs as _f

    return _f(_docs(sf_dir), n_docs=_nrows(sf_dir, "documents"))


def simhash_dup_pairs(sf_dir: str):
    from .stages.dedup import simhash_dup_pairs as _f

    return _f(_docs(sf_dir), n_docs=_nrows(sf_dir, "documents"))


# ---------------------------------------------------------------- ANN

def ann_topk_quantized(sf_dir: str):
    from .stages.ann import topk_quantized_dot

    return topk_quantized_dot(sf_dir)


def ann_topk_cosine(sf_dir: str):
    from .stages.ann import topk_cosine

    return topk_cosine(sf_dir)


def ann_topk_lsh(sf_dir: str):
    from .stages.ann import topk_lsh

    return topk_lsh(sf_dir)


# --------------------------------------------------------------- events

def events_window(sf_dir: str):
    """Tumbling 1-hour windowed aggregate per event_type (int-cents sums —
    order-independent, hash-safe)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    ev = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def _f(t: pa.Table) -> pa.Table:
        cents = np.floor(
            np.asarray(t["value"].to_numpy(zero_copy_only=False), np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "event_type": t["event_type"],
                "window_start": pc.floor_temporal(t["ts"], unit="hour"),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    return (
        ev.map_batches(_f, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n"), Sum("cents", alias_name="value_cents"))
    )


SESSION_BUCKETS = 64

# Integer packing stride for (order, supplier) / (supplier, supplier)
# keys in the co-supply graph ops: exact for any suppkey < SUPP_PACK and
# orderkey < 2**63 // SUPP_PACK (~9.2e12).  Every pack site asserts the
# bound — a larger key space must widen this constant, never silently
# corrupt the graph (round-3 ADVICE: sf0.1 already hits suppkey 999 under
# the old stride of 1000).
SUPP_PACK = 1_000_000


def sessionize(sf_dir: str):
    """Gap-based sessionization (30-min gap).  Users are hashed into
    SESSION_BUCKETS coarse groups (one map_groups dispatch per bucket, not
    per user — VERDICT r1 #4); per-user gap logic is recovered vectorized
    inside the bucket via boundary-masked diffs."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def _bucket(t: pa.Table) -> pa.Table:
        uid = np.asarray(t["user_id"].to_numpy(zero_copy_only=False), np.int64)
        return t.append_column(
            "bucket", pa.array((uid * 2654435761 % 2**32) % SESSION_BUCKETS, pa.int64())
        )

    gap_ns = np.timedelta64(30 * 60 * 10**9, "ns")

    def _f(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].to_numpy()
        new_user = np.empty(len(g), bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        gaps = np.empty(len(g), "timedelta64[ns]")
        gaps[0] = np.timedelta64(0, "ns")
        gaps[1:] = ts[1:] - ts[:-1]
        session_break = (~new_user) & (gaps > gap_ns)
        codes = np.cumsum(new_user) - 1
        n_events = np.bincount(codes).astype(np.int64)
        n_sessions = 1 + np.bincount(codes, weights=session_break).astype(np.int64)
        return pd.DataFrame(
            {
                "user_id": uid[new_user],
                "n_events": n_events,
                "n_sessions": n_sessions,
            }
        )

    return (
        ev.map_batches(_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_f, batch_format="pandas")
    )


# ------------------------------------------------------------ relational

def q1_pricing_summary(sf_dir: str):
    """TPC-H-Q1-shaped grouped aggregate, integer-cents sums."""
    from ray.data.aggregate import Count, Sum

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def _f(t: pa.Table) -> pa.Table:
        qty = np.asarray(t["l_quantity"].to_numpy(zero_copy_only=False), np.float64)
        price = np.asarray(t["l_extendedprice"].to_numpy(zero_copy_only=False), np.float64)
        disc = np.asarray(t["l_discount"].to_numpy(zero_copy_only=False), np.float64)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty_cents": pa.array(np.floor(qty * 100.0 + 0.5).astype(np.int64), pa.int64()),
                "price_cents": pa.array(np.floor(price * 100.0 + 0.5).astype(np.int64), pa.int64()),
                "disc_price_cents": pa.array(
                    np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        li.map_batches(_f, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Count(alias_name="n"),
            Sum("qty_cents", alias_name="sum_qty_cents"),
            Sum("price_cents", alias_name="sum_price_cents"),
            Sum("disc_price_cents", alias_name="sum_disc_price_cents"),
        )
    )


def top_customers(sf_dir: str) -> pd.DataFrame:
    """Grouped sum + top-10, then name lookup for ONLY the 10 winners via
    a predicate-pushdown parquet read — the customer dimension never
    reaches the driver whole (round-3 verdict #2: at 100x scale the
    dimension is not driver-sized, but 10 winner rows always are)."""
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def _f(t: pa.Table) -> pa.Table:
        ck = np.asarray(t["o_custkey"].to_numpy(zero_copy_only=False), np.int64)
        cents = np.floor(
            np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        # per-batch partial aggregation before the shuffle
        uniq, inv = np.unique(ck, return_inverse=True)
        return pa.table(
            {
                "bucket": pa.array((uniq * 2654435761 % 2**32) % SESSION_BUCKETS, pa.int64()),
                "c_custkey": pa.array(uniq, pa.int64()),
                "part_n": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
                "part_cents": pa.array(np.bincount(inv, weights=cents).astype(np.int64), pa.int64()),
            }
        )

    # customer-cardinality key -> bucketed pandas reduce (Ray groupby cost
    # scales with group count), then distributed sort().limit() streams
    # only 10 rows to the driver (VERDICT r1 #5)
    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("c_custkey", sort=False)[["part_n", "part_cents"]].sum()
        return pd.DataFrame(
            {
                "c_custkey": agg.index.to_numpy(np.int64),
                "n_orders": agg["part_n"].to_numpy(np.int64),
                "revenue_cents": agg["part_cents"].to_numpy(np.int64),
            }
        )

    grouped = (
        orders.map_batches(_f, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_reduce, batch_format="pandas")
        .sort(["revenue_cents", "c_custkey"], descending=[True, False])
        .limit(10)
        .to_pandas()
    )
    import pyarrow.dataset as pads
    import pyarrow.compute as pc

    keys = grouped["c_custkey"].to_numpy(np.int64)
    cust = (
        pads.dataset(f"{sf_dir}/customer.parquet")
        .to_table(
            columns=["c_custkey", "c_name"],
            filter=pc.field("c_custkey").isin(pa.array(keys, pa.int64())),
        )
        .to_pandas()
    )
    name_of = dict(zip(cust["c_custkey"].astype(np.int64), cust["c_name"]))
    grouped["c_name"] = grouped["c_custkey"].map(name_of)
    return grouped[["c_custkey", "c_name", "n_orders", "revenue_cents"]].reset_index(drop=True)


# ----------------------------------------- geocode parameter variants

def geocode_orders_centerlines(sf_dir: str):
    """Locator-tier selection ('roadCenterlines', reference geocode.py:26,128)."""
    orders = _read(sf_dir, "orders", columns=["o_orderkey"])
    cands = orders.map_batches(derive_candidates, batch_format="pyarrow")
    return geocode_candidates(cands, PipelineConfig(locators="roadCenterlines"))


def geocode_orders_wgs84(sf_dir: str):
    """Output spatial_reference 4326 (reference wkid param, geocode.py:25,115)."""
    orders = _read(sf_dir, "orders", columns=["o_orderkey"])
    cands = orders.map_batches(derive_candidates, batch_format="pyarrow")
    return geocode_candidates(cands, PipelineConfig(spatial_reference=4326))


def geocode_pobox(sf_dir: str):
    """pobox='true' admits PO Box delivery points (geocode.py:27,117,205)."""
    from .pipelines.candidates import derive_pobox_candidates

    orders = _read(sf_dir, "orders", columns=["o_orderkey"])
    cands = orders.map_batches(derive_pobox_candidates, batch_format="pyarrow")
    return geocode_candidates(cands, PipelineConfig(pobox="true"))


def geocode_orders_units(sf_dir: str):
    """Unit/suite-bearing addresses (round-3 grammar depth): the match
    key strips the trailing 'APT 3' / 'SUITE 4' designator so unit rows
    hit the same locator rows as their unitless twins, while
    standardizedAddress keeps the unit text."""
    from .pipelines.candidates import derive_units_candidates

    orders = _read(sf_dir, "orders", columns=["o_orderkey"])
    cands = orders.map_batches(derive_units_candidates, batch_format="pyarrow")
    return geocode_candidates(cands, PipelineConfig())


def geocode_orders_highways(sf_dir: str):
    """Round-4 grammar depth: highway aliases ('US 89' -> 'us highway 89',
    hyphenated 'SR-6'), fractional house numbers ('39 1/2 N MAIN') and
    secondary-unit ranges ('STE 100-110').  The locator layer gains the
    highway centerline tier (include_highways); the match key drops the
    fraction and the unit range while standardizedAddress keeps both."""
    from .pipelines.candidates import derive_highway_candidates
    from .pipelines.geocode import build_index_ref
    from .sources.synthetic import address_points_table

    index_ref = build_index_ref(
        "all", address_points=address_points_table(include_highways=True)
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey"])
    cands = orders.map_batches(derive_highway_candidates, batch_format="pyarrow")
    return geocode_candidates(cands, PipelineConfig(), index_ref=index_ref)


def geocode_orders_intersections(sf_dir: str):
    """Round-5 grammar depth: intersection addresses ("MAIN ST & 200 S" /
    "STATE and 400 S") — the reference's cleanse maps '&' -> 'and'
    (geocode.py:46) so intersection text survives cleansing, and the
    API-side standardizer handled the pair.  Our grammar canonicalizes
    the match key (smaller standardized side first) and the locator
    layer gains one intersection point per street pair per city
    (include_intersections, appended last — other tiers' point_ids
    stable)."""
    from .pipelines.candidates import derive_intersection_candidates
    from .pipelines.geocode import build_index_ref
    from .sources.synthetic import address_points_table

    index_ref = build_index_ref(
        "all", address_points=address_points_table(include_intersections=True)
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey"])
    cands = orders.map_batches(derive_intersection_candidates, batch_format="pyarrow")
    return geocode_candidates(cands, PipelineConfig(), index_ref=index_ref)


def geocode_join_orders(sf_dir: str):
    """J5 re-join: geocode output x orders on primary_key via the native
    hash-partitioned Dataset.join (both sides large -> shuffle join)."""
    out = geocode_orders(sf_dir).select_columns(["primary_key", "score", "message"])

    def _orders_side(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cents = np.floor(
            np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64) * 100.0
            + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "primary_key": pc.cast(t["o_orderkey"], pa.string()),
                "o_totalprice_cents": pa.array(cents, pa.int64()),
                "o_orderpriority": t["o_orderpriority"],
            }
        )

    right = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice", "o_orderpriority"]).map_batches(
        _orders_side, batch_format="pyarrow"
    )
    return out.join(right, "inner", num_partitions=16, on=("primary_key",))


def cell_skew_topk(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """N2 skew report: top-k cells by matched-candidate count — the pre-pass
    that feeds hot-cell salting (SURVEY.md §4.1)."""
    from ray.data.aggregate import Sum

    from .functions.cells import cell_encode

    out = geocode_orders(sf_dir)

    def _cells(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = t.filter(pc.is_null(t["message"]))
        cell = cell_encode(
            np.asarray(m["x"].to_numpy(zero_copy_only=False), np.float64),
            np.asarray(m["y"].to_numpy(zero_copy_only=False), np.float64),
        )
        uniq, counts = np.unique(cell, return_counts=True)
        return pa.table(
            {"cell": pa.array(uniq, pa.int64()), "part_n": pa.array(counts.astype(np.int64))}
        )

    grouped = (
        out.map_batches(_cells, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("part_n", alias_name="n"))
        .to_pandas()
    )
    grouped = grouped.sort_values(["n", "cell"], ascending=[False, True], kind="mergesort").head(k)
    return grouped[["cell", "n"]].reset_index(drop=True)


def sample_orders(sf_dir: str, pct: int = 5):
    """N3 deterministic sampling via multiplicative hash (oracle-checkable,
    unlike RNG-based random_sample)."""
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def _f(t: pa.Table) -> pa.Table:
        k = np.asarray(t["o_orderkey"].to_numpy(zero_copy_only=False), np.int64)
        keep = ((k * 2654435761) % 4294967296) % 100 < pct
        return t.filter(pa.array(keep))

    return orders.map_batches(_f, batch_format="pyarrow")


def tile_raster_sparse(sf_dir: str):
    """Vector -> raster: sparse per-tile 256px pixel counts over the uniform
    lineitem point derivation (oracle-checked; global-pixel arithmetic keeps
    tile and pixel consistent)."""
    from .pipelines.spatial import derive_uniform_points
    from .stages.raster import rasterize_sparse

    pts = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_partkey"]).map_batches(
        derive_uniform_points, batch_format="pyarrow"
    )
    return rasterize_sparse(pts)


#: planted near-duplicate vectors: copies of vec_id < N_PLANTED perturbed
#: deterministically (cos > 0.999), so the dup operator has real signal
#: to find (VERDICT r1: the raw fixture has no pairs >= 0.95).
N_PLANTED_EMB = 16
PLANT_OFFSET = 1_000_000


def _plant_near_dups(t: pa.Table) -> pa.Table:
    ids = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False), np.int64)
    sel = ids < N_PLANTED_EMB
    if not sel.any():
        return t
    flat = np.asarray(t["embedding"].combine_chunks().flatten(), np.float32)
    mat = flat.reshape(len(ids), -1).astype(np.float64)
    src = mat[sel]
    # deterministic perturbation: + 0.02 x rolled copy, cosine ~0.9995
    pert = (src + 0.02 * np.roll(src, 1, axis=1)).astype(np.float32)
    extra = pa.table(
        {
            "vec_id": pa.array(ids[sel] + PLANT_OFFSET, pa.int64()),
            "embedding": pa.array(list(pert), type=t["embedding"].type),
        }
    )
    return pa.concat_tables([t.select(["vec_id", "embedding"]), extra])


def embedding_dup_pairs(sf_dir: str):
    """Embedding-cosine near-dup pairs (LSH-bucketed, exact cosine within
    buckets) over the fixture augmented with planted perturbed copies
    (rows-only check; planted-pair recall pinned in tests)."""
    from .stages.dedup import embedding_dup_pairs as _f

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]).map_batches(
        _plant_near_dups, batch_format="pyarrow"
    )
    return _f(emb, threshold=0.95, n_vecs=_nrows(sf_dir, "embeddings"))


def ngram_jaccard_pairs(sf_dir: str):
    """EXACT word-3-gram Jaccard near-dup pairs (complete prefix-filtered
    candidate generation; oracle-checked against DuckDB's list-function
    replica)."""
    from .stages.dedup import ngram_jaccard_exact_pairs

    return ngram_jaccard_exact_pairs(_docs(sf_dir), theta_permille=500)


def shared_passage_pairs(sf_dir: str):
    """Passage-level duplicate detection: doc pairs sharing contiguous
    8-token windows + shared-window counts (boilerplate signal)."""
    from .stages.dedup import shared_passage_pairs as _f

    return _f(_docs(sf_dir))


def ngram_novelty(sf_dir: str):
    """Per-doc n-gram novelty permille (fraction of distinct 3-grams in
    no other document) — the boilerplate-detection curation signal."""
    from .stages.dedup import ngram_novelty as _f

    return _f(_docs(sf_dir))


def dedup_clusters(sf_dir: str):
    """Near-dup clustering: exact-Jaccard pairs -> connected components via
    bucketed min-label propagation (oracle: recursive-CTE reachability)."""
    from .stages.dedup import dedup_clusters as _cc
    from .stages.dedup import ngram_jaccard_exact_pairs

    pairs = ngram_jaccard_exact_pairs(_docs(sf_dir), theta_permille=500)
    return _cc(pairs.drop_columns(["jaccard_permille"]))


def token_histogram(sf_dir: str, k: int = 100):
    """Global token frequency top-k — the vocabulary-scale wide shuffle:
    per-batch partial counts (np.unique) before the groupby, distributed
    sort + limit for the top-k (deterministic n DESC, token ASC
    tie-break)."""

    from .functions.text import ws_tokens

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        for s in df["text"]:
            toks.extend(ws_tokens(s.lower()))
        if not toks:
            return pd.DataFrame(
                {
                    "bucket": pd.array([], "int64"),
                    "token": pd.array([], "object"),
                    "part_n": pd.array([], "int64"),
                }
            )
        uniq, counts = np.unique(np.asarray(toks, object), return_counts=True)
        return pd.DataFrame(
            {
                "bucket": _crc_bucket(uniq),
                "token": uniq,
                "part_n": counts.astype(np.int64),
            }
        )

    # vocabulary-cardinality key -> bucketed pandas reduce, not a Ray
    # groupby on the token itself (cost scales with group count)
    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("token", sort=False)["part_n"].sum()
        return pd.DataFrame(
            {"token": s.index.to_numpy(object), "n": s.to_numpy(np.int64)}
        )

    return (
        _docs(sf_dir)
        .map_batches(_partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(_reduce, batch_format="pandas")
        .sort(["n", "token"], descending=[True, False])
        .limit(k)
    )


CHUNK_SIZE = 512
CHUNK_STRIDE = 384


def document_chunks(sf_dir: str, size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE):
    """Sliding-window document chunking for training (size-token chunks,
    stride overlap): every doc emits chunk rows (doc_id, chunk_id,
    chunk_text, n_chunk_tokens); a new chunk starts only while the
    previous one did not already reach the end.  Token rule shared with
    the oracle: n_chunks = 1 + ceil((n - size)/stride) for n > size."""
    from .functions.text import ws_tokens

    def _chunks(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), np.int64)
        out_doc, out_k, out_text, out_n = [], [], [], []
        for did, txt in zip(ids, t["text"].to_pylist()):
            toks = ws_tokens(txt.lower())
            n = len(toks)
            extra = (n - size + stride - 1) // stride if n > size else 0
            for k in range(1 + extra):
                part = toks[k * stride : k * stride + size]
                out_doc.append(did)
                out_k.append(k)
                out_text.append(" ".join(part))
                out_n.append(len(part))
        return pa.table(
            {
                "doc_id": pa.array(np.asarray(out_doc, np.int64), pa.int64()),
                "chunk_id": pa.array(np.asarray(out_k, np.int64), pa.int64()),
                "chunk_text": pa.array(out_text, pa.string()),
                "n_chunk_tokens": pa.array(np.asarray(out_n, np.int64), pa.int64()),
            }
        )

    return _docs(sf_dir).map_batches(_chunks, batch_format="pyarrow")


SEQ_PACK_MAXLEN = 2048


def sequence_packing(sf_dir: str, max_len: int = SEQ_PACK_MAXLEN):
    """LLM training-sequence packing layout: concatenate documents in
    doc_id order and split into fixed ``max_len``-token sequences — each
    doc gets (seq_id, seq_offset) via a DISTRIBUTED exclusive prefix sum
    of token counts (stages/scan.py: range-bucket partials, driver holds
    only B bucket scalars, within-bucket vectorized cumsum).  Oracle:
    one SQL window cumsum."""
    import pyarrow.parquet as pq

    from .functions.text import token_count
    from .stages.scan import ordered_prefix_sum

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    def _counts(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(token_count(t["text"]), pa.int64()),
            }
        )

    counts = _docs(sf_dir).map_batches(_counts, batch_format="pyarrow")
    scanned = ordered_prefix_sum(
        counts, "doc_id", "n_tokens", max_key=n_docs + 1
    )

    def _layout(t: pa.Table) -> pa.Table:
        cum = np.asarray(t["cum_prev"].to_numpy(zero_copy_only=False), np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": t["n_tokens"],
                "seq_id": pa.array(cum // max_len, pa.int64()),
                "seq_offset": pa.array(cum % max_len, pa.int64()),
            }
        )

    return scanned.map_batches(_layout, batch_format="pyarrow")


def sequence_packing_shuffled(sf_dir: str, max_len: int = SEQ_PACK_MAXLEN):
    """Realistic training layout: documents are SHUFFLED first — a
    deterministic multiplicative-hash order (odd multiplier mod 2^32 is a
    bijection, so no ties) — then packed.  Same distributed prefix scan,
    keyed on the shuffle key; oracle orders its window cumsum by the
    identical hash expression."""
    from .functions.text import token_count
    from .stages.scan import ordered_prefix_sum

    def _counts(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), np.int64)
        shuffle_key = (ids * 2654435761) % 4294967296
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "shuffle_key": pa.array(shuffle_key, pa.int64()),
                "n_tokens": pa.array(token_count(t["text"]), pa.int64()),
            }
        )

    counts = _docs(sf_dir).map_batches(_counts, batch_format="pyarrow")
    scanned = ordered_prefix_sum(
        counts, "shuffle_key", "n_tokens", max_key=4294967296
    )

    def _layout(t: pa.Table) -> pa.Table:
        cum = np.asarray(t["cum_prev"].to_numpy(zero_copy_only=False), np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": t["n_tokens"],
                "seq_id": pa.array(cum // max_len, pa.int64()),
                "seq_offset": pa.array(cum % max_len, pa.int64()),
            }
        )

    return scanned.map_batches(_layout, batch_format="pyarrow")


def token_cms_topk(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Count-Min-Sketch point estimates for the exact top-k tokens —
    a mergeable sketch that is EXACT integer arithmetic end to end
    (counters are sums, the estimate a min of bucket sums over the
    SQL-replicable polynomial hash), so unlike HLL it hash-matches a
    DuckDB oracle.  Output (token, n, est_n); est_n >= n always (CMS
    one-sided error).

    Distributed shape: the (CMS_D x CMS_W) counter matrix is ONE
    mergeable AggregateFn over the documents stream (merge-order
    independent); the top-k token list comes from the exact
    token_histogram pipeline (k rows to the driver — final result)."""
    import pyarrow as pa  # noqa: F811
    from ray.data.aggregate import AggregateFn

    from .functions.text import rolling_fingerprint_batch, ws_tokens
    from .stages.ann import ray_agg_result
    from .stages.sketch import CMS_D, CMS_W, cms_accumulate, cms_estimate

    def _acc_block(acc: np.ndarray, block) -> np.ndarray:
        t = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        toks: list[str] = []
        for s in t["text"].to_pylist():
            toks.extend(ws_tokens(s.lower()))
        if not toks:
            return acc
        uniq, counts = np.unique(np.asarray(toks, object), return_counts=True)
        ph = rolling_fingerprint_batch(pd.Series(uniq))
        return cms_accumulate(acc.copy(), ph, counts.astype(np.int64))

    agg = AggregateFn(
        init=lambda k_: np.zeros((CMS_D, CMS_W), np.int64),
        merge=lambda a, b: a + b,
        accumulate_block=_acc_block,
        name="cms",
    )
    acc = np.asarray(ray_agg_result(_docs(sf_dir).aggregate(agg), "cms"))

    top = token_histogram(sf_dir, k).to_pandas()
    ph = rolling_fingerprint_batch(pd.Series(top["token"].to_numpy(object)))
    est = cms_estimate(acc, ph)
    return pd.DataFrame(
        {
            "token": top["token"].to_numpy(object),
            "n": top["n"].to_numpy(np.int64),
            "est_n": est,
        }
    )


#: near-dup drop sets are deterministic per sf_dir; computing the
#: pair+CC pipeline once and reusing it across the queries that apply it
#: (documents_near_deduped, curated_documents) saves a full recompute
_near_dup_drop_cache: dict[str, set[int]] = {}


def _near_dup_drop_set(sf_dir: str) -> np.ndarray:
    """SORTED int64 array of non-representative dup doc_ids (zero-copy
    broadcast + searchsorted probe; never a Python set — ray.get would
    pickle-deserialize a set per batch)."""
    if sf_dir not in _near_dup_drop_cache:
        clusters = dedup_clusters(sf_dir).to_pandas()
        _near_dup_drop_cache[sf_dir] = np.unique(
            clusters.loc[clusters["doc_id"] != clusters["cluster_id"], "doc_id"]
            .to_numpy(np.int64)
        )
    return _near_dup_drop_cache[sf_dir]


def _sorted_member(sorted_arr: np.ndarray, values: np.ndarray) -> np.ndarray:
    pos = np.searchsorted(sorted_arr, values)
    ok = pos < len(sorted_arr)
    out = np.zeros(len(values), bool)
    out[ok] = sorted_arr[pos[ok]] == values[ok]
    return out


def documents_near_deduped(sf_dir: str):
    """Apply near-dedup: drop every cluster member except the smallest
    doc_id (the exact-Jaccard CC clusters), keep all un-clustered docs —
    the global near-dedup 'apply' step.  The drop set (non-representative
    dup docs) is small by definition and broadcast once."""
    import ray

    drop_ref = ray.put(_near_dup_drop_set(sf_dir))

    def _f(t: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), np.int64)
        return pa.table({"doc_id": pa.array(ids[~_sorted_member(d, ids)], pa.int64())})

    return _docs(sf_dir, columns=("doc_id",)).map_batches(_f, batch_format="pyarrow")


def curated_documents(sf_dir: str):
    """The full training-data curation pipeline composed end to end:
    lang filter (parquet-pushdown) -> quality gates -> exact dedup
    (keep min doc_id per content hash) -> near-dedup (drop non-
    representative exact-Jaccard cluster members).  Output: surviving
    doc_ids.  Small sets (exact keepers, near-dup drops) broadcast once;
    everything else streams."""
    import ray

    from .functions.text import quality_features

    # near-dup drop + exact keeper sets as SORTED arrays (zero-copy
    # broadcast + searchsorted; never a Python set across a task boundary)
    drop_arr = _near_dup_drop_set(sf_dir)
    keepers_df = _exact_keepers(sf_dir).to_pandas()
    keep_arr = np.unique(keepers_df["doc_id"].to_numpy(np.int64))
    keep_ref = ray.put(keep_arr)
    drop_ref = ray.put(drop_arr)

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"]).filter(
        expr="lang == 'en'"
    )

    def _f(df: pd.DataFrame) -> pd.DataFrame:
        karr = ray.get(keep_ref)
        darr = ray.get(drop_ref)
        feats = quality_features(df["text"])
        ids = df["doc_id"].to_numpy(np.int64)
        ok = (
            (feats["is_short"] == 0)
            & (feats["stop_permille"] >= 10)
            & (feats["stop_permille"] <= 400)
            & _sorted_member(karr, ids)
            & ~_sorted_member(darr, ids)
        )
        return pd.DataFrame({"doc_id": ids[ok]})

    return docs.map_batches(_f, batch_format="pandas")


#: benchmark-contamination check: docs sharing >= this many word-3-grams
#: with the "benchmark" set (the first N_BENCH docs, a stand-in for an
#: eval-set shingle list) are flagged
N_BENCH_DOCS = 10
CONTAM_MIN_SHARED = 3


def contamination_flags(sf_dir: str):
    """Benchmark-contamination screen — the decontamination step of a
    training-data pipeline: the benchmark shingle set (small) is broadcast
    once, and every doc counts its distinct shared 3-grams against it in
    one vectorized pass (no shuffle).  Flagged = shared >= threshold."""
    import ray

    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    from .stages.dedup import _shingle_strings

    # benchmark = the N lowest doc_ids.  Resolve the id set with a
    # distributed single-column sort().limit(N) (only N rows reach the
    # driver), then fetch just those texts via a predicate-pushdown read
    # — the documents table is never read whole driver-side (round-3
    # verdict #2).
    ids = (
        _read(sf_dir, "documents", columns=["doc_id"])
        .sort("doc_id")
        .limit(N_BENCH_DOCS)
        .to_pandas()["doc_id"]
        .to_numpy(np.int64)
    )
    df = (
        pads.dataset(f"{sf_dir}/documents.parquet")
        .to_table(
            columns=["doc_id", "text"],
            filter=pc.field("doc_id").isin(pa.array(ids, pa.int64())),
        )
        .to_pandas()
    )
    bench: set[str] = set()
    for s in df["text"]:
        bench.update(_shingle_strings(s, 3))
    bench_arr = np.sort(np.asarray(list(bench), object))
    bench_ref = ray.put(bench_arr)

    def _f(d: pd.DataFrame) -> pd.DataFrame:
        barr = ray.get(bench_ref)
        ids = d["doc_id"].to_numpy(np.int64)
        shared = np.empty(len(ids), np.int64)
        for i, s in enumerate(d["text"]):
            shs = np.asarray(_shingle_strings(s, 3), object)
            pos = np.searchsorted(barr, shs)
            ok = pos < len(barr)
            shared[i] = int((barr[pos[ok]] == shs[ok]).sum())
        return pd.DataFrame(
            {
                "doc_id": ids,
                "n_shared": shared,
                "contaminated": (shared >= CONTAM_MIN_SHARED).astype(np.int64),
            }
        )

    return _docs(sf_dir).map_batches(_f, batch_format="pandas")


#: PII-style redaction patterns (RE2-compatible, shared with the oracle)
REDACT_PATTERNS = (
    (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    (r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
)


def redact_documents(sf_dir: str):
    """PII-style scrubbing: vectorized regex redaction (emails, phone and
    SSN shapes) over the text column; output carries the redacted length
    and an md5 of the redacted text so the oracle can hash-verify the
    exact transform without shipping full text through the compare."""
    from .functions.text import md5_hex

    def _f(d: pd.DataFrame) -> pd.DataFrame:
        s = d["text"]
        for pat, rep in REDACT_PATTERNS:
            s = s.str.replace(pat, rep, regex=True)
        return pd.DataFrame(
            {
                "doc_id": d["doc_id"].to_numpy(np.int64),
                "n_chars_redacted": s.str.len().to_numpy(np.int64),
                "redacted_md5": md5_hex(s),
            }
        )

    return _docs(sf_dir).map_batches(_f, batch_format="pandas")


def split_assignment(sf_dir: str):
    """Deterministic train/val/test split by multiplicative hash of
    doc_id (80/10/10) — reproducible across runs and engines (no RNG)."""

    def _f(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), np.int64)
        h = (ids * 2654435761 % 2**32) % 100
        split = np.where(h < 80, "train", np.where(h < 90, "val", "test"))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "split": pa.array(split.astype(object), pa.string()),
            }
        )

    return _docs(sf_dir, columns=("doc_id",)).map_batches(_f, batch_format="pyarrow")


PERCENTILES_PM = (500, 900, 990)


def doc_length_percentiles(sf_dir: str) -> pd.DataFrame:
    """EXACT distributed percentiles of document length (n_tokens): the
    value domain is small-cardinality integers, so per-batch value-count
    partials merge through one bounded groupby into a histogram and the
    driver reads only (distinct-value, count) rows.  Percentile definition
    (shared with the SQL oracle, integer-exact): smallest v whose
    cumulative count >= ceil(p * n / 1000)."""
    from ray.data.aggregate import Sum

    from .functions.text import token_count

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        v = token_count(df["text"])
        uniq, counts = np.unique(v, return_counts=True)
        return pd.DataFrame({"v": uniq, "part_n": counts.astype(np.int64)})

    hist = (
        _docs(sf_dir)
        .map_batches(_partial, batch_format="pandas")
        .groupby("v")
        .aggregate(Sum("part_n", alias_name="cnt"))
        .to_pandas()
        .sort_values("v")
    )
    n = int(hist["cnt"].sum())
    cum = hist["cnt"].cumsum().to_numpy(np.int64)
    vals = hist["v"].to_numpy(np.int64)
    out = []
    for p in PERCENTILES_PM:
        need = (p * n + 999) // 1000
        out.append(int(vals[np.searchsorted(cum, need)]))
    return pd.DataFrame(
        {
            "p_permille": pd.array(PERCENTILES_PM, "int64"),
            "n_tokens": pd.array(out, "int64"),
        }
    )


def streaming_user_state(sf_dir: str) -> pa.Table:
    """Streaming-shaped ingestion (SURVEY.md §2.9): the events table fed as
    a timestamp-ordered log of micro-batches into keyed bucket actors with
    incremental per-user state; the final merged state is the query result
    (the incremental == batch invariant makes it oracle-checkable)."""
    from .stages.streaming import run_incremental

    ev = _read(sf_dir, "events", columns=["user_id", "ts", "value"])
    return run_incremental(ev)


def streaming_watermark(sf_dir: str) -> pa.Table:
    """Event-time watermark / late-data semantics: events arrive in a
    deterministic scrambled order (16-block reversal of event_id) and
    per-user rows older than max-seen ts minus 1h are dropped as LATE —
    counted separately from the kept aggregates."""
    from .stages.streaming import run_incremental_watermark

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    return run_incremental_watermark(ev)


# ------------------------------------------------------------ multimodal

def _media_from_docs(sf_dir: str):
    """Deterministic media table DERIVED from the documents parquet (so a
    DuckDB oracle can see the same rows): payload = UTF-8 text bytes,
    media_type cycles by doc_id, width/height from doc_id arithmetic."""
    from .stages.multimodal import MEDIA_SCHEMA

    types = np.array(["image", "audio", "video"], object)

    def _f(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), np.int64)
        payloads = [s.encode("utf-8") for s in t["text"].to_pylist()]
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "media_type": pa.array(types[ids % 3], pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "width": pa.array((64 + ids % 64).astype(np.int32), pa.int32()),
                "height": pa.array((64 + ids % 48).astype(np.int32), pa.int32()),
                "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
            },
            schema=MEDIA_SCHEMA,
        )

    return _docs(sf_dir).map_batches(_f, batch_format="pyarrow")


def media_features(sf_dir: str):
    """Media feature extraction through the actor-pool stage (decoder is
    the deterministic stub — PIL absent in this container); the
    SQL-checkable surface is the metadata passthrough + feature dimension
    (oracle-checked; the float feature values themselves are covered by
    dedicated pytest)."""
    from .stages.multimodal import MediaFeatureStage

    feats = _media_from_docs(sf_dir).map_batches(
        MediaFeatureStage,
        batch_format="pyarrow",
        batch_size=256,  # wide binary rows: keep batches small
        concurrency=(1, 4),
    )

    def _project(t: pa.Table) -> pa.Table:
        dims = pa.compute.list_value_length(t["features"]).cast(pa.int64())
        return pa.table(
            {
                "media_id": t["media_id"],
                "media_type": t["media_type"],
                "n_bytes": t["n_bytes"],
                "feat_dim": dims,
            }
        )

    return feats.map_batches(_project, batch_format="pyarrow")


def media_frames(sf_dir: str):
    """Video frame sampling (every 4th 256-byte frame) through the
    actor-pool flat-map stage; per-media sampled-frame count + byte sum is
    the oracle-checked surface."""
    from .stages.multimodal import FrameSampleStage

    videos = _media_from_docs(sf_dir).filter(expr="media_type == 'video'")
    frames = videos.map_batches(
        FrameSampleStage,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 4),
    )

    def _sizes(t: pa.Table) -> pa.Table:
        lens = pa.compute.binary_length(t["frame"]).cast(pa.int64())
        mid = np.asarray(t["media_id"].to_numpy(zero_copy_only=False), np.int64)
        return pa.table(
            {
                "bucket": pa.array((mid * 2654435761 % 2**32) % SESSION_BUCKETS, pa.int64()),
                "media_id": t["media_id"],
                "frame_bytes": lens,
            }
        )

    # per-media key has corpus cardinality -> bucketed pandas reduce
    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("media_id", sort=False)["frame_bytes"].agg(["size", "sum"])
        return pd.DataFrame(
            {
                "media_id": agg.index.to_numpy(np.int64),
                "n_frames_sampled": agg["size"].to_numpy(np.int64),
                "sampled_bytes": agg["sum"].to_numpy(np.int64),
            }
        )

    return (
        frames.map_batches(_sizes, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_reduce, batch_format="pandas")
    )


def events_sliding_window(sf_dir: str):
    """Sliding windowed aggregate: 60-min windows every 30 min.  Each event
    maps to its 2 covering windows via flat-expansion in map_batches, then
    one grouped sum (windows are epoch-aligned so the DuckDB time_bucket
    oracle lands on identical boundaries)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    ev = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def _expand(t: pa.Table) -> pa.Table:
        cents = np.floor(
            np.asarray(t["value"].to_numpy(zero_copy_only=False), np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        w0 = pc.floor_temporal(t["ts"], multiple=30, unit="minute")
        w0 = w0.combine_chunks() if isinstance(w0, pa.ChunkedArray) else w0
        w1 = pc.subtract(w0, pa.scalar(np.timedelta64(30 * 60 * 1_000_000, "us")))
        et = t["event_type"].combine_chunks() if isinstance(t["event_type"], pa.ChunkedArray) else t["event_type"]
        cents_arr = pa.array(cents, pa.int64())
        return pa.table(
            {
                "event_type": pa.concat_arrays([et, et]),
                "window_start": pa.concat_arrays([w0, w1.combine_chunks() if isinstance(w1, pa.ChunkedArray) else w1]),
                "cents": pa.concat_arrays([cents_arr, cents_arr]),
            }
        )

    return (
        ev.map_batches(_expand, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n"), Sum("cents", alias_name="value_cents"))
    )


def ann_topk_ivf(sf_dir: str):
    from .stages.ann import topk_ivf

    return topk_ivf(sf_dir)


def ann_topk_ivf_kmeans(sf_dir: str):
    """IVF ANN over Lloyd-refined (k-means) centroids — distributed
    aggregate per iteration, driver holds only the k x d matrix
    (rows-only; recall measured by ann_recall)."""
    from .stages.ann import topk_ivf_kmeans

    return topk_ivf_kmeans(sf_dir)


def ann_topk_ivf_pruned(sf_dir: str):
    """IVF probe over the list-partitioned embedding store: identical
    rows to ann_topk_ivf (asserted in tests) with the read pruned to the
    probed partitions — the 100 TB ANN read path (rows-only)."""
    from .stages.ann import topk_ivf_pruned

    return topk_ivf_pruned(sf_dir)


def ann_recall(sf_dir: str) -> pd.DataFrame:
    """Recall@10 of the LSH / IVF / k-means-IVF approximate tiers vs exact
    cosine (rows-only; deterministic value pinned in tests)."""
    from .stages.ann import ann_recall as _f

    return _f(sf_dir)


def events_asof_join(sf_dir: str):
    """As-of join: each 'purchase' event picks the user's latest 'signup'
    at-or-before its timestamp.  Both sides bucket by user via one groupby;
    pd.merge_asof runs per user group (sorted, backward, exact allowed) —
    the composition Ray Data lacks natively (SURVEY.md custom-operator
    path (a)).  Oracle: DuckDB's native ASOF LEFT JOIN."""
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])

    def _bucket(t: pa.Table) -> pa.Table:
        uid = np.asarray(t["user_id"].to_numpy(zero_copy_only=False), np.int64)
        return t.append_column(
            "bucket", pa.array((uid * 2654435761 % 2**32) % SESSION_BUCKETS, pa.int64())
        )

    def _per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        """All users of one hash bucket in a single pd.merge_asof(by=user)
        call — one dispatch per bucket, not per user (VERDICT r1 #4)."""
        left = g[g["event_type"] == "purchase"].sort_values("ts", kind="mergesort")
        right = g[g["event_type"] == "signup"].sort_values("ts", kind="mergesort")
        if left.empty:
            return pd.DataFrame(
                {
                    "event_id": pd.array([], "int64"),
                    "user_id": pd.array([], "int64"),
                    "ts": pd.array([], "datetime64[us]"),
                    "signup_ts": pd.array([], "datetime64[us]"),
                }
            )
        merged = pd.merge_asof(
            left[["event_id", "user_id", "ts"]],
            right[["user_id", "ts"]].rename(columns={"ts": "signup_ts"}),
            left_on="ts",
            right_on="signup_ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        )
        return merged[["event_id", "user_id", "ts", "signup_ts"]]

    return (
        ev.map_batches(_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_per_bucket, batch_format="pandas")
    )


# ----------------------------------------------------- more operators

#: value bands for the range join (lo inclusive, hi exclusive)
VALUE_BANDS = (("low", 0.0, 50.0), ("mid", 50.0, 200.0), ("high", 200.0, 1e18))


def value_band_join(sf_dir: str):
    """Range (interval) join: each event lands in the band whose
    [lo, hi) interval contains its value — broadcast small side +
    vectorized searchsorted per batch instead of a shuffle join."""
    ev = _read(sf_dir, "events", columns=["event_id", "value"])
    los = np.array([b[1] for b in VALUE_BANDS], np.float64)
    names = np.array([b[0] for b in VALUE_BANDS], object)

    lo0 = VALUE_BANDS[0][1]
    hi_last = VALUE_BANDS[-1][2]

    def _f(t: pa.Table) -> pa.Table:
        v = np.asarray(t["value"].to_numpy(zero_copy_only=False), np.float64)
        # Inner-join semantics: drop out-of-range rows instead of clipping
        # them into the edge bands (matches the oracle's lo<=v<hi join;
        # ADVICE r1).
        keep = (v >= lo0) & (v < hi_last)
        idx = np.searchsorted(los, v[keep], side="right") - 1
        return pa.table(
            {
                "event_id": pa.compute.filter(t["event_id"], pa.array(keep)),
                "band": pa.array(names[idx], pa.string()),
            }
        )

    return ev.map_batches(_f, batch_format="pyarrow")


def top_orders_per_customer(sf_dir: str):
    """Top-2 orders per customer by value (grouped ranking window).
    Customers are hashed into coarse buckets — one map_groups dispatch per
    bucket (VERDICT r1 #4) — and the rank window is recovered vectorized
    inside each bucket (sort + cumcount); deterministic (cents DESC,
    orderkey ASC) tie-break."""
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def _cents(t: pa.Table) -> pa.Table:
        ck = np.asarray(t["o_custkey"].to_numpy(zero_copy_only=False), np.int64)
        cents = np.floor(
            np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64) * 100.0
            + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array((ck * 2654435761 % 2**32) % SESSION_BUCKETS, pa.int64()),
                "o_custkey": t["o_custkey"],
                "o_orderkey": t["o_orderkey"],
                "cents": pa.array(cents, pa.int64()),
            }
        )

    def _top2(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["o_custkey", "cents", "o_orderkey"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        rnk = g.groupby("o_custkey", sort=False).cumcount().to_numpy() + 1
        g = g.assign(rnk=rnk.astype(np.int64))
        return g.loc[g["rnk"] <= 2, ["o_custkey", "o_orderkey", "cents", "rnk"]]

    return (
        orders.map_batches(_cents, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_top2, batch_format="pandas")
    )


def approx_distinct_users(sf_dir: str) -> pd.DataFrame:
    """Approximate distinct count via a mergeable HLL sketch: one sketch
    per batch (map_batches), merged by element-wise max — the
    sketch-partial + tiny-merge pattern for 10^12-row cardinalities
    (rows-only: deterministic, but not SQL-expressible)."""
    from .stages.sketch import hll_estimate, hll_merge, hll_sketch_batch

    ev = _read(sf_dir, "events", columns=["user_id"])
    sketches = ev.map_batches(
        lambda t: hll_sketch_batch(
            np.asarray(t["user_id"].to_numpy(zero_copy_only=False), np.int64)
        ),
        batch_format="pyarrow",
    ).to_pandas()
    merged = hll_merge(sketches["registers"].to_numpy())
    est = hll_estimate(merged)
    return pd.DataFrame({"approx_distinct_users": pd.array([int(est)], "int64")})


def knn_topk_join(sf_dir: str):
    from .pipelines.spatial import knn_topk_join as _f

    return _f(sf_dir, k=3)


def bpe_token_count_documents(sf_dir: str):
    """BPE-ish pre-tokenizer counts (GPT-2-flavored regex)."""
    from .functions.text import bpe_token_count

    def _f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy(np.int64), "n_bpe_tokens": bpe_token_count(df["text"])}
        )

    return _docs(sf_dir).map_batches(_f, batch_format="pandas")


def doc_rolling_fp(sf_dir: str):
    """Rolling-hash (Rabin-Karp) document fingerprints (rows-only: SQL has
    no loop to replicate the polynomial hash)."""
    from .functions.text import rolling_fingerprint_batch

    def _f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "rolling_fp": rolling_fingerprint_batch(df["text"]),
            }
        )

    return _docs(sf_dir).map_batches(_f, batch_format="pandas")


def quality_filter_documents(sf_dir: str):
    """Apply the quality gates: drop short docs and stopword-ratio outliers
    (the curation step that consumes quality_documents' features)."""
    from .functions.text import quality_features

    def _f(df: pd.DataFrame) -> pd.DataFrame:
        feats = quality_features(df["text"])
        keep = (
            (feats["is_short"] == 0)
            & (feats["stop_permille"] >= 10)
            & (feats["stop_permille"] <= 400)
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64)[keep],
                "n_tokens": feats["n_tokens"][keep],
            }
        )

    return _docs(sf_dir).map_batches(_f, batch_format="pandas")


def _exact_keepers(sf_dir: str):
    """min doc_id per content hash — bucketed pandas reduce (see
    dedup_exact for why not a Ray groupby on the hash)."""
    from .functions.text import md5_hex

    def _f(df: pd.DataFrame) -> pd.DataFrame:
        fp = md5_hex(df["text"])
        return pd.DataFrame(
            {
                "bucket": _crc_bucket(fp),
                "fp": fp,
                "doc_id": df["doc_id"].to_numpy(np.int64),
            }
        )

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("fp", sort=False)["doc_id"].min()
        return pd.DataFrame({"doc_id": s.to_numpy(np.int64)})

    return (
        _docs(sf_dir)
        .map_batches(_f, batch_format="pandas")
        .groupby("bucket")
        .map_groups(_reduce, batch_format="pandas")
    )


def documents_deduped(sf_dir: str):
    """Apply exact dedup: keep one representative doc per content hash."""
    return _exact_keepers(sf_dir)


def top_tiles_sorted(sf_dir: str):
    """Distributed multi-key sort + limit: 20 densest tiles, deterministic
    (n DESC, tile_x ASC, tile_y ASC) tie-break."""
    from .pipelines.spatial import tile_counts as _tc

    return (
        _tc(sf_dir)
        .sort(["n", "tile_x", "tile_y"], descending=[True, False, False])
        .limit(20)
    )


def distinct_event_types(sf_dir: str):
    """Distinct operator: unique (event_type) values via groupby."""
    from ray.data.aggregate import Count

    ev = _read(sf_dir, "events", columns=["event_type"])
    return (
        ev.groupby("event_type")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["event_type"])
    )


def orders_without_lineitems(sf_dir: str):
    """Anti join (orders with no lineitem rows) via a distributed Bloom
    filter + exact recheck — no driver-side key materialization
    (VERDICT r1 #6):

    1. a packed-bitmap Bloom of ``l_orderkey`` is aggregated from per-block
       partials (OR-mergeable sketch) and broadcast once with ``ray.put``;
    2. bloom-MISS orders are definitely without lineitems (no false
       negatives) and stream straight to the output;
    3. bloom-HIT orders (true members + ~1% false positives) go through an
       exact bucketed co-group anti-join against per-batch-distinct
       lineitem keys, rescuing the false positives.

    Memory is bounded everywhere: the bitmap is ~10 bits/key, the exact
    path shuffles only the hit subset + distinct keys.  At 10^12 keys the
    same stages run per hash-partition (one bloom per key range)."""
    import ray

    from .stages.bloom import bloom_test, build_bloom

    li = _read(sf_dir, "lineitem", columns=["l_orderkey"])
    bitmap, m_bits = build_bloom(li, "l_orderkey", _nrows(sf_dir, "lineitem"))
    bloom_ref = ray.put(bitmap)

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def _test(t: pa.Table) -> pa.Table:
        bm = ray.get(bloom_ref)
        ok = np.asarray(t["o_orderkey"].to_numpy(zero_copy_only=False), np.int64)
        cents = np.floor(
            np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64) * 100.0
            + 0.5
        ).astype(np.int64)
        hit = bloom_test(bm, ok, m_bits)
        return pa.table(
            {
                "o_orderkey": pa.array(ok, pa.int64()),
                "o_totalprice_cents": pa.array(cents, pa.int64()),
                "bloom_hit": pa.array(hit, pa.bool_()),
            }
        )

    tested = orders.map_batches(_test, batch_format="pyarrow").materialize()

    misses = tested.filter(expr="bloom_hit == False").drop_columns(["bloom_hit"])

    # exact recheck of the hit subset: bucketed co-group anti-join
    NB = 64

    def _order_rows(t: pa.Table) -> pa.Table:
        ok = np.asarray(t["o_orderkey"].to_numpy(zero_copy_only=False), np.int64)
        return pa.table(
            {
                "bucket": pa.array((ok * 2654435761 % 2**32) % NB, pa.int64()),
                "key": pa.array(ok, pa.int64()),
                "cents": t["o_totalprice_cents"],
                "is_order": pa.array(np.ones(t.num_rows, bool), pa.bool_()),
            }
        )

    def _li_rows(t: pa.Table) -> pa.Table:
        lk = np.unique(np.asarray(t["l_orderkey"].to_numpy(zero_copy_only=False), np.int64))
        return pa.table(
            {
                "bucket": pa.array((lk * 2654435761 % 2**32) % NB, pa.int64()),
                "key": pa.array(lk, pa.int64()),
                "cents": pa.nulls(len(lk), pa.int64()),
                "is_order": pa.array(np.zeros(len(lk), bool), pa.bool_()),
            }
        )

    hits = tested.filter(expr="bloom_hit == True").map_batches(
        _order_rows, batch_format="pyarrow"
    )
    li_keys = li.map_batches(_li_rows, batch_format="pyarrow")

    def _anti(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["is_order"]]
        lk = g.loc[~g["is_order"], "key"].to_numpy(np.int64)
        keep = ~np.isin(o["key"].to_numpy(np.int64), lk)
        out = o.loc[keep, ["key", "cents"]]
        return pd.DataFrame(
            {
                "o_orderkey": out["key"].to_numpy(np.int64),
                "o_totalprice_cents": out["cents"].to_numpy(np.int64),
            }
        )

    rescued = (
        hits.union(li_keys).groupby("bucket").map_groups(_anti, batch_format="pandas")
    )
    return misses.union(rescued)


def stratified_sample_events(sf_dir: str, per_group: int = 3):
    """Stratified sampling: k rows per event_type, chosen by deterministic
    multiplicative-hash order (not RNG) so the DuckDB oracle can replicate
    the exact sample."""
    ev = _read(sf_dir, "events", columns=["event_id", "event_type"])

    def _rank(g: pd.DataFrame) -> pd.DataFrame:
        h = (g["event_id"].to_numpy(np.int64) * 2654435761) % 4294967296
        g = g.assign(_h=h).sort_values(["_h", "event_id"], kind="mergesort").head(per_group)
        return g[["event_type", "event_id"]]

    return ev.groupby("event_type").map_groups(_rank, batch_format="pandas")


# ------------------------------------------ round-3 additions: curation /
# joins / selection operators


def weighted_sample_orders(sf_dir: str):
    """Deterministic WEIGHTED sampling (importance sampling by order
    value — the curation analogue of quality-weighted document sampling):
    keep probability proportional to whole-dollar price / 500000 via the
    same multiplicative hash family as ``sample_orders``.  All-integer
    arithmetic on both engines, so the exact sample is oracle-checkable
    (reference N3 sampling is RNG-based and is not)."""
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )

    def _f(t: pa.Table) -> pa.Table:
        k = np.asarray(t["o_orderkey"].to_numpy(zero_copy_only=False), np.int64)
        dollars = np.floor(
            np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64)
            + 0.5
        ).astype(np.int64)
        h = ((k * 2654435761) % 4294967296) % WEIGHT_SAMPLE_SCALE
        return t.select(["o_orderkey", "o_custkey"]).filter(pa.array(h < dollars))

    return orders.map_batches(_f, batch_format="pyarrow")


WEIGHT_SAMPLE_SCALE = 500_000

RANGE_JOIN_WINDOW_US = 30 * 86_400 * 1_000_000  # 30 days in microseconds


def orders_range_join(sf_dir: str):
    """Interval (range) self-join — a join class the as-of join does not
    cover: for every order, count the OTHER orders by the same customer
    dated within [d, d + 30 days).  Implemented as a bucketed co-shuffle
    on hash(custkey) (never an all-pairs product): within each coarse
    bucket rows are lexsorted by (custkey, date) and each customer segment
    is answered by one vectorized ``searchsorted`` of the segment against
    its shifted self — O(n log n) per bucket, pair set never materialized.
    The per-segment loop runs once per customer-in-bucket with all row
    work vectorized; bucket count scales via SESSION_BUCKETS."""
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def _prep(t: pa.Table) -> pa.Table:
        ck = np.asarray(t["o_custkey"].to_numpy(zero_copy_only=False), np.int64)
        ts = np.asarray(
            t["o_orderdate"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False),
            np.int64,
        )
        return pa.table(
            {
                "bucket": pa.array((ck * 2654435761 % 2**32) % SESSION_BUCKETS, pa.int64()),
                "o_custkey": pa.array(ck, pa.int64()),
                "o_orderkey": t["o_orderkey"],
                "ts": pa.array(ts, pa.int64()),
            }
        )

    def _count(g: pd.DataFrame) -> pd.DataFrame:
        ck = g["o_custkey"].to_numpy(np.int64)
        ts = g["ts"].to_numpy(np.int64)
        ok = g["o_orderkey"].to_numpy(np.int64)
        order = np.lexsort((ts, ck))
        ck, ts, ok = ck[order], ts[order], ok[order]
        seg_starts = np.flatnonzero(np.r_[True, ck[1:] != ck[:-1]])
        seg_ends = np.r_[seg_starts[1:], len(ck)]
        n_rep = np.empty(len(ck), np.int64)
        for s, e in zip(seg_starts, seg_ends):
            sub = ts[s:e]
            hi = np.searchsorted(sub, sub + RANGE_JOIN_WINDOW_US, side="left")
            lo = np.searchsorted(sub, sub, side="left")
            n_rep[s:e] = hi - lo - 1  # [d, d+30d) includes self at lo
        return pd.DataFrame({"o_orderkey": ok, "n_repeat": n_rep})

    return (
        orders.map_batches(_prep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_count, batch_format="pandas")
    )


DOMAIN_CAP = 3


def pages_domain_cap(sf_dir: str, cap: int = DOMAIN_CAP):
    """Per-domain document cap over the pages corpus (classic web-corpus
    curation: bound any single host's contribution so boilerplate-heavy
    sites cannot dominate the training mix): keep the first ``cap`` pages
    per host in url order.  Per-batch partial capping bounds the shuffle
    to <= cap rows per (batch, host); hosts are hashed into coarse buckets
    (one map_groups dispatch per bucket) and the per-host rank is
    recovered vectorized inside each bucket."""
    from .functions.text import rolling_fingerprint_batch
    from .sources.pages import generate_pages_dataset
    from .stages.extract import filter_lang

    pages = generate_pages_dataset(_nrows(sf_dir, "orders") * 2)

    def _partial(t: pa.Table) -> pd.DataFrame:
        t = filter_lang(t)
        host = pa.compute.list_element(
            pa.compute.split_pattern(t["url"].combine_chunks(), "/"), 2
        )
        df = pd.DataFrame(
            {"host": host.to_pylist(), "url": t["url"].to_pylist()}
        ).sort_values(["host", "url"], kind="mergesort")
        df = df.loc[df.groupby("host", sort=False).cumcount() < cap]
        df = df.assign(
            bucket=rolling_fingerprint_batch(df["host"].tolist()) % SESSION_BUCKETS
        )
        return df

    def _rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["host", "url"], kind="mergesort")
        rnk = g.groupby("host", sort=False).cumcount().to_numpy() + 1
        g = g.assign(rnk=rnk.astype(np.int64))
        return g.loc[g["rnk"] <= cap, ["host", "url", "rnk"]]

    return (
        pages.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_rank, batch_format="pandas")
    )


COARSE_CENTS_SHIFT = 16  # pass-1 bin width: 2^16 cents (~$655)


def orders_price_percentiles(sf_dir: str) -> pd.DataFrame:
    """EXACT per-group percentiles over a LARGE value domain (price cents:
    ~50M possible values, where ``doc_length_percentiles``'s one-shot
    value-count histogram would be unbounded): two-pass distributed
    selection.  Pass 1 builds a coarse histogram (cents >> 16 per
    priority — bounded by value-domain/2^16 x n_groups, independent of
    row count) via per-batch partials + a coarse-bucket reduce; the
    driver locates the target coarse bin and residual rank for each
    (priority, percentile).  Pass 2 re-streams the input, keeps only rows
    in the <= |groups| x |percentiles| target bins (sorted-array
    membership probe), and exact-counts values there through the same
    bucketed reduce.  Driver memory stays bounded by the value domain
    shift, never by row count."""
    orders = _read(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])

    def _cents_of(df: pd.DataFrame) -> np.ndarray:
        return np.floor(
            df["o_totalprice"].to_numpy(np.float64) * 100.0 + 0.5
        ).astype(np.int64)

    def _partial_coarse(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            pd.DataFrame(
                {
                    "prio": df["o_orderpriority"].to_numpy(),
                    "coarse": _cents_of(df) >> COARSE_CENTS_SHIFT,
                }
            )
            .groupby(["prio", "coarse"], sort=False)
            .size()
            .reset_index(name="part_n")
        )
        out["part_n"] = out["part_n"].astype(np.int64)
        out["bucket"] = (
            out["coarse"].to_numpy(np.int64) * 2654435761 % 2**32
        ) % SESSION_BUCKETS
        return out

    def _merge_counts(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby(["prio", "coarse"], sort=False)["part_n"]
            .sum()
            .reset_index(name="n")
        )

    hist = (
        orders.map_batches(_partial_coarse, batch_format="pandas")
        .groupby("bucket")
        .map_groups(_merge_counts, batch_format="pandas")
        .to_pandas()
    )

    # driver side: locate (priority, percentile) -> (coarse bin, residual
    # rank below that bin); the table is bounded by domain/2^16 x groups.
    prios = sorted(hist["prio"].unique())
    pid = {p: i for i, p in enumerate(prios)}
    targets: list[tuple[str, int, int, int]] = []  # (prio, p, bin, need)
    for p_name in prios:
        h = hist.loc[hist["prio"] == p_name].sort_values("coarse")
        cum = h["n"].cumsum().to_numpy(np.int64)
        bins = h["coarse"].to_numpy(np.int64)
        n = int(cum[-1])
        for p in PERCENTILES_PM:
            need = (p * n + 999) // 1000
            i = int(np.searchsorted(cum, need))
            below = int(cum[i - 1]) if i > 0 else 0
            targets.append((p_name, p, int(bins[i]), need - below))

    tkeys = np.unique(
        np.array([pid[t[0]] * 4096 + t[2] for t in targets], np.int64)
    )

    # pass 2 ships only int64 keys through the shuffle (pid, not the
    # priority string); empty partials stay all-int64 so Ray block schema
    # inference never sees a zero-row object column.
    _empty_partial = pd.DataFrame(
        {
            "pid": pd.array([], dtype="int64"),
            "coarse": pd.array([], dtype="int64"),
            "part_n": pd.array([], dtype="int64"),
            "bucket": pd.array([], dtype="int64"),
        }
    )

    def _partial_exact(df: pd.DataFrame) -> pd.DataFrame:
        cents = _cents_of(df)
        pids = df["o_orderpriority"].map(pid).to_numpy(np.int64)
        key = pids * 4096 + (cents >> COARSE_CENTS_SHIFT)
        idx = np.searchsorted(tkeys, key)
        idx[idx == len(tkeys)] = 0
        sel = tkeys[idx] == key
        if not sel.any():
            return _empty_partial
        out = (
            pd.DataFrame({"pid": pids[sel], "coarse": cents[sel]})
            .groupby(["pid", "coarse"], sort=False)
            .size()
            .reset_index(name="part_n")
        )
        out["part_n"] = out["part_n"].astype(np.int64)
        out["bucket"] = (
            out["coarse"].to_numpy(np.int64) * 2654435761 % 2**32
        ) % SESSION_BUCKETS
        return out

    def _merge_exact(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby(["pid", "coarse"], sort=False)["part_n"]
            .sum()
            .reset_index(name="n")
        )

    exact = (
        orders.map_batches(_partial_exact, batch_format="pandas")
        .groupby("bucket")
        .map_groups(_merge_exact, batch_format="pandas")
        .to_pandas()
    )

    rows = []
    for p_name, p, tbin, rank_in in targets:
        e = exact.loc[
            (exact["pid"] == pid[p_name])
            & ((exact["coarse"].to_numpy(np.int64) >> COARSE_CENTS_SHIFT) == tbin)
        ].sort_values("coarse")
        cum = e["n"].cumsum().to_numpy(np.int64)
        vals = e["coarse"].to_numpy(np.int64)
        rows.append((p_name, p, int(vals[np.searchsorted(cum, rank_in)])))
    rows.sort()
    return pd.DataFrame(
        {
            "o_orderpriority": [r[0] for r in rows],
            "p_permille": pd.array([r[1] for r in rows], "int64"),
            "price_cents": pd.array([r[2] for r in rows], "int64"),
        }
    )


def bpe_pair_counts(sf_dir: str, k: int = 50):
    """One BPE/WordPiece vocabulary-induction round at corpus scale: count
    adjacent lowercase token pairs across every document and return the
    top-k merge candidates (deterministic n DESC, pair ASC tie-break).
    Per-batch partial pair counts — adjacency computed vectorized over the
    flattened token stream with doc-boundary masking, counted with one
    np.unique — then the same coarse crc-bucket pandas reduce as
    token_histogram (pair cardinality ~ vocab^2: NEVER a Ray groupby key)
    and a distributed sort + limit."""
    from .functions.text import ws_tokens

    _empty = pd.DataFrame(
        {
            "bucket": pd.array([], "int64"),
            "pair": pd.array([], "object"),
            "part_n": pd.array([], "int64"),
        }
    )

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        lens: list[int] = []
        for s in df["text"]:
            ts = ws_tokens(s.lower())
            toks.extend(ts)
            lens.append(len(ts))
        if len(toks) < 2:
            return _empty
        arr = np.asarray(toks, object)
        ends = np.cumsum(np.asarray(lens, np.int64))
        valid = np.ones(len(arr) - 1, bool)
        last_pos = ends[:-1] - 1  # a pair starting at a doc's last token
        valid[last_pos[last_pos >= 0]] = False  # would cross documents
        pairs = arr[:-1][valid] + " " + arr[1:][valid]
        if len(pairs) == 0:
            return _empty
        uniq, counts = np.unique(pairs, return_counts=True)
        return pd.DataFrame(
            {
                "bucket": _crc_bucket(uniq),
                "pair": uniq,
                "part_n": counts.astype(np.int64),
            }
        )

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("pair", sort=False)["part_n"].sum()
        return pd.DataFrame(
            {"pair": s.index.to_numpy(object), "n": s.to_numpy(np.int64)}
        )

    return (
        _docs(sf_dir)
        .map_batches(_partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(_reduce, batch_format="pandas")
        .sort(["n", "pair"], descending=[True, False])
        .limit(k)
    )


HOST_MIN_AVG_TOKENS = 30


def pages_host_reputation(sf_dir: str, min_avg_tokens: int = HOST_MIN_AVG_TOKENS):
    """Host-level reputation gating (web-curation staple: judge the SITE,
    then keep or drop its pages): aggregate mean tokens/page per host,
    admit hosts whose average clears the bar, keep only their pages.
    Stage 1 is a bounded per-host (sum, count) aggregate — per-batch
    partials through the coarse crc-bucket reduce — whose qualifying-host
    result is broadcast as a SORTED numpy unicode array (searchsorted
    probe; at web scale build it remotely via the
    stages/dedup._remote_sorted_column pattern instead of collecting).
    Stage 2 re-streams the corpus and filters by host membership.  The
    threshold compare is integer cross-multiplied (sum >= T * count) so
    no float average exists on either engine."""
    from .functions.text import token_count
    from .sources.pages import generate_pages_dataset
    from .stages.extract import filter_lang

    n_pages = _nrows(sf_dir, "orders") * 2

    def _host_tokens(t: pa.Table) -> pd.DataFrame:
        t = filter_lang(t)
        host = pa.compute.list_element(
            pa.compute.split_pattern(t["url"].combine_chunks(), "/"), 2
        ).to_pylist()
        ntok = token_count(pd.Series(t["text"].to_pylist()))
        return pd.DataFrame({"host": host, "n_tokens": np.asarray(ntok, np.int64)})

    def _partial(t: pa.Table) -> pd.DataFrame:
        df = _host_tokens(t)
        g = df.groupby("host", sort=False)["n_tokens"].agg(["sum", "size"])
        out = pd.DataFrame(
            {
                "host": g.index.to_numpy(object),
                "part_s": g["sum"].to_numpy(np.int64),
                "part_c": g["size"].to_numpy(np.int64),
            }
        )
        out["bucket"] = _crc_bucket(out["host"].tolist())
        return out

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("host", sort=False)[["part_s", "part_c"]].sum()
        keep = m["part_s"].to_numpy(np.int64) >= min_avg_tokens * m[
            "part_c"
        ].to_numpy(np.int64)
        return pd.DataFrame({"host": m.index.to_numpy(object)[keep]})

    good = (
        generate_pages_dataset(n_pages)
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_reduce, batch_format="pandas")
        .to_pandas()
    )
    good_hosts = np.sort(good["host"].to_numpy(str))

    def _filter(t: pa.Table) -> pd.DataFrame:
        t = filter_lang(t)
        host = np.asarray(
            pa.compute.list_element(
                pa.compute.split_pattern(t["url"].combine_chunks(), "/"), 2
            ).to_pylist(),
            str,
        )
        if len(good_hosts) == 0:
            sel = np.zeros(len(host), bool)
        else:
            idx = np.searchsorted(good_hosts, host)
            idx[idx == len(good_hosts)] = 0
            sel = good_hosts[idx] == host
        urls = np.asarray(t["url"].to_pylist(), object)
        return pd.DataFrame({"url": urls[sel], "host": host[sel].astype(object)})

    return generate_pages_dataset(n_pages).map_batches(
        _filter, batch_format="pyarrow"
    )


# ------------------------------------------------------------- graph

def pagerank_suppliers(sf_dir: str):
    """Exact-integer PageRank over the real relational graph: supplier <->
    customer edges via lineitem x orders (both directions, so every node
    has out-degree >= 1).  Edge derivation: the orders key->custkey map is
    a sorted-array broadcast built REMOTELY from block refs (never a
    Python dict through ray.put); lineitem streams once through a
    searchsorted lookup, packs each directed edge into one int64, and the
    DISTINCT edge set comes out of the coarse-bucket + np.unique reduce
    (edge cardinality ~ suppliers x customers: never a Ray groupby key).
    Iteration semantics and the DuckDB unrolled-CTE oracle share every
    constant (stages/graph.py)."""
    import ray

    from .stages.dedup import TARGET_BUCKET_ROWS, _sorted_kv_task
    from .stages.graph import PR_CUST_OFFSET, pagerank

    from .stages.graph import PR_SMALL_GRAPH_EDGES

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    kv_ref = _sorted_kv_task.remote(
        [br for bd in orders.iter_internal_ref_bundles() for br in bd.block_refs],
        "o_orderkey",
        "o_custkey",
    )
    n_li = _nrows(sf_dir, "lineitem")
    nb = max(8, n_li * 2 // TARGET_BUCKET_ROWS + 1)
    mask = (1 << 31) - 1
    # Scale-adaptive distinct (round-4 verdict #9): when even the
    # PRE-dedup directed edge count (2 x lineitem rows) fits the
    # single-task solver, the bucketed distinct shuffle is pure fixed
    # cost (it deduped 1.20M -> 1.17M at sf0.1 while costing more than
    # the solve) — emit per-batch-distinct edges and let the solver
    # np.unique globally.  Above the threshold the distributed distinct
    # is load-bearing and stays.
    small = 2 * n_li <= PR_SMALL_GRAPH_EDGES

    def _edges(t: pa.Table) -> pa.Table:
        okeys, custs = ray.get(kv_ref)  # zero-copy object-store views
        lo = np.asarray(t["l_orderkey"].to_numpy(zero_copy_only=False), np.int64)
        sup = np.asarray(t["l_suppkey"].to_numpy(zero_copy_only=False), np.int64)
        cust = custs[np.searchsorted(okeys, lo)] + PR_CUST_OFFSET
        pack = np.unique(np.concatenate([(sup << 31) | cust, (cust << 31) | sup]))
        if small:
            return pa.table(
                {"src": pa.array(pack >> 31), "dst": pa.array(pack & mask)}
            )
        return pa.table(
            {"bucket": pa.array(pack % nb, pa.int64()), "pack": pa.array(pack)}
        )

    raw = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"]).map_batches(
        _edges, batch_format="pyarrow"
    )
    if small:
        return pagerank(raw, assume_distinct=False)

    def _uniq(g: pd.DataFrame) -> pd.DataFrame:
        pk = np.unique(g["pack"].to_numpy(np.int64))
        return pd.DataFrame({"src": pk >> 31, "dst": pk & mask})

    edges = raw.groupby("bucket").map_groups(_uniq, batch_format="pandas")
    return pagerank(edges)


# ----------------------------------------------- repetition / features

REP_DUP_MAX_PERMILLE = 600
REP_BIGRAM_MAX_PERMILLE = 80


def repetition_signals_documents(sf_dir: str):
    """Gopher-style repetition quality signals (per-doc, shuffle-free):
    duplicate-token permille (1 - distinct/total) and top-bigram permille
    (most frequent adjacent pair / bigram positions), both pure-integer
    floor arithmetic, plus the combined keep gate.  All work happens
    inside each batch over the flattened token stream (the
    bpe_pair_counts layout) — per-doc stats never leave the block."""
    from .functions.text import ws_tokens

    def _f(df: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        lens: list[int] = []
        for s in df["text"]:
            ts = ws_tokens(s.lower())
            toks.extend(ts)
            lens.append(len(ts))
        n_docs = len(df)
        n = np.asarray(lens, np.int64)
        doc_id = df["doc_id"].to_numpy(np.int64)
        arr = np.asarray(toks, object)
        ends = np.cumsum(n)
        owner = np.repeat(np.arange(n_docs), n)
        # distinct tokens per doc (vectorized pandas nunique)
        d = np.zeros(n_docs, np.int64)
        if len(arr):
            nu = pd.DataFrame({"o": owner, "t": arr}).groupby("o")["t"].nunique()
            d[nu.index.to_numpy()] = nu.to_numpy(np.int64)
        # top adjacent-bigram count per doc (doc-boundary masked)
        top = np.zeros(n_docs, np.int64)
        if len(arr) >= 2:
            valid = np.ones(len(arr) - 1, bool)
            last_pos = ends[:-1] - 1
            valid[last_pos[(last_pos >= 0) & (last_pos < len(valid))]] = False
            po = owner[:-1][valid]
            pairs = arr[:-1][valid] + " " + arr[1:][valid]
            if len(pairs):
                mx = (
                    pd.DataFrame({"o": po, "p": pairs})
                    .groupby(["o", "p"], sort=False)
                    .size()
                    .groupby("o")
                    .max()
                )
                top[mx.index.to_numpy()] = mx.to_numpy(np.int64)
        dup_pm = np.where(n > 0, (1000 * (n - d)) // np.maximum(n, 1), 0)
        bg_pm = np.where(n >= 2, (1000 * top) // np.maximum(n - 1, 1), 0)
        keep = (
            (dup_pm <= REP_DUP_MAX_PERMILLE) & (bg_pm <= REP_BIGRAM_MAX_PERMILLE)
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": doc_id,
                "n_tokens": n,
                "dup_token_permille": dup_pm.astype(np.int64),
                "top_bigram_permille": bg_pm.astype(np.int64),
                "keep": keep,
            }
        )

    return _docs(sf_dir).map_batches(_f, batch_format="pandas")


FEAT_HASH_DIMS = 64


def feature_hash_documents(sf_dir: str):
    """Hashing-trick sparse bag-of-words features (signed feature
    hashing, Weinberger et al. 2009): dim = poly_hash(token) % K, sign
    from the next hash bit, weight = signed occurrence sum per (doc,
    dim), zeros dropped.  Token hashing is the SQL-replicable rolling
    polynomial (functions/text.py) batched over the whole flattened
    token stream in one vectorized pass; the (doc, dim) reduce is
    per-batch pandas — no shuffle, features never leave the block."""
    from .functions.text import rolling_fingerprint_batch, ws_tokens

    K = FEAT_HASH_DIMS

    def _f(df: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        lens: list[int] = []
        for s in df["text"]:
            ts = ws_tokens(s.lower())
            toks.extend(ts)
            lens.append(len(ts))
        if not toks:
            return pd.DataFrame(
                {
                    "doc_id": pd.array([], "int64"),
                    "dim": pd.array([], "int64"),
                    "weight": pd.array([], "int64"),
                }
            )
        doc_id = df["doc_id"].to_numpy(np.int64)
        owner = np.repeat(np.arange(len(df)), np.asarray(lens, np.int64))
        h = rolling_fingerprint_batch(toks)
        dim = h % K
        sign = np.where((h // K) % 2 == 0, 1, -1).astype(np.int64)
        g = (
            pd.DataFrame({"doc": doc_id[owner], "dim": dim, "s": sign})
            .groupby(["doc", "dim"], sort=True)["s"]
            .sum()
        )
        g = g[g != 0]
        idx = g.index.to_frame(index=False)
        return pd.DataFrame(
            {
                "doc_id": idx["doc"].to_numpy(np.int64),
                "dim": idx["dim"].to_numpy(np.int64),
                "weight": g.to_numpy(np.int64),
            }
        )

    return _docs(sf_dir).map_batches(_f, batch_format="pandas")


TFIDF_TERMS = ("spark", "join", "window")
TFIDF_SCALE = 10**9
TFIDF_TOPK = 20


def tfidf_search_topk(sf_dir: str, k: int = TFIDF_TOPK):
    """Lexical search: integer tf-idf top-k for a fixed query-term set.
    Two streaming passes: (1) per-batch partial document frequencies ->
    one tiny Sum aggregate (3 scalars on the driver — the broadcast-fits
    side of an inverted index); (2) per-doc scores
    sum(tf * (SCALE // df)) vectorized in-batch, then a distributed
    sort + limit with a deterministic (score DESC, doc_id ASC)
    tie-break.  idf is exact integer (SCALE // df) — no ln, no float."""
    from ray.data.aggregate import Sum

    from .functions.text import ws_tokens

    terms = list(TFIDF_TERMS)

    def _tf_matrix(df: pd.DataFrame) -> np.ndarray:
        """(n_docs x n_terms) exact token-match counts."""
        toks: list[str] = []
        lens: list[int] = []
        for s in df["text"]:
            ts = ws_tokens(s.lower())
            toks.extend(ts)
            lens.append(len(ts))
        out = np.zeros((len(df), len(terms)), np.int64)
        if toks:
            arr = np.asarray(toks, object)
            owner = np.repeat(np.arange(len(df)), np.asarray(lens, np.int64))
            for j, t in enumerate(terms):
                m = arr == t
                if m.any():
                    out[:, j] = np.bincount(owner[m], minlength=len(df))
        return out

    def _df_partial(df: pd.DataFrame) -> pd.DataFrame:
        tf = _tf_matrix(df)
        return pd.DataFrame(
            {f"df_{j}": [int((tf[:, j] > 0).sum())] for j in range(len(terms))}
        )

    dfs = (
        _docs(sf_dir)
        .map_batches(_df_partial, batch_format="pandas")
        .aggregate(*[Sum(f"df_{j}") for j in range(len(terms))])
    )
    w = np.array(
        [
            TFIDF_SCALE // max(int(dfs[f"sum(df_{j})"]), 1)
            for j in range(len(terms))
        ],
        np.int64,
    )

    def _score(df: pd.DataFrame) -> pd.DataFrame:
        tf = _tf_matrix(df)
        score = tf @ w
        sel = score > 0
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64)[sel],
                "score": score[sel],
            }
        )

    return (
        _docs(sf_dir)
        .map_batches(_score, batch_format="pandas")
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(k)
    )


# ----------------------------------------------------- general hash join

def _order_lineitem_revenue(sf_dir: str, strategy: str):
    """lineitem JOIN orders via the generic hash-join operator, then a
    bounded (5-group) revenue rollup per order priority.  The shuffle
    variant forces the big-big bucketed co-group path; the broadcast
    variant ships orders once through the object store — identical
    output, shared oracle (the strategy must be output-invisible)."""
    from ray.data.aggregate import Count, Sum

    from .stages.join import hash_join

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice"]).map_batches(
        lambda t: t.rename_columns(["o_orderkey", "l_extendedprice"]),
        batch_format="pyarrow",
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    joined = hash_join(
        li,
        orders,
        "o_orderkey",
        ["o_orderpriority"],
        strategy=strategy,
        left_rows=_nrows(sf_dir, "lineitem"),
    )

    def _cents(t: pa.Table) -> pa.Table:
        price = np.asarray(t["l_extendedprice"].to_numpy(zero_copy_only=False), np.float64)
        return pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "cents": pa.array(np.floor(price * 100.0 + 0.5).astype(np.int64)),
            }
        )

    return (
        joined.map_batches(_cents, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Count(alias_name="n"), Sum("cents", alias_name="revenue_cents"))
    )


def order_lineitem_revenue(sf_dir: str):
    return _order_lineitem_revenue(sf_dir, "shuffle")


def order_lineitem_revenue_bcast(sf_dir: str):
    return _order_lineitem_revenue(sf_dir, "broadcast")


def events_resample_ffill(sf_dir: str):
    """Per-user hourly resample with gap fill (time-series staple): one
    row for EVERY hour from the user's first to last event — hours with
    no events carry n=0 and the forward-filled last observed value
    (integer cents; last = max (ts, event_id), deterministic).  Users are
    hashed into SESSION_BUCKETS coarse co-groups; inside each bucket the
    per-(user,hour) rollup, dense hour grid (repeat/arange, no per-user
    loop) and groupby-ffill are all vectorized pandas."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "value"])

    def _bucket(t: pa.Table) -> pa.Table:
        uid = np.asarray(t["user_id"].to_numpy(zero_copy_only=False), np.int64)
        return t.append_column(
            "bucket", pa.array((uid * 2654435761 % 2**32) % SESSION_BUCKETS, pa.int64())
        )

    def _f(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        g["hour"] = g["ts"].dt.floor("h")
        g["cents"] = np.floor(
            g["value"].to_numpy(np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        per = (
            g.groupby(["user_id", "hour"], sort=True)
            .agg(n=("cents", "size"), last_cents=("cents", "last"))
            .reset_index()
        )
        spans = per.groupby("user_id")["hour"].agg(["min", "max"])
        lens = (
            (spans["max"] - spans["min"]) // pd.Timedelta(hours=1) + 1
        ).to_numpy(np.int64)
        total = int(lens.sum())
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        offs = np.arange(total) - np.repeat(starts, lens)
        grid = pd.DataFrame(
            {
                "user_id": np.repeat(spans.index.to_numpy(np.int64), lens),
                "hour": np.repeat(spans["min"].to_numpy(), lens)
                + offs * np.timedelta64(1, "h"),
            }
        )
        m = grid.merge(per, on=["user_id", "hour"], how="left")
        m["n"] = m["n"].fillna(0).astype(np.int64)
        m["last_cents"] = (
            m.groupby("user_id")["last_cents"].ffill().astype(np.int64)
        )
        return m[["user_id", "hour", "n", "last_cents"]]

    return (
        ev.map_batches(_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_f, batch_format="pandas")
    )


Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = "1998-06-01"


def q3_shipping_priority(sf_dir: str, k: int = 10):
    """TPC-H-Q3-shaped multi-join pipeline composing the generic
    hash-join operator twice: customer (segment filter, BROADCAST side)
    -> orders (date predicate pushed into the parquet read) -> lineitem
    (ship-date pushdown, big-big SHUFFLE join), then a per-order revenue
    rollup through the coarse-bucket reduce (order-key cardinality) and
    a distributed sort + limit with deterministic tie-break."""
    import datetime as _dt

    import pyarrow.compute as pc
    import ray.data as rd

    from .stages.join import hash_join

    cutoff = _dt.datetime.fromisoformat(Q3_CUTOFF)

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], Q3_SEGMENT)).select(
            ["c_custkey"]
        ).rename_columns(["o_custkey"]),
        batch_format="pyarrow",
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        filter=pc.field("o_orderdate") < cutoff,
    )
    orders_b = hash_join(orders, cust, "o_custkey", [], strategy="broadcast")

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=pc.field("l_shipdate") > cutoff,
    )

    def _li_cents(t: pa.Table) -> pa.Table:
        price = np.asarray(t["l_extendedprice"].to_numpy(zero_copy_only=False), np.float64)
        disc = np.asarray(t["l_discount"].to_numpy(zero_copy_only=False), np.float64)
        return pa.table(
            {
                "o_orderkey": t["l_orderkey"],
                "cents": pa.array(
                    np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
                ),
            }
        )

    joined = hash_join(
        li.map_batches(_li_cents, batch_format="pyarrow"),
        orders_b.map_batches(
            lambda t: t.select(["o_orderkey", "o_orderdate", "o_orderpriority"]),
            batch_format="pyarrow",
        ),
        "o_orderkey",
        ["o_orderdate", "o_orderpriority"],
        strategy="shuffle",
        left_rows=_nrows(sf_dir, "lineitem"),
    )

    def _partial(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["o_orderkey", "o_orderdate", "o_orderpriority"], sort=False)[
            "cents"
        ].sum()
        idx = agg.index.to_frame(index=False)
        out = pd.DataFrame(
            {
                "o_orderkey": idx["o_orderkey"].to_numpy(np.int64),
                "o_orderdate": idx["o_orderdate"],
                "o_orderpriority": idx["o_orderpriority"].astype(object),
                "revenue_cents": agg.to_numpy(np.int64),
            }
        )
        out["bucket"] = (
            out["o_orderkey"].to_numpy(np.int64) * 2654435761 % 2**32
        ) % SESSION_BUCKETS
        return out

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["o_orderkey", "o_orderdate", "o_orderpriority"], sort=False)[
            "revenue_cents"
        ].sum()
        idx = agg.index.to_frame(index=False)
        return pd.DataFrame(
            {
                "o_orderkey": idx["o_orderkey"].to_numpy(np.int64),
                "o_orderdate": idx["o_orderdate"],
                "o_orderpriority": idx["o_orderpriority"].astype(object),
                "revenue_cents": agg.to_numpy(np.int64),
            }
        )

    return (
        joined.map_batches(_partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(_reduce, batch_format="pandas")
        .sort(["revenue_cents", "o_orderkey"], descending=[True, False])
        .limit(k)
    )


NTILE_TILES = 4


def _pq_col_max(sf_dir: str, table: str, col: str) -> float | None:
    """Column max from parquet row-group statistics only (no data scan) —
    the planner-stats step for range-partitioned operators."""
    import pyarrow.parquet as pq

    md = pq.read_metadata(f"{sf_dir}/{table}.parquet")
    names = md.schema.to_arrow_schema().names
    j = names.index(col)
    mx = None
    for i in range(md.num_row_groups):
        st = md.row_group(i).column(j).statistics
        if st is None or st.max is None:
            return None
        mx = st.max if mx is None else max(mx, st.max)
    return mx


def orders_price_ntile(sf_dir: str, tiles: int = NTILE_TILES):
    """Global equi-depth binning (NTILE-shaped analytic over a GLOBAL
    order): quartile of each order by (price cents, orderkey) rank,
    computed with the distributed ordered prefix scan — rank-1 =
    exclusive count of smaller keys; tile = rank0 * tiles // n.  The
    composite int64 key packs cents * 2^31 + orderkey (unique, exact);
    the key-domain bound comes from parquet row-group stats, so no extra
    scan.  Never a global sort-to-driver; the scan's range buckets ARE
    the partitioner."""
    from .stages.scan import ordered_prefix_sum

    n = _nrows(sf_dir, "orders")
    pmax = _pq_col_max(sf_dir, "orders", "o_totalprice")
    if pmax is None:  # stats absent: bound via one column-pruned read
        import pyarrow.parquet as pq

        pmax = (
            pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])
            .column(0)
            .to_numpy()
            .max()
        )
    max_key = (int(np.floor(pmax * 100.0 + 0.5)) + 1) << 31

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def _key(t: pa.Table) -> pa.Table:
        ok = np.asarray(t["o_orderkey"].to_numpy(zero_copy_only=False), np.int64)
        cents = np.floor(
            np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64)
            * 100.0
            + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": pa.array(ok),
                "__k": pa.array((cents << 31) | ok),
                "one": pa.array(np.ones(len(ok), np.int64)),
            }
        )

    scanned = ordered_prefix_sum(
        ds.map_batches(_key, batch_format="pyarrow"), "__k", "one", max_key
    )

    def _tile(t: pa.Table) -> pa.Table:
        rank0 = np.asarray(t["cum_prev"].to_numpy(zero_copy_only=False), np.int64)
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "quartile": pa.array((rank0 * tiles) // n + 1),
            }
        )

    return scanned.map_batches(_tile, batch_format="pyarrow")


# ------------------------------------------- per-key window analytics


def _orders_customer_bucketed(sf_dir: str):
    """orders -> (bucket, o_custkey, o_orderkey, day_num, cents) with the
    coarse customer-hash bucket key (one map_groups dispatch per BUCKET,
    never per customer — Ray aggregate cost scales with group count)."""
    orders = _read(
        sf_dir,
        "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def _prep(t: pa.Table) -> pa.Table:
        ck = np.asarray(t["o_custkey"].to_numpy(zero_copy_only=False), np.int64)
        cents = np.floor(
            np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64)
            * 100.0
            + 0.5
        ).astype(np.int64)
        day = (
            t["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        return pa.table(
            {
                "bucket": pa.array((ck * 2654435761 % 2**32) % SESSION_BUCKETS, pa.int64()),
                "o_custkey": t["o_custkey"],
                "o_orderkey": t["o_orderkey"],
                "day_num": pa.array(day.astype(np.int64)),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    return orders.map_batches(_prep, batch_format="pyarrow")


def customer_running_total(sf_dir: str):
    """Per-customer cumulative order value (SUM OVER PARTITION BY custkey
    ORDER BY date, orderkey): the streaming-ledger window.  Fine-grained
    partitions recovered vectorized inside each coarse bucket — sort +
    grouped cumsum, exact integer cents."""

    def _cumsum(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["o_custkey", "day_num", "o_orderkey"], kind="mergesort"
        )
        run = g.groupby("o_custkey", sort=False)["cents"].cumsum().to_numpy(np.int64)
        return pd.DataFrame(
            {"o_orderkey": g["o_orderkey"].to_numpy(np.int64), "running_cents": run}
        )

    return (
        _orders_customer_bucketed(sf_dir)
        .groupby("bucket")
        .map_groups(_cumsum, batch_format="pandas")
    )


def orders_interorder_gap(sf_dir: str):
    """LAG analytic: whole days since the same customer's previous order
    (calendar-day boundary count, matching date_diff('day')); first order
    -> -1 (COALESCE keeps the column non-null int64)."""

    def _gap(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["o_custkey", "day_num", "o_orderkey"], kind="mergesort"
        )
        day = g["day_num"].to_numpy(np.int64)
        ck = g["o_custkey"].to_numpy(np.int64)
        gap = np.empty(len(day), np.int64)
        gap[0] = -1
        if len(day) > 1:
            same = ck[1:] == ck[:-1]
            gap[1:] = np.where(same, day[1:] - day[:-1], -1)
        return pd.DataFrame(
            {"o_orderkey": g["o_orderkey"].to_numpy(np.int64), "gap_days": gap}
        )

    return (
        _orders_customer_bucketed(sf_dir)
        .groupby("bucket")
        .map_groups(_gap, batch_format="pandas")
    )


def lineitem_moments(sf_dir: str):
    """Exact integer group moments (count / sum / sum-of-squares of
    quantity cents) per (returnflag, linestatus): the mergeable-partial
    shape for distributed variance.  sumsq stays exact while
    n * (max_cents)^2 < 2^63 — at qty <= 100 (cents 10^4, sq 10^8) that is
    9e10 rows PER GROUP; beyond that, shard the group key.  Per-batch
    np.add.at partials -> bounded-cardinality Ray Sum."""
    from ray.data.aggregate import Sum

    li = _read(
        sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_quantity"]
    )

    def _partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        flag = t["l_returnflag"]
        stat = t["l_linestatus"]
        key = pc.binary_join_element_wise(flag.cast(pa.string()), stat.cast(pa.string()), "|")
        cents = np.floor(
            np.asarray(t["l_quantity"].to_numpy(zero_copy_only=False), np.float64)
            * 100.0
            + 0.5
        ).astype(np.int64)
        ku = pc.unique(key)
        inv = pc.index_in(key, ku).to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.bincount(inv, minlength=len(ku)).astype(np.int64)
        s = np.zeros(len(ku), np.int64)
        s2 = np.zeros(len(ku), np.int64)
        np.add.at(s, inv, cents)
        np.add.at(s2, inv, cents * cents)
        return pa.table(
            {"key": ku, "n": pa.array(n), "s": pa.array(s), "s2": pa.array(s2)}
        )

    agg = (
        li.map_batches(_partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s", alias_name="sum_qty_cents"),
            Sum("s2", alias_name="sumsq_qty_cents"),
        )
        .to_pandas()
    )
    parts = agg["key"].str.split("|", expand=True)
    return pd.DataFrame(
        {
            "l_returnflag": parts[0],
            "l_linestatus": parts[1],
            "n": agg["n"].to_numpy(np.int64),
            "sum_qty_cents": agg["sum_qty_cents"].to_numpy(np.int64),
            "sumsq_qty_cents": agg["sumsq_qty_cents"].to_numpy(np.int64),
        }
    ).sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def user_mode_event_type(sf_dir: str):
    """Per-user modal event type (deterministic tie-break: higher count,
    then lexicographically smallest type).  High-cardinality group key ->
    per-batch (user, type) partial counts, coarse user-hash bucket
    shuffle, vectorized within-bucket argmax."""
    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["user_id", "event_type"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        uid = g["user_id"].to_numpy(np.int64)
        g["bucket"] = ((uid * 2654435761) % 2**32) % SESSION_BUCKETS
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    def _mode(g: pd.DataFrame) -> pd.DataFrame:
        tot = (
            g.groupby(["user_id", "event_type"], sort=False)["cnt"]
            .sum()
            .reset_index()
        )
        tot = tot.sort_values(
            ["user_id", "cnt", "event_type"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        first = tot.drop_duplicates("user_id", keep="first")
        return pd.DataFrame(
            {
                "user_id": first["user_id"].to_numpy(np.int64),
                "mode_event_type": first["event_type"].to_numpy(object),
                "n_events": first["cnt"].to_numpy(np.int64),
            }
        )

    return (
        ev.map_batches(_partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(_mode, batch_format="pandas")
    )


# --------------------------------------- CCNet-style boilerplate removal

BOILER_DF_DENOM = 50  # fragment is boilerplate when df * DENOM >= n_en_pages


def _en_pages_count(npages: int) -> int:
    """Exact count of en-language pages in [0, npages) — closed form over
    the deterministic language cycle (no corpus scan)."""
    from .sources.pages import _LANG_CYCLE

    en = [k for k, l in enumerate(_LANG_CYCLE) if l == "en"]
    full, rem = divmod(npages, len(_LANG_CYCLE))
    return full * len(en) + sum(1 for k in en if k < rem)


def pages_boilerplate_strip(sf_dir: str):
    """CCNet/trafilatura-style cross-page boilerplate removal: split each
    page's extracted text into '. '-delimited sentence fragments, count
    per-fragment document frequency across the corpus (distinct pages),
    drop fragments present in >= 1/DENOM of pages, and re-join the
    survivors in original order.  Two streaming passes: (1) per-batch
    per-page-distinct fragment partials -> coarse fingerprint-bucket
    reduce -> tiny boilerplate set (bounded by the number of distinct
    site-template sentences, NOT corpus size); (2) re-stream pages,
    vectorized searchsorted probe on int64 fingerprints + grouped
    re-join.  The boiler set crosses the task boundary as a SORTED int64
    fingerprint ndarray built by a remote task from block refs (zero-copy
    on every ray.get) — never a Python set/frozenset and never a string
    isin.  Fingerprints are the ROLL_* polynomial mod ~2^31; a false
    positive needs a non-boiler fragment colliding with one of the
    O(template-sentence-count) boiler fingerprints (~n_boiler/2^31 per
    distinct fragment — negligible, and the oracle parity check would
    catch it deterministically)."""
    import ray

    from .functions.text import rolling_fingerprint_batch
    from .sources.pages import generate_pages_dataset
    from .stages.dedup import _remote_sorted_column
    from .stages.extract import filter_lang

    npages = _nrows(sf_dir, "orders") * 2
    n_en = _en_pages_count(npages)

    def _df_partial(t: pa.Table) -> pd.DataFrame:
        t = filter_lang(t)
        texts = t["text"].to_pandas()
        ex = texts.str.split(". ", regex=False).explode()
        d = pd.DataFrame(
            {"page": ex.index.to_numpy(np.int64), "frag": ex.to_numpy(object)}
        ).drop_duplicates()
        cnt = d.groupby("frag", sort=False).size().reset_index(name="cnt")
        cnt["bucket"] = (
            rolling_fingerprint_batch(cnt["frag"].tolist()) % SESSION_BUCKETS
        )
        cnt["cnt"] = cnt["cnt"].astype(np.int64)
        return cnt[["bucket", "frag", "cnt"]]

    def _df_reduce(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("frag", sort=False)["cnt"].sum()
        boiler = tot[tot * BOILER_DF_DENOM >= n_en]
        return pd.DataFrame(
            {"fp": rolling_fingerprint_batch(boiler.index.tolist())}
        )

    boiler_ds = (
        generate_pages_dataset(npages)
        .map_batches(_df_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_df_reduce, batch_format="pandas")
    )
    # sorted int64 fingerprint broadcast, assembled in a remote task from
    # block refs — the driver never holds the set, workers get a
    # zero-copy ndarray view per ray.get.
    boiler_ref = _remote_sorted_column(boiler_ds, "fp")

    def _strip(t: pa.Table) -> pd.DataFrame:
        boiler_fp = ray.get(boiler_ref)
        t = filter_lang(t)
        urls = t["url"].to_pandas().reset_index(drop=True)
        texts = t["text"].to_pandas().reset_index(drop=True)
        ex = texts.str.split(". ", regex=False).explode()
        kept = ex[~_sorted_member(boiler_fp, rolling_fingerprint_batch(ex.tolist()))]
        joined = kept.groupby(level=0).agg(". ".join)
        n_kept = kept.groupby(level=0).size()
        n_tot = ex.groupby(level=0).size()
        nk = n_kept.reindex(n_tot.index, fill_value=0).to_numpy(np.int64)
        return pd.DataFrame(
            {
                "url": urls.to_numpy(object),
                "clean_text": joined.reindex(n_tot.index, fill_value="").to_numpy(object),
                "n_kept": nk,
                "n_removed": n_tot.to_numpy(np.int64) - nk,
            }
        )

    return generate_pages_dataset(npages).map_batches(_strip, batch_format="pyarrow")


# ------------------------------------ embedding / validation / rollup

EMB_Q_SCALE = 1 << 20  # centroid quantization: exact in float64 and SQL


def embedding_centroids(sf_dir: str):
    """Per-label embedding centroid as EXACT quantized integer sums (one
    row per (label, dim)): each float32 component converts to double
    identically in numpy and DuckDB, so floor(x * 2^20 + 0.5) sums are
    bit-exact on both sides.  Per-batch np.add.at partials over a packed
    (label, dim) key -> bounded-cardinality Ray Sum (labels x dims)."""
    from ray.data.aggregate import Sum

    emb = _read(sf_dir, "embeddings", columns=["label", "embedding"])

    def _partial(t: pa.Table) -> pa.Table:
        lab = np.asarray(t["label"].to_numpy(zero_copy_only=False), np.int64)
        mat = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        q = np.floor(mat * EMB_Q_SCALE + 0.5).astype(np.int64)
        dims = q.shape[1]
        ul, inv = np.unique(lab, return_inverse=True)
        s = np.zeros((len(ul), dims), np.int64)
        np.add.at(s, inv, q)
        n = np.bincount(inv, minlength=len(ul)).astype(np.int64)
        key = (np.repeat(ul, dims) << 12) | np.tile(np.arange(1, dims + 1, dtype=np.int64), len(ul))
        return pa.table(
            {
                "key": pa.array(key),
                "sum_q": pa.array(s.ravel()),
                "n": pa.array(np.repeat(n, dims)),
            }
        )

    agg = (
        emb.map_batches(_partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("sum_q", alias_name="sum_q"), Sum("n", alias_name="n"))
        .to_pandas()
    )
    key = agg["key"].to_numpy(np.int64)
    return (
        pd.DataFrame(
            {
                "label": key >> 12,
                "dim": key & 0xFFF,
                "sum_q": agg["sum_q"].to_numpy(np.int64),
                "n": agg["n"].to_numpy(np.int64),
            }
        )
        .sort_values(["label", "dim"])
        .reset_index(drop=True)
    )


def orders_validation_report(sf_dir: str) -> pd.DataFrame:
    """Expectations-style data-quality gate: one row of BIGINT violation
    counters (nulls, domain violations, referential orphans are covered
    elsewhere by the bloom anti-join).  Per-batch vectorized CASE counts
    -> tiny Sum reduce; the 100 TB shape is the same counters, merged."""
    from ray.data.aggregate import Sum

    orders = _read(
        sf_dir,
        "orders",
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"],
    )

    def _partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        price = np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64)
        ck = np.asarray(t["o_custkey"].to_numpy(zero_copy_only=False), np.int64)
        status_ok = pc.is_in(
            t["o_orderstatus"], value_set=pa.array(["O", "F", "P"])
        ).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_rows": pa.array([len(price)], pa.int64()),
                "null_custkey": pa.array([int(t["o_custkey"].null_count)], pa.int64()),
                "nonpositive_price": pa.array([int((price <= 0).sum())], pa.int64()),
                "bad_status": pa.array([int((~status_ok).sum())], pa.int64()),
                "nonpositive_custkey": pa.array([int((ck <= 0).sum())], pa.int64()),
            }
        )

    agg = (
        orders.map_batches(_partial, batch_format="pyarrow")
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("null_custkey", alias_name="null_custkey"),
            Sum("nonpositive_price", alias_name="nonpositive_price"),
            Sum("bad_status", alias_name="bad_status"),
            Sum("nonpositive_custkey", alias_name="nonpositive_custkey"),
        )
    )
    return pd.DataFrame({k: pd.array([int(v)], "int64") for k, v in agg.items()})


def _lineitem_fine_revenue(sf_dir: str) -> pd.DataFrame:
    """Finest-level (l_returnflag, l_linestatus) integer-cents aggregate:
    per-batch partials + bounded Sum — the one distributed scan that both
    the ROLLUP and CUBE queries derive all coarser levels from."""
    from ray.data.aggregate import Sum

    li = _read(
        sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_extendedprice"]
    )

    def _partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        key = pc.binary_join_element_wise(
            t["l_returnflag"].cast(pa.string()),
            t["l_linestatus"].cast(pa.string()),
            "|",
        )
        cents = np.floor(
            np.asarray(t["l_extendedprice"].to_numpy(zero_copy_only=False), np.float64)
            * 100.0
            + 0.5
        ).astype(np.int64)
        ku = pc.unique(key)
        inv = pc.index_in(key, ku).to_numpy(zero_copy_only=False).astype(np.int64)
        s = np.zeros(len(ku), np.int64)
        np.add.at(s, inv, cents)
        n = np.bincount(inv, minlength=len(ku)).astype(np.int64)
        return pa.table({"key": ku, "cents": pa.array(s), "n": pa.array(n)})

    agg = (
        li.map_batches(_partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("cents", alias_name="cents"), Sum("n", alias_name="n"))
        .to_pandas()
    )
    parts = agg["key"].str.split("|", expand=True)
    return pd.DataFrame(
        {
            "l_returnflag": parts[0].to_numpy(object),
            "l_linestatus": parts[1].to_numpy(object),
            "revenue_cents": agg["cents"].to_numpy(np.int64),
            "n": agg["n"].to_numpy(np.int64),
        }
    )


def _levels_out(frames: list[pd.DataFrame]) -> pd.DataFrame:
    out = pd.concat(frames, ignore_index=True)[
        ["l_returnflag", "l_linestatus", "revenue_cents", "n"]
    ]
    out["revenue_cents"] = out["revenue_cents"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def revenue_rollup(sf_dir: str) -> pd.DataFrame:
    """GROUP BY ROLLUP(l_returnflag, l_linestatus) revenue: finest-level
    integer-cents aggregate (per-batch partials + bounded Sum), with the
    subtotal and grand-total levels derived from the finest rows
    driver-side (a few dozen rows — never a second scan).  NULL rollup
    keys surface as 'ALL' in both engine and oracle."""
    fine = _lineitem_fine_revenue(sf_dir)
    sub = (
        fine.groupby("l_returnflag", as_index=False)[["revenue_cents", "n"]]
        .sum()
        .assign(l_linestatus="ALL")
    )
    total = pd.DataFrame(
        {
            "l_returnflag": ["ALL"],
            "l_linestatus": ["ALL"],
            "revenue_cents": [int(fine["revenue_cents"].sum())],
            "n": [int(fine["n"].sum())],
        }
    )
    return _levels_out([fine, sub, total])


def revenue_cube(sf_dir: str) -> pd.DataFrame:
    """GROUP BY CUBE(l_returnflag, l_linestatus): all four grouping sets,
    derived from the same single finest-level distributed scan as
    revenue_rollup (the extra (ALL, status) level is a second tiny
    driver-side fold of the few finest rows)."""
    fine = _lineitem_fine_revenue(sf_dir)
    by_flag = (
        fine.groupby("l_returnflag", as_index=False)[["revenue_cents", "n"]]
        .sum()
        .assign(l_linestatus="ALL")
    )
    by_status = (
        fine.groupby("l_linestatus", as_index=False)[["revenue_cents", "n"]]
        .sum()
        .assign(l_returnflag="ALL")
    )
    total = pd.DataFrame(
        {
            "l_returnflag": ["ALL"],
            "l_linestatus": ["ALL"],
            "revenue_cents": [int(fine["revenue_cents"].sum())],
            "n": [int(fine["n"].sum())],
        }
    )
    return _levels_out([fine, by_flag, by_status, total])


# ------------------------------------------------- left-outer join


def _order_fulfillment(sf_dir: str, strategy: str):
    """Orders LEFT OUTER JOIN per-order lineitem rollup: every order row
    survives; orders with no lineitems take integer zero fills (the
    complement of the bloom anti-join, as a join type).  The per-order
    rollup never touches Ray groupby on the high-cardinality orderkey:
    per-batch np partials -> coarse-bucket reduce; then the generic
    hash_join runs in the requested strategy with how='left' (broadcast:
    Acero 'left outer' + pc.coalesce; shuffle: in-bucket pandas
    merge(how='left') + integer fill before the dtype restore)."""
    from .stages.join import hash_join

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice"])

    def _partial(t: pa.Table) -> pd.DataFrame:
        ok = np.asarray(t["l_orderkey"].to_numpy(zero_copy_only=False), np.int64)
        cents = np.floor(
            np.asarray(t["l_extendedprice"].to_numpy(zero_copy_only=False), np.float64)
            * 100.0
            + 0.5
        ).astype(np.int64)
        uk, inv = np.unique(ok, return_inverse=True)
        s = np.zeros(len(uk), np.int64)
        np.add.at(s, inv, cents)
        n = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        return pd.DataFrame(
            {
                "bucket": ((uk * 2654435761) % 2**32) % SESSION_BUCKETS,
                "o_orderkey": uk,
                "n_items": n,
                "item_cents": s,
            }
        )

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby("o_orderkey", sort=False)[["n_items", "item_cents"]]
            .sum()
            .reset_index()
        )
        out["n_items"] = out["n_items"].astype(np.int64)
        out["item_cents"] = out["item_cents"].astype(np.int64)
        return out

    agg = (
        li.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_reduce, batch_format="pandas")
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"])
    return hash_join(
        orders,
        agg,
        "o_orderkey",
        ["n_items", "item_cents"],
        strategy=strategy,
        left_rows=_nrows(sf_dir, "orders"),
        how="left",
        fill={"n_items": 0, "item_cents": 0},
    )


def order_fulfillment_left(sf_dir: str):
    return _order_fulfillment(sf_dir, "broadcast")


def order_fulfillment_left_shuffle(sf_dir: str):
    return _order_fulfillment(sf_dir, "shuffle")


# ------------------------------------------------ pivot and funnel

PIVOT_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def user_event_pivot(sf_dir: str):
    """Crosstab / PIVOT: per-user event counts widened to one int64
    column per (declared) event type.  Partials pivot WIDE inside each
    batch (np.add.at on a users x types matrix) so the shuffle carries
    one row per user per batch, not one per event; coarse user-hash
    buckets, vectorized within-bucket sum."""
    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])
    cols = [f"n_{t}" for t in PIVOT_EVENT_TYPES]

    def _partial(t: pa.Table) -> pd.DataFrame:
        uid = np.asarray(t["user_id"].to_numpy(zero_copy_only=False), np.int64)
        cat = pd.Categorical(
            t["event_type"].to_pandas(), categories=list(PIVOT_EVENT_TYPES)
        )
        ti = cat.codes.astype(np.int64)
        uu, inv = np.unique(uid, return_inverse=True)
        m = np.zeros((len(uu), len(PIVOT_EVENT_TYPES)), np.int64)
        keep = ti >= 0
        np.add.at(m, (inv[keep], ti[keep]), 1)
        out = pd.DataFrame(m, columns=cols)
        out.insert(0, "user_id", uu)
        out.insert(0, "bucket", ((uu * 2654435761) % 2**32) % SESSION_BUCKETS)
        return out

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("user_id", sort=False)[cols].sum().reset_index()
        return out.astype({c: np.int64 for c in ["user_id"] + cols})

    return (
        ev.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_reduce, batch_format="pandas")
    )


def view_purchase_funnel(sf_dir: str):
    """Ordered conversion funnel (view -> click -> purchase): stage
    reached per user, each step's timestamp required at-or-after the
    previous step's first occurrence.  Users co-group into coarse hash
    buckets; inside a bucket the three step resolutions are vectorized
    groupby-min + merge chains (no per-user loop)."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def _bucket(t: pa.Table) -> pa.Table:
        uid = np.asarray(t["user_id"].to_numpy(zero_copy_only=False), np.int64)
        return t.append_column(
            "bucket", pa.array((uid * 2654435761 % 2**32) % SESSION_BUCKETS, pa.int64())
        )

    def _funnel(g: pd.DataFrame) -> pd.DataFrame:
        users = pd.DataFrame({"user_id": np.unique(g["user_id"].to_numpy(np.int64))})
        t1 = (
            g.loc[g["event_type"] == "view"]
            .groupby("user_id")["ts"]
            .min()
            .rename("t1")
        )
        clicks = g.loc[g["event_type"] == "click", ["user_id", "ts"]].merge(
            t1, on="user_id"
        )
        t2 = (
            clicks.loc[clicks["ts"] >= clicks["t1"]]
            .groupby("user_id")["ts"]
            .min()
            .rename("t2")
        )
        buys = g.loc[g["event_type"] == "purchase", ["user_id", "ts"]].merge(
            t2, on="user_id"
        )
        t3 = (
            buys.loc[buys["ts"] >= buys["t2"]]
            .groupby("user_id")["ts"]
            .min()
            .rename("t3")
        )
        m = users.merge(t1, on="user_id", how="left").merge(
            t2, on="user_id", how="left"
        ).merge(t3, on="user_id", how="left")
        stage = (
            m["t1"].notna().to_numpy(np.int64)
            + m["t2"].notna().to_numpy(np.int64)
            + m["t3"].notna().to_numpy(np.int64)
        )
        return pd.DataFrame(
            {"user_id": m["user_id"].to_numpy(np.int64), "funnel_stage": stage}
        )

    return (
        ev.map_batches(_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_funnel, batch_format="pandas")
    )


# ------------------------------- histogram / correlated avg / star chain

HIST_BIN_CENTS = 50_000  # $500 fixed-width dashboard bins


def orders_price_histogram(sf_dir: str):
    """Fixed-width value histogram (the dashboard primitive): per-batch
    np.bincount partials over cents // binwidth -> bounded-cardinality
    Ray Sum (bins = value-domain / width, independent of row count)."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", columns=["o_totalprice"])

    def _partial(t: pa.Table) -> pa.Table:
        cents = np.floor(
            np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64)
            * 100.0
            + 0.5
        ).astype(np.int64)
        b = cents // HIST_BIN_CENTS
        ub, inv = np.unique(b, return_inverse=True)
        n = np.bincount(inv, minlength=len(ub)).astype(np.int64)
        return pa.table({"bin": pa.array(ub), "n": pa.array(n)})

    agg = (
        orders.map_batches(_partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    b = agg["bin"].to_numpy(np.int64)
    return pd.DataFrame(
        {
            "bin": b,
            "lo_cents": b * HIST_BIN_CENTS,
            "n": agg["n"].to_numpy(np.int64),
        }
    ).sort_values("bin").reset_index(drop=True)


def orders_above_customer_avg(sf_dir: str):
    """Correlated-aggregate filter ('orders above their own customer's
    average') with EXACT integer arithmetic: per-customer (sum, n)
    partials through a coarse-bucket reduce, broadcast back via the
    generic hash join, and the mean comparison done as the cross-multiply
    cents * n > sum — no division, no float anywhere."""
    from .stages.join import hash_join

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def _partial(t: pa.Table) -> pd.DataFrame:
        ck = np.asarray(t["o_custkey"].to_numpy(zero_copy_only=False), np.int64)
        cents = np.floor(
            np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64)
            * 100.0
            + 0.5
        ).astype(np.int64)
        uk, inv = np.unique(ck, return_inverse=True)
        s = np.zeros(len(uk), np.int64)
        np.add.at(s, inv, cents)
        n = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        return pd.DataFrame(
            {
                "bucket": ((uk * 2654435761) % 2**32) % SESSION_BUCKETS,
                "o_custkey": uk,
                "cust_sum": s,
                "cust_n": n,
            }
        )

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby("o_custkey", sort=False)[["cust_sum", "cust_n"]]
            .sum()
            .reset_index()
        )
        return out.astype(np.int64)

    cust = (
        orders.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_reduce, batch_format="pandas")
    )
    joined = hash_join(
        orders,
        cust,
        "o_custkey",
        ["cust_sum", "cust_n"],
        strategy="broadcast",
    )

    def _filter(t: pa.Table) -> pa.Table:
        cents = np.floor(
            np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64)
            * 100.0
            + 0.5
        ).astype(np.int64)
        s = np.asarray(t["cust_sum"].to_numpy(zero_copy_only=False), np.int64)
        n = np.asarray(t["cust_n"].to_numpy(zero_copy_only=False), np.int64)
        keep = cents * n > s
        return pa.table(
            {"o_orderkey": pa.array(
                np.asarray(t["o_orderkey"].to_numpy(zero_copy_only=False), np.int64)[keep]
            )}
        )

    return joined.map_batches(_filter, batch_format="pyarrow")


def customers_per_region(sf_dir: str):
    """Star-schema denormalization chain: customer -> nation -> region by
    two broadcast dimension joins (each dimension ships once), then a
    bounded per-region rollup of count + acctbal cents."""
    from ray.data.aggregate import Count, Sum
    from .stages.join import hash_join

    cust = _read(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"]).map_batches(
        lambda t: t.rename_columns(["n_nationkey", "c_acctbal"]),
        batch_format="pyarrow",
    )
    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_regionkey"])
    region = _read(sf_dir, "region", columns=["r_regionkey", "r_name"]).map_batches(
        lambda t: t.rename_columns(["n_regionkey", "r_name"]), batch_format="pyarrow"
    )
    j1 = hash_join(cust, nation, "n_nationkey", ["n_regionkey"], strategy="broadcast")
    j2 = hash_join(j1, region, "n_regionkey", ["r_name"], strategy="broadcast")

    def _cents(t: pa.Table) -> pa.Table:
        bal = np.floor(
            np.asarray(t["c_acctbal"].to_numpy(zero_copy_only=False), np.float64)
            * 100.0
            + 0.5
        ).astype(np.int64)
        return pa.table({"r_name": t["r_name"], "cents": pa.array(bal)})

    return (
        j2.map_batches(_cents, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(Count(alias_name="n_customers"), Sum("cents", alias_name="acctbal_cents"))
    )


# ------------------------------------------------- kNN graph / mixture /
# ordered string aggregation (round-3 batch)

KNN_GRAPH_K = 5
#: per-source-tier keep-rate (percent) and epoch repeat factor for the
#: deterministic training-data mixture (tier = int(source[3:]) % 3);
#: the oracle SQL replicates both CASE tables verbatim.
MIX_RATES = (80, 50, 20)
MIX_EPOCHS = (1, 2, 3)


def knn_graph(sf_dir: str, k: int = KNN_GRAPH_K):
    """All-pairs kNN graph (exact quantized-integer dot product): the
    similarity-graph construction primitive under embedding clustering /
    near-dup mining.  See stages/ann.knn_graph_quantized for the
    broadcast-matmul scale shape."""
    from .stages.ann import knn_graph_quantized

    return knn_graph_quantized(sf_dir, k)


def training_mixture(sf_dir: str):
    """Deterministic training-data mixture: per-source-tier keep rate +
    epoch repeat factor (the data-mixing step of an LLM pre-training
    pipeline).  Pure streaming — the kernel is one vectorized pass per
    batch (hash filter + np.repeat row expansion), zero shuffle."""
    import pyarrow.compute as pc

    docs = _read(sf_dir, "documents", columns=["doc_id", "source"])
    rates = np.asarray(MIX_RATES, np.int64)
    epochs_by_tier = np.asarray(MIX_EPOCHS, np.int64)

    def _mix(t: pa.Table) -> pa.Table:
        did = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), np.int64)
        src = t["source"].combine_chunks()
        tier = (
            np.asarray(
                pc.cast(pc.utf8_slice_codeunits(src, 3, 32), pa.int64()).to_numpy(
                    zero_copy_only=False
                ),
                np.int64,
            )
            % 3
        )
        keep = ((did * 2654435761) % 4294967296) % 100 < rates[tier]
        did, tier = did[keep], tier[keep]
        src = src.filter(pa.array(keep))
        reps = epochs_by_tier[tier]
        idx = np.repeat(np.arange(len(did)), reps)
        epoch = (
            np.arange(len(idx), dtype=np.int64)
            - np.repeat(np.cumsum(reps) - reps, reps)
            + 1
        )
        return pa.table(
            {
                "doc_id": pa.array(did[idx], pa.int64()),
                "source": src.take(pa.array(idx, pa.int64())),
                "tier": pa.array(tier[idx], pa.int64()),
                "epoch": pa.array(epoch, pa.int64()),
            }
        )

    return docs.map_batches(_mix, batch_format="pyarrow")


def user_journeys(sf_dir: str):
    """Ordered per-key string aggregation (the 'user journey' primitive):
    event types concatenated in (ts, event_id) order per user.  Group
    count is user-cardinality, so Ray's per-group aggregate is bypassed:
    coarse-bucket shuffle on hashed user_id, one vectorized pandas
    sort + groupby-join per bucket (the CLAUDE high-group-count rule)."""
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])

    def _bucket(t: pa.Table) -> pa.Table:
        u = np.asarray(t["user_id"].to_numpy(zero_copy_only=False), np.int64)
        b = ((u * 2654435761) % 4294967296) % SESSION_BUCKETS
        return t.append_column("bucket", pa.array(b, pa.int64()))

    def _agg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        gr = g.groupby("user_id", sort=False)
        out = gr["event_type"].agg(">".join).reset_index(name="journey")
        out["n_events"] = gr.size().to_numpy(np.int64)
        return out[["user_id", "n_events", "journey"]]

    return (
        ev.map_batches(_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_agg, batch_format="pandas")
    )


# -------------------------------------- semi/anti join + CUBE + heavy hitters

HH_CAP = 64  #: heavy hitter = token with count * HH_CAP > total tokens


def _orders_custkeys(sf_dir: str):
    return _read(sf_dir, "orders", columns=["o_custkey"]).map_batches(
        lambda t: t.rename_columns(["c_custkey"]), batch_format="pyarrow"
    )


def customers_with_orders(sf_dir: str):
    """EXISTS as an operator: semi-join through the generic hash join —
    the orders key column ships once (Acero 'left semi' against the
    broadcast table), customers stream filtered with zero shuffle."""
    from .stages.join import hash_join

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    return hash_join(
        cust, _orders_custkeys(sf_dir), "c_custkey", [], strategy="broadcast", how="semi"
    )


def orders_without_lineitems_anti(sf_dir: str):
    """NOT EXISTS via the bucketed co-group path (both sides one coarse
    hash-bucket shuffle, vectorized isin mask per bucket) — the big-big
    anti-join shape, sharing the bloom-prefiltered variant's oracle
    (orders_without_lineitems) so the strategy choice is output-invisible.
    Every customer/part/supplier key is referenced in the synthetic data;
    orders-without-lineitems is the one non-empty anti-join."""
    from .stages.join import hash_join

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def _cents(t: pa.Table) -> pa.Table:
        cents = np.floor(
            np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64)
            * 100.0
            + 0.5
        ).astype(np.int64)
        return pa.table(
            {"o_orderkey": t["o_orderkey"], "o_totalprice_cents": pa.array(cents)}
        )

    li = _read(sf_dir, "lineitem", columns=["l_orderkey"]).map_batches(
        lambda t: t.rename_columns(["o_orderkey"]), batch_format="pyarrow"
    )
    return hash_join(
        orders.map_batches(_cents, batch_format="pyarrow"),
        li,
        "o_orderkey",
        [],
        strategy="shuffle",
        left_rows=_nrows(sf_dir, "orders"),
        how="anti",
    )


def token_heavy_hitters(sf_dir: str, cap: int = HH_CAP):
    """Exact global heavy hitters (count * cap > corpus token total) in
    two streaming passes: (1) a mergeable Misra-Gries AggregateFn whose
    <= cap candidate tokens are a GUARANTEED superset of every heavy
    hitter; (2) an exact recount of only those candidates (sorted-array
    membership probe per batch, bounded groupby) plus the global total —
    the sketch-then-exact-recheck discipline of the bloom anti-join, so
    a plain SQL HAVING oracle hash-matches."""
    from ray.data.aggregate import Sum

    from .functions.text import ws_tokens
    from .stages.sketch import build_mg_tokens

    cand = np.sort(
        np.asarray(list(build_mg_tokens(_docs(sf_dir), cap=cap)), object)
    )

    def _exact_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        for s in df["text"]:
            toks.extend(ws_tokens(s.lower()))
        arr = np.asarray(toks, object)
        total = len(arr)
        if len(cand) and total:
            pos = np.searchsorted(cand, arr)
            pos[pos == len(cand)] = 0
            hit = cand[pos] == arr
            uniq, counts = np.unique(arr[hit], return_counts=True)
        else:
            uniq, counts = np.asarray([], object), np.asarray([], np.int64)
        return pd.DataFrame(
            {
                "token": np.concatenate([uniq, np.asarray([""], object)]),
                "part_n": np.concatenate(
                    [counts.astype(np.int64), np.asarray([total], np.int64)]
                ),
            }
        )

    agg = (
        _docs(sf_dir)
        .map_batches(_exact_partial, batch_format="pandas")
        .groupby("token")
        .aggregate(Sum("part_n", alias_name="n"))
        .to_pandas()
    )
    total = int(agg.loc[agg["token"] == "", "n"].sum())
    out = agg[(agg["token"] != "") & (agg["n"] * cap > total)]
    return (
        out[["token", "n"]]
        .astype({"n": np.int64})
        .sort_values("token")
        .reset_index(drop=True)
    )


# ------------------------------------ snapshot diff + global outlier filter

OUTLIER_PM = 990  #: outlier = row strictly above the exact p99 value


def delta_new_documents(sf_dir: str):
    """Incremental-crawl snapshot diff: content-new docs of the 'new'
    snapshot (odd doc_id) whose rolling fingerprint is absent from the
    'old' snapshot (even doc_id).  The old-side fp set is built remotely
    from the dataset's own block refs and broadcast as ONE sorted numpy
    array (zero-copy searchsorted probe per batch) — the continuous-
    ingestion dedup shape; at 10^12 docs the sorted array becomes
    per-key-range shards with the probe unchanged."""
    import ray

    from .functions.text import rolling_fingerprint_batch
    from .stages.dedup import _remote_sorted_column

    def _fp_snapshot(parity: int):
        def _f(df: pd.DataFrame) -> pd.DataFrame:
            ids = df["doc_id"].to_numpy(np.int64)
            sub = df.loc[ids % 2 == parity]
            return pd.DataFrame(
                {
                    "doc_id": sub["doc_id"].to_numpy(np.int64),
                    "fp": rolling_fingerprint_batch(sub["text"]).astype(np.int64),
                }
            )

        return _f

    old = _docs(sf_dir).map_batches(_fp_snapshot(0), batch_format="pandas")
    old_ref = _remote_sorted_column(old, "fp")
    new = _docs(sf_dir).map_batches(_fp_snapshot(1), batch_format="pandas")

    def _probe(t: pa.Table) -> pa.Table:
        s = ray.get(old_ref)
        fp = np.asarray(t["fp"].to_numpy(zero_copy_only=False), np.int64)
        pos = np.searchsorted(s, fp)
        ok = pos < len(s)
        dup = np.zeros(len(fp), bool)
        dup[ok] = s[pos[ok]] == fp[ok]
        return t.filter(pa.array(~dup))

    return new.map_batches(_probe, batch_format="pyarrow")


def orders_price_outliers(sf_dir: str):
    """Rows above the EXACT global p99 (same integer percentile rule as
    orders_price_percentiles): pass 1 = bounded coarse histogram
    (cents >> 16, domain/2^16 bins) via per-batch partials + Sum; pass 2
    re-streams only the one target bin's values (<= 2^16 distinct, so the
    partials reduce driver-side within a constant bound); pass 3 streams
    the filter.  Driver state is bounded by the value domain shift, never
    row count."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def _cents_col(t: pa.Table) -> np.ndarray:
        return np.floor(
            np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64)
            * 100.0
            + 0.5
        ).astype(np.int64)

    def _coarse(t: pa.Table) -> pa.Table:
        b = _cents_col(t) >> COARSE_CENTS_SHIFT
        ub, inv = np.unique(b, return_inverse=True)
        return pa.table(
            {"bin": pa.array(ub), "part_n": pa.array(np.bincount(inv).astype(np.int64))}
        )

    hist = (
        orders.map_batches(_coarse, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("part_n", alias_name="n"))
        .to_pandas()
        .sort_values("bin")
    )
    n = int(hist["n"].sum())
    need = (OUTLIER_PM * n + 999) // 1000
    cum = hist["n"].cumsum().to_numpy(np.int64)
    i = int(np.searchsorted(cum, need))
    target_bin = int(hist["bin"].to_numpy(np.int64)[i])
    resid = need - (int(cum[i - 1]) if i else 0)

    def _fine(t: pa.Table) -> pa.Table:
        c = _cents_col(t)
        c = c[(c >> COARSE_CENTS_SHIFT) == target_bin]
        ub, inv = np.unique(c, return_inverse=True)
        return pa.table(
            {"cents": pa.array(ub), "part_n": pa.array(np.bincount(inv).astype(np.int64))}
        )

    # <= 2^16 distinct values in the target bin: partials are tiny and
    # reduce driver-side inside that constant bound (NOT a Ray groupby —
    # cents cardinality would pay the per-group dispatch cost)
    fine = (
        orders.map_batches(_fine, batch_format="pyarrow")
        .to_pandas()
        .groupby("cents", sort=True)["part_n"]
        .sum()
    )
    fcum = fine.cumsum().to_numpy(np.int64)
    thr = int(fine.index.to_numpy(np.int64)[int(np.searchsorted(fcum, resid))])

    def _filter(t: pa.Table) -> pa.Table:
        c = _cents_col(t)
        keep = c > thr
        return pa.table(
            {
                "o_orderkey": pa.array(
                    np.asarray(t["o_orderkey"].to_numpy(zero_copy_only=False), np.int64)[
                        keep
                    ]
                ),
                "price_cents": pa.array(c[keep]),
            }
        )

    return orders.map_batches(_filter, batch_format="pyarrow")


# --------------------------------------- route length + buffer tile cover

TILE_COVER_BUFFER_M = 4000.0  #: half-width of the square buffer per point


def order_route_l1(sf_dir: str):
    """Per-order L1 route length over its lineitem stops in
    (l_linenumber, l_partkey) order — the trajectory-length primitive,
    EXACT in integers because the derived points live on the 125 m
    lattice (lattice-index deltas x 125).  Coarse-bucket shuffle on
    hashed orderkey, one global-sorted vectorized diff per bucket (ties
    carry identical coordinates, so order among them is irrelevant —
    (o_orderkey, l_linenumber) is NOT unique in this data)."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_partkey"])

    def _prep(t: pa.Table) -> pa.Table:
        ok = np.asarray(t["l_orderkey"].to_numpy(zero_copy_only=False), np.int64)
        ln = np.asarray(t["l_linenumber"].to_numpy(zero_copy_only=False), np.int64)
        pk = np.asarray(t["l_partkey"].to_numpy(zero_copy_only=False), np.int64)
        return pa.table(
            {
                "bucket": pa.array(((ok * 2654435761) % 4294967296) % SESSION_BUCKETS),
                "l_orderkey": pa.array(ok),
                "ln": pa.array(ln),
                "pk": pa.array(pk),
                "ix": pa.array((ok * 131 + ln * 17) % 4096),
                "iy": pa.array((ok * 241 + pk * 13) % 4096),
            }
        )

    def _route(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["l_orderkey", "ln", "pk"], kind="mergesort")
        ok = g["l_orderkey"].to_numpy(np.int64)
        ix = g["ix"].to_numpy(np.int64)
        iy = g["iy"].to_numpy(np.int64)
        same = np.zeros(len(ok), bool)
        same[1:] = ok[1:] == ok[:-1]
        step = np.zeros(len(ok), np.int64)
        step[1:] = np.abs(np.diff(ix)) + np.abs(np.diff(iy))
        step[~same] = 0
        uk, inv = np.unique(ok, return_inverse=True)
        path = np.zeros(len(uk), np.int64)
        np.add.at(path, inv, step)
        n = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        return pd.DataFrame(
            {"l_orderkey": uk, "path_m": path * 125, "n_stops": n}
        )

    return (
        li.map_batches(_prep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_route, batch_format="pandas")
    )


def tile_cover_lineitem(sf_dir: str):
    """Vector buffer -> raster tile cover (the flat-map row-expansion
    shape): each derived point's +-buffer square expands to every
    overlapped ZXY tile, fully vectorized (np.repeat + within-point
    offset arithmetic, no Python loop).  Streaming, zero shuffle."""
    from .functions.tiles import tile_assign
    from .pipelines.spatial import derive_uniform_points

    B = TILE_COVER_BUFFER_M
    pts = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_partkey"]
    ).map_batches(derive_uniform_points, batch_format="pyarrow")

    def _cover(t: pa.Table) -> pa.Table:
        qid = np.asarray(t["query_id"].to_numpy(zero_copy_only=False), np.int64)
        qx = np.asarray(t["qx"].to_numpy(zero_copy_only=False), np.float64)
        qy = np.asarray(t["qy"].to_numpy(zero_copy_only=False), np.float64)
        # ty grows as latitude falls: ty_min comes from y+B, ty_max from y-B
        tx0, ty0 = tile_assign(qx - B, qy + B)
        tx1, ty1 = tile_assign(qx + B, qy - B)
        cx = tx1 - tx0 + 1
        cy = ty1 - ty0 + 1
        reps = cx * cy
        idx = np.repeat(np.arange(len(qid)), reps)
        start = np.cumsum(reps) - reps
        o = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(start, reps)
        return pa.table(
            {
                "query_id": pa.array(qid[idx]),
                "tile_x": pa.array(tx0[idx] + o // cy[idx]),
                "tile_y": pa.array(ty0[idx] + o % cy[idx]),
            }
        )

    return pts.map_batches(_cover, batch_format="pyarrow")


# ----------------------------------- JSON extraction + dataset profiling

def events_props_extract(sf_dir: str):
    """Semi-structured extraction: parse the integer ``k`` out of the
    JSON ``props`` column (vectorized RE2 extract_regex — equivalent to
    JSON-path $.k on this shape) and aggregate per event type.  The
    oracle uses DuckDB's real json_extract_string, so the engine's
    extraction is checked against true JSON semantics, not just the
    regex."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Max, Sum

    ev = _read(sf_dir, "events", columns=["event_type", "props"])

    def _k(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["props"].combine_chunks(), r'"k":\s*(?P<k>\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return pa.table({"event_type": t["event_type"], "k": k})

    return (
        ev.map_batches(_k, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n"),
            Sum("k", alias_name="k_sum"),
            Max("k", alias_name="k_max"),
        )
    )


PROFILE_COLS = ("o_orderkey", "o_custkey", "o_totalprice")


def orders_profile(sf_dir: str) -> pd.DataFrame:
    """Dataset-profile ('describe') operator: one streaming pass emits a
    per-(batch, column) stats row — count, nulls, integer min/max (price
    as cents) — merged by a bounded groupby (groups = column count)."""
    from ray.data.aggregate import Max, Min, Sum

    orders = _read(sf_dir, "orders", columns=list(PROFILE_COLS))

    def _partial(t: pa.Table) -> pa.Table:
        names, ns, nulls, mins, maxs = [], [], [], [], []
        for c in PROFILE_COLS:
            arr = t[c]
            v = np.asarray(arr.to_numpy(zero_copy_only=False))
            if c == "o_totalprice":
                v = np.floor(v.astype(np.float64) * 100.0 + 0.5).astype(np.int64)
            else:
                v = v.astype(np.int64)
            null_n = int(arr.null_count)
            names.append(c)
            ns.append(len(v))
            nulls.append(null_n)
            mins.append(int(v.min()) if len(v) else np.iinfo(np.int64).max)
            maxs.append(int(v.max()) if len(v) else np.iinfo(np.int64).min)
        return pa.table(
            {
                "col_name": pa.array(names, pa.string()),
                "part_n": pa.array(ns, pa.int64()),
                "part_null": pa.array(nulls, pa.int64()),
                "part_min": pa.array(mins, pa.int64()),
                "part_max": pa.array(maxs, pa.int64()),
            }
        )

    out = (
        orders.map_batches(_partial, batch_format="pyarrow")
        .groupby("col_name")
        .aggregate(
            Sum("part_n", alias_name="n"),
            Sum("part_null", alias_name="n_null"),
            Min("part_min", alias_name="min_v"),
            Max("part_max", alias_name="max_v"),
        )
        .to_pandas()
    )
    for c in ("n", "n_null", "min_v", "max_v"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("col_name").reset_index(drop=True)


# ------------------------------ time-partition pruning + CDC upsert/merge

PRUNED_DAYS = 2
UPSERT_PCT = 20           #: percent of keys receiving a v2 update
UPSERT_BUMP_CENTS = 1000


def _events_day_store(sf_dir: str) -> str:
    """One-time day-partitioned events store under /tmp (cached per row
    count; deterministic content) — the time-partitioned ingest layout a
    100 TB event pipeline writes once so every later read prunes at path
    selection."""
    import os
    import shutil

    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    n = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    tag = os.path.basename(os.path.normpath(sf_dir))
    out = f"/tmp/graft_events_days/{tag}_n{n}"
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    def _day(t: pa.Table) -> pa.Table:
        d = pc.strftime(pc.floor_temporal(t["ts"], unit="day"), format="%Y-%m-%d")
        return t.append_column("day", d)

    (
        rd.read_parquet(f"{sf_dir}/events.parquet")
        .map_batches(_day, batch_format="pyarrow")
        .write_parquet(out, partition_cols=["day"])
    )
    with open(marker, "w", encoding="utf-8") as fh:
        fh.write(str(n))
    return out


def events_recent_pruned(sf_dir: str, days: int = PRUNED_DAYS):
    """Time-partition-pruned read: glob ONLY the trailing ``days``
    ``day=`` partition directories (path-level pruning — other days'
    bytes never leave storage), then a bounded per-(day, type)
    aggregate.  The partition field is recovered via ``Partitioning``
    — a ``filter=`` on a partition-path field fails (fragment schema
    lacks it; CLAUDE rule)."""
    import glob
    import os

    import ray.data as rd
    from ray.data.aggregate import Count, Sum
    from ray.data.datasource.partitioning import Partitioning

    store = _events_day_store(sf_dir)
    all_days = sorted(
        os.path.basename(p).split("=", 1)[1] for p in glob.glob(f"{store}/day=*")
    )
    keep = all_days[-days:]
    paths = [f for d in keep for f in sorted(glob.glob(f"{store}/day={d}/*.parquet"))]
    ds = rd.read_parquet(
        paths,
        partitioning=Partitioning("hive", base_dir=store, field_types={"day": str}),
    )

    def _cents(t: pa.Table) -> pa.Table:
        v = np.floor(
            np.asarray(t["value"].to_numpy(zero_copy_only=False), np.float64) * 100.0
            + 0.5
        ).astype(np.int64)
        return pa.table(
            {"day": t["day"], "event_type": t["event_type"], "cents": pa.array(v)}
        )

    return (
        ds.map_batches(_cents, batch_format="pyarrow")
        .groupby(["day", "event_type"])
        .aggregate(Count(alias_name="n"), Sum("cents", alias_name="value_cents"))
    )


def orders_upsert(sf_dir: str):
    """MERGE / upsert as an operator: a deterministic CDC update set
    (UPSERT_PCT% of keys by the shared multiplicative hash, price bumped
    by UPSERT_BUMP_CENTS, version 2) applied over the base snapshot
    (version 1) with last-writer-wins per key — union + ONE coarse
    hash-bucket shuffle + vectorized per-bucket max-version keep."""
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def _rows(version: int):
        def _f(t: pa.Table) -> pa.Table:
            k = np.asarray(t["o_orderkey"].to_numpy(zero_copy_only=False), np.int64)
            cents = np.floor(
                np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64)
                * 100.0
                + 0.5
            ).astype(np.int64)
            if version == 2:
                keep = ((k * 2654435761) % 4294967296) % 100 < UPSERT_PCT
                k, cents = k[keep], cents[keep] + UPSERT_BUMP_CENTS
            return pa.table(
                {
                    "bucket": pa.array(((k * 2654435761) % 4294967296) % SESSION_BUCKETS),
                    "o_orderkey": pa.array(k),
                    "version": pa.array(np.full(len(k), version, np.int64)),
                    "price_cents": pa.array(cents),
                }
            )

        return _f

    u = orders.map_batches(_rows(1), batch_format="pyarrow").union(
        orders.map_batches(_rows(2), batch_format="pyarrow")
    )

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_orderkey", "version"], kind="mergesort")
        g = g.drop_duplicates("o_orderkey", keep="last")
        return g[["o_orderkey", "version", "price_cents"]].astype(np.int64)

    return u.groupby("bucket").map_groups(_merge, batch_format="pandas")


# ----------------------------- windowed event dedup + token co-occurrence

COOC_TOP = 20  #: co-occurrence vocabulary: top-K histogram tokens


def events_dedup_hourly(sf_dir: str):
    """Streaming duplicate suppression: keep the FIRST event per
    (user_id, event_type, hour) by (ts, event_id) — the at-least-once
    ingestion dedup shape.  One coarse-bucket shuffle on hashed user_id,
    vectorized sort + drop_duplicates per bucket."""
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])

    def _bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        u = np.asarray(t["user_id"].to_numpy(zero_copy_only=False), np.int64)
        hour = pc.strftime(
            pc.floor_temporal(t["ts"], unit="hour"), format="%Y-%m-%d %H"
        )
        return pa.table(
            {
                "bucket": pa.array(((u * 2654435761) % 4294967296) % SESSION_BUCKETS),
                "user_id": pa.array(u),
                "event_type": t["event_type"],
                "hour": hour,
                "ts": t["ts"],
                "event_id": t["event_id"],
            }
        )

    def _first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_type", "hour", "ts", "event_id"], kind="mergesort")
        g = g.drop_duplicates(["user_id", "event_type", "hour"], keep="first")
        return g[["event_id", "user_id", "event_type", "hour"]].astype(
            {"event_id": np.int64, "user_id": np.int64}
        )

    return (
        ev.map_batches(_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_first, batch_format="pandas")
    )


def token_cooccurrence(sf_dir: str, topk: int = COOC_TOP):
    """Document co-occurrence counts for the top-K vocabulary (the PMI /
    embedding-prep primitive): phase 1 reuses the distributed token
    histogram for the K tokens; phase 2 folds each batch into ONE K x K
    int64 matrix partial (per-doc membership bitmap -> one matmul) merged
    by a tiny AggregateFn — the shuffle carries K^2 integers, never
    pairs.  The incidence build is one explode + searchsorted + fancy
    assignment per batch (assignment dedupes repeated (doc, token) hits);
    measured 0.15 s -> 0.08 s post-tokenize on a 4000-doc sf0.01 batch vs
    the old per-row zeros(K) loop (tokenize itself is 0.07 s and
    inherently per-doc)."""
    from ray.data.aggregate import AggregateFn

    from .functions.text import ws_tokens

    hist = token_histogram(sf_dir, k=topk).to_pandas()
    vocab = np.sort(hist["token"].to_numpy(object))
    K = len(vocab)

    def _acc_block(acc: np.ndarray, block) -> np.ndarray:
        df = block if hasattr(block, "iterrows") else block.to_pandas()
        toks_per_doc = [ws_tokens(s.lower()) for s in df["text"]]
        n = len(toks_per_doc)
        if n == 0:
            return acc
        lens = np.fromiter((len(t) for t in toks_per_doc), np.int64, count=n)
        total = int(lens.sum())
        if total == 0:
            return acc
        flat = np.empty(total, object)
        i = 0
        for ts in toks_per_doc:
            flat[i : i + len(ts)] = ts
            i += len(ts)
        owner = np.repeat(np.arange(n), lens)
        pos = np.searchsorted(vocab, flat)
        pos[pos == K] = 0
        hit = vocab[pos] == flat
        M = np.zeros((n, K), np.int64)
        M[owner[hit], pos[hit]] = 1
        return acc + M.T @ M

    agg = AggregateFn(
        init=lambda k: np.zeros((K, K), np.int64),
        merge=lambda a, b: a + b,
        accumulate_block=_acc_block,
        name="cooc",
    )
    res = _docs(sf_dir).aggregate(agg)
    M = np.asarray(res["cooc"], np.int64)
    ia, ib = np.triu_indices(K, k=1)
    n = M[ia, ib]
    keep = n > 0
    return pd.DataFrame(
        {
            "token_a": vocab[ia[keep]],
            "token_b": vocab[ib[keep]],
            "n_docs": n[keep].astype(np.int64),
        }
    ).sort_values(["token_a", "token_b"]).reset_index(drop=True)


# ----------------------------------------- fuzzy-key linkage (SymSpell)

def name_typo_pairs(sf_dir: str):
    """Fuzzy-key record linkage (SymSpell / deletion-neighborhood
    blocking): distinct lowered customer names expand to their 1-deletion
    variants (+ identity); candidate pairs come only from shared variants
    — COMPLETE for edit distance <= 1 — then an exact vectorized
    Levenshtein verify filters distance-2 accidentals.  The variant
    kernel loops over POSITIONS (bounded by name length), never rows;
    cross-bucket duplicate candidates die in a second bucketed shuffle
    keyed on the pair."""
    from .functions.scoring import levenshtein_batch

    cust = _read(sf_dir, "customer", columns=["c_name"])

    def _variants(t: pa.Table) -> pd.DataFrame:
        s = pd.Series(t["c_name"].to_pandas()).str.lower()
        maxlen = int(s.str.len().max()) if len(s) else 0
        frames = [pd.DataFrame({"t": s, "v": s})]
        for i in range(maxlen):
            sub = s[s.str.len() > i]
            frames.append(
                pd.DataFrame({"t": sub, "v": sub.str.slice(0, i) + sub.str.slice(i + 1)})
            )
        out = pd.concat(frames, ignore_index=True)
        out["bucket"] = _crc_bucket(out["v"].to_numpy(object))
        return out

    _EMPTY = {"pbucket": "int64", "ta": "object", "tb": "object"}

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="v")
        m = m[m["t_x"] < m["t_y"]]
        if m.empty:
            return pd.DataFrame({k: pd.array([], v) for k, v in _EMPTY.items()})
        m = m.drop_duplicates(["t_x", "t_y"])
        key = (m["t_x"] + "\x00" + m["t_y"]).to_numpy(object)
        return pd.DataFrame(
            {
                "pbucket": _crc_bucket(key),
                "ta": m["t_x"].to_numpy(object),
                "tb": m["t_y"].to_numpy(object),
            }
        )

    def _verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["ta", "tb"])
        d = levenshtein_batch(g["ta"].to_numpy(object), g["tb"].to_numpy(object))
        return g.loc[d <= 1, ["ta", "tb"]]

    return (
        cust.map_batches(_variants, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_pairs, batch_format="pandas")
        .groupby("pbucket")
        .map_groups(_verify, batch_format="pandas")
    )


# ------------------------------------------------ global per-row ranking

def orders_price_rank(sf_dir: str):
    """Global per-row RANK (ties = min) by price cents — the distributed
    rank-assignment shape: ONE bucketed value-histogram reduce (bounded
    by DISTINCT values, never rows), the (values, counts) table unioned
    remotely into a sorted broadcast, then a streaming searchsorted rank
    per batch.  No global sort of the data itself."""
    import ray

    from .stages.dedup import _sorted_kv_task

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def _cents_col(t: pa.Table) -> np.ndarray:
        return np.floor(
            np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64)
            * 100.0
            + 0.5
        ).astype(np.int64)

    def _partial(t: pa.Table) -> pa.Table:
        c = _cents_col(t)
        ub, inv = np.unique(c, return_inverse=True)
        return pa.table(
            {
                "bucket": pa.array(((ub * 2654435761) % 4294967296) % SESSION_BUCKETS),
                "cents": pa.array(ub),
                "part_n": pa.array(np.bincount(inv).astype(np.int64)),
            }
        )

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("cents", sort=False)["part_n"].sum()
        return pd.DataFrame(
            {"cents": s.index.to_numpy(np.int64), "n": s.to_numpy(np.int64)}
        )

    hist = (
        orders.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_reduce, batch_format="pandas")
    )
    refs = [br for b in hist.iter_internal_ref_bundles() for br in b.block_refs]
    kv_ref = _sorted_kv_task.remote(refs, "cents", "n")

    def _rank(t: pa.Table) -> pa.Table:
        vals, counts = ray.get(kv_ref)  # zero-copy views
        cum_excl = np.cumsum(counts) - counts
        c = _cents_col(t)
        r = cum_excl[np.searchsorted(vals, c)] + 1
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "price_cents": pa.array(c),
                "rank": pa.array(r.astype(np.int64)),
            }
        )

    return orders.map_batches(_rank, batch_format="pyarrow")


# --------------------- graph triangles / table checksum / grouped median

def supplier_degree_histogram(sf_dir: str) -> pd.DataFrame:
    """Degree distribution of the supplier co-occurrence graph: distinct
    (order, supplier) incidence -> per-order distinct co-supply edges
    (bucketed vectorized merge) -> global edge dedup (second bucketed
    reduce) -> per-supplier degree -> histogram.  Driver sees only the
    edge list, bounded by supplier-pair cardinality (never input rows)."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])

    def _inc(t: pa.Table) -> pd.DataFrame:
        ok = np.asarray(t["l_orderkey"].to_numpy(zero_copy_only=False), np.int64)
        sk = np.asarray(t["l_suppkey"].to_numpy(zero_copy_only=False), np.int64)
        # deterministic 1/10 order sample keeps the co-supply graph sparse
        # enough for a non-degenerate degree distribution at small scale
        keep = ok % 10 == 0
        ok, sk = ok[keep], sk[keep]
        assert len(sk) == 0 or sk.max() < SUPP_PACK, "widen SUPP_PACK"
        key = ok * SUPP_PACK + sk
        u = np.unique(key)
        ok_u, sk_u = u // SUPP_PACK, u % SUPP_PACK
        return pd.DataFrame(
            {
                "bucket": ((ok_u * 2654435761) % 4294967296) % SESSION_BUCKETS,
                "ok": ok_u,
                "sk": sk_u,
            }
        )

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["ok", "sk"])
        m = g.merge(g, on="ok")
        m = m[m["sk_x"] < m["sk_y"]]
        m = m.drop_duplicates(["sk_x", "sk_y"])
        pk = m["sk_x"].to_numpy(np.int64) * SUPP_PACK + m["sk_y"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "pbucket": ((pk * 2654435761) % 4294967296) % SESSION_BUCKETS,
                "sa": m["sk_x"].to_numpy(np.int64),
                "sb": m["sk_y"].to_numpy(np.int64),
            }
        )

    def _dedup(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["sa", "sb"])
        return pd.DataFrame(
            {"sa": g["sa"].to_numpy(np.int64), "sb": g["sb"].to_numpy(np.int64)}
        )

    edges = (
        li.map_batches(_inc, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_pairs, batch_format="pandas")
        .groupby("pbucket")
        .map_groups(_dedup, batch_format="pandas")
        .to_pandas()
    )
    deg = (
        pd.concat([edges["sa"], edges["sb"]])
        .value_counts()
        .to_numpy(np.int64)
    )
    uniq, counts = np.unique(deg, return_counts=True)
    return pd.DataFrame(
        {
            "degree": pd.array(uniq, "int64"),
            "n_suppliers": pd.array(counts.astype(np.int64), "int64"),
        }
    )


def supplier_triangles(sf_dir: str) -> pd.DataFrame:
    """Triangle count over the supplier co-occurrence graph (the graph-
    analytics staple): distinct (order, supplier) incidence -> per-order
    supplier pairs (orders co-located per bucket, vectorized merge) ->
    global pair weights via a second bucketed reduce (shared
    _cosupply_weights pipeline) -> edges = pairs STRICTLY above the
    data-derived median weight (the shared integer percentile rule, so
    the op self-calibrates across scales) -> exact triangle count as
    trace(A^3)/6 over the supplier-bounded adjacency.  Shuffles are
    bounded by incidence and supplier-pair cardinality; only the tiny
    weights table ever reaches the driver."""
    w = _cosupply_weights(sf_dir)
    ws = np.sort(w["wt"].to_numpy(np.int64))
    need = (500 * len(ws) + 999) // 1000
    thr = int(ws[need - 1]) if len(ws) else 0
    e = w[w["wt"] > thr]
    nodes = np.unique(np.concatenate([e["sa"].to_numpy(np.int64), e["sb"].to_numpy(np.int64)]))
    A = np.zeros((max(len(nodes), 1), max(len(nodes), 1)), np.int64)
    ia = np.searchsorted(nodes, e["sa"].to_numpy(np.int64))
    ib = np.searchsorted(nodes, e["sb"].to_numpy(np.int64))
    A[ia, ib] = 1
    A[ib, ia] = 1
    Af = A.astype(np.float64)
    tri = int(np.trace(Af @ Af @ Af) / 6.0 + 0.5)
    return pd.DataFrame(
        {
            "threshold_w": np.asarray([thr], np.int64),
            "n_edges": np.asarray([len(e)], np.int64),
            "n_triangles": np.asarray([tri], np.int64),
        }
    )


CHECKSUM_K = 1000003
CHECKSUM_M = 2147483629


def orders_table_checksum(sf_dir: str) -> pd.DataFrame:
    """Order-independent table checksum (replication / anti-entropy
    verification): per-row polynomial hash of (key, price cents) mod the
    SQL-replicable prime, summed by a plain commutative Sum — one
    streaming pass, constant driver state."""
    from ray.data.aggregate import Count, Sum

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def _h(t: pa.Table) -> pa.Table:
        k = np.asarray(t["o_orderkey"].to_numpy(zero_copy_only=False), np.int64)
        cents = np.floor(
            np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64)
            * 100.0
            + 0.5
        ).astype(np.int64)
        h = ((k % CHECKSUM_M) * CHECKSUM_K + cents % CHECKSUM_M) % CHECKSUM_M
        return pa.table({"h": pa.array(h)})

    agg = orders.map_batches(_h, batch_format="pyarrow").aggregate(
        Count(alias_name="n_rows"), Sum("h", alias_name="checksum")
    )
    return pd.DataFrame(
        {
            "n_rows": np.asarray([int(agg["n_rows"])], np.int64),
            "checksum": np.asarray([int(agg["checksum"])], np.int64),
        }
    )


def events_hourly_median(sf_dir: str):
    """Exact per-hour median (the grouped-percentile shape with the
    shared ceil-rank rule): distinct (hour, cents) counts via a bucketed
    reduce keyed on the HOUR hash — each bucket owns whole hours, so the
    median resolves vectorized in-bucket; nothing reaches the driver."""
    import pyarrow.compute as pc

    ev = _read(sf_dir, "events", columns=["ts", "value"])

    def _partial(t: pa.Table) -> pd.DataFrame:
        hour = pc.strftime(pc.floor_temporal(t["ts"], unit="hour"), format="%Y-%m-%d %H")
        cents = np.floor(
            np.asarray(t["value"].to_numpy(zero_copy_only=False), np.float64) * 100.0
            + 0.5
        ).astype(np.int64)
        df = pd.DataFrame({"hour": hour.to_pandas(), "cents": cents})
        s = df.groupby(["hour", "cents"], sort=False).size()
        idx = s.index.to_frame(index=False)
        out = pd.DataFrame(
            {
                "hour": idx["hour"].to_numpy(object),
                "cents": idx["cents"].to_numpy(np.int64),
                "part_n": s.to_numpy(np.int64),
            }
        )
        out["bucket"] = _crc_bucket(out["hour"].to_numpy(object))
        return out

    def _median(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["hour", "cents"], sort=True)["part_n"].sum().reset_index()
        rows_h, rows_m = [], []
        for h, sub in s.groupby("hour", sort=True):
            n = int(sub["part_n"].sum())
            need = (500 * n + 999) // 1000
            cum = sub["part_n"].cumsum().to_numpy(np.int64)
            v = int(sub["cents"].to_numpy(np.int64)[int(np.searchsorted(cum, need))])
            rows_h.append(h)
            rows_m.append(v)
        return pd.DataFrame(
            {"hour": np.asarray(rows_h, object), "p50_cents": np.asarray(rows_m, np.int64)}
        )

    return (
        ev.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_median, batch_format="pandas")
    )


# ------------------------------------------- event transition counting

def event_transitions(sf_dir: str):
    """Markov transition counts (prev_type -> next_type) over each
    user's (ts, event_id)-ordered stream — the sequence-model prep op.
    Coarse-bucket shuffle on hashed user, vectorized in-bucket sort +
    shift, per-bucket partial counts, then a BOUNDED (type x type)
    Ray Sum merge."""
    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])

    def _bucket(t: pa.Table) -> pa.Table:
        u = np.asarray(t["user_id"].to_numpy(zero_copy_only=False), np.int64)
        return t.append_column(
            "bucket", pa.array(((u * 2654435761) % 4294967296) % SESSION_BUCKETS)
        )

    def _trans(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        et = g["event_type"].to_numpy(object)
        same = np.zeros(len(u), bool)
        same[1:] = u[1:] == u[:-1]
        prev = np.roll(et, 1)
        df = pd.DataFrame({"prev_type": prev[same], "next_type": et[same]})
        s = df.groupby(["prev_type", "next_type"], sort=False).size()
        idx = s.index.to_frame(index=False)
        return pd.DataFrame(
            {
                "prev_type": idx["prev_type"].to_numpy(object),
                "next_type": idx["next_type"].to_numpy(object),
                "part_n": s.to_numpy(np.int64),
            }
        )

    return (
        ev.map_batches(_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_trans, batch_format="pandas")
        .groupby(["prev_type", "next_type"])
        .aggregate(Sum("part_n", alias_name="n"))
    )


# ----------------------- flagship composition: geocoded pages -> tiles

def geocode_pages_tile_counts(sf_dir: str):
    """The north-star composition end to end: Common-Crawl-style pages ->
    RE2 address extraction -> cleanse/standardize -> broadcast matcher ->
    MATCHED points -> ZXY web-mercator tile assignment -> per-tile
    counts.  One fused streaming chain into a bounded tile aggregate —
    the 'join output rows AND tile assignments' contract as a single
    oracle-checked query."""
    from ray.data.aggregate import Sum

    from .functions.tiles import tile_assign
    from .pipelines.geocode import geocode_pages
    from .sources.pages import generate_pages_dataset

    pages = generate_pages_dataset(2 * _nrows(sf_dir, "orders"))
    out = geocode_pages(pages, PipelineConfig())

    def _tiles(t: pa.Table) -> pa.Table:
        score = np.asarray(t["score"].to_numpy(zero_copy_only=False), np.int64)
        m = score > 0
        tx, ty = tile_assign(
            np.asarray(t["x"].to_numpy(zero_copy_only=False), np.float64)[m],
            np.asarray(t["y"].to_numpy(zero_copy_only=False), np.float64)[m],
        )
        key = tx * (1 << 22) + ty  # zoom-12 tiles: ty < 2^22, packing exact
        ub, inv = np.unique(key, return_inverse=True)
        return pa.table(
            {
                "tile_x": pa.array(ub >> 22),
                "tile_y": pa.array(ub & ((1 << 22) - 1)),
                "part_n": pa.array(np.bincount(inv).astype(np.int64)),
            }
        )

    return (
        out.map_batches(_tiles, batch_format="pyarrow")
        .groupby(["tile_x", "tile_y"])
        .aggregate(Sum("part_n", alias_name="n"))
    )


# ------------------------------------------------------ JSONL source path

def _documents_jsonl_store(sf_dir: str) -> str:
    """One-time JSONL mirror of the documents table under /tmp (cached
    per row count) — exercises the newline-delimited-JSON ingestion path
    crawl dumps arrive in."""
    import os

    import pyarrow.parquet as pq

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    tag = os.path.basename(os.path.normpath(sf_dir))
    # n is NOT unique across sf dirs (sf0.001 and sf0.01 both hold 500
    # docs) — key the cache by the directory name too
    out = f"/tmp/graft_documents_jsonl/{tag}_n{n}"
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    import shutil

    import ray.data as rd

    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    rd.read_parquet(f"{sf_dir}/documents.parquet").write_json(out)
    with open(marker, "w", encoding="utf-8") as fh:
        fh.write(str(n))
    return out


def token_count_documents_jsonl(sf_dir: str):
    """S-source variant: the token-count op over a JSONL (newline-
    delimited JSON) mirror of the corpus — same oracle as the parquet
    path, proving the source format is output-invisible."""
    import glob

    import ray.data as rd

    from .functions.text import token_count

    store = _documents_jsonl_store(sf_dir)
    paths = sorted(glob.glob(f"{store}/*.json"))
    ds = rd.read_json(paths)

    def _f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "n_tokens": token_count(df["text"]),
            }
        )

    return ds.map_batches(_f, batch_format="pandas")


# --------------------------- html binary -> text extraction verification

def pages_html_extract_verify(sf_dir: str):
    """The input_hint invariant as a distributed op: decode the ``html``
    BINARY column, re-run the frozen text extractor as vectorized RE2
    kernels (tag strip -> whitespace collapse -> trim), and verify
    byte-identity against the stored ``text`` per url — one streaming
    pass, a 1-row Sum merge.  The oracle regenerates the en corpus in
    SQL where text == extract(html) holds by construction, so any
    engine-side extraction drift hash-fails."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .sources.pages import generate_pages_dataset

    pages = generate_pages_dataset(2 * _nrows(sf_dir, "orders"))

    def _verify(t: pa.Table) -> pa.Table:
        m = pc.equal(t["lang"], "en")
        t = t.filter(m)
        html_str = pc.cast(t["html"].combine_chunks(), pa.string())
        s = pc.replace_substring_regex(html_str, "<[^>]*>", " ")
        s = pc.replace_substring_regex(s, "[\t\n\f\r ]+", " ")
        s = pc.utf8_trim(s, " \t\n\f\r")
        eq = pc.cast(pc.equal(s, pc.cast(t["text"].combine_chunks(), pa.string())), pa.int64())
        nchars = pc.cast(pc.utf8_length(s), pa.int64())
        return pa.table(
            {
                "part_pages": pa.array([t.num_rows], pa.int64()),
                "part_ident": pa.array([int(pc.sum(eq).as_py() or 0)], pa.int64()),
                "part_chars": pa.array([int(pc.sum(nchars).as_py() or 0)], pa.int64()),
            }
        )

    agg = pages.map_batches(_verify, batch_format="pyarrow").aggregate(
        Sum("part_pages", alias_name="n_pages"),
        Sum("part_ident", alias_name="n_identical"),
        Sum("part_chars", alias_name="total_chars"),
    )
    return pd.DataFrame(
        {
            "n_pages": np.asarray([int(agg["n_pages"])], np.int64),
            "n_identical": np.asarray([int(agg["n_identical"])], np.int64),
            "total_chars": np.asarray([int(agg["total_chars"])], np.int64),
        }
    )


# ----------------------------------------------- retention cohort matrix

def user_retention_cohorts(sf_dir: str):
    """Cohort retention matrix (cohort day = user's first active day ->
    distinct active users per (cohort, day)): ONE bucketed shuffle on
    hashed user does everything user-local (distinct days AND the min
    cohort day, vectorized), then a bounded (day x day) Sum merge."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def _days(t: pa.Table) -> pd.DataFrame:
        u = np.asarray(t["user_id"].to_numpy(zero_copy_only=False), np.int64)
        day = pc.strftime(pc.floor_temporal(t["ts"], unit="day"), format="%Y-%m-%d")
        df = pd.DataFrame({"user_id": u, "day": day.to_pandas()}).drop_duplicates()
        df["bucket"] = ((df["user_id"].to_numpy(np.int64) * 2654435761) % 4294967296) % SESSION_BUCKETS
        return df

    def _cohort_counts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "day"])
        cohort = g.groupby("user_id", sort=False)["day"].transform("min")
        s = (
            pd.DataFrame({"cohort_day": cohort, "active_day": g["day"]})
            .groupby(["cohort_day", "active_day"], sort=False)
            .size()
        )
        idx = s.index.to_frame(index=False)
        return pd.DataFrame(
            {
                "cohort_day": idx["cohort_day"].to_numpy(object),
                "active_day": idx["active_day"].to_numpy(object),
                "part_n": s.to_numpy(np.int64),
            }
        )

    return (
        ev.map_batches(_days, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_cohort_counts, batch_format="pandas")
        .groupby(["cohort_day", "active_day"])
        .aggregate(Sum("part_n", alias_name="n_users"))
    )


# -------------------------------------- distributed regression (trend)

def orders_trend_by_priority(sf_dir: str):
    """Distributed least-squares trend per priority, EXACT in integers:
    per-batch mergeable sufficient statistics (n, Sx, Sy, Sxy, Sxx) over
    (x = day index since epoch-min, y = whole-dollar price), then the
    slope reported as the exact integer pair (num, den) = (n*Sxy - Sx*Sy,
    n*Sxx - Sx^2) — no division, no float.  Bound check: every product
    stays < 2^62 for day-index x and dollar y at these scales."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", columns=["o_orderpriority", "o_orderdate", "o_totalprice"])

    def _partial(t: pa.Table) -> pd.DataFrame:
        day = pc.cast(
            pc.days_between(
                pa.scalar(pd.Timestamp("2024-01-01"), pa.timestamp("us")),
                pc.floor_temporal(t["o_orderdate"], unit="day"),
            ),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        x = np.asarray(day, np.int64)
        y = np.floor(
            np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64)
            + 0.5
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "prio": t["o_orderpriority"].to_pandas(),
                "x": x,
                "y": y,
                "xy": x * y,
                "xx": x * x,
            }
        )
        out = (
            df.groupby("prio", sort=False)
            .agg(
                n=("x", "size"),
                sx=("x", "sum"),
                sy=("y", "sum"),
                sxy=("xy", "sum"),
                sxx=("xx", "sum"),
            )
            .reset_index()
        )
        for c in ("n", "sx", "sy", "sxy", "sxx"):
            out[c] = out[c].astype(np.int64)
        return out

    agg = (
        orders.map_batches(_partial, batch_format="pyarrow")
        .groupby("prio")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxy", alias_name="sxy"),
            Sum("sxx", alias_name="sxx"),
        )
        .to_pandas()
    )
    n = agg["n"].to_numpy(np.int64)
    sx = agg["sx"].to_numpy(np.int64)
    sy = agg["sy"].to_numpy(np.int64)
    return pd.DataFrame(
        {
            "o_orderpriority": agg["prio"].to_numpy(object),
            "n": n,
            "slope_num": n * agg["sxy"].to_numpy(np.int64) - sx * sy,
            "slope_den": n * agg["sxx"].to_numpy(np.int64) - sx * sx,
        }
    ).sort_values("o_orderpriority").reset_index(drop=True)


# --------------------------- multi-dim join / bbox / melt / pagination

def q5_nation_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q5-shaped multi-way join: lineitem x orders x customer x
    supplier x nation with the local-supplier constraint
    (c_nationkey = s_nationkey), discounted revenue in integer cents.

    Join plan (the 100 TB shape): the FACT (lineitem) streams; orders
    joins via the generic hash_join operator (broadcast side picked by
    row count); the customer/supplier -> nation lookups are sorted-array
    broadcasts built remotely from block refs (driver never holds them);
    revenue pre-aggregates per batch so the final Ray groupby sees only
    ~25 nation groups."""
    import ray
    from ray.data.aggregate import Sum

    from .stages.dedup import _sorted_kv_task
    from .stages.join import hash_join

    li = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]).map_batches(
        lambda t: t.rename_columns(["l_orderkey", "o_custkey"]), batch_format="pyarrow"
    )
    joined = hash_join(
        li, orders, "l_orderkey", ["o_custkey"], right_rows=_nrows(sf_dir, "orders")
    )

    def _nat_lookup(table: str, key: str, val: str):
        ds = _read(sf_dir, table, columns=[key, val]).map_batches(
            lambda t, k=key, v=val: pa.table(
                {
                    "k": pa.array(np.asarray(t[k].to_numpy(zero_copy_only=False), np.int64)),
                    "v": pa.array(np.asarray(t[v].to_numpy(zero_copy_only=False), np.int64)),
                }
            ),
            batch_format="pyarrow",
        )
        refs = [br for b in ds.iter_internal_ref_bundles() for br in b.block_refs]
        return _sorted_kv_task.remote(refs, "k", "v")

    cust_ref = _nat_lookup("customer", "c_custkey", "c_nationkey")
    supp_ref = _nat_lookup("supplier", "s_suppkey", "s_nationkey")

    def _partial(t: pa.Table) -> pa.Table:
        ck, cn = ray.get(cust_ref)  # zero-copy sorted (keys, vals)
        sk, sn = ray.get(supp_ref)
        cust = np.asarray(t["o_custkey"].to_numpy(zero_copy_only=False), np.int64)
        supp = np.asarray(t["l_suppkey"].to_numpy(zero_copy_only=False), np.int64)
        c_nat = cn[np.searchsorted(ck, cust)]
        s_nat = sn[np.searchsorted(sk, supp)]
        keep = c_nat == s_nat
        price = np.asarray(t["l_extendedprice"].to_numpy(zero_copy_only=False), np.float64)[keep]
        disc = np.asarray(t["l_discount"].to_numpy(zero_copy_only=False), np.float64)[keep]
        cents = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        nat = c_nat[keep]
        uniq, inv = np.unique(nat, return_inverse=True)
        return pa.table(
            {
                "n_nationkey": pa.array(uniq, pa.int64()),
                "part_n": pa.array(np.bincount(inv).astype(np.int64)),
                "part_cents": pa.array(np.bincount(inv, weights=cents.astype(np.float64)).astype(np.int64)),
            }
        )

    agg = (
        joined.map_batches(_partial, batch_format="pyarrow")
        .groupby("n_nationkey")
        .aggregate(Sum("part_n", alias_name="n"), Sum("part_cents", alias_name="revenue_cents"))
        .to_pandas()
    )
    import pyarrow.parquet as pq

    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]).to_pandas()
    nat["n_nationkey"] = nat["n_nationkey"].astype(np.int64)
    out = agg.merge(nat, on="n_nationkey")[["n_name", "n", "revenue_cents"]]
    out["n"] = out["n"].astype(np.int64)
    out["revenue_cents"] = out["revenue_cents"].astype(np.int64)
    return out.sort_values("n_name").reset_index(drop=True)


#: customer lattice point multipliers (mirrors the lineitem lattice in
#: pipelines/spatial.py derive_uniform_points; 125 m pitch, 4096 cells)
BBOX_MULT_X = 131
BBOX_MULT_Y = 241


def customer_nation_bbox(sf_dir: str) -> pd.DataFrame:
    """Spatial extent aggregate (the ST_Extent analog): per-nation
    bounding box + point count over customer-derived lattice points.
    Per-batch partial min/max/count per nation (pandas groupby inside the
    batch), then a bounded Ray groupby (~25 nations) merges partials;
    the affine lattice->meters projection is applied once at the end, so
    everything that aggregates is exact int64."""
    from ray.data.aggregate import Max, Min, Sum

    from .functions.cells import X0, Y0

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    def _partial(t: pa.Table) -> pd.DataFrame:
        ck = np.asarray(t["c_custkey"].to_numpy(zero_copy_only=False), np.int64)
        nk = np.asarray(t["c_nationkey"].to_numpy(zero_copy_only=False), np.int64)
        ix = (ck * BBOX_MULT_X) % 4096
        iy = (ck * BBOX_MULT_Y) % 4096
        df = pd.DataFrame({"n_nationkey": nk, "ix": ix, "iy": iy})
        out = (
            df.groupby("n_nationkey", sort=False)
            .agg(
                part_n=("ix", "size"),
                min_ix=("ix", "min"),
                max_ix=("ix", "max"),
                min_iy=("iy", "min"),
                max_iy=("iy", "max"),
            )
            .reset_index()
        )
        return out.astype({c: np.int64 for c in out.columns})

    agg = (
        cust.map_batches(_partial, batch_format="pyarrow")
        .groupby("n_nationkey")
        .aggregate(
            Sum("part_n", alias_name="n_points"),
            Min("min_ix", alias_name="min_ix"),
            Max("max_ix", alias_name="max_ix"),
            Min("min_iy", alias_name="min_iy"),
            Max("max_iy", alias_name="max_iy"),
        )
        .to_pandas()
    )
    import pyarrow.parquet as pq

    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]).to_pandas()
    nat["n_nationkey"] = nat["n_nationkey"].astype(np.int64)
    out = agg.merge(nat, on="n_nationkey")
    out["n_points"] = out["n_points"].astype(np.int64)
    from .functions.cells import EXTENT

    step = EXTENT / 4096  # shared grid constants, same as the oracle SQL
    for src, dst, origin in (
        ("min_ix", "min_x", X0),
        ("max_ix", "max_x", X0),
        ("min_iy", "min_y", Y0),
        ("max_iy", "max_y", Y0),
    ):
        out[dst] = origin + out[src].to_numpy(np.int64).astype(np.float64) * step
    cols = ["n_nationkey", "n_name", "n_points", "min_x", "max_x", "min_y", "max_y"]
    return out[cols].sort_values("n_nationkey").reset_index(drop=True)


def events_melt(sf_dir: str):
    """UNPIVOT / melt: the wide per-user event-count crosstab
    (user_event_pivot) flattened back to long (user_id, event_type, n)
    rows, zero-count cells dropped.  The melt itself is one
    np.repeat/tile pass per batch — wide->long as a streaming batch
    transform, no shuffle beyond the pivot's own."""
    wide = user_event_pivot(sf_dir)
    types = list(PIVOT_EVENT_TYPES)
    cols = [f"n_{t}" for t in types]

    def _melt(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy(np.int64)
        m = df[cols].to_numpy(np.int64)  # rows x types
        k = len(types)
        user_rep = np.repeat(uid, k)
        type_tile = np.tile(np.asarray(types, object), len(df))
        n = m.reshape(-1)
        keep = n > 0
        return pd.DataFrame(
            {"user_id": user_rep[keep], "event_type": type_tile[keep], "n": n[keep]}
        )

    return wide.map_batches(_melt, batch_format="pandas")


PAGE_SIZE = 100
PAGE_OFFSET = 300


def orders_keyset_page(sf_dir: str) -> pd.DataFrame:
    """Keyset pagination without a global sort: page rows
    [PAGE_OFFSET+1, PAGE_OFFSET+PAGE_SIZE] in (price_cents DESC,
    o_orderkey ASC) order.  A bounded value-histogram reduce (distinct
    prices, never rows — the orders_price_rank shape) finds the price
    threshold covering the page; only rows at-or-above the threshold
    (<= offset + page + one tie-group) ever leave the cluster, then the
    tiny candidate set sorts locally.  OFFSET-style full sorts are the
    anti-pattern this replaces at 100 TB; depth stays bounded by the
    requested page, not the table."""
    import ray

    from .stages.dedup import _sorted_kv_task

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def _cents(t: pa.Table) -> np.ndarray:
        return np.floor(
            np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64) * 100.0
            + 0.5
        ).astype(np.int64)

    def _partial(t: pa.Table) -> pa.Table:
        c = _cents(t)
        ub, inv = np.unique(c, return_inverse=True)
        return pa.table(
            {
                "bucket": pa.array(((ub * 2654435761) % 4294967296) % SESSION_BUCKETS),
                "cents": pa.array(ub),
                "part_n": pa.array(np.bincount(inv).astype(np.int64)),
            }
        )

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("cents", sort=False)["part_n"].sum()
        return pd.DataFrame({"cents": s.index.to_numpy(np.int64), "n": s.to_numpy(np.int64)})

    hist = (
        orders.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_reduce, batch_format="pandas")
    )
    refs = [br for b in hist.iter_internal_ref_bundles() for br in b.block_refs]
    vals, counts = ray.get(_sorted_kv_task.remote(refs, "cents", "n"))
    # descending cumulative: smallest price threshold whose at-or-above
    # row count covers the page end
    desc_cum = np.cumsum(counts[::-1])
    need = PAGE_OFFSET + PAGE_SIZE
    idx = int(np.searchsorted(desc_cum, need, side="left"))
    idx = min(idx, len(vals) - 1)
    threshold = int(vals[::-1][idx])

    cand = orders.map_batches(
        lambda t: pa.table(
            {"o_orderkey": t["o_orderkey"], "price_cents": pa.array(_cents(t))}
        ),
        batch_format="pyarrow",
    ).filter(expr=f"price_cents >= {threshold}")
    df = cand.to_pandas()
    df = df.sort_values(
        ["price_cents", "o_orderkey"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)
    page = df.iloc[PAGE_OFFSET : PAGE_OFFSET + PAGE_SIZE].reset_index(drop=True)
    page.insert(0, "pos", np.arange(PAGE_OFFSET + 1, PAGE_OFFSET + 1 + len(page), dtype=np.int64))
    page["o_orderkey"] = page["o_orderkey"].astype(np.int64)
    return page


#: (relation label, child table, child key col, parent table, parent key col)
FK_RELATIONS = (
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
)


def fk_integrity_audit(sf_dir: str) -> pd.DataFrame:
    """Cross-table referential-integrity audit: one row per FK relation
    with total child rows and orphan (unmatched) rows.  Each parent key
    set becomes a sorted-array broadcast built remotely from block refs
    (never a Python set, never through the driver); children stream with
    a searchsorted membership probe and only two int64 partial counters
    per batch reach the aggregate.  At 100 TB the fact->fact relation
    (lineitem->orders) would swap the broadcast for the Bloom anti-join
    (stages/bloom.py) — same output contract."""
    import ray
    from ray.data.aggregate import Sum

    from .stages.dedup import _remote_sorted_column

    rows = []
    for label, child_t, child_k, parent_t, parent_k in FK_RELATIONS:
        parents = _read(sf_dir, parent_t, columns=[parent_k]).map_batches(
            lambda t, k=parent_k: pa.table(
                {"pk": pa.array(np.asarray(t[k].to_numpy(zero_copy_only=False), np.int64))}
            ),
            batch_format="pyarrow",
        )
        pref = _remote_sorted_column(parents, "pk")

        def _probe(t: pa.Table, k=child_k, ref=pref) -> pa.Table:
            arr = ray.get(ref)
            v = np.asarray(t[k].to_numpy(zero_copy_only=False), np.int64)
            return pa.table(
                {
                    "part_rows": pa.array([len(v)], pa.int64()),
                    "part_orphans": pa.array(
                        [int(len(v) - _sorted_member(arr, v).sum())], pa.int64()
                    ),
                }
            )

        agg = (
            _read(sf_dir, child_t, columns=[child_k])
            .map_batches(_probe, batch_format="pyarrow")
            .aggregate(Sum("part_rows", alias_name="r"), Sum("part_orphans", alias_name="o"))
        )
        rows.append((label, int(agg["r"]), int(agg["o"])))

    return pd.DataFrame(rows, columns=["relation", "child_rows", "orphan_rows"]).astype(
        {"child_rows": np.int64, "orphan_rows": np.int64}
    )


# ---------------- weighted median / skew diagnostics / cell-week rollup

def lineitem_weighted_median(sf_dir: str):
    """Grouped WEIGHTED median (price cents weighted by quantity units),
    exact: per-batch partial (flag, cents) weight histograms shrink the
    shuffle to distinct values; the final groupby has exactly as many
    groups as return flags (bounded), and each group resolves its median
    with one vectorized cumsum scan — the shared ceil-rank rule
    (first value whose cumulative weight reaches ceil(W/2))."""
    li = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def _partial(t: pa.Table) -> pd.DataFrame:
        cents = np.floor(
            np.asarray(t["l_extendedprice"].to_numpy(zero_copy_only=False), np.float64) * 100.0
            + 0.5
        ).astype(np.int64)
        qty = np.floor(
            np.asarray(t["l_quantity"].to_numpy(zero_copy_only=False), np.float64) + 0.5
        ).astype(np.int64)
        df = pd.DataFrame({"flag": t["l_returnflag"].to_pandas(), "cents": cents, "w": qty})
        out = df.groupby(["flag", "cents"], sort=False)["w"].sum().reset_index()
        out["cents"] = out["cents"].astype(np.int64)
        out["w"] = out["w"].astype(np.int64)
        return out

    def _median(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("cents", sort=True)["w"].sum()
        w = s.to_numpy(np.int64)
        cum = np.cumsum(w)
        need = (cum[-1] + 1) // 2
        v = int(s.index.to_numpy(np.int64)[int(np.searchsorted(cum, need))])
        return pd.DataFrame(
            {"l_returnflag": [g["flag"].iloc[0]], "wmedian_cents": np.asarray([v], np.int64)}
        )

    return (
        li.map_batches(_partial, batch_format="pyarrow")
        .groupby("flag")
        .map_groups(_median, batch_format="pandas")
    )


#: (label, table, int64 key column) probed by key_skew_report
SKEW_KEYS = (
    ("events.user_id", "events", "user_id"),
    ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
    ("lineitem.l_partkey", "lineitem", "l_partkey"),
    ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
    ("orders.o_custkey", "orders", "o_custkey"),
)


def key_skew_report(sf_dir: str) -> pd.DataFrame:
    """Shuffle-planning diagnostic: per candidate partition key, total
    rows, distinct keys, and the largest single-key group — the three
    numbers that decide broadcast vs shuffle vs salt.  Per-batch partial
    counts ride a coarse hash-bucket shuffle (each key wholly owned by
    one bucket), buckets reduce vectorized and emit 3 scalars each, so
    the driver sees O(buckets) rows per key regardless of scale."""
    from ray.data.aggregate import Max, Sum

    rows = []
    for label, table, col in SKEW_KEYS:
        ds = _read(sf_dir, table, columns=[col])

        def _partial(t: pa.Table, c=col) -> pa.Table:
            v = np.asarray(t[c].to_numpy(zero_copy_only=False), np.int64)
            u, counts = np.unique(v, return_counts=True)
            return pa.table(
                {
                    "bucket": pa.array(((u * 2654435761) % 4294967296) % SESSION_BUCKETS),
                    "key": pa.array(u),
                    "part_n": pa.array(counts.astype(np.int64)),
                }
            )

        def _reduce(g: pd.DataFrame) -> pd.DataFrame:
            s = g.groupby("key", sort=False)["part_n"].sum().to_numpy(np.int64)
            return pd.DataFrame(
                {
                    "rows_b": np.asarray([int(s.sum())], np.int64),
                    "distinct_b": np.asarray([len(s)], np.int64),
                    "max_b": np.asarray([int(s.max())], np.int64),
                }
            )

        agg = (
            ds.map_batches(_partial, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(_reduce, batch_format="pandas")
            .aggregate(
                Sum("rows_b", alias_name="n_rows"),
                Sum("distinct_b", alias_name="n_distinct"),
                Max("max_b", alias_name="max_group_n"),
            )
        )
        rows.append((label, int(agg["n_rows"]), int(agg["n_distinct"]), int(agg["max_group_n"])))

    return pd.DataFrame(
        rows, columns=["key", "n_rows", "n_distinct", "max_group_n"]
    ).astype({"n_rows": np.int64, "n_distinct": np.int64, "max_group_n": np.int64})


#: cell resolution for the spatio-temporal rollup (res 6 = 8 km cells)
CELLWEEK_RES = 6
#: week epoch offset keeps the day index positive (floor == trunc division)
CELLWEEK_DAY_OFFSET = 70_000


def cell_week_distinct_orders(sf_dir: str):
    """Spatio-temporal rollup: DISTINCT orders per (8 km cell, ship
    week).  Distinctness is resolved inside coarse hash buckets keyed on
    the composite (cell, week) — order keys ride the shuffle exactly
    once (deduped per batch first), never through the driver; the week
    index is pure integer arithmetic so the oracle replicates it
    bit-for-bit."""
    import pyarrow.compute as pc

    from .functions.cells import cell_encode

    li = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_partkey", "l_shipdate"]
    )

    def _partial(t: pa.Table) -> pd.DataFrame:
        from .pipelines.spatial import derive_uniform_points

        pts = derive_uniform_points(t)
        cell = cell_encode(
            np.asarray(pts["qx"].to_numpy(), np.float64),
            np.asarray(pts["qy"].to_numpy(), np.float64),
            CELLWEEK_RES,
        )
        day = pc.cast(
            pc.days_between(
                pa.scalar(pd.Timestamp("2024-01-01"), pa.timestamp("us")),
                pc.floor_temporal(t["l_shipdate"], unit="day"),
            ),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        week = (np.asarray(day, np.int64) + CELLWEEK_DAY_OFFSET) // 7 - CELLWEEK_DAY_OFFSET // 7
        ok = np.asarray(t["l_orderkey"].to_numpy(zero_copy_only=False), np.int64)
        df = pd.DataFrame({"cell": cell, "week": week, "ok": ok}).drop_duplicates()
        key = df["cell"].to_numpy(np.int64) * 100_000 + df["week"].to_numpy(np.int64)
        df["bucket"] = ((key * 2654435761) % 4294967296) % SESSION_BUCKETS
        return df

    def _distinct(g: pd.DataFrame) -> pd.DataFrame:
        s = g.drop_duplicates(["cell", "week", "ok"]).groupby(["cell", "week"], sort=False).size()
        idx = s.index.to_frame(index=False)
        return pd.DataFrame(
            {
                "cell": idx["cell"].to_numpy(np.int64),
                "week": idx["week"].to_numpy(np.int64),
                "n_orders": s.to_numpy(np.int64),
            }
        )

    return (
        li.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_distinct, batch_format="pandas")
    )


def bpe_learn_merges(sf_dir: str, n_merges: int = 10) -> pd.DataFrame:
    """Distributed BPE tokenizer training: the corpus collapses to a
    (word, count) histogram via one bucketed reduce — the only pass that
    touches the data — then the greedy merge loop runs vectorized over
    the bounded vocab (stages/tokenizer.py).  Rows-only at the driver
    (iterative argmax has no tractable SQL twin); pinned in pytest
    against an independent naive reference implementation."""
    from .stages.tokenizer import bpe_learn_merges as _train

    docs = _read(sf_dir, "documents", columns=["text"])
    return _train(docs, n_merges=n_merges)


# --------------------- focal raster stats / arg-max row / set intersect

def raster_focal_sum(sf_dir: str):
    """Focal statistics (map algebra): 3x3 neighborhood sum at every
    occupied pixel of the sparse heat raster.  The sparse raster rows
    replicate 9x toward their neighbor targets (np.repeat, one pass) and
    ride ONE bucketed shuffle keyed on the target pixel together with
    'occupied' marker rows from the raster itself; inside a bucket the
    contribution sums inner-merge with the markers, so empty pixels never
    materialize anywhere — the dense-raster trap at z12 is 10^9 cells."""
    from .stages.raster import rasterize_sparse

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_partkey"])

    def _pts(t: pa.Table) -> pa.Table:
        from .pipelines.spatial import derive_uniform_points

        return derive_uniform_points(t)

    raster = rasterize_sparse(li.map_batches(_pts, batch_format="pyarrow"))
    # raster rows: tile_x, tile_y, px_x, px_y, n -> global pixel
    from .stages.raster import TILE_PX

    def _tag(t: pa.Table) -> pd.DataFrame:
        gx = (
            np.asarray(t["tile_x"].to_numpy(zero_copy_only=False), np.int64) * TILE_PX
            + np.asarray(t["px_x"].to_numpy(zero_copy_only=False), np.int64)
        )
        gy = (
            np.asarray(t["tile_y"].to_numpy(zero_copy_only=False), np.int64) * TILE_PX
            + np.asarray(t["px_y"].to_numpy(zero_copy_only=False), np.int64)
        )
        n = np.asarray(t["n"].to_numpy(zero_copy_only=False), np.int64)
        k = len(gx)
        # 9 contribution rows per cell (kind=0) + 1 occupied marker (kind=1)
        offs = np.array([(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 0), (0, 1), (1, -1), (1, 0), (1, 1)], np.int64)
        tgx = np.repeat(gx, 9) + np.tile(offs[:, 0], k)
        tgy = np.repeat(gy, 9) + np.tile(offs[:, 1], k)
        out = pd.DataFrame(
            {
                "gx": np.concatenate([tgx, gx]),
                "gy": np.concatenate([tgy, gy]),
                "w": np.concatenate([np.repeat(n, 9), n]),
                "kind": np.concatenate([np.zeros(9 * k, np.int64), np.ones(k, np.int64)]),
            }
        )
        key = out["gx"].to_numpy(np.int64) * 8_388_608 + out["gy"].to_numpy(np.int64)
        out["bucket"] = ((key * 2654435761) % 4294967296) % SESSION_BUCKETS
        return out

    def _focal(g: pd.DataFrame) -> pd.DataFrame:
        contrib = (
            g.loc[g["kind"] == 0].groupby(["gx", "gy"], sort=False)["w"].sum().reset_index()
        )
        occ = g.loc[g["kind"] == 1, ["gx", "gy", "w"]].rename(columns={"w": "n"})
        m = occ.merge(contrib, on=["gx", "gy"], how="inner")
        return pd.DataFrame(
            {
                "gx": m["gx"].to_numpy(np.int64),
                "gy": m["gy"].to_numpy(np.int64),
                "n": m["n"].to_numpy(np.int64),
                "focal_n": m["w"].to_numpy(np.int64),
            }
        )

    return (
        raster.map_batches(_tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_focal, batch_format="pandas")
    )


def customer_latest_order(sf_dir: str):
    """Arg-max row per key (the 'latest record' op): each customer's most
    recent order as a FULL row (max o_orderdate, tie-break max
    o_orderkey).  Per-batch argmax partials shrink the shuffle to one
    candidate row per (customer, batch); buckets re-argmax vectorized
    (lexsort + keep-last) — never a per-key loop, never a global sort."""
    orders = _read(
        sf_dir,
        "orders",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "o_orderstatus"],
    )

    def _argmax(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort")
        out = df.drop_duplicates("o_custkey", keep="last").copy()
        out["price_cents"] = np.floor(
            out["o_totalprice"].to_numpy(np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        out = out.drop(columns=["o_totalprice"])
        out["bucket"] = (
            (out["o_custkey"].to_numpy(np.int64) * 2654435761) % 4294967296
        ) % SESSION_BUCKETS
        return out

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort")
        out = g.drop_duplicates("o_custkey", keep="last").drop(columns=["bucket"])
        return out.reset_index(drop=True)

    return (
        orders.map_batches(_argmax, batch_format="pandas")
        .groupby("bucket")
        .map_groups(_reduce, batch_format="pandas")
    )


INTERSECT_CUTOFF = "1998-06-01"


def repeat_customers_intersect(sf_dir: str):
    """Set intersection as an operator: customers with orders in BOTH
    halves of the date range (before/after INTERSECT_CUTOFF).  One pass:
    per-batch (custkey, has_before, has_after) OR-partials, bucketed
    max-reduce, filter both flags — the two-sided EXISTS without running
    the table twice."""
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    cutoff = pd.Timestamp(INTERSECT_CUTOFF)

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        before = (df["o_orderdate"] < cutoff).to_numpy()
        g = pd.DataFrame(
            {"o_custkey": df["o_custkey"].to_numpy(np.int64), "b": before, "a": ~before}
        ).groupby("o_custkey", sort=False)[["b", "a"]].max().reset_index()
        g["bucket"] = ((g["o_custkey"].to_numpy(np.int64) * 2654435761) % 4294967296) % SESSION_BUCKETS
        return g

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("o_custkey", sort=False)[["b", "a"]].max()
        keep = m.index.to_numpy(np.int64)[(m["b"] & m["a"]).to_numpy()]
        return pd.DataFrame({"o_custkey": np.sort(keep)})

    return (
        orders.map_batches(_partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(_reduce, batch_format="pandas")
    )


# ------------------------- rolling distinct window / OD matrix

WAU_WINDOW_DAYS = 7
WAU_EPOCH = "2024-01-01"


def rolling_active_users(sf_dir: str):
    """Rolling 7-day active users (the WAU curve): for every day in the
    observed span, DISTINCT users active in the trailing 7-day window.
    Sliding distinct can't pre-aggregate as plain counts, so the engine
    replicates each distinct (user, day) pair to the <=7 target days it
    supports (bounded fan-out, np.repeat flat) and resolves distinctness
    inside day-keyed hash buckets — user ids cross the wire once per
    window membership, never row-per-event."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min

    ev = _read(sf_dir, "events", columns=["ts", "user_id"])

    def _days(t: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.days_between(
                pa.scalar(pd.Timestamp(WAU_EPOCH), pa.timestamp("us")),
                pc.floor_temporal(t["ts"], unit="day"),
            ),
            pa.int64(),
        )
        return pa.table(
            {"day": day, "user_id": pa.array(np.asarray(t["user_id"].to_numpy(zero_copy_only=False), np.int64))}
        )

    pairs = ev.map_batches(_days, batch_format="pyarrow")
    span = pairs.aggregate(Min("day", alias_name="d0"), Max("day", alias_name="d1"))
    d0, d1 = int(span["d0"]), int(span["d1"])

    def _spread(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {"day": t["day"].to_numpy(zero_copy_only=False), "user_id": t["user_id"].to_numpy(zero_copy_only=False)}
        ).drop_duplicates()
        day = df["day"].to_numpy(np.int64)
        uid = df["user_id"].to_numpy(np.int64)
        w = WAU_WINDOW_DAYS
        tday = np.repeat(day, w) + np.tile(np.arange(w, dtype=np.int64), len(day))
        tuid = np.repeat(uid, w)
        keep = tday <= d1
        out = pd.DataFrame({"day": tday[keep], "user_id": tuid[keep]}).drop_duplicates()
        out["bucket"] = ((out["day"].to_numpy(np.int64) * 2654435761) % 4294967296) % SESSION_BUCKETS
        return out

    def _distinct(g: pd.DataFrame) -> pd.DataFrame:
        s = g.drop_duplicates(["day", "user_id"]).groupby("day", sort=False).size()
        day = s.index.to_numpy(np.int64)
        return pd.DataFrame(
            {
                "day": pd.Timestamp(WAU_EPOCH) + pd.to_timedelta(day, unit="D"),
                "active_users": s.to_numpy(np.int64),
            }
        )

    return (
        pairs.map_batches(_spread, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_distinct, batch_format="pandas")
    )


#: OD matrix cell resolution (res 5 = 16 km cells keeps the matrix dense
#: enough to be interesting at test scale)
OD_RES = 5


def order_od_matrix(sf_dir: str):
    """Origin-destination matrix: orders counted by (first-stop cell,
    last-stop cell) at res 5 — the trip-aggregation primitive.  First a
    bucketed per-order argmin/argmax over the (l_linenumber, l_partkey)
    stop order (ties carry identical lattice coords, same contract as
    order_route_l1), then the bounded (cell, cell) count reduce."""
    from .functions.cells import cell_encode

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_partkey"])

    def _prep(t: pa.Table) -> pa.Table:
        ok = np.asarray(t["l_orderkey"].to_numpy(zero_copy_only=False), np.int64)
        ln = np.asarray(t["l_linenumber"].to_numpy(zero_copy_only=False), np.int64)
        pk = np.asarray(t["l_partkey"].to_numpy(zero_copy_only=False), np.int64)
        return pa.table(
            {
                "bucket": pa.array(((ok * 2654435761) % 4294967296) % SESSION_BUCKETS),
                "l_orderkey": pa.array(ok),
                "ln": pa.array(ln),
                "pk": pa.array(pk),
                "ix": pa.array((ok * 131 + ln * 17) % 4096),
                "iy": pa.array((ok * 241 + pk * 13) % 4096),
            }
        )

    def _ends(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["l_orderkey", "ln", "pk"], kind="mergesort")
        first = g.drop_duplicates("l_orderkey", keep="first")
        last = g.drop_duplicates("l_orderkey", keep="last")
        from .functions.cells import X0, Y0

        def _cell(sub: pd.DataFrame) -> np.ndarray:
            return cell_encode(
                X0 + sub["ix"].to_numpy(np.int64).astype(np.float64) * 125.0,
                Y0 + sub["iy"].to_numpy(np.int64).astype(np.float64) * 125.0,
                OD_RES,
            )

        o_cell = _cell(first)
        d_cell = _cell(last)
        df = pd.DataFrame({"o_cell": o_cell, "d_cell": d_cell})
        s = df.groupby(["o_cell", "d_cell"], sort=False).size()
        idx = s.index.to_frame(index=False)
        out = pd.DataFrame(
            {
                "o_cell": idx["o_cell"].to_numpy(np.int64),
                "d_cell": idx["d_cell"].to_numpy(np.int64),
                "part_n": s.to_numpy(np.int64),
            }
        )
        key = out["o_cell"].to_numpy(np.int64) * 1_048_576 + out["d_cell"].to_numpy(np.int64)
        out["obucket"] = ((key * 2654435761) % 4294967296) % SESSION_BUCKETS
        return out

    def _count(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["o_cell", "d_cell"], sort=False)["part_n"].sum()
        idx = s.index.to_frame(index=False)
        return pd.DataFrame(
            {
                "o_cell": idx["o_cell"].to_numpy(np.int64),
                "d_cell": idx["d_cell"].to_numpy(np.int64),
                "n_orders": s.to_numpy(np.int64),
            }
        )

    return (
        li.map_batches(_prep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_ends, batch_format="pandas")
        .groupby("obucket")
        .map_groups(_count, batch_format="pandas")
    )


# --------------------------------- graph BFS / store compaction

BFS_MAX_DEPTH = 8
COMPACT_CHECKSUM_K = 1_000_003
#: 1/10 deterministic order sample — same sparsifier as
#: supplier_degree_histogram / supplier_triangles
BFS_ORDER_MOD = 10


def supplier_bfs_distance(sf_dir: str) -> pd.DataFrame:
    """BFS hop distance from the minimum supplier in the co-supply graph
    (suppliers sharing a sampled order), capped at BFS_MAX_DEPTH.  Edges
    stay DISTRIBUTED: each round is one streaming membership probe of the
    edge Dataset against the sorted frontier broadcast (searchsorted,
    never a Python set); only node-bounded arrays (frontier / visited /
    distances) live on the driver — the dedup_clusters discipline, with
    rounds = eccentricity."""
    import ray

    from .stages.dedup import _remote_sorted_column

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])

    def _inc(t: pa.Table) -> pd.DataFrame:
        ok = np.asarray(t["l_orderkey"].to_numpy(zero_copy_only=False), np.int64)
        sk = np.asarray(t["l_suppkey"].to_numpy(zero_copy_only=False), np.int64)
        keep = ok % BFS_ORDER_MOD == 0
        ok, sk = ok[keep], sk[keep]
        assert len(sk) == 0 or sk.max() < SUPP_PACK, "widen SUPP_PACK"
        key = ok * SUPP_PACK + sk
        u = np.unique(key)
        return pd.DataFrame(
            {
                "bucket": ((u // SUPP_PACK * 2654435761) % 4294967296) % SESSION_BUCKETS,
                "ok": u // SUPP_PACK,
                "sk": u % SUPP_PACK,
            }
        )

    def _edges(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["ok", "sk"])
        m = g.merge(g, on="ok")
        m = m[m["sk_x"] != m["sk_y"]].drop_duplicates(["sk_x", "sk_y"])
        return pd.DataFrame(
            {"sa": m["sk_x"].to_numpy(np.int64), "sb": m["sk_y"].to_numpy(np.int64)}
        )

    edges = (
        li.map_batches(_inc, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_edges, batch_format="pandas")
        .materialize()  # reused every BFS round; edge list, not input rows
    )
    src_ref = _remote_sorted_column(edges, "sa")
    src_arr = ray.get(src_ref)
    if len(src_arr) == 0:
        return pd.DataFrame({"s_suppkey": pd.array([], "int64"), "dist": pd.array([], "int64")})
    src = int(src_arr[0])

    visited = {src: 0}
    frontier = np.asarray([src], np.int64)
    for d in range(1, BFS_MAX_DEPTH + 1):
        f_ref = ray.put(np.sort(frontier))

        def _probe(t: pa.Table) -> pa.Table:
            f = ray.get(f_ref)
            sa = np.asarray(t["sa"].to_numpy(zero_copy_only=False), np.int64)
            sb = np.asarray(t["sb"].to_numpy(zero_copy_only=False), np.int64)
            hit = _sorted_member(f, sa)
            return pa.table({"node": pa.array(np.unique(sb[hit]))})

        cand_ref = _remote_sorted_column(
            edges.map_batches(_probe, batch_format="pyarrow"), "node"
        )
        cand = ray.get(cand_ref)
        new = np.asarray([n for n in cand if int(n) not in visited], np.int64)
        if len(new) == 0:
            break
        for n in new:
            visited[int(n)] = d
        frontier = new

    items = sorted(visited.items())
    return pd.DataFrame(
        {
            "s_suppkey": np.asarray([k for k, _ in items], np.int64),
            "dist": np.asarray([v for _, v in items], np.int64),
        }
    )


def documents_store_compaction(sf_dir: str) -> pd.DataFrame:
    """Small-file compaction (the table-maintenance op every long-lived
    partitioned store needs): the documents table lands as MANY small
    parquet shards, is compacted by a streaming read -> repartition ->
    rewrite into few files, and the compacted store is audited against
    the source — per-lang row counts and an order-invariant int64
    checksum must survive both rewrites bit-for-bit (the oracle computes
    them straight from the source table)."""
    import os

    import ray.data as rd

    from .functions.text import rolling_fingerprint_batch

    tag = os.path.basename(os.path.normpath(sf_dir))
    small = f"/tmp/graft_compact/{tag}/small"
    big = f"/tmp/graft_compact/{tag}/compacted"
    for p in (small, big):
        if os.path.isdir(p):
            import shutil

            shutil.rmtree(p)
    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    # fragment into many small files (the pathological arrival state)
    docs.repartition(32).write_parquet(small)
    # compact: streaming read -> few files
    rd.read_parquet(small).repartition(4).write_parquet(big)

    def _audit(t: pa.Table) -> pd.DataFrame:
        fp = rolling_fingerprint_batch([s or "" for s in t["text"].to_pylist()])
        did = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), np.int64)
        df = pd.DataFrame(
            {"lang": t["lang"].to_pandas(), "part_n": 1, "part_sum": (did * COMPACT_CHECKSUM_K + fp)}
        )
        out = df.groupby("lang", sort=False)[["part_n", "part_sum"]].sum().reset_index()
        return out.astype({"part_n": np.int64, "part_sum": np.int64})

    from ray.data.aggregate import Sum

    return (
        rd.read_parquet(big)
        .map_batches(_audit, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("part_n", alias_name="n_docs"), Sum("part_sum", alias_name="checksum"))
        .to_pandas()
        .astype({"n_docs": np.int64, "checksum": np.int64})
        .sort_values("lang")
        .reset_index(drop=True)
    )


# ----------- target encoding / dense grid / sentence stats / ties top-k

def part_brand_target_encoding(sf_dir: str):
    """Feature-engineering target encoding: each part carries its brand's
    revenue statistics as the EXACT rational (sum_cents, n) — no float
    mean, so the oracle matches bit-for-bit.  Fact rows pre-aggregate per
    batch against the broadcast part->brand lookup; the brand table
    (bounded) broadcasts back onto the part dim — two broadcasts, zero
    shuffles of the fact."""
    import ray
    from ray.data.aggregate import Sum

    from .stages.dedup import _sorted_kv_task

    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])
    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice"])

    # brand ids: deterministic dense codes from the (small) brand set
    import pyarrow.parquet as pq

    brands = sorted(
        set(pq.read_table(f"{sf_dir}/part.parquet", columns=["p_brand"])["p_brand"].to_pylist())
    )
    brand_code = {b: i for i, b in enumerate(brands)}

    pk2brand = part.map_batches(
        lambda t: pa.table(
            {
                "k": pa.array(np.asarray(t["p_partkey"].to_numpy(zero_copy_only=False), np.int64)),
                "v": pa.array(
                    np.asarray([brand_code[b] for b in t["p_brand"].to_pylist()], np.int64)
                ),
            }
        ),
        batch_format="pyarrow",
    )
    refs = [br for b in pk2brand.iter_internal_ref_bundles() for br in b.block_refs]
    kv_ref = _sorted_kv_task.remote(refs, "k", "v")

    def _partial(t: pa.Table) -> pa.Table:
        ks, vs = ray.get(kv_ref)
        pk = np.asarray(t["l_partkey"].to_numpy(zero_copy_only=False), np.int64)
        code = vs[np.searchsorted(ks, pk)]
        cents = np.floor(
            np.asarray(t["l_extendedprice"].to_numpy(zero_copy_only=False), np.float64) * 100.0
            + 0.5
        ).astype(np.int64)
        u, inv = np.unique(code, return_inverse=True)
        return pa.table(
            {
                "code": pa.array(u),
                "part_n": pa.array(np.bincount(inv).astype(np.int64)),
                "part_cents": pa.array(
                    np.bincount(inv, weights=cents.astype(np.float64)).astype(np.int64)
                ),
            }
        )

    enc = (
        li.map_batches(_partial, batch_format="pyarrow")
        .groupby("code")
        .aggregate(Sum("part_n", alias_name="n"), Sum("part_cents", alias_name="sum_cents"))
        .to_pandas()
    )
    enc_n = np.zeros(len(brands), np.int64)
    enc_sum = np.zeros(len(brands), np.int64)
    enc_n[enc["code"].to_numpy(np.int64)] = enc["n"].to_numpy(np.int64)
    enc_sum[enc["code"].to_numpy(np.int64)] = enc["sum_cents"].to_numpy(np.int64)
    n_ref = ray.put(enc_n)
    s_ref = ray.put(enc_sum)

    def _apply(t: pa.Table) -> pa.Table:
        n_arr, s_arr = ray.get(n_ref), ray.get(s_ref)
        code = np.asarray([brand_code[b] for b in t["p_brand"].to_pylist()], np.int64)
        return pa.table(
            {
                "p_partkey": t["p_partkey"],
                "p_brand": t["p_brand"],
                "enc_sum_cents": pa.array(s_arr[code]),
                "enc_n": pa.array(n_arr[code]),
            }
        )

    return part.map_batches(_apply, batch_format="pyarrow")


def events_daily_dense(sf_dir: str) -> pd.DataFrame:
    """Dimension densification: the (day x declared event type) grid with
    ZERO-filled cells — downstream time-series models need the dense
    shape.  Sparse counts aggregate distributed (bounded day x type key
    space); only the bounded dense grid itself is assembled at the end
    (days x 5 types), never the events."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", columns=["ts", "event_type"])

    def _partial(t: pa.Table) -> pd.DataFrame:
        day = pc.cast(
            pc.days_between(
                pa.scalar(pd.Timestamp(WAU_EPOCH), pa.timestamp("us")),
                pc.floor_temporal(t["ts"], unit="day"),
            ),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"day": np.asarray(day, np.int64), "event_type": t["event_type"].to_pandas()})
        df = df[df["event_type"].isin(PIVOT_EVENT_TYPES)]
        out = df.groupby(["day", "event_type"], sort=False).size().reset_index(name="part_n")
        out["part_n"] = out["part_n"].astype(np.int64)
        return out

    sparse = (
        ev.map_batches(_partial, batch_format="pyarrow")
        .groupby(["day", "event_type"])
        .aggregate(Sum("part_n", alias_name="n"))
        .to_pandas()
    )
    d0, d1 = int(sparse["day"].min()), int(sparse["day"].max())
    days = np.arange(d0, d1 + 1, dtype=np.int64)
    grid = pd.DataFrame(
        {
            "day": np.repeat(days, len(PIVOT_EVENT_TYPES)),
            "event_type": np.tile(np.asarray(PIVOT_EVENT_TYPES, object), len(days)),
        }
    )
    out = grid.merge(sparse, on=["day", "event_type"], how="left")
    out["n"] = out["n"].fillna(0).astype(np.int64)
    out["day"] = pd.Timestamp(WAU_EPOCH) + pd.to_timedelta(out["day"], unit="D")
    return out.sort_values(["day", "event_type"]).reset_index(drop=True)


#: sentence boundary (RE2-compatible; \s literal matches functions/text.py
#: WS_SPLIT_PATTERN semantics)
SENTENCE_SPLIT_PATTERN = r"[.!?]+[\t\n\f\r ]+"


def doc_sentence_stats(sf_dir: str):
    """Per-document sentence segmentation stats: sentence count (split on
    terminal punctuation + whitespace) and characters of the longest
    segment — one vectorized pandas str pass per batch, the same RE2
    pattern string the oracle feeds regexp_split_to_array."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def _f(df: pd.DataFrame) -> pd.DataFrame:
        segs = df["text"].str.split(SENTENCE_SPLIT_PATTERN, regex=True)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "n_sentences": segs.str.len().to_numpy(np.int64),
                "max_sentence_chars": segs.map(
                    lambda xs: max((len(x) for x in xs), default=0)
                ).to_numpy(np.int64),
            }
        )

    return docs.map_batches(_f, batch_format="pandas")


TIES_TOPK = 3


def orders_top_prices_with_ties(sf_dir: str):
    """Top-k per group WITH ties (DENSE_RANK <= k semantics): every order
    whose price is among its priority's TIES_TOPK highest DISTINCT
    prices.  Per-batch partial top-k distinct values per group make the
    reduce input bounded (groups x k x batches); the tiny per-group
    threshold table broadcasts back for a streaming filter — row-limit
    top-k (top_orders_per_customer) can't express this."""
    import ray

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority", "o_totalprice"])

    def _cents(t: pa.Table) -> np.ndarray:
        return np.floor(
            np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64) * 100.0
            + 0.5
        ).astype(np.int64)

    def _partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"prio": t["o_orderpriority"].to_pandas(), "cents": _cents(t)})
        df = df.drop_duplicates()
        df = df.sort_values(["prio", "cents"], ascending=[True, False], kind="mergesort")
        return df.groupby("prio", sort=False).head(TIES_TOPK)

    top = (
        orders.map_batches(_partial, batch_format="pyarrow")
        .groupby("prio")
        .map_groups(
            lambda g: g.drop_duplicates()
            .sort_values("cents", ascending=False)
            .head(TIES_TOPK),
            batch_format="pandas",
        )
        .to_pandas()
    )
    top = top.sort_values(["prio", "cents"], ascending=[True, False], kind="mergesort")
    top["price_rank"] = top.groupby("prio", sort=False).cumcount().to_numpy(np.int64) + 1
    thresholds = top.rename(columns={"prio": "o_orderpriority", "cents": "price_cents"})
    t_ref = ray.put(thresholds)

    def _filter(t: pa.Table) -> pd.DataFrame:
        th = ray.get(t_ref)  # bounded: groups x TIES_TOPK rows
        df = pd.DataFrame(
            {
                "o_orderkey": np.asarray(t["o_orderkey"].to_numpy(zero_copy_only=False), np.int64),
                "o_orderpriority": t["o_orderpriority"].to_pandas(),
                "price_cents": _cents(t),
            }
        )
        out = df.merge(th, on=["o_orderpriority", "price_cents"], how="inner")
        out["price_rank"] = out["price_rank"].astype(np.int64)
        return out

    return orders.map_batches(_filter, batch_format="pyarrow")


def user_time_weighted_value(sf_dir: str):
    """Time-weighted average per user (the state/sensor TWA primitive):
    value holds between events, so the integral is
    sum(cents_i * hold_seconds_i) over the (ts, event_id)-ordered stream
    — reported as the EXACT rational (twa_num, twa_den_s), no float
    division.  Hold times use floor-divided epoch-microsecond gaps
    (bit-identical in numpy and DuckDB's epoch_us); one coarse
    user-bucket shuffle, vectorized in-bucket sort + shift."""
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])

    def _bucket(t: pa.Table) -> pd.DataFrame:
        uid = np.asarray(t["user_id"].to_numpy(zero_copy_only=False), np.int64)
        df = pd.DataFrame(
            {
                "user_id": uid,
                "event_id": np.asarray(t["event_id"].to_numpy(zero_copy_only=False), np.int64),
                "us": t["ts"].to_pandas().astype("datetime64[us]").astype(np.int64),
                "cents": np.floor(
                    np.asarray(t["value"].to_numpy(zero_copy_only=False), np.float64) * 100.0
                    + 0.5
                ).astype(np.int64),
            }
        )
        df["bucket"] = ((uid * 2654435761) % 4294967296) % SESSION_BUCKETS
        return df

    def _twa(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "us", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        us = g["us"].to_numpy(np.int64)
        cents = g["cents"].to_numpy(np.int64)
        same = np.zeros(len(g), bool)
        same[:-1] = uid[:-1] == uid[1:]
        hold_s = np.zeros(len(g), np.int64)
        hold_s[:-1] = (us[1:] - us[:-1]) // 1_000_000
        hold_s[~same] = 0
        contrib = cents * hold_s
        s = pd.DataFrame({"user_id": uid, "num": contrib, "us": us}).groupby(
            "user_id", sort=False
        )
        num = s["num"].sum()
        den = (s["us"].max() - s["us"].min()) // 1_000_000
        return pd.DataFrame(
            {
                "user_id": num.index.to_numpy(np.int64),
                "twa_num": num.to_numpy(np.int64),
                "twa_den_s": den.to_numpy(np.int64),
            }
        )

    return (
        ev.map_batches(_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_twa, batch_format="pandas")
    )


def curate_then_pack(sf_dir: str, max_len: int = SEQ_PACK_MAXLEN):
    """The full training-data path composed END TO END: lang filter ->
    quality gates -> exact dedup -> near-dedup -> sequence packing of the
    survivors (doc_id order).  Gates reuse the exact curated_documents
    broadcasts (sorted keep/drop arrays); the packing offset comes from
    the same distributed ordered prefix scan as sequence_packing — the
    curated token stream never funnels through the driver."""
    import pyarrow.parquet as pq
    import ray

    from .functions.text import quality_features, token_count
    from .stages.scan import ordered_prefix_sum

    drop_arr = _near_dup_drop_set(sf_dir)
    keep_arr = np.unique(_exact_keepers(sf_dir).to_pandas()["doc_id"].to_numpy(np.int64))
    keep_ref = ray.put(keep_arr)
    drop_ref = ray.put(drop_arr)
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"]).filter(
        expr="lang == 'en'"
    )

    def _gate(df: pd.DataFrame) -> pd.DataFrame:
        karr = ray.get(keep_ref)
        darr = ray.get(drop_ref)
        feats = quality_features(df["text"])
        ids = df["doc_id"].to_numpy(np.int64)
        ok = (
            (feats["is_short"] == 0)
            & (feats["stop_permille"] >= 10)
            & (feats["stop_permille"] <= 400)
            & _sorted_member(karr, ids)
            & ~_sorted_member(darr, ids)
        )
        sub = df.loc[ok]
        return pd.DataFrame(
            {
                "doc_id": sub["doc_id"].to_numpy(np.int64),
                "n_tokens": token_count(pa.chunked_array([pa.array(sub["text"], pa.string())])),
            }
        )

    counts = docs.map_batches(_gate, batch_format="pandas")
    scanned = ordered_prefix_sum(counts, "doc_id", "n_tokens", max_key=n_docs + 1)

    def _layout(t: pa.Table) -> pa.Table:
        cum = np.asarray(t["cum_prev"].to_numpy(zero_copy_only=False), np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": t["n_tokens"],
                "seq_id": pa.array(cum // max_len, pa.int64()),
                "seq_offset": pa.array(cum % max_len, pa.int64()),
            }
        )

    return scanned.map_batches(_layout, batch_format="pyarrow")


# ------------------------- spatial partition pruning (bbox over store)

#: res-3 cells (64 km) partition the point store: 64 partitions
BBOX_STORE_RES = 3
#: query bbox in lattice meters (covers a handful of res-3 cells)
BBOX_QUERY = (260_000.0, 4_060_000.0, 330_000.0, 4_140_000.0)  # x0, y0, x1, y1


def points_in_bbox_pruned(sf_dir: str):
    """Spatial partition pruning: the uniform points land ONCE in a
    hive-partitioned store keyed by their res-3 cell; a bbox query then
    selects only the partition directories whose cells intersect the box
    — pruning at path selection, before a single byte leaves storage
    (the spatial twin of events_recent_pruned / ann_topk_ivf_pruned) —
    and applies the exact bbox predicate inside.  At 100 TB this is the
    difference between scanning 64 km cells that can match and scanning
    the planet."""
    import glob
    import os

    import ray.data as rd
    from ray.data.datasource.partitioning import Partitioning

    from .functions.cells import EXTENT, X0, Y0, cell_encode

    tag = os.path.basename(os.path.normpath(sf_dir))
    store = f"/tmp/graft_bbox_store/{tag}"
    if not os.path.isdir(store):
        li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_partkey"])

        def _pts(t: pa.Table) -> pa.Table:
            from .pipelines.spatial import derive_uniform_points

            pts = derive_uniform_points(t)
            cell = cell_encode(
                np.asarray(pts["qx"].to_numpy(), np.float64),
                np.asarray(pts["qy"].to_numpy(), np.float64),
                BBOX_STORE_RES,
            )
            return pts.append_column("cell3", pa.array(cell, pa.int64()))

        li.map_batches(_pts, batch_format="pyarrow").write_parquet(
            store, partition_cols=["cell3"]
        )

    x0, y0, x1, y1 = BBOX_QUERY
    n = 1 << BBOX_STORE_RES
    s = EXTENT / n
    ix0 = max(int((x0 - X0) // s), 0)
    ix1 = min(int((x1 - X0) // s), n - 1)
    iy0 = max(int((y0 - Y0) // s), 0)
    iy1 = min(int((y1 - Y0) // s), n - 1)
    cells = [iy * n + ix for iy in range(iy0, iy1 + 1) for ix in range(ix0, ix1 + 1)]
    paths = [
        f
        for c in cells
        for f in sorted(glob.glob(f"{store}/cell3={c}/*.parquet"))
    ]
    if not paths:
        return pd.DataFrame(
            {"query_id": pd.array([], "int64"), "qx": pd.array([], "float64"), "qy": pd.array([], "float64")}
        )
    ds = rd.read_parquet(
        paths,
        partitioning=Partitioning("hive", base_dir=store, field_types={"cell3": int}),
    )

    def _exact(t: pa.Table) -> pa.Table:
        qx = np.asarray(t["qx"].to_numpy(zero_copy_only=False), np.float64)
        qy = np.asarray(t["qy"].to_numpy(zero_copy_only=False), np.float64)
        keep = (qx >= x0) & (qx <= x1) & (qy >= y0) & (qy <= y1)
        return pa.table(
            {
                "query_id": pa.array(np.asarray(t["query_id"].to_numpy(zero_copy_only=False), np.int64)[keep]),
                "qx": pa.array(qx[keep]),
                "qy": pa.array(qy[keep]),
            }
        )

    return ds.map_batches(_exact, batch_format="pyarrow")


def bpe_encode_tokens(sf_dir: str, n_merges: int = 10):
    """Tokenizer APPLY side: encode every document with the merges
    learned by bpe_learn_merges and report its subword count.  The merge
    list (tiny) broadcasts once; each batch encodes only its DISTINCT
    words (flat-array merge passes, stages/tokenizer.py) and scatters
    counts back to docs with one bincount.  Rows-only (the trainer has
    no SQL twin); pinned in pytest against a naive per-word encoder."""
    import ray

    from .functions.text import ws_tokens
    from .stages.tokenizer import encode_subword_counts

    merges_df = bpe_learn_merges(sf_dir, n_merges=n_merges)
    merges = list(zip(merges_df["left"].tolist(), merges_df["right"].tolist()))
    m_ref = ray.put(merges)

    def _encode(df: pd.DataFrame) -> pd.DataFrame:
        ms = ray.get(m_ref)
        toks: list[str] = []
        lens: list[int] = []
        for s in df["text"]:
            ts = ws_tokens(s.lower())
            toks.extend(ts)
            lens.append(len(ts))
        doc_id = df["doc_id"].to_numpy(np.int64)
        n_sub = np.zeros(len(df), np.int64)
        if toks:
            arr = np.asarray(toks, object)
            uniq, inv = np.unique(arr, return_inverse=True)
            per_word = encode_subword_counts(uniq, ms)
            owner = np.repeat(np.arange(len(df)), np.asarray(lens, np.int64))
            n_sub = np.bincount(
                owner, weights=per_word[inv].astype(np.float64), minlength=len(df)
            ).astype(np.int64)
        return pd.DataFrame({"doc_id": doc_id, "n_subwords": n_sub})

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(_encode, batch_format="pandas")


# ----------------------------- gaps & islands / percent-of-total

STREAK_GAP_DAYS = 30


def customer_order_streaks(sf_dir: str):
    """Gaps-and-islands: per customer, the number of order 'streaks'
    (runs of consecutive orders < STREAK_GAP_DAYS apart) plus total
    orders — the classic sessionize-on-irregular-keys shape, at order
    granularity.  One coarse customer-bucket shuffle; inside a bucket
    the streak count is 1 + count of over-gap breaks, fully vectorized
    (sort + shift), identical tie order to the oracle's window."""
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderdate"])

    def _bucket(t: pa.Table) -> pd.DataFrame:
        ck = np.asarray(t["o_custkey"].to_numpy(zero_copy_only=False), np.int64)
        df = pd.DataFrame(
            {
                "o_custkey": ck,
                "o_orderkey": np.asarray(t["o_orderkey"].to_numpy(zero_copy_only=False), np.int64),
                "us": t["o_orderdate"].to_pandas().astype("datetime64[us]").astype(np.int64),
            }
        )
        df["bucket"] = ((ck * 2654435761) % 4294967296) % SESSION_BUCKETS
        return df

    def _streaks(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "us", "o_orderkey"], kind="mergesort")
        ck = g["o_custkey"].to_numpy(np.int64)
        us = g["us"].to_numpy(np.int64)
        same = np.zeros(len(g), bool)
        same[1:] = ck[1:] == ck[:-1]
        gap_days = np.zeros(len(g), np.int64)
        gap_days[1:] = (us[1:] - us[:-1]) // (86_400 * 1_000_000)
        brk = (same & (gap_days >= STREAK_GAP_DAYS)).astype(np.int64)
        s = pd.DataFrame({"ck": ck, "brk": brk}).groupby("ck", sort=False)["brk"]
        return pd.DataFrame(
            {
                "o_custkey": s.sum().index.to_numpy(np.int64),
                "n_orders": s.size().to_numpy(np.int64),
                "n_streaks": (s.sum() + 1).to_numpy(np.int64),
            }
        )

    return (
        orders.map_batches(_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_streaks, batch_format="pandas")
    )


def nation_revenue_share(sf_dir: str) -> pd.DataFrame:
    """Percent-of-total (ratio-to-report window): each nation's
    local-supplier revenue next to the global total and its exact
    floor(permille) share — the SUM() OVER () shape without a second
    pass: the bounded per-nation aggregate already holds the total."""
    base = q5_nation_revenue(sf_dir)
    total = int(base["revenue_cents"].sum())
    out = base[["n_name", "revenue_cents"]].copy()
    out["total_cents"] = np.int64(total)
    out["share_permille"] = (
        out["revenue_cents"].to_numpy(np.int64) * 1000 // max(total, 1)
    ).astype(np.int64)
    return out


# ------------------- rectangle proximity join / CUSUM alarm

PARCEL_PROX_D = 500.0  #: L-inf gap (m) for the buffered parcel pair join


def parcel_proximity_pairs(sf_dir: str):
    """Polygon-polygon proximity join: all parcel pairs whose rectangles
    come within PARCEL_PROX_D meters (L-inf).  Each parcel's D/2-dilated
    bbox flat-maps to its covering res-9 cells; candidate pairs form
    inside ONE cell-bucket shuffle and deduplicate by the standard
    report-once rule (only the cell containing the dilated intersection's
    min corner emits) — the rect-rect twin of spatial_cell_join, no
    broadcast side, replication bounded by the dilation/cell ratio."""
    import ray.data as rd

    from .functions.cells import EXTENT, X0, Y0
    from .sources.synthetic import PARCEL_HALF, address_points_table

    res = 9
    n = 1 << res
    s = EXTENT / n
    half = PARCEL_PROX_D / 2.0

    ap = address_points_table()
    pid = np.arange(1, ap.num_rows + 1, dtype=np.int64)
    base = pa.table(
        {
            "pid": pa.array(pid),
            "x": ap["x"],
            "y": ap["y"],
        }
    )
    parcels = rd.from_arrow(base)

    def _cover(t: pa.Table) -> pd.DataFrame:
        p = np.asarray(t["pid"].to_numpy(zero_copy_only=False), np.int64)
        x = np.asarray(t["x"].to_numpy(zero_copy_only=False), np.float64)
        y = np.asarray(t["y"].to_numpy(zero_copy_only=False), np.float64)
        ex0, ex1 = x - PARCEL_HALF - half, x + PARCEL_HALF + half
        ey0, ey1 = y - PARCEL_HALF - half, y + PARCEL_HALF + half
        ix0 = np.clip(np.floor((ex0 - X0) / s), 0, n - 1).astype(np.int64)
        ix1 = np.clip(np.floor((ex1 - X0) / s), 0, n - 1).astype(np.int64)
        iy0 = np.clip(np.floor((ey0 - Y0) / s), 0, n - 1).astype(np.int64)
        iy1 = np.clip(np.floor((ey1 - Y0) / s), 0, n - 1).astype(np.int64)
        rows = []
        # dilation (<= 520 m) vs 1 km cells: at most 2x2 cells per parcel
        for dx in (0, 1):
            for dy in (0, 1):
                cx = np.minimum(ix0 + dx, ix1)
                cy = np.minimum(iy0 + dy, iy1)
                rows.append(
                    pd.DataFrame(
                        {"cell": cy * n + cx, "pid": p, "x": x, "y": y,
                         "ex0": ex0, "ey0": ey0, "ex1": ex1, "ey1": ey1}
                    )
                )
        out = pd.concat(rows).drop_duplicates(["cell", "pid"])
        out["bucket"] = ((out["cell"].to_numpy(np.int64) * 2654435761) % 4294967296) % SESSION_BUCKETS
        return out

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        res_rows = []
        for cell, sub in g.groupby("cell", sort=False):
            m = sub.merge(sub, on="cell")
            m = m[m["pid_x"] < m["pid_y"]]
            if not len(m):
                continue
            # dilated boxes overlap (open) == L-inf gap < D
            ok = (
                (m["ex0_x"] < m["ex1_y"]) & (m["ex0_y"] < m["ex1_x"])
                & (m["ey0_x"] < m["ey1_y"]) & (m["ey0_y"] < m["ey1_x"])
            )
            m = m[ok]
            if not len(m):
                continue
            # report-once: only the cell holding the intersection min corner
            mx = np.maximum(m["ex0_x"].to_numpy(), m["ex0_y"].to_numpy())
            my = np.maximum(m["ey0_x"].to_numpy(), m["ey0_y"].to_numpy())
            cix = np.clip(np.floor((mx - X0) / s), 0, n - 1).astype(np.int64)
            ciy = np.clip(np.floor((my - Y0) / s), 0, n - 1).astype(np.int64)
            keep = (ciy * n + cix) == cell
            if keep.any():
                res_rows.append(
                    pd.DataFrame(
                        {"pa": m["pid_x"].to_numpy(np.int64)[keep],
                         "pb": m["pid_y"].to_numpy(np.int64)[keep]}
                    )
                )
        if not res_rows:
            return pd.DataFrame({"pa": pd.array([], "int64"), "pb": pd.array([], "int64")})
        return pd.concat(res_rows).reset_index(drop=True)

    return (
        parcels.map_batches(_cover, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_pairs, batch_format="pandas")
    )


CUSUM_SLOPE_CENTS = 5000  #: alarm when a user's running value sum exceeds slope*i


def user_cusum_alarm(sf_dir: str):
    """CUSUM-style drift alarm per user: walking the (ts, event_id)-
    ordered stream, flag the FIRST event where the running cents sum
    exceeds CUSUM_SLOPE_CENTS x (events so far) — the streaming-monitor
    shape (is this meter running hot?).  One user-bucket shuffle,
    vectorized cumsum + argmax per bucket; output is one row per alarmed
    user with the crossing event."""
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])

    def _bucket(t: pa.Table) -> pd.DataFrame:
        uid = np.asarray(t["user_id"].to_numpy(zero_copy_only=False), np.int64)
        df = pd.DataFrame(
            {
                "user_id": uid,
                "event_id": np.asarray(t["event_id"].to_numpy(zero_copy_only=False), np.int64),
                "us": t["ts"].to_pandas().astype("datetime64[us]").astype(np.int64),
                "cents": np.floor(
                    np.asarray(t["value"].to_numpy(zero_copy_only=False), np.float64) * 100.0
                    + 0.5
                ).astype(np.int64),
            }
        )
        df["bucket"] = ((uid * 2654435761) % 4294967296) % SESSION_BUCKETS
        return df

    def _alarm(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "us", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        cents = g["cents"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        # per-user running sum and index via segmented cumsum
        new = np.zeros(len(g), bool)
        new[0] = True
        new[1:] = uid[1:] != uid[:-1]
        grp = np.cumsum(new) - 1
        cum = np.cumsum(cents)
        starts = np.flatnonzero(new)
        # exact per-segment base via the segment id — sign-independent
        # (maximum.accumulate over a zero-initialized base is only right
        # when every running sum stays non-negative; round-3 ADVICE)
        seg_base = (cum[starts] - cents[starts])[grp]
        run = cum - seg_base
        idx = np.arange(len(g), dtype=np.int64)
        pos = idx - np.maximum.accumulate(np.where(new, idx, 0)) + 1
        hit = run > CUSUM_SLOPE_CENTS * pos
        df = pd.DataFrame(
            {"user_id": uid[hit], "event_id": eid[hit], "pos": pos[hit], "run_cents": run[hit]}
        )
        first = df.drop_duplicates("user_id", keep="first")
        return pd.DataFrame(
            {
                "user_id": first["user_id"].to_numpy(np.int64),
                "alarm_event_id": first["event_id"].to_numpy(np.int64),
                "alarm_pos": first["pos"].to_numpy(np.int64),
                "run_cents": first["run_cents"].to_numpy(np.int64),
            }
        )

    return (
        ev.map_batches(_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_alarm, batch_format="pandas")
    )


# ---------------------- list-column vector math / per-group order stats

def embedding_norm_quantized(sf_dir: str):
    """List-column vector math with an exact oracle: per embedding, the
    quantized squared L2 norm (stages/ann.py QUANT grid, every product
    < 2^62) and the dimension count — computed as one zero-copy
    numpy reshape per batch (fixed-width lists), never a Python loop
    over elements; DuckDB replicates with a list_transform lambda."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def _f(t: pa.Table) -> pa.Table:
        from .stages.ann import QUANT

        col = t["embedding"].combine_chunks()
        flat = np.asarray(col.flatten().to_numpy(zero_copy_only=False), np.float64)
        offs = np.asarray(col.offsets.to_numpy(zero_copy_only=False), np.int64)
        qv = np.floor(flat * QUANT + 0.5).astype(np.int64)
        sq = qv * qv
        cum = np.concatenate([[0], np.cumsum(sq)])
        norm2 = cum[offs[1:]] - cum[offs[:-1]]
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "dims": pa.array(offs[1:] - offs[:-1], pa.int64()),
                "norm2_q": pa.array(norm2, pa.int64()),
            }
        )

    return emb.map_batches(_f, batch_format="pyarrow")


def events_top2_gap(sf_dir: str):
    """Per-user order statistics: the gap between the two largest event
    values (cents) — the '2nd max' shape that plain aggregates can't
    express.  Per-batch partial top-2 per user bounds the shuffle at two
    rows per (user, batch); buckets re-take top-2 vectorized.  Users
    with a single event drop out (no gap), same as the oracle's n >= 2
    filter."""
    ev = _read(sf_dir, "events", columns=["user_id", "value"])

    def _partial(t: pa.Table) -> pd.DataFrame:
        uid = np.asarray(t["user_id"].to_numpy(zero_copy_only=False), np.int64)
        cents = np.floor(
            np.asarray(t["value"].to_numpy(zero_copy_only=False), np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        df = pd.DataFrame({"user_id": uid, "cents": cents})
        df = df.sort_values(["user_id", "cents"], ascending=[True, False], kind="mergesort")
        out = df.groupby("user_id", sort=False).head(2)
        out["bucket"] = ((out["user_id"].to_numpy(np.int64) * 2654435761) % 4294967296) % SESSION_BUCKETS
        return out

    def _gap(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "cents"], ascending=[True, False], kind="mergesort")
        top2 = g.groupby("user_id", sort=False).head(2)
        s = top2.groupby("user_id", sort=False)["cents"]
        n = s.size()
        mx = s.max()
        mn = s.min()
        keep = n >= 2
        return pd.DataFrame(
            {
                "user_id": mx.index.to_numpy(np.int64)[keep.to_numpy()],
                "max_cents": mx.to_numpy(np.int64)[keep.to_numpy()],
                "second_cents": mn.to_numpy(np.int64)[keep.to_numpy()],
                "gap_cents": (mx - mn).to_numpy(np.int64)[keep.to_numpy()],
            }
        )

    return (
        ev.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_gap, batch_format="pandas")
    )


# --------------------------- calendar rollup / ship-delay histogram

def orders_quarterly_revenue(sf_dir: str):
    """Calendar rollup: revenue per (year, fiscal quarter).  Per-batch
    partials reduce to a bounded (year x 4) key space, so the Ray groupby
    is safe; year/quarter come from the same calendar functions on both
    sides (pyarrow temporal kernels vs DuckDB year()/month())."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def _partial(t: pa.Table) -> pd.DataFrame:
        year = pc.year(t["o_orderdate"]).to_numpy(zero_copy_only=False).astype(np.int64)
        month = pc.month(t["o_orderdate"]).to_numpy(zero_copy_only=False).astype(np.int64)
        quarter = (month - 1) // 3 + 1
        cents = np.floor(
            np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64) * 100.0
            + 0.5
        ).astype(np.int64)
        df = pd.DataFrame({"year": year, "quarter": quarter, "cents": cents})
        out = df.groupby(["year", "quarter"], sort=False).agg(
            part_n=("cents", "size"), part_cents=("cents", "sum")
        ).reset_index()
        return out.astype({c: np.int64 for c in out.columns})

    return (
        orders.map_batches(_partial, batch_format="pyarrow")
        .groupby(["year", "quarter"])
        .aggregate(Sum("part_n", alias_name="n"), Sum("part_cents", alias_name="revenue_cents"))
    )


DELAY_BIN_DAYS = 30


def lineitem_ship_delay_histogram(sf_dir: str):
    """Cross-table derived-duration histogram: days between order date
    and line-item ship date, binned into DELAY_BIN_DAYS buckets.  The
    order-date lookup is a sorted-array broadcast built remotely (the
    fact never shuffles); per-batch bincount partials leave a bounded
    bin-keyed groupby."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    from .stages.dedup import _sorted_kv_task

    def _day_col(col) -> np.ndarray:
        day = pc.cast(
            pc.days_between(
                pa.scalar(pd.Timestamp("1990-01-01"), pa.timestamp("us")),
                pc.floor_temporal(col, unit="day"),
            ),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        return np.asarray(day, np.int64)

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"]).map_batches(
        lambda t: pa.table(
            {
                "k": t["o_orderkey"],
                "v": pa.array(_day_col(t["o_orderdate"])),
            }
        ),
        batch_format="pyarrow",
    )
    refs = [br for b in orders.iter_internal_ref_bundles() for br in b.block_refs]
    kv_ref = _sorted_kv_task.remote(refs, "k", "v")

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])

    def _partial(t: pa.Table) -> pd.DataFrame:
        ks, vs = ray.get(kv_ref)
        ok = np.asarray(t["l_orderkey"].to_numpy(zero_copy_only=False), np.int64)
        oday = vs[np.searchsorted(ks, ok)]
        sday = _day_col(t["l_shipdate"])
        delay = sday - oday
        # negative delays exist in the synthetic data; numpy // floors
        # while DuckDB // truncates toward zero — offset to positive so
        # floor == trunc on both sides (the week-index offset trick)
        bin_id = (delay + 300_000) // DELAY_BIN_DAYS - 300_000 // DELAY_BIN_DAYS
        u, inv = np.unique(bin_id, return_inverse=True)
        return pd.DataFrame(
            {"bin": u.astype(np.int64), "part_n": np.bincount(inv).astype(np.int64)}
        )

    return (
        li.map_batches(_partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("part_n", alias_name="n"))
    )


# ------------------- TPC-H-shaped wave (round 4): the classic decision-
# support operator compositions the reference's users would expect from
# any engine claiming "query capabilities", each adapted to the synthetic
# schema (no partsupp/shipmode/phone columns) while keeping the SHAPE:
# EXISTS semi-join (q4), multi-join top-k (q10), CASE-bucketed dual
# aggregate (q12), left-join count histogram (q13), exact rational ratio
# (q14), NOT-IN anti + grouped distinct count (q16), HAVING over a big
# groupby (q18), OR-of-ANDs disjunctive predicate (q19), correlated
# scalar aggregate + recency anti-join (q22).  All money in cents, all
# constants shared with oracle.py.

Q4_START, Q4_END = "1996-01-01", "1996-07-01"
Q10_START, Q10_END = "1996-01-01", "1996-04-01"
Q10_TOPK = 20
Q12_DELAY_DAYS = 30
Q12_HIGH_PRIORITIES = ("1-URGENT", "2-HIGH")
Q14_START, Q14_END = "1996-03-01", "1996-04-01"
Q16_EXCLUDED_BRAND = "Brand#5"
Q16_SIZES = (1, 5, 10, 15, 20, 25)
Q18_MIN_QTY = 240
Q19_DISJUNCTS = (  # (brand, size_lo, size_hi, qty_lo, qty_hi)
    ("Brand#1", 1, 5, 1, 11),
    ("Brand#2", 1, 10, 10, 20),
    ("Brand#3", 1, 15, 20, 30),
)
Q22_CODES = (1, 3, 5)
Q22_CODE_MOD = 7
Q22_ACTIVE_SINCE = "1999-01-01"


def _ts(s: str):
    import datetime as _dt

    return _dt.datetime.fromisoformat(s)


def q4_order_priority(sf_dir: str):
    """EXISTS-shaped semi-join aggregate (TPC-H Q4 shape): orders in a
    date window that have at least one lineitem shipped AFTER the order
    date, counted per priority.  The correlated EXISTS becomes a
    per-order MAX(l_shipdate) (order-cardinality bucketed reduce) joined
    back through the generic hash_join — never a per-row subquery."""
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])

    def _maxship(t: pa.Table) -> pd.DataFrame:
        ok = np.asarray(t["l_orderkey"].to_numpy(zero_copy_only=False), np.int64)
        us = t["l_shipdate"].to_pandas().astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame({"o_orderkey": ok, "ship_us": us})
        agg = df.groupby("o_orderkey", sort=False)["ship_us"].max()
        out = pd.DataFrame(
            {"o_orderkey": agg.index.to_numpy(np.int64), "part_max": agg.to_numpy(np.int64)}
        )
        out["bucket"] = (out["o_orderkey"].to_numpy(np.int64) * 2654435761 % 2**32) % SESSION_BUCKETS
        return out

    def _maxreduce(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("o_orderkey", sort=False)["part_max"].max()
        return pd.DataFrame(
            {"o_orderkey": agg.index.to_numpy(np.int64), "max_ship_us": agg.to_numpy(np.int64)}
        )

    maxship = (
        li.map_batches(_maxship, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_maxreduce, batch_format="pandas")
    )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        filter=(pc.field("o_orderdate") >= _ts(Q4_START))
        & (pc.field("o_orderdate") < _ts(Q4_END)),
    )
    from .stages.join import hash_join

    joined = hash_join(
        orders,
        maxship,
        "o_orderkey",
        ["max_ship_us"],
        right_rows=_nrows(sf_dir, "orders"),
    )

    def _late(t: pa.Table) -> pd.DataFrame:
        od = t["o_orderdate"].to_pandas().astype("datetime64[us]").astype(np.int64)
        ms = np.asarray(t["max_ship_us"].to_numpy(zero_copy_only=False), np.int64)
        pr = t["o_orderpriority"].to_pandas().to_numpy(object)[ms > od]
        u, c = np.unique(pr, return_counts=True)
        return pd.DataFrame({"o_orderpriority": u, "part_n": c.astype(np.int64)})

    return (
        joined.map_batches(_late, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("part_n", alias_name="order_count"))
        .sort("o_orderpriority")
    )


def q10_returned_revenue(sf_dir: str) -> pd.DataFrame:
    """Returned-item revenue top-k (TPC-H Q10 shape): lineitem filtered
    to returnflag='R' at the read -> per-order partial cents -> join to
    date-windowed orders -> per-customer bucketed reduce -> distributed
    top-20 -> names for ONLY the 20 winners via predicate-pushdown dim
    reads (the top_customers de-driver pattern)."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import ray.data as rd

    from .stages.join import hash_join

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
        filter=pc.field("l_returnflag") == "R",
    )

    def _cents(t: pa.Table) -> pa.Table:
        price = np.asarray(t["l_extendedprice"].to_numpy(zero_copy_only=False), np.float64)
        disc = np.asarray(t["l_discount"].to_numpy(zero_copy_only=False), np.float64)
        c = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        df = pd.DataFrame({"o_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False), "cents": c})
        agg = df.groupby("o_orderkey", sort=False)["cents"].sum()
        return pa.table(
            {
                "o_orderkey": pa.array(agg.index.to_numpy(np.int64), pa.int64()),
                "cents": pa.array(agg.to_numpy(np.int64), pa.int64()),
            }
        )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") >= _ts(Q10_START))
        & (pc.field("o_orderdate") < _ts(Q10_END)),
    ).map_batches(lambda t: t.select(["o_orderkey", "o_custkey"]), batch_format="pyarrow")

    joined = hash_join(
        li.map_batches(_cents, batch_format="pyarrow"),
        orders,
        "o_orderkey",
        ["o_custkey"],
        right_rows=_nrows(sf_dir, "orders"),
    )

    def _percust(t: pa.Table) -> pd.DataFrame:
        ck = np.asarray(t["o_custkey"].to_numpy(zero_copy_only=False), np.int64)
        cents = np.asarray(t["cents"].to_numpy(zero_copy_only=False), np.int64)
        uniq, inv = np.unique(ck, return_inverse=True)
        out = pd.DataFrame(
            {
                "c_custkey": uniq,
                "part_cents": np.bincount(inv, weights=cents).astype(np.int64),
            }
        )
        out["bucket"] = (uniq * 2654435761 % 2**32) % SESSION_BUCKETS
        return out

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("c_custkey", sort=False)["part_cents"].sum()
        return pd.DataFrame(
            {
                "c_custkey": agg.index.to_numpy(np.int64),
                "revenue_cents": agg.to_numpy(np.int64),
            }
        )

    top = (
        joined.map_batches(_percust, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_reduce, batch_format="pandas")
        .sort(["revenue_cents", "c_custkey"], descending=[True, False])
        .limit(Q10_TOPK)
        .to_pandas()
    )
    keys = top["c_custkey"].to_numpy(np.int64)
    cust = (
        pads.dataset(f"{sf_dir}/customer.parquet")
        .to_table(
            columns=["c_custkey", "c_name", "c_nationkey"],
            filter=pc.field("c_custkey").isin(pa.array(keys, pa.int64())),
        )
        .to_pandas()
    )
    nat = (
        pads.dataset(f"{sf_dir}/nation.parquet")
        .to_table(columns=["n_nationkey", "n_name"])
        .to_pandas()
    )
    cust["c_custkey"] = cust["c_custkey"].astype(np.int64)
    name_of = dict(zip(cust["c_custkey"], cust["c_name"]))
    nk_of = dict(zip(cust["c_custkey"], cust["c_nationkey"].astype(np.int64)))
    nname = dict(zip(nat["n_nationkey"].astype(np.int64), nat["n_name"]))
    top["c_name"] = top["c_custkey"].map(name_of)
    top["n_name"] = top["c_custkey"].map(nk_of).map(nname)
    return top[["c_custkey", "c_name", "n_name", "revenue_cents"]].reset_index(drop=True)


def q12_late_lines(sf_dir: str):
    """CASE-bucketed dual aggregate over a big-big join (TPC-H Q12 shape,
    linestatus standing in for shipmode): lines shipped >= 30 days after
    the order date, split into high- vs low-priority counts per
    linestatus.  Timestamps compare as exact epoch-us integers."""
    from ray.data.aggregate import Sum

    from .stages.join import hash_join

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate", "l_linestatus"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"])

    joined = hash_join(
        li.map_batches(
            lambda t: t.rename_columns(["o_orderkey", "l_shipdate", "l_linestatus"]),
            batch_format="pyarrow",
        ),
        orders,
        "o_orderkey",
        ["o_orderdate", "o_orderpriority"],
        right_rows=_nrows(sf_dir, "orders"),
    )
    delay_us = Q12_DELAY_DAYS * 86_400_000_000

    def _partial(t: pa.Table) -> pd.DataFrame:
        ship = t["l_shipdate"].to_pandas().astype("datetime64[us]").astype(np.int64)
        od = t["o_orderdate"].to_pandas().astype("datetime64[us]").astype(np.int64)
        late = (ship - od) >= delay_us
        pr = t["o_orderpriority"].to_pandas().to_numpy(object)
        st = t["l_linestatus"].to_pandas().to_numpy(object)
        high = np.isin(pr, Q12_HIGH_PRIORITIES)
        df = pd.DataFrame(
            {
                "l_linestatus": st[late],
                "part_high": high[late].astype(np.int64),
                "part_low": (~high[late]).astype(np.int64),
            }
        )
        agg = df.groupby("l_linestatus", sort=False)[["part_high", "part_low"]].sum()
        out = agg.reset_index()
        out["part_high"] = out["part_high"].astype(np.int64)
        out["part_low"] = out["part_low"].astype(np.int64)
        return out

    return (
        joined.map_batches(_partial, batch_format="pyarrow")
        .groupby("l_linestatus")
        .aggregate(
            Sum("part_high", alias_name="high_line_count"),
            Sum("part_low", alias_name="low_line_count"),
        )
        .sort("l_linestatus")
    )


def q13_customer_distribution(sf_dir: str):
    """Left-join count histogram (TPC-H Q13 shape): orders per customer
    (a deterministic priority class excluded), then the distribution of
    customers per order count — INCLUDING the zero bucket, derived from
    the customer row count (parquet metadata) minus customers seen, so
    the customer dimension itself never joins."""
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority"],
        filter=pc.field("o_orderpriority") != "4-NOT SPECIFIED",
    )

    def _percust(t: pa.Table) -> pd.DataFrame:
        ck = np.asarray(t["o_custkey"].to_numpy(zero_copy_only=False), np.int64)
        uniq, inv = np.unique(ck, return_inverse=True)
        out = pd.DataFrame(
            {"c_custkey": uniq, "part_n": np.bincount(inv).astype(np.int64)}
        )
        out["bucket"] = (uniq * 2654435761 % 2**32) % SESSION_BUCKETS
        return out

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("c_custkey", sort=False)["part_n"].sum()
        cnt = agg.to_numpy(np.int64)
        u, c = np.unique(cnt, return_counts=True)
        return pd.DataFrame({"c_count": u.astype(np.int64), "part_dist": c.astype(np.int64)})

    hist = (
        orders.map_batches(_percust, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_reduce, batch_format="pandas")
        .groupby("c_count")
        .aggregate(Sum("part_dist", alias_name="custdist"))
        .to_pandas()
    )
    n_cust = _nrows(sf_dir, "customer")
    seen = int(hist["custdist"].sum())
    if n_cust > seen:
        hist = pd.concat(
            [hist, pd.DataFrame({"c_count": [0], "custdist": [n_cust - seen]})],
            ignore_index=True,
        )
    hist["c_count"] = hist["c_count"].astype(np.int64)
    hist["custdist"] = hist["custdist"].astype(np.int64)
    return hist.sort_values(
        ["custdist", "c_count"], ascending=[False, False]
    ).reset_index(drop=True)


def q14_promo_revenue(sf_dir: str):
    """Exact rational ratio aggregate (TPC-H Q14 shape): share of revenue
    from PROMO-type parts in one month, as integer permille (cross-
    multiplied — no float division anywhere).  Part attributes broadcast
    as a sorted kv array built remotely from block refs."""
    import pyarrow.compute as pc
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .stages.dedup import _sorted_kv_task

    part = _read(sf_dir, "part", columns=["p_partkey", "p_type"]).map_batches(
        lambda t: pa.table(
            {
                "k": t["p_partkey"],
                "v": pa.array(
                    np.asarray(pc.equal(t["p_type"], "PROMO").to_numpy(zero_copy_only=False), np.int64),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    kv_ref = _sorted_kv_task.remote(
        [br for bd in part.iter_internal_ref_bundles() for br in bd.block_refs], "k", "v"
    )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pc.field("l_shipdate") >= _ts(Q14_START))
        & (pc.field("l_shipdate") < _ts(Q14_END)),
    )

    def _partial(t: pa.Table) -> pd.DataFrame:
        ks, vs = ray.get(kv_ref)
        pk = np.asarray(t["l_partkey"].to_numpy(zero_copy_only=False), np.int64)
        promo = vs[np.searchsorted(ks, pk)] == 1
        price = np.asarray(t["l_extendedprice"].to_numpy(zero_copy_only=False), np.float64)
        disc = np.asarray(t["l_discount"].to_numpy(zero_copy_only=False), np.float64)
        cents = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        return pd.DataFrame(
            {
                "g": np.zeros(1, np.int64),
                "part_promo": [int(cents[promo].sum())],
                "part_total": [int(cents.sum())],
            }
        )

    agg = (
        li.map_batches(_partial, batch_format="pyarrow")
        .groupby("g")
        .aggregate(
            Sum("part_promo", alias_name="promo_cents"),
            Sum("part_total", alias_name="total_cents"),
        )
        .to_pandas()
    )
    promo = int(agg["promo_cents"].iloc[0])
    total = int(agg["total_cents"].iloc[0])
    return pd.DataFrame(
        {
            "promo_cents": pd.array([promo], "int64"),
            "total_cents": pd.array([total], "int64"),
            "promo_permille": pd.array([promo * 1000 // total], "int64"),
        }
    )


def q16_brand_supplier_count(sf_dir: str):
    """Grouped distinct-supplier count with a NOT-IN anti-filter (TPC-H
    Q16 shape; the part-supplier incidence derives from lineitem since
    the schema has no partsupp).  Two bounded bucketed reduces: global
    (partkey, suppkey) pair dedup, then (brand, size, suppkey) dedup —
    never a Ray groupby on a pair key.  'Complaint' suppliers (negative
    account balance) broadcast as a sorted array and anti-probed with
    searchsorted."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import ray
    from ray.data.aggregate import Sum

    # small-side: excluded suppliers + part attribute kv, driver reads
    # are bounded by the filters (suppliers with s_acctbal < 0)
    bad = (
        pads.dataset(f"{sf_dir}/supplier.parquet")
        .to_table(columns=["s_suppkey", "s_acctbal"], filter=pc.field("s_acctbal") < 0.0)
        .to_pandas()
    )
    bad_arr = np.sort(bad["s_suppkey"].to_numpy(np.int64))
    bad_ref = ray.put(bad_arr)

    from .stages.dedup import _sorted_kv_task

    sizes = np.asarray(Q16_SIZES, np.int64)
    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"]).map_batches(
        lambda t: pa.table(
            {
                "k": t["p_partkey"],
                # encode (brand_idx, size) as one int64; -1 = filtered out
                "v": pa.array(
                    np.where(
                        np.isin(np.asarray(t["p_size"].to_numpy(zero_copy_only=False), np.int64), sizes)
                        & ~np.asarray(pc.equal(t["p_brand"], Q16_EXCLUDED_BRAND).to_numpy(zero_copy_only=False), bool),
                        np.char.partition(
                            t["p_brand"].to_pandas().to_numpy("U16"), "#"
                        )[:, 2].astype(np.int64)
                        * 64
                        + np.asarray(t["p_size"].to_numpy(zero_copy_only=False), np.int64),
                        -1,
                    ),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    kv_ref = _sorted_kv_task.remote(
        [br for bd in part.iter_internal_ref_bundles() for br in bd.block_refs], "k", "v"
    )

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def _pairs(t: pa.Table) -> pd.DataFrame:
        pk = np.asarray(t["l_partkey"].to_numpy(zero_copy_only=False), np.int64)
        sk = np.asarray(t["l_suppkey"].to_numpy(zero_copy_only=False), np.int64)
        assert len(sk) == 0 or sk.max() < SUPP_PACK, "widen SUPP_PACK"
        key = np.unique(pk * SUPP_PACK + sk)
        return pd.DataFrame(
            {
                "bucket": ((key // SUPP_PACK * 2654435761) % 4294967296) % SESSION_BUCKETS,
                "key": key,
            }
        )

    def _dedup_attach(g: pd.DataFrame) -> pd.DataFrame:
        ks, vs = ray.get(kv_ref)
        bad_sorted = ray.get(bad_ref)
        key = np.unique(g["key"].to_numpy(np.int64))
        pk, sk = key // SUPP_PACK, key % SUPP_PACK
        code = vs[np.searchsorted(ks, pk)]
        keep = code >= 0
        if len(bad_sorted):
            pos = np.searchsorted(bad_sorted, sk)
            ok = pos < len(bad_sorted)
            is_bad = np.zeros(len(sk), bool)
            is_bad[ok] = bad_sorted[pos[ok]] == sk[ok]
            keep &= ~is_bad
        gs = np.unique(code[keep] * SUPP_PACK + sk[keep])  # (brand,size,supp) in-bucket
        return pd.DataFrame(
            {
                "bucket2": ((gs * 2654435761) % 4294967296) % SESSION_BUCKETS,
                "gskey": gs,
            }
        )

    def _count(g: pd.DataFrame) -> pd.DataFrame:
        gs = np.unique(g["gskey"].to_numpy(np.int64))
        code = gs // SUPP_PACK
        u, c = np.unique(code, return_counts=True)
        return pd.DataFrame({"code": u.astype(np.int64), "part_cnt": c.astype(np.int64)})

    agg = (
        li.map_batches(_pairs, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_dedup_attach, batch_format="pandas")
        .groupby("bucket2")
        .map_groups(_count, batch_format="pandas")
        .groupby("code")
        .aggregate(Sum("part_cnt", alias_name="supplier_cnt"))
        .to_pandas()
    )
    code = agg["code"].to_numpy(np.int64)
    agg["p_brand"] = pd.array(["Brand#" + str(b) for b in code // 64], "object")
    agg["p_size"] = (code % 64).astype(np.int64)
    agg["supplier_cnt"] = agg["supplier_cnt"].astype(np.int64)
    return (
        agg[["p_brand", "p_size", "supplier_cnt"]]
        .sort_values(
            ["supplier_cnt", "p_brand", "p_size"], ascending=[False, True, True]
        )
        .reset_index(drop=True)
    )


def q18_large_orders(sf_dir: str) -> pd.DataFrame:
    """HAVING over a big groupby (TPC-H Q18 shape): orders whose total
    quantity is >= Q18_MIN_QTY (order-cardinality bucketed reduce with a
    per-batch partial), joined back to orders and top-100 by price; the
    winners' customer names come from a predicate-pushdown dim read.
    Quantities are integral in the data — summed as exact int64."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    from .stages.join import hash_join

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def _partial(t: pa.Table) -> pd.DataFrame:
        ok = np.asarray(t["l_orderkey"].to_numpy(zero_copy_only=False), np.int64)
        q = np.asarray(t["l_quantity"].to_numpy(zero_copy_only=False), np.float64)
        qi = np.floor(q + 0.5).astype(np.int64)
        uniq, inv = np.unique(ok, return_inverse=True)
        out = pd.DataFrame(
            {"o_orderkey": uniq, "part_q": np.bincount(inv, weights=qi).astype(np.int64)}
        )
        out["bucket"] = (uniq * 2654435761 % 2**32) % SESSION_BUCKETS
        return out

    def _having(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("o_orderkey", sort=False)["part_q"].sum()
        agg = agg[agg >= Q18_MIN_QTY]
        return pd.DataFrame(
            {
                "o_orderkey": agg.index.to_numpy(np.int64),
                "sum_qty": agg.to_numpy(np.int64),
            }
        )

    big = (
        li.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_having, batch_format="pandas")
    )
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    )
    joined = hash_join(
        big, orders, "o_orderkey",
        ["o_custkey", "o_totalprice", "o_orderdate"],
        right_rows=_nrows(sf_dir, "orders"),
    )

    def _cents(t: pa.Table) -> pa.Table:
        p = np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64)
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "o_orderdate": t["o_orderdate"],
                "o_totalprice_cents": pa.array(np.floor(p * 100.0 + 0.5).astype(np.int64)),
                "sum_qty": t["sum_qty"],
            }
        )

    top = (
        joined.map_batches(_cents, batch_format="pyarrow")
        .sort(["o_totalprice_cents", "o_orderkey"], descending=[True, False])
        .limit(100)
        .to_pandas()
    )
    keys = top["o_custkey"].to_numpy(np.int64)
    cust = (
        pads.dataset(f"{sf_dir}/customer.parquet")
        .to_table(
            columns=["c_custkey", "c_name"],
            filter=pc.field("c_custkey").isin(pa.array(np.unique(keys), pa.int64())),
        )
        .to_pandas()
    )
    name_of = dict(zip(cust["c_custkey"].astype(np.int64), cust["c_name"]))
    top["c_name"] = top["o_custkey"].map(name_of)
    out = top.rename(columns={"o_custkey": "c_custkey"})
    return out[
        ["c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice_cents", "sum_qty"]
    ].reset_index(drop=True)


def q19_disjunctive_revenue(sf_dir: str):
    """Disjunctive multi-predicate revenue (TPC-H Q19 shape): three
    (brand, size-range, quantity-range) AND-clauses OR-ed together,
    evaluated as one vectorized boolean expression per batch against the
    broadcast part attributes.  Single-row exact cents output."""
    import ray
    from ray.data.aggregate import Sum

    from .stages.dedup import _sorted_kv_task

    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"]).map_batches(
        lambda t: pa.table(
            {
                "k": t["p_partkey"],
                # brand_idx * 64 + size in one int64
                "v": pa.array(
                    np.char.partition(t["p_brand"].to_pandas().to_numpy("U16"), "#")[:, 2].astype(np.int64) * 64
                    + np.asarray(t["p_size"].to_numpy(zero_copy_only=False), np.int64),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    kv_ref = _sorted_kv_task.remote(
        [br for bd in part.iter_internal_ref_bundles() for br in bd.block_refs], "k", "v"
    )
    disjuncts = tuple(
        (int(b.split("#")[1]), slo, shi, qlo, qhi) for b, slo, shi, qlo, qhi in Q19_DISJUNCTS
    )

    li = _read(
        sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]
    )

    def _partial(t: pa.Table) -> pd.DataFrame:
        ks, vs = ray.get(kv_ref)
        pk = np.asarray(t["l_partkey"].to_numpy(zero_copy_only=False), np.int64)
        code = vs[np.searchsorted(ks, pk)]
        brand, size = code // 64, code % 64
        qty = np.floor(
            np.asarray(t["l_quantity"].to_numpy(zero_copy_only=False), np.float64) + 0.5
        ).astype(np.int64)
        mask = np.zeros(len(pk), bool)
        for bi, slo, shi, qlo, qhi in disjuncts:
            mask |= (brand == bi) & (size >= slo) & (size <= shi) & (qty >= qlo) & (qty <= qhi)
        price = np.asarray(t["l_extendedprice"].to_numpy(zero_copy_only=False), np.float64)
        disc = np.asarray(t["l_discount"].to_numpy(zero_copy_only=False), np.float64)
        cents = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        return pd.DataFrame(
            {"g": np.zeros(1, np.int64), "part_cents": [int(cents[mask].sum())],
             "part_n": [int(mask.sum())]}
        )

    return (
        li.map_batches(_partial, batch_format="pyarrow")
        .groupby("g")
        .aggregate(
            Sum("part_cents", alias_name="revenue_cents"),
            Sum("part_n", alias_name="n_lines"),
        )
        .map_batches(
            lambda t: t.select(["revenue_cents", "n_lines"]), batch_format="pyarrow"
        )
    )


def q22_idle_customers(sf_dir: str):
    """Correlated scalar aggregate + recency anti-join (TPC-H Q22 shape):
    customers in a deterministic 'country code' set (custkey mod), with
    balance above the positive-balance average of that set, and NO order
    since Q22_ACTIVE_SINCE — grouped by code.  The average comparison is
    exact integer cross-multiplication (bal * n > sum); recent-buyer keys
    broadcast as a remote-built sorted array, probed with searchsorted."""
    import pyarrow.compute as pc
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from .stages.dedup import _remote_sorted_column

    codes = np.asarray(Q22_CODES, np.int64)

    def _base(t: pa.Table) -> pa.Table:
        ck = np.asarray(t["c_custkey"].to_numpy(zero_copy_only=False), np.int64)
        bal = np.floor(
            np.asarray(t["c_acctbal"].to_numpy(zero_copy_only=False), np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        keep = np.isin(ck % Q22_CODE_MOD, codes)
        return pa.table(
            {
                "c_custkey": pa.array(ck[keep], pa.int64()),
                "code": pa.array(ck[keep] % Q22_CODE_MOD, pa.int64()),
                "bal_cents": pa.array(bal[keep], pa.int64()),
            }
        )

    base = _read(sf_dir, "customer", columns=["c_custkey", "c_acctbal"]).map_batches(
        _base, batch_format="pyarrow"
    )

    stats = (
        base.map_batches(
            lambda t: pa.table(
                {
                    "g": pa.array(np.zeros(1, np.int64)),
                    "part_s": pa.array(
                        [int(np.asarray(t["bal_cents"].to_numpy(zero_copy_only=False), np.int64)[
                            np.asarray(t["bal_cents"].to_numpy(zero_copy_only=False), np.int64) > 0
                        ].sum())], pa.int64()
                    ),
                    "part_n": pa.array(
                        [int((np.asarray(t["bal_cents"].to_numpy(zero_copy_only=False), np.int64) > 0).sum())],
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("g")
        .aggregate(Sum("part_s", alias_name="s"), Sum("part_n", alias_name="n"))
        .to_pandas()
    )
    s, n = int(stats["s"].iloc[0]), int(stats["n"].iloc[0])

    recent = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"],
        filter=pc.field("o_orderdate") >= _ts(Q22_ACTIVE_SINCE),
    ).map_batches(
        lambda t: pa.table({"o_custkey": pc.unique(t["o_custkey"])}),
        batch_format="pyarrow",
    )
    recent_ref = _remote_sorted_column(recent, "o_custkey")

    def _sel(t: pa.Table) -> pd.DataFrame:
        buyers = ray.get(recent_ref)
        ck = np.asarray(t["c_custkey"].to_numpy(zero_copy_only=False), np.int64)
        bal = np.asarray(t["bal_cents"].to_numpy(zero_copy_only=False), np.int64)
        code = np.asarray(t["code"].to_numpy(zero_copy_only=False), np.int64)
        keep = bal * n > s
        if len(buyers):
            pos = np.searchsorted(buyers, ck)
            ok = pos < len(buyers)
            has = np.zeros(len(ck), bool)
            has[ok] = buyers[pos[ok]] == ck[ok]
            keep &= ~has
        u, inv = np.unique(code[keep], return_inverse=True)
        return pd.DataFrame(
            {
                "cntrycode": u.astype(np.int64),
                "part_n": np.bincount(inv).astype(np.int64),
                "part_bal": np.bincount(inv, weights=bal[keep]).astype(np.int64),
            }
        )

    return (
        base.map_batches(_sel, batch_format="pyarrow")
        .groupby("cntrycode")
        .aggregate(
            Sum("part_n", alias_name="numcust"),
            Sum("part_bal", alias_name="totacctbal_cents"),
        )
        .sort("cntrycode")
    )


# -------------------- round-4 spatial geometry wave: polygon area
# aggregate (ST_Area), spatial anti-join, area-weighted vector->raster
# cell coverage.  Parcel coordinates are integral meters, so every
# shoelace cross product and clip difference is exact in float64.

COVERAGE_RES = 9  # 1 km cells (functions/cells DEFAULT_RES)


def parcel_area_by_grid(sf_dir: str):
    """Polygon geometry aggregate: shoelace area + bbox centroid of every
    parcel (general packed-ring kernel, vectorized), rolled up per
    address grid.  The parcel layer is the broadcast-small reference
    side by design; the kernel is the operator under test."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from .functions.pip import PackedPolygons, polygon_areas
    from .sources.synthetic import address_points_table, parcels_table

    ap = address_points_table()
    grid_of = dict(
        zip(ap["point_id"].to_pylist(), ap["address_grid"].to_pylist())
    )

    def _area(t: pa.Table) -> pd.DataFrame:
        pid = t["parcel_id"].to_pylist()
        rings = t["rings"].to_pylist()
        pp = PackedPolygons(rings)
        area = polygon_areas(pp)
        cx = (pp.bbox_min_x + pp.bbox_max_x) * 0.5
        cy = (pp.bbox_min_y + pp.bbox_max_y) * 0.5
        grids = np.array([grid_of[int(p[1:])] for p in pid], object)
        return pd.DataFrame(
            {"address_grid": grids, "area_m2": area, "cx": cx, "cy": cy}
        )

    return (
        rd.from_arrow(parcels_table())
        .map_batches(_area, batch_format="pyarrow")
        .groupby("address_grid")
        .aggregate(
            Count(alias_name="n_parcels"),
            Sum("area_m2", alias_name="total_area_m2"),
            Sum("cx", alias_name="sum_cx"),
            Sum("cy", alias_name="sum_cy"),
        )
        .sort("address_grid")
    )


def points_outside_parcels(sf_dir: str):
    """Spatial ANTI-join: anchored query points contained by NO parcel
    (left-outer PIP + null filter — NOT EXISTS as a composition of the
    existing containment operator).  Output is the uncovered query_id
    stream, input-proportional."""
    import pyarrow.compute as pc

    from .pipelines.spatial import pip_join as _pip

    out = _pip(sf_dir)
    return out.map_batches(
        lambda t: t.filter(pc.is_null(t["parcel_id"])).select(["query_id"]),
        batch_format="pyarrow",
    )


def parcel_cell_coverage(sf_dir: str):
    """Area-weighted vector->raster: each parcel's EXACT intersection
    area with every 1 km grid cell it touches (np.repeat flat-map +
    LEAST/GREATEST clipping — all integral meters, exact in float64),
    summed per cell.  The coverage-fraction raster every impervious-
    surface / land-use pipeline computes."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from .functions.cells import EXTENT, X0, Y0
    from .sources.synthetic import PARCEL_HALF, address_points_table

    n = 1 << COVERAGE_RES
    s = EXTENT / n
    ap = address_points_table().select(["point_id", "x", "y"])

    def _cover(t: pa.Table) -> pd.DataFrame:
        x = np.asarray(t["x"].to_numpy(zero_copy_only=False), np.float64)
        y = np.asarray(t["y"].to_numpy(zero_copy_only=False), np.float64)
        h = PARCEL_HALF
        x0, x1, y0, y1 = x - h, x + h, y - h, y + h
        ix0 = np.floor((x0 - X0) / s).astype(np.int64)
        ix1 = np.floor((x1 - X0) / s).astype(np.int64)  # inclusive
        iy0 = np.floor((y0 - Y0) / s).astype(np.int64)
        iy1 = np.floor((y1 - Y0) / s).astype(np.int64)
        cxn = ix1 - ix0 + 1
        cyn = iy1 - iy0 + 1
        reps = cxn * cyn
        idx = np.repeat(np.arange(len(x)), reps)
        start = np.cumsum(reps) - reps
        o = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(start, reps)
        tix = ix0[idx] + o // cyn[idx]
        tiy = iy0[idx] + o % cyn[idx]
        cell_x0 = X0 + tix * s
        cell_y0 = Y0 + tiy * s
        w = np.minimum(x1[idx], cell_x0 + s) - np.maximum(x0[idx], cell_x0)
        hgt = np.minimum(y1[idx], cell_y0 + s) - np.maximum(y0[idx], cell_y0)
        area = w * hgt
        df = pd.DataFrame({"cell": tiy * n + tix, "area_m2": area})
        agg = df.groupby("cell", sort=False).agg(
            part_n=("area_m2", "size"), part_area=("area_m2", "sum")
        )
        out = agg.reset_index()
        out["part_n"] = out["part_n"].astype(np.int64)
        return out

    return (
        rd.from_arrow(ap)
        .map_batches(_cover, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(
            Sum("part_n", alias_name="n_parcels"),
            Sum("part_area", alias_name="covered_area_m2"),
        )
        .sort("cell")
    )


MOVING_WINDOW_ROWS = 3


def events_moving_sum(sf_dir: str):
    """Trailing ROWS-window aggregate (SUM OVER ... ROWS BETWEEN 2
    PRECEDING AND CURRENT ROW): per-user 3-event moving sum of cents in
    (ts, event_id) order.  One user-bucket shuffle; inside each bucket
    the window is a vectorized shifted-cumsum difference with an exact
    per-segment base (no maximum.accumulate — the round-3 cusum
    lesson)."""
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])

    def _bucket(t: pa.Table) -> pd.DataFrame:
        uid = np.asarray(t["user_id"].to_numpy(zero_copy_only=False), np.int64)
        return pd.DataFrame(
            {
                "user_id": uid,
                "event_id": np.asarray(t["event_id"].to_numpy(zero_copy_only=False), np.int64),
                "us": t["ts"].to_pandas().astype("datetime64[us]").astype(np.int64),
                "cents": np.floor(
                    np.asarray(t["value"].to_numpy(zero_copy_only=False), np.float64) * 100.0 + 0.5
                ).astype(np.int64),
                "bucket": ((uid * 2654435761) % 4294967296) % SESSION_BUCKETS,
            }
        )

    w = MOVING_WINDOW_ROWS

    def _window(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "us", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        cents = g["cents"].to_numpy(np.int64)
        new = np.zeros(len(g), bool)
        new[0] = True
        new[1:] = uid[1:] != uid[:-1]
        grp = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        cum = np.cumsum(cents)
        seg_base = (cum[starts] - cents[starts])[grp]  # exact, sign-independent
        pos = np.arange(len(g)) - starts[grp]  # 0-based position in segment
        # rows with pos >= w subtract cum[i-w]; earlier rows subtract the
        # segment base (window clipped at the partition start)
        shifted = np.concatenate([np.zeros(w, np.int64), cum[:-w]]) if len(g) >= w else np.zeros(len(g), np.int64)
        w3 = np.where(pos >= w, cum - shifted, cum - seg_base)
        return pd.DataFrame(
            {"event_id": g["event_id"].to_numpy(np.int64), "w3_cents": w3.astype(np.int64)}
        )

    return (
        ev.map_batches(_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_window, batch_format="pandas")
    )


def media_dedup_report(sf_dir: str) -> pd.DataFrame:
    """Multimodal exact dedup: identical binary payloads (the docs-derived
    media fixture, payload = utf-8 bytes of text) collapsed by 128-bit
    content hash per media type.  Same int-only shuffle discipline as
    curate_pages: md5 pairs per batch, coarse-bucket in-bucket dedup,
    3-row final aggregate.  Output: totals vs unique counts and bytes per
    type — the storage-savings report a media-ingest pipeline prints."""
    from ray.data.aggregate import Sum

    from .pipelines.curate import _md5_pair

    docs = _docs(sf_dir)

    def _partial(t: pa.Table) -> pd.DataFrame:
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), np.int64)
        texts = t["text"].to_pylist()
        nb = np.asarray([len(s.encode("utf-8")) for s in texts], np.int64)
        ty = ids % 3
        hi, lo = _md5_pair(texts)
        df = pd.DataFrame({"ty": ty, "hi": hi, "lo": lo, "nb": nb})
        u = df.drop_duplicates(["ty", "hi", "lo"])
        out = pd.DataFrame(
            {
                "bucket": (u["hi"].to_numpy(np.int64).astype(np.uint64) % np.uint64(CURATE_BUCKETS_MEDIA)).astype(np.int64),
                "ty": u["ty"].to_numpy(np.int64),
                "hi": u["hi"].to_numpy(np.int64),
                "lo": u["lo"].to_numpy(np.int64),
                "nb": u["nb"].to_numpy(np.int64),
            }
        )
        # ride the totals along as per-batch partial rows (ty-keyed)
        tot = df.groupby("ty", sort=False)["nb"].agg(["size", "sum"]).reset_index()
        out2 = pd.DataFrame(
            {
                "bucket": np.full(len(tot), -1, np.int64),
                "ty": tot["ty"].to_numpy(np.int64),
                "hi": tot["size"].to_numpy(np.int64),   # part_n in the totals rows
                "lo": tot["sum"].to_numpy(np.int64),    # part_bytes
                "nb": np.zeros(len(tot), np.int64),
            }
        )
        return pd.concat([out, out2], ignore_index=True)

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        if (g["bucket"] == -1).all():  # totals bucket
            agg = g.groupby("ty", sort=False)[["hi", "lo"]].sum()
            return pd.DataFrame(
                {
                    "ty": agg.index.to_numpy(np.int64),
                    "n_total": agg["hi"].to_numpy(np.int64),
                    "total_bytes": agg["lo"].to_numpy(np.int64),
                    "n_unique": np.zeros(len(agg), np.int64),
                    "unique_bytes": np.zeros(len(agg), np.int64),
                }
            )
        u = g.drop_duplicates(["ty", "hi", "lo"])
        agg = u.groupby("ty", sort=False)["nb"].agg(["size", "sum"])
        return pd.DataFrame(
            {
                "ty": agg.index.to_numpy(np.int64),
                "n_total": np.zeros(len(agg), np.int64),
                "total_bytes": np.zeros(len(agg), np.int64),
                "n_unique": agg["size"].to_numpy(np.int64),
                "unique_bytes": agg["sum"].to_numpy(np.int64),
            }
        )

    from ray.data.aggregate import Sum as _S

    out = (
        docs.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_reduce, batch_format="pandas")
        .groupby("ty")
        .aggregate(
            _S("n_total", alias_name="n_total"),
            _S("total_bytes", alias_name="total_bytes"),
            _S("n_unique", alias_name="n_unique"),
            _S("unique_bytes", alias_name="unique_bytes"),
        )
        .to_pandas()
    )
    types = np.array(["image", "audio", "video"], object)
    out["media_type"] = types[out["ty"].to_numpy(np.int64)]
    cols = ["media_type", "n_total", "n_unique", "total_bytes", "unique_bytes"]
    for c in cols[1:]:
        out[c] = out[c].astype(np.int64)
    return out[cols].sort_values("media_type").reset_index(drop=True)


CURATE_BUCKETS_MEDIA = 64


def orders_skyline(sf_dir: str) -> pd.DataFrame:
    """Skyline / Pareto-frontier query: orders not dominated on
    (o_totalprice_cents, order day) — dominate = >= on both, > on at
    least one.  Distributed shape: per-batch LOCAL frontier (any
    globally non-dominated row is non-dominated in its batch, so local
    pruning is lossless), tiny global frontier pass on the union of
    local fronts.  Oracle: NOT EXISTS dominator."""
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice", "o_orderdate"])

    def _front(cents: np.ndarray, day: np.ndarray) -> np.ndarray:
        """Boolean mask of the pareto-max frontier (maximize both)."""
        order = np.lexsort((-day, -cents))  # cents desc, day desc
        best_day = np.int64(np.iinfo(np.int64).min)
        keep = np.zeros(len(cents), bool)
        c_sorted = cents[order]
        d_sorted = day[order]
        # walk cents-descending: a row is dominated iff some earlier row
        # (>= cents) has >= day and one strict; track max day among
        # STRICTLY greater cents seen so far, plus equal-cents handling
        i = 0
        n = len(order)
        while i < n:
            j = i
            while j < n and c_sorted[j] == c_sorted[i]:
                j += 1
            grp = order[i:j]
            d_grp = d_sorted[i:j]
            gmax = d_grp.max()
            # equal cents: only rows at the group-max day survive in-group
            # dominance (equal-on-both duplicates all survive), and only
            # if that day strictly beats every higher-cents row's day
            keep[grp] = (d_grp == gmax) & (gmax > best_day)
            best_day = max(best_day, gmax)
            i = j
        return keep

    def _local(t: pa.Table) -> pd.DataFrame:
        cents = np.floor(
            np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        day = (
            t["o_orderdate"].to_pandas().astype("datetime64[us]").astype(np.int64)
            // 86_400_000_000
        ).to_numpy(np.int64)
        ok = np.asarray(t["o_orderkey"].to_numpy(zero_copy_only=False), np.int64)
        m = _front(cents, day)
        return pd.DataFrame(
            {"o_orderkey": ok[m], "price_cents": cents[m], "day_num": day[m]}
        )

    local = orders.map_batches(_local, batch_format="pyarrow").to_pandas()
    cents = local["price_cents"].to_numpy(np.int64)
    day = local["day_num"].to_numpy(np.int64)
    m = _front(cents, day)
    out = local[m].sort_values("o_orderkey").reset_index(drop=True)
    out["o_orderkey"] = out["o_orderkey"].astype(np.int64)
    return out[["o_orderkey", "price_cents", "day_num"]]


SNAP_RADIUS_M = 2000


SNAP_CELL_M = 4096  # blocking cell edge (>= radius not required; bboxes inflate by R)


def _snap_seg_arrays():
    """Segment layer as flat int64 arrays (module-level so the cell-blocked
    kernel and tests share one loader)."""
    from .sources.synthetic import _road_segment_rows

    segs = _road_segment_rows()
    return {
        "ax": np.asarray([r["ax"] for r in segs], np.int64),
        "ay": np.asarray([r["ay"] for r in segs], np.int64),
        "bx": np.asarray([r["bx"] for r in segs], np.int64),
        "by": np.asarray([r["by"] for r in segs], np.int64),
        "sid": np.asarray([r["seg_id"] for r in segs], np.int64),
        "len2": np.asarray([r["len2"] for r in segs], np.int64),
    }


def _build_snap_cells(seg: dict, radius: int, cell: int):
    """CSR cell index over segments: each segment registers in every cell
    its R-inflated bbox overlaps, so a point probing ONLY ITS OWN cell
    sees every segment within R (completeness: |p-s| <= R means the
    inflated bbox contains p).  Returns (cell_keys_sorted, starts, seg_idx)
    with per-cell seg_idx ascending — the argmin-first tie-break order."""
    x0 = (np.minimum(seg["ax"], seg["bx"]) - radius) // cell
    x1 = (np.maximum(seg["ax"], seg["bx"]) + radius) // cell
    y0 = (np.minimum(seg["ay"], seg["by"]) - radius) // cell
    y1 = (np.maximum(seg["ay"], seg["by"]) + radius) // cell
    nx = (x1 - x0 + 1).astype(np.int64)
    ny = (y1 - y0 + 1).astype(np.int64)
    counts = nx * ny
    owner = np.repeat(np.arange(len(counts)), counts)
    pos = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    cx = x0[owner] + pos // ny[owner]
    cy = y0[owner] + pos % ny[owner]
    key = cx * (1 << 20) + cy
    order = np.lexsort((owner, key))
    key_s, owner_s = key[order], owner[order]
    uk, starts, cnt = np.unique(key_s, return_index=True, return_counts=True)
    return uk, starts, np.append(starts[1:], len(key_s)), owner_s


def snap_points_to_roads(sf_dir: str):
    """Map matching: snap every anchored query point to its nearest road
    segment within SNAP_RADIUS_M (the polyline layer derived from the
    centerline streets).  ALL arithmetic is exact int64 — squared
    point-segment distance carried as the rational (d2_num, len2) with
    d2_num = |p-a|^2*len2 - dot^2 clamped to the endpoints — and the
    winner comparator is d2_num/len2 in float64, which is EXACT for every
    in-radius candidate (d2_num <= R^2*len2 < 2^53), identical IEEE ops
    in numpy and DuckDB.  Candidates come from the matcher's own
    CELL-BLOCKING recipe (round-4 verdict #8): segments register in every
    SNAP_CELL_M cell their R-inflated bbox overlaps (CSR broadcast built
    once), each point probes only its own cell — complete for radius R,
    and the per-batch work is candidate pairs, not N x S (the dense pass
    was right for the 144-segment fixture but not for a real centerline
    layer; tests/test_pip_knn.py pins blocked == dense on a 20k-segment
    layer where dense would not fit a batch).  Ties break to the smallest
    seg_id (per-cell candidate lists are seg-ascending; first-min wins)."""
    from .pipelines.spatial import derive_anchored_points

    seg = _snap_seg_arrays()
    index = _build_snap_cells(seg, SNAP_RADIUS_M, SNAP_CELL_M)

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber"])

    def _snap(t: pa.Table) -> pd.DataFrame:
        pts = derive_anchored_points(t)
        qx = np.asarray(pts["qx"].to_numpy(zero_copy_only=False), np.int64)
        qy = np.asarray(pts["qy"].to_numpy(zero_copy_only=False), np.int64)
        qid = np.asarray(pts["query_id"].to_numpy(zero_copy_only=False), np.int64)
        return snap_blocked(qx, qy, qid, seg, index, SNAP_RADIUS_M, SNAP_CELL_M)

    return li.map_batches(_snap, batch_format="pyarrow", batch_size=4096)


def snap_blocked(
    qx: np.ndarray,
    qy: np.ndarray,
    qid: np.ndarray,
    seg: dict,
    index,
    radius: int,
    cell: int,
) -> pd.DataFrame:
    """One vectorized cell-blocked snap pass: span-gather each point's
    cell candidates, exact rational distances on the flat pair list,
    first-min winner per point (ties -> smallest seg_id)."""
    uk, starts, ends, seg_idx = index
    pkey = (qx // cell) * (1 << 20) + qy // cell
    pos = np.searchsorted(uk, pkey)
    pos_ok = pos < len(uk)
    hit = np.zeros(len(pkey), bool)
    hit[pos_ok] = uk[pos[pos_ok]] == pkey[pos_ok]
    empty = pd.DataFrame(
        {
            "query_id": pd.array([], "int64"),
            "seg_id": pd.array([], "int64"),
            "d2_num": pd.array([], "int64"),
            "len2": pd.array([], "int64"),
        }
    )
    if not hit.any():
        return empty
    p_sel = np.flatnonzero(hit)
    lo = starts[pos[p_sel]]
    n_cand = ends[pos[p_sel]] - lo
    total = int(n_cand.sum())
    if total == 0:
        return empty
    pi = np.repeat(p_sel, n_cand)
    flat = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(n_cand) - n_cand, n_cand
    ) + np.repeat(lo, n_cand)
    si = seg_idx[flat]
    ax, ay, bx, by = seg["ax"][si], seg["ay"][si], seg["bx"][si], seg["by"][si]
    len2 = seg["len2"][si]
    abx, aby = bx - ax, by - ay
    dxa, dya = qx[pi] - ax, qy[pi] - ay
    dxb, dyb = qx[pi] - bx, qy[pi] - by
    dot = dxa * abx + dya * aby
    d2a = dxa * dxa + dya * dya
    d2b = dxb * dxb + dyb * dyb
    num = np.where(
        dot <= 0,
        d2a * len2,
        np.where(dot >= len2, d2b * len2, d2a * len2 - dot * dot),
    )
    ok = num <= radius * radius * len2
    if not ok.any():
        return empty
    pi, si, num, len2 = pi[ok], si[ok], num[ok], len2[ok]
    key = num.astype(np.float64) / len2
    # winner per point: sort by (point, key, seg_id) — the oracle's
    # ORDER BY CAST(d2_num AS DOUBLE)/len2, seg_id tie-break exactly
    order = np.lexsort((seg["sid"][si], key, pi))
    pi_s = pi[order]
    first = np.ones(len(pi_s), bool)
    first[1:] = pi_s[1:] != pi_s[:-1]
    w = order[first]
    return pd.DataFrame(
        {
            "query_id": qid[pi[w]],
            "seg_id": seg["sid"][si[w]],
            "d2_num": num[w],
            "len2": len2[w],
        }
    )


def user_event_gini(sf_dir: str):
    """Per-user event-type concentration as EXACT rational Gini impurity:
    gini = 1 - sum(p_t^2) carried as (gini_num, n) with
    gini_num = n^2 - sum(c_t^2) — no floats, no ln (the
    information-theoretic feature without the transcendental).  One
    user-bucket shuffle; per-batch (user, type) partial counts."""
    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def _partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "user_id": np.asarray(t["user_id"].to_numpy(zero_copy_only=False), np.int64),
                "event_type": t["event_type"].to_pandas().to_numpy(object),
            }
        )
        agg = df.groupby(["user_id", "event_type"], sort=False).size().reset_index(name="part_c")
        agg["bucket"] = (
            agg["user_id"].to_numpy(np.int64) * 2654435761 % 2**32
        ) % SESSION_BUCKETS
        agg["part_c"] = agg["part_c"].astype(np.int64)
        return agg

    def _gini(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["user_id", "event_type"], sort=False)["part_c"].sum()
        idx = c.index.to_frame(index=False)
        df = pd.DataFrame({"user_id": idx["user_id"].to_numpy(np.int64), "c": c.to_numpy(np.int64)})
        agg = df.groupby("user_id", sort=False)["c"].agg(n="sum", sq=lambda s: int((s.to_numpy(np.int64) ** 2).sum()))
        n = agg["n"].to_numpy(np.int64)
        sq = agg["sq"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "user_id": agg.index.to_numpy(np.int64),
                "n_events": n,
                "gini_num": n * n - sq,
            }
        )

    return (
        ev.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_gini, batch_format="pandas")
    )


# ------------------------------------------------- TPC-H wave 2 (round 4)

def _nat_kv_ref(sf_dir: str, table: str, key: str, val: str):
    """Sorted-kv broadcast (built by a remote task from block refs) of an
    int dimension column — the q5 join plan's lookup primitive."""
    from .stages.dedup import _sorted_kv_task

    ds = _read(sf_dir, table, columns=[key, val]).map_batches(
        lambda t, k=key, v=val: pa.table(
            {
                "k": pa.array(np.asarray(t[k].to_numpy(zero_copy_only=False), np.int64)),
                "v": pa.array(np.asarray(t[v].to_numpy(zero_copy_only=False), np.int64)),
            }
        ),
        batch_format="pyarrow",
    )
    refs = [br for b in ds.iter_internal_ref_bundles() for br in b.block_refs]
    return _sorted_kv_task.remote(refs, "k", "v")


def _rev_cents(t: pa.Table, keep=None) -> np.ndarray:
    """floor(extendedprice*(1-discount)*100+0.5) — the shared discounted
    revenue quantization (identical expression in every oracle)."""
    price = np.asarray(t["l_extendedprice"].to_numpy(zero_copy_only=False), np.float64)
    disc = np.asarray(t["l_discount"].to_numpy(zero_copy_only=False), np.float64)
    if keep is not None:
        price, disc = price[keep], disc[keep]
    return np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)


def _ts_year(col: pa.ChunkedArray, keep=None) -> np.ndarray:
    """Calendar year of a timestamp[us] column as int64 (numpy M8[Y] is
    exact integer calendar arithmetic — matches SQL EXTRACT(year ...))."""
    ts = col.to_numpy(zero_copy_only=False)
    if keep is not None:
        ts = ts[keep]
    return ts.astype("datetime64[Y]").astype(np.int64) + 1970


def _nation_names(sf_dir: str) -> pd.DataFrame:
    """25-row nation dimension (driver-side reads of <=25-row dims are the
    documented allowed exception)."""
    import pyarrow.parquet as pq

    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nat["n_nationkey"] = nat["n_nationkey"].astype(np.int64)
    return nat


def q7_volume_shipping(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q7-shaped: cross-border shipping volume between every
    (supplier nation, customer nation) pair per ship year.  Join plan =
    q5's 100 TB shape (fact streams, orders via hash_join, nation
    lookups as remote-built sorted-kv broadcasts); per-batch partials
    reduce on a packed (s_nat, c_nat, year) key so the final Ray groupby
    sees ~25*24*7 bounded groups."""
    import ray
    from ray.data.aggregate import Sum

    from .stages.join import hash_join

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]).map_batches(
        lambda t: t.rename_columns(["l_orderkey", "o_custkey"]), batch_format="pyarrow"
    )
    joined = hash_join(
        li, orders, "l_orderkey", ["o_custkey"], right_rows=_nrows(sf_dir, "orders")
    )
    cust_ref = _nat_kv_ref(sf_dir, "customer", "c_custkey", "c_nationkey")
    supp_ref = _nat_kv_ref(sf_dir, "supplier", "s_suppkey", "s_nationkey")

    def _partial(t: pa.Table) -> pa.Table:
        ck, cn = ray.get(cust_ref)
        sk, sn = ray.get(supp_ref)
        c_nat = cn[np.searchsorted(ck, np.asarray(t["o_custkey"].to_numpy(zero_copy_only=False), np.int64))]
        s_nat = sn[np.searchsorted(sk, np.asarray(t["l_suppkey"].to_numpy(zero_copy_only=False), np.int64))]
        keep = c_nat != s_nat
        cents = _rev_cents(t, keep)
        year = _ts_year(t["l_shipdate"], keep)
        key = (s_nat[keep] * 25 + c_nat[keep]) * 10_000 + year
        uniq, inv = np.unique(key, return_inverse=True)
        return pa.table(
            {
                "k": pa.array(uniq, pa.int64()),
                "part_n": pa.array(np.bincount(inv).astype(np.int64)),
                "part_cents": pa.array(
                    np.bincount(inv, weights=cents.astype(np.float64)).astype(np.int64)
                ),
            }
        )

    agg = (
        joined.map_batches(_partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("part_n", alias_name="n"), Sum("part_cents", alias_name="revenue_cents"))
        .to_pandas()
    )
    k = agg["k"].to_numpy(np.int64)
    nat = _nation_names(sf_dir).set_index("n_nationkey")["n_name"]
    out = pd.DataFrame(
        {
            "supp_nation": nat.loc[(k // 10_000) // 25].to_numpy(object),
            "cust_nation": nat.loc[(k // 10_000) % 25].to_numpy(object),
            "l_year": k % 10_000,
            "n": agg["n"].to_numpy(np.int64),
            "revenue_cents": agg["revenue_cents"].to_numpy(np.int64),
        }
    )
    return out.sort_values(["supp_nation", "cust_nation", "l_year"]).reset_index(drop=True)


Q8_REGION_KEY = 2  # ASIA (synthetic regionkey = nationkey % 5)
Q8_TARGET_NATION = 12
Q8_PART_TYPE = "ECONOMY"


def q8_market_share(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q8-shaped market share: among order-year revenue for
    ``Q8_PART_TYPE`` parts sold to customers in region ``Q8_REGION_KEY``,
    the share supplied by nation ``Q8_TARGET_NATION``, as the EXACT
    rational share_ppm = target*1_000_000 // total (both positive ->
    DuckDB trunc == floor).  Five lookups, zero extra shuffles: orders
    via hash_join; customer->nation, nation->region, supplier->nation
    and part->type-match all sorted-kv broadcasts."""
    import ray
    from ray.data.aggregate import Sum

    from .stages.dedup import _sorted_kv_task
    from .stages.join import hash_join

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        lambda t: pa.table(
            {
                "l_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "o_year": pa.array(_ts_year(t["o_orderdate"]), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    joined = hash_join(
        li,
        orders,
        "l_orderkey",
        ["o_custkey", "o_year"],
        right_rows=_nrows(sf_dir, "orders"),
    )
    cust_ref = _nat_kv_ref(sf_dir, "customer", "c_custkey", "c_nationkey")
    supp_ref = _nat_kv_ref(sf_dir, "supplier", "s_suppkey", "s_nationkey")
    reg_ref = _nat_kv_ref(sf_dir, "nation", "n_nationkey", "n_regionkey")

    part = _read(sf_dir, "part", columns=["p_partkey", "p_type"]).map_batches(
        lambda t: pa.table(
            {
                "k": pa.array(np.asarray(t["p_partkey"].to_numpy(zero_copy_only=False), np.int64)),
                "v": pa.array(
                    (t["p_type"].to_pandas().to_numpy(object) == Q8_PART_TYPE).astype(np.int64)
                ),
            }
        ),
        batch_format="pyarrow",
    )
    part_refs = [br for b in part.iter_internal_ref_bundles() for br in b.block_refs]
    type_ref = _sorted_kv_task.remote(part_refs, "k", "v")

    def _partial(t: pa.Table) -> pa.Table:
        ck, cn = ray.get(cust_ref)
        sk, sn = ray.get(supp_ref)
        nk, nr = ray.get(reg_ref)
        pk, pt = ray.get(type_ref)
        c_nat = cn[np.searchsorted(ck, np.asarray(t["o_custkey"].to_numpy(zero_copy_only=False), np.int64))]
        s_nat = sn[np.searchsorted(sk, np.asarray(t["l_suppkey"].to_numpy(zero_copy_only=False), np.int64))]
        is_type = pt[np.searchsorted(pk, np.asarray(t["l_partkey"].to_numpy(zero_copy_only=False), np.int64))]
        keep = (nr[np.searchsorted(nk, c_nat)] == Q8_REGION_KEY) & (is_type == 1)
        cents = _rev_cents(t, keep)
        year = np.asarray(t["o_year"].to_numpy(zero_copy_only=False), np.int64)[keep]
        target = (s_nat[keep] == Q8_TARGET_NATION).astype(np.int64)
        uniq, inv = np.unique(year, return_inverse=True)
        return pa.table(
            {
                "o_year": pa.array(uniq, pa.int64()),
                "part_total": pa.array(
                    np.bincount(inv, weights=cents.astype(np.float64)).astype(np.int64)
                ),
                "part_target": pa.array(
                    np.bincount(inv, weights=(cents * target).astype(np.float64)).astype(np.int64)
                ),
            }
        )

    agg = (
        joined.map_batches(_partial, batch_format="pyarrow")
        .groupby("o_year")
        .aggregate(
            Sum("part_total", alias_name="total_cents"),
            Sum("part_target", alias_name="target_cents"),
        )
        .to_pandas()
        .sort_values("o_year")
        .reset_index(drop=True)
    )
    total = agg["total_cents"].to_numpy(np.int64)
    target = agg["target_cents"].to_numpy(np.int64)
    agg["o_year"] = agg["o_year"].astype(np.int64)
    agg["total_cents"] = total
    agg["target_cents"] = target
    agg["share_ppm"] = target * 1_000_000 // total
    return agg


Q9_NAME_SUBSTR = "red"


def q9_product_profit(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q9-shaped product-type profit (adapted: the synthetic schema
    has no partsupp, so unit cost = p_retailprice):
    profit_cents = rev_cents - qty_centi*retail_cents//100 per line for
    parts whose name contains ``Q9_NAME_SUBSTR``, grouped by (supplier
    nation, order year).  part ships ONE packed sorted-kv broadcast
    (v = retail_cents*2 + name_match) — integer-exact in SQL too."""
    import ray
    from ray.data.aggregate import Sum

    from .stages.dedup import _sorted_kv_task
    from .stages.join import hash_join

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"]).map_batches(
        lambda t: pa.table(
            {
                "l_orderkey": t["o_orderkey"],
                "o_year": pa.array(_ts_year(t["o_orderdate"]), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    joined = hash_join(
        li, orders, "l_orderkey", ["o_year"], right_rows=_nrows(sf_dir, "orders")
    )
    supp_ref = _nat_kv_ref(sf_dir, "supplier", "s_suppkey", "s_nationkey")

    part = _read(sf_dir, "part", columns=["p_partkey", "p_name", "p_retailprice"]).map_batches(
        lambda t: pa.table(
            {
                "k": pa.array(np.asarray(t["p_partkey"].to_numpy(zero_copy_only=False), np.int64)),
                "v": pa.array(
                    np.floor(
                        np.asarray(t["p_retailprice"].to_numpy(zero_copy_only=False), np.float64) * 100.0
                        + 0.5
                    ).astype(np.int64)
                    * 2
                    + np.char.find(
                        t["p_name"].to_pandas().to_numpy(str).astype("U64"), Q9_NAME_SUBSTR
                    ).__ge__(0).astype(np.int64)
                ),
            }
        ),
        batch_format="pyarrow",
    )
    part_refs = [br for b in part.iter_internal_ref_bundles() for br in b.block_refs]
    part_ref = _sorted_kv_task.remote(part_refs, "k", "v")

    def _partial(t: pa.Table) -> pa.Table:
        sk, sn = ray.get(supp_ref)
        pk, pv = ray.get(part_ref)
        v = pv[np.searchsorted(pk, np.asarray(t["l_partkey"].to_numpy(zero_copy_only=False), np.int64))]
        keep = (v % 2) == 1
        retail_cents = (v // 2)[keep]
        s_nat = sn[np.searchsorted(sk, np.asarray(t["l_suppkey"].to_numpy(zero_copy_only=False), np.int64))][keep]
        qty_centi = np.floor(
            np.asarray(t["l_quantity"].to_numpy(zero_copy_only=False), np.float64)[keep] * 100.0 + 0.5
        ).astype(np.int64)
        profit = _rev_cents(t, keep) - qty_centi * retail_cents // 100
        year = np.asarray(t["o_year"].to_numpy(zero_copy_only=False), np.int64)[keep]
        key = s_nat * 10_000 + year
        uniq, inv = np.unique(key, return_inverse=True)
        return pa.table(
            {
                "k": pa.array(uniq, pa.int64()),
                "part_n": pa.array(np.bincount(inv).astype(np.int64)),
                "part_profit": pa.array(
                    np.bincount(inv, weights=profit.astype(np.float64)).astype(np.int64)
                ),
            }
        )

    agg = (
        joined.map_batches(_partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("part_n", alias_name="n"), Sum("part_profit", alias_name="profit_cents"))
        .to_pandas()
    )
    k = agg["k"].to_numpy(np.int64)
    nat = _nation_names(sf_dir).set_index("n_nationkey")["n_name"]
    out = pd.DataFrame(
        {
            "n_name": nat.loc[k // 10_000].to_numpy(object),
            "o_year": k % 10_000,
            "n": agg["n"].to_numpy(np.int64),
            "profit_cents": agg["profit_cents"].to_numpy(np.int64),
        }
    )
    return out.sort_values(["n_name", "o_year"]).reset_index(drop=True)


Q15_START = np.datetime64("1996-01-01")
Q15_END = np.datetime64("1996-04-01")


def q15_top_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q15-shaped top supplier: discounted revenue per supplier over
    a 3-month ship window; winners are ALL suppliers tying the exact
    integer-cents maximum.  Supplier cardinality is bounded (dimension,
    not fact), so the Ray groupby is safe; names come from a driver-side
    filtered read of only the winning keys (top_customers fix pattern)."""
    import pyarrow.dataset as pads
    from ray.data.aggregate import Sum

    li = _read(
        sf_dir, "lineitem", columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"]
    )

    def _partial(t: pa.Table) -> pa.Table:
        ts = t["l_shipdate"].to_numpy(zero_copy_only=False)
        keep = (ts >= Q15_START) & (ts < Q15_END)
        cents = _rev_cents(t, keep)
        supp = np.asarray(t["l_suppkey"].to_numpy(zero_copy_only=False), np.int64)[keep]
        uniq, inv = np.unique(supp, return_inverse=True)
        return pa.table(
            {
                "s_suppkey": pa.array(uniq, pa.int64()),
                "part_cents": pa.array(
                    np.bincount(inv, weights=cents.astype(np.float64)).astype(np.int64)
                ),
            }
        )

    agg = (
        li.map_batches(_partial, batch_format="pyarrow")
        .groupby("s_suppkey")
        .aggregate(Sum("part_cents", alias_name="total_revenue_cents"))
        .to_pandas()
    )
    total = agg["total_revenue_cents"].to_numpy(np.int64)
    winners = agg[total == total.max()].copy() if len(agg) else agg
    keys = winners["s_suppkey"].to_numpy(np.int64)
    names = (
        pads.dataset(f"{sf_dir}/supplier.parquet")
        .to_table(columns=["s_suppkey", "s_name"], filter=pads.field("s_suppkey").isin(keys))
        .to_pandas()
    )
    names["s_suppkey"] = names["s_suppkey"].astype(np.int64)
    out = winners.merge(names, on="s_suppkey")[["s_suppkey", "s_name", "total_revenue_cents"]]
    out["total_revenue_cents"] = out["total_revenue_cents"].astype(np.int64)
    out["s_suppkey"] = out["s_suppkey"].astype(np.int64)
    return out.sort_values("s_suppkey").reset_index(drop=True)


Q17_BRAND = "Brand#17"


def q17_small_quantity(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q17-shaped small-quantity revenue: total extendedprice cents
    of ``Q17_BRAND`` lines whose quantity is below 20%% of that part's
    average — the exact cross-multiplied predicate
    5*qty_centi*cnt_p < sum_qty_centi_p (no division anywhere).  Two
    streaming passes over the fact: pass 1 builds per-part (cnt, sum)
    via per-batch partials + a bounded-key groupby, shipped back as TWO
    sorted-kv broadcasts; pass 2 filters and sums.  avg_yearly_cents =
    total // 7 (TPC-H's constant), floor-exact since both positive."""
    import ray
    from ray.data.aggregate import Sum

    from .stages.dedup import _sorted_kv_task
    from .stages.join import hash_join  # noqa: F401  (import parity with siblings)

    brand_ref = _brand_flag_ref(sf_dir, Q17_BRAND)
    li_cols = ["l_partkey", "l_quantity", "l_extendedprice"]
    li = _read(sf_dir, "lineitem", columns=li_cols)

    def _qty_centi(t: pa.Table, keep) -> np.ndarray:
        q = np.asarray(t["l_quantity"].to_numpy(zero_copy_only=False), np.float64)[keep]
        return np.floor(q * 100.0 + 0.5).astype(np.int64)

    def _partial_stats(t: pa.Table) -> pa.Table:
        bk, bv = ray.get(brand_ref)
        part = np.asarray(t["l_partkey"].to_numpy(zero_copy_only=False), np.int64)
        keep = bv[np.searchsorted(bk, part)] == 1
        qc = _qty_centi(t, keep)
        uniq, inv = np.unique(part[keep], return_inverse=True)
        return pa.table(
            {
                "l_partkey": pa.array(uniq, pa.int64()),
                "part_cnt": pa.array(np.bincount(inv).astype(np.int64)),
                "part_sum": pa.array(np.bincount(inv, weights=qc.astype(np.float64)).astype(np.int64)),
            }
        )

    stats = (
        li.map_batches(_partial_stats, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("part_cnt", alias_name="cnt"), Sum("part_sum", alias_name="sq"))
        .map_batches(
            lambda t: pa.table(
                {
                    "l_partkey": pa.array(np.asarray(t["l_partkey"].to_numpy(zero_copy_only=False), np.int64)),
                    "cnt": pa.array(np.asarray(t["cnt"].to_numpy(zero_copy_only=False), np.int64)),
                    "sq": pa.array(np.asarray(t["sq"].to_numpy(zero_copy_only=False), np.int64)),
                }
            ),
            batch_format="pyarrow",
        )
    )
    stat_refs = [br for b in stats.iter_internal_ref_bundles() for br in b.block_refs]
    cnt_ref = _sorted_kv_task.remote(stat_refs, "l_partkey", "cnt")
    sum_ref = _sorted_kv_task.remote(stat_refs, "l_partkey", "sq")

    def _partial_rev(t: pa.Table) -> pa.Table:
        bk, bv = ray.get(brand_ref)
        ck, cv = ray.get(cnt_ref)
        sk, sv = ray.get(sum_ref)
        part = np.asarray(t["l_partkey"].to_numpy(zero_copy_only=False), np.int64)
        keep = bv[np.searchsorted(bk, part)] == 1
        part = part[keep]
        qc = _qty_centi(t, keep)
        cnt = cv[np.searchsorted(ck, part)]
        sq = sv[np.searchsorted(sk, part)]
        small = qc * 5 * cnt < sq
        pc = np.floor(
            np.asarray(t["l_extendedprice"].to_numpy(zero_copy_only=False), np.float64)[keep][small]
            * 100.0
            + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "part_cents": pa.array([int(pc.sum())], pa.int64()),
                "part_n": pa.array([int(small.sum())], pa.int64()),
            }
        )

    agg = li.map_batches(_partial_rev, batch_format="pyarrow").aggregate(
        Sum("part_cents", alias_name="total_cents"), Sum("part_n", alias_name="n_lines")
    )
    total = int(agg["total_cents"]) if agg and agg["total_cents"] is not None else 0
    n = int(agg["n_lines"]) if agg and agg["n_lines"] is not None else 0
    return pd.DataFrame(
        {
            "total_cents": np.asarray([total], np.int64),
            "n_lines": np.asarray([n], np.int64),
            "avg_yearly_cents": np.asarray([total // 7], np.int64),
        }
    )


def _brand_flag_ref(sf_dir: str, brand: str):
    """partkey -> (p_brand == brand) sorted-kv broadcast."""
    from .stages.dedup import _sorted_kv_task

    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"]).map_batches(
        lambda t: pa.table(
            {
                "k": pa.array(np.asarray(t["p_partkey"].to_numpy(zero_copy_only=False), np.int64)),
                "v": pa.array(
                    (t["p_brand"].to_pandas().to_numpy(object) == brand).astype(np.int64)
                ),
            }
        ),
        batch_format="pyarrow",
    )
    refs = [br for b in part.iter_internal_ref_bundles() for br in b.block_refs]
    return _sorted_kv_task.remote(refs, "k", "v")


# ----------------------------------------- analytics wave 2 (round 4)

def _segment_pairs(sorted_vals: np.ndarray, seg_counts: np.ndarray):
    """All within-segment (i < j) index pairs of a segment-sorted array,
    fully vectorized (no Python loop over segments): element at
    within-segment offset w contributes w pairs (itself as 'b', every
    earlier segment element as 'a').  Returns (a_idx, b_idx) into
    ``sorted_vals``'s index space.  Pinned against itertools in
    tests/test_analytics_wave.py."""
    n = int(seg_counts.sum())
    starts = np.cumsum(seg_counts) - seg_counts
    seg_id = np.repeat(np.arange(len(seg_counts)), seg_counts)
    w = np.arange(n) - starts[seg_id]  # within-segment offset
    b_idx = np.repeat(np.arange(n), w)
    total = int(w.sum())
    cum_w = np.cumsum(w) - w  # pairs emitted before element j
    a_idx = np.arange(total) - np.repeat(cum_w, w) + np.repeat(starts[seg_id], w)
    return a_idx, b_idx


BASKET_BRAND_PACK = 128  # brand codes < 128 (25 distinct); asserted


def basket_brand_pairs(sf_dir: str) -> pd.DataFrame:
    """Market-basket mining over orders: for every unordered pair of part
    brands co-occurring in at least one order, the pair support (orders
    containing both) and both directed confidences as exact
    support*1_000_000 // support(antecedent).  Plan: per-batch dedup of
    packed (orderkey, brand) against the broadcast part->brand lookup,
    ONE order-bucket shuffle, vectorized within-bucket pair generation
    (_segment_pairs), and a final Ray groupby bounded by the pair/brand
    alphabet (<= 25*24/2 + 25 groups), never by order count."""
    import ray
    from ray.data.aggregate import Sum

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    brand_ref = _brand_num_ref(sf_dir)

    def _partial(t: pa.Table) -> pa.Table:
        bk, bv = ray.get(brand_ref)
        ok = np.asarray(t["l_orderkey"].to_numpy(zero_copy_only=False), np.int64)
        brand = bv[np.searchsorted(bk, np.asarray(t["l_partkey"].to_numpy(zero_copy_only=False), np.int64))]
        assert brand.max(initial=0) < BASKET_BRAND_PACK
        packed = np.unique(ok * BASKET_BRAND_PACK + brand)
        return pa.table(
            {
                "bucket": pa.array(
                    (((packed // BASKET_BRAND_PACK) * 2654435761) % 4294967296) % SESSION_BUCKETS
                ),
                "packed": pa.array(packed),
            }
        )

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        packed = np.unique(g["packed"].to_numpy(np.int64))  # cross-batch dedup
        order = packed // BASKET_BRAND_PACK
        brand = packed % BASKET_BRAND_PACK
        _, counts = np.unique(order, return_counts=True)
        a, b = _segment_pairs(brand, counts)
        pair_key = brand[a] * BASKET_BRAND_PACK + brand[b]  # brand asc within order
        pk, pn = np.unique(pair_key, return_counts=True)
        sk, sn = np.unique(brand, return_counts=True)  # per-brand order support
        return pd.DataFrame(
            {
                "k": np.concatenate([pk, sk + BASKET_BRAND_PACK * BASKET_BRAND_PACK]),
                "part_n": np.concatenate([pn, sn]).astype(np.int64),
            }
        )

    agg = (
        li.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_pairs, batch_format="pandas")
        .groupby("k")
        .aggregate(Sum("part_n", alias_name="n"))
        .to_pandas()
    )
    k = agg["k"].to_numpy(np.int64)
    n = agg["n"].to_numpy(np.int64)
    is_brand = k >= BASKET_BRAND_PACK * BASKET_BRAND_PACK
    support = dict(zip(k[is_brand] - BASKET_BRAND_PACK * BASKET_BRAND_PACK, n[is_brand]))
    pk, pn = k[~is_brand], n[~is_brand]
    a, b = pk // BASKET_BRAND_PACK, pk % BASKET_BRAND_PACK
    sa = np.asarray([support[x] for x in a], np.int64)
    sb = np.asarray([support[x] for x in b], np.int64)
    out = pd.DataFrame(
        {
            "brand_a": np.char.add("Brand#", a.astype("U3")).astype(object),
            "brand_b": np.char.add("Brand#", b.astype("U3")).astype(object),
            "pair_support": pn,
            "conf_ab_ppm": pn * 1_000_000 // sa,
            "conf_ba_ppm": pn * 1_000_000 // sb,
        }
    )
    return out.sort_values(["brand_a", "brand_b"]).reset_index(drop=True)


def _brand_num_ref(sf_dir: str):
    """partkey -> numeric brand code ('Brand#17' -> 17) sorted-kv
    broadcast, parsed vectorized via np.char.partition."""
    from .stages.dedup import _sorted_kv_task

    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"]).map_batches(
        lambda t: pa.table(
            {
                "k": pa.array(np.asarray(t["p_partkey"].to_numpy(zero_copy_only=False), np.int64)),
                "v": pa.array(
                    np.char.partition(t["p_brand"].to_numpy(zero_copy_only=False).astype("U16"), "#")[
                        :, 2
                    ].astype(np.int64)
                ),
            }
        ),
        batch_format="pyarrow",
    )
    refs = [br for b in part.iter_internal_ref_bundles() for br in b.block_refs]
    return _sorted_kv_task.remote(refs, "k", "v")


RECORD_SEG_OFFSET = 1 << 44  # > any price cents; segment isolation for cummax


def orders_record_highs(sf_dir: str):
    """Per-customer record-setting orders: rows whose price cents STRICTLY
    exceed every prior order of the same customer in (o_orderdate,
    o_orderkey) order (the first order is always a record).  One
    customer-bucket shuffle; within each bucket the running max is a
    single np.maximum.accumulate over segment-offset-lifted values
    (offset > value range keeps segments independent — exact, unlike the
    additive-base trick the CUSUM fix replaced)."""
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"])

    def _partial(t: pa.Table) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": np.asarray(t["o_orderkey"].to_numpy(zero_copy_only=False), np.int64),
                "o_custkey": np.asarray(t["o_custkey"].to_numpy(zero_copy_only=False), np.int64),
                "cents": np.floor(
                    np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64) * 100.0
                    + 0.5
                ).astype(np.int64),
                "ts": t["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64),
                "bucket": (
                    np.asarray(t["o_custkey"].to_numpy(zero_copy_only=False), np.int64) * 2654435761
                    % 2**32
                )
                % SESSION_BUCKETS,
            }
        )

    def _records(g: pd.DataFrame) -> pd.DataFrame:
        df = g.sort_values(["o_custkey", "ts", "o_orderkey"])
        cust = df["o_custkey"].to_numpy(np.int64)
        cents = df["cents"].to_numpy(np.int64)
        seg = np.cumsum(np.concatenate([[0], (cust[1:] != cust[:-1]).astype(np.int64)]))
        assert cents.max(initial=0) < RECORD_SEG_OFFSET
        lifted = cents + seg * RECORD_SEG_OFFSET
        run = np.maximum.accumulate(lifted)
        first = np.concatenate([[True], cust[1:] != cust[:-1]])
        prior = np.concatenate([[np.iinfo(np.int64).min], run[:-1]])
        rec = first | (lifted > prior)
        return pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"].to_numpy(np.int64)[rec],
                "o_custkey": cust[rec],
                "price_cents": cents[rec],
            }
        )

    return (
        orders.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_records, batch_format="pandas")
    )


def events_value_trend_slope(sf_dir: str):
    """Per-user least-squares trend of value cents over time, carried as
    the EXACT integer rational (slope_num, slope_den) =
    (n*Sxy - Sx*Sy, n*Sxx - Sx^2) — no division, no floats.  x is
    seconds since the user's first event (the min-offset keeps
    n*Sxx < 2^63; raw epoch seconds would overflow)."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def _partial(t: pa.Table) -> pd.DataFrame:
        uid = np.asarray(t["user_id"].to_numpy(zero_copy_only=False), np.int64)
        return pd.DataFrame(
            {
                "user_id": uid,
                "ts_us": t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64),
                "y": np.floor(
                    np.asarray(t["value"].to_numpy(zero_copy_only=False), np.float64) * 100.0 + 0.5
                ).astype(np.int64),
                "bucket": (uid * 2654435761 % 2**32) % SESSION_BUCKETS,
            }
        )

    def _slope(g: pd.DataFrame) -> pd.DataFrame:
        df = g.copy()
        df["x"] = (df["ts_us"] - df.groupby("user_id")["ts_us"].transform("min")) // 1_000_000
        x = df["x"].to_numpy(np.int64)
        y = df["y"].to_numpy(np.int64)
        df["xy"] = x * y
        df["xx"] = x * x
        agg = df.groupby("user_id", sort=False).agg(
            n_events=("x", "size"), sx=("x", "sum"), sy=("y", "sum"), sxy=("xy", "sum"), sxx=("xx", "sum")
        )
        n = agg["n_events"].to_numpy(np.int64)
        sx = agg["sx"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "user_id": agg.index.to_numpy(np.int64),
                "n_events": n,
                "slope_num": n * agg["sxy"].to_numpy(np.int64) - sx * agg["sy"].to_numpy(np.int64),
                "slope_den": n * agg["sxx"].to_numpy(np.int64) - sx * sx,
            }
        )

    return (
        ev.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_slope, batch_format="pandas")
    )


EQUIDEPTH_K = 16


def orders_equidepth_bins(sf_dir: str) -> pd.DataFrame:
    """Exact equi-depth histogram boundaries over price cents, replicating
    SQL NTILE semantics (bucket i of K over n rows holds n//K + (i <=
    n%K) rows; per-bin MAX/count are tie-order-independent).  Reuses the
    orders_price_rank shape: bounded value-histogram reduce -> remote
    sorted (values, counts) broadcast -> K boundary lookups; the data
    itself is never globally sorted."""
    import ray

    from .stages.dedup import _sorted_kv_task

    orders = _read(sf_dir, "orders", columns=["o_totalprice"])

    def _partial(t: pa.Table) -> pa.Table:
        c = np.floor(
            np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        ub, inv = np.unique(c, return_inverse=True)
        return pa.table(
            {
                "bucket": pa.array(((ub * 2654435761) % 4294967296) % SESSION_BUCKETS),
                "cents": pa.array(ub),
                "part_n": pa.array(np.bincount(inv).astype(np.int64)),
            }
        )

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("cents", sort=False)["part_n"].sum()
        return pd.DataFrame({"cents": s.index.to_numpy(np.int64), "n": s.to_numpy(np.int64)})

    hist = (
        orders.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_reduce, batch_format="pandas")
    )
    refs = [br for b in hist.iter_internal_ref_bundles() for br in b.block_refs]
    vals, counts = ray.get(_sorted_kv_task.remote(refs, "cents", "n"))
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0
    base, extra = n // EQUIDEPTH_K, n % EQUIDEPTH_K
    i = np.arange(1, EQUIDEPTH_K + 1)
    targets = base * i + np.minimum(i, extra)  # cumulative rows through bin i
    sizes = np.diff(np.concatenate([[0], targets]))
    upper = vals[np.searchsorted(cum, targets, side="left")] if n else np.zeros(EQUIDEPTH_K, np.int64)
    return pd.DataFrame(
        {"bin": i.astype(np.int64), "upper_cents": upper.astype(np.int64), "n_rows": sizes.astype(np.int64)}
    )


# ------------------------------------- geometry / linalg wave (round 4)

def _hull_points(x: np.ndarray, y: np.ndarray):
    """Convex hull of int64 lattice points: vectorized Akl-Toussaint
    octagon prune (drops every point strictly inside the extreme-point
    octagon) then Andrew's monotone chain over the few survivors — the
    Python loop never touches interior points.  All arithmetic int64
    cross products (coords < 4096 -> no overflow).  Returns (hx, hy)
    hull vertices; exactness pinned vs brute force in tests."""
    pts = np.unique(np.stack([x, y], axis=1), axis=0)
    if len(pts) <= 2:
        return pts[:, 0], pts[:, 1]
    px, py = pts[:, 0], pts[:, 1]
    # Akl-Toussaint quad: the (min-x, min-y, max-x, max-y) extreme points
    # taken in W,S,E,N order form a CCW convex quadrilateral BY
    # CONSTRUCTION (no float angle sort); any point strictly inside all
    # four directed edges cannot be a hull vertex.  Degenerate (repeated)
    # vertices give zero-length edges whose cross is 0, which fails the
    # strict test -> never over-prunes.  All int64.
    quad = np.asarray(
        [np.argmin(px), np.argmin(py), np.argmax(px), np.argmax(py)], np.int64
    )
    ox, oy = px[quad], py[quad]
    nxt = np.roll(np.arange(4), -1)
    ex, ey = ox[nxt] - ox, oy[nxt] - oy
    cross = (px[:, None] - ox[None, :]) * ey[None, :] - (py[:, None] - oy[None, :]) * ex[None, :]
    inside = (cross > 0).all(axis=1)
    keep = ~inside
    px, py = px[keep], py[keep]
    # monotone chain over survivors (already lexicographically sorted by
    # np.unique row order)
    pts = list(zip(px.tolist(), py.tolist()))

    def _chain(seq):
        out = []
        for p in seq:
            while len(out) >= 2 and (
                (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])
            ) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = _chain(pts)
    upper = _chain(pts[::-1])
    hull = lower[:-1] + upper[:-1]
    hx = np.asarray([p[0] for p in hull], np.int64)
    hy = np.asarray([p[1] for p in hull], np.int64)
    return hx, hy


def nation_point_diameter(sf_dir: str) -> pd.DataFrame:
    """Per-nation point-set diameter (max pairwise squared distance) over
    the customer lattice points — exact without the O(n^2) all-pairs:
    the farthest pair lies on the convex hull, so each batch reduces its
    per-nation points to hull vertices (hull(hull A + hull B) = hull(A+B)),
    and only the final ~25-group merge touches the tiny hulls.  The
    oracle IS the O(n^2) self-join — feasible at oracle scale only."""
    from ray.data.aggregate import Sum

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    def _pts(t: pa.Table):
        ck = np.asarray(t["c_custkey"].to_numpy(zero_copy_only=False), np.int64)
        nk = np.asarray(t["c_nationkey"].to_numpy(zero_copy_only=False), np.int64)
        return nk, (ck * BBOX_MULT_X) % 4096, (ck * BBOX_MULT_Y) % 4096

    def _partial_hulls(t: pa.Table) -> pd.DataFrame:
        nk, ix, iy = _pts(t)
        rows_n, rows_x, rows_y = [], [], []
        for nat in np.unique(nk):
            m = nk == nat
            hx, hy = _hull_points(ix[m], iy[m])
            rows_n.append(np.full(len(hx), nat, np.int64))
            rows_x.append(hx)
            rows_y.append(hy)
        return pd.DataFrame(
            {
                "n_nationkey": np.concatenate(rows_n) if rows_n else np.zeros(0, np.int64),
                "ix": np.concatenate(rows_x) if rows_x else np.zeros(0, np.int64),
                "iy": np.concatenate(rows_y) if rows_y else np.zeros(0, np.int64),
            }
        )

    def _diameter(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for nat, grp in g.groupby("n_nationkey", sort=False):
            hx, hy = _hull_points(grp["ix"].to_numpy(np.int64), grp["iy"].to_numpy(np.int64))
            d2 = (hx[:, None] - hx[None, :]) ** 2 + (hy[:, None] - hy[None, :]) ** 2
            out.append((int(nat), int(d2.max())))
        return pd.DataFrame(
            {
                "n_nationkey": np.asarray([o[0] for o in out], np.int64),
                "diameter_sq": np.asarray([o[1] for o in out], np.int64),
            }
        )

    hulls = (
        cust.map_batches(_partial_hulls, batch_format="pyarrow")
        .groupby("n_nationkey")
        .map_groups(_diameter, batch_format="pandas")
        .to_pandas()
    )

    def _partial_counts(t: pa.Table) -> pa.Table:
        nk = np.asarray(t["c_nationkey"].to_numpy(zero_copy_only=False), np.int64)
        u, c = np.unique(nk, return_counts=True)
        return pa.table({"n_nationkey": pa.array(u), "part_n": pa.array(c.astype(np.int64))})

    counts = (
        cust.map_batches(_partial_counts, batch_format="pyarrow")
        .groupby("n_nationkey")
        .aggregate(Sum("part_n", alias_name="n_customers"))
        .to_pandas()
    )
    out = counts.merge(hulls, on="n_nationkey")
    out["n_nationkey"] = out["n_nationkey"].astype(np.int64)
    out["n_customers"] = out["n_customers"].astype(np.int64)
    return out.sort_values("n_nationkey").reset_index(drop=True)[
        ["n_nationkey", "n_customers", "diameter_sq"]
    ]


MIN_COST_BAL_OFFSET = 1 << 30  # |bal cents| bound, asserted
MIN_COST_SUPP_STRIDE = 1 << 20  # suppkey bound, asserted (ADVICE r3 pattern)


def part_min_cost_supplier(sf_dir: str):
    """Q2-shaped argmin join: for every part ever shipped, the supplier
    with the lowest account balance among its observed suppliers
    (tie -> smallest suppkey).  The (bal, suppkey) comparator packs into
    ONE offset-lifted int64 so per-batch partial minima merge exactly
    (min is associative); partkey-cardinality reduce uses the coarse
    bucket pattern, never a per-part Ray groupby."""
    import ray

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    bal_ref = _nat_kv_ref_cents(sf_dir, "supplier", "s_suppkey", "s_acctbal")

    def _partial(t: pa.Table) -> pd.DataFrame:
        bk, bv = ray.get(bal_ref)
        pk = np.asarray(t["l_partkey"].to_numpy(zero_copy_only=False), np.int64)
        sk = np.asarray(t["l_suppkey"].to_numpy(zero_copy_only=False), np.int64)
        packed = np.unique(pk * MIN_COST_SUPP_STRIDE + sk)  # dedup pairs
        pk, sk = packed // MIN_COST_SUPP_STRIDE, packed % MIN_COST_SUPP_STRIDE
        bal = bv[np.searchsorted(bk, sk)]
        assert np.abs(bal).max(initial=0) < MIN_COST_BAL_OFFSET
        assert sk.max(initial=0) < MIN_COST_SUPP_STRIDE
        lifted = (bal + MIN_COST_BAL_OFFSET) * MIN_COST_SUPP_STRIDE + sk
        df = pd.DataFrame({"p_partkey": pk, "lifted": lifted})
        m = df.groupby("p_partkey", sort=False)["lifted"].min().reset_index()
        m["bucket"] = (m["p_partkey"].to_numpy(np.int64) * 2654435761 % 2**32) % SESSION_BUCKETS
        return m

    def _argmin(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("p_partkey", sort=False)["lifted"].min()
        lifted = m.to_numpy(np.int64)
        return pd.DataFrame(
            {
                "p_partkey": m.index.to_numpy(np.int64),
                "s_suppkey": lifted % MIN_COST_SUPP_STRIDE,
                "bal_cents": lifted // MIN_COST_SUPP_STRIDE - MIN_COST_BAL_OFFSET,
            }
        )

    return (
        li.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_argmin, batch_format="pandas")
    )


def _nat_kv_ref_cents(sf_dir: str, table: str, key: str, val: str):
    """Sorted-kv broadcast with the value quantized to cents
    (floor(x*100+0.5), negative-safe — floor on both sides)."""
    from .stages.dedup import _sorted_kv_task

    ds = _read(sf_dir, table, columns=[key, val]).map_batches(
        lambda t, k=key, v=val: pa.table(
            {
                "k": pa.array(np.asarray(t[k].to_numpy(zero_copy_only=False), np.int64)),
                "v": pa.array(
                    np.floor(
                        np.asarray(t[v].to_numpy(zero_copy_only=False), np.float64) * 100.0 + 0.5
                    ).astype(np.int64)
                ),
            }
        ),
        batch_format="pyarrow",
    )
    refs = [br for b in ds.iter_internal_ref_bundles() for br in b.block_refs]
    return _sorted_kv_task.remote(refs, "k", "v")


COV_DIM_PACK = 128  # embedding dims < 128, asserted


def embedding_covariance(sf_dir: str) -> pd.DataFrame:
    """Exact integer Gram/covariance matrix of the quantized embedding
    column: dot_sum(i,j) = sum over vectors of q_i*q_j for i <= j
    (1-based dims, matching SQL generate_subscripts).  Per batch ONE
    float64 BLAS matmul Q^T Q — exact while rows*QUANT^2*max|e|^2 < 2^53
    (the knn_graph lesson); partials merge in int64 via a bounded
    D*(D+1)/2-group Ray groupby."""
    from ray.data.aggregate import Sum

    from .stages.ann import QUANT

    emb = _read(sf_dir, "embeddings", columns=["embedding"])

    def _partial(t: pa.Table) -> pa.Table:
        col = t["embedding"].combine_chunks()
        flat = np.asarray(col.values.to_numpy(zero_copy_only=False), np.float64)
        n = len(col)
        d = len(flat) // n if n else 0
        assert d < COV_DIM_PACK and (not n or len(flat) == n * d)
        q = np.floor(flat.reshape(n, d) * QUANT + 0.5)
        gram = (q.T @ q).astype(np.int64)  # exact: see docstring bound
        iu, ju = np.triu_indices(d)
        return pa.table(
            {
                "k": pa.array((iu + 1) * COV_DIM_PACK + (ju + 1)),
                "part_dot": pa.array(gram[iu, ju]),
            }
        )

    agg = (
        emb.map_batches(_partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("part_dot", alias_name="dot_sum"))
        .to_pandas()
    )
    k = agg["k"].to_numpy(np.int64)
    out = pd.DataFrame(
        {
            "i": k // COV_DIM_PACK,
            "j": k % COV_DIM_PACK,
            "dot_sum": agg["dot_sum"].to_numpy(np.int64),
        }
    )
    return out.sort_values(["i", "j"]).reset_index(drop=True)


# -------------------------------- interval / stringagg wave (round 4)

OPEN_WINDOW_DAYS = 7


def orders_daily_open_count(sf_dir: str) -> pd.DataFrame:
    """Interval stabbing as a difference array: each order is 'open' for
    ``OPEN_WINDOW_DAYS`` days from its order date; output the open-order
    count for EVERY day of the span (dense, zeros included).  The engine
    never expands order x day rows: per-batch day histograms emit
    (+n at start, -n at end) deltas, a bounded ~#days-group reduce sums
    them, and one driver-side cumsum over the dense day range finishes —
    the oracle pays the O(orders x window) inequality join instead."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", columns=["o_orderdate"])

    def _partial(t: pa.Table) -> pa.Table:
        day = (
            t["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
            // 86_400_000_000
        )
        u, c = np.unique(day, return_counts=True)
        return pa.table(
            {
                "day": pa.array(np.concatenate([u, u + OPEN_WINDOW_DAYS])),
                "part_delta": pa.array(
                    np.concatenate([c, -c]).astype(np.int64)
                ),
            }
        )

    agg = (
        orders.map_batches(_partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("part_delta", alias_name="delta"))
        .to_pandas()
        .sort_values("day")
    )
    day = agg["day"].to_numpy(np.int64)
    delta = agg["delta"].to_numpy(np.int64)
    lo, hi = int(day.min()), int(day.max())  # hi = last end marker = max start + 7
    idx = day - lo
    buf = np.zeros(hi - lo + 1, np.int64)
    buf[idx] = delta
    counts = np.cumsum(buf)[:-1]  # day hi has count 0 by construction
    return pd.DataFrame(
        {
            "day_num": np.arange(lo, hi, dtype=np.int64),
            "open_count": counts,
        }
    )


def order_brand_list(sf_dir: str):
    """List/string aggregation per key: each order's DISTINCT part brands
    as a comma-joined string sorted by NUMERIC brand code (lexicographic
    would put Brand#10 before Brand#2), plus the distinct count.  One
    order-bucket shuffle; dedup + sort are a single np.unique over
    packed (orderkey, code); only the final join-to-string per segment
    is Python (strings are object-typed either way)."""
    import ray

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    brand_ref = _brand_num_ref(sf_dir)

    def _partial(t: pa.Table) -> pa.Table:
        bk, bv = ray.get(brand_ref)
        ok = np.asarray(t["l_orderkey"].to_numpy(zero_copy_only=False), np.int64)
        code = bv[np.searchsorted(bk, np.asarray(t["l_partkey"].to_numpy(zero_copy_only=False), np.int64))]
        assert code.max(initial=0) < BASKET_BRAND_PACK
        packed = np.unique(ok * BASKET_BRAND_PACK + code)
        return pa.table(
            {
                "bucket": pa.array(
                    (((packed // BASKET_BRAND_PACK) * 2654435761) % 4294967296) % SESSION_BUCKETS
                ),
                "packed": pa.array(packed),
            }
        )

    def _lists(g: pd.DataFrame) -> pd.DataFrame:
        packed = np.unique(g["packed"].to_numpy(np.int64))
        order = packed // BASKET_BRAND_PACK
        code = packed % BASKET_BRAND_PACK
        names = np.char.add("Brand#", code.astype("U3"))
        uorder, starts, counts = np.unique(order, return_index=True, return_counts=True)
        csv = [",".join(names[s : s + c]) for s, c in zip(starts, counts)]
        return pd.DataFrame(
            {
                "o_orderkey": uorder,
                "n_brands": counts.astype(np.int64),
                "brands_csv": np.asarray(csv, object),
            }
        )

    return (
        li.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_lists, batch_format="pandas")
    )


def nation_trade_balance(sf_dir: str) -> pd.DataFrame:
    """Anti-symmetric trade matrix: for every unordered nation pair
    {a < b}, gross revenue shipped a->b, b->a, and the balance
    (rev_ab - rev_ba) in exact cents.  Same join plan as q7; partials
    carry BOTH direction sums on the unordered pair key so the final
    groupby stays at <= 25*24/2 groups."""
    import ray
    from ray.data.aggregate import Sum

    from .stages.join import hash_join

    li = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]).map_batches(
        lambda t: t.rename_columns(["l_orderkey", "o_custkey"]), batch_format="pyarrow"
    )
    joined = hash_join(
        li, orders, "l_orderkey", ["o_custkey"], right_rows=_nrows(sf_dir, "orders")
    )
    cust_ref = _nat_kv_ref(sf_dir, "customer", "c_custkey", "c_nationkey")
    supp_ref = _nat_kv_ref(sf_dir, "supplier", "s_suppkey", "s_nationkey")

    def _partial(t: pa.Table) -> pa.Table:
        ck, cn = ray.get(cust_ref)
        sk, sn = ray.get(supp_ref)
        c_nat = cn[np.searchsorted(ck, np.asarray(t["o_custkey"].to_numpy(zero_copy_only=False), np.int64))]
        s_nat = sn[np.searchsorted(sk, np.asarray(t["l_suppkey"].to_numpy(zero_copy_only=False), np.int64))]
        keep = c_nat != s_nat
        cents = _rev_cents(t, keep)
        s_nat, c_nat = s_nat[keep], c_nat[keep]
        lo = np.minimum(s_nat, c_nat)
        hi = np.maximum(s_nat, c_nat)
        fwd = s_nat == lo  # flow lo -> hi
        key = lo * 25 + hi
        uniq, inv = np.unique(key, return_inverse=True)
        return pa.table(
            {
                "k": pa.array(uniq, pa.int64()),
                "part_ab": pa.array(
                    np.bincount(inv, weights=np.where(fwd, cents, 0).astype(np.float64)).astype(np.int64)
                ),
                "part_ba": pa.array(
                    np.bincount(inv, weights=np.where(fwd, 0, cents).astype(np.float64)).astype(np.int64)
                ),
            }
        )

    agg = (
        joined.map_batches(_partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("part_ab", alias_name="rev_ab_cents"), Sum("part_ba", alias_name="rev_ba_cents"))
        .to_pandas()
    )
    k = agg["k"].to_numpy(np.int64)
    nat = _nation_names(sf_dir).set_index("n_nationkey")["n_name"]
    ab = agg["rev_ab_cents"].to_numpy(np.int64)
    ba = agg["rev_ba_cents"].to_numpy(np.int64)
    out = pd.DataFrame(
        {
            "nation_a": nat.loc[k // 25].to_numpy(object),
            "nation_b": nat.loc[k % 25].to_numpy(object),
            "rev_ab_cents": ab,
            "rev_ba_cents": ba,
            "balance_cents": ab - ba,
        }
    )
    return out.sort_values(["nation_a", "nation_b"]).reset_index(drop=True)


# ----------------------------- rollup / robust-stats wave (round 4)

PREFIX_LEVELS = 7  # custkey base-10 prefix tree depth (level 0 = leaf)


def custkey_prefix_rollup(sf_dir: str):
    """Hierarchical rollup over the implicit base-10 prefix tree of
    custkey: every customer's balance cents aggregates into ALL
    ``PREFIX_LEVELS`` ancestors (custkey // 10^k).  The flat-map is one
    np.repeat + division per batch; the prefix-keyed reduce is the
    coarse-bucket pattern (prefix cardinality ~ 1.1n, never a raw Ray
    groupby)."""
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])
    divs = 10 ** np.arange(PREFIX_LEVELS, dtype=np.int64)

    def _partial(t: pa.Table) -> pd.DataFrame:
        ck = np.asarray(t["c_custkey"].to_numpy(zero_copy_only=False), np.int64)
        bal = np.floor(
            np.asarray(t["c_acctbal"].to_numpy(zero_copy_only=False), np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        n = len(ck)
        level = np.tile(np.arange(PREFIX_LEVELS, dtype=np.int64), n)
        prefix = np.repeat(ck, PREFIX_LEVELS) // np.tile(divs, n)
        df = pd.DataFrame(
            {"level": level, "prefix": prefix, "bal": np.repeat(bal, PREFIX_LEVELS)}
        )
        agg = df.groupby(["level", "prefix"], sort=False).agg(
            part_n=("bal", "size"), part_bal=("bal", "sum")
        ).reset_index()
        agg["bucket"] = (
            (agg["prefix"].to_numpy(np.int64) * PREFIX_LEVELS + agg["level"].to_numpy(np.int64))
            * 2654435761
            % 2**32
        ) % SESSION_BUCKETS
        agg["part_n"] = agg["part_n"].astype(np.int64)
        agg["part_bal"] = agg["part_bal"].astype(np.int64)
        return agg

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["level", "prefix"], sort=False).agg(
            n=("part_n", "sum"), bal_cents=("part_bal", "sum")
        ).reset_index()
        return s.astype({c: np.int64 for c in s.columns})

    return (
        cust.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_reduce, batch_format="pandas")
    )


def orders_winsorized_total(sf_dir: str) -> pd.DataFrame:
    """Robust statistics: 1%%-winsorized total of order price cents, with
    the exact rank-selected clamp bounds (k = max(n//100, 1); lo = k-th
    smallest, hi = k-th largest).  The clamped sum is computed FROM the
    bounded value histogram itself — a single pass over the data, no
    re-scan after the bounds are known."""
    import ray

    from .stages.dedup import _sorted_kv_task

    orders = _read(sf_dir, "orders", columns=["o_totalprice"])

    def _partial(t: pa.Table) -> pa.Table:
        c = np.floor(
            np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        ub, inv = np.unique(c, return_inverse=True)
        return pa.table(
            {
                "bucket": pa.array(((ub * 2654435761) % 4294967296) % SESSION_BUCKETS),
                "cents": pa.array(ub),
                "part_n": pa.array(np.bincount(inv).astype(np.int64)),
            }
        )

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("cents", sort=False)["part_n"].sum()
        return pd.DataFrame({"cents": s.index.to_numpy(np.int64), "n": s.to_numpy(np.int64)})

    hist = (
        orders.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_reduce, batch_format="pandas")
    )
    refs = [br for b in hist.iter_internal_ref_bundles() for br in b.block_refs]
    vals, counts = ray.get(_sorted_kv_task.remote(refs, "cents", "n"))
    cum = np.cumsum(counts)
    n = int(cum[-1])
    k = max(n // 100, 1)
    lo = int(vals[np.searchsorted(cum, k, side="left")])
    hi = int(vals[np.searchsorted(cum, n - k + 1, side="left")])
    clipped = np.clip(vals, lo, hi)
    total = int((clipped * counts).sum())
    return pd.DataFrame(
        {
            "n": np.asarray([n], np.int64),
            "lo_cents": np.asarray([lo], np.int64),
            "hi_cents": np.asarray([hi], np.int64),
            "winsorized_sum_cents": np.asarray([total], np.int64),
        }
    )


def orders_price_minmax_scaled(sf_dir: str):
    """Per-group min-max feature scaling to exact ppm: scaled_ppm =
    (cents - group_min) * 1_000_000 // (group_max - group_min) within
    each order priority (numerator >= 0 -> floor == trunc).  Group stats
    come from one bounded Ray groupby of per-batch partials; the scale
    pass streams with the 5-row stats table in the closure."""
    from ray.data.aggregate import Max, Min

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority", "o_totalprice"])

    def _cents(t: pa.Table) -> np.ndarray:
        return np.floor(
            np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64) * 100.0 + 0.5
        ).astype(np.int64)

    def _partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {"o_orderpriority": t["o_orderpriority"].to_pandas().to_numpy(object), "c": _cents(t)}
        )
        agg = df.groupby("o_orderpriority", sort=False)["c"].agg(part_min="min", part_max="max").reset_index()
        return agg

    stats = (
        orders.map_batches(_partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Min("part_min", alias_name="mn"), Max("part_max", alias_name="mx"))
        .to_pandas()
    )
    mn = dict(zip(stats["o_orderpriority"], stats["mn"].astype(np.int64)))
    mx = dict(zip(stats["o_orderpriority"], stats["mx"].astype(np.int64)))

    def _scale(t: pa.Table) -> pa.Table:
        pr = t["o_orderpriority"].to_pandas().to_numpy(object)
        c = _cents(t)
        gmn = np.asarray([mn[p] for p in pr], np.int64)
        gmx = np.asarray([mx[p] for p in pr], np.int64)
        den = gmx - gmn
        scaled = np.where(den > 0, (c - gmn) * 1_000_000 // np.maximum(den, 1), 0)
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_orderpriority": t["o_orderpriority"],
                "price_cents": pa.array(c),
                "scaled_ppm": pa.array(scaled.astype(np.int64)),
            }
        )

    return orders.map_batches(_scale, batch_format="pyarrow")


ZORDER_BITS = 12  # lattice is 4096 x 4096


def zorder_encode_lineitem(sf_dir: str):
    """Z-order (Morton) space-filling-curve code per uniform lattice
    point — the locality-clustering cell family member next to square
    cells, geohash and ZXY tiles: z = sum_b bit_b(ix)*4^b + bit_b(iy)*2*4^b.
    Pure integer arithmetic, identical term-by-term expression in the
    oracle (built from the same ZORDER_BITS constant)."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_partkey"])

    def _encode(t: pa.Table) -> pa.Table:
        ok = np.asarray(t["l_orderkey"].to_numpy(zero_copy_only=False), np.int64)
        ln = np.asarray(t["l_linenumber"].to_numpy(zero_copy_only=False), np.int64)
        pk = np.asarray(t["l_partkey"].to_numpy(zero_copy_only=False), np.int64)
        ix = (ok * 131 + ln * 17) % 4096
        iy = (ok * 241 + pk * 13) % 4096
        z = np.zeros(len(ix), np.int64)
        for b in range(ZORDER_BITS):
            z += ((ix >> b) & 1) << (2 * b)
            z += ((iy >> b) & 1) << (2 * b + 1)
        return pa.table(
            {
                "query_id": pa.array(ok * 10 + ln),
                "zcode": pa.array(z),
            }
        )

    return li.map_batches(_encode, batch_format="pyarrow")


# ------------------------- stats / time-series / graph wave (round 4)

def embedding_dim_stats(sf_dir: str) -> pd.DataFrame:
    """Per-dimension column statistics over the quantized embedding list
    column (1-based dims): count, sum, min, max of q = floor(e*QUANT+0.5).
    One pass; per-batch partials are a single reshape + axis-0 reduce;
    the Ray groupby is bounded by D."""
    from ray.data.aggregate import Max, Min, Sum

    from .stages.ann import QUANT

    emb = _read(sf_dir, "embeddings", columns=["embedding"])

    def _partial(t: pa.Table) -> pa.Table:
        col = t["embedding"].combine_chunks()
        flat = np.asarray(col.values.to_numpy(zero_copy_only=False), np.float64)
        n = len(col)
        d = len(flat) // n if n else 0
        q = np.floor(flat.reshape(n, d) * QUANT + 0.5).astype(np.int64)
        return pa.table(
            {
                "i": pa.array(np.arange(1, d + 1, dtype=np.int64)),
                "part_n": pa.array(np.full(d, n, np.int64)),
                "part_sum": pa.array(q.sum(axis=0)),
                "part_min": pa.array(q.min(axis=0)),
                "part_max": pa.array(q.max(axis=0)),
            }
        )

    out = (
        emb.map_batches(_partial, batch_format="pyarrow")
        .groupby("i")
        .aggregate(
            Sum("part_n", alias_name="n"),
            Sum("part_sum", alias_name="qsum"),
            Min("part_min", alias_name="qmin"),
            Max("part_max", alias_name="qmax"),
        )
        .to_pandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    return out.astype({c: np.int64 for c in out.columns})


AUTOCORR_MAX_LAG = 14


def orders_daily_autocorr(sf_dir: str) -> pd.DataFrame:
    """Time-series autocorrelation of the DENSE daily order-count series
    (zero-filled gaps) at lags 1..AUTOCORR_MAX_LAG, carried as the exact
    integer components (n_days, dot, sum_a, sum_b, sumsq_a, sumsq_b) —
    the caller can form Pearson r; the engine never divides.  The series
    itself is a bounded day-keyed reduce; lag products are computed on
    the dense (driver-held, #days-sized) vector."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", columns=["o_orderdate"])

    def _partial(t: pa.Table) -> pa.Table:
        day = (
            t["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
            // 86_400_000_000
        )
        u, c = np.unique(day, return_counts=True)
        return pa.table({"day": pa.array(u), "part_n": pa.array(c.astype(np.int64))})

    agg = (
        orders.map_batches(_partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("part_n", alias_name="n"))
        .to_pandas()
        .sort_values("day")
    )
    day = agg["day"].to_numpy(np.int64)
    cnt = agg["n"].to_numpy(np.int64)
    lo, hi = int(day.min()), int(day.max())
    dense = np.zeros(hi - lo + 1, np.int64)
    dense[day - lo] = cnt
    rows = []
    for lag in range(1, AUTOCORR_MAX_LAG + 1):
        a, b = dense[:-lag], dense[lag:]
        rows.append(
            (
                lag,
                len(a),
                int((a * b).sum()),
                int(a.sum()),
                int(b.sum()),
                int((a * a).sum()),
                int((b * b).sum()),
            )
        )
    return pd.DataFrame(
        rows, columns=["lag", "n_days", "dot", "sum_a", "sum_b", "sumsq_a", "sumsq_b"]
    ).astype(np.int64)


def lineitem_price_mad(sf_dir: str) -> pd.DataFrame:
    """Median absolute deviation per return flag — robust dispersion,
    fully exact: median = value at rank (n+1)//2 (lower median), MAD =
    same rank rule over |c - median|, BOTH computed from the bounded
    per-flag value histogram (one data pass; the |c-m| histogram is a
    re-bin of the same histogram, never a second scan)."""
    from ray.data.aggregate import Sum

    li = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])

    def _partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "f": t["l_returnflag"].to_pandas().to_numpy(object),
                "c": np.floor(
                    np.asarray(t["l_extendedprice"].to_numpy(zero_copy_only=False), np.float64)
                    * 100.0
                    + 0.5
                ).astype(np.int64),
            }
        )
        s = df.groupby(["f", "c"], sort=False).size().reset_index(name="part_n")
        s["bucket"] = (s["c"].to_numpy(np.int64) * 2654435761 % 2**32) % SESSION_BUCKETS
        s["part_n"] = s["part_n"].astype(np.int64)
        return s

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["f", "c"], sort=False)["part_n"].sum().reset_index(name="n")
        s["n"] = s["n"].astype(np.int64)
        return s

    hist = (
        li.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_reduce, batch_format="pandas")
        .to_pandas()
    )

    def _rank_value(vals: np.ndarray, counts: np.ndarray, rank: int) -> int:
        order = np.argsort(vals, kind="stable")
        v, c = vals[order], counts[order]
        return int(v[np.searchsorted(np.cumsum(c), rank, side="left")])

    rows = []
    for f, grp in hist.groupby("f", sort=True):
        vals = grp["c"].to_numpy(np.int64)
        counts = grp["n"].to_numpy(np.int64)
        n = int(counts.sum())
        med = _rank_value(vals, counts, (n + 1) // 2)
        dev = np.abs(vals - med)
        mad = _rank_value(dev, counts, (n + 1) // 2)
        rows.append((f, n, med, mad))
    out = pd.DataFrame(rows, columns=["l_returnflag", "n", "median_cents", "mad_cents"])
    for c in ("n", "median_cents", "mad_cents"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("l_returnflag").reset_index(drop=True)


def supplier_clustering_coeff(sf_dir: str) -> pd.DataFrame:
    """Per-node clustering over the thresholded co-supply graph (same
    incidence -> pair weights -> strict-median-threshold edges as
    supplier_triangles): degree and triangle count per supplier, the
    local clustering coefficient's exact integer components
    (cc = n_tri / (deg*(deg-1)/2)).  tri_v = diag(A^3)/2 — float64
    matmul exact at supplier-bounded node counts."""
    w = _cosupply_weights(sf_dir)
    ws = np.sort(w["wt"].to_numpy(np.int64))
    need = (500 * len(ws) + 999) // 1000
    thr = int(ws[need - 1]) if len(ws) else 0
    e = w[w["wt"] > thr]
    nodes = np.unique(np.concatenate([e["sa"].to_numpy(np.int64), e["sb"].to_numpy(np.int64)]))
    A = np.zeros((max(len(nodes), 1), max(len(nodes), 1)), np.float64)
    ia = np.searchsorted(nodes, e["sa"].to_numpy(np.int64))
    ib = np.searchsorted(nodes, e["sb"].to_numpy(np.int64))
    A[ia, ib] = 1.0
    A[ib, ia] = 1.0
    deg = A.sum(axis=1).astype(np.int64)
    tri = (np.diag(A @ A @ A) / 2.0 + 0.25).astype(np.int64)
    return pd.DataFrame(
        {
            "s_suppkey": nodes.astype(np.int64),
            "deg": deg,
            "n_tri": tri,
        }
    )


def _cosupply_weights(sf_dir: str) -> pd.DataFrame:
    """Shared incidence -> per-order pairs -> global pair weights
    pipeline (the supplier_triangles front half); weights table is
    bounded by supplier-pair cardinality."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])

    def _inc(t: pa.Table) -> pd.DataFrame:
        ok = np.asarray(t["l_orderkey"].to_numpy(zero_copy_only=False), np.int64)
        sk = np.asarray(t["l_suppkey"].to_numpy(zero_copy_only=False), np.int64)
        assert len(sk) == 0 or sk.max() < SUPP_PACK, "widen SUPP_PACK"
        u = np.unique(ok * SUPP_PACK + sk)
        ok_u, sk_u = u // SUPP_PACK, u % SUPP_PACK
        return pd.DataFrame(
            {
                "bucket": ((ok_u * 2654435761) % 4294967296) % SESSION_BUCKETS,
                "ok": ok_u,
                "sk": sk_u,
            }
        )

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["ok", "sk"])
        m = g.merge(g, on="ok")
        m = m[m["sk_x"] < m["sk_y"]]
        if m.empty:
            return pd.DataFrame(
                {"pbucket": pd.array([], "int64"), "sa": pd.array([], "int64"),
                 "sb": pd.array([], "int64"), "part_w": pd.array([], "int64")}
            )
        s = m.groupby(["sk_x", "sk_y"], sort=False).size()
        idx = s.index.to_frame(index=False)
        pk = idx["sk_x"].to_numpy(np.int64) * SUPP_PACK + idx["sk_y"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "pbucket": ((pk * 2654435761) % 4294967296) % SESSION_BUCKETS,
                "sa": idx["sk_x"].to_numpy(np.int64),
                "sb": idx["sk_y"].to_numpy(np.int64),
                "part_w": s.to_numpy(np.int64),
            }
        )

    def _wreduce(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["sa", "sb"], sort=False)["part_w"].sum()
        idx = s.index.to_frame(index=False)
        return pd.DataFrame(
            {
                "sa": idx["sa"].to_numpy(np.int64),
                "sb": idx["sb"].to_numpy(np.int64),
                "wt": s.to_numpy(np.int64),
            }
        )

    return (
        li.map_batches(_inc, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_pairs, batch_format="pandas")
        .groupby("pbucket")
        .map_groups(_wreduce, batch_format="pandas")
        .to_pandas()
    )


# ----------------------- curation-hygiene compositions (round 4)

def _split_of(ids: np.ndarray) -> np.ndarray:
    """Shared 80/10/10 multiplicative-hash split rule (split_assignment)."""
    h = (ids * 2654435761 % 2**32) % 100
    return np.where(h < 80, "train", np.where(h < 90, "val", "test"))


def split_leakage_pairs(sf_dir: str) -> pd.DataFrame:
    """Train/test contamination via NEAR-duplication: MinHash+LSH
    near-dup pairs labeled with each side's deterministic split, counted
    per (split_a, split_b) — off-diagonal cells are leakage a contamination
    check on exact strings would miss.  Composition of two oracle-checked
    operators; the split label is pure arithmetic on doc_id (no join)."""
    from ray.data.aggregate import Sum

    pairs = minhash_dup_pairs(sf_dir)

    def _partial(t: pa.Table) -> pd.DataFrame:
        a = np.asarray(t["doc_a"].to_numpy(zero_copy_only=False), np.int64)
        b = np.asarray(t["doc_b"].to_numpy(zero_copy_only=False), np.int64)
        df = pd.DataFrame({"split_a": _split_of(a), "split_b": _split_of(b)})
        agg = df.groupby(["split_a", "split_b"], sort=False).size().reset_index(name="part_n")
        agg["part_n"] = agg["part_n"].astype(np.int64)
        return agg

    out = (
        pairs.map_batches(_partial, batch_format="pyarrow")
        .groupby(["split_a", "split_b"])
        .aggregate(Sum("part_n", alias_name="n_pairs"))
        .to_pandas()
    )
    out["n_pairs"] = out["n_pairs"].astype(np.int64)
    return out.sort_values(["split_a", "split_b"]).reset_index(drop=True)


def dedup_cluster_size_histogram(sf_dir: str) -> pd.DataFrame:
    """Duplication-structure report: histogram of near-dup cluster sizes
    (how much of the corpus sits in 2-doc pairs vs large star clusters)
    from the connected-components labels — the summary a curation run
    reads before choosing keep-one-per-cluster policies."""
    from ray.data.aggregate import Sum

    labels = dedup_clusters(sf_dir)

    def _partial(t: pa.Table) -> pd.DataFrame:
        cid = np.asarray(t["cluster_id"].to_numpy(zero_copy_only=False), np.int64)
        u, c = np.unique(cid, return_counts=True)
        df = pd.DataFrame({"cluster_id": u, "part_n": c.astype(np.int64)})
        df["bucket"] = (u * 2654435761 % 2**32) % SESSION_BUCKETS
        return df

    def _sizes(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("cluster_id", sort=False)["part_n"].sum()
        sz, cnt = np.unique(s.to_numpy(np.int64), return_counts=True)
        return pd.DataFrame({"cluster_size": sz, "part_c": cnt.astype(np.int64)})

    out = (
        labels.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_sizes, batch_format="pandas")
        .groupby("cluster_size")
        .aggregate(Sum("part_c", alias_name="n_clusters"))
        .to_pandas()
    )
    out["cluster_size"] = out["cluster_size"].astype(np.int64)
    out["n_clusters"] = out["n_clusters"].astype(np.int64)
    return out.sort_values("cluster_size").reset_index(drop=True)


def prefix_count_share(sf_dir: str):
    """Percent-of-parent in the custkey prefix hierarchy: every level-k
    node's customer count as exact ppm of its level-(k+1) parent's count
    (root level excluded — no parent).  Child and parent rollup rows
    co-locate via ONE bucketed shuffle keyed on the PARENT prefix, then
    join vectorized inside each bounded bucket — shares never require
    driver-held hierarchies."""
    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    divs = 10 ** np.arange(PREFIX_LEVELS, dtype=np.int64)

    def _partial(t: pa.Table) -> pd.DataFrame:
        ck = np.asarray(t["c_custkey"].to_numpy(zero_copy_only=False), np.int64)
        n = len(ck)
        level = np.tile(np.arange(PREFIX_LEVELS, dtype=np.int64), n)
        prefix = np.repeat(ck, PREFIX_LEVELS) // np.tile(divs, n)
        df = pd.DataFrame({"level": level, "prefix": prefix})
        agg = df.groupby(["level", "prefix"], sort=False).size().reset_index(name="part_n")
        agg["part_n"] = agg["part_n"].astype(np.int64)
        # bucket by the PARENT prefix so child rows (level k, prefix p)
        # and parent rows (level k+1, prefix p//10) land together
        parent_for_child = agg["prefix"].to_numpy(np.int64) // 10
        agg["bucket"] = (parent_for_child * 2654435761 % 2**32) % SESSION_BUCKETS
        # parent rows must ALSO appear in every bucket one of their
        # children hashes to — they hash by their own prefix as parents
        own = agg.copy()
        own["bucket"] = (own["prefix"].to_numpy(np.int64) * 2654435761 % 2**32) % SESSION_BUCKETS
        return pd.concat([agg.assign(role=np.int64(0)), own.assign(role=np.int64(1))])

    def _share(g: pd.DataFrame) -> pd.DataFrame:
        child = g[g["role"] == 0]
        parent = g[g["role"] == 1]
        c = child.groupby(["level", "prefix"], sort=False)["part_n"].sum().reset_index(name="n")
        p = parent.groupby(["level", "prefix"], sort=False)["part_n"].sum().reset_index(name="pn")
        c = c[c["level"] < PREFIX_LEVELS - 1]
        c["plevel"] = c["level"] + 1
        c["pprefix"] = c["prefix"] // 10
        m = c.merge(p, left_on=["plevel", "pprefix"], right_on=["level", "prefix"], suffixes=("", "_p"))
        n = m["n"].to_numpy(np.int64)
        pn = m["pn"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "level": m["level"].to_numpy(np.int64),
                "prefix": m["prefix"].to_numpy(np.int64),
                "n": n,
                "parent_n": pn,
                "share_ppm": n * 1_000_000 // pn,
            }
        )

    return (
        cust.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_share, batch_format="pandas")
    )


def events_value_percentrank_by_type(sf_dir: str):
    """Partitioned distributed ranking: every event's RANK (ties = min)
    and partition size within its event_type, from per-type bounded
    value histograms broadcast once — no global or per-partition sort of
    the data.  rank/n are the exact integer components of percent_rank."""
    import ray

    from .stages.dedup import _sorted_kv_task

    ev = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def _cents(t: pa.Table) -> np.ndarray:
        return np.floor(
            np.asarray(t["value"].to_numpy(zero_copy_only=False), np.float64) * 100.0 + 0.5
        ).astype(np.int64)

    # deterministic dense type codes from the (small) type alphabet
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    types = sorted(
        set(
            pc.unique(
                pq.read_table(f"{sf_dir}/events.parquet", columns=["event_type"])["event_type"]
            ).to_pylist()
        )
    )
    code_of = {s: i for i, s in enumerate(types)}
    TYPE_PACK = 1 << 40  # cents < 2^40 asserted

    def _partial(t: pa.Table) -> pa.Table:
        c = _cents(t)
        assert len(c) == 0 or c.max() < TYPE_PACK
        codes = np.asarray([code_of[s] for s in t["event_type"].to_pylist()], np.int64)
        key = codes * TYPE_PACK + c
        ub, inv = np.unique(key, return_inverse=True)
        return pa.table(
            {
                "bucket": pa.array(((ub * 2654435761) % 4294967296) % SESSION_BUCKETS),
                "k": pa.array(ub),
                "part_n": pa.array(np.bincount(inv).astype(np.int64)),
            }
        )

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("k", sort=False)["part_n"].sum()
        return pd.DataFrame({"k": s.index.to_numpy(np.int64), "n": s.to_numpy(np.int64)})

    hist = (
        ev.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_reduce, batch_format="pandas")
    )
    refs = [br for b in hist.iter_internal_ref_bundles() for br in b.block_refs]
    kv_ref = _sorted_kv_task.remote(refs, "k", "n")

    def _rank(t: pa.Table) -> pa.Table:
        keys, counts = ray.get(kv_ref)  # sorted by (type, cents)
        cum = np.cumsum(counts)
        tcodes = keys // TYPE_PACK
        # per-type exclusive-prefix base: rows of earlier types
        type_start = np.searchsorted(tcodes, np.arange(len(types)), side="left")
        type_base = np.concatenate([[0], cum])[type_start]
        type_total = np.concatenate([[0], cum])[
            np.searchsorted(tcodes, np.arange(len(types)), side="right")
        ] - type_base
        c = _cents(t)
        codes = np.asarray([code_of[s] for s in t["event_type"].to_pylist()], np.int64)
        key = codes * TYPE_PACK + c
        pos = np.searchsorted(keys, key)
        cum_excl = np.concatenate([[0], cum])[pos]
        rank = cum_excl - type_base[codes] + 1
        return pa.table(
            {
                "event_id": t["event_id"],
                "event_type": t["event_type"],
                "value_cents": pa.array(c),
                "rnk": pa.array(rank.astype(np.int64)),
                "n_type": pa.array(type_total[codes].astype(np.int64)),
            }
        )

    return ev.map_batches(_rank, batch_format="pyarrow")


SESSION_GAP_US = 30 * 60 * 1_000_000


def session_stats(sf_dir: str):
    """PER-SESSION rows (finer than sessionize's per-user rollup): each
    (user, session_idx) with its event count and exact duration_us —
    gaps-and-islands at session granularity, one user-bucket shuffle,
    per-session reductions via bincount/reduceat inside the bucket."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def _bucket(t: pa.Table) -> pa.Table:
        uid = np.asarray(t["user_id"].to_numpy(zero_copy_only=False), np.int64)
        return t.append_column(
            "bucket", pa.array((uid * 2654435761 % 2**32) % SESSION_BUCKETS, pa.int64())
        )

    def _f(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        n = len(g)
        new_user = np.empty(n, bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        gaps = np.empty(n, np.int64)
        gaps[0] = 0
        gaps[1:] = ts[1:] - ts[:-1]
        new_sess = new_user | ((~new_user) & (gaps > SESSION_GAP_US))
        sess = np.cumsum(new_sess) - 1  # global session code in this bucket
        # session_idx: 0-based per user in time order
        user_code = np.cumsum(new_user) - 1
        first_sess_of_user = sess[new_user]  # sess code at each user's first row
        sess_idx_at_start = np.where(new_sess, sess - first_sess_of_user[user_code], 0)
        starts = np.flatnonzero(new_sess)
        counts = np.diff(np.concatenate([starts, [n]]))
        dur = ts[np.concatenate([starts[1:] - 1, [n - 1]])] - ts[starts]
        return pd.DataFrame(
            {
                "user_id": uid[starts],
                "session_idx": sess_idx_at_start[starts].astype(np.int64),
                "n_events": counts.astype(np.int64),
                "duration_us": dur.astype(np.int64),
            }
        )

    return (
        ev.map_batches(_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_f, batch_format="pandas")
    )


LATTICE_D2_DIV = 125.0 * 125.0  # ring width: one 125 m lattice step squared


def radius_pair_distance_histogram(sf_dir: str) -> pd.DataFrame:
    """Spatial pair-correlation spectrum (the Ripley's-K ingredient):
    histogram of floor(d2 / 125^2) distance rings over all within-radius
    pairs.  d2 is the IDENTICAL IEEE expression in engine and oracle (the
    radius join hash-matches it), so floor of the same double is exact
    parity; the reduce is bounded by the ring alphabet, never by pairs."""
    from ray.data.aggregate import Sum

    pairs = points_within_radius(sf_dir)

    def _partial(t: pa.Table) -> pa.Table:
        d2 = np.asarray(t["d2"].to_numpy(zero_copy_only=False), np.float64)
        lat = np.floor(d2 / LATTICE_D2_DIV).astype(np.int64)
        u, c = np.unique(lat, return_counts=True)
        return pa.table(
            {"ring_d2": pa.array(u), "part_n": pa.array(c.astype(np.int64))}
        )

    out = (
        pairs.map_batches(_partial, batch_format="pyarrow")
        .groupby("ring_d2")
        .aggregate(Sum("part_n", alias_name="n_pairs"))
        .to_pandas()
        .sort_values("ring_d2")
        .reset_index(drop=True)
    )
    return out.astype({"ring_d2": np.int64, "n_pairs": np.int64})


BOOL_QUERY_TOKENS = ("merge", "join", "scan")


def docs_with_all_tokens(sf_dir: str):
    """Boolean AND retrieval: doc_ids containing EVERY query token (the
    inverted-index intersection primitive next to tfidf's ranked OR).
    Per-batch: tokenize, mask against the tiny query set, count DISTINCT
    query tokens per doc; docs never shuffle — a doc's rows stay in its
    batch, so the filter completes per batch with zero exchanges."""
    from .functions.text import ws_tokens

    k = len(BOOL_QUERY_TOKENS)

    def _f(df: pd.DataFrame) -> pd.DataFrame:
        qset = set(BOOL_QUERY_TOKENS)  # built per task from the module constant
        ids = df["doc_id"].to_numpy(np.int64)
        keep = []
        for i, txt in enumerate(df["text"]):
            hits = qset.intersection(ws_tokens(txt.lower()))
            if len(hits) == k:
                keep.append(ids[i])
        return pd.DataFrame({"doc_id": np.asarray(keep, np.int64)})

    return _docs(sf_dir).map_batches(_f, batch_format="pandas")


CHORO_CLASSES = 5


def tile_choropleth_classes(sf_dir: str) -> pd.DataFrame:
    """Cartographic quantile classing: tile counts bucketed into
    ``CHORO_CLASSES`` classes by VALUE against exact equi-depth
    boundaries (class = 1 + number of boundaries strictly below the
    count — deterministic under ties, unlike raw NTILE labels).
    Composition over the oracle-checked tile_counts."""
    tc = tile_counts(sf_dir)
    df = tc.to_pandas() if hasattr(tc, "to_pandas") else tc
    cnt = np.sort(df["n"].to_numpy(np.int64))
    n = len(cnt)
    base, extra = n // CHORO_CLASSES, n % CHORO_CLASSES
    i = np.arange(1, CHORO_CLASSES + 1)
    targets = base * i + np.minimum(i, extra)
    bounds = cnt[targets[:-1] - 1]  # upper bound of classes 1..K-1
    c = df["n"].to_numpy(np.int64)
    cls = 1 + (c[:, None] > bounds[None, :]).sum(axis=1)
    out = pd.DataFrame(
        {
            "tile_x": df["tile_x"].to_numpy(np.int64),
            "tile_y": df["tile_y"].to_numpy(np.int64),
            "n": c,
            "cls": cls.astype(np.int64),
        }
    )
    return out.sort_values(["tile_x", "tile_y"]).reset_index(drop=True)


BURST_WINDOW_US = 300 * 1_000_000  # 5-minute sliding window


def user_burst_peak(sf_dir: str):
    """Peak activity rate: each user's maximum event count inside ANY
    5-minute sliding window anchored at an event.  One user-bucket
    shuffle; inside the bucket a single searchsorted over per-user-lifted
    timestamps implements the two-pointer sweep for EVERY user at once
    (the lift offset exceeds the window, so windows never cross users)."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def _partial(t: pa.Table) -> pd.DataFrame:
        uid = np.asarray(t["user_id"].to_numpy(zero_copy_only=False), np.int64)
        return pd.DataFrame(
            {
                "user_id": uid,
                "ts_us": t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64),
                "bucket": (uid * 2654435761 % 2**32) % SESSION_BUCKETS,
            }
        )

    def _peak(g: pd.DataFrame) -> pd.DataFrame:
        df = g.sort_values(["user_id", "ts_us"], kind="mergesort")
        uid = df["user_id"].to_numpy(np.int64)
        ts = df["ts_us"].to_numpy(np.int64)
        codes = np.unique(uid, return_inverse=True)[1]
        rel = ts - ts.min()
        span = int(rel.max()) + BURST_WINDOW_US + 1
        lifted = codes * span + rel
        j = np.searchsorted(lifted, lifted + BURST_WINDOW_US)
        burst = j - np.arange(len(lifted))
        out = pd.DataFrame({"user_id": uid, "b": burst})
        m = out.groupby("user_id", sort=False)["b"].max()
        return pd.DataFrame(
            {"user_id": m.index.to_numpy(np.int64), "peak_5min": m.to_numpy(np.int64)}
        )

    return (
        ev.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_peak, batch_format="pandas")
    )


def documents_ipc_roundtrip(sf_dir: str) -> pd.DataFrame:
    """Custom binary source plumbing: documents -> per-block Arrow IPC
    stream files under /tmp -> read back via read_binary_files + the IPC
    reader inside map_batches (the pattern for any container format Ray
    lacks a native reader for) -> order-independent content checksum.
    The oracle computes the same checksum on the original table — a
    lossless-roundtrip proof."""
    import os
    import tempfile

    import ray.data as rd

    docs = _docs(sf_dir, columns=("doc_id", "text"))
    out_dir = tempfile.mkdtemp(prefix="graft_ipc_", dir="/tmp")

    def _write(t: pa.Table) -> pa.Table:
        import uuid

        path = os.path.join(out_dir, f"{uuid.uuid4().hex}.arrows")
        with open(path, "wb") as f:
            with pa.ipc.new_stream(f, t.schema) as w:
                w.write_table(t)
        return pa.table({"path": pa.array([path])})

    docs.map_batches(_write, batch_format="pyarrow").materialize()

    files = rd.read_binary_files(os.path.join(out_dir, ""))

    def _read_ipc(t: pa.Table) -> pa.Table:
        parts = []
        for buf in t["bytes"].to_pylist():
            with pa.ipc.open_stream(pa.BufferReader(buf)) as r:
                parts.append(r.read_all())
        return pa.concat_tables(parts) if parts else pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})

    back = files.map_batches(_read_ipc, batch_format="pyarrow")

    def _partial(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), np.int64)
        nch = np.asarray([len(s) for s in t["text"].to_pylist()], np.int64)
        chk = ((ids % CHECKSUM_M) * CHECKSUM_K + nch % CHECKSUM_M) % CHECKSUM_M
        return pa.table(
            {
                "part_n": pa.array([len(ids)], pa.int64()),
                "part_chk": pa.array([int(chk.sum())], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    agg = back.map_batches(_partial, batch_format="pyarrow").aggregate(
        Sum("part_n", alias_name="n_rows"), Sum("part_chk", alias_name="checksum")
    )
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)  # scratch store fully consumed
    return pd.DataFrame(
        {
            "n_rows": np.asarray([int(agg["n_rows"])], np.int64),
            "checksum": np.asarray([int(agg["checksum"])], np.int64),
        }
    )


def tile_quadkey_lineitem(sf_dir: str):
    """Bing-style quadkey strings (zoom-length base-4, digit =
    bit(tx) + 2*bit(ty), most-significant first) for every uniform
    lattice point — the string-keyed member of the cell-code family
    (square cells / geohash / ZXY / Morton).  Digits are vectorized
    np.char concatenation over the shared DEFAULT_ZOOM bit loop; the
    oracle concatenates the SAME per-bit expressions."""
    from .functions.tiles import DEFAULT_ZOOM, tile_assign
    from .pipelines.spatial import derive_uniform_points

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_partkey"])

    def _f(t: pa.Table) -> pa.Table:
        pts = derive_uniform_points(t)
        qx = np.asarray(pts["qx"].to_numpy(zero_copy_only=False), np.float64)
        qy = np.asarray(pts["qy"].to_numpy(zero_copy_only=False), np.float64)
        tx, ty = tile_assign(qx, qy)
        qk = np.full(len(tx), "", dtype=f"U{DEFAULT_ZOOM}")
        for b in range(DEFAULT_ZOOM - 1, -1, -1):
            digit = ((tx >> b) & 1) + 2 * ((ty >> b) & 1)
            qk = np.char.add(qk, digit.astype("U1"))
        return pa.table(
            {
                "query_id": pts["query_id"],
                "quadkey": pa.array(qk.astype(object), pa.string()),
            }
        )

    return li.map_batches(_f, batch_format="pyarrow")


def partkey_f2_moment(sf_dir: str) -> pd.DataFrame:
    """Frequency-moment statistics of the l_partkey stream — the numbers
    a distributed planner keeps: F0 (distinct keys), F1 (rows), and F2
    (sum of squared frequencies == the EXACT self-join size on the key).
    Per-batch partial counts + one coarse-bucket reduce; the F2 partial
    squares only fully-reduced per-key counts (cnt^2 is not mergeable
    across partials)."""
    from ray.data.aggregate import Sum

    li = _read(sf_dir, "lineitem", columns=["l_partkey"])

    def _partial(t: pa.Table) -> pa.Table:
        pk = np.asarray(t["l_partkey"].to_numpy(zero_copy_only=False), np.int64)
        u, c = np.unique(pk, return_counts=True)
        return pa.table(
            {
                "bucket": pa.array(((u * 2654435761) % 4294967296) % SESSION_BUCKETS),
                "k": pa.array(u),
                "part_n": pa.array(c.astype(np.int64)),
            }
        )

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("k", sort=False)["part_n"].sum()
        cnt = s.to_numpy(np.int64)
        return pd.DataFrame(
            {
                "part_keys": np.asarray([len(cnt)], np.int64),
                "part_rows": np.asarray([int(cnt.sum())], np.int64),
                "part_f2": np.asarray([int((cnt * cnt).sum())], np.int64),
            }
        )

    agg = (
        li.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_reduce, batch_format="pandas")
        .aggregate(
            Sum("part_keys", alias_name="n_keys"),
            Sum("part_rows", alias_name="n_rows"),
            Sum("part_f2", alias_name="selfjoin_pairs"),
        )
    )
    return pd.DataFrame(
        {
            "n_keys": np.asarray([int(agg["n_keys"])], np.int64),
            "n_rows": np.asarray([int(agg["n_rows"])], np.int64),
            "selfjoin_pairs": np.asarray([int(agg["selfjoin_pairs"])], np.int64),
        }
    )


def orders_benford_digits(sf_dir: str) -> pd.DataFrame:
    """Benford first-digit audit of price cents (the data-quality /
    fraud-screening staple): count per leading digit 1..9, exact via
    decimal-string truncation (no float log10 — exact at every power of
    ten).  Per-batch bincount partials; 9-group reduce."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", columns=["o_totalprice"])

    def _partial(t: pa.Table) -> pa.Table:
        c = np.floor(
            np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        first = np.char.ljust(c.astype("U20"), 1)  # first decimal digit
        digit = first.astype(np.int64)
        u, n = np.unique(digit, return_counts=True)
        return pa.table({"digit": pa.array(u), "part_n": pa.array(n.astype(np.int64))})

    out = (
        orders.map_batches(_partial, batch_format="pyarrow")
        .groupby("digit")
        .aggregate(Sum("part_n", alias_name="n"))
        .to_pandas()
        .sort_values("digit")
        .reset_index(drop=True)
    )
    return out.astype({"digit": np.int64, "n": np.int64})


PARETO_NUM, PARETO_DEN = 4, 5  # 80% revenue coverage


def customer_revenue_pareto(sf_dir: str) -> pd.DataFrame:
    """Pareto concentration: the smallest number of customers (taken in
    exact (revenue DESC, custkey ASC) order) whose revenue reaches 80%
    of the total, compared cross-multiplied (cum*5 >= total*4 — no
    division).  Per-customer revenue via per-batch partials + a
    customer-bounded groupby; only the (dimension-sized) revenue table
    reaches the driver."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def _partial(t: pa.Table) -> pa.Table:
        ck = np.asarray(t["o_custkey"].to_numpy(zero_copy_only=False), np.int64)
        c = np.floor(
            np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        u, inv = np.unique(ck, return_inverse=True)
        return pa.table(
            {
                "o_custkey": pa.array(u),
                "part_cents": pa.array(np.bincount(inv, weights=c.astype(np.float64)).astype(np.int64)),
            }
        )

    rev = (
        orders.map_batches(_partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("part_cents", alias_name="cents"))
        .to_pandas()
    )
    cents = rev["cents"].to_numpy(np.int64)
    ck = rev["o_custkey"].to_numpy(np.int64)
    order = np.lexsort((ck, -cents))  # revenue DESC, custkey ASC
    cum = np.cumsum(cents[order])
    total = int(cum[-1]) if len(cum) else 0
    k = int(np.searchsorted(cum * PARETO_DEN, total * PARETO_NUM, side="left")) + 1 if total else 0
    return pd.DataFrame(
        {
            "n_customers_80": np.asarray([k], np.int64),
            "n_customers": np.asarray([len(cents)], np.int64),
            "total_cents": np.asarray([total], np.int64),
            "top_cents": np.asarray([int(cum[k - 1]) if k else 0], np.int64),
        }
    )


DOC_TOP_K = 3


def doc_top_tokens(sf_dir: str):
    """Grouped top-k where the group IS the row: each document's
    ``DOC_TOP_K`` most frequent tokens (count DESC, token ASC), joined
    comma-separated.  Entirely per-batch — a doc's text never leaves its
    block, so the op runs with ZERO shuffles at any corpus size."""
    from .functions.text import ws_tokens

    def _f(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        tops = []
        for txt in df["text"]:
            toks = ws_tokens(txt.lower())
            if not toks:
                tops.append("")
                continue
            vals, counts = np.unique(np.asarray(toks, object), return_counts=True)
            order = np.lexsort((vals, -counts))[:DOC_TOP_K]
            tops.append(",".join(vals[order]))
        return pd.DataFrame({"doc_id": ids, "top_tokens": np.asarray(tops, object)})

    return _docs(sf_dir).map_batches(_f, batch_format="pandas")


def segment_nation_contingency(sf_dir: str):
    """Categorical-association contingency components over customer
    (mktsegment x nation): per-cell count plus its row, column and grand
    totals — the exact integer ingredients of chi-square / lift, no
    division.  Cell partials reduce on the bounded (segment, nation)
    alphabet; margins broadcast back from the driver-held (tiny) cell
    table."""
    from ray.data.aggregate import Sum

    cust = _read(sf_dir, "customer", columns=["c_mktsegment", "c_nationkey"])

    def _partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "c_mktsegment": t["c_mktsegment"].to_pandas().to_numpy(object),
                "n_nationkey": np.asarray(t["c_nationkey"].to_numpy(zero_copy_only=False), np.int64),
            }
        )
        agg = df.groupby(["c_mktsegment", "n_nationkey"], sort=False).size().reset_index(name="part_n")
        agg["part_n"] = agg["part_n"].astype(np.int64)
        return agg

    cells = (
        cust.map_batches(_partial, batch_format="pyarrow")
        .groupby(["c_mktsegment", "n_nationkey"])
        .aggregate(Sum("part_n", alias_name="n_cell"))
        .to_pandas()
    )
    cells["n_cell"] = cells["n_cell"].astype(np.int64)
    cells["n_nationkey"] = cells["n_nationkey"].astype(np.int64)
    row_tot = cells.groupby("c_mktsegment")["n_cell"].transform("sum").astype(np.int64)
    col_tot = cells.groupby("n_nationkey")["n_cell"].transform("sum").astype(np.int64)
    cells["n_segment"] = row_tot
    cells["n_nation"] = col_tot
    cells["n_total"] = np.int64(cells["n_cell"].sum())
    return cells.sort_values(["c_mktsegment", "n_nationkey"]).reset_index(drop=True)


def parts_discovery_curve(sf_dir: str) -> pd.DataFrame:
    """Vocabulary-growth (Heaps-law) curve over the catalog: parts FIRST
    shipped in each epoch week, plus the running cumulative — exact
    'running distinct' without any global state: distinct-ness reduces
    to MIN(week) per part, and the cumsum runs on the dense driver-held
    week axis.  Part cardinality grows with the catalog, so the MIN
    reduce uses the coarse-bucket + vectorized-pandas pattern and each
    bucket emits only its per-WEEK new-part counts (bounded by the
    calendar, not the catalog) — the driver never holds per-part rows."""
    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_shipdate"])

    def _partial(t: pa.Table) -> pd.DataFrame:
        pk = np.asarray(t["l_partkey"].to_numpy(zero_copy_only=False), np.int64)
        week = (
            t["l_shipdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
            // (7 * 86_400_000_000)
        )
        df = pd.DataFrame({"l_partkey": pk, "w": week})
        m = df.groupby("l_partkey", sort=False)["w"].min().reset_index(name="part_w")
        m["bucket"] = (m["l_partkey"].to_numpy(np.int64) * 2654435761 % 2**32) % SESSION_BUCKETS
        return m[["bucket", "l_partkey", "part_w"]]

    def _weeks(g: pd.DataFrame) -> pd.DataFrame:
        w = g.groupby("l_partkey", sort=False)["part_w"].min()
        u, c = np.unique(w.to_numpy(np.int64), return_counts=True)
        return pd.DataFrame({"w": u, "part_n": c.astype(np.int64)})

    weeks = (
        li.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_weeks, batch_format="pandas")
        .to_pandas()
    )
    s = weeks.groupby("w")["part_n"].sum()
    u = s.index.to_numpy(np.int64)
    c = s.to_numpy(np.int64)
    lo, hi = int(u.min()), int(u.max())
    dense_new = np.zeros(hi - lo + 1, np.int64)
    dense_new[u - lo] = c
    return pd.DataFrame(
        {
            "week": np.arange(lo, hi + 1, dtype=np.int64),
            "new_parts": dense_new,
            "cum_parts": np.cumsum(dense_new),
        }
    )


def events_hour_weekday_heatmap(sf_dir: str) -> pd.DataFrame:
    """Seasonality heatmap: event counts per (weekday, hour-of-day) cell,
    both computed from raw epoch arithmetic ((day+4)%7 — 1970-01-01 was
    a Thursday — and (us // 3600e6) % 24) so engine and SQL share the
    identical integer expressions, no calendar-function semantics."""
    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", columns=["ts"])

    def _partial(t: pa.Table) -> pa.Table:
        us = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        day = us // 86_400_000_000
        dow = (day + 4) % 7  # 0 = Monday
        hour = (us // 3_600_000_000) % 24
        key = dow * 24 + hour
        u, c = np.unique(key, return_counts=True)
        return pa.table({"k": pa.array(u), "part_n": pa.array(c.astype(np.int64))})

    agg = (
        ev.map_batches(_partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("part_n", alias_name="n"))
        .to_pandas()
    )
    k = agg["k"].to_numpy(np.int64)
    out = pd.DataFrame({"dow": k // 24, "hour": k % 24, "n": agg["n"].to_numpy(np.int64)})
    return out.sort_values(["dow", "hour"]).reset_index(drop=True)


OHLC_BIN_US = 6 * 3600 * 1_000_000


def events_ohlc_6h(sf_dir: str) -> pd.DataFrame:
    """Financial-style OHLC bars: per 6-hour bin the open (value at the
    lexicographically first (ts, event_id)), close (last), high, low and
    count — open/close are ARGMIN/ARGMAX aggregates, merged exactly
    because lexicographic (ts, event_id) min/max is associative: each
    partial carries the candidate triple, the bounded per-bin merge
    re-picks.  Value cents exact."""
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "value"])

    def _partial(t: pa.Table) -> pd.DataFrame:
        us = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        eid = np.asarray(t["event_id"].to_numpy(zero_copy_only=False), np.int64)
        val = np.floor(
            np.asarray(t["value"].to_numpy(zero_copy_only=False), np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        df = pd.DataFrame({"bin": us // OHLC_BIN_US, "ts_us": us, "event_id": eid, "v": val})
        df = df.sort_values(["bin", "ts_us", "event_id"], kind="mergesort")
        g = df.groupby("bin", sort=False)
        first = g.head(1).set_index("bin")
        last = g.tail(1).set_index("bin")
        agg = g.agg(hi=("v", "max"), lo=("v", "min"), n=("v", "size"))
        out = pd.DataFrame(
            {
                "bin": agg.index.to_numpy(np.int64),
                "o_ts": first["ts_us"].to_numpy(np.int64),
                "o_id": first["event_id"].to_numpy(np.int64),
                "o_v": first["v"].to_numpy(np.int64),
                "c_ts": last["ts_us"].to_numpy(np.int64),
                "c_id": last["event_id"].to_numpy(np.int64),
                "c_v": last["v"].to_numpy(np.int64),
                "hi": agg["hi"].to_numpy(np.int64),
                "lo": agg["lo"].to_numpy(np.int64),
                "part_n": agg["n"].to_numpy(np.int64),
            }
        )
        return out

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["bin"].iloc[0])
        fo = g.sort_values(["o_ts", "o_id"], kind="mergesort").iloc[0]
        fc = g.sort_values(["c_ts", "c_id"], kind="mergesort").iloc[-1]
        return pd.DataFrame(
            {
                "bin": np.asarray([b], np.int64),
                "open_cents": np.asarray([fo["o_v"]], np.int64),
                "high_cents": np.asarray([g["hi"].max()], np.int64),
                "low_cents": np.asarray([g["lo"].min()], np.int64),
                "close_cents": np.asarray([fc["c_v"]], np.int64),
                "n": np.asarray([g["part_n"].sum()], np.int64),
            }
        )

    out = (
        ev.map_batches(_partial, batch_format="pyarrow")
        .groupby("bin")
        .map_groups(_merge, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("bin").reset_index(drop=True)


def supplier_portfolio_jaccard(sf_dir: str) -> pd.DataFrame:
    """Exact set-similarity join between entities: Jaccard of supplier
    part-portfolios (distinct parts supplied), for every supplier pair
    sharing at least one part.  Intersections come from per-part
    supplier pairs (the co-supply bucket pattern keyed by part);
    portfolio sizes are a supplier-bounded reduce; jac_permille =
    inter*1000 // union exact."""
    from ray.data.aggregate import Sum

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def _inc(t: pa.Table) -> pd.DataFrame:
        pk = np.asarray(t["l_partkey"].to_numpy(zero_copy_only=False), np.int64)
        sk = np.asarray(t["l_suppkey"].to_numpy(zero_copy_only=False), np.int64)
        assert len(sk) == 0 or sk.max() < SUPP_PACK, "widen SUPP_PACK"
        u = np.unique(pk * SUPP_PACK + sk)
        pk_u, sk_u = u // SUPP_PACK, u % SUPP_PACK
        return pd.DataFrame(
            {
                "bucket": ((pk_u * 2654435761) % 4294967296) % SESSION_BUCKETS,
                "pk": pk_u,
                "sk": sk_u,
            }
        )

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["pk", "sk"])
        m = g.merge(g, on="pk")
        m = m[m["sk_x"] < m["sk_y"]]
        if m.empty:
            return pd.DataFrame(
                {"sa": pd.array([], "int64"), "sb": pd.array([], "int64"),
                 "part_inter": pd.array([], "int64")}
            )
        s = m.groupby(["sk_x", "sk_y"], sort=False).size()
        idx = s.index.to_frame(index=False)
        return pd.DataFrame(
            {
                "sa": idx["sk_x"].to_numpy(np.int64),
                "sb": idx["sk_y"].to_numpy(np.int64),
                "part_inter": s.to_numpy(np.int64),
            }
        )

    inc = li.map_batches(_inc, batch_format="pyarrow")
    inter = (
        inc.groupby("bucket")
        .map_groups(_pairs, batch_format="pandas")
        .map_batches(
            lambda t: t.append_column(
                "k",
                pa.array(
                    np.asarray(t["sa"].to_numpy(zero_copy_only=False), np.int64) * SUPP_PACK
                    + np.asarray(t["sb"].to_numpy(zero_copy_only=False), np.int64)
                ),
            ),
            batch_format="pyarrow",
        )
        .groupby("k")
        .aggregate(Sum("part_inter", alias_name="inter"))
        .to_pandas()
    )

    def _sizes(g: pd.DataFrame) -> pd.DataFrame:
        # bucket is keyed by pk, so (pk, sk) dedup inside the bucket is
        # GLOBAL (per-batch dedup alone overcounts cross-batch repeats)
        u = g[["sk", "pk"]].drop_duplicates()
        s = u.groupby("sk", sort=False).size().reset_index(name="part_sz")
        s["part_sz"] = s["part_sz"].astype(np.int64)
        return s

    sizes = (
        inc.groupby("bucket")
        .map_groups(_sizes, batch_format="pandas")
        .groupby("sk")
        .aggregate(Sum("part_sz", alias_name="sz"))
        .to_pandas()
    )
    sz = dict(zip(sizes["sk"].astype(np.int64), sizes["sz"].astype(np.int64)))
    k = inter["k"].to_numpy(np.int64)
    sa, sb = k // SUPP_PACK, k % SUPP_PACK
    iv = inter["inter"].to_numpy(np.int64)
    sza = np.asarray([sz[x] for x in sa], np.int64)
    szb = np.asarray([sz[x] for x in sb], np.int64)
    union = sza + szb - iv
    out = pd.DataFrame(
        {
            "sa": sa,
            "sb": sb,
            "inter": iv,
            "n_union": union,
            "jac_permille": iv * 1000 // union,
        }
    )
    return out.sort_values(["sa", "sb"]).reset_index(drop=True)


DRIFT_CUTOFF = np.datetime64("1998-01-01")
DRIFT_DECILES = 10


def orders_price_drift_deciles(sf_dir: str) -> pd.DataFrame:
    """Distribution-drift monitor (the ML-data health check): exact
    decile boundaries of price cents for orders BEFORE vs AFTER a cutoff
    date, with the signed shift per decile — two bounded value
    histograms, the same (tot//K)*i + LEAST rank rule as equi-depth."""
    import ray

    from .stages.dedup import _sorted_kv_task

    orders = _read(sf_dir, "orders", columns=["o_totalprice", "o_orderdate"])

    def _partial(t: pa.Table) -> pa.Table:
        c = np.floor(
            np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        late = (t["o_orderdate"].to_numpy(zero_copy_only=False) >= DRIFT_CUTOFF).astype(np.int64)
        key = c * 2 + late
        ub, inv = np.unique(key, return_inverse=True)
        return pa.table(
            {
                "bucket": pa.array(((ub * 2654435761) % 4294967296) % SESSION_BUCKETS),
                "k": pa.array(ub),
                "part_n": pa.array(np.bincount(inv).astype(np.int64)),
            }
        )

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("k", sort=False)["part_n"].sum()
        return pd.DataFrame({"k": s.index.to_numpy(np.int64), "n": s.to_numpy(np.int64)})

    hist = (
        orders.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_reduce, batch_format="pandas")
    )
    refs = [br for b in hist.iter_internal_ref_bundles() for br in b.block_refs]
    keys, counts = ray.get(_sorted_kv_task.remote(refs, "k", "n"))

    def _bounds(half: int) -> np.ndarray:
        m = (keys % 2) == half
        vals, cnt = keys[m] // 2, counts[m]
        cum = np.cumsum(cnt)
        n = int(cum[-1]) if len(cum) else 0
        base, extra = n // DRIFT_DECILES, n % DRIFT_DECILES
        i = np.arange(1, DRIFT_DECILES + 1)
        targets = base * i + np.minimum(i, extra)
        return (
            vals[np.searchsorted(cum, targets, side="left")]
            if n
            else np.zeros(DRIFT_DECILES, np.int64)
        )

    early, late = _bounds(0), _bounds(1)
    return pd.DataFrame(
        {
            "decile": np.arange(1, DRIFT_DECILES + 1, dtype=np.int64),
            "bound_early": early.astype(np.int64),
            "bound_late": late.astype(np.int64),
            "shift_cents": (late - early).astype(np.int64),
        }
    )


def road_segment_load(sf_dir: str) -> pd.DataFrame:
    """Road-network load profile: per road segment the count of snapped
    points and the exact rational mean squared distance components
    (sum_d2_num, len2 — every snapped row of a segment shares its len2,
    so the mean is sum_d2_num / (n*len2) with no rounding).  Composition
    over the oracle-checked map-matching snap; segments are a bounded
    dimension, so the final groupby is safe."""
    from ray.data.aggregate import Sum

    snapped = snap_points_to_roads(sf_dir)

    def _partial(t) -> pa.Table:
        if isinstance(t, pd.DataFrame):
            sid = t["seg_id"].to_numpy(np.int64)
            num = t["d2_num"].to_numpy(np.int64)
            l2 = t["len2"].to_numpy(np.int64)
        else:
            sid = np.asarray(t["seg_id"].to_numpy(zero_copy_only=False), np.int64)
            num = np.asarray(t["d2_num"].to_numpy(zero_copy_only=False), np.int64)
            l2 = np.asarray(t["len2"].to_numpy(zero_copy_only=False), np.int64)
        u, inv = np.unique(sid, return_inverse=True)
        first = np.zeros(len(u), np.int64)
        first[inv] = l2  # all rows of a segment share len2
        return pa.table(
            {
                "seg_id": pa.array(u),
                "part_n": pa.array(np.bincount(inv).astype(np.int64)),
                "part_num": pa.array(np.bincount(inv, weights=num.astype(np.float64)).astype(np.int64)),
                "len2": pa.array(first),
            }
        )

    agg = (
        snapped.map_batches(_partial, batch_format="pandas")
        .groupby("seg_id")
        .aggregate(
            Sum("part_n", alias_name="n_points"),
            Sum("part_num", alias_name="sum_d2_num"),
        )
        .to_pandas()
    )
    from .sources.synthetic import _road_segment_rows

    len2_of = {r["seg_id"]: r["len2"] for r in _road_segment_rows()}
    agg["seg_id"] = agg["seg_id"].astype(np.int64)
    agg["n_points"] = agg["n_points"].astype(np.int64)
    agg["sum_d2_num"] = agg["sum_d2_num"].astype(np.int64)
    agg["len2"] = np.asarray([len2_of[s] for s in agg["seg_id"]], np.int64)
    return agg.sort_values("seg_id").reset_index(drop=True)


def nation_revenue_hhi(sf_dir: str) -> pd.DataFrame:
    """Market concentration per nation: the Herfindahl-Hirschman index of
    customer revenue shares as exact hhi_ppm = (sum rev_c^2) * 1e6 //
    (total^2).  Distributed part: per-customer revenue (one bounded
    reduce) + per-nation (sum, sum-of-squares, n) partials; the final
    division runs driver-side in PYTHON INTS (sum_rev2*1e6 exceeds
    int64; DuckDB's HUGEINT matches arbitrary-precision exactly).
    rev_c^2 is asserted < 2^63."""
    import ray
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    nat_ref = _nat_kv_ref(sf_dir, "customer", "c_custkey", "c_nationkey")

    def _per_cust(t: pa.Table) -> pa.Table:
        ck = np.asarray(t["o_custkey"].to_numpy(zero_copy_only=False), np.int64)
        c = np.floor(
            np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        u, inv = np.unique(ck, return_inverse=True)
        return pa.table(
            {
                "o_custkey": pa.array(u),
                "part_cents": pa.array(np.bincount(inv, weights=c.astype(np.float64)).astype(np.int64)),
            }
        )

    def _per_nation(t: pa.Table) -> pa.Table:
        nk, nv = ray.get(nat_ref)
        ck = np.asarray(t["o_custkey"].to_numpy(zero_copy_only=False), np.int64)
        rev = np.asarray(t["cents"].to_numpy(zero_copy_only=False), np.int64)
        assert len(rev) == 0 or rev.max() < np.int64(3_000_000_000), "rev^2 overflow guard"
        nat = nv[np.searchsorted(nk, ck)]
        # int64 pandas sums (NOT float bincount weights: rev^2 partials can
        # exceed 2^53, where float64 accumulation silently rounds)
        df = pd.DataFrame({"n": nat, "rev": rev, "sq": rev * rev})
        agg = df.groupby("n", sort=True).agg(
            part_n=("rev", "size"), part_sum=("rev", "sum"), part_sq=("sq", "sum")
        )
        return pa.table(
            {
                "n_nationkey": pa.array(agg.index.to_numpy(np.int64)),
                "part_n": pa.array(agg["part_n"].to_numpy(np.int64)),
                "part_sum": pa.array(agg["part_sum"].to_numpy(np.int64)),
                "part_sq": pa.array(agg["part_sq"].to_numpy(np.int64)),
            }
        )

    agg = (
        orders.map_batches(_per_cust, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("part_cents", alias_name="cents"))
        .map_batches(_per_nation, batch_format="pyarrow")
        .groupby("n_nationkey")
        .aggregate(
            Sum("part_n", alias_name="n_customers"),
            Sum("part_sum", alias_name="total_cents"),
            Sum("part_sq", alias_name="sum_sq"),
        )
        .to_pandas()
        .sort_values("n_nationkey")
        .reset_index(drop=True)
    )
    hhi = [
        int(int(sq) * 1_000_000 // (int(tot) * int(tot))) if tot else 0
        for sq, tot in zip(agg["sum_sq"], agg["total_cents"])
    ]
    return pd.DataFrame(
        {
            "n_nationkey": agg["n_nationkey"].astype(np.int64),
            "n_customers": agg["n_customers"].astype(np.int64),
            "total_cents": agg["total_cents"].astype(np.int64),
            "hhi_ppm": np.asarray(hhi, np.int64),
        }
    )


ANOMALY_RATIO_PPM = 3_000_000  # child holds >= 3x its uniform quarter share


def tile_anomalies(sf_dir: str) -> pd.DataFrame:
    """Drill-down hotspot detection over the tile pyramid: child tiles
    holding at least ANOMALY_RATIO_PPM/1e6 times their uniform quarter
    of the parent's count (ratio_ppm = child*4*1e6 // parent, exact).
    One tile_counts pass at the leaf zoom; parent counts are the exact
    integer halving rollup; both tables are tile-grid-bounded so the
    final join runs driver-side on dimension-sized frames."""
    tc = tile_counts(sf_dir)
    df = tc.to_pandas() if hasattr(tc, "to_pandas") else tc
    tx = df["tile_x"].to_numpy(np.int64)
    ty = df["tile_y"].to_numpy(np.int64)
    n = df["n"].to_numpy(np.int64)
    # parent rollup: exact halving
    pk = (tx // 2) * (1 << 21) + (ty // 2)
    u, inv = np.unique(pk, return_inverse=True)
    pn = np.bincount(inv, weights=n.astype(np.float64)).astype(np.int64)
    parent_n = pn[inv]
    ratio = n * 4 * 1_000_000 // parent_n
    keep = ratio >= ANOMALY_RATIO_PPM
    out = pd.DataFrame(
        {
            "tile_x": tx[keep],
            "tile_y": ty[keep],
            "n": n[keep],
            "parent_n": parent_n[keep],
            "ratio_ppm": ratio[keep],
        }
    )
    return out.sort_values(["tile_x", "tile_y"]).reset_index(drop=True)


KCORE_K = 2
KCORE_ROUNDS = 6  # unrolled oracle rounds; engine asserts convergence


def supplier_kcore(sf_dir: str) -> pd.DataFrame:
    """k-core decomposition (k=KCORE_K) of the thresholded co-supply
    graph: iteratively peel nodes of degree < k until fixpoint; output
    the surviving core members with their in-core degree.  The peel runs
    on the supplier-bounded edge list (the distributed part is the
    incidence -> weights pipeline); convergence within KCORE_ROUNDS is
    ASSERTED because the oracle unrolls exactly that many rounds (the
    PageRank unrolled-CTE discipline)."""
    w = _cosupply_weights(sf_dir)
    ws = np.sort(w["wt"].to_numpy(np.int64))
    need = (500 * len(ws) + 999) // 1000
    thr = int(ws[need - 1]) if len(ws) else 0
    e = w[w["wt"] > thr]
    sa = e["sa"].to_numpy(np.int64)
    sb = e["sb"].to_numpy(np.int64)
    for _ in range(KCORE_ROUNDS):
        nodes, counts = np.unique(np.concatenate([sa, sb]), return_counts=True)
        bad = nodes[counts < KCORE_K]
        if len(bad) == 0:
            break
        m = ~(np.isin(sa, bad) | np.isin(sb, bad))
        sa, sb = sa[m], sb[m]
    nodes, counts = np.unique(np.concatenate([sa, sb]), return_counts=True)
    assert len(nodes) == 0 or counts.min() >= KCORE_K, (
        f"k-core did not converge in {KCORE_ROUNDS} rounds — widen KCORE_ROUNDS"
    )
    return pd.DataFrame(
        {"s_suppkey": nodes.astype(np.int64), "core_deg": counts.astype(np.int64)}
    )


def lang_confusion_matrix(sf_dir: str) -> pd.DataFrame:
    """Model-evaluation confusion matrix: stored ``lang`` label vs the
    engine's stopword lang_id prediction, counted per (true, pred) cell
    — the eval-harness shape every classifier stage needs.  Per-batch
    prediction + partial cell counts; the reduce is bounded by the
    (langs+1)^2 alphabet."""
    from ray.data.aggregate import Sum

    from .functions.text import lang_id

    docs = _docs(sf_dir, columns=("doc_id", "text", "lang"))

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        pred = lang_id(df["text"])
        out = pd.DataFrame({"lang_true": df["lang"].to_numpy(object), "lang_pred": pred})
        agg = out.groupby(["lang_true", "lang_pred"], sort=False).size().reset_index(name="part_n")
        agg["part_n"] = agg["part_n"].astype(np.int64)
        return agg

    out = (
        docs.map_batches(_partial, batch_format="pandas")
        .groupby(["lang_true", "lang_pred"])
        .aggregate(Sum("part_n", alias_name="n"))
        .to_pandas()
    )
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(["lang_true", "lang_pred"]).reset_index(drop=True)


CHURN_CUTOFF = np.datetime64("1998-01-01")


def cosupply_edge_churn(sf_dir: str) -> pd.DataFrame:
    """Temporal graph diff: co-supply pairs observed only before the
    cutoff, only after, or in both periods (edge churn between two
    snapshots).  Each half's distinct pair set comes from the SAME
    bucketed incidence pipeline with the period flag carried through —
    one pass over the fact, no threshold (raw co-occurrence)."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_shipdate"])

    def _inc(t: pa.Table) -> pd.DataFrame:
        ok = np.asarray(t["l_orderkey"].to_numpy(zero_copy_only=False), np.int64)
        sk = np.asarray(t["l_suppkey"].to_numpy(zero_copy_only=False), np.int64)
        late = (t["l_shipdate"].to_numpy(zero_copy_only=False) >= CHURN_CUTOFF).astype(np.int64)
        assert len(sk) == 0 or sk.max() < SUPP_PACK, "widen SUPP_PACK"
        key = (ok * SUPP_PACK + sk) * 2 + late
        u = np.unique(key)
        packed = u // 2
        return pd.DataFrame(
            {
                "bucket": (((packed // SUPP_PACK) * 2654435761) % 4294967296) % SESSION_BUCKETS,
                "ok": packed // SUPP_PACK,
                "sk": packed % SUPP_PACK,
                "late": u % 2,
            }
        )

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for late, gg in g.groupby("late", sort=False):
            gg = gg.drop_duplicates(["ok", "sk"])
            m = gg.merge(gg, on="ok")
            m = m[m["sk_x"] < m["sk_y"]]
            if m.empty:
                continue
            pk = np.unique(m["sk_x"].to_numpy(np.int64) * SUPP_PACK + m["sk_y"].to_numpy(np.int64))
            out.append(pd.DataFrame({"pk": pk, "late": np.int64(late)}))
        if not out:
            return pd.DataFrame({"pk": pd.array([], "int64"), "early": pd.array([], "int64"),
                                 "late_f": pd.array([], "int64")})
        df = pd.concat(out)
        flags = df.groupby("pk", sort=False)["late"].agg(["min", "max"])
        # within this bucket a pair may appear in either/both periods
        return pd.DataFrame(
            {
                "pk": flags.index.to_numpy(np.int64),
                "early": (flags["min"].to_numpy(np.int64) == 0).astype(np.int64),
                "late_f": (flags["max"].to_numpy(np.int64) == 1).astype(np.int64),
            }
        )

    def _rebucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["pbucket"] = (
            df["pk"].to_numpy(np.int64) * 2654435761 % 2**32
        ) % SESSION_BUCKETS
        return df

    def _classify(g: pd.DataFrame) -> pd.DataFrame:
        # each pk lives in exactly one pbucket, so per-bucket flag-merge
        # is global for that pair; emit 3 partial counts per bucket (the
        # pair-cardinality Ray groupby this replaced measured ~20 s of
        # pure per-group dispatch at sf0.01)
        f = g.groupby("pk", sort=False)[["early", "late_f"]].max()
        e = f["early"].to_numpy(np.int64)
        l = f["late_f"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "only_early": [int(((e == 1) & (l == 0)).sum())],
                "only_late": [int(((e == 0) & (l == 1)).sum())],
                "both_periods": [int(((e == 1) & (l == 1)).sum())],
            }
        )

    parts = (
        li.map_batches(_inc, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_pairs, batch_format="pandas")
        .map_batches(_rebucket, batch_format="pandas")
        .groupby("pbucket")
        .map_groups(_classify, batch_format="pandas")
        .to_pandas()
    )
    return pd.DataFrame(
        {
            "only_early": np.asarray([int(parts["only_early"].sum())], np.int64),
            "only_late": np.asarray([int(parts["only_late"].sum())], np.int64),
            "both_periods": np.asarray([int(parts["both_periods"].sum())], np.int64),
        }
    )


KEEP_LONGEST_PACK = 1 << 33  # doc_id and n_chars bounds, asserted


def documents_dedup_keep_longest(sf_dir: str):
    """Alternative dedup resolution policy: within each exact-content
    group keep the LONGEST document (tie -> smallest doc_id) instead of
    keep-first — the policy choice curation runs actually tune.  Winner
    selection packs (n_chars, -doc_id) into one int64 so per-bucket
    argmax merges exactly (max is associative); same coarse-bucket
    content-hash reduce as dedup_exact."""
    from .functions.text import md5_hex

    def _f(df: pd.DataFrame) -> pd.DataFrame:
        fp = md5_hex(df["text"])
        ids = df["doc_id"].to_numpy(np.int64)
        nch = df["n_chars"].to_numpy(np.int64)
        assert len(ids) == 0 or (ids.max() < KEEP_LONGEST_PACK and nch.max() < KEEP_LONGEST_PACK)
        return pd.DataFrame(
            {
                "bucket": _crc_bucket(fp),
                "fp": fp,
                "lifted": nch * KEEP_LONGEST_PACK + (KEEP_LONGEST_PACK - 1 - ids),
            }
        )

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("fp", sort=False)["lifted"].agg(["max", "size"])
        lifted = m["max"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "keep_doc_id": KEEP_LONGEST_PACK - 1 - lifted % KEEP_LONGEST_PACK,
                "n_chars": lifted // KEEP_LONGEST_PACK,
                "dup_count": m["size"].to_numpy(np.int64),
            }
        )

    return (
        _docs(sf_dir, columns=("doc_id", "text", "n_chars"))
        .map_batches(_f, batch_format="pandas")
        .groupby("bucket")
        .map_groups(_reduce, batch_format="pandas")
    )


NEAR_THETA_LO = 600  # audit band [LO, HI): near-dups a tighter threshold drops
NEAR_THETA_HI = 980


def near_threshold_pairs(sf_dir: str):
    """Dedup-threshold sensitivity audit: the exact-Jaccard pairs inside
    a tuning band (jaccard in [600, 980) permille) — the pairs a TIGHTER
    production threshold would stop merging.  Runs the complete
    prefix-filtered AllPairs at the band's LOWER theta (its completeness
    guarantee covers the whole band) and keeps the band."""
    from .stages.dedup import ngram_jaccard_exact_pairs

    pairs = ngram_jaccard_exact_pairs(_docs(sf_dir), theta_permille=NEAR_THETA_LO)

    def _band(t: pa.Table) -> pa.Table:
        j = np.asarray(t["jaccard_permille"].to_numpy(zero_copy_only=False), np.int64)
        keep = j < NEAR_THETA_HI
        return pa.table(
            {
                "doc_a": pa.array(np.asarray(t["doc_a"].to_numpy(zero_copy_only=False), np.int64)[keep]),
                "doc_b": pa.array(np.asarray(t["doc_b"].to_numpy(zero_copy_only=False), np.int64)[keep]),
                "jaccard_permille": pa.array(j[keep]),
            }
        )

    return pairs.map_batches(_band, batch_format="pyarrow")


GH_ROLLUP_LEVELS = (1, 2, 3, 4)


def geohash_prefix_rollup(sf_dir: str) -> pd.DataFrame:
    """Geohash prefix pyramid: point counts per geohash prefix at levels
    1-4 chars — the string-cell-code analog of the ZXY tile pyramid
    (geohash prefixes nest exactly like tile halvings).  One pass: each
    batch emits partial counts per (level, prefix); the reduce is
    bounded by the prefix alphabet per level.  The reduce key has
    ~87k distinct (level, prefix) groups at sf0.01 — cell-cardinality,
    so it goes through the coarse-bucket + vectorized-pandas pattern
    (a keyed Ray groupby here measured 62 s; this shape runs in ~2 s)."""
    from .functions.cells import geohash_encode
    from .functions.text import rolling_fingerprint_batch
    from .pipelines.spatial import derive_uniform_points

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_partkey"])

    def _partial(t: pa.Table) -> pd.DataFrame:
        pts = derive_uniform_points(t)
        gh = geohash_encode(
            pts["qx"].to_numpy(zero_copy_only=False), pts["qy"].to_numpy(zero_copy_only=False)
        ).astype("U8")
        frames = []
        for lv in GH_ROLLUP_LEVELS:
            pre = gh.astype(f"U{lv}")  # numpy U-truncation = prefix
            u, c = np.unique(pre, return_counts=True)
            frames.append(
                pd.DataFrame(
                    {
                        "level": np.full(len(u), lv, np.int64),
                        "prefix": u.astype(object),
                        "part_n": c.astype(np.int64),
                    }
                )
            )
        out = pd.concat(frames)
        out["bucket"] = (
            rolling_fingerprint_batch(out["prefix"].tolist())
            + out["level"].to_numpy(np.int64)
        ) % SESSION_BUCKETS
        return out[["bucket", "level", "prefix", "part_n"]]

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["level", "prefix"], sort=False)["part_n"].sum()
        idx = s.index
        return pd.DataFrame(
            {
                "level": idx.get_level_values(0).to_numpy(np.int64),
                "prefix": idx.get_level_values(1).to_numpy(object),
                "n": s.to_numpy(np.int64),
            }
        )

    out = (
        li.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_reduce, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["level", "prefix"]).reset_index(drop=True)


def nation_brand_weighted_jaccard(sf_dir: str) -> pd.DataFrame:
    """Weighted Jaccard between nations' brand-mix count vectors:
    wj_permille = sum(min(c_a, c_b)) * 1000 // sum(max(c_a, c_b)) — the
    exact multiset-overlap similarity (histogram intersection's
    normalized form).  Distributed part: (nation, brand) cell counts
    (bounded alphabet); the 25x25 pair sweep runs on the driver-held
    dense matrix."""
    import ray
    from ray.data.aggregate import Sum

    from .stages.join import hash_join

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]).map_batches(
        lambda t: t.rename_columns(["l_orderkey", "o_custkey"]), batch_format="pyarrow"
    )
    joined = hash_join(
        li, orders, "l_orderkey", ["o_custkey"], right_rows=_nrows(sf_dir, "orders")
    )
    cust_ref = _nat_kv_ref(sf_dir, "customer", "c_custkey", "c_nationkey")
    brand_ref = _brand_num_ref(sf_dir)

    def _partial(t: pa.Table) -> pa.Table:
        ck, cn = ray.get(cust_ref)
        bk, bv = ray.get(brand_ref)
        nat = cn[np.searchsorted(ck, np.asarray(t["o_custkey"].to_numpy(zero_copy_only=False), np.int64))]
        brand = bv[np.searchsorted(bk, np.asarray(t["l_partkey"].to_numpy(zero_copy_only=False), np.int64))]
        key = nat * BASKET_BRAND_PACK + brand
        u, c = np.unique(key, return_counts=True)
        return pa.table({"k": pa.array(u), "part_n": pa.array(c.astype(np.int64))})

    cells = (
        joined.map_batches(_partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("part_n", alias_name="n"))
        .to_pandas()
    )
    k = cells["k"].to_numpy(np.int64)
    n = cells["n"].to_numpy(np.int64)
    nats = np.unique(k // BASKET_BRAND_PACK)
    dense = np.zeros((int(nats.max()) + 1, BASKET_BRAND_PACK), np.int64)
    dense[k // BASKET_BRAND_PACK, k % BASKET_BRAND_PACK] = n
    rows = []
    for i in range(len(nats)):
        for j in range(i + 1, len(nats)):
            a, b = dense[nats[i]], dense[nats[j]]
            smin = int(np.minimum(a, b).sum())
            smax = int(np.maximum(a, b).sum())
            rows.append((int(nats[i]), int(nats[j]), smin, smax, smin * 1000 // smax))
    out = pd.DataFrame(
        rows, columns=["nat_a", "nat_b", "sum_min", "sum_max", "wj_permille"]
    ).astype(np.int64)
    return out.sort_values(["nat_a", "nat_b"]).reset_index(drop=True)


def revenue_longest_rise(sf_dir: str) -> pd.DataFrame:
    """Longest strictly-increasing run of DENSE daily revenue (zero-filled
    gaps), tie -> earliest start — sequence-run detection over a bounded
    aggregate: the distributed part is the day-keyed cents reduce; the
    run scan is one vectorized pass on the driver-held series."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def _partial(t: pa.Table) -> pa.Table:
        day = (
            t["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
            // 86_400_000_000
        )
        c = np.floor(
            np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        u, inv = np.unique(day, return_inverse=True)
        return pa.table(
            {
                "day": pa.array(u),
                "part_cents": pa.array(np.bincount(inv, weights=c.astype(np.float64)).astype(np.int64)),
            }
        )

    agg = (
        orders.map_batches(_partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("part_cents", alias_name="cents"))
        .to_pandas()
        .sort_values("day")
    )
    day = agg["day"].to_numpy(np.int64)
    cents = agg["cents"].to_numpy(np.int64)
    lo, hi = int(day.min()), int(day.max())
    dense = np.zeros(hi - lo + 1, np.int64)
    dense[day - lo] = cents
    rising = dense[1:] > dense[:-1]
    # run lengths: runs of consecutive True in `rising`
    best_len, best_start, cur = 0, 0, 0
    for i, r in enumerate(rising):
        cur = cur + 1 if r else 0
        if cur > best_len:
            best_len, best_start = cur, i - cur + 1
    return pd.DataFrame(
        {
            "start_day": np.asarray([lo + best_start], np.int64),
            "run_days": np.asarray([best_len + 1 if best_len else 1], np.int64),
        }
    )


NATION_TOPK = 3


def nation_top3_share(sf_dir: str) -> pd.DataFrame:
    """Revenue concentration per nation: exact permille share held by the
    top-NATION_TOPK customers (revenue DESC, custkey ASC).  Per-customer
    revenue reduces distributed (customer-bounded); the per-nation top-k
    + share runs on the dimension-sized frame."""
    import ray
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    nat_ref = _nat_kv_ref(sf_dir, "customer", "c_custkey", "c_nationkey")

    def _per_cust(t: pa.Table) -> pa.Table:
        ck = np.asarray(t["o_custkey"].to_numpy(zero_copy_only=False), np.int64)
        c = np.floor(
            np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        u, inv = np.unique(ck, return_inverse=True)
        return pa.table(
            {
                "o_custkey": pa.array(u),
                "part_cents": pa.array(np.bincount(inv, weights=c.astype(np.float64)).astype(np.int64)),
            }
        )

    rev = (
        orders.map_batches(_per_cust, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("part_cents", alias_name="cents"))
        .to_pandas()
    )
    nk, nv = ray.get(nat_ref)
    ck = rev["o_custkey"].to_numpy(np.int64)
    cents = rev["cents"].to_numpy(np.int64)
    nat = nv[np.searchsorted(nk, ck)]
    df = pd.DataFrame({"nat": nat, "ck": ck, "cents": cents})
    df = df.sort_values(["nat", "cents", "ck"], ascending=[True, False, True], kind="mergesort")
    top = df.groupby("nat", sort=True).head(NATION_TOPK).groupby("nat", sort=True)["cents"].sum()
    tot = df.groupby("nat", sort=True)["cents"].sum()
    out = pd.DataFrame(
        {
            "n_nationkey": tot.index.to_numpy(np.int64),
            "total_cents": tot.to_numpy(np.int64),
            "top3_cents": top.reindex(tot.index).fillna(0).to_numpy(np.int64),
        }
    )
    out["top3_share_permille"] = out["top3_cents"] * 1000 // out["total_cents"]
    return out


RFM_CLASSES = 4


def customer_rfm_segments(sf_dir: str) -> pd.DataFrame:
    """RFM segmentation (the classic BI/ML customer scoring): per
    customer the recency day-number (last order), frequency (order
    count) and monetary cents, each classed 1..RFM_CLASSES against exact
    equi-depth boundaries with the tie-deterministic strict-below rule
    (choropleth classing — raw NTILE labels are tie-nondeterministic).
    Distributed part: one customer-bounded reduce; boundaries + classing
    run on the dimension-sized frame."""
    from ray.data.aggregate import Max, Sum

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice", "o_orderdate"])

    def _partial(t: pa.Table) -> pd.DataFrame:
        ck = np.asarray(t["o_custkey"].to_numpy(zero_copy_only=False), np.int64)
        c = np.floor(
            np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        day = (
            t["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
            // 86_400_000_000
        )
        df = pd.DataFrame({"o_custkey": ck, "c": c, "day": day})
        agg = df.groupby("o_custkey", sort=False).agg(
            part_n=("c", "size"), part_cents=("c", "sum"), part_last=("day", "max")
        ).reset_index()
        return agg.astype({k: np.int64 for k in agg.columns})

    rfm = (
        orders.map_batches(_partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(
            Sum("part_n", alias_name="n_orders"),
            Sum("part_cents", alias_name="cents"),
            Max("part_last", alias_name="last_day"),
        )
        .to_pandas()
    )

    def _classes(vals: np.ndarray) -> np.ndarray:
        s = np.sort(vals)
        n = len(s)
        base, extra = n // RFM_CLASSES, n % RFM_CLASSES
        i = np.arange(1, RFM_CLASSES + 1)
        targets = base * i + np.minimum(i, extra)
        bounds = s[targets[:-1] - 1]
        return (1 + (vals[:, None] > bounds[None, :]).sum(axis=1)).astype(np.int64)

    out = pd.DataFrame(
        {
            "o_custkey": rfm["o_custkey"].astype(np.int64),
            "r_class": _classes(rfm["last_day"].to_numpy(np.int64)),
            "f_class": _classes(rfm["n_orders"].to_numpy(np.int64)),
            "m_class": _classes(rfm["cents"].to_numpy(np.int64)),
        }
    )
    return out.sort_values("o_custkey").reset_index(drop=True)


def route_bearing_octants(sf_dir: str) -> pd.DataFrame:
    """Trajectory heading distribution: every route leg (consecutive
    stops per order in (linenumber, partkey) order, the order_route_l1
    derivation) classified into 8 heading classes (quadrant x dominant
    axis) by PURE sign / |dx|-vs-|dy| comparisons — no trig anywhere, so
    engine and SQL agree exactly.  Zero-length legs are class 8."""
    from ray.data.aggregate import Sum

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_partkey"])

    def _prep(t: pa.Table) -> pa.Table:
        ok = np.asarray(t["l_orderkey"].to_numpy(zero_copy_only=False), np.int64)
        ln = np.asarray(t["l_linenumber"].to_numpy(zero_copy_only=False), np.int64)
        pk = np.asarray(t["l_partkey"].to_numpy(zero_copy_only=False), np.int64)
        return pa.table(
            {
                "bucket": pa.array(((ok * 2654435761) % 4294967296) % SESSION_BUCKETS),
                "l_orderkey": pa.array(ok),
                "ln": pa.array(ln),
                "pk": pa.array(pk),
                "ix": pa.array((ok * 131 + ln * 17) % 4096),
                "iy": pa.array((ok * 241 + pk * 13) % 4096),
            }
        )

    def _octant(dx: np.ndarray, dy: np.ndarray) -> np.ndarray:
        # heading class 0..7 = quadrant x dominant axis:
        # bit2 = dy < 0 (southbound), bit1 = dx < 0 (westbound),
        # bit0 = |dx| >= |dy| (x-dominant); 8 = zero-length leg.
        # Pure sign / magnitude comparisons — identical CASE ladder in SQL.
        cls = (
            (dy < 0).astype(np.int64) * 4
            + (dx < 0).astype(np.int64) * 2
            + (np.abs(dx) >= np.abs(dy)).astype(np.int64)
        )
        cls[(dx == 0) & (dy == 0)] = 8
        return cls

    def _legs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["l_orderkey", "ln", "pk"], kind="mergesort")
        ok = g["l_orderkey"].to_numpy(np.int64)
        ix = g["ix"].to_numpy(np.int64)
        iy = g["iy"].to_numpy(np.int64)
        if len(ok) < 2:
            return pd.DataFrame({"octant": pd.array([], "int64"), "part_n": pd.array([], "int64")})
        same = ok[1:] == ok[:-1]
        dx = (ix[1:] - ix[:-1])[same]
        dy = (iy[1:] - iy[:-1])[same]
        oc = _octant(dx, dy)
        u, c = np.unique(oc, return_counts=True)
        return pd.DataFrame({"octant": u.astype(np.int64), "part_n": c.astype(np.int64)})

    out = (
        li.map_batches(_prep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_legs, batch_format="pandas")
        .groupby("octant")
        .aggregate(Sum("part_n", alias_name="n"))
        .to_pandas()
        .sort_values("octant")
        .reset_index(drop=True)
    )
    return out.astype({"octant": np.int64, "n": np.int64})


def orders_time_pyramid(sf_dir: str) -> pd.DataFrame:
    """Time-dimension pyramid (the tile-pyramid shape on the calendar):
    order counts at THREE grains — epoch day, epoch week (day//7), and
    calendar month code (year*12 + month-1) — from one pass of per-batch
    partials; the reduce is bounded by the number of buckets across all
    grains, never by rows."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", columns=["o_orderdate"])

    def _partial(t: pa.Table) -> pa.Table:
        ts = t["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        day = ts.astype(np.int64) // 86_400_000_000
        week = day // 7
        month = ts.astype("datetime64[M]").astype(np.int64)  # months since 1970-01
        frames = []
        for grain, b in ((0, day), (1, week), (2, month)):
            u, c = np.unique(b, return_counts=True)
            frames.append((np.full(len(u), grain, np.int64), u, c.astype(np.int64)))
        return pa.table(
            {
                "grain": pa.array(np.concatenate([f[0] for f in frames])),
                "bucket_id": pa.array(np.concatenate([f[1] for f in frames])),
                "part_n": pa.array(np.concatenate([f[2] for f in frames])),
            }
        )

    out = (
        orders.map_batches(_partial, batch_format="pyarrow")
        .groupby(["grain", "bucket_id"])
        .aggregate(Sum("part_n", alias_name="n"))
        .to_pandas()
    )
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["grain", "bucket_id"]).reset_index(drop=True)


MAD_OUTLIER_MULT = 5


def events_mad_outliers(sf_dir: str):
    """Robust outlier detection: events whose |value - median| exceeds
    MAD_OUTLIER_MULT x the MAD of their event type (median/MAD by the
    exact lower-median rank rule, computed from per-type bounded value
    histograms) — the z-score screen without means or square roots.
    Histogram pass + one streaming filter pass with the tiny per-type
    stats in the closure."""
    import ray
    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def _cents(t: pa.Table) -> np.ndarray:
        return np.floor(
            np.asarray(t["value"].to_numpy(zero_copy_only=False), np.float64) * 100.0 + 0.5
        ).astype(np.int64)

    def _partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"f": t["event_type"].to_pandas().to_numpy(object), "c": _cents(t)})
        s = df.groupby(["f", "c"], sort=False).size().reset_index(name="part_n")
        s["part_n"] = s["part_n"].astype(np.int64)
        return s

    hist = (
        ev.map_batches(_partial, batch_format="pyarrow")
        .groupby(["f", "c"])
        .aggregate(Sum("part_n", alias_name="n"))
        .to_pandas()
    )

    def _rank_value(vals: np.ndarray, counts: np.ndarray, rank: int) -> int:
        order = np.argsort(vals, kind="stable")
        v, cc = vals[order], counts[order]
        return int(v[np.searchsorted(np.cumsum(cc), rank, side="left")])

    med, mad = {}, {}
    for f, grp in hist.groupby("f", sort=False):
        vals = grp["c"].to_numpy(np.int64)
        counts = grp["n"].to_numpy(np.int64)
        n = int(counts.sum())
        m = _rank_value(vals, counts, (n + 1) // 2)
        med[f] = m
        mad[f] = _rank_value(np.abs(vals - m), counts, (n + 1) // 2)

    def _filter(t: pa.Table) -> pa.Table:
        c = _cents(t)
        types = t["event_type"].to_pandas().to_numpy(object)
        m = np.asarray([med[x] for x in types], np.int64)
        d = np.asarray([mad[x] for x in types], np.int64)
        keep = np.abs(c - m) > MAD_OUTLIER_MULT * d
        return pa.table(
            {
                "event_id": pa.array(np.asarray(t["event_id"].to_numpy(zero_copy_only=False), np.int64)[keep]),
                "event_type": pa.array(types[keep].astype(object), pa.string()),
                "value_cents": pa.array(c[keep]),
            }
        )

    return ev.map_batches(_filter, batch_format="pyarrow")


COPULA_BINS = 10


def price_qty_copula_grid(sf_dir: str) -> pd.DataFrame:
    """Joint rank distribution (empirical copula grid): lineitem counts
    per (price decile, quantity decile) cell — the dependence structure
    between two columns with all marginals exactly uniform by
    construction.  Both boundary sets use the shared equi-depth rank
    rule + strict-below classing; one histogram pass per column, one
    classing pass, a 10x10 bounded reduce."""
    import ray
    from ray.data.aggregate import Sum

    from .stages.dedup import _sorted_kv_task

    li = _read(sf_dir, "lineitem", columns=["l_extendedprice", "l_quantity"])

    def _cents(t: pa.Table, col: str) -> np.ndarray:
        return np.floor(
            np.asarray(t[col].to_numpy(zero_copy_only=False), np.float64) * 100.0 + 0.5
        ).astype(np.int64)

    def _hist(col: str):
        def _partial(t: pa.Table) -> pa.Table:
            c = _cents(t, col)
            ub, inv = np.unique(c, return_inverse=True)
            return pa.table(
                {
                    "bucket": pa.array(((ub * 2654435761) % 4294967296) % SESSION_BUCKETS),
                    "cents": pa.array(ub),
                    "part_n": pa.array(np.bincount(inv).astype(np.int64)),
                }
            )

        def _reduce(g: pd.DataFrame) -> pd.DataFrame:
            s = g.groupby("cents", sort=False)["part_n"].sum()
            return pd.DataFrame({"cents": s.index.to_numpy(np.int64), "n": s.to_numpy(np.int64)})

        h = (
            li.map_batches(_partial, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(_reduce, batch_format="pandas")
        )
        refs = [br for b in h.iter_internal_ref_bundles() for br in b.block_refs]
        return _sorted_kv_task.remote(refs, "cents", "n")

    def _bounds(vals: np.ndarray, counts: np.ndarray) -> np.ndarray:
        cum = np.cumsum(counts)
        n = int(cum[-1])
        base, extra = n // COPULA_BINS, n % COPULA_BINS
        i = np.arange(1, COPULA_BINS)
        targets = base * i + np.minimum(i, extra)
        return vals[np.searchsorted(cum, targets, side="left")]

    pv, pc = ray.get(_hist("l_extendedprice"))
    qv, qc = ray.get(_hist("l_quantity"))
    pb, qb = _bounds(pv, pc), _bounds(qv, qc)

    def _cells(t: pa.Table) -> pa.Table:
        p = _cents(t, "l_extendedprice")
        q = _cents(t, "l_quantity")
        pcls = 1 + (p[:, None] > pb[None, :]).sum(axis=1)
        qcls = 1 + (q[:, None] > qb[None, :]).sum(axis=1)
        key = pcls * 100 + qcls
        u, c = np.unique(key, return_counts=True)
        return pa.table({"k": pa.array(u.astype(np.int64)), "part_n": pa.array(c.astype(np.int64))})

    agg = (
        li.map_batches(_cells, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("part_n", alias_name="n"))
        .to_pandas()
    )
    k = agg["k"].to_numpy(np.int64)
    out = pd.DataFrame(
        {"price_decile": k // 100, "qty_decile": k % 100, "n": agg["n"].to_numpy(np.int64)}
    )
    return out.sort_values(["price_decile", "qty_decile"]).reset_index(drop=True)


def orders_price_ranksum_drift(sf_dir: str) -> pd.DataFrame:
    """Two-sample Mann-Whitney rank-sum statistic between pre- and
    post-cutoff order prices, EXACT: with midranks doubled
    (midrank_v*2 = 2*cum_excl_v + n_v + 1, an integer even under ties),
    R1*2 = sum n_early_v * midrank_v*2 and U1*2 = R1*2 - n1*(n1+1).
    The real distribution-shift TEST STATISTIC (not just boundaries),
    from one split value histogram."""
    import ray

    from .stages.dedup import _sorted_kv_task

    orders = _read(sf_dir, "orders", columns=["o_totalprice", "o_orderdate"])

    def _partial(t: pa.Table) -> pa.Table:
        c = np.floor(
            np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        late = (t["o_orderdate"].to_numpy(zero_copy_only=False) >= DRIFT_CUTOFF).astype(np.int64)
        key = c * 2 + late
        ub, inv = np.unique(key, return_inverse=True)
        return pa.table(
            {
                "bucket": pa.array(((ub * 2654435761) % 4294967296) % SESSION_BUCKETS),
                "k": pa.array(ub),
                "part_n": pa.array(np.bincount(inv).astype(np.int64)),
            }
        )

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("k", sort=False)["part_n"].sum()
        return pd.DataFrame({"k": s.index.to_numpy(np.int64), "n": s.to_numpy(np.int64)})

    hist = (
        orders.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_reduce, batch_format="pandas")
    )
    refs = [br for b in hist.iter_internal_ref_bundles() for br in b.block_refs]
    keys, counts = ray.get(_sorted_kv_task.remote(refs, "k", "n"))
    cents = keys // 2
    late = keys % 2
    uv = np.unique(cents)
    n0 = np.zeros(len(uv), np.int64)
    n1 = np.zeros(len(uv), np.int64)
    pos = np.searchsorted(uv, cents)
    np.add.at(n0, pos[late == 0], counts[late == 0])
    np.add.at(n1, pos[late == 1], counts[late == 1])
    nv = n0 + n1
    cum_excl = np.cumsum(nv) - nv
    r1x2 = int((n0 * (2 * cum_excl + nv + 1)).sum())
    ne, nl = int(n0.sum()), int(n1.sum())
    return pd.DataFrame(
        {
            "n_early": np.asarray([ne], np.int64),
            "n_late": np.asarray([nl], np.int64),
            "r1_x2": np.asarray([r1x2], np.int64),
            "u1_x2": np.asarray([r1x2 - ne * (ne + 1)], np.int64),
        }
    )


CHURN_GAP_RANK_NUM, CHURN_GAP_RANK_DEN = 9, 10  # p90 gap threshold


def customers_at_churn_risk(sf_dir: str) -> pd.DataFrame:
    """Churn-risk flagging: customers whose days-since-last-order exceeds
    the exact p90 of all customers' gaps (rank ceil(0.9n), the shared
    integer rank rule) measured at the dataset's last order day.
    Per-customer last-day reduce; threshold + flags on the
    dimension-sized frame."""
    from ray.data.aggregate import Max

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])

    def _partial(t: pa.Table) -> pd.DataFrame:
        ck = np.asarray(t["o_custkey"].to_numpy(zero_copy_only=False), np.int64)
        day = (
            t["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
            // 86_400_000_000
        )
        df = pd.DataFrame({"o_custkey": ck, "d": day})
        m = df.groupby("o_custkey", sort=False)["d"].max().reset_index(name="part_last")
        return m

    last = (
        orders.map_batches(_partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Max("part_last", alias_name="last_day"))
        .to_pandas()
    )
    ld = last["last_day"].to_numpy(np.int64)
    cutoff = int(ld.max())
    gap = cutoff - ld
    s = np.sort(gap)
    n = len(s)
    r = (CHURN_GAP_RANK_NUM * n + CHURN_GAP_RANK_DEN - 1) // CHURN_GAP_RANK_DEN  # ceil(0.9n)
    p90 = int(s[r - 1])
    keep = gap > p90
    out = pd.DataFrame(
        {
            "o_custkey": last["o_custkey"].to_numpy(np.int64)[keep],
            "gap_days": gap[keep],
        }
    )
    return out.sort_values("o_custkey").reset_index(drop=True)


LORENZ_POINTS = 10


def customer_lorenz_curve(sf_dir: str) -> pd.DataFrame:
    """Lorenz curve of customer revenue (the inequality plot behind the
    Pareto/HHI family): cumulative cents held by the poorest i/10 of
    customers (revenue ASC, custkey ASC), exact at each decile rank via
    the shared (tot//K)*i + min(i, tot%K) rule.  Distributed per-customer
    reduce; curve points from the dimension-sized frame."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def _per_cust(t: pa.Table) -> pa.Table:
        ck = np.asarray(t["o_custkey"].to_numpy(zero_copy_only=False), np.int64)
        c = np.floor(
            np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        u, inv = np.unique(ck, return_inverse=True)
        return pa.table(
            {
                "o_custkey": pa.array(u),
                "part_cents": pa.array(np.bincount(inv, weights=c.astype(np.float64)).astype(np.int64)),
            }
        )

    rev = (
        orders.map_batches(_per_cust, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("part_cents", alias_name="cents"))
        .to_pandas()
    )
    ck = rev["o_custkey"].to_numpy(np.int64)
    cents = rev["cents"].to_numpy(np.int64)
    order = np.lexsort((ck, cents))  # revenue ASC, custkey ASC
    cum = np.cumsum(cents[order])
    n = len(cum)
    total = int(cum[-1])
    base, extra = n // LORENZ_POINTS, n % LORENZ_POINTS
    i = np.arange(1, LORENZ_POINTS + 1)
    targets = base * i + np.minimum(i, extra)
    return pd.DataFrame(
        {
            "decile": i.astype(np.int64),
            "cum_customers": targets.astype(np.int64),
            "cum_cents": cum[targets - 1].astype(np.int64),
            "total_cents": np.full(LORENZ_POINTS, total, np.int64),
        }
    )


def doc_hapax_ratio(sf_dir: str):
    """Hapax legomena per document: token count and the number of tokens
    occurring exactly once — the vocabulary-richness quality feature
    (the exact rational n_hapax/n_tokens without division).  Entirely
    per-batch: a doc's tokens never leave its block."""
    from .functions.text import ws_tokens

    def _f(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        nt, nh = np.zeros(len(ids), np.int64), np.zeros(len(ids), np.int64)
        for i, txt in enumerate(df["text"]):
            toks = ws_tokens(txt.lower())
            nt[i] = len(toks)
            if toks:
                _, c = np.unique(np.asarray(toks, object), return_counts=True)
                nh[i] = int((c == 1).sum())
        return pd.DataFrame({"doc_id": ids, "n_tokens": nt, "n_hapax": nh})

    return _docs(sf_dir).map_batches(_f, batch_format="pandas")


def customer_revenue_gini(sf_dir: str) -> pd.DataFrame:
    """Exact Gini coefficient of customer revenue as the integer rational
    (gini_num, gini_den) = (2*sum(i*x_(i)) - (n+1)*total, n*total) over
    the (revenue ASC, custkey ASC) order — completes the inequality
    family next to the Lorenz points, Pareto prefix and HHI.  Same
    distributed per-customer reduce; rank-weighted sums on the
    dimension-sized frame (bounds asserted < 2^63)."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def _per_cust(t: pa.Table) -> pa.Table:
        ck = np.asarray(t["o_custkey"].to_numpy(zero_copy_only=False), np.int64)
        c = np.floor(
            np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        u, inv = np.unique(ck, return_inverse=True)
        return pa.table(
            {
                "o_custkey": pa.array(u),
                "part_cents": pa.array(np.bincount(inv, weights=c.astype(np.float64)).astype(np.int64)),
            }
        )

    rev = (
        orders.map_batches(_per_cust, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("part_cents", alias_name="cents"))
        .to_pandas()
    )
    ck = rev["o_custkey"].to_numpy(np.int64)
    cents = rev["cents"].to_numpy(np.int64)
    order = np.lexsort((ck, cents))
    x = cents[order]
    n = len(x)
    total = int(x.sum())
    i = np.arange(1, n + 1, dtype=np.int64)
    assert n * total < (1 << 62), "gini_den overflow guard"
    ranked = int((i * x).sum())
    return pd.DataFrame(
        {
            "n_customers": np.asarray([n], np.int64),
            "total_cents": np.asarray([total], np.int64),
            "gini_num": np.asarray([2 * ranked - (n + 1) * total], np.int64),
            "gini_den": np.asarray([n * total], np.int64),
        }
    )


# ------------------------------------------------ round-5 additions

Q21_LATE_DAYS = 90


def q21_waiting_suppliers(sf_dir: str) -> pd.DataFrame:
    """TPC-H q21 adapted to the synthetic schema (no commit/receipt
    dates): a supplier "kept the order waiting" when it shipped a line
    more than Q21_LATE_DAYS after the order date on a MULTI-supplier
    order where it was the ONLY late supplier.  Order dates broadcast as
    a sorted kv array (fact never shuffles); per-batch distinct
    (order, supplier, late) partials -> order-bucket shuffle -> per-order
    resolution -> supplier counts (driver combine bounded by the supplier
    entity count, never rows)."""
    import pyarrow.compute as pc
    import ray

    from .stages.dedup import _sorted_kv_task

    def _day_col(col) -> np.ndarray:
        day = pc.cast(
            pc.days_between(
                pa.scalar(pd.Timestamp("1990-01-01"), pa.timestamp("us")),
                pc.floor_temporal(col, unit="day"),
            ),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        return np.asarray(day, np.int64)

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"]).map_batches(
        lambda t: pa.table(
            {"k": t["o_orderkey"], "v": pa.array(_day_col(t["o_orderdate"]))}
        ),
        batch_format="pyarrow",
    )
    refs = [br for b in orders.iter_internal_ref_bundles() for br in b.block_refs]
    kv_ref = _sorted_kv_task.remote(refs, "k", "v")

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_shipdate"])

    def _partial(t: pa.Table) -> pd.DataFrame:
        ks, vs = ray.get(kv_ref)
        ok = np.asarray(t["l_orderkey"].to_numpy(zero_copy_only=False), np.int64)
        sk = np.asarray(t["l_suppkey"].to_numpy(zero_copy_only=False), np.int64)
        late = (_day_col(t["l_shipdate"]) - vs[np.searchsorted(ks, ok)]) > Q21_LATE_DAYS
        df = pd.DataFrame({"ok": ok, "sk": sk, "late": late.astype(np.int64)})
        agg = df.groupby(["ok", "sk"], sort=False)["late"].max().reset_index()
        agg["bucket"] = (agg["ok"].to_numpy(np.int64) * 2654435761 % 2**32) % SESSION_BUCKETS
        return agg[["bucket", "ok", "sk", "late"]]

    def _resolve(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["ok", "sk"], sort=False)["late"].max().reset_index()
        per = agg.groupby("ok", sort=False).agg(
            n_supp=("sk", "size"), n_late=("late", "sum")
        )
        late_rows = agg[agg["late"] == 1]
        late_of = late_rows.set_index("ok")["sk"]
        sole = per[(per["n_supp"] >= 2) & (per["n_late"] == 1)].index
        winners = late_of.loc[late_of.index.isin(sole)]
        cnt = winners.groupby(winners).size()
        return pd.DataFrame(
            {
                "s_suppkey": cnt.index.to_numpy(np.int64),
                "part_n": cnt.to_numpy(np.int64),
            }
        )

    parts = (
        li.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_resolve, batch_format="pandas")
        .to_pandas()
    )
    if parts.empty:
        return pd.DataFrame(
            {
                "s_suppkey": pd.array([], "int64"),
                "s_name": pd.array([], "object"),
                "numwait": pd.array([], "int64"),
            }
        )
    numwait = parts.groupby("s_suppkey")["part_n"].sum()
    sup = (
        _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
        .to_pandas()
        .set_index("s_suppkey")["s_name"]
    )
    keys = numwait.index.to_numpy(np.int64)
    return pd.DataFrame(
        {
            "s_suppkey": keys,
            "s_name": sup.reindex(keys).to_numpy(object),
            "numwait": numwait.to_numpy(np.int64),
        }
    )


def route_road_crossings(sf_dir: str):
    """Vector-overlay primitive: each lineitem row derives one movement
    segment between two lattice points; count how many ROAD segments it
    properly crosses (strict orientation tests, EXACT int64 — sign
    comparisons, never cross-product products, so nothing overflows).
    The 144-segment road layer is a bounded reference layer evaluated
    densely per batch (like the parcel layer); input rows stream."""
    from .functions.cells import X0, Y0

    seg = _snap_seg_arrays()
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber"])

    def _cross_sign(ox, oy, px, py, qx, qy):
        # sign of the z-cross of (p-o) x (q-o); int64, |coords| < 2^21
        v = (px - ox) * (qy - oy) - (py - oy) * (qx - ox)
        return np.sign(v)

    def _f(t: pa.Table) -> pa.Table:
        ok = np.asarray(t["l_orderkey"].to_numpy(zero_copy_only=False), np.int64)
        ln = np.asarray(t["l_linenumber"].to_numpy(zero_copy_only=False), np.int64)
        p1x = (X0 + ((ok * 131 + ln * 17) % 4096) * 125).astype(np.int64)
        p1y = (Y0 + ((ok * 241 + ln * 13) % 4096) * 125).astype(np.int64)
        p2x = (X0 + ((ok * 131 + ln * 17 + 1777) % 4096) * 125).astype(np.int64)
        p2y = (Y0 + ((ok * 241 + ln * 13 + 911) % 4096) * 125).astype(np.int64)
        qid = ok * 10 + ln
        ax, ay = seg["ax"][None, :], seg["ay"][None, :]
        bx, by = seg["bx"][None, :], seg["by"][None, :]
        d1 = _cross_sign(p1x[:, None], p1y[:, None], p2x[:, None], p2y[:, None], ax, ay)
        d2 = _cross_sign(p1x[:, None], p1y[:, None], p2x[:, None], p2y[:, None], bx, by)
        d3 = _cross_sign(ax, ay, bx, by, p1x[:, None], p1y[:, None])
        d4 = _cross_sign(ax, ay, bx, by, p2x[:, None], p2y[:, None])
        proper = (d1 * d2 < 0) & (d3 * d4 < 0)
        return pa.table(
            {
                "query_id": pa.array(qid, pa.int64()),
                "n_crossings": pa.array(proper.sum(axis=1).astype(np.int64)),
            }
        )

    return li.map_batches(_f, batch_format="pyarrow", batch_size=8192)


def users_all_event_types(sf_dir: str):
    """Boolean AND retrieval over the events fact: users whose event-type
    set covers EVERY distinct type in the corpus.  Per-batch distinct
    (user, type) partials -> user-bucket shuffle -> per-bucket distinct
    count; the global type count is a tiny driver-side union of
    per-batch uniques (bounded by the type vocabulary)."""
    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])

    types = (
        ev.map_batches(
            lambda t: pa.table(
                {
                    "event_type": pa.array(
                        pd.unique(t["event_type"].to_pandas()), pa.string()
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()["event_type"]
        .nunique()
    )
    k = int(types)

    def _partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "user_id": np.asarray(t["user_id"].to_numpy(zero_copy_only=False), np.int64),
                "event_type": t["event_type"].to_pandas().to_numpy(object),
            }
        ).drop_duplicates()
        df["bucket"] = (df["user_id"].to_numpy(np.int64) * 2654435761 % 2**32) % SESSION_BUCKETS
        return df[["bucket", "user_id", "event_type"]]

    def _full(g: pd.DataFrame) -> pd.DataFrame:
        n = g.drop_duplicates(["user_id", "event_type"]).groupby("user_id", sort=False).size()
        keep = n[n == k]
        return pd.DataFrame({"user_id": keep.index.to_numpy(np.int64)})

    return (
        ev.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_full, batch_format="pandas")
    )


MEAN_DF_SCALE = 1000


def doc_mean_token_df(sf_dir: str):
    """Corpus-relative quality signal: per doc, the mean DOCUMENT
    FREQUENCY of its distinct tokens as the exact integer rational
    floor(SCALE * sum(df) / n_distinct) — high values mark docs made of
    corpus-common tokens (boilerplate-ish), low values mark rare-token
    docs.  Two streaming passes: (1) the distinct-token df table via
    token-bucket partials, broadcast back as a sorted kv array built
    remotely; (2) per-doc mean via searchsorted — token strings shuffle
    once, never per doc."""
    import ray

    from .functions.text import rolling_fingerprint_batch, ws_tokens
    from .stages.dedup import _sorted_kv_task

    docs = _docs(sf_dir)

    def _doc_fps(s: str) -> np.ndarray:
        # per-doc DISTINCT token fingerprints — distinctness over the
        # shared ROLL_* hash, identical collision behavior to the SQL
        # twin (the doc_type_token_ratio convention)
        toks = ws_tokens(s.lower())
        if not toks:
            return np.zeros(0, np.int64)
        return np.unique(rolling_fingerprint_batch(toks))

    def _df_partial(df: pd.DataFrame) -> pd.DataFrame:
        per_doc = [_doc_fps(s) for s in df["text"]]
        flat = (
            np.concatenate(per_doc) if per_doc else np.zeros(0, np.int64)
        )
        u, c = np.unique(flat, return_counts=True)
        return pd.DataFrame(
            {
                "bucket": (u * 2654435761 % 2**32) % SESSION_BUCKETS,
                "fp": u,
                "cnt": c.astype(np.int64),
            }
        )

    def _df_reduce(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("fp", sort=False)["cnt"].sum()
        return pd.DataFrame({"fp": s.index.to_numpy(np.int64), "df": s.to_numpy(np.int64)})

    df_tab = (
        docs.map_batches(_df_partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(_df_reduce, batch_format="pandas")
    )
    refs = [br for b in df_tab.iter_internal_ref_bundles() for br in b.block_refs]
    kv_ref = _sorted_kv_task.remote(refs, "fp", "df")

    def _mean(df: pd.DataFrame) -> pd.DataFrame:
        fps_sorted, dfs = ray.get(kv_ref)
        ids = df["doc_id"].to_numpy(np.int64)
        out_id, out_v, out_n = [], [], []
        for i, s in zip(ids, df["text"]):
            fps = _doc_fps(s)
            if len(fps) == 0:
                continue
            tot = int(dfs[np.searchsorted(fps_sorted, fps)].sum())
            out_id.append(i)
            out_v.append(MEAN_DF_SCALE * tot // len(fps))
            out_n.append(len(fps))
        return pd.DataFrame(
            {
                "doc_id": np.asarray(out_id, np.int64),
                "mean_df_scaled": np.asarray(out_v, np.int64),
                "n_distinct": np.asarray(out_n, np.int64),
            }
        )

    return docs.map_batches(_mean, batch_format="pandas")


TRUNC_BUDGET = 64


def token_budget_truncation(sf_dir: str):
    """Context-window prep: keep each document's first TRUNC_BUDGET
    whitespace tokens, re-joined with single spaces (the deterministic
    re-serialization both sides share), and report original/kept token
    counts.  Pure per-batch transform — no shuffle."""
    from .functions.text import ws_tokens

    def _f(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        out_txt, n_tok, n_kept = [], [], []
        for s in df["text"]:
            toks = ws_tokens(s)
            kept = toks[:TRUNC_BUDGET]
            out_txt.append(" ".join(kept))
            n_tok.append(len(toks))
            n_kept.append(len(kept))
        return pd.DataFrame(
            {
                "doc_id": ids,
                "truncated_text": np.asarray(out_txt, object),
                "n_tokens": np.asarray(n_tok, np.int64),
                "n_kept": np.asarray(n_kept, np.int64),
            }
        )

    return _docs(sf_dir).map_batches(_f, batch_format="pandas")


def pack_efficiency_report(sf_dir: str, max_len: int = SEQ_PACK_MAXLEN):
    """Training-layout audit over the sequence_packing output: per
    sequence, how many documents touch it, how many START in it, and its
    token fill (== max_len everywhere but the tail sequence).  Each doc
    flat-maps to the sequences its token span covers (np.repeat span
    expansion, the tile_cover shape); per-seq partials reduce through a
    bounded seq-bucket shuffle."""
    packed = sequence_packing(sf_dir, max_len=max_len)

    def _cover(t: pa.Table) -> pd.DataFrame:
        nt = np.asarray(t["n_tokens"].to_numpy(zero_copy_only=False), np.int64)
        s0 = np.asarray(t["seq_id"].to_numpy(zero_copy_only=False), np.int64)
        off = np.asarray(t["seq_offset"].to_numpy(zero_copy_only=False), np.int64)
        nz = nt > 0
        nt, s0, off = nt[nz], s0[nz], off[nz]
        # last seq a doc touches: (start + n - 1) // max_len
        s1 = s0 + (off + nt - 1) // max_len
        nseq = s1 - s0 + 1
        owner = np.repeat(np.arange(len(nt)), nseq)
        pos = np.arange(int(nseq.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(nseq) - nseq, nseq
        )
        seq = s0[owner] + pos
        # tokens of this doc inside this seq: clip the doc span to the
        # seq window (all int64)
        doc_lo = s0[owner] * max_len + off[owner]
        doc_hi = doc_lo + nt[owner]
        win_lo = seq * max_len
        fill = np.minimum(doc_hi, win_lo + max_len) - np.maximum(doc_lo, win_lo)
        starts = (pos == 0).astype(np.int64)
        df = pd.DataFrame(
            {"seq_id": seq, "fill": fill, "n_docs": 1, "n_starts": starts}
        )
        agg = df.groupby("seq_id", sort=False).sum().reset_index()
        agg["bucket"] = (agg["seq_id"].to_numpy(np.int64) * 2654435761 % 2**32) % SESSION_BUCKETS
        return agg[["bucket", "seq_id", "fill", "n_docs", "n_starts"]]

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("seq_id", sort=False)[["fill", "n_docs", "n_starts"]].sum()
        return pd.DataFrame(
            {
                "seq_id": s.index.to_numpy(np.int64),
                "fill_tokens": s["fill"].to_numpy(np.int64),
                "n_docs": s["n_docs"].to_numpy(np.int64),
                "n_starts": s["n_starts"].to_numpy(np.int64),
            }
        )

    return (
        packed.map_batches(_cover, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_reduce, batch_format="pandas")
    )


N_SHARDS = 16


def shard_manifest_documents(sf_dir: str):
    """Resumable-output manifest: deterministic shard assignment
    (doc_id % N_SHARDS) with per-shard row count, byte volume and an
    order-insensitive content checksum (SUM of per-doc ROLL_* text
    fingerprints — SQL-replicable, no md5).  Per-batch partials ->
    bounded shard-keyed reduce: the audit a 100 TB writer runs to verify
    which shards are complete before a resume."""
    from .functions.text import rolling_fingerprint_batch

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        fp = rolling_fingerprint_batch(df["text"].tolist())
        nch = df["n_chars"].to_numpy(np.int64)
        d = pd.DataFrame({"shard": ids % N_SHARDS, "n": 1, "chars": nch, "fp": fp})
        agg = d.groupby("shard", sort=False).sum().reset_index()
        return agg

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("shard", sort=False)[["n", "chars", "fp"]].sum()
        return pd.DataFrame(
            {
                "shard": s.index.to_numpy(np.int64),
                "n_docs": s["n"].to_numpy(np.int64),
                "total_chars": s["chars"].to_numpy(np.int64),
                "checksum": s["fp"].to_numpy(np.int64),
            }
        )

    return (
        docs.map_batches(_partial, batch_format="pandas")
        .groupby("shard")
        .map_groups(_reduce, batch_format="pandas")
    )


def ngram_containment_pairs(sf_dir: str):
    """Directional near-dup containment (|A∩B|/|A| and /|B| in permille)
    for every exact-jaccard candidate pair — the asymmetric signal that
    catches a small doc swallowed whole by a larger one.  Same COMPLETE
    prefix-filtered machinery as ngram_jaccard_pairs with two extra
    output columns."""
    from .stages.dedup import ngram_jaccard_exact_pairs

    return ngram_jaccard_exact_pairs(
        _docs(sf_dir), theta_permille=500, out_containment=True
    )


def weighted_pagerank_suppliers(sf_dir: str):
    """Weighted exact-integer PageRank over the supplier <-> customer
    graph: edge weight = lineitem row count between the pair, per-edge
    contribution floor(rank * w / out_weight) — the volume-aware
    centrality next to the unweighted pagerank_suppliers.  Weights come
    out of a pair-bucketed partial-count reduce (bounded by pair
    cardinality, never input rows); the solve is stages/graph.py
    pagerank_weighted (single-task below the edge threshold, AggregateFn
    streaming above)."""
    import ray

    from .stages.dedup import TARGET_BUCKET_ROWS, _sorted_kv_task
    from .stages.graph import PR_CUST_OFFSET, pagerank_weighted

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    kv_ref = _sorted_kv_task.remote(
        [br for bd in orders.iter_internal_ref_bundles() for br in bd.block_refs],
        "o_orderkey",
        "o_custkey",
    )
    nb = max(8, _nrows(sf_dir, "lineitem") // TARGET_BUCKET_ROWS + 1)
    mask = (1 << 31) - 1

    def _partial(t: pa.Table) -> pd.DataFrame:
        okeys, custs = ray.get(kv_ref)
        lo = np.asarray(t["l_orderkey"].to_numpy(zero_copy_only=False), np.int64)
        sup = np.asarray(t["l_suppkey"].to_numpy(zero_copy_only=False), np.int64)
        cust = custs[np.searchsorted(okeys, lo)] + PR_CUST_OFFSET
        pk = (sup << 31) | cust
        u, c = np.unique(pk, return_counts=True)
        return pd.DataFrame(
            {
                "bucket": (u * 2654435761 % 2**32) % nb,
                "pk": u,
                "part_n": c.astype(np.int64),
            }
        )

    def _edges(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("pk", sort=False)["part_n"].sum()
        pk = s.index.to_numpy(np.int64)
        w = s.to_numpy(np.int64)
        sup, cust = pk >> 31, pk & mask
        return pd.DataFrame(
            {
                "src": np.concatenate([sup, cust]),
                "dst": np.concatenate([cust, sup]),
                "w": np.concatenate([w, w]),
            }
        )

    edges = (
        _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_edges, batch_format="pandas")
    )
    return pagerank_weighted(edges)


def minhash_recall_report(sf_dir: str) -> pd.DataFrame:
    """Approximate-dedup evaluation harness: MinHash+LSH pairs
    (est_jaccard >= 500‰) scored against the COMPLETE exact-jaccard
    pair set at the same threshold — true/false positives and misses as
    one audit row.  Both pair sets are output-bounded (near-dup pairs,
    not the corpus), so the final confusion join runs driver-side on
    results the distributed pipelines already shrank."""
    exact = ngram_jaccard_pairs(sf_dir).to_pandas()
    approx = minhash_dup_pairs(sf_dir).to_pandas()
    ek = set(zip(exact["doc_a"], exact["doc_b"]))
    mk = set(zip(approx["doc_a"], approx["doc_b"]))
    tp = len(ek & mk)
    return pd.DataFrame(
        {
            "n_exact": np.asarray([len(ek)], np.int64),
            "n_minhash": np.asarray([len(mk)], np.int64),
            "true_pos": np.asarray([tp], np.int64),
            "false_pos": np.asarray([len(mk) - tp], np.int64),
            "false_neg": np.asarray([len(ek) - tp], np.int64),
        }
    )


DELTA_MOD = 7  # doc_id % DELTA_MOD == 0 -> the "newly ingested" delta


def minhash_delta_near_dups(sf_dir: str):
    """Incremental dedup: probe the newly-ingested delta (doc_id %
    DELTA_MOD == 0) against the existing base corpus's LSH bands —
    query-vs-corpus, never base-vs-base all-pairs (the per-increment
    shape of a continuously ingesting 100 TB pipeline)."""
    from .stages.dedup import minhash_delta_probe

    def _side(keep_delta: bool):
        def _f(t: pa.Table) -> pa.Table:
            ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), np.int64)
            m = (ids % DELTA_MOD == 0) == keep_delta
            return t.filter(pa.array(m))

        return _f

    docs = _docs(sf_dir)
    base = docs.map_batches(_side(False), batch_format="pyarrow")
    delta = _docs(sf_dir).map_batches(_side(True), batch_format="pyarrow")
    return minhash_delta_probe(base, delta, n_docs=_nrows(sf_dir, "documents"))


SENT_PACK = 1 << 20  # position slots per doc; doc_id < 2^42 asserted


def doc_sentence_dedup(sf_dir: str):
    """Cross-document SENTENCE-level exact dedup (the sub-document
    granularity between whole-doc dedup and passage windows): every
    '. '-delimited sentence keeps only its FIRST global occurrence
    (smallest (doc_id, position)), duplicates drop wherever they appear
    later.  Two streaming passes: (1) per-batch (sentence-fp -> min
    pack, count) partials -> fp-bucket reduce keeping ONLY fps seen >= 2
    times (the dup set — broadcast volume is bounded by duplication, not
    corpus size) -> sorted kv broadcast built remotely; (2) re-stream,
    keep a sentence iff its fp is absent from the dup set or its pack IS
    the minimum.  Identity is the shared ROLL_* fingerprint on BOTH
    sides (identical collision behavior)."""
    import ray

    from .functions.text import rolling_fingerprint_batch
    from .stages.dedup import _sorted_kv_task

    docs = _docs(sf_dir)

    def _explode(df: pd.DataFrame):
        ids = df["doc_id"].to_numpy(np.int64)
        assert len(ids) == 0 or ids.max() < (1 << 42), "widen SENT_PACK"
        ex = df["text"].str.split(". ", regex=False).explode()
        owner = ex.index.to_numpy(np.int64)
        pos = (
            pd.Series(1, index=ex.index).groupby(level=0).cumsum().to_numpy(np.int64)
        )
        fps = rolling_fingerprint_batch(ex.tolist())
        pack = ids[owner] * SENT_PACK + pos
        return ids, owner, pos, fps, pack, ex

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        _, _, _, fps, pack, _ = _explode(df)
        d = pd.DataFrame({"fp": fps, "pack": pack})
        agg = d.groupby("fp", sort=False)["pack"].agg(["min", "size"]).reset_index()
        agg["bucket"] = (agg["fp"].to_numpy(np.int64) * 2654435761 % 2**32) % SESSION_BUCKETS
        return pd.DataFrame(
            {
                "bucket": agg["bucket"].to_numpy(np.int64),
                "fp": agg["fp"].to_numpy(np.int64),
                "minpack": agg["min"].to_numpy(np.int64),
                "cnt": agg["size"].to_numpy(np.int64),
            }
        )

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("fp", sort=False).agg(
            minpack=("minpack", "min"), cnt=("cnt", "sum")
        )
        dup = s[s["cnt"] >= 2]
        return pd.DataFrame(
            {
                "fp": dup.index.to_numpy(np.int64),
                "minpack": dup["minpack"].to_numpy(np.int64),
            }
        )

    dup_tab = (
        docs.map_batches(_partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(_reduce, batch_format="pandas")
    )
    refs = [br for b in dup_tab.iter_internal_ref_bundles() for br in b.block_refs]
    kv_ref = _sorted_kv_task.remote(refs, "fp", "minpack")

    def _apply(df: pd.DataFrame) -> pd.DataFrame:
        fps_sorted, minpacks = ray.get(kv_ref)
        ids, owner, pos, fps, pack, ex = _explode(df)
        p = np.searchsorted(fps_sorted, fps)
        p_ok = p < len(fps_sorted)
        is_dup_fp = np.zeros(len(fps), bool)
        is_dup_fp[p_ok] = fps_sorted[p[p_ok]] == fps[p_ok]
        keep = ~is_dup_fp
        keep[is_dup_fp] = minpacks[p[is_dup_fp]] == pack[is_dup_fp]
        kept = ex[keep]
        joined = kept.groupby(level=0).agg(". ".join)
        n_kept = kept.groupby(level=0).size()
        n_tot = ex.groupby(level=0).size()
        nk = n_kept.reindex(n_tot.index, fill_value=0).to_numpy(np.int64)
        return pd.DataFrame(
            {
                "doc_id": ids,
                "clean_text": joined.reindex(n_tot.index, fill_value="").to_numpy(object),
                "n_kept": nk,
                "n_dropped": n_tot.to_numpy(np.int64) - nk,
            }
        )

    return docs.map_batches(_apply, batch_format="pandas")


def supplier_betweenness(sf_dir: str):
    """Exact betweenness centrality over the sampled co-supply graph
    (the brokerage-position complement to degree/pagerank/k-core).
    Edge derivation = supplier_degree_histogram's bucketed distinct
    pipeline; the Brandes solve runs in one remote task over the
    ENTITY-bounded edge list (SQL cannot express all-pairs shortest-path
    counting — rows-only entry, pinned against a naive reference in
    tests/test_graph.py)."""
    from .stages.graph import betweenness_centrality

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])

    def _inc(t: pa.Table) -> pd.DataFrame:
        ok = np.asarray(t["l_orderkey"].to_numpy(zero_copy_only=False), np.int64)
        sk = np.asarray(t["l_suppkey"].to_numpy(zero_copy_only=False), np.int64)
        keep = ok % 10 == 0
        ok, sk = ok[keep], sk[keep]
        assert len(sk) == 0 or sk.max() < SUPP_PACK, "widen SUPP_PACK"
        key = ok * SUPP_PACK + sk
        u = np.unique(key)
        return pd.DataFrame(
            {
                "bucket": ((u // SUPP_PACK * 2654435761) % 4294967296) % SESSION_BUCKETS,
                "ok": u // SUPP_PACK,
                "sk": u % SUPP_PACK,
            }
        )

    def _edges(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["ok", "sk"])
        m = g.merge(g, on="ok")
        m = m[m["sk_x"] < m["sk_y"]].drop_duplicates(["sk_x", "sk_y"])
        return pd.DataFrame(
            {"src": m["sk_x"].to_numpy(np.int64), "dst": m["sk_y"].to_numpy(np.int64)}
        )

    edges = (
        li.map_batches(_inc, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_edges, batch_format="pandas")
    )
    return betweenness_centrality(edges)
