"""The matcher — exact + fuzzy scored lookup as a broadcast-state stage.

Reproduces, locally and vectorized, the per-row join the reference
delegates to the AGRC API (``/root/reference/src/agrcgeocoding/geocode.py:
198-254``): every candidate row yields exactly one output row — matched
(score >= acceptScore) or an error row with the reference's message shape
(geocode.py:180-187, 221-226; 404 text at tests/test_geocode.py:89).

Hot path is Arrow-native end to end: cleanse/standardize are
pyarrow.compute kernel chains, the exact tier is an Acero hash join
against the broadcast reference table, and output assembly is
``if_else``/``coalesce`` — no pandas and no per-row Python objects (the
earlier pandas implementation spent ~80% of its time building object
arrays, which also throttled multi-core scaling via allocator pressure).
Only the fuzzy tier touches Python strings, and only for the DISTINCT
(addr_std, zone) miss keys (SURVEY.md N1) — a few hundred per batch even
when millions of rows flow through.

Deterministic tie-break everywhere: score DESC, addr_std ASC, point_id
ASC — the same ORDER BY the DuckDB oracle uses (candidates are pre-sorted
by (addr_std, point_id) per zone, so ``argmax`` picks the tie-break
winner for free).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_ACCEPT_SCORE, HEADER
from ..functions.cleanse import cleanse_street_arrow, cleanse_zone_arrow
from ..functions.scoring import score_batch
from ..functions.standardize import match_key_arrow, standardize_arrow

#: reference behavior on a None street: str(ex)[:500] of the AttributeError
#: raised inside _cleanse_street (geocode.py:46, caught at :253-254)
NULL_STREET_MESSAGE = "'NoneType' object has no attribute 'replace'"


def no_candidates_message(accept_score: int) -> str:
    """404 message, tests/test_geocode.py:89 (acceptScore-parameterized)."""
    return f"No address candidates found with a score of {accept_score} or better."


OUTPUT_FIELDS = [
    ("primary_key", pa.string()),
    ("input_street", pa.string()),
    ("input_zone", pa.string()),
    ("x", pa.float64()),
    ("y", pa.float64()),
    ("score", pa.int64()),
    ("locator", pa.string()),
    ("matchAddress", pa.string()),
    ("standardizedAddress", pa.string()),
    ("addressGrid", pa.string()),
    ("message", pa.string()),
]
OUTPUT_SCHEMA = pa.schema(OUTPUT_FIELDS)
assert tuple(OUTPUT_SCHEMA.names) == HEADER

_WINNER_SCHEMA = pa.schema(
    [
        ("zone_key", pa.string()),
        ("addr_std", pa.string()),
        ("fz_score", pa.int64()),
        ("fz_x", pa.float64()),
        ("fz_y", pa.float64()),
        ("fz_match_address", pa.string()),
        ("fz_address_grid", pa.string()),
        ("fz_locator", pa.string()),
    ]
)


_MISSING = object()  # memo sentinel (None is a valid cached "no winner")

#: per-worker-process cache for the broadcast index: a task-based matcher
#: fetches the index from the object store ONCE per worker (worker
#: processes persist across tasks), giving actor-pool state amortization
#: with task-pool elasticity — no pool spin-up, no fixed reservation.
_INDEX_CACHE: dict = {}


def make_matcher_fn(index_ref, accept_score: int = DEFAULT_ACCEPT_SCORE):
    """Stateless-task matcher: plain function for ``map_batches`` with the
    compiled index lazily ray.get() once per worker process."""

    def _matcher(batch: pa.Table) -> pa.Table:
        import ray

        ref_key = index_ref.hex() if isinstance(index_ref, ray.ObjectRef) else id(index_ref)
        key = (ref_key, accept_score)  # same index at two thresholds must not share a stage
        stage = _INDEX_CACHE.get(key)
        if stage is None:
            stage = MatcherStage(index_ref, accept_score)
            _INDEX_CACHE[key] = stage
        return stage(batch)

    return _matcher


class MatcherStage:
    """Callable-class stage for ``map_batches`` (one compiled index per actor)."""

    def __init__(self, index_ref, accept_score: int = DEFAULT_ACCEPT_SCORE):
        import ray

        self.index = ray.get(index_ref) if isinstance(index_ref, ray.ObjectRef) else index_ref
        self.accept = int(accept_score)
        self.miss_message = no_candidates_message(self.accept)
        #: (zone_key, addr_std) -> winner tuple or None; miss keys repeat
        #: heavily across batches (same garbage addresses on many pages)
        self._fuzzy_memo: dict[tuple[str, str], tuple | None] = {}
        self._fuzzy_memo_cap = 200_000

        # broadcast exact-probe table as Arrow (join right side), built once
        ex = self.index.exact
        self.exact_arrow = pa.table(
            {
                "zone_key": pa.array(ex["zone_key"], pa.string()),
                "addr_std": pa.array(ex["addr_std"], pa.string()),
                "ex_x": pa.array(ex["x"], pa.float64()),
                "ex_y": pa.array(ex["y"], pa.float64()),
                "ex_match_address": pa.array(ex["match_address"], pa.string()),
                "ex_address_grid": pa.array(ex["address_grid"], pa.string()),
                "ex_locator": pa.array(ex["locator"], pa.string()),
            }
        )
        # per-zone fuzzy candidates pre-sorted by (addr_std, point_id) so a
        # plain argmax realizes the deterministic tie-break
        pts = self.index.points
        self._zone_cand = {}
        for zk, pos in self.index.zone_groups.items():
            sub = pts.iloc[pos]
            sub = sub.sort_values(["addr_std", "point_id"], kind="mergesort")
            self._zone_cand[zk] = {
                "addr_std": sub["addr_std"].to_numpy(object),
                "x": sub["x"].to_numpy(np.float64),
                "y": sub["y"].to_numpy(np.float64),
                "match_address": sub["match_address"].to_numpy(object),
                "address_grid": sub["address_grid"].to_numpy(object),
                "locator": sub["locator"].to_numpy(object),
            }

    # ------------------------------------------------------------------
    def _fuzzy_winners(self, distinct_keys: pa.Table) -> pa.Table:
        """DISTINCT miss (zone_key, addr_std) -> accepted winners table.

        Memoized per worker: repeated miss keys (the same garbage address
        cited on many pages) skip the Levenshtein pass entirely."""
        zk_list = distinct_keys["zone_key"].to_pylist()
        q_list = distinct_keys["addr_std"].to_pylist()
        memo = self._fuzzy_memo
        by_zone: dict[str, list[str]] = {}
        memo_hits: list[tuple] = []
        for zk, q in zip(zk_list, q_list):
            if zk is None or q is None:
                continue
            cached = memo.get((zk, q), _MISSING)
            if cached is _MISSING:
                by_zone.setdefault(zk, []).append(q)
            elif cached is not None:
                memo_hits.append(cached)

        w_zone, w_q, w_sc, w_x, w_y, w_ma, w_ag, w_loc = [], [], [], [], [], [], [], []
        for row in memo_hits:
            w_zone.append(row[0]); w_q.append(row[1]); w_sc.append(row[2])
            w_x.append(row[3]); w_y.append(row[4]); w_ma.append(row[5])
            w_ag.append(row[6]); w_loc.append(row[7])
        for zk, qs in by_zone.items():
            cand = self._zone_cand.get(zk)
            if cand is None:
                if len(memo) < self._fuzzy_memo_cap:
                    for q in qs:
                        memo[(zk, q)] = None
                continue
            astd = cand["addr_std"]
            nq, nc = len(qs), len(astd)
            sc = score_batch(
                np.repeat(np.array(qs, object), nc), np.tile(astd, nq)
            ).reshape(nq, nc)
            best = sc.argmax(axis=1)  # first max = (addr_std, point_id) tie-break
            bsc = sc[np.arange(nq), best]
            for i in range(nq):
                if bsc[i] >= self.accept:
                    b = best[i]
                    row = (
                        zk,
                        qs[i],
                        int(bsc[i]),
                        float(cand["x"][b]),
                        float(cand["y"][b]),
                        cand["match_address"][b],
                        cand["address_grid"][b],
                        cand["locator"][b],
                    )
                    w_zone.append(row[0]); w_q.append(row[1]); w_sc.append(row[2])
                    w_x.append(row[3]); w_y.append(row[4]); w_ma.append(row[5])
                    w_ag.append(row[6]); w_loc.append(row[7])
                    if len(memo) < self._fuzzy_memo_cap:
                        memo[(zk, qs[i])] = row
                elif len(memo) < self._fuzzy_memo_cap:
                    memo[(zk, qs[i])] = None
        return pa.table(
            {
                "zone_key": pa.array(w_zone, pa.string()),
                "addr_std": pa.array(w_q, pa.string()),
                "fz_score": pa.array(w_sc, pa.int64()),
                "fz_x": pa.array(w_x, pa.float64()),
                "fz_y": pa.array(w_y, pa.float64()),
                "fz_match_address": pa.array(w_ma, pa.string()),
                "fz_address_grid": pa.array(w_ag, pa.string()),
                "fz_locator": pa.array(w_loc, pa.string()),
            },
            schema=_WINNER_SCHEMA,
        )

    # ------------------------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({f.name: pa.array([], f.type) for f in OUTPUT_SCHEMA})

        # dictionary-encode first: web candidates are massively repetitive
        # (N1), so the 18-regex cleanse+standardize chain runs over the few
        # hundred DISTINCT strings, not every row
        street_dict = pc.dictionary_encode(
            pc.cast(batch["input_street"], pa.string())
        )
        if isinstance(street_dict, pa.ChunkedArray):
            street_dict = street_dict.combine_chunks()
        std_dict = standardize_arrow(cleanse_street_arrow(street_dict.dictionary))
        addr_std = pc.take(std_dict, street_dict.indices)
        zone_dict = pc.dictionary_encode(pc.cast(batch["input_zone"], pa.string()))
        if isinstance(zone_dict, pa.ChunkedArray):
            zone_dict = zone_dict.combine_chunks()
        zone_key = pc.take(
            pc.utf8_lower(cleanse_zone_arrow(zone_dict.dictionary)), zone_dict.indices
        )
        # match key ignores a fractional house suffix ("39 1/2 ...") and a
        # trailing unit designator / range ("... apt 3", "... ste 100-110");
        # the reported standardizedAddress keeps both (grammar depth r3+r4)
        addr_key = pc.take(match_key_arrow(std_dict), street_dict.indices)

        probe = pa.table(
            {
                "__row": pa.array(np.arange(n, dtype=np.int64)),
                "zone_key": pa.array(zone_key.combine_chunks() if isinstance(zone_key, pa.ChunkedArray) else zone_key),
                "addr_std": pa.array(addr_key.combine_chunks() if isinstance(addr_key, pa.ChunkedArray) else addr_key),
                "addr_full": pa.array(addr_std.combine_chunks() if isinstance(addr_std, pa.ChunkedArray) else addr_std),
            }
        )
        # exact tier: Acero hash join vs the broadcast reference (right unique)
        joined = probe.join(self.exact_arrow, keys=["zone_key", "addr_std"], join_type="left outer")

        ex_valid = pc.is_valid(joined["ex_x"])
        miss = pc.and_kleene(pc.invert(ex_valid), pc.is_valid(joined["addr_std"]))
        miss_keys = joined.filter(pc.fill_null(miss, False)).select(["zone_key", "addr_std"])
        distinct = miss_keys.group_by(["zone_key", "addr_std"]).aggregate([])
        winners = (
            self._fuzzy_winners(distinct)
            if distinct.num_rows
            else pa.table({f.name: pa.array([], f.type) for f in _WINNER_SCHEMA})
        )
        joined = joined.join(winners, keys=["zone_key", "addr_std"], join_type="left outer")
        # joins scramble row order: one sort restores the input order
        joined = joined.sort_by("__row")

        ex_valid = pc.is_valid(joined["ex_x"])
        fz_valid = pc.is_valid(joined["fz_score"])
        matched = pc.or_(ex_valid, fz_valid)
        null_street = pc.is_null(joined["addr_std"])

        x = pc.coalesce(joined["ex_x"], joined["fz_x"], pa.scalar(0.0, pa.float64()))
        y = pc.coalesce(joined["ex_y"], joined["fz_y"], pa.scalar(0.0, pa.float64()))
        score = pc.if_else(
            ex_valid,
            pa.scalar(100, pa.int64()),
            pc.coalesce(joined["fz_score"], pa.scalar(0, pa.int64())),
        )
        locator = pc.coalesce(joined["ex_locator"], joined["fz_locator"])
        match_address = pc.coalesce(joined["ex_match_address"], joined["fz_match_address"])
        address_grid = pc.coalesce(joined["ex_address_grid"], joined["fz_address_grid"])
        standardized = pc.if_else(matched, joined["addr_full"], pa.scalar(None, pa.string()))
        message = pc.if_else(
            null_street,
            pa.scalar(NULL_STREET_MESSAGE, pa.string()),
            pc.if_else(
                matched, pa.scalar(None, pa.string()), pa.scalar(self.miss_message, pa.string())
            ),
        )
        # error messages truncate at 500 chars like the reference's
        # str(ex)[:500] (geocode.py:254)
        message = pc.utf8_slice_codeunits(message, 0, 500)

        out = {
            "primary_key": pc.cast(batch["primary_key"], pa.string()),
            "input_street": pc.cast(batch["input_street"], pa.string()),
            "input_zone": pc.cast(batch["input_zone"], pa.string()),
            "x": x,
            "y": y,
            "score": score,
            "locator": locator,
            "matchAddress": match_address,
            "standardizedAddress": standardized,
            "addressGrid": address_grid,
            "message": message,
        }
        # pass any extra input columns through (url, warc_ts, ... — SURVEY.md J5)
        for name in batch.schema.names:
            if name not in ("primary_key", "input_street", "input_zone") and name not in out:
                out[name] = batch[name]
        return pa.table(out)
