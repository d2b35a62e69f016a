"""The matcher — exact + fuzzy scored lookup as an actor-pool stage.

Reproduces, locally and vectorized, the per-row join the reference
delegates to the AGRC API (``/root/reference/src/agrcgeocoding/geocode.py:
198-254``): every candidate row yields exactly one output row — matched
(score >= acceptScore) or an error row with the reference's message shape
(geocode.py:180-187, 221-226; 404 text at tests/test_geocode.py:89).

Usage::

    index_ref = ray.put(GeocodeIndex.build(address_points, locators))
    out = candidates.map_batches(
        MatcherStage,
        fn_constructor_kwargs={"index_ref": index_ref, "accept_score": 70},
        batch_format="pyarrow", batch_size=B, concurrency=N,
    )

The compiled index is fetched ONCE per actor in ``__init__`` (broadcast
via the object store), never per batch.  The exact tier is a vectorized
hash probe (pandas merge); only the residual misses take the fuzzy scored
tier (batched-DP Levenshtein against the zone-local candidate arrays,
best-per-key with the deterministic tie-break score DESC, addr_std ASC,
point_id ASC — the same ORDER BY the DuckDB oracle uses).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_ACCEPT_SCORE, HEADER
from ..functions.cleanse import cleanse_street_arrow, cleanse_zone_arrow
from ..functions.scoring import score_batch
from ..functions.standardize import standardize_arrow

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


class MatcherStage:
    """Callable-class stage for ``map_batches`` (one compiled index per actor)."""

    def __init__(self, index_ref, accept_score: int = DEFAULT_ACCEPT_SCORE):
        import ray

        self.index = ray.get(index_ref) if isinstance(index_ref, ray.ObjectRef) else index_ref
        self.accept = int(accept_score)
        self.miss_message = no_candidates_message(self.accept)

    # ------------------------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({f.name: pa.array([], f.type) for f in OUTPUT_SCHEMA})

        street_raw = batch["input_street"]
        zone_raw = batch["input_zone"]
        street_clean = cleanse_street_arrow(street_raw)
        addr_std = standardize_arrow(street_clean)
        zone_clean = cleanse_zone_arrow(zone_raw)
        zone_key = pc.utf8_lower(zone_clean)

        df = pd.DataFrame(
            {
                "primary_key": pc.cast(batch["primary_key"], pa.string()).to_pandas(),
                "input_street": street_raw.to_pandas(),
                "input_zone": pc.cast(zone_raw, pa.string()).to_pandas(),
                "addr_std": addr_std.to_pandas(),
                "zone_key": zone_key.to_pandas(),
            }
        )
        df["__row"] = np.arange(n, dtype=np.int64)

        null_street = df["addr_std"].isna()

        # ---- exact tier: vectorized hash probe
        probe = df.loc[~null_street]
        merged = probe.merge(self.index.exact, on=["zone_key", "addr_std"], how="left")
        hit_mask = merged["x"].notna().to_numpy()
        hits = merged.loc[hit_mask]
        misses = merged.loc[~hit_mask, ["__row", "addr_std", "zone_key"]]

        # ---- fuzzy tier: zone-local scored join over the residual misses.
        # Millions of extracted candidates collapse to few distinct
        # (addr_std, zone) keys (SURVEY.md N1): score each DISTINCT key once,
        # then broadcast the winner back to every duplicate row.
        fuzzy_frames = []
        uniq = (
            misses.drop_duplicates(["zone_key", "addr_std"])[["zone_key", "addr_std"]]
            if len(misses)
            else misses
        )
        if len(uniq):
            for zk, grp in uniq.groupby("zone_key", sort=False):
                cand_pos = self.index.zone_groups.get(zk)
                if cand_pos is None or len(cand_pos) == 0:
                    continue
                nq, nc = len(grp), len(cand_pos)
                q_std = np.repeat(grp["addr_std"].to_numpy(), nc)
                cand = self.index.points.iloc[np.tile(cand_pos, nq)].reset_index(drop=True)
                sc = score_batch(q_std, cand["addr_std"].to_numpy())
                pairs = pd.DataFrame(
                    {
                        "zone_key": zk,
                        "q_addr_std": q_std,
                        "score": sc,
                        "addr_std": cand["addr_std"].to_numpy(),
                        "point_id": cand["point_id"].to_numpy(),
                        "x": cand["x"].to_numpy(),
                        "y": cand["y"].to_numpy(),
                        "match_address": cand["match_address"].to_numpy(),
                        "address_grid": cand["address_grid"].to_numpy(),
                        "locator": cand["locator"].to_numpy(),
                    }
                )
                fuzzy_frames.append(pairs)
        if fuzzy_frames:
            allp = pd.concat(fuzzy_frames, ignore_index=True)
            allp = allp.sort_values(
                ["score", "addr_std", "point_id"],
                ascending=[False, True, True],
                kind="mergesort",
            ).drop_duplicates(["zone_key", "q_addr_std"])
            winners = allp[allp["score"] >= self.accept]
            best_fuzzy = misses.merge(
                winners,
                left_on=["zone_key", "addr_std"],
                right_on=["zone_key", "q_addr_std"],
                how="inner",
                suffixes=("", "_ref"),
            )
        else:
            best_fuzzy = pd.DataFrame(
                columns=["__row", "score", "x", "y", "match_address", "address_grid", "locator"]
            )

        # ---- assemble: one output row per input row, original batch order
        x = np.zeros(n, np.float64)
        y = np.zeros(n, np.float64)
        score = np.zeros(n, np.int64)
        locator = np.full(n, None, object)
        match_address = np.full(n, None, object)
        standardized = np.full(n, None, object)
        address_grid = np.full(n, None, object)
        message = np.full(n, None, object)

        hr = hits["__row"].to_numpy(np.int64)
        x[hr] = hits["x"].to_numpy(np.float64)
        y[hr] = hits["y"].to_numpy(np.float64)
        score[hr] = 100
        locator[hr] = hits["locator"].to_numpy(object)
        match_address[hr] = hits["match_address"].to_numpy(object)
        address_grid[hr] = hits["address_grid"].to_numpy(object)

        fr = best_fuzzy["__row"].to_numpy(np.int64)
        x[fr] = best_fuzzy["x"].to_numpy(np.float64)
        y[fr] = best_fuzzy["y"].to_numpy(np.float64)
        score[fr] = best_fuzzy["score"].to_numpy(np.int64)
        locator[fr] = best_fuzzy["locator"].to_numpy(object)
        match_address[fr] = best_fuzzy["match_address"].to_numpy(object)
        address_grid[fr] = best_fuzzy["address_grid"].to_numpy(object)

        matched = np.zeros(n, bool)
        matched[hr] = True
        matched[fr] = True
        std_all = df["addr_std"].to_numpy(object)
        standardized[matched] = std_all[matched]

        unmatched = ~matched
        message[unmatched] = self.miss_message
        ns_rows = df.loc[null_street, "__row"].to_numpy(np.int64)
        message[ns_rows] = NULL_STREET_MESSAGE

        out = {
            "primary_key": pa.array(df["primary_key"], pa.string()),
            "input_street": pa.array(df["input_street"], pa.string()),
            "input_zone": pa.array(df["input_zone"], pa.string()),
            "x": pa.array(x, pa.float64()),
            "y": pa.array(y, pa.float64()),
            "score": pa.array(score, pa.int64()),
            "locator": pa.array(locator, pa.string()),
            "matchAddress": pa.array(match_address, pa.string()),
            "standardizedAddress": pa.array(standardized, pa.string()),
            "addressGrid": pa.array(address_grid, pa.string()),
            "message": pa.array(message, pa.string()),
        }
        # pass any extra input columns through (url, warc_ts, ... — SURVEY.md J5)
        for name in batch.schema.names:
            if name not in ("primary_key", "input_street", "input_zone") and name not in out:
                out[name] = batch[name]
        return pa.table(out)
