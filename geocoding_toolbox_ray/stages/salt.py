"""Hot-key salting for skewed shuffles (SURVEY.md §4.1).

The engine's wide steps key on spatial cells, and urban cells (Salt Lake
valley) are orders of magnitude hotter than rural ones.  The standard fix:

1. a cheap pre-pass counts rows per key (partial counts per batch, then a
   small groupby — the same pattern as ``tile_counts``);
2. keys above ``threshold`` are *salted*: ``salted = key * S + h(row) % S``
   with a deterministic per-row multiplicative hash, splitting one hot
   group into S balanced sub-groups (cold keys get sub-slot 0);
3. group-level state (e.g. a cell's index shard) is replicated to all S
   salts; aggregates de-salt with ``key = salted // S`` and a second,
   tiny combine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_MULT = 2654435761
_MOD = 4294967296


def row_hash(values: np.ndarray) -> np.ndarray:
    """Deterministic per-row hash of an int64 column (Knuth multiplicative)."""
    return (np.asarray(values, np.int64) * _MULT) % _MOD


def detect_hot_keys(ds, key_col: str, threshold: int) -> set[int]:
    """Pre-pass: keys whose row count exceeds ``threshold``.

    Partial counts per batch -> small groupby sum -> driver-side set (the
    hot-key set is tiny by definition — only the skewed heads)."""
    from ray.data.aggregate import Sum

    def _partial(t: pa.Table) -> pa.Table:
        k = np.asarray(t[key_col].to_numpy(zero_copy_only=False), np.int64)
        uniq, counts = np.unique(k, return_counts=True)
        return pa.table(
            {key_col: pa.array(uniq, pa.int64()), "part_n": pa.array(counts.astype(np.int64))}
        )

    counts = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(Sum("part_n", alias_name="n"))
        .to_pandas()
    )
    return set(counts.loc[counts["n"] > threshold, key_col].astype(np.int64))


def add_salted_key(
    batch: pa.Table,
    key_col: str,
    hash_col: str,
    hot_keys: set[int],
    salt: int,
    out_col: str = "salted_key",
) -> pa.Table:
    """map_batches body: append ``salted_key = key*S + (h(row) % S if hot else 0)``."""
    k = np.asarray(batch[key_col].to_numpy(zero_copy_only=False), np.int64)
    h = row_hash(np.asarray(batch[hash_col].to_numpy(zero_copy_only=False), np.int64))
    hot = np.isin(k, np.fromiter(hot_keys, np.int64, len(hot_keys))) if hot_keys else np.zeros(len(k), bool)
    salted = k * salt + np.where(hot, h % salt, 0)
    return batch.append_column(out_col, pa.array(salted, pa.int64()))


def desalt(salted: np.ndarray, salt: int) -> np.ndarray:
    return np.asarray(salted, np.int64) // salt


# ------------------------------------------------- salted COUNT(DISTINCT)

def _distinct_pairs_partial(
    t: pa.Table, key_col: str, val_col: str, salt: int
) -> "pa.Table":
    """Per-batch distinct (salted_slot, key, val) rows: the batch-local
    dedup that cuts shuffle volume before the wide step."""
    ks = np.asarray(t[key_col].to_numpy(zero_copy_only=False), object)
    vals = np.asarray(t[val_col].to_numpy(zero_copy_only=False), np.int64)
    uk, inv = np.unique(ks, return_inverse=True)
    import zlib

    kh = np.fromiter(
        (zlib.crc32(str(s).encode("utf-8")) for s in uk), np.int64, count=len(uk)
    )
    slot = (row_hash(vals) % salt).astype(np.int64)
    salted = kh[inv] * np.int64(salt) + slot
    order = np.lexsort((vals, salted))
    ss, vs, kk = salted[order], vals[order], ks[order]
    keep = np.empty(len(ss), bool)
    keep[:1] = True
    keep[1:] = (ss[1:] != ss[:-1]) | (vs[1:] != vs[:-1])
    return pa.table(
        {
            "salted": pa.array(ss[keep], pa.int64()),
            key_col: pa.array(kk[keep].tolist(), pa.string()),
            val_col: pa.array(vs[keep], pa.int64()),
        }
    )


def salted_distinct_count(ds, key_col: str, val_col: str, salt: int = 16):
    """COUNT(DISTINCT val) per key for HOT keys (few keys, huge groups) —
    the aggregation per-batch pre-sums can't absorb, because distinctness
    needs the values themselves, not partial counts (VERDICT r2 #6).

    Two-phase value-salted shape: the shuffle keys on
    ``hash(key) * S + row_hash(val) % S`` so every distinct value lands
    in EXACTLY ONE of a key's S sub-groups — per-sub-group distinct
    counts then simply SUM per key in a tiny second groupby, with no
    overlap correction.  One hot key becomes S balanced tasks instead of
    one giant straggler; per-batch dedup bounds the shuffled rows by the
    true distinct count per (batch, slot).
    """
    from ray.data.aggregate import Sum

    def _count_group(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                key_col: [g[key_col].iloc[0]],
                "part_d": [int(g[val_col].nunique())],
            }
        )

    return (
        ds.map_batches(
            lambda t: _distinct_pairs_partial(t, key_col, val_col, salt),
            batch_format="pyarrow",
        )
        .groupby("salted")
        .map_groups(_count_group, batch_format="pandas")
        .groupby(key_col)
        .aggregate(Sum("part_d", alias_name="n_distinct"))
    )


def naive_distinct_count(ds, key_col: str, val_col: str):
    """The unsalted twin: same per-batch dedup, but the wide step keys on
    the hot key itself — parallelism capped at the number of distinct
    keys, each group a giant straggler frame.  Kept as the bench
    comparison baseline for the salted variant."""

    def _partial(t: pa.Table) -> pa.Table:
        return _distinct_pairs_partial(t, key_col, val_col, 1).drop_columns(
            ["salted"]
        )

    def _count_group(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                key_col: [g[key_col].iloc[0]],
                "n_distinct": [int(g[val_col].nunique())],
            }
        )

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(_count_group, batch_format="pandas")
    )
