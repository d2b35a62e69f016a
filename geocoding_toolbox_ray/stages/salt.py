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
