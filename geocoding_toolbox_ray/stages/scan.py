"""Distributed ordered prefix scan (exclusive cumulative sum).

The missing primitive behind sequence packing, global offsets, and file
layout planning: ``cum_prev(row) = sum(val) over all rows with a smaller
order key``.  Ray Data has no scan operator; the classic two-phase shape
works on RANGE buckets of the (integer) order key:

1. per-batch partials aggregate (range_bucket, sum) — a bounded table;
2. the driver exclusive-scans the B bucket totals (B scalars only) and
   broadcasts the per-bucket BASE offsets as one small array;
3. a bucketed co-group sorts each bucket by the order key, computes the
   within-bucket exclusive cumsum vectorized, and adds the base.

Order keys must be unique integers (doc_id-style).  Oracle equivalent:
``SUM(val) OVER (ORDER BY key ROWS BETWEEN UNBOUNDED PRECEDING AND 1
PRECEDING)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

SCAN_BUCKETS = 64


def _range_bucket(keys: np.ndarray, width: int) -> np.ndarray:
    return keys // max(width, 1)


def ordered_prefix_sum(
    ds,
    key_col: str,
    val_col: str,
    max_key: int,
    out_col: str = "cum_prev",
    nbuckets: int = SCAN_BUCKETS,
):
    """Dataset -> Dataset with ``out_col`` = exclusive prefix sum of
    ``val_col`` in ``key_col`` order.  ``max_key`` bounds the key domain
    (e.g. row count from parquet metadata) so range buckets are fixed and
    deterministic."""
    import ray
    from ray.data.aggregate import Sum

    width = (int(max_key) + nbuckets) // nbuckets

    def _tag(t: pa.Table) -> pa.Table:
        k = np.asarray(t[key_col].to_numpy(zero_copy_only=False), np.int64)
        return t.append_column(
            "__rb", pa.array(_range_bucket(k, width), pa.int64())
        )

    tagged = ds.map_batches(_tag, batch_format="pyarrow")

    def _partial(t: pa.Table) -> pa.Table:
        rb = np.asarray(t["__rb"].to_numpy(zero_copy_only=False), np.int64)
        v = np.asarray(t[val_col].to_numpy(zero_copy_only=False), np.int64)
        uniq, inv = np.unique(rb, return_inverse=True)
        sums = np.zeros(len(uniq), np.int64)
        np.add.at(sums, inv, v)  # exact int64 (no float-weight bincount)
        return pa.table(
            {"__rb": pa.array(uniq, pa.int64()), "part": pa.array(sums, pa.int64())}
        )

    totals = (
        tagged.map_batches(_partial, batch_format="pyarrow")
        .groupby("__rb")
        .aggregate(Sum("part", alias_name="total"))
        .to_pandas()
    )  # B rows — driver holds only bucket scalars
    totals = totals.sort_values("__rb")
    bases = np.zeros(nbuckets + 1, np.int64)
    rb_idx = totals["__rb"].to_numpy(np.int64)
    tvals = totals["total"].to_numpy(np.int64)
    per_bucket = np.zeros(nbuckets + 1, np.int64)
    per_bucket[rb_idx] = tvals
    bases[1:] = np.cumsum(per_bucket[:-1])  # exclusive scan of bucket totals
    base_ref = ray.put(bases)

    def _scan_bucket(g: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(base_ref)
        g = g.sort_values(key_col, kind="mergesort")
        v = g[val_col].to_numpy(np.int64)
        cum = np.concatenate([[0], np.cumsum(v[:-1])])
        out = g.drop(columns=["__rb"]).reset_index(drop=True)
        out[out_col] = b[int(g["__rb"].iloc[0])] + cum
        return out

    return tagged.groupby("__rb").map_groups(_scan_bucket, batch_format="pandas")
