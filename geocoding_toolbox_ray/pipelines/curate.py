"""Web-text curation pipeline over the Common-Crawl-style pages table.

Ties the training-data operators to the webtext payload (BASELINE.json
input_hint): pages (url, warc_ts, html, text, lang) -> lang filter
(parquet-pushdown when reading from disk) -> vectorized quality gates ->
exact dedup by content hash (bucketed pandas reduce keyed on md5, keep
lexicographically-smallest url) -> kept (url, n_tokens) rows.

Same shuffle discipline as the documents-table queries: one bounded
groupby on a coarse content-hash bucket; everything else streams.  The
whole pipeline is a benchmark headline (`bench.py` curate_pages) — the
second axis of "would this hold at 100 TB" evidence next to
geocode_pages.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.text import quality_features

CURATE_BUCKETS = 64


def _md5_pair(texts) -> tuple[np.ndarray, np.ndarray]:
    """md5 digest as two int64 columns — the full 128-bit content hash in
    16 fixed bytes per row, so the dedup shuffle moves compact arrow
    int64 blocks instead of 32-byte hex object strings."""
    n = len(texts)
    hi = np.empty(n, np.uint64)
    lo = np.empty(n, np.uint64)
    for i, s in enumerate(texts):
        d = hashlib.md5(s.encode("utf-8")).digest()
        hi[i] = int.from_bytes(d[:8], "big")
        lo[i] = int.from_bytes(d[8:], "big")
    return hi.astype(np.int64), lo.astype(np.int64)


#: per-worker-process cache of fetched broadcast objects (ray.get of a
#: Python set/dict pickle-deserializes on EVERY call; cache by ref id)
_BCAST_CACHE: dict[str, object] = {}


def _cached_get(ref):
    import ray

    key = ref.hex()
    if key not in _BCAST_CACHE:
        _BCAST_CACHE[key] = ray.get(ref)
    return _BCAST_CACHE[key]


def curate_pages(pages, lang: str = "en"):
    """pages Dataset -> kept (url, n_tokens) after lang + quality + exact
    dedup.  ``pages`` needs (url, text, lang) columns.

    Shuffle discipline: URL strings NEVER shuffle.  The only wide step is
    an int-only reduce — per-batch (fp_hi, fp_lo) partial counts summed
    inside coarse hash buckets — that yields the hashes with count > 1
    (the ACTUAL duplicate content, small by definition).  Those hashes
    broadcast once (process-cached), unique-content rows stream straight
    to the output, and only true duplicates go through a tiny resolution
    co-group to pick the lexicographically-smallest url."""
    import ray

    filtered = pages.filter(expr=f"lang == '{lang}'")

    def _gate(t: pa.Table) -> pa.Table:
        feats = quality_features(t["text"])  # arrow-native kernels, zero-copy in
        # keep docs with tokens present and sane stopword ratio; the
        # short-doc gate is permille-based like quality_filter_documents
        ok = np.asarray(
            (feats["n_tokens"] > 0) & (feats["stop_permille"] <= 600), bool
        )
        kept = t.filter(pa.array(ok))
        hi, lo = _md5_pair(kept["text"].to_pylist())
        return pa.table(
            {
                "fp_hi": pa.array(hi, pa.int64()),
                "fp_lo": pa.array(lo, pa.int64()),
                "url": kept["url"].cast(pa.string()),
                "n_tokens": pa.array(
                    np.asarray(feats["n_tokens"], np.int64)[ok], pa.int64()
                ),
            }
        )

    gated = filtered.map_batches(_gate, batch_format="pyarrow").materialize()

    # int-only duplicate detection: per-batch partial counts -> bucketed sum
    def _fp_counts(t: pa.Table) -> pa.Table:
        hi = np.asarray(t["fp_hi"].to_numpy(zero_copy_only=False), np.int64)
        lo = np.asarray(t["fp_lo"].to_numpy(zero_copy_only=False), np.int64)
        order = np.lexsort((lo, hi))
        hi_s, lo_s = hi[order], lo[order]
        new = np.empty(len(hi_s), bool)
        new[0:1] = True
        new[1:] = (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1])
        codes = np.cumsum(new) - 1
        counts = np.bincount(codes).astype(np.int64)
        uh, ul = hi_s[new], lo_s[new]
        bucket = (uh.astype(np.uint64) % np.uint64(CURATE_BUCKETS)).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket, pa.int64()),
                "fp_hi": pa.array(uh, pa.int64()),
                "fp_lo": pa.array(ul, pa.int64()),
                "part_n": pa.array(counts, pa.int64()),
            }
        )

    def _dup_hashes(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["fp_hi", "fp_lo"], sort=False)["part_n"].sum()
        dup = s[s > 1]
        if dup.empty:
            return pd.DataFrame(
                {"fp_hi": pd.array([], "int64"), "fp_lo": pd.array([], "int64")}
            )
        idx = dup.index.to_frame(index=False)
        return pd.DataFrame(
            {
                "fp_hi": idx["fp_hi"].to_numpy(np.int64),
                "fp_lo": idx["fp_lo"].to_numpy(np.int64),
            }
        )

    dups = (
        gated.map_batches(_fp_counts, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_dup_hashes, batch_format="pandas")
        .to_pandas()
    )
    if dups.empty or "fp_hi" not in dups.columns:
        dup_keys: set = set()
    else:
        dup_keys = set(
            zip(dups["fp_hi"].astype(np.int64), dups["fp_lo"].astype(np.int64))
        )
    dup_ref = ray.put(dup_keys)  # tiny (actual dup content only); process-cached

    def _is_dup_mask(t: pa.Table) -> np.ndarray:
        d = _cached_get(dup_ref)
        if not d:
            return np.zeros(t.num_rows, bool)
        hi = np.asarray(t["fp_hi"].to_numpy(zero_copy_only=False), np.int64)
        lo = np.asarray(t["fp_lo"].to_numpy(zero_copy_only=False), np.int64)
        return np.fromiter(
            ((int(a), int(b)) in d for a, b in zip(hi, lo)), bool, count=len(hi)
        )

    def _uniques(t: pa.Table) -> pa.Table:
        keep = ~_is_dup_mask(t)
        m = t.filter(pa.array(keep))
        return pa.table({"url": m["url"], "n_tokens": m["n_tokens"]})

    def _dup_rows(t: pa.Table) -> pa.Table:
        m = t.filter(pa.array(_is_dup_mask(t)))
        hi = np.asarray(m["fp_hi"].to_numpy(zero_copy_only=False), np.int64)
        bucket = (hi.astype(np.uint64) % np.uint64(CURATE_BUCKETS)).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket, pa.int64()),
                "fp_hi": m["fp_hi"],
                "fp_lo": m["fp_lo"],
                "url": m["url"],
                "n_tokens": m["n_tokens"],
            }
        )

    def _resolve(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["fp_hi", "fp_lo", "url"], kind="mergesort")
        first = g.drop_duplicates(["fp_hi", "fp_lo"], keep="first")
        return first[["url", "n_tokens"]].reset_index(drop=True)

    uniques = gated.map_batches(_uniques, batch_format="pyarrow")
    resolved = (
        gated.map_batches(_dup_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_resolve, batch_format="pandas")
    )
    return uniques.union(resolved)
