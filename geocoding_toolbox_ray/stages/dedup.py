"""Deduplication operators for the training-data pipeline.

* exact dedup — content hash (md5) + hash-partitioned first-per-group;
  fully SQL-checkable.
* MinHash + LSH near-dup — shingle -> 64-perm minhash signature -> banded
  LSH bucketing -> candidate pairs -> signature-overlap verification.
  Signatures (not raw text) flow through the shuffle, so the verify stage
  needs no join back to the documents — the pattern that scales to 10^12
  docs (pairs are verified from the 512-byte signatures carried with the
  banded rows).
* SimHash near-dup — 64-bit sign-aggregated token hashes, blocked on
  16-bit bands (any pair at Hamming distance <= 3 shares at least one of
  the 4 bands by pigeonhole).

All hashes are crc32/md5-based — deterministic across processes (no
Python ``hash()``, which is salted per process).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

MINHASH_PERMS = 64
LSH_BANDS = 16
ROWS_PER_BAND = MINHASH_PERMS // LSH_BANDS
_MERSENNE = (1 << 61) - 1

# deterministic permutation parameters (fixed seed)
_rng = np.random.RandomState(1234)
_A = _rng.randint(1, _MERSENNE, MINHASH_PERMS).astype(np.uint64)
_B = _rng.randint(0, _MERSENNE, MINHASH_PERMS).astype(np.uint64)

SHINGLE_WORDS = 3


def _shingle_hashes(text: str) -> np.ndarray:
    """crc32 of each word 3-gram (uint64)."""
    toks = text.lower().split()
    if len(toks) < SHINGLE_WORDS:
        toks = toks + [""] * (SHINGLE_WORDS - len(toks))
    out = np.empty(max(1, len(toks) - SHINGLE_WORDS + 1), np.uint64)
    for i in range(len(out)):
        out[i] = zlib.crc32(" ".join(toks[i : i + SHINGLE_WORDS]).encode("utf-8"))
    return out


def minhash_signature(text: str) -> np.ndarray:
    """(MINHASH_PERMS,) uint64 signature."""
    h = _shingle_hashes(text)
    # (perms, shingles) universal hashing mod Mersenne prime
    v = (_A[:, None] * h[None, :] + _B[:, None]) % np.uint64(_MERSENNE)
    return v.min(axis=1)


#: coarse shuffle key: (band_id, band_hash) buckets are hashed into NBUCKETS
#: groups so the wide step has few, balanced groups (per-group dispatch
#: overhead is paid NBUCKETS times, not once per LSH bucket) while true
#: LSH-bucket granularity is recovered vectorized inside each group.
NBUCKETS = 64


def band_rows(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """docs batch -> (bucket, band_id, band_hash, doc_id, sig) LSH rows."""
    ids = batch[id_col].to_pylist()
    texts = batch[text_col].to_pylist()
    band_id, band_hash, doc_id, sigs = [], [], [], []
    for did, txt in zip(ids, texts):
        sig = minhash_signature(txt)
        sb = sig.tobytes()
        for b in range(LSH_BANDS):
            chunk = sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND].tobytes()
            band_id.append(b)
            band_hash.append(zlib.crc32(chunk))
            doc_id.append(did)
            sigs.append(sb)
    band_id = np.asarray(band_id, np.int32)
    band_hash = np.asarray(band_hash, np.int64)
    bucket = (band_hash * LSH_BANDS + band_id) % NBUCKETS
    return pa.table(
        {
            "bucket": pa.array(bucket, pa.int64()),
            "band_id": pa.array(band_id, pa.int32()),
            "band_hash": pa.array(band_hash, pa.int64()),
            "doc_id": pa.array(doc_id, pa.int64()),
            "sig": pa.array(sigs, pa.binary()),
        }
    )


def _empty_pairs() -> pd.DataFrame:
    return pd.DataFrame({"doc_a": [], "doc_b": [], "est_jaccard_permille": []}).astype(
        {"doc_a": np.int64, "doc_b": np.int64, "est_jaccard_permille": np.int64}
    )


def bucket_pairs(group: pd.DataFrame, est_threshold: float = 0.5) -> pd.DataFrame:
    """map_groups body over one hash BUCKET (many LSH buckets): detect runs
    of equal (band_id, band_hash) vectorized, enumerate pairs only inside
    runs of length > 1, verify with the signature-overlap estimate."""
    if len(group) < 2:
        return _empty_pairs()
    g = group.sort_values(["band_id", "band_hash", "doc_id"], kind="mergesort")
    bid = g["band_id"].to_numpy(np.int64)
    bh = g["band_hash"].to_numpy(np.int64)
    ids = g["doc_id"].to_numpy(np.int64)
    same = (bid[1:] == bid[:-1]) & (bh[1:] == bh[:-1])
    bounds = np.flatnonzero(~same) + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [len(g)]])
    frames = []
    sig_list = g["sig"].to_numpy(object)
    for s, e in zip(starts, ends):
        n = e - s
        if n < 2:
            continue
        run_ids = ids[s:e]
        # duplicate doc in the same LSH bucket (same doc, several rows) guard
        uniq, upos = np.unique(run_ids, return_index=True)
        if len(uniq) < 2:
            continue
        sigs = np.stack([np.frombuffer(sig_list[s + p], np.uint64) for p in upos])
        ia, ib = np.triu_indices(len(uniq), k=1)
        frac = (sigs[ia] == sigs[ib]).mean(axis=1)
        keep = frac >= est_threshold
        if keep.any():
            frames.append(
                pd.DataFrame(
                    {
                        "doc_a": uniq[ia[keep]],
                        "doc_b": uniq[ib[keep]],
                        "est_jaccard_permille": np.floor(1000.0 * frac[keep] + 0.5).astype(
                            np.int64
                        ),
                    }
                )
            )
    return pd.concat(frames, ignore_index=True) if frames else _empty_pairs()


def minhash_dup_pairs(docs, est_threshold: float = 0.5):
    """documents Dataset -> near-dup pairs Dataset (distinct doc_a < doc_b)."""
    from ray.data.aggregate import Min

    banded = docs.map_batches(band_rows, batch_format="pyarrow", batch_size=2048)
    pairs = banded.groupby("bucket").map_groups(
        lambda g: bucket_pairs(g, est_threshold), batch_format="pandas"
    )
    # a pair can surface from several bands (identical estimate) -> distinct
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Min("est_jaccard_permille", alias_name="est_jaccard_permille")
    )


# ------------------------------------------------------------------ simhash

def simhash64(text: str) -> np.uint64:
    toks = text.lower().split()
    if not toks:
        return np.uint64(0)
    acc = np.zeros(64, np.int64)
    for t in toks:
        h = (np.uint64(zlib.crc32(t.encode())) << np.uint64(32)) | np.uint64(
            zlib.crc32((t + "#").encode())
        )
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits == 1, 1, -1)
    out = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return out


def simhash_rows(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    ids = batch[id_col].to_pylist()
    texts = batch[text_col].to_pylist()
    hs = np.array([simhash64(t) for t in texts], np.uint64)
    band_id, band_val, doc_id, sim = [], [], [], []
    for did, h in zip(ids, hs):
        for b in range(4):
            band_id.append(b)
            band_val.append(int((h >> np.uint64(16 * b)) & np.uint64(0xFFFF)))
            doc_id.append(did)
            sim.append(int(h.astype(np.int64)))  # two's-complement int64 view
    band_id = np.asarray(band_id, np.int32)
    band_val = np.asarray(band_val, np.int64)
    bucket = (band_val * 4 + band_id) % NBUCKETS
    return pa.table(
        {
            "bucket": pa.array(bucket, pa.int64()),
            "band_id": pa.array(band_id, pa.int32()),
            "band_val": pa.array(band_val, pa.int64()),
            "doc_id": pa.array(doc_id, pa.int64()),
            "simhash": pa.array(sim, pa.int64()),
        }
    )


def _empty_sim_pairs() -> pd.DataFrame:
    return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []}).astype(
        {"doc_a": np.int64, "doc_b": np.int64, "hamming": np.int64}
    )


def simhash_pairs(group: pd.DataFrame, max_hamming: int = 3) -> pd.DataFrame:
    """Run-detection over one hash bucket, pairs only within equal
    (band_id, band_val) runs, exact Hamming verification."""
    if len(group) < 2:
        return _empty_sim_pairs()
    g = group.sort_values(["band_id", "band_val", "doc_id"], kind="mergesort")
    bid = g["band_id"].to_numpy(np.int64)
    bv = g["band_val"].to_numpy(np.int64)
    ids = g["doc_id"].to_numpy(np.int64)
    hs = g["simhash"].to_numpy(np.int64).astype(np.uint64)
    same = (bid[1:] == bid[:-1]) & (bv[1:] == bv[:-1])
    bounds = np.flatnonzero(~same) + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [len(g)]])
    frames = []
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        run_ids = ids[s:e]
        uniq, upos = np.unique(run_ids, return_index=True)
        if len(uniq) < 2:
            continue
        run_hs = hs[s:e][upos]
        ia, ib = np.triu_indices(len(uniq), k=1)
        x = run_hs[ia] ^ run_hs[ib]
        ham = np.zeros(len(x), np.int64)
        for sh in range(64):
            ham += ((x >> np.uint64(sh)) & np.uint64(1)).astype(np.int64)
        keep = ham <= max_hamming
        if keep.any():
            frames.append(
                pd.DataFrame(
                    {"doc_a": uniq[ia[keep]], "doc_b": uniq[ib[keep]], "hamming": ham[keep]}
                )
            )
    return pd.concat(frames, ignore_index=True) if frames else _empty_sim_pairs()


def simhash_dup_pairs(docs, max_hamming: int = 3):
    from ray.data.aggregate import Min

    rows = docs.map_batches(simhash_rows, batch_format="pyarrow", batch_size=2048)
    pairs = rows.groupby("bucket").map_groups(
        lambda g: simhash_pairs(g, max_hamming), batch_format="pandas"
    )
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Min("hamming", alias_name="hamming")
    )


# ----------------------------------------------------- embedding near-dup

def embedding_dup_pairs(embeddings, threshold: float = 0.95, bits: int = 8):
    """Embedding-cosine near-dup: random-hyperplane LSH bucketing, then
    exact cosine within buckets (pairs at sim >= threshold).  The bucket
    groupby is the only shuffle; within-bucket work is one numpy matmul.
    """
    from ..stages.ann import lsh_bucket, lsh_planes

    def _bucket(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["vec_id"].to_numpy(zero_copy_only=False), np.int64)
        flat = np.asarray(batch["embedding"].combine_chunks().flatten(), np.float32)
        mat = flat.reshape(len(ids), -1).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        mat = mat / norms[:, None]
        planes = lsh_planes(mat.shape[1], bits)
        b = lsh_bucket(mat, planes)
        return pa.table(
            {
                "bucket": pa.array(b, pa.int64()),
                "vec_id": pa.array(ids, pa.int64()),
                "vec": pa.array(list(mat.astype(np.float32)), pa.list_(pa.float32())),
            }
        )

    def _pairs(group: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_a": [], "vec_b": [], "sim": []}).astype(
            {"vec_a": np.int64, "vec_b": np.int64, "sim": np.float64}
        )
        if len(group) < 2:
            return empty
        g = group.sort_values("vec_id").drop_duplicates("vec_id")
        ids = g["vec_id"].to_numpy(np.int64)
        mat = np.stack([np.asarray(v, np.float64) for v in g["vec"]])
        sims = mat @ mat.T
        ia, ib = np.triu_indices(len(ids), k=1)
        s = sims[ia, ib]
        keep = s >= threshold
        if not keep.any():
            return empty
        return pd.DataFrame(
            {"vec_a": ids[ia[keep]], "vec_b": ids[ib[keep]], "sim": s[keep]}
        )

    bucketed = embeddings.map_batches(_bucket, batch_format="pyarrow", batch_size=4096)
    return bucketed.groupby("bucket").map_groups(_pairs, batch_format="pandas")


# ------------------------------------------------- exact n-gram Jaccard

def ngram_jaccard_verify(docs, candidate_pairs: pd.DataFrame, n_words: int = 3) -> pd.DataFrame:
    """Exact word-n-gram Jaccard for a (small) candidate pair list.

    The pair list (from MinHash-LSH) is broadcast; one pass over the
    documents collects shingle sets for ONLY the involved docs (a semi-join
    by broadcast key set); the driver finishes the tiny pairwise step.
    """
    involved = set(candidate_pairs["doc_a"]) | set(candidate_pairs["doc_b"])

    def _shingles(batch: pd.DataFrame) -> pd.DataFrame:
        rows = batch[batch["doc_id"].isin(involved)]
        out = []
        for did, txt in zip(rows["doc_id"], rows["text"]):
            toks = txt.lower().split()
            sh = {" ".join(toks[i : i + n_words]) for i in range(max(1, len(toks) - n_words + 1))}
            out.append({"doc_id": int(did), "shingles": list(sh)})
        return pd.DataFrame(out) if out else pd.DataFrame({"doc_id": [], "shingles": []})

    collected = docs.map_batches(_shingles, batch_format="pandas").to_pandas()
    sets = {int(r.doc_id): set(r.shingles) for r in collected.itertuples()}
    recs = []
    for a, b in zip(candidate_pairs["doc_a"], candidate_pairs["doc_b"]):
        sa, sb = sets.get(int(a)), sets.get(int(b))
        if sa is None or sb is None:
            continue
        inter = len(sa & sb)
        union = len(sa | sb)
        recs.append(
            {
                "doc_a": int(a),
                "doc_b": int(b),
                "jaccard_permille": int(np.floor(1000.0 * inter / max(union, 1) + 0.5)),
            }
        )
    return pd.DataFrame(recs, columns=["doc_a", "doc_b", "jaccard_permille"]).astype(
        {"doc_a": np.int64, "doc_b": np.int64, "jaccard_permille": np.int64}
    )


# ------------------------------------------------ connected components

def dedup_clusters(pairs, max_rounds: int = 20):
    """Near-dup pair list -> cluster assignment (doc_id, cluster_id) via
    min-label propagation expressed purely as groupby rounds (no join):

    each round unions the label rows with the (symmetric) edge rows,
    co-groups them by node, and emits the node's label to itself and to
    every neighbor; a groupby-min adopts the smallest label seen.
    Converges in O(component diameter) rounds — near-dup components are
    tiny.  cluster_id = smallest doc_id in the component.  The node set
    of the pair graph (duplicates only) is far smaller than the corpus,
    so the per-round state is light; for degenerate giant components cap
    ``max_rounds``.
    """
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Min

    def _sym(t: pa.Table) -> pa.Table:
        a = t["doc_a"].combine_chunks() if isinstance(t["doc_a"], pa.ChunkedArray) else t["doc_a"]
        b = t["doc_b"].combine_chunks() if isinstance(t["doc_b"], pa.ChunkedArray) else t["doc_b"]
        return pa.table(
            {"node": pa.concat_arrays([a, b]), "dst": pa.concat_arrays([b, a])}
        )

    edges = pairs.map_batches(
        lambda t: _sym(t.select(["doc_a", "doc_b"])), batch_format="pyarrow"
    ).materialize()

    # initial label of each node = min(itself, its smallest neighbor)
    labels = (
        edges.groupby("node")
        .aggregate(Min("dst", alias_name="nmin"))
        .map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "label": pa.compute.min_element_wise(t["node"], t["nmin"]),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def _propagate(group: pd.DataFrame) -> pd.DataFrame:
        lab = group.loc[group["dst"].isna(), "label"]
        if lab.empty:
            return pd.DataFrame({"node": [], "cand": []}).astype(
                {"node": "int64", "cand": "int64"}
            )
        label = int(lab.min())
        dsts = group.loc[group["dst"].notna(), "dst"].astype("int64").tolist()
        nodes = [int(group["node"].iloc[0])] + dsts
        return pd.DataFrame({"node": nodes, "cand": [label] * len(nodes)})

    prev = labels.to_pandas().sort_values("node").reset_index(drop=True)
    for _ in range(max_rounds):
        lab_rows = labels.map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "label": t["label"],
                    "dst": pa.nulls(t.num_rows, pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        edge_rows = edges.map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "label": pa.nulls(t.num_rows, pa.int64()),
                    "dst": t["dst"],
                }
            ),
            batch_format="pyarrow",
        )
        messages = lab_rows.union(edge_rows).groupby("node").map_groups(
            _propagate, batch_format="pandas"
        )
        labels = (
            messages.groupby("node").aggregate(Min("cand", alias_name="label")).materialize()
        )
        cur = labels.to_pandas().sort_values("node").reset_index(drop=True)
        if cur.equals(prev):
            break
        prev = cur

    return labels.map_batches(
        lambda t: pa.table({"doc_id": t["node"], "cluster_id": t["label"]}),
        batch_format="pyarrow",
    )
