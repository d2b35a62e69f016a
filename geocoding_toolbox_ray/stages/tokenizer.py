"""Distributed BPE tokenizer training (vocabulary induction).

The classic byte-pair-encoding trainer factors into two very different
scale regimes, and the operator is split accordingly:

1. **Word histogram** — the only pass that touches the corpus.  Runs as
   the repo's standard coarse-bucket reduce (per-batch ``np.unique``
   partials, crc-bucket shuffle, vectorized in-bucket sum), so 100 TB of
   text shrinks to one (word, count) table bounded by DISTINCT words.
2. **Merge loop** — greedy pair selection over the weighted vocab.  The
   vocab table is orders of magnitude smaller than the corpus (the same
   broadcast-fits contract as ``_remote_sorted_column``); the loop runs
   vectorized over a flat symbol array (positions, word ids, weights),
   one pandas groupby per round for pair counts, with the standard
   left-to-right non-overlapping merge rule and a deterministic
   (count DESC, pair ASC) tie-break.

Reference semantics: Sennrich et al. 2016 (arXiv:1508.07909) — the
published algorithm, not any implementation.  The reference toolbox has
no tokenizer; this is part of the training-data tier
(BASELINE.json input_hint: web-document corpus).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

#: marker appended to each word's final symbol (end-of-word, per the paper)
EOW = "</w>"


def word_histogram(ds, n_buckets: int = 64):
    """documents Dataset -> (word, n) pandas table via bucketed reduce."""
    from ..functions.text import ws_tokens

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        for s in df["text"]:
            toks.extend(ws_tokens(s.lower()))
        if not toks:
            return pd.DataFrame({"bucket": pd.array([], "int64"),
                                 "word": pd.array([], "object"),
                                 "part_n": pd.array([], "int64")})
        uniq, counts = np.unique(np.asarray(toks, object), return_counts=True)
        import zlib

        bucket = np.fromiter(
            (zlib.crc32(w.encode("utf-8")) % n_buckets for w in uniq),
            np.int64,
            count=len(uniq),
        )
        return pd.DataFrame({"bucket": bucket, "word": uniq, "part_n": counts.astype(np.int64)})

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("word", sort=False)["part_n"].sum()
        return pd.DataFrame({"word": s.index.to_numpy(object), "n": s.to_numpy(np.int64)})

    return (
        ds.map_batches(_partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(_reduce, batch_format="pandas")
        .to_pandas()
    )


def _flatten_vocab(words: np.ndarray, counts: np.ndarray):
    """(word, n) -> flat symbol arrays: syms (object), word_id, weight."""
    syms: list[str] = []
    wid: list[int] = []
    for i, w in enumerate(words):
        cs = list(w)
        cs[-1] = cs[-1] + EOW
        syms.extend(cs)
        wid.extend([i] * len(cs))
    return (
        np.asarray(syms, object),
        np.asarray(wid, np.int64),
        np.asarray(counts, np.int64),
    )


def _pair_counts(syms: np.ndarray, wid: np.ndarray, weight: np.ndarray):
    """Adjacent within-word pairs -> (left, right, total weight) table."""
    if len(syms) < 2:
        return pd.DataFrame({"left": [], "right": [], "n": []})
    same = wid[:-1] == wid[1:]
    df = pd.DataFrame(
        {
            "left": syms[:-1][same],
            "right": syms[1:][same],
            "n": weight[wid[:-1][same]],
        }
    )
    return df.groupby(["left", "right"], sort=False)["n"].sum().reset_index()


def _apply_merge(syms: np.ndarray, wid: np.ndarray, left: str, right: str):
    """Left-to-right non-overlapping merge of (left, right) -> left+right."""
    match = (syms[:-1] == left) & (syms[1:] == right) & (wid[:-1] == wid[1:])
    idx = np.flatnonzero(match)
    if len(idx) == 0:
        return syms, wid
    # drop overlapping matches (only possible when left == right, e.g.
    # 'a a a'): left-to-right scan keeps a match unless its left symbol
    # was just consumed by the previous kept match
    kept: list[int] = []
    prev = -2
    for i in idx:
        if i - 1 == prev:
            prev = -2  # consumed; also breaks the chain for 'a a a a'
            continue
        kept.append(i)
        prev = i
    kept_a = np.asarray(kept, np.int64)
    new = syms.copy()
    new[kept_a] = left + right
    drop = np.zeros(len(syms), bool)
    drop[kept_a + 1] = True
    return new[~drop], wid[~drop]


def learn_merges(words: np.ndarray, counts: np.ndarray, n_merges: int) -> pd.DataFrame:
    """Greedy BPE merge list over a weighted word vocabulary."""
    syms, wid, weight = _flatten_vocab(words, counts)
    out_rank: list[int] = []
    out_left: list[str] = []
    out_right: list[str] = []
    out_n: list[int] = []
    for r in range(1, n_merges + 1):
        pc = _pair_counts(syms, wid, weight)
        if not len(pc):
            break
        pc = pc.sort_values(["n", "left", "right"], ascending=[False, True, True])
        best = pc.iloc[0]
        out_rank.append(r)
        out_left.append(str(best["left"]))
        out_right.append(str(best["right"]))
        out_n.append(int(best["n"]))
        syms, wid = _apply_merge(syms, wid, str(best["left"]), str(best["right"]))
    return pd.DataFrame(
        {
            "merge_rank": np.asarray(out_rank, np.int64),
            "left": np.asarray(out_left, object),
            "right": np.asarray(out_right, object),
            "pair_count": np.asarray(out_n, np.int64),
        }
    )


def bpe_learn_merges(ds, n_merges: int = 10) -> pd.DataFrame:
    """End-to-end trainer: corpus Dataset -> first ``n_merges`` BPE merges."""
    hist = word_histogram(ds)
    hist = hist.sort_values("word").reset_index(drop=True)
    return learn_merges(
        hist["word"].to_numpy(object), hist["n"].to_numpy(np.int64), n_merges
    )


def encode_subword_counts(words: np.ndarray, merges) -> np.ndarray:
    """Apply an ordered merge list to each (unique) word; return subword
    counts per word.  Same flat-array kernel as training — one
    ``_apply_merge`` pass per merge over the whole batch vocabulary, so
    cost scales with distinct words, not corpus rows."""
    if len(words) == 0:
        return np.zeros(0, np.int64)
    syms, wid, _ = _flatten_vocab(words, np.ones(len(words), np.int64))
    for left, right in merges:
        syms, wid = _apply_merge(syms, wid, str(left), str(right))
    return np.bincount(wid, minlength=len(words)).astype(np.int64)
