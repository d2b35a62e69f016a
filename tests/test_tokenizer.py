"""BPE trainer pinned against an independent naive reference.

The reference below is deliberately written the textbook way (dict of
tuples, per-word Python loops — Sennrich et al. 2016 pseudocode) so a
bug in the vectorized flat-array trainer can't hide in shared code."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from geocoding_toolbox_ray.stages.tokenizer import (
    EOW,
    _apply_merge,
    _flatten_vocab,
    learn_merges,
)


def _naive_bpe(word_counts: dict[str, int], n_merges: int):
    vocab = {}
    for w, n in word_counts.items():
        cs = list(w)
        cs[-1] += EOW
        vocab[tuple(cs)] = vocab.get(tuple(cs), 0) + n
    merges = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), cnt = best
        merges.append((l, r, cnt))
        new_vocab = {}
        for syms, n in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


FIXTURES = [
    {"low": 5, "lower": 2, "newest": 6, "widest": 3},
    {"aaaa": 3, "aaa": 2, "ab": 7, "ba": 7},       # self-adjacent overlap
    {"xyxy": 4, "xyx": 2, "yxy": 2},               # alternating chains
    {"a": 1},                                      # degenerate 1-char word
]


@pytest.mark.parametrize("wc", FIXTURES)
def test_learn_merges_matches_naive(wc):
    words = np.asarray(sorted(wc), object)
    counts = np.asarray([wc[w] for w in sorted(wc)], np.int64)
    got = learn_merges(words, counts, 8)
    want = _naive_bpe(wc, 8)
    assert len(got) == len(want)
    for i, (l, r, n) in enumerate(want):
        assert (got["left"][i], got["right"][i], int(got["pair_count"][i])) == (l, r, n)


def test_apply_merge_overlap_rule():
    syms, wid, _ = _flatten_vocab(np.asarray(["aaaa"], object), np.asarray([1], np.int64))
    out, _ = _apply_merge(syms, wid, "a", "a")
    # the flat word is [a, a, a, a</w>]; left-to-right non-overlapping
    # merge of (a, a) consumes positions (0,1), leaving [aa, a, a</w>]
    assert list(out) == ["aa", "a", "a" + EOW]


def test_end_to_end_dataset(ray_session):
    import ray.data as rd

    docs = rd.from_items([{"text": "low low lower newest newest newest widest"}])
    from geocoding_toolbox_ray.stages.tokenizer import bpe_learn_merges

    got = bpe_learn_merges(docs, n_merges=5)
    want = _naive_bpe({"low": 2, "lower": 1, "newest": 3, "widest": 1}, 5)
    assert [tuple(r) for r in got[["left", "right", "pair_count"]].itertuples(index=False)] == want


def _naive_encode(word: str, merges) -> int:
    syms = list(word)
    syms[-1] += EOW
    for l, r in merges:
        out = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return len(syms)


def test_encode_subword_counts_matches_naive():
    from geocoding_toolbox_ray.stages.tokenizer import encode_subword_counts

    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "aaaa": 2}
    merges = [(l, r) for l, r, _ in _naive_bpe(wc, 6)]
    words = np.asarray(sorted(wc), object)
    got = encode_subword_counts(words, merges)
    want = [_naive_encode(w, merges) for w in words]
    assert got.tolist() == want


def test_bpe_encode_tokens_dataset(ray_session):
    from geocoding_toolbox_ray import queries as q

    out = q.bpe_encode_tokens("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 500
    assert (out["n_subwords"] > 0).all()
    # encoding can never produce more subwords than characters+1 per word
    # and never fewer than the word count; spot-check one doc end to end
    import duckdb

    row = duckdb.sql(
        "SELECT doc_id, text FROM '/root/testdata/sf0.001/documents.parquet' LIMIT 1"
    ).fetchone()
    from geocoding_toolbox_ray.functions.text import ws_tokens
    from geocoding_toolbox_ray.stages.tokenizer import bpe_learn_merges
    import ray.data as rd

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet", columns=["text"])
    merges_df = bpe_learn_merges(docs, n_merges=10)
    merges = list(zip(merges_df["left"], merges_df["right"]))
    want = sum(_naive_encode(w, merges) for w in ws_tokens(row[1].lower()))
    got = int(out.loc[out["doc_id"] == row[0], "n_subwords"].iloc[0])
    assert got == want
