"""Match scoring.

The reference observes only score *tiers* from the API: 100 for an exact
locator hit, an ``acceptScore`` threshold (default 70,
``/root/reference/src/agrcgeocoding/geocode.py:28``) below which the API
returns 404 "No address candidates found with a score of 70 or better."
(``tests/test_geocode.py:89``).  Our from-scratch local scoring function —
shared by the engine and the DuckDB oracle — is:

    score(a, b) = floor(100 * (1 - lev(a, b) / max(len(a), len(b), 1)) + 0.5)

i.e. a normalized-edit-distance similarity on the standardized address
strings, as an int64 in [0, 100].  Exact match -> 100 (which reproduces
the reference's exact tier); ``floor(x + 0.5)`` is used instead of
``round`` so Python (banker's rounding) and DuckDB (half-away-from-zero)
cannot disagree.

``levenshtein_batch`` is a vectorized batched DP: it loops only over the
(short) string length; each step is O(pairs) numpy.  The inner
``min(cur[j-1] + 1, base[j])`` left-to-right cascade is computed without a
j-loop via the identity

    f(j) = min_{k<=j} (base(k) + (j - k)) = j + cummin(base(k) - k),

so the whole DP is ``max_len`` numpy row operations.
"""

from __future__ import annotations

import numpy as np


def _encode_padded(strings: np.ndarray, width: int) -> np.ndarray:
    """(P,) array of python strs -> (P, width) int32 codepoint matrix, 0-padded."""
    joined = "\x00".join(strings.tolist())
    if joined:
        flat = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32).astype(np.int32)
    else:
        flat = np.zeros(0, np.int32)
    lens = np.array([len(s) for s in strings], np.int64)
    out = np.zeros((len(strings), width), np.int32)
    starts = np.concatenate([[0], np.cumsum(lens[:-1] + 1)])
    col = np.arange(width)
    mask = col[None, :] < lens[:, None]
    # gather: position of char j of string i in `flat` is starts[i] + j
    idx = (starts[:, None] + col[None, :])
    idx = np.where(mask, idx, 0)
    vals = flat[idx] if len(flat) else np.zeros_like(idx, np.int32)
    out[mask] = vals[mask]
    return out


def levenshtein_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise Levenshtein distance between two equal-length arrays of strings.

    a, b: object/str numpy arrays of shape (P,). Returns int64 (P,).
    """
    a = np.asarray(a, dtype=object)
    b = np.asarray(b, dtype=object)
    len_a = np.array([len(s) for s in a], np.int64)
    len_b = np.array([len(s) for s in b], np.int64)
    if len(a) == 0:
        return np.zeros(0, np.int64)
    la, lb = int(len_a.max(initial=0)), int(len_b.max(initial=0))
    if la == 0 or lb == 0:
        return np.maximum(len_a, len_b)
    A = _encode_padded(a.astype(str), la)   # (P, la)
    B = _encode_padded(b.astype(str), lb)   # (P, lb)
    P = len(a)
    j = np.arange(lb + 1, dtype=np.int64)
    prev = np.broadcast_to(j, (P, lb + 1)).copy()          # row i=0
    for i in range(1, la + 1):
        cost = (A[:, i - 1:i] != B).astype(np.int64)       # (P, lb)
        base = np.empty((P, lb + 1), np.int64)
        base[:, 0] = i
        # substitution / deletion candidates (no left-to-right dependency)
        base[:, 1:] = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost)
        # insertion cascade: cur[j] = min_{k<=j}(base[k] + (j-k))
        cur = np.minimum.accumulate(base - j[None, :], axis=1) + j[None, :]
        # rows of A shorter than i keep their previous DP row frozen
        active = (len_a >= i)
        prev[active] = cur[active]
    # answer for row p is prev[p, len_b[p]]
    return prev[np.arange(P), np.minimum(len_b, lb)]


def score_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized score(a, b) -> int64 in [0, 100]."""
    a = np.asarray(a, dtype=object)
    b = np.asarray(b, dtype=object)
    lev = levenshtein_batch(a, b).astype(np.float64)
    len_a = np.array([len(s) for s in a], np.float64)
    len_b = np.array([len(s) for s in b], np.float64)
    denom = np.maximum(np.maximum(len_a, len_b), 1.0)
    return np.floor(100.0 * (1.0 - lev / denom) + 0.5).astype(np.int64)


def score(a: str, b: str) -> int:
    """Scalar convenience wrapper (tests)."""
    return int(score_batch(np.array([a], object), np.array([b], object))[0])


def score_sql(a: str, b: str) -> str:
    """DuckDB expression computing score(a, b) identically (BIGINT)."""
    return (
        "CAST(floor(100.0 * (1.0 - CAST(levenshtein({a}, {b}) AS DOUBLE) / "
        "GREATEST(length({a}), length({b}), 1)) + 0.5) AS BIGINT)"
    ).format(a=a, b=b)
