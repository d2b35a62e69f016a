"""Mergeable sketches (SURVEY.md custom-operator path: "a novel sketch").

HyperLogLog with 2^P registers over a deterministic multiplicative
64-bit hash: each batch emits ONE serialized sketch row; sketches merge
by element-wise register max (associative + commutative, so the merge
order Ray produces doesn't matter), and the estimate is the classic
bias-corrected harmonic mean.  Deterministic for a given input set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

HLL_P = 12
HLL_M = 1 << HLL_P
_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
_MULT = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio (splitmix64-style) multiplier


def _hash64(values: np.ndarray) -> np.ndarray:
    x = values.astype(np.uint64) * _MULT
    x ^= x >> np.uint64(29)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(32)
    return x


def hll_registers(values: np.ndarray) -> np.ndarray:
    """int64 values -> (HLL_M,) uint8 register array."""
    h = _hash64(np.asarray(values, np.int64))
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = h << np.uint64(HLL_P)  # remaining bits, left-aligned
    # rank = leading zeros of `rest` + 1 (capped)
    lz = np.zeros(len(h), np.uint8)
    mask = np.uint64(1) << np.uint64(63)
    rest_work = rest.copy()
    found = np.zeros(len(h), bool)
    for i in range(64 - HLL_P):
        isset = (rest_work & mask) != 0
        newly = isset & ~found
        lz[newly] = i
        found |= isset
        rest_work = rest_work << np.uint64(1)
    lz[~found] = 64 - HLL_P
    rank = (lz + 1).astype(np.uint8)
    regs = np.zeros(HLL_M, np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_sketch_batch(values: np.ndarray) -> pa.Table:
    """One serialized sketch row per batch."""
    regs = hll_registers(values)
    return pa.table({"registers": pa.array([regs.tobytes()], pa.binary())})


def hll_merge(serialized: np.ndarray) -> np.ndarray:
    out = np.zeros(HLL_M, np.uint8)
    for blob in serialized:
        out = np.maximum(out, np.frombuffer(blob, np.uint8))
    return out


def hll_estimate(regs: np.ndarray) -> float:
    regs = regs.astype(np.float64)
    est = _ALPHA * HLL_M * HLL_M / np.sum(2.0 ** (-regs))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * HLL_M and zeros:
        est = HLL_M * np.log(HLL_M / zeros)  # small-range correction
    return float(est)


# -------------------------------------------------- Count-Min Sketch (CMS)
#
# Unlike HLL (whose ln-based estimate can't hash-match SQL), a CMS is
# EXACT integer arithmetic end to end: counters are sums, the estimate is
# a min of bucket sums — so the whole sketch is oracle-checkable with the
# repo's SQL-replicable hash family (h_j(t) = (a_j*poly(t)+b_j) mod p
# mod w; every product < 2^62).  Counters merge by +, so Ray's
# nondeterministic merge order cannot change the result.

CMS_D = 3
CMS_W = 1024
#: (a_j, b_j) pairwise-independent-hash constants < 2^31 (fixed primes)
CMS_A = (1000003, 1000033, 1000037)
CMS_B = (12345, 67891, 24681)


def cms_bucket(poly_hashes: np.ndarray, j: int) -> np.ndarray:
    """Row-j CMS bucket of SQL-replicable polynomial token hashes."""
    from ..functions.text import ROLL_MOD

    h = poly_hashes.astype(np.int64)
    return ((CMS_A[j] * h + CMS_B[j]) % ROLL_MOD) % CMS_W


def cms_accumulate(acc: np.ndarray, tokens: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Add (token poly-hash, count) pairs into a (CMS_D, CMS_W) counter
    matrix — pure sums, merge-order independent."""
    for j in range(CMS_D):
        np.add.at(acc[j], cms_bucket(tokens, j), counts)
    return acc


def cms_estimate(acc: np.ndarray, poly_hashes: np.ndarray) -> np.ndarray:
    """Point estimates: min over rows of the bucket counters (classic CMS
    one-sided overestimate)."""
    ests = np.stack(
        [acc[j][cms_bucket(poly_hashes, j)] for j in range(CMS_D)]
    )
    return ests.min(axis=0).astype(np.int64)


# ------------------------------------------------ Misra-Gries heavy hitters

MG_CAP = 64  #: sketch capacity: guaranteed superset of tokens with freq > n/cap


def mg_trim(d: dict, cap: int = MG_CAP) -> dict:
    """Misra-Gries capacity trim: subtract the (cap+1)-th largest count
    from every counter and drop the non-positive — the mergeable-summary
    form (Agarwal et al., 'Mergeable Summaries'), error <= n/(cap+1)."""
    if len(d) <= cap:
        return d
    counts = np.sort(np.fromiter(d.values(), np.int64, len(d)))
    sub = int(counts[-(cap + 1)])
    return {t: c - sub for t, c in d.items() if c > sub}


def mg_merge(a: dict, b: dict, cap: int = MG_CAP) -> dict:
    out = dict(a)
    for t, c in b.items():
        out[t] = out.get(t, 0) + c
    return mg_trim(out, cap)


def build_mg_tokens(ds, text_col: str = "text", cap: int = MG_CAP) -> dict:
    """Aggregate a Dataset's tokenized text column into one Misra-Gries
    counter dict (<= cap entries): per-block vectorized unique counts,
    dict merge + trim — a mergeable sketch like the bloom/HLL stages.
    The result is only a CANDIDATE superset; callers exact-recheck (the
    bloom anti-join discipline) so the final answer is oracle-exact."""
    from ray.data.aggregate import AggregateFn

    from ..functions.text import ws_tokens

    def _acc_block(acc: dict, block) -> dict:
        df = block if hasattr(block, "iterrows") else block.to_pandas()
        toks: list[str] = []
        for s in df[text_col]:
            toks.extend(ws_tokens(s.lower()))
        if not toks:
            return acc
        uniq, counts = np.unique(np.asarray(toks, object), return_counts=True)
        return mg_merge(acc, dict(zip(uniq.tolist(), counts.tolist())), cap)

    agg = AggregateFn(
        init=lambda k: {},
        merge=lambda a, b: mg_merge(a, b, cap),
        accumulate_block=_acc_block,
        name="mg",
    )
    res = ds.aggregate(agg)
    return res["mg"] if res else {}
