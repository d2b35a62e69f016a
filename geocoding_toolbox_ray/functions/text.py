"""Text-analysis kernels for the training-data pipeline operators:
token counting, language-ID heuristic, quality scoring, fingerprinting.

Same contract as the other function modules: vectorized kernel + SQL
builder from one table of constants, so DuckDB oracles are mechanical.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

TOKEN_PATTERN = r"\S+"

#: RE2's '\s' class written out EXPLICITLY (ADVICE r2): Python
#: ``str.split()`` also splits Unicode whitespace (U+00A0, U+2028, ...)
#: and Python ``re.ASCII \s`` additionally matches \x0b — both diverge
#: from the RE2 '\s' = [\t\n\f\r ] the oracle CTEs split with.  The SAME
#: literal serves both sides: Python re and DuckDB RE2 each interpret
#: the \t/\n/\f/\r escapes inside the class identically.
WS_SPLIT_PATTERN = r"[\t\n\f\r ]+"
_WS_SPLIT_RE = re.compile(WS_SPLIT_PATTERN)


def ws_tokens(text: str) -> list[str]:
    """Whitespace tokenization bit-identical to the oracle's
    ``regexp_split_to_array(..., WS_SPLIT_PATTERN)`` + empty filter."""
    return [t for t in _WS_SPLIT_RE.split(text) if t]

#: language -> stopword alternation, in tie-break priority order.
LANGS: tuple[str, ...] = ("en", "es", "de", "fr")
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "a", "to"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "les", "une", "et", "dans"),
}


def _stop_regex(lang: str) -> str:
    return r"\b(" + "|".join(LANG_STOPWORDS[lang]) + r")\b"


# ------------------------------------------------------------- vectorized

def _as_arrow(text) -> "pa.ChunkedArray":
    import pyarrow as pa

    if isinstance(text, (pa.Array, pa.ChunkedArray)):
        return text
    return pa.array(list(text), pa.large_string())


def token_count(text) -> np.ndarray:
    """Arrow RE2 kernel (same counts as pandas str.count on these
    patterns; ~5-10x faster on large batches)."""
    import pyarrow.compute as pc

    return np.asarray(
        pc.count_substring_regex(_as_arrow(text), TOKEN_PATTERN).to_numpy(
            zero_copy_only=False
        ),
        np.int64,
    )


def stopword_counts(text) -> dict[str, np.ndarray]:
    import pyarrow.compute as pc

    lower = pc.utf8_lower(_as_arrow(text))
    return {
        lang: np.asarray(
            pc.count_substring_regex(lower, _stop_regex(lang)).to_numpy(
                zero_copy_only=False
            ),
            np.int64,
        )
        for lang in LANGS
    }


def lang_id(text: pd.Series) -> np.ndarray:
    """argmax stopword count with priority-order tie-break; all-zero -> 'unknown'."""
    counts = stopword_counts(text)
    n = len(text)
    best = np.full(n, "unknown", object)
    best_count = np.zeros(n, np.int64)
    for lang in reversed(LANGS):  # earlier langs win ties -> apply last with >=
        c = counts[lang]
        take = (c > 0) & (c >= best_count)
        best[take] = lang
        best_count[take] = c[take]
    return best


def md5_hex(text: pd.Series) -> pd.Series:
    return text.map(lambda s: hashlib.md5(s.encode("utf-8")).hexdigest())


def quality_features(text) -> dict[str, np.ndarray]:
    import pyarrow.compute as pc

    arr = _as_arrow(text)
    n_chars = np.asarray(
        pc.utf8_length(arr).to_numpy(zero_copy_only=False), np.int64
    )
    n_tokens = token_count(arr)
    n_stop = stopword_counts(arr)["en"]
    with np.errstate(divide="ignore", invalid="ignore"):
        permille = np.floor(1000.0 * n_stop / n_tokens + 0.5)
    stop_permille = np.where(n_tokens > 0, permille, 0.0).astype(np.int64)
    is_short = (n_chars < 100).astype(np.int64)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_stopwords": n_stop,
        "stop_permille": stop_permille,
        "is_short": is_short,
    }


# -------------------------------------------------------------------- sql

def token_count_sql(expr: str) -> str:
    return f"CAST(len(regexp_extract_all({expr}, '{TOKEN_PATTERN}')) AS BIGINT)"


def stopword_count_sql(expr: str, lang: str) -> str:
    pat = _stop_regex(lang).replace("'", "''")
    return f"CAST(len(regexp_extract_all(lower({expr}), '{pat}')) AS BIGINT)"


def lang_id_sql(expr: str) -> str:
    c = {lang: stopword_count_sql(expr, lang) for lang in LANGS}
    return (
        "CASE "
        f"WHEN {c['en']} > 0 AND {c['en']} >= {c['es']} AND {c['en']} >= {c['de']} AND {c['en']} >= {c['fr']} THEN 'en' "
        f"WHEN {c['es']} > 0 AND {c['es']} >= {c['de']} AND {c['es']} >= {c['fr']} THEN 'es' "
        f"WHEN {c['de']} > 0 AND {c['de']} >= {c['fr']} THEN 'de' "
        f"WHEN {c['fr']} > 0 THEN 'fr' "
        "ELSE 'unknown' END"
    )


def quality_sql(expr: str) -> dict[str, str]:
    nt = token_count_sql(expr)
    ns = stopword_count_sql(expr, "en")
    return {
        "n_chars": f"CAST(length({expr}) AS BIGINT)",
        "n_tokens": nt,
        "n_stopwords": ns,
        "stop_permille": (
            f"CASE WHEN {nt} > 0 THEN CAST(floor(1000.0 * {ns} / {nt} + 0.5) AS BIGINT) "
            "ELSE 0 END"
        ),
        "is_short": f"CASE WHEN length({expr}) < 100 THEN 1 ELSE 0 END",
    }


# --------------------------------------------- more tokenizers / hashes

#: BPE-ish pre-tokenizer (GPT-2-flavored, RE2-compatible subset: no
#: lookahead): contractions, letter runs, digit runs, punct runs.
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+"


def bpe_token_count(text: pd.Series) -> np.ndarray:
    return text.str.count(BPE_PATTERN).to_numpy(np.int64)


def bpe_token_count_sql(expr: str) -> str:
    pat = BPE_PATTERN.replace("'", "''")
    return f"CAST(len(regexp_extract_all({expr}, '{pat}')) AS BIGINT)"


#: Rabin-Karp parameters chosen so every intermediate fits well inside
#: int64/BIGINT with NO wraparound anywhere: h < p < 2^31, base < 2^20,
#: so h*B + c < 2^51. That makes the chunk-merge identity
#: h_ab = (h_a * B^len(b) + h_b) mod p mathematically real (ADVICE r1)
#: and lets DuckDB replicate the hash exactly with list_reduce.
ROLL_BASE = 1000003
ROLL_MOD = 2147483629  # largest prime < 2^31


def rolling_fingerprint(text: str) -> int:
    """Rabin-Karp polynomial rolling hash over Unicode code points
    (deterministic, mergeable per chunk by h_ab = (h_a*B^len(b)+h_b) mod p;
    exact-arithmetic, no overflow)."""
    h = 0
    for c in text:
        h = (h * ROLL_BASE + ord(c)) % ROLL_MOD
    return h


_roll_powers_by_base: dict[int, np.ndarray] = {}  # pw[j] = B^j mod p, grown on demand


def _roll_powers_upto(n: int, base: int = ROLL_BASE) -> np.ndarray:
    cur = _roll_powers_by_base.get(base)
    if cur is None:
        cur = np.ones(1, np.uint64)
    if len(cur) < n:
        grow = max(n, 2 * len(cur))
        pw = np.empty(grow, np.uint64)
        pw[: len(cur)] = cur
        b, p = np.uint64(base), np.uint64(ROLL_MOD)
        for j in range(len(cur), grow):
            pw[j] = (pw[j - 1] * b) % p
        cur = pw
    _roll_powers_by_base[base] = cur
    return cur


def rolling_fingerprint_batch(text, base: int = ROLL_BASE) -> np.ndarray:
    """Vectorized over the WHOLE batch in one pass: all strings are joined
    and encoded once, per-position terms c_i * B^(pos-from-end) mod p are
    computed for every character at once, and per-string hashes fall out
    of a single segment-reduce — no per-string Python overhead.  Each term
    < 2^31; products < 2^52 fit uint64 exactly; per-string sums stay
    < 2^31 * len, safe to 2^33 chars."""
    strings = list(text)
    n = len(strings)
    out = np.zeros(n, np.int64)
    if n == 0:
        return out
    lens = np.fromiter((len(s) for s in strings), np.int64, count=n)
    total = int(lens.sum())
    if total == 0:
        return out
    codes = np.frombuffer("".join(strings).encode("utf-32-le"), np.uint32).astype(
        np.uint64
    )
    ends = np.cumsum(lens)
    starts = ends - lens
    owner = np.repeat(np.arange(n), lens)
    pos_from_end = (ends[owner] - 1) - np.arange(total)
    pw = _roll_powers_upto(int(lens.max()), base)[pos_from_end]
    terms = (codes * pw) % np.uint64(ROLL_MOD)
    nonempty = lens > 0
    sums = np.add.reduceat(terms, starts[nonempty])
    out[nonempty] = (sums % np.uint64(ROLL_MOD)).astype(np.int64)
    return out


def rolling_fingerprint_sql(expr: str, base: int = ROLL_BASE) -> str:
    """DuckDB equivalent: Horner fold via list_reduce over code points.
    Exact integer parity with the engine (all intermediates < 2^51)."""
    return (
        f"CASE WHEN length({expr}) = 0 THEN CAST(0 AS BIGINT) ELSE "
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(regexp_split_to_array({expr}, ''), x -> CAST(ord(x) AS BIGINT))), "
        f"(h, c) -> (h * {base} + c) % {ROLL_MOD}) END"
    )
