"""Text-analysis kernels for the training-data pipeline operators:
token counting, language-ID heuristic, quality scoring, fingerprinting.

Same contract as the other function modules: vectorized kernel + SQL
builder from one table of constants, so DuckDB oracles are mechanical.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

TOKEN_PATTERN = r"\S+"

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

def token_count(text: pd.Series) -> np.ndarray:
    return text.str.count(TOKEN_PATTERN).to_numpy(np.int64)


def stopword_counts(text: pd.Series) -> dict[str, np.ndarray]:
    lower = text.str.lower()
    return {lang: lower.str.count(_stop_regex(lang)).to_numpy(np.int64) for lang in LANGS}


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


def quality_features(text: pd.Series) -> dict[str, np.ndarray]:
    n_chars = text.str.len().to_numpy(np.int64)
    n_tokens = token_count(text)
    n_stop = stopword_counts(text)["en"]
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


_ROLL_BASE = np.uint64(1000003)
_ROLL_MOD = np.uint64((1 << 61) - 1)


def rolling_fingerprint(text: str) -> int:
    """Rabin-Karp-style polynomial rolling hash over the UTF-8 bytes
    (int64; deterministic, mergeable per chunk by h_ab = h_a*B^len(b)+h_b)."""
    h = np.uint64(0)
    for b in text.encode("utf-8"):
        h = (h * _ROLL_BASE + np.uint64(b)) % _ROLL_MOD
    return int(h)


def rolling_fingerprint_batch(text: pd.Series) -> np.ndarray:
    """Vectorized over the batch: per-doc numpy Horner evaluation."""
    out = np.empty(len(text), np.int64)
    for i, s in enumerate(text):
        data = np.frombuffer(s.encode("utf-8"), np.uint8).astype(np.uint64)
        h = np.uint64(0)
        for chunk_start in range(0, len(data), 4096):
            chunk = data[chunk_start : chunk_start + 4096]
            for b in chunk:  # Horner; dominated by crc-class cost, fine per batch
                h = (h * _ROLL_BASE + b) % _ROLL_MOD
        out[i] = np.int64(h)
    return out
