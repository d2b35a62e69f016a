"""URL canonicalization (webtext ingest normalization).

The canonical form every crawl pipeline needs before host/url dedup:
lowercase scheme+host, strip the default :443 port, drop the fragment,
remove ``utm_*`` tracking params, tidy a dangling ``?``/``&``.

All patterns are RE2-compatible (no lookaround) and are applied by BOTH
the engine kernel (``pyarrow.compute.replace_substring_regex``) and the
DuckDB oracle (``regexp_replace(..., 'g')``) — one constant per rule, so
the two sides cannot drift.

The messy-URL fixture is a pure function of an integer index (same
philosophy as sources/pages.py): deterministic scheme/host casing, a
default port, tracking params and a fragment, replicated in SQL by
``messy_url_expr``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: rule order matters: fragment first (so '#' never hides a param), then
#: tracking params, dangling separator, default port, case-fold prefix.
URL_FRAG_RE = r"#.*$"
URL_UTM_RE = (r"([?&])utm_[^&#]*&?", r"\1")
URL_TIDY_RE = r"[?&]$"
URL_PORT_RE = (r"^([A-Za-z][A-Za-z0-9+.-]*://[^/:?#]*):443([/?#])", r"\1\2")
URL_PORT_END_RE = r":443$"
#: split into (scheme://host[:port], rest) — prefix is case-folded, the
#: path/query stays case-sensitive per RFC 3986
URL_SPLIT_RE = r"^([^/]*//[^/?#]*)(.*)$"


def canonicalize_urls(urls: pa.Array) -> pa.Array:
    """Vectorized RE2 canonicalization (zero Python per row)."""
    u = urls
    u = pc.replace_substring_regex(u, pattern=URL_FRAG_RE, replacement="")
    u = pc.replace_substring_regex(u, pattern=URL_UTM_RE[0], replacement=URL_UTM_RE[1])
    u = pc.replace_substring_regex(u, pattern=URL_TIDY_RE, replacement="")
    u = pc.replace_substring_regex(u, pattern=URL_PORT_RE[0], replacement=URL_PORT_RE[1])
    u = pc.replace_substring_regex(u, pattern=URL_PORT_END_RE, replacement="")
    prefix = pc.replace_substring_regex(u, pattern=URL_SPLIT_RE, replacement=r"\1")
    rest = pc.replace_substring_regex(u, pattern=URL_SPLIT_RE, replacement=r"\2")
    return pc.binary_join_element_wise(pc.utf8_lower(prefix), rest, "")


def messy_urls(idx: np.ndarray) -> np.ndarray:
    """Deterministic messy URLs for integer indices (fixture generator)."""
    idx = np.asarray(idx, np.int64)
    scheme = np.where(idx % 2 == 0, "HTTPS", "https").astype(object)
    host = np.array([f"site{int(i) % 1000}.example.ut.us" for i in idx], object)
    host = np.where(idx % 3 == 0, [h.upper() for h in host], host).astype(object)
    port = np.where(idx % 5 == 0, ":443", "").astype(object)
    path = np.array([f"/page/{int(i)}" for i in idx], object)
    qmod = idx % 4
    query = np.array(
        [
            f"?utm_source=feed&id={int(i) % 50}"
            if m == 0
            else (f"?id={int(i) % 50}&utm_campaign=x" if m == 2 else "")
            for i, m in zip(idx, qmod)
        ],
        object,
    )
    frag = np.where(idx % 7 == 0, "#frag", "").astype(object)
    return scheme + np.array(["://"], object) + host + port + path + query + frag


def messy_url_expr(i: str = "i") -> str:
    """The SAME messy-URL fixture as a DuckDB SQL expression over index ``i``."""
    return (
        f"(CASE WHEN {i} % 2 = 0 THEN 'HTTPS' ELSE 'https' END) || '://' || "
        f"(CASE WHEN {i} % 3 = 0 "
        f"THEN upper('site' || CAST({i} % 1000 AS VARCHAR) || '.example.ut.us') "
        f"ELSE 'site' || CAST({i} % 1000 AS VARCHAR) || '.example.ut.us' END) || "
        f"(CASE WHEN {i} % 5 = 0 THEN ':443' ELSE '' END) || "
        f"'/page/' || CAST({i} AS VARCHAR) || "
        f"(CASE {i} % 4 WHEN 0 THEN '?utm_source=feed&id=' || CAST({i} % 50 AS VARCHAR) "
        f"WHEN 2 THEN '?id=' || CAST({i} % 50 AS VARCHAR) || '&utm_campaign=x' "
        f"ELSE '' END) || "
        f"(CASE WHEN {i} % 7 = 0 THEN '#frag' ELSE '' END)"
    )


def canonicalize_url_sql(expr: str) -> str:
    """The engine's rule chain as nested DuckDB regexp_replace calls."""
    u = expr
    u = f"regexp_replace({u}, '{URL_FRAG_RE}', '', 'g')"
    u = f"regexp_replace({u}, '{URL_UTM_RE[0]}', '{URL_UTM_RE[1]}', 'g')"
    u = f"regexp_replace({u}, '{URL_TIDY_RE}', '', 'g')"
    u = f"regexp_replace({u}, '{URL_PORT_RE[0]}', '{URL_PORT_RE[1]}', 'g')"
    u = f"regexp_replace({u}, '{URL_PORT_END_RE}', '', 'g')"
    return (
        f"lower(regexp_replace({u}, '{URL_SPLIT_RE}', '\\1', 'g')) || "
        f"regexp_replace({u}, '{URL_SPLIT_RE}', '\\2', 'g')"
    )
