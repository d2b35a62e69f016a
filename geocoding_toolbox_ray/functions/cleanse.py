"""Address cleansing — byte-identical to the reference.

Reference semantics (``/root/reference/src/agrcgeocoding/geocode.py:40-62``):

``_cleanse_street`` (geocode.py:40-50):
    1. ``&`` -> ``and``            (geocode.py:46, ``chr(38)``)
    2. ``[^a-zA-Z0-9]`` -> `` ``   (geocode.py:47, ALLOWABLE_CHARS at :30)
    3. `` +`` -> `` ``             (geocode.py:48, SPACES at :29)
    4. strip

``_cleanse_zone`` (geocode.py:53-62):
    1. ``str(data)`` coercion      (geocode.py:56)
    2. steps 2-4 above (no ``&`` -> ``and``)
    3. if result starts with ``'8'`` keep only the first 5 chars
       (ZIP+4 -> ZIP5, geocode.py:59-60)

The parametrized reference tests (``tests/test_geocode.py:18-33``) pin the
exact outputs; ``tests/test_cleanse.py`` ports them verbatim.

Implemented three ways from one spec: scalar (tests / row fallback),
vectorized pyarrow.compute (the hot path inside ``map_batches``), and a SQL
expression builder (the DuckDB oracle).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

_NON_ALNUM = "[^a-zA-Z0-9]"
_MULTI_SPACE = " +"
_NON_ALNUM_RE = re.compile(_NON_ALNUM)
_MULTI_SPACE_RE = re.compile(_MULTI_SPACE)


# ---------------------------------------------------------------- scalar

def cleanse_street(data: str) -> str:
    """Scalar form; mirrors geocode.py:40-50 exactly."""
    street = data.replace("&", "and")
    street = _NON_ALNUM_RE.sub(" ", street)
    street = _MULTI_SPACE_RE.sub(" ", street)
    return street.strip()


def cleanse_zone(data) -> str:
    """Scalar form; mirrors geocode.py:53-62 exactly (incl. str() coercion)."""
    zone = _NON_ALNUM_RE.sub(" ", str(data))
    zone = _MULTI_SPACE_RE.sub(" ", zone).strip()
    if len(zone) > 0 and zone[0] == "8":
        zone = zone.strip()[:5]
    return zone


# ------------------------------------------------------------- vectorized

def cleanse_street_arrow(col: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Vectorized street cleanse over an Arrow string column (zero-copy in)."""
    out = pc.replace_substring(col, pattern="&", replacement="and")
    out = pc.replace_substring_regex(out, pattern=_NON_ALNUM, replacement=" ")
    out = pc.replace_substring_regex(out, pattern=_MULTI_SPACE, replacement=" ")
    return pc.utf8_trim(out, characters=" ")


def cleanse_zone_arrow(col: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Vectorized zone cleanse; accepts string or integer columns."""
    if not pa.types.is_string(col.type) and not pa.types.is_large_string(col.type):
        col = pc.cast(col, pa.string())
    out = pc.replace_substring_regex(col, pattern=_NON_ALNUM, replacement=" ")
    out = pc.replace_substring_regex(out, pattern=_MULTI_SPACE, replacement=" ")
    out = pc.utf8_trim(out, characters=" ")
    starts_with_8 = pc.equal(pc.utf8_slice_codeunits(out, 0, 1), "8")
    return pc.if_else(starts_with_8, pc.utf8_slice_codeunits(out, 0, 5), out)


# -------------------------------------------------------------------- sql

def cleanse_street_sql(expr: str) -> str:
    """DuckDB expression computing cleanse_street(expr) identically."""
    return (
        "trim(regexp_replace(regexp_replace(replace({e}, '&', 'and'), "
        "'{na}', ' ', 'g'), '{ms}', ' ', 'g'))"
    ).format(e=expr, na=_NON_ALNUM, ms=_MULTI_SPACE)


def cleanse_zone_sql(expr: str) -> str:
    """DuckDB expression computing cleanse_zone(expr) identically."""
    trimmed = (
        "trim(regexp_replace(regexp_replace(CAST({e} AS VARCHAR), "
        "'{na}', ' ', 'g'), '{ms}', ' ', 'g'))"
    ).format(e=expr, na=_NON_ALNUM, ms=_MULTI_SPACE)
    return (
        "CASE WHEN substr({t}, 1, 1) = '8' THEN substr({t}, 1, 5) ELSE {t} END"
    ).format(t=trimmed)
