"""Deterministic candidate-address derivation from the ``orders`` table.

The driver's correctness gate runs our Ray pipelines against DuckDB SQL
over the same registered parquet views (region..embeddings) — the pages
corpus is not among them.  So the oracle-checked geocode query derives its
``(primary_key, street, zone)`` candidate rows from ``orders`` with pure
integer arithmetic, reproduced verbatim in SQL by ``derive_sql()``:

    i      = o_orderkey
    house  = 1 + i % 12                  (reference houses are 1..10)
    dir    = NSEW[(1 + i % 12) % 4]      (the fixture's house->direction rule)
             except every 5th row uses NSEW[i % 4]  (wrong dir -> fuzzy tier)
    name   = STREETS6[(i // 4) % 6]      (incl. 'fasf' garbage -> error rows)
    street = house dir name, wrapped in cleansing noise by i % 3
    zone   = ZONES6[(i // 3) % 6]        (city, ZIP+4, '&' city, ZIP, empty)

This exercises every tier: exact hits, fuzzy accepts, below-threshold
error rows, empty/unknown zones, and all cleansing branches
(geocode.py:40-62 semantics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

NSEW = ("N", "S", "E", "W")
STREETS6 = ("MAIN", "STATE", "CENTER", "SR 6", "200", "fasf")
ZONES6 = ("Delta", "84624-1234", "salt & lake city", "84101", "", "Moab")


def derive_candidates(batch: pa.Table) -> pa.Table:
    """map_batches body: orders batch (o_orderkey) -> candidate rows."""
    i = np.asarray(batch["o_orderkey"].to_numpy(zero_copy_only=False), np.int64)
    house = 1 + i % 12
    dir_idx = np.where(i % 5 == 0, i % 4, house % 4)
    dirs = np.array(NSEW, object)[dir_idx]
    names = np.array(STREETS6, object)[(i // 4) % 6]
    base = (
        pd.Series(house).astype(str) + " " + pd.Series(dirs) + " " + pd.Series(names)
    )
    noise = i % 3
    street = base.copy()
    street[noise == 1] = "  " + base[noise == 1] + "  "
    street[noise == 2] = base[noise == 2] + "$%#"
    zone = pd.Series(np.array(ZONES6, object)[(i // 3) % 6])
    return pa.table(
        {
            "primary_key": pa.array(i.astype(str), pa.string()),
            "input_street": pa.array(street, pa.string()),
            "input_zone": pa.array(zone, pa.string()),
        }
    )


def derive_sql() -> str:
    """SELECT producing the identical candidate rows from the ``orders`` view."""
    def _case(expr: str, options: tuple[str, ...]) -> str:
        whens = " ".join(
            f"WHEN {k} THEN '{v.replace(chr(39), chr(39) * 2)}'" for k, v in enumerate(options)
        )
        return f"CASE {expr} {whens} END"

    dir_case = (
        "CASE WHEN o_orderkey % 5 = 0 THEN "
        + _case("o_orderkey % 4", NSEW)
        + " ELSE "
        + _case("(1 + o_orderkey % 12) % 4", NSEW)
        + " END"
    )
    base = (
        "CAST(1 + o_orderkey % 12 AS VARCHAR) || ' ' || "
        + dir_case
        + " || ' ' || "
        + _case("(o_orderkey // 4) % 6", STREETS6)
    )
    street = (
        "CASE o_orderkey % 3 WHEN 1 THEN '  ' || ({b}) || '  ' "
        "WHEN 2 THEN ({b}) || '$%#' ELSE ({b}) END"
    ).format(b=base)
    zone = _case("(o_orderkey // 3) % 6", ZONES6)
    return (
        "SELECT CAST(o_orderkey AS VARCHAR) AS primary_key, "
        f"{street} AS input_street, {zone} AS input_zone FROM orders"
    )


UNIT_DESIGNATORS = ("APT", "UNIT", "SUITE", "STE")


def derive_units_candidates(batch: pa.Table) -> pa.Table:
    """Unit/suite-bearing candidate rows (round-3 grammar depth): the same
    house/dir/name base as ``derive_candidates`` with a deterministic
    trailing unit designator on every even row — these must match the
    SAME locator rows as their unitless twins (the match key strips the
    unit) while ``standardizedAddress`` keeps the unit text."""
    i = np.asarray(batch["o_orderkey"].to_numpy(zero_copy_only=False), np.int64)
    house = 1 + i % 12
    dir_idx = np.where(i % 5 == 0, i % 4, house % 4)
    dirs = np.array(NSEW, object)[dir_idx]
    names = np.array(STREETS6, object)[(i // 4) % 6]
    base = (
        pd.Series(house).astype(str) + " " + pd.Series(dirs) + " " + pd.Series(names)
    )
    unit_word = pd.Series(np.array(UNIT_DESIGNATORS, object)[(i // 2) % 4])
    unit = unit_word + " " + pd.Series(1 + i % 9).astype(str)
    street = base.where(i % 2 == 1, base + " " + unit)
    zone = pd.Series(np.array(ZONES6, object)[(i // 3) % 6])
    return pa.table(
        {
            "primary_key": pa.array(i.astype(str), pa.string()),
            "input_street": pa.array(street, pa.string()),
            "input_zone": pa.array(zone, pa.string()),
        }
    )


def derive_units_sql() -> str:
    def _case(expr: str, options: tuple[str, ...]) -> str:
        whens = " ".join(
            f"WHEN {k} THEN '{v.replace(chr(39), chr(39) * 2)}'" for k, v in enumerate(options)
        )
        return f"CASE {expr} {whens} END"

    dir_case = (
        "CASE WHEN o_orderkey % 5 = 0 THEN "
        + _case("o_orderkey % 4", NSEW)
        + " ELSE "
        + _case("(1 + o_orderkey % 12) % 4", NSEW)
        + " END"
    )
    base = (
        "CAST(1 + o_orderkey % 12 AS VARCHAR) || ' ' || "
        + dir_case
        + " || ' ' || "
        + _case("(o_orderkey // 4) % 6", STREETS6)
    )
    unit = (
        _case("(o_orderkey // 2) % 4", UNIT_DESIGNATORS)
        + " || ' ' || CAST(1 + o_orderkey % 9 AS VARCHAR)"
    )
    street = (
        f"CASE WHEN o_orderkey % 2 = 1 THEN ({base}) "
        f"ELSE ({base}) || ' ' || ({unit}) END"
    )
    zone = _case("(o_orderkey // 3) % 6", ZONES6)
    return (
        "SELECT CAST(o_orderkey AS VARCHAR) AS primary_key, "
        f"{street} AS input_street, {zone} AS input_zone FROM orders"
    )


def derive_highway_candidates(batch: pa.Table) -> pa.Table:
    """Round-4 grammar-depth candidate rows, cycling four shapes by
    ``o_orderkey % 4``:

      0: ``{h} {d} US 89``                  (highway alias -> 'us highway 89')
      1: ``{h} {d} SR-6``                   (hyphenated state route -> 'SR 6')
      2: ``{h} 1/2 {d} MAIN``               (fractional house number)
      3: ``{h} {d} HWY 40 STE {u}00-{u}10`` (highway + secondary-unit range)

    Houses 1..12 with the base fixture's direction rule (wrong direction
    every 5th row -> fuzzy tier), so every shape exercises exact, fuzzy
    and the match-key strips.  SQL twin: ``derive_highways_sql``."""
    i = np.asarray(batch["o_orderkey"].to_numpy(zero_copy_only=False), np.int64)
    house = 1 + i % 12
    dir_idx = np.where(i % 5 == 0, i % 4, house % 4)
    dirs = pd.Series(np.array(NSEW, object)[dir_idx])
    h = pd.Series(house).astype(str)
    u = pd.Series(1 + i % 9).astype(str)
    form = i % 4
    street = pd.Series(np.empty(len(i), object))
    street[form == 0] = h + " " + dirs + " US 89"
    street[form == 1] = h + " " + dirs + " SR-6"
    street[form == 2] = h + " 1/2 " + dirs + " MAIN"
    street[form == 3] = h + " " + dirs + " HWY 40 STE " + u + "00-" + u + "10"
    zone = pd.Series(np.array(ZONES6, object)[(i // 3) % 6])
    return pa.table(
        {
            "primary_key": pa.array(i.astype(str), pa.string()),
            "input_street": pa.array(street, pa.string()),
            "input_zone": pa.array(zone, pa.string()),
        }
    )


def derive_highways_sql() -> str:
    def _case(expr: str, options: tuple[str, ...]) -> str:
        whens = " ".join(
            f"WHEN {k} THEN '{v.replace(chr(39), chr(39) * 2)}'" for k, v in enumerate(options)
        )
        return f"CASE {expr} {whens} END"

    dir_case = (
        "CASE WHEN o_orderkey % 5 = 0 THEN "
        + _case("o_orderkey % 4", NSEW)
        + " ELSE "
        + _case("(1 + o_orderkey % 12) % 4", NSEW)
        + " END"
    )
    h = "CAST(1 + o_orderkey % 12 AS VARCHAR)"
    u = "CAST(1 + o_orderkey % 9 AS VARCHAR)"
    street = (
        f"CASE o_orderkey % 4 "
        f"WHEN 0 THEN {h} || ' ' || ({dir_case}) || ' US 89' "
        f"WHEN 1 THEN {h} || ' ' || ({dir_case}) || ' SR-6' "
        f"WHEN 2 THEN {h} || ' 1/2 ' || ({dir_case}) || ' MAIN' "
        f"ELSE {h} || ' ' || ({dir_case}) || ' HWY 40 STE ' || {u} || '00-' || {u} || '10' "
        f"END"
    )
    zone = _case("(o_orderkey // 3) % 6", ZONES6)
    return (
        "SELECT CAST(o_orderkey AS VARCHAR) AS primary_key, "
        f"{street} AS input_street, {zone} AS input_zone FROM orders"
    )


def derive_pobox_candidates(batch: pa.Table) -> pa.Table:
    """PO Box candidate rows: 'PO Box {1 + i%8}' (reference points hold
    boxes 1..5, so 6..8 exercise the fuzzy tier)."""
    i = np.asarray(batch["o_orderkey"].to_numpy(zero_copy_only=False), np.int64)
    street = "PO Box " + pd.Series(1 + i % 8).astype(str)
    zone = pd.Series(np.array(ZONES6, object)[(i // 3) % 6])
    return pa.table(
        {
            "primary_key": pa.array(i.astype(str), pa.string()),
            "input_street": pa.array(street, pa.string()),
            "input_zone": pa.array(zone, pa.string()),
        }
    )


def derive_pobox_sql() -> str:
    def _case(expr: str, options: tuple[str, ...]) -> str:
        whens = " ".join(
            f"WHEN {k} THEN '{v.replace(chr(39), chr(39) * 2)}'" for k, v in enumerate(options)
        )
        return f"CASE {expr} {whens} END"

    zone = _case("(o_orderkey // 3) % 6", ZONES6)
    return (
        "SELECT CAST(o_orderkey AS VARCHAR) AS primary_key, "
        "'PO Box ' || CAST(1 + o_orderkey % 8 AS VARCHAR) AS input_street, "
        f"{zone} AS input_zone FROM orders"
    )


def derive_intersection_candidates(batch: pa.Table) -> pa.Table:
    """Intersection candidate rows (round-5 grammar depth): street pairs
    joined by ``&`` or the literal ``and`` — the one common Utah address
    shape the base grammar didn't parse ("MAIN ST & 200 S"; the
    reference's cleanse maps ``&`` -> ``and``, geocode.py:46, and the
    API-side standardizer handled the rest).

    Side A = STREETS6[(i//4) % 6] (incl. the 'fasf' garbage -> error
    rows), side B = STREETS6 at a nonzero offset (1 + i%4, never == A).
    Sides appear in DERIVATION order — roughly half the rows present the
    pair in the non-canonical order, exercising the match-key reorder.
    Separator alternates '&' / 'and'; the usual i%3 cleansing noise wraps
    the whole string.  SQL twin: ``derive_intersections_sql``."""
    i = np.asarray(batch["o_orderkey"].to_numpy(zero_copy_only=False), np.int64)
    a_idx = (i // 4) % 6
    b_idx = (a_idx + 1 + i % 4) % 6
    name_a = pd.Series(np.array(STREETS6, object)[a_idx])
    name_b = pd.Series(np.array(STREETS6, object)[b_idx])
    sep = pd.Series(np.where(i % 2 == 0, " & ", " and "))
    base = name_a + sep + name_b
    noise = i % 3
    street = base.copy()
    street[noise == 1] = "  " + base[noise == 1] + "  "
    street[noise == 2] = base[noise == 2] + "$%#"
    zone = pd.Series(np.array(ZONES6, object)[(i // 3) % 6])
    return pa.table(
        {
            "primary_key": pa.array(i.astype(str), pa.string()),
            "input_street": pa.array(street, pa.string()),
            "input_zone": pa.array(zone, pa.string()),
        }
    )


def derive_intersections_sql() -> str:
    def _case(expr: str, options: tuple[str, ...]) -> str:
        whens = " ".join(
            f"WHEN {k} THEN '{v.replace(chr(39), chr(39) * 2)}'" for k, v in enumerate(options)
        )
        return f"CASE {expr} {whens} END"

    name_a = _case("(o_orderkey // 4) % 6", STREETS6)
    name_b = _case("((o_orderkey // 4) % 6 + 1 + o_orderkey % 4) % 6", STREETS6)
    sep = "CASE WHEN o_orderkey % 2 = 0 THEN ' & ' ELSE ' and ' END"
    base = f"({name_a}) || ({sep}) || ({name_b})"
    street = (
        "CASE o_orderkey % 3 WHEN 1 THEN '  ' || ({b}) || '  ' "
        "WHEN 2 THEN ({b}) || '$%#' ELSE ({b}) END"
    ).format(b=base)
    zone = _case("(o_orderkey // 3) % 6", ZONES6)
    return (
        "SELECT CAST(o_orderkey AS VARCHAR) AS primary_key, "
        f"{street} AS input_street, {zone} AS input_zone FROM orders"
    )
