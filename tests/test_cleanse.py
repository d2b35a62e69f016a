"""Verbatim ports of the reference cleansing tests
(/root/reference/tests/test_geocode.py:18-33), plus Arrow-kernel and
DuckDB-SQL parity checks so all three implementations stay byte-identical.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pytest

from geocoding_toolbox_ray.functions import cleanse

STREET_CASES = [
    ("main & state", "main and state"),
    ("  123 main street", "123 main street"),
    ("123      main street", "123 main street"),
    ("123 main street    ", "123 main street"),
    ("123 main$%# street", "123 main street"),
]

ZONE_CASES = [
    (84124, "84124"),
    ("84124   ", "84124"),
    ("   84124", "84124"),
    ("84124-1234", "84124"),
    ("salt & lake city", "salt lake city"),
]


@pytest.mark.parametrize("data,expected", STREET_CASES)
def test_cleanse_street(data, expected):
    assert cleanse.cleanse_street(data) == expected


@pytest.mark.parametrize("data,expected", ZONE_CASES)
def test_cleanse_zone(data, expected):
    assert cleanse.cleanse_zone(data) == expected


def test_cleanse_street_arrow_parity():
    inputs = [c[0] for c in STREET_CASES] + ["", "a&b", "   ", "39 N SR-6 #2"]
    got = cleanse.cleanse_street_arrow(pa.array(inputs)).to_pylist()
    assert got == [cleanse.cleanse_street(s) for s in inputs]


def test_cleanse_zone_arrow_parity_strings():
    inputs = [c[0] for c in ZONE_CASES if isinstance(c[0], str)] + ["", "8", "84-1-2-3-4-5", "Town"]
    got = cleanse.cleanse_zone_arrow(pa.array(inputs)).to_pylist()
    assert got == [cleanse.cleanse_zone(s) for s in inputs]


def test_cleanse_zone_arrow_parity_ints():
    inputs = [84124, 84101, 801234567, 7]
    got = cleanse.cleanse_zone_arrow(pa.array(inputs, pa.int64())).to_pylist()
    assert got == [cleanse.cleanse_zone(i) for i in inputs]


def _lit(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def test_cleanse_sql_parity():
    con = duckdb.connect()
    streets = [c[0] for c in STREET_CASES] + ["a&b & c", "  x  ", "39 N SR-6"]
    zones = [str(c[0]) for c in ZONE_CASES] + ["", "8", "84-1-2-3-4-5", "Town", "801234567"]
    for s in streets:
        got = con.execute("SELECT " + cleanse.cleanse_street_sql(_lit(s))).fetchone()[0]
        assert got == cleanse.cleanse_street(s), s
    for z in zones:
        got = con.execute("SELECT " + cleanse.cleanse_zone_sql(_lit(z))).fetchone()[0]
        assert got == cleanse.cleanse_zone(z), z


def test_three_way_parity_fuzz():
    """Python / Arrow / DuckDB cleanse+standardize agree on hostile inputs
    (unicode, control chars, regex metacharacters) — fixed-seed fuzz."""
    import random
    import string

    from geocoding_toolbox_ray.functions import standardize

    con = duckdb.connect()
    rng = random.Random(7)
    alphabet = string.printable + "éüñ漢字\\"
    for _ in range(500):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 25)))
        py = cleanse.cleanse_street(s)
        ar = cleanse.cleanse_street_arrow(pa.array([s])).to_pylist()[0]
        sql = con.execute("SELECT " + cleanse.cleanse_street_sql(_lit(s))).fetchone()[0]
        assert py == ar == sql, repr(s)
        st_py = standardize.standardize(py)
        st_ar = standardize.standardize_arrow(pa.array([py])).to_pylist()[0]
        st_sql = con.execute("SELECT " + standardize.standardize_sql(_lit(py))).fetchone()[0]
        assert st_py == st_ar == st_sql, repr(py)
