"""Standardization grammar + scoring function tests, incl. SQL parity."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from geocoding_toolbox_ray.functions import scoring, standardize


def _lit(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


# -------------------------------------------------------- standardization

def test_reference_mock_pair():
    # tests/test_geocode.py:115-116 pins '123 S MAIN' <-> '123 south main'
    assert standardize.standardize("123 S MAIN") == "123 south main"


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("259 W MAIN", "259 west main"),
        ("39 N SR 6", "39 north state route 6"),
        ("677 N SR 6", "677 north state route 6"),
        ("123 E 400 S", "123 east 400 south"),
        ("10 Main St", "10 main street"),
        ("fasf", "fasf"),
    ],
)
def test_standardize(raw, expected):
    assert standardize.standardize(raw) == expected


def test_standardize_arrow_parity():
    inputs = ["259 W MAIN", "39 N SR 6", "123 E 400 S", "10 Main St", "fasf", ""]
    got = standardize.standardize_arrow(pa.array(inputs)).to_pylist()
    assert got == [standardize.standardize(s) for s in inputs]


def test_standardize_sql_parity():
    con = duckdb.connect()
    for s in ["259 W MAIN", "39 N SR 6", "123 E 400 S", "10 Main St", "fasf", ""]:
        got = con.execute("SELECT " + standardize.standardize_sql(_lit(s))).fetchone()[0]
        assert got == standardize.standardize(s), s


def test_strip_unit_scalar_arrow_sql_parity():
    cases = [
        "259 west main apt 3",
        "259 west main suite 4b",
        "10 north state route 6 unit 9",
        "259 west main",  # identity when no unit
        "ste phen street",  # 'ste' mid-string is NOT a trailing unit
        "",
    ]
    got_arrow = standardize.standardize_arrow_strip_unit(pa.array(cases)).to_pylist()
    con = duckdb.connect()
    for s, ga in zip(cases, got_arrow):
        expected = standardize.strip_unit(s)
        assert ga == expected, s
        gs = con.execute("SELECT " + standardize.strip_unit_sql(_lit(s))).fetchone()[0]
        assert gs == expected, s
    assert standardize.strip_unit("259 west main apt 3") == "259 west main"
    assert standardize.strip_unit("259 west main") == "259 west main"


def test_unit_address_matches_and_keeps_unit(ray_session):
    """A unit-bearing address must match its base locator row at score
    100 with the unit preserved in standardizedAddress."""
    import ray.data as rd

    from geocoding_toolbox_ray.config import PipelineConfig
    from geocoding_toolbox_ray.pipelines.geocode import geocode_candidates

    cands = rd.from_items(
        [
            {"primary_key": "1", "input_street": "259 W MAIN APT 3", "input_zone": "Delta"},
            {"primary_key": "2", "input_street": "259 W MAIN", "input_zone": "Delta"},
        ]
    )
    out = (
        geocode_candidates(cands, PipelineConfig(concurrency=1))
        .to_pandas()
        .set_index("primary_key")
    )
    assert out.loc["1", "score"] == 100
    assert out.loc["1", "matchAddress"] == "259 W MAIN"
    assert out.loc["1", "standardizedAddress"] == "259 west main apt 3"
    assert out.loc["1", "x"] == out.loc["2", "x"]
    assert out.loc["2", "standardizedAddress"] == "259 west main"


def test_match_key_scalar_arrow_sql_parity():
    """Fraction strip + unit-range strip — three-way parity like strip_unit."""
    cases = [
        "39 1 2 north main",             # fractional house -> "39 north main"
        "5 east highway 40 ste 100 110", # unit RANGE tail strips
        "259 west main apt 3",           # plain unit still strips
        "3 north us highway 89",         # identity (no fraction, no unit)
        "1 2 3",                         # NOT a fraction shape
        "",
        # intersection reorder (round-5 grammar depth)
        "main street and 200 south",     # -> "200 south and main street"
        "200 and main",                  # already canonical (identity)
        "state and state route 6",       # canonical (prefix order)
        "state route 6 and state",       # -> swapped
        "main and main",                 # equal sides (identity)
        "a and b and c",                 # first-" and "-split, a <= rest
    ]
    got_arrow = standardize.match_key_arrow(pa.array(cases)).to_pylist()
    con = duckdb.connect()
    for s, ga in zip(cases, got_arrow):
        expected = standardize.match_key(s)
        assert ga == expected, s
        gs = con.execute("SELECT " + standardize.match_key_sql(_lit(s))).fetchone()[0]
        assert gs == expected, s
    assert standardize.match_key("39 1 2 north main") == "39 north main"
    assert standardize.match_key("5 east highway 40 ste 100 110") == "5 east highway 40"
    assert (
        standardize.match_key("main street and 200 south")
        == "200 south and main street"
    )
    assert standardize.match_key("200 and main") == "200 and main"


def test_highway_aliases_standardize():
    assert standardize.standardize("3 N US 89") == "3 north us highway 89"
    # hyphen removed by cleansing upstream; 'sr' expands as before
    assert standardize.standardize("7 W SR 6") == "7 west state route 6"
    assert standardize.standardize("9 S HWY 40") == "9 south highway 40"


def test_highway_fraction_unit_range_match(ray_session):
    """Round-4 grammar depth end to end: fractional house and unit range
    match the base locator row at score 100; standardizedAddress keeps
    the fraction / range text."""
    import ray.data as rd

    from geocoding_toolbox_ray.config import PipelineConfig
    from geocoding_toolbox_ray.pipelines.geocode import build_index_ref, geocode_candidates
    from geocoding_toolbox_ray.sources.synthetic import address_points_table

    index_ref = build_index_ref(
        "all", address_points=address_points_table(include_highways=True)
    )
    cands = rd.from_items(
        [
            {"primary_key": "1", "input_street": "259 1/2 W MAIN", "input_zone": "Delta"},
            {"primary_key": "2", "input_street": "259 W MAIN", "input_zone": "Delta"},
            {"primary_key": "3", "input_street": "1 S US 89", "input_zone": "Delta"},
            {"primary_key": "4", "input_street": "2 E HWY 40 STE 100-110", "input_zone": "Delta"},
            {"primary_key": "5", "input_street": "39 N SR-6", "input_zone": "Delta"},
        ]
    )
    out = (
        geocode_candidates(cands, PipelineConfig(concurrency=1), index_ref=index_ref)
        .to_pandas()
        .set_index("primary_key")
    )
    assert out.loc["1", "score"] == 100
    assert out.loc["1", "standardizedAddress"] == "259 1 2 west main"
    assert out.loc["1", "x"] == out.loc["2", "x"]
    assert out.loc["3", "score"] == 100
    assert out.loc["3", "matchAddress"] == "1 S US 89"
    assert out.loc["3", "locator"] == "RoadCenterlines"
    assert out.loc["4", "score"] == 100
    assert out.loc["4", "standardizedAddress"] == "2 east highway 40 ste 100 110"
    assert out.loc["4", "matchAddress"] == "2 E HWY 40"
    assert out.loc["5", "score"] == 100  # hyphenated SR-6 == existing SR 6 row


def test_parse_components():
    c = standardize.parse_components("123 south main street")
    assert c["house"] == "123"
    assert c["prefix_dir"] == "south"
    assert c["name"] == "main"
    assert c["street_type"] == "street"

    c = standardize.parse_components("39 north state route 6")
    assert c["house"] == "39"
    assert c["prefix_dir"] == "north"

    c = standardize.parse_components("123 east 400 south")
    assert c["house"] == "123"
    assert c["prefix_dir"] == "east"
    assert c["suffix_dir"] == "south"


def test_parse_components_arrow_matches_scalar():
    inputs = ["123 south main street", "39 north state route 6", "fasf", ""]
    arr = standardize.parse_components_arrow(pa.array(inputs))
    for i, s in enumerate(inputs):
        expect = standardize.parse_components(s)
        got = {k: (arr.field(k)[i].as_py() or "") for k in expect}
        assert got == expect, s


# ---------------------------------------------------------------- scoring

@pytest.mark.parametrize(
    "a,b,lev",
    [
        ("", "", 0),
        ("abc", "abc", 0),
        ("abc", "abd", 1),
        ("kitten", "sitting", 3),
        ("abc", "", 3),
        ("", "xy", 2),
        ("flaw", "lawn", 2),
        ("123 south main", "123 south maine", 1),
    ],
)
def test_levenshtein_known(a, b, lev):
    got = scoring.levenshtein_batch(np.array([a], object), np.array([b], object))
    assert got[0] == lev


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.text("abcdef 0123", max_size=12), st.text("abcdef 0123", max_size=12)),
        min_size=1,
        max_size=20,
    )
)
def test_levenshtein_batch_matches_reference_dp(pairs):
    def ref_lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    a = np.array([p[0] for p in pairs], object)
    b = np.array([p[1] for p in pairs], object)
    got = scoring.levenshtein_batch(a, b)
    expect = [ref_lev(*p) for p in pairs]
    assert got.tolist() == expect


def test_score_exact_is_100():
    assert scoring.score("123 south main", "123 south main") == 100


def test_score_sql_parity():
    con = duckdb.connect()
    cases = [
        ("123 south main", "123 south maine"),
        ("39 north state route 6", "39 north state route 66"),
        ("fasf", "123 south main"),
        ("", "x"),
        ("abc", "abc"),
    ]
    for a, b in cases:
        sql = "SELECT " + scoring.score_sql(_lit(a), _lit(b))
        got = con.execute(sql).fetchone()[0]
        assert got == scoring.score(a, b), (a, b)


def test_parse_components_unit():
    c = standardize.parse_components("123 south main street apt 4")
    assert c["house"] == "123"
    assert c["name"] == "main"
    assert c["street_type"] == "street"
    assert c["unit"] == "4"

    c = standardize.parse_components("9 west center suite 2b")
    assert c["unit"] == "2b"

    c = standardize.parse_components("123 south main")
    assert c["unit"] == ""
