"""Matcher stage tests: exact tier, fuzzy tier, error rows, e2e pipeline.

Mirrors the reference's mocked e2e suite
(/root/reference/tests/test_geocode.py:88-177) with the local index in
place of requests_mock.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from geocoding_toolbox_ray.config import HEADER, PipelineConfig
from geocoding_toolbox_ray.errors import ContinuousFailThresholdExceeded
from geocoding_toolbox_ray.sources.synthetic import address_points_table
from geocoding_toolbox_ray.stages.matcher import (
    NULL_STREET_MESSAGE,
    MatcherStage,
    no_candidates_message,
)
from geocoding_toolbox_ray.state.index import GeocodeIndex
from hypothesis import given, settings
from hypothesis import strategies as st


def make_matcher(accept=70, locators="all"):
    return MatcherStage(
        GeocodeIndex.build(address_points_table(), locators=locators), accept
    )


_FUZZ_MATCHER = None


def _batch(rows):
    return pa.table(
        {
            "primary_key": [r[0] for r in rows],
            "input_street": [r[1] for r in rows],
            "input_zone": [r[2] for r in rows],
        }
    )


def test_exact_match_scores_100():
    m = make_matcher()
    out = m(_batch([("1", "1 S MAIN", "Delta")])).to_pandas()
    row = out.iloc[0]
    assert row["score"] == 100
    assert row["matchAddress"] == "1 S MAIN"
    assert row["standardizedAddress"] == "1 south main"
    assert row["addressGrid"] == "DELTA"
    assert row["message"] is None
    assert row["x"] > 0 and row["y"] > 0


def test_zip_zone_matches_like_city_zone():
    m = make_matcher()
    out = m(_batch([("1", "1 S MAIN", "Delta"), ("2", "1 S MAIN", "84624-1234")])).to_pandas()
    assert out.iloc[0]["x"] == out.iloc[1]["x"]
    assert out.iloc[1]["score"] == 100


def test_fuzzy_match_above_threshold():
    m = make_matcher()
    # '2 N MAIN' doesn't exist (house 2 is 'S'); nearest is fuzzy
    out = m(_batch([("1", "2 N MAIN", "Delta")])).to_pandas()
    row = out.iloc[0]
    assert 70 <= row["score"] < 100
    assert row["message"] is None
    assert row["matchAddress"] is not None


def test_garbage_street_is_error_row():
    m = make_matcher()
    out = m(_batch([("1", "fasf", "Delta")])).to_pandas()
    row = out.iloc[0]
    assert row["x"] == 0 and row["y"] == 0 and row["score"] == 0
    assert row["locator"] is None and row["matchAddress"] is None
    assert row["standardizedAddress"] is None and row["addressGrid"] is None
    assert row["message"] == "No address candidates found with a score of 70 or better."


def test_unknown_zone_is_error_row():
    m = make_matcher()
    out = m(_batch([("1", "1 S MAIN", "Town"), ("2", "1 S MAIN", "")])).to_pandas()
    assert (out["message"] == m.miss_message).all()


def test_null_street_reproduces_reference_exception_text():
    m = make_matcher()
    batch = pa.table(
        {
            "primary_key": ["1"],
            "input_street": pa.array([None], pa.string()),
            "input_zone": ["Delta"],
        }
    )
    out = m(batch).to_pandas()
    assert out.iloc[0]["message"] == NULL_STREET_MESSAGE
    assert out.iloc[0]["score"] == 0


def test_output_header_and_order_preserved():
    m = make_matcher()
    rows = [(str(i), s, z) for i, (s, z) in enumerate([
        ("259 W MAIN", "Delta"), ("fasf", "Delta"), ("3 W SR 6", "84624"),
        ("1 S MAIN", "salt & lake city"), ("1 N STATE", "Provo"),
    ])]
    out = m(_batch(rows)).to_pandas()
    assert list(out.columns[:11]) == list(HEADER)
    assert out["primary_key"].tolist() == [r[0] for r in rows]
    # int zone coercion (geocode.py:56)
    out2 = m(
        pa.table(
            {
                "primary_key": ["9"],
                "input_street": ["1 S MAIN"],
                "input_zone": pa.array([84624], pa.int64()),
            }
        )
    ).to_pandas()
    assert out2.iloc[0]["score"] == 100


def test_locator_selector_filters_tiers():
    m_all = make_matcher(locators="all")
    m_pts = make_matcher(locators="addressPoints")
    # 'SR 6' streets live in the RoadCenterlines tier
    b = _batch([("1", "3 W SR 6", "Delta")])
    assert m_all(b).to_pandas().iloc[0]["score"] == 100
    out = m_pts(b).to_pandas().iloc[0]
    assert out["score"] < 100  # exact hit gone; fuzzy or miss against other tier


def test_accept_score_threshold_parameter():
    strict = make_matcher(accept=100)
    out = strict(_batch([("1", "2 N MAIN", "Delta")])).to_pandas()
    assert out.iloc[0]["message"] == no_candidates_message(100)


def test_unknown_locator_raises():
    with pytest.raises(ValueError):
        GeocodeIndex.build(address_points_table(), locators="bogus")


# ------------------------------------------------------------- e2e (Ray)

def test_geocode_pages_e2e(ray_session):
    import ray.data as rd

    from geocoding_toolbox_ray.pipelines.geocode import geocode_pages
    from geocoding_toolbox_ray.sources.pages import pages_table

    pages = rd.from_arrow(pages_table(200))
    out = geocode_pages(pages, PipelineConfig(concurrency=2, batch_size=512))
    df = out.to_pandas()
    assert len(df) > 0
    assert list(df.columns[:11]) == list(HEADER)
    matched = df["message"].isna()
    assert matched.any()  # real addresses matched
    assert (~matched).any()  # garbage rows produced error rows
    assert (df.loc[matched, "score"] >= 70).all()
    assert (df.loc[~matched, ["x", "y", "score"]] == 0).all().all()


def test_health_probe_fail_fast(ray_session):
    """25 consecutive failures abort; ignore_failures disables (geocode.py:190-191)."""
    import ray.data as rd

    from geocoding_toolbox_ray.pipelines.geocode import run_health_probe

    bad = rd.from_arrow(
        _batch([(str(i), "0 north 0 east", "null island") for i in range(30)])
    )
    with pytest.raises(ContinuousFailThresholdExceeded):
        run_health_probe(bad, PipelineConfig(concurrency=1, batch_size=64))
    # ignore_failures short-circuits the probe
    run_health_probe(bad, PipelineConfig(ignore_failures=True))


def test_health_probe_passes_with_valid_rows(ray_session):
    import ray.data as rd

    from geocoding_toolbox_ray.pipelines.geocode import run_health_probe

    rows = [(str(i), "0 north 0 east", "null island") for i in range(24)]
    rows.append(("24", "1 S MAIN", "Delta"))
    ok = rd.from_arrow(_batch(rows))
    run_health_probe(ok, PipelineConfig(concurrency=1, batch_size=64))


def test_run_counters_actor(ray_session):
    import ray.data as rd

    from geocoding_toolbox_ray.pipelines.geocode import geocode_candidates
    from geocoding_toolbox_ray.stages.counters import count_batch, report, start_counters

    rows = [(str(i), "1 S MAIN", "Delta") for i in range(20)]
    rows += [(str(100 + i), "fasf", "Delta") for i in range(5)]
    ds = rd.from_arrow(_batch(rows))
    actor = start_counters()
    out = geocode_candidates(ds).map_batches(
        lambda t: count_batch(t, actor), batch_format="pyarrow"
    )
    assert out.count() == 25
    r = report(actor, expect_total=25)
    assert r["total"] == 25
    assert r["failure_rate"] == 20  # round(100*5/25)
    assert r["average_score"] == 100
    assert r["time_taken"].endswith("ms") or "second" in r["time_taken"]


def test_run_counters_zero_division_semantics(ray_session):
    from geocoding_toolbox_ray.stages.counters import report, start_counters

    actor = start_counters()
    r = report(actor)
    assert r["failure_rate"] == 100  # geocode.py:151-154
    assert r["average_score"] == "n/a"  # geocode.py:155-158


def test_global_dedup_pipeline_matches_direct(ray_session):
    import ray.data as rd

    from geocoding_toolbox_ray.pipelines.geocode import (
        geocode_candidates,
        geocode_candidates_dedup,
    )

    rows = []
    for i in range(200):  # heavy duplication: 4 distinct keys
        street, zone = [("1 S MAIN", "Delta"), ("fasf", "Delta"),
                        ("3 W SR 6", "84624"), ("1 N STATE", "Provo")][i % 4]
        rows.append((str(i), street, zone))
    ds = rd.from_arrow(_batch(rows))
    direct = geocode_candidates(ds).to_pandas().sort_values("primary_key").reset_index(drop=True)
    dedup = (
        geocode_candidates_dedup(rd.from_arrow(_batch(rows)))
        .to_pandas()
        .sort_values("primary_key")
        .reset_index(drop=True)
    )
    assert list(direct.columns) == list(dedup.columns)
    for col in direct.columns:
        a, b = direct[col], dedup[col]
        if a.dtype == object:
            assert a.fillna("\0").tolist() == b.fillna("\0").tolist(), col
        else:
            assert (a == b).all(), col


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(
                "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789 &$#-",
                max_size=30,
            ),
            st.text("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789 &-", max_size=20),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_matcher_invariants_random_inputs(rows):
    """Fuzz the matcher: exactly one output row per input (original order),
    score in [0,100], matched <=> message null, error rows zeroed."""
    global _FUZZ_MATCHER
    if _FUZZ_MATCHER is None:
        _FUZZ_MATCHER = make_matcher()
    m = _FUZZ_MATCHER
    batch = _batch([(str(i), s, z) for i, (s, z) in enumerate(rows)])
    out = m(batch).to_pandas()
    assert len(out) == len(rows)
    assert out["primary_key"].tolist() == [str(i) for i in range(len(rows))]
    assert out["score"].between(0, 100).all()
    matched = out["message"].isna()
    assert (out.loc[matched, "score"] >= 70).all()
    assert (out.loc[~matched, ["x", "y", "score"]] == 0).all().all()
    assert out.loc[~matched, "locator"].isna().all()


def test_hot_key_batch_is_cheap_and_correct():
    """Extreme skew: one garbage address repeated 8192x — the distinct-key
    fuzzy tier + memo keeps the batch fast and every row identical."""
    import time

    m = make_matcher()
    batch = _batch([(str(i), "9999 N XYZZY", "Delta") for i in range(8192)])
    t0 = time.perf_counter()
    out = m(batch).to_pandas()
    dt = time.perf_counter() - t0
    assert len(out) == 8192
    assert out["message"].notna().all()
    assert out["score"].eq(0).all()
    assert dt < 1.0  # one Levenshtein pass, not 8192
    # memoized second batch is even cheaper
    t0 = time.perf_counter()
    m(batch)
    assert time.perf_counter() - t0 < 0.5
