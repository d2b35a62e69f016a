"""Pages corpus invariants + extraction stage tests."""

from __future__ import annotations

import numpy as np

from geocoding_toolbox_ray.sources import pages as pages_mod
from geocoding_toolbox_ray.stages.extract import extract_candidates, filter_lang


def test_pages_deterministic():
    a = pages_mod.pages_table(50)
    b = pages_mod.pages_table(50)
    assert a.equals(b)


def test_text_byte_identical_to_extractor():
    """north_star / input_hint invariant: text == extract_text(html) per url."""
    t = pages_mod.pages_table(200)
    htmls = t["html"].to_pylist()
    texts = t["text"].to_pylist()
    for h, x in zip(htmls, texts):
        assert pages_mod.extract_text(h.decode("utf-8")) == x


def test_pages_schema():
    t = pages_mod.pages_table(10)
    assert t.schema.equals(pages_mod.PAGES_SCHEMA)


def test_extract_candidates_counts():
    t = pages_mod.pages_table(100)
    en = filter_lang(t)
    cands = extract_candidates(en)
    # page i embeds i%4 addresses; expected = sum over en pages
    langs = t["lang"].to_pylist()
    expect = sum(i % 4 for i in range(100) if langs[i] == "en")
    assert cands.num_rows == expect
    # primary keys unique and shaped url#match
    pks = cands["primary_key"].to_pylist()
    assert len(set(pks)) == len(pks)
    assert all("#" in pk for pk in pks)


def test_extract_candidates_empty_batch():
    t = pages_mod.pages_table(1)  # page 0 has 0 addresses
    out = extract_candidates(t)
    assert out.num_rows == 0
    assert "primary_key" in out.schema.names


def test_extracted_streets_parse():
    t = pages_mod.pages_table(60)
    cands = extract_candidates(t)
    streets = cands["input_street"].to_pylist()
    zones = cands["input_zone"].to_pylist()
    assert all(s[0].isdigit() for s in streets)
    assert all(z and ("," not in z) for z in zones)


def test_generate_pages_dataset_matches_inmemory(ray_session):
    ds = pages_mod.generate_pages_dataset(40, override_num_blocks=4)
    got = ds.to_pandas().sort_values("url").reset_index(drop=True)
    expect = pages_mod.pages_table(40).to_pandas().sort_values("url").reset_index(drop=True)
    assert got["url"].tolist() == expect["url"].tolist()
    assert got["text"].tolist() == expect["text"].tolist()
    assert np.array_equal(
        got["warc_ts"].to_numpy(), expect["warc_ts"].to_numpy()
    )


def test_scan_equivalent_to_finditer():
    """The anchor-prefiltered scanner must be byte-for-byte identical to
    re.finditer over the joined corpus text, including non-overlap rules."""
    import re

    from geocoding_toolbox_ray.stages.extract import _ADDRESS_RE_BYTES, _scan

    cases = [
        "Contact us at 39 N SR 6, Delta. And at 9999 N XYZZY, 84624.",
        "",
        "no matches here at all",
        "1234567 N MAIN, Delta.",           # long digit run: match starts mid-run
        "12 N 34 E MAIN, Delta. 5 W X, Y.", # nested anchors inside one match
        "9 S A, 84624. 9 S A, 84624.",      # adjacent matches
        "edge at end 12 N M, Delta.",
        "\x00 5 E Q, Town.\x00",
        "1 N A, 84624.22 N B, Delta.",      # digits abut the previous match end
        "1 N A, 84624.1234567 N B, Delta.", # long run abutting previous end
    ]
    # plus corpus text
    t = pages_mod.pages_table(80)
    joined = "\x00".join(t["text"].to_pylist())
    cases.append(joined)

    for text in cases:
        data = text.encode("utf-8")
        expect = [
            (m.group("street").decode(), m.group("zone").decode(), m.start())
            for m in _ADDRESS_RE_BYTES.finditer(data)
        ]
        s, z, p = _scan(data)
        assert list(zip(s, z, p)) == expect, text[:60]


def test_curate_pages_invariants(ray_session):
    """Curation over the pages corpus: every kept url exists in the input,
    non-'en' pages are dropped, and content-hash duplicates collapse to
    the smallest url (verified against a pandas recompute)."""
    import numpy as np
    import pandas as pd

    from geocoding_toolbox_ray.functions.text import md5_hex, quality_features
    from geocoding_toolbox_ray.pipelines.curate import curate_pages
    from geocoding_toolbox_ray.sources import pages as pages_mod
    import ray.data as rd

    t = pages_mod.pages_table(600)
    got = curate_pages(rd.from_arrow(t)).to_pandas().sort_values("url").reset_index(drop=True)

    df = t.to_pandas()
    df = df[df["lang"] == "en"]
    feats = quality_features(df["text"])
    ok = np.asarray((feats["n_tokens"] > 0) & (feats["stop_permille"] <= 600), bool)
    kept = df.loc[ok, ["url", "text"]].copy()
    kept["fp"] = md5_hex(kept["text"])
    kept["n_tokens"] = np.asarray(quality_features(kept["text"])["n_tokens"], np.int64)
    want = (
        kept.sort_values(["fp", "url"], kind="mergesort")
        .drop_duplicates("fp", keep="first")[["url", "n_tokens"]]
        .sort_values("url")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_curate_pages_duplicate_resolution(ray_session):
    """Planted exact-duplicate texts across urls: exactly one survivor per
    content hash, and it is the lexicographically-smallest url."""
    import pyarrow as pa
    import ray.data as rd

    from geocoding_toolbox_ray.pipelines.curate import curate_pages

    text_a = "the quick brown fox jumps over the lazy dog again and again"
    text_b = "a completely different body of text with the usual stopwords"
    t = pa.table(
        {
            "url": pa.array(
                ["https://z.example/1", "https://a.example/1", "https://m.example/1",
                 "https://b.example/2", "https://c.example/3"],
                pa.string(),
            ),
            "text": pa.array([text_a, text_a, text_a, text_b, text_b], pa.large_string()),
            "lang": pa.array(["en"] * 5, pa.string()),
        }
    )
    out = curate_pages(rd.from_arrow(t)).to_pandas()
    assert sorted(out["url"]) == ["https://a.example/1", "https://b.example/2"]
