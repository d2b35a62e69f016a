"""Common-Crawl-style pages corpus (BASELINE.json ``input_hint``).

Schema: ``(url:string, warc_ts:timestamp[us], html:binary, text:large_string,
lang:string)``.  Pages are a pure function of the page index — no RNG, no
clock — so any scale factor regenerates bit-identically, and the per-url
invariant required by the north star holds by construction *and* is
enforced: ``text == extract_text(html)`` for every row (the deterministic
trafilatura-style extractor below), tested in
``tests/test_pages_extract.py``.

Generation itself is a Ray Data pipeline (``generate_pages_dataset``):
``ray.data.range(n) -> map_batches(build)`` — embarrassingly parallel, so
the bench corpus is produced at full node width and written once to a
cached Parquet directory.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from .synthetic import _address_point_rows

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.large_string()),
        ("lang", pa.string()),
    ]
)

_LANG_CYCLE = ("en", "en", "en", "en", "es", "en", "en", "de", "en", "en")
_EPOCH_US = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z in microseconds
_TS_STEP_US = 1_000_000  # one second per page

_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")

_FILLER = (
    "county records show the property listing",
    "open hours monday through friday",
    "the office moved to a new building",
    "find parking behind the main entrance",
    "call ahead for an appointment",
)


def extract_text(html: str) -> str:
    """Deterministic text extraction: strip tags, collapse whitespace, strip.

    This is the frozen extractor whose per-url output must stay
    byte-identical (north_star / input_hint invariant).
    """
    return _WS_RE.sub(" ", _TAG_RE.sub(" ", html)).strip()


def _page_addresses(i: int, points: list[dict]) -> list[str]:
    """0-3 embedded 'street, zone' strings for page i (deterministic)."""
    out = []
    for j in range(i % 4):
        if (i + j) % 7 == 0:
            r = points[(i * 7 + j * 13) % len(points)]
            zone_disp = r["zone"].title() if (i + j) % 2 == 0 else r["zip"]
            out.append(f"9999 N XYZZY, {zone_disp}")
        else:
            r = points[(i * 7 + j * 13) % len(points)]
            zone_disp = r["zone"].title() if (i + j) % 2 == 0 else r["zip"]
            out.append(f"{r['match_address']}, {zone_disp}")
    return out


def _build_html(i: int, addresses: list[str]) -> str:
    body = [f"<h1>Listing {i}</h1>"]
    for j, addr in enumerate(addresses):
        filler = _FILLER[(i + j) % len(_FILLER)]
        body.append(f"<p>Contact us at {addr}. Note {filler}.</p>")
    body.append(f"<p>{_FILLER[i % len(_FILLER)]}.</p>")
    return (
        f"<html><head><title>Page {i}</title></head><body>"
        + "".join(body)
        + "</body></html>"
    )


def pages_batch(indices: np.ndarray) -> pa.Table:
    """Build the pages table for an array of page indices (vector entry point)."""
    points = _address_point_rows()
    urls, htmls, texts, langs, ts = [], [], [], [], []
    for i in map(int, indices):
        addrs = _page_addresses(i, points)
        html = _build_html(i, addrs)
        urls.append(f"https://site{i % 1000}.example.ut.us/page/{i}")
        htmls.append(html.encode("utf-8"))
        texts.append(extract_text(html))
        langs.append(_LANG_CYCLE[i % len(_LANG_CYCLE)])
        ts.append(_EPOCH_US + i * _TS_STEP_US)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.large_string()),
            "lang": pa.array(langs, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )


def pages_table(n: int) -> pa.Table:
    """In-memory pages table for tests / tiny runs."""
    return pages_batch(np.arange(n))


def generate_pages_dataset(n: int, *, override_num_blocks: int | None = None):
    """Distributed deterministic generation: range(n) -> map_batches(build)."""
    import ray.data as rd

    ds = rd.range(n, override_num_blocks=override_num_blocks)
    return ds.map_batches(
        lambda b: pages_batch(b["id"]),
        batch_format="numpy",
        batch_size=8192,
    )


def materialize_pages_parquet(n: int, out_dir: str, *, force: bool = False) -> str:
    """Generate-once cache: write the n-page corpus to ``out_dir`` if absent."""
    import os

    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker) and not force:
        return out_dir
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    # one file per ~8k pages: enough read blocks that downstream fused map
    # stages can use every core (a 17-file corpus capped parallelism at 17)
    blocks = max(32, n // 8192)
    generate_pages_dataset(n, override_num_blocks=blocks).write_parquet(out_dir)
    with open(marker, "w", encoding="utf-8") as fh:
        fh.write(str(n))
    return out_dir
