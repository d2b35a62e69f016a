"""Web-text address extraction (SURVEY.md M7).

One page -> 0..N candidate rows ``(primary_key, input_street, input_zone,
url, warc_ts)`` where ``primary_key = url + '#' + match_index`` — the
web-scale replacement for the reference's CSV 3-tuple source
(``/root/reference/src/agrcgeocoding/geocode.py:338-344``).

The scanner is a single compiled regex applied per batch with pandas
``str.extractall`` (C-level loop over rows, no per-row Python in the
pipeline code).  The pattern is RE2-compatible so the DuckDB oracle can run
the identical ``regexp_extract_all`` where extraction is oracle-checked.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

#: street like "39 N SR 6" / "9999 N XYZZY", zone a city name or ZIP5,
#: terminated by a period — RE2-compatible (no backrefs / lookaround).
ADDRESS_PATTERN = (
    r"(?P<street>\d{1,5} [NSEW] [A-Z0-9][A-Za-z0-9 ]*), "
    r"(?P<zone>\d{5}|[A-Za-z][A-Za-z ]*)\."
)


def extract_candidates(batch: pa.Table) -> pa.Table:
    """map_batches body: pages batch -> candidates batch."""
    text = batch["text"].to_pandas()
    url = batch["url"].to_pandas()
    ts = batch["warc_ts"].to_pandas()

    hits = text.str.extractall(ADDRESS_PATTERN)
    if hits.empty:
        return pa.table(
            {
                "primary_key": pa.array([], pa.string()),
                "input_street": pa.array([], pa.string()),
                "input_zone": pa.array([], pa.string()),
                "url": pa.array([], pa.string()),
                "warc_ts": pa.array([], pa.timestamp("us")),
            }
        )
    rows = hits.index.get_level_values(0)
    match_no = hits.index.get_level_values("match")
    src_url = url.iloc[rows].reset_index(drop=True)
    pk = src_url + "#" + pd.Series(match_no).astype(str)
    return pa.table(
        {
            "primary_key": pa.array(pk, pa.string()),
            "input_street": pa.array(hits["street"].reset_index(drop=True), pa.string()),
            "input_zone": pa.array(hits["zone"].reset_index(drop=True), pa.string()),
            "url": pa.array(src_url, pa.string()),
            "warc_ts": pa.array(ts.iloc[rows].reset_index(drop=True), pa.timestamp("us")),
        }
    )


def filter_lang(batch: pa.Table, lang: str = "en") -> pa.Table:
    """Vectorized language predicate (SURVEY.md M8)."""
    import pyarrow.compute as pc

    return batch.filter(pc.equal(batch["lang"], lang))
