"""Web-text address extraction (SURVEY.md M7).

One page -> 0..N candidate rows ``(primary_key, input_street, input_zone,
url, warc_ts)`` where ``primary_key = url + '#' + match_index`` — the
web-scale replacement for the reference's CSV 3-tuple source
(``/root/reference/src/agrcgeocoding/geocode.py:338-344``).

The scanner joins every page text in the batch with a NUL separator and
runs the compiled regex ONCE over the joined string (a single C-level
pass; ~4x faster than per-row ``extractall``, which loops ``findall`` in
Python per row).  Match offsets map back to source rows with a
``searchsorted`` over the row start offsets.  The pattern is
RE2-compatible so a DuckDB ``regexp_extract_all`` oracle can run the
identical scan.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: street like "39 N SR 6" / "9999 N XYZZY", zone a city name or ZIP5,
#: terminated by a period — RE2-compatible (no backrefs / lookaround).
ADDRESS_PATTERN = (
    r"(?P<street>\d{1,5} [NSEW] [A-Z0-9][A-Za-z0-9 ]*), "
    r"(?P<zone>\d{5}|[A-Za-z][A-Za-z ]*)\."
)

_ADDRESS_RE = re.compile(ADDRESS_PATTERN)
_ADDRESS_RE_BYTES = re.compile(ADDRESS_PATTERN.encode("ascii"))
_SEP = "\x00"  # cannot appear inside a match (no pattern class admits NUL)
_SEP_BYTES = pa.scalar(b"\x00", pa.large_binary())


_NSEW_CODES = np.frombuffer(b"NSEW", np.uint8)


def _scan(joined: bytes) -> tuple[list, list, list]:
    """Anchor-prefiltered scan, byte-for-byte equivalent to
    ``_ADDRESS_RE_BYTES.finditer(joined)``.

    Every match starts ``\\d{1,5} [NSEW] `` — so a vectorized numpy pass
    finds the rare `` [NSEW] `` 3-byte anchors (plus a preceding digit),
    and the regex runs only AT those anchors instead of scanning every
    byte (~5x on page text).  finditer's non-overlap rule is reproduced
    by skipping anchors inside the previous match.
    """
    b = np.frombuffer(joined, np.uint8)
    n = len(b)
    if n < 8:
        matches = _ADDRESS_RE_BYTES.finditer(joined)
        out = ([], [], [])
        for m in matches:
            out[0].append(m.group("street").decode("utf-8"))
            out[1].append(m.group("zone").decode("utf-8"))
            out[2].append(m.start())
        return out
    is_digit = (b >= 48) & (b <= 57)
    # positions p: b[p]==' ', b[p+1] in NSEW, b[p+2]==' ', b[p-1] is a digit
    anchor = (
        (b[1:-2] == 32)
        & np.isin(b[2:-1], _NSEW_CODES)
        & (b[3:] == 32)
        & is_digit[:-3]
    )
    cand = np.flatnonzero(anchor) + 1  # position of the space before NSEW
    streets, zones, positions = [], [], []
    last_end = -1
    for p in map(int, cand):
        # back up over at most 5 digits to the start of the house number
        s = p
        while s > 0 and p - s < 5 and is_digit[s - 1]:
            s -= 1
        if s <= last_end:  # inside (or overlapping) the previous match
            if p <= last_end:
                continue
            s = max(s, last_end)
            if not is_digit[s]:
                continue
        m = _ADDRESS_RE_BYTES.match(joined, s)
        if m is None:
            continue
        streets.append(m.group("street").decode("utf-8"))
        zones.append(m.group("zone").decode("utf-8"))
        positions.append(s)
        last_end = m.end()
    return streets, zones, positions


def _empty_candidates() -> pa.Table:
    return pa.table(
        {
            "primary_key": pa.array([], pa.string()),
            "input_street": pa.array([], pa.string()),
            "input_zone": pa.array([], pa.string()),
            "url": pa.array([], pa.string()),
            "warc_ts": pa.array([], pa.timestamp("us")),
        }
    )


def extract_candidates(batch: pa.Table) -> pa.Table:
    """map_batches body: pages batch -> candidates batch."""
    if batch.num_rows == 0:
        return _empty_candidates()
    text_col = batch["text"]
    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    # join all rows Arrow-side (one C-level concat; no per-row Python
    # strings) and scan BYTES so match offsets line up with binary_length
    # for arbitrary UTF-8 (the ASCII-only pattern can't match inside a
    # multibyte sequence)
    bin_col = pc.cast(text_col, pa.large_binary())
    wrapper = pa.LargeListArray.from_arrays(
        pa.array([0, len(bin_col)], pa.int64()), bin_col
    )
    joined = pc.binary_join(wrapper, _SEP_BYTES)[0].as_py()
    streets, zones, positions = _scan(joined)
    if not streets:
        return _empty_candidates()
    lens = np.asarray(pc.binary_length(bin_col).to_numpy(zero_copy_only=False), np.int64)
    starts = np.concatenate([[0], np.cumsum(lens[:-1] + 1)])
    rows = np.searchsorted(starts, np.asarray(positions, np.int64), side="right") - 1
    # per-row match counter (finditer emits matches in document order)
    seq = np.arange(len(rows), dtype=np.int64)
    row_first = np.concatenate([[0], np.flatnonzero(rows[1:] != rows[:-1]) + 1])
    run_lens = np.diff(np.concatenate([row_first, [len(rows)]]))
    match_no = seq - np.repeat(seq[row_first], run_lens)

    rows_arr = pa.array(rows)
    url = pc.take(batch["url"], rows_arr)
    pk = pc.binary_join_element_wise(
        pc.cast(url, pa.string()), pa.array(match_no.astype(str), pa.string()), "#"
    )
    return pa.table(
        {
            "primary_key": pk,
            "input_street": pa.array(streets, pa.string()),
            "input_zone": pa.array(zones, pa.string()),
            "url": pc.cast(url, pa.string()),
            "warc_ts": pc.take(batch["warc_ts"], rows_arr),
        }
    )


def filter_lang(batch: pa.Table, lang: str = "en") -> pa.Table:
    """Vectorized language predicate (SURVEY.md M8)."""
    return batch.filter(pc.equal(batch["lang"], lang))
