"""Human-friendly duration formatting.

Same observable behavior as ``_format_time``
(``/root/reference/src/agrcgeocoding/geocode.py:65-81``): ms under 30 s,
seconds under 90 s, minutes under 90 min, hours beyond.
"""

from __future__ import annotations


def format_time(seconds: float) -> str:
    minute = 60.00
    hour = 60.00 * minute
    if seconds < 30:
        return f"{int(seconds * 1000)} ms"
    if seconds < 90:
        return f"{round(seconds, 2)} seconds"
    if seconds < 90 * minute:
        return f"{round(seconds / minute, 2)} minutes"
    return f"{round(seconds / hour, 2)} hours"


def get_local_version(start_dir=None, filename: str = "tool-version.json", levels: int = 3):
    """Walk up to ``levels`` parent directories looking for the version
    descriptor and return its ``VERSION_NUMBER`` — same discovery contract
    as the reference's get_local_version
    (/root/reference/src/agrcgeocoding/geocode.py:266-287), reading our
    own key instead of PRO_VERSION_NUMBER."""
    import json
    from pathlib import Path

    parent = Path(start_dir or __file__).resolve().parent
    candidate = parent / filename
    i = 0
    while not candidate.exists() and i < levels:
        parent = parent.parent
        candidate = parent / filename
        i += 1
    if not candidate.exists():
        return None
    with open(candidate, encoding="utf-8") as fh:
        return json.load(fh).get("VERSION_NUMBER")
