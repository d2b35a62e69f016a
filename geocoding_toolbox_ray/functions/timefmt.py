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
