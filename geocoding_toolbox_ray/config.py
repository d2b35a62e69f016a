"""Pipeline configuration — same tunables and defaults as the reference
(/root/reference/src/agrcgeocoding/geocode.py:25-28, 111-121)."""

from __future__ import annotations

from dataclasses import dataclass

DEFAULT_SPATIAL_REFERENCE = 26912
DEFAULT_LOCATOR_NAME = "all"
DEFAULT_POBOX = "false"
DEFAULT_ACCEPT_SCORE = 70
HEALTH_PROBE_COUNT = 25  # geocode.py:37

#: fixed 11-name output header, geocode.py:33-36
HEADER = (
    "primary_key",
    "input_street",
    "input_zone",
    "x",
    "y",
    "score",
    "locator",
    "matchAddress",
    "standardizedAddress",
    "addressGrid",
    "message",
)


@dataclass
class PipelineConfig:
    spatial_reference: int = DEFAULT_SPATIAL_REFERENCE
    locators: str = DEFAULT_LOCATOR_NAME
    pobox: str = DEFAULT_POBOX
    accept_score: int = DEFAULT_ACCEPT_SCORE
    ignore_failures: bool = False
    #: conformance mode: preserve input order + run the 25-row health probe
    preserve_order: bool = False
    #: matcher actor pool sizing
    concurrency: int = 4
    batch_size: int = 8192
