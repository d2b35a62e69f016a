"""Engine exceptions — same observable contract as the reference
(/root/reference/src/agrcgeocoding/geocode.py:299-317)."""

from __future__ import annotations


class InvalidConfigurationException(ValueError):
    """Pipeline-build-time failure (missing reference tables, bad locator
    selector) — the local analogue of the reference's fail-fast
    ``InvalidAPIKeyException`` (geocode.py:299-308): abort before streaming."""


class ContinuousFailThresholdExceeded(Exception):
    """The first HEALTH_PROBE_COUNT rows all failed (geocode.py:311-317)."""

    def __init__(self):
        self.message = "Continuous fail threshold reached. Failing entire job."
        super().__init__(self.message)
