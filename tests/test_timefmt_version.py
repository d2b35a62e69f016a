"""format_time branches (reference geocode.py:65-81) + version discovery."""

from __future__ import annotations

import json

from geocoding_toolbox_ray.functions.timefmt import format_time, get_local_version


def test_format_time_branches():
    assert format_time(0.5) == "500 ms"
    assert format_time(29.9).endswith(" ms")
    assert format_time(45.0) == "45.0 seconds"
    assert format_time(89.9) == "89.9 seconds"
    assert format_time(120.0) == "2.0 minutes"
    assert format_time(89 * 60) == "89.0 minutes"
    assert format_time(2 * 3600) == "2.0 hours"


def test_get_local_version_walks_parents(tmp_path):
    deep = tmp_path / "a" / "b" / "c"
    deep.mkdir(parents=True)
    (tmp_path / "tool-version.json").write_text(json.dumps({"VERSION_NUMBER": "1.2.3"}))
    # found 3 levels up
    assert get_local_version(start_dir=deep / "x.py") == "1.2.3"
    # not found beyond the walk limit
    deeper = deep / "d" / "e"
    deeper.mkdir(parents=True)
    assert get_local_version(start_dir=deeper / "x.py") is None
