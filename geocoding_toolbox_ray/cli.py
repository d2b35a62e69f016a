"""CLI mirroring the reference's argparse surface
(/root/reference/src/agrcgeocoding/geocode.py:320-336), minus the api key
(no remote API) and plus the engine's pipeline knobs.

Usage::

    python -m geocoding_toolbox_ray CSV ID STREET ZONE OUTPUT \
        [--wkid 26912] [--locators all] [--pobox false] [--acceptScore 70] \
        [--ignore-failures]
"""

from __future__ import annotations

import argparse

from .config import (
    DEFAULT_ACCEPT_SCORE,
    DEFAULT_LOCATOR_NAME,
    DEFAULT_POBOX,
    DEFAULT_SPATIAL_REFERENCE,
    PipelineConfig,
)


def main(argv=None) -> str:
    parser = argparse.ArgumentParser(description="Geocode a csv (local offline engine)")
    parser.add_argument("csv", type=str)
    parser.add_argument("id", type=str)
    parser.add_argument("street", type=str)
    parser.add_argument("zone", type=str)
    parser.add_argument("output", type=str)
    parser.add_argument("--wkid", default=DEFAULT_SPATIAL_REFERENCE, type=int)
    parser.add_argument("--locators", default=DEFAULT_LOCATOR_NAME, type=str)
    parser.add_argument("--pobox", default=DEFAULT_POBOX, type=str)
    parser.add_argument("--acceptScore", default=DEFAULT_ACCEPT_SCORE, type=int)
    parser.add_argument("--ignore-failures", action="store_true")
    parser.add_argument(
        "--sharded",
        action="store_true",
        help="write one CSV shard per block via ds.write_csv (streaming, "
        "no driver materialization) instead of one ordered file",
    )
    args = parser.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")

    from .pipelines.csv_io import execute_csv, execute_csv_sharded

    config = PipelineConfig(
        spatial_reference=args.wkid,
        locators=args.locators,
        pobox=args.pobox,
        accept_score=args.acceptScore,
        ignore_failures=args.ignore_failures,
        preserve_order=True,
    )
    runner = execute_csv_sharded if args.sharded else execute_csv
    out = runner(args.csv, args.id, args.street, args.zone, args.output, config)
    print(out)
    return str(out)


if __name__ == "__main__":  # pragma: no cover
    main()
