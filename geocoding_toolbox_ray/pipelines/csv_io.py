"""CSV conformance mode — the reference's CLI surface on Ray Data.

Mirrors ``/root/reference/src/agrcgeocoding/geocode.py:320-356``: a CSV
with caller-named id/street/zone columns in, one
``geocoding_results_{YYYYmmddHHMMSS}.csv`` with the fixed 11-name header
out (geocode.py:33-36, 168-174), output row order == input row order
(geocode.py:189-250), 25-row health probe unless ``ignore_failures``.

This is the small-data conformance path: it materializes the result to
write ONE ordered CSV file like the reference does.  The web-scale path
(``resumable_write`` in ``state/lineage.py``) writes partitioned parquet.
"""

from __future__ import annotations

import time
from pathlib import Path

from ..config import HEADER, PipelineConfig
from .geocode import build_index_ref, geocode_candidates, run_health_probe


def read_candidates_csv(csv_path: str, id_field: str, street_field: str, zone_field: str):
    """CSV -> candidates Dataset with the canonical 3-column schema
    (reference get_rows(), geocode.py:338-344)."""
    import csv as _csv

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from pyarrow import csv as pacsv

    from ..errors import InvalidConfigurationException

    with open(csv_path, newline="", encoding="utf-8") as fh:
        header = next(_csv.reader(fh), [])
    missing = [f for f in (id_field, street_field, zone_field) if f not in header]
    if missing:
        raise InvalidConfigurationException(
            f"CSV {csv_path} has no column(s) {missing}; header is {header}"
        )

    ds = rd.read_csv(
        csv_path,
        # read everything as strings: the reference treats all CSV fields as
        # text (DictReader), and mixed zip/city zone columns must not be
        # inferred as int in one file and str in another
        convert_options=pacsv.ConvertOptions(
            column_types={id_field: pa.string(), street_field: pa.string(), zone_field: pa.string()}
        ),
    )

    def _project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "primary_key": pc.cast(t[id_field], pa.string()),
                "input_street": pc.cast(t[street_field], pa.string()),
                "input_zone": pc.cast(t[zone_field], pa.string()),
            }
        )

    return ds.map_batches(_project, batch_format="pyarrow")


def execute_csv(
    csv_path: str,
    id_field: str,
    street_field: str,
    zone_field: str,
    output_directory: str,
    config: PipelineConfig | None = None,
) -> Path:
    """Geocode a CSV and write the timestamped result CSV; returns its path
    (the reference ``execute`` contract, geocode.py:111-263)."""
    from ray.data import DataContext

    config = config or PipelineConfig(preserve_order=True)
    ctx = DataContext.get_current()
    prev = ctx.execution_options.preserve_order
    ctx.execution_options.preserve_order = True
    try:
        candidates = read_candidates_csv(csv_path, id_field, street_field, zone_field)
        index_ref = build_index_ref(config.locators)
        run_health_probe(candidates, config, index_ref)
        out = geocode_candidates(candidates, config, index_ref)
        df = out.to_pandas()[list(HEADER)]
    finally:
        ctx.execution_options.preserve_order = prev

    out_dir = Path(output_directory)
    out_dir.mkdir(parents=True, exist_ok=True)
    unique_run = time.strftime("%Y%m%d%H%M%S")
    out_path = out_dir / f"geocoding_results_{unique_run}.csv"
    df.to_csv(out_path, index=False)
    return out_path


def execute_csv_sharded(
    csv_path: str,
    id_field: str,
    street_field: str,
    zone_field: str,
    output_directory: str,
    config: PipelineConfig | None = None,
) -> Path:
    """Huge-output variant of ``execute_csv``: the result streams through
    ``ds.write_csv`` as one CSV shard per block — no driver
    materialization, each shard carries the 11-name header, rows stay in
    input order within a shard (enforced below: the streaming executor
    reorders blocks unless ``preserve_order`` is set — ADVICE r2).  Use
    for outputs that don't fit one file; ``execute_csv`` remains the
    byte-conformance path."""
    from ray.data import DataContext

    config = config or PipelineConfig(preserve_order=True)
    ctx = DataContext.get_current()
    prev = ctx.execution_options.preserve_order
    ctx.execution_options.preserve_order = True
    try:
        candidates = read_candidates_csv(csv_path, id_field, street_field, zone_field)
        index_ref = build_index_ref(config.locators)
        run_health_probe(candidates, config, index_ref)
        out = geocode_candidates(candidates, config, index_ref).select_columns(
            list(HEADER)
        )

        out_dir = (
            Path(output_directory)
            / f"geocoding_results_{time.strftime('%Y%m%d%H%M%S')}"
        )
        out_dir.mkdir(parents=True, exist_ok=True)
        out.write_csv(str(out_dir))
    finally:
        ctx.execution_options.preserve_order = prev
    return out_dir
