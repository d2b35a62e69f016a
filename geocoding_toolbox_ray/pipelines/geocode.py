"""The flagship pipeline: pages -> candidates -> geocoded rows.

Ray-Data-first shape (SURVEY.md §3.4)::

    read_parquet(pages, columns=[url, warc_ts, text, lang])   # prune html at the read
      -> map_batches(filter lang == 'en')                     # M8
      -> map_batches(extract_candidates)                      # M7: 1 page -> 0..N rows
      -> map_batches(MatcherStage, concurrency=N)             # cleanse+standardize+match
                                                              # (T2/J1/J2, broadcast index)

Everything is streaming; the only materialized object is the broadcast
index (a few MB).  The health-probe conformance mode reproduces the
reference's ordered first-25-rows abort
(``/root/reference/src/agrcgeocoding/geocode.py:37,190-191``).
"""

from __future__ import annotations

import pyarrow as pa

from ..config import HEALTH_PROBE_COUNT, PipelineConfig
from ..errors import ContinuousFailThresholdExceeded
from ..sources.synthetic import address_points_table
from ..stages.extract import extract_candidates, filter_lang
from ..state.index import GeocodeIndex


def build_index_ref(
    locators: str = "all",
    address_points: pa.Table | None = None,
    pobox: str = "false",
):
    """Compile the broadcast index and put it in the object store (once).
    ``pobox='true'`` admits PO Box delivery points into the locator layer
    (the reference's pobox request flag, geocode.py:27,117,205)."""
    import ray

    table = (
        address_points
        if address_points is not None
        else address_points_table(include_pobox=(pobox == "true"))
    )
    return ray.put(GeocodeIndex.build(table, locators=locators))


def geocode_candidates(candidates, config: PipelineConfig | None = None, index_ref=None):
    """candidates Dataset (primary_key, input_street, input_zone, ...) -> 11-col output.

    The matcher runs as a stateless TASK stage with the broadcast index
    cached once per worker process (``make_matcher_fn``): same state
    amortization as an actor pool, but elastic — no pool spin-up latency
    and no fixed CPU reservation that could starve upstream stages (a
    fixed pool of num_cpus actors deadlocked the 4-cpu test session; an
    autoscaling pool paid ~1 s per actor on short jobs).
    """
    config = config or PipelineConfig()
    if index_ref is None:
        index_ref = build_index_ref(config.locators, pobox=config.pobox)
    from ..stages.matcher import make_matcher_fn

    out = candidates.map_batches(
        make_matcher_fn(index_ref, config.accept_score),
        batch_format="pyarrow",
        batch_size=config.batch_size,
    )
    if config.spatial_reference != 26912:
        from ..functions.project import project_output_batch

        wkid = config.spatial_reference
        out = out.map_batches(
            lambda t: project_output_batch(t, wkid),
            batch_format="pyarrow",
            batch_size=config.batch_size,
        )
    return out


def geocode_pages(pages, config: PipelineConfig | None = None, index_ref=None, lang: str = "en"):
    """pages Dataset -> extracted candidates -> geocoded 11-col output."""
    config = config or PipelineConfig()
    candidates = pages.map_batches(
        lambda b: extract_candidates(filter_lang(b, lang)),
        batch_format="pyarrow",
        batch_size=config.batch_size,
    )
    return geocode_candidates(candidates, config, index_ref)


def read_pages(path: str, lang: str | None = "en"):
    """Column-pruned pages scan with the lang predicate pushed into the
    parquet read (row-group pruning at the scan, SURVEY.md M8) — html is
    never read for the geocode path."""
    import pyarrow.compute as pc
    import ray.data as rd

    kwargs = {"columns": ["url", "warc_ts", "text", "lang"]}
    if lang is not None:
        kwargs["filter"] = pc.field("lang") == lang
    return rd.read_parquet(path, **kwargs)


def run_health_probe(candidates, config: PipelineConfig, index_ref=None) -> None:
    """Conformance health probe (E2): geocode the FIRST ``HEALTH_PROBE_COUNT``
    candidate rows in input order; if every one fails, abort the job —
    the streaming analogue of geocode.py:190-191.  No-op when
    ``config.ignore_failures`` is set (same flag, geocode.py:120)."""
    if config.ignore_failures:
        return
    probe = candidates.limit(HEALTH_PROBE_COUNT)
    out = geocode_candidates(probe, config, index_ref).to_pandas()
    if len(out) == HEALTH_PROBE_COUNT and out["message"].notna().all():
        raise ContinuousFailThresholdExceeded()


def geocode_pages_resumable(
    pages_dir: str,
    out_dir: str,
    config: PipelineConfig | None = None,
    *,
    shard_size: int = 16,
) -> dict:
    """The flagship pipeline through the resumable partitioned sink: the
    pages corpus is sharded by input file group, each shard streams
    read -> extract -> match -> parquet, and a rerun skips completed shards
    (per-shard lineage + metrics, SURVEY.md §4.1 checkpoint row)."""
    import glob

    from ..state.lineage import resumable_write

    config = config or PipelineConfig()
    index_ref = build_index_ref(config.locators, pobox=config.pobox)
    files = sorted(glob.glob(f"{pages_dir}/*.parquet"))

    def build(shard_files):
        import ray.data as rd

        pages = rd.read_parquet(shard_files, columns=["url", "warc_ts", "text", "lang"])
        return geocode_pages(pages, config, index_ref)

    return resumable_write(files, build, out_dir, shard_size=shard_size)


def geocode_candidates_dedup(candidates, config: PipelineConfig | None = None, index_ref=None):
    """N1 at pipeline level: geocode each DISTINCT (street, zone) once, then
    hash-join the results back to every duplicate row.

    The matcher already memoizes distinct keys per batch; this variant
    dedups GLOBALLY before matching — the right trade when duplicates are
    extreme (millions of pages citing the same address) and the dedup
    groupby is cheaper than re-matching per batch.  Output rows/columns
    are identical to ``geocode_candidates`` (same 11-column contract,
    original primary_key per input row).
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    config = config or PipelineConfig()
    if index_ref is None:
        index_ref = build_index_ref(config.locators, pobox=config.pobox)

    distinct = (
        candidates.groupby(["input_street", "input_zone"])
        .aggregate(Count(alias_name="_dup_n"))
        .map_batches(
            lambda t: pa.table(
                {
                    "primary_key": pc.binary_join_element_wise(
                        pc.cast(t["input_street"], pa.string()),
                        pc.cast(t["input_zone"], pa.string()),
                        "\x1f",
                    ),
                    "input_street": t["input_street"],
                    "input_zone": t["input_zone"],
                }
            ),
            batch_format="pyarrow",
        )
    )
    matched = geocode_candidates(distinct, config, index_ref).map_batches(
        lambda t: t.drop_columns(["primary_key"]).rename_columns(
            ["m_street", "m_zone"] + list(t.schema.names[3:])
        ),
        batch_format="pyarrow",
    )
    keyed = candidates.map_batches(
        lambda t: t.select(["primary_key", "input_street", "input_zone"]),
        batch_format="pyarrow",
    )
    joined = keyed.join(
        matched,
        "inner",
        num_partitions=16,
        on=("input_street", "input_zone"),
        right_on=("m_street", "m_zone"),
    )
    from ..config import HEADER

    return joined.map_batches(
        lambda t: t.select(list(HEADER)), batch_format="pyarrow"
    )
