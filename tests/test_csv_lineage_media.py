"""CSV conformance mode, resumable lineage sink, multimodal plumbing."""

from __future__ import annotations

import csv
import json
from pathlib import Path

import pandas as pd
import pyarrow as pa
import pytest

from geocoding_toolbox_ray.config import HEADER, PipelineConfig


def _write_normal_csv(path: Path) -> list[tuple[str, str, str]]:
    """normal.csv-style fixture (reference tests/normal.csv:1-34): valid
    rows + garbage + empty zones, repeated 4x."""
    base = [
        ("259 W MAIN", "Delta"),
        ("154 E MAIN", "Delta"),
        ("39 N SR 6", "Delta"),
        ("fasf", "Delta"),
        ("1 S MAIN", ""),
        ("67 N SR 90", "Town"),
    ]
    rows = []
    i = 0
    for _ in range(4):
        for s, z in base:
            i += 1
            rows.append((str(i), s, z))
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["id", "street", "zone"])
        w.writerows(rows)
    return rows


def test_execute_csv_conformance(ray_session, tmp_path):
    from geocoding_toolbox_ray.pipelines.csv_io import execute_csv

    src = tmp_path / "normal.csv"
    rows = _write_normal_csv(src)
    out_path = execute_csv(str(src), "id", "street", "zone", str(tmp_path / "out"))
    assert out_path.name.startswith("geocoding_results_")
    df = pd.read_csv(out_path, dtype=str)
    assert list(df.columns) == list(HEADER)
    # one output row per input row, in input order (geocode.py:189-250)
    assert df["primary_key"].tolist() == [r[0] for r in rows]
    # score round-trips through CSV like the reference test (test_geocode.py:136)
    delta_exact = df[df["input_street"] == "39 N SR 6"]
    assert (delta_exact["score"] == "100").all()
    garbage = df[df["input_street"] == "fasf"]
    assert (garbage["score"] == "0").all()
    assert garbage["message"].notna().all()


def test_execute_csv_sharded_matches_single_file(ray_session, tmp_path):
    """The streaming ds.write_csv sink must produce the same row SET and
    columns as the single-file conformance path (order is per-shard)."""
    from geocoding_toolbox_ray.pipelines.csv_io import execute_csv, execute_csv_sharded

    src = tmp_path / "normal.csv"
    rows = _write_normal_csv(src)
    single = execute_csv(str(src), "id", "street", "zone", str(tmp_path / "o1"))
    shard_dir = execute_csv_sharded(str(src), "id", "street", "zone", str(tmp_path / "o2"))
    parts = sorted(shard_dir.glob("*.csv"))
    assert parts, "write_csv produced no shards"
    sdf = pd.concat([pd.read_csv(p, dtype=str) for p in parts], ignore_index=True)
    ddf = pd.read_csv(single, dtype=str)
    assert list(sdf.columns) == list(HEADER)
    assert len(sdf) == len(rows)
    # numeric columns round-trip with different text formatting between
    # the pandas and arrow CSV writers ("335000.0" vs "335000") — compare
    # as numbers, everything else as text
    for df_ in (sdf, ddf):
        for c in ("x", "y"):
            df_[c] = df_[c].astype(float)
        df_["score"] = df_["score"].astype(int)
    key = ["primary_key", "input_street", "input_zone"]
    a = sdf.fillna("").sort_values(key).reset_index(drop=True)
    b = ddf.fillna("").sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_execute_csv_fail_fast(ray_session, tmp_path):
    from geocoding_toolbox_ray.errors import ContinuousFailThresholdExceeded
    from geocoding_toolbox_ray.pipelines.csv_io import execute_csv

    src = tmp_path / "failfast.csv"
    with open(src, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["id", "street", "zone"])
        for i in range(30):
            w.writerow([str(i), "0 north 0 east", "null island"])
    with pytest.raises(ContinuousFailThresholdExceeded):
        execute_csv(str(src), "id", "street", "zone", str(tmp_path / "out"))
    # and ignore_failures completes with 30 error rows
    out = execute_csv(
        str(src), "id", "street", "zone", str(tmp_path / "out2"),
        PipelineConfig(ignore_failures=True),
    )
    df = pd.read_csv(out, dtype=str)
    assert len(df) == 30
    assert df["message"].notna().all()


def test_resumable_write_skips_completed(ray_session, tmp_path):
    import ray.data as rd

    from geocoding_toolbox_ray.state.lineage import (
        completed_shards,
        resumable_write,
        resume_report,
    )

    # 4 input files of 100 rows each
    files = []
    for i in range(4):
        p = tmp_path / f"in{i}.parquet"
        pa.parquet.write_table(pa.table({"v": list(range(i * 100, i * 100 + 100))}), p)
        files.append(str(p))

    def build(shard_files):
        return rd.read_parquet(shard_files).map_batches(
            lambda t: t, batch_format="pyarrow"
        )

    out_dir = str(tmp_path / "out")
    r1 = resumable_write(files, build, out_dir, shard_size=1)
    assert r1["ran"] == [0, 1, 2, 3] and r1["skipped"] == []
    assert completed_shards(out_dir) == {0, 1, 2, 3}

    # drop one shard's sidecar -> only it reruns
    (Path(out_dir) / "shard=00002" / "lineage.json").unlink()
    r2 = resumable_write(files, build, out_dir, shard_size=1)
    assert r2["ran"] == [2]
    assert sorted(r2["skipped"]) == [0, 1, 3]

    report = resume_report(out_dir)
    assert len(report) == 4
    assert all(r["rows"] == 100 for r in report)
    assert all(r["output_bytes"] > 0 and "wall_seconds" in r for r in report)


def test_media_feature_stage(ray_session):
    import ray.data as rd

    from geocoding_toolbox_ray.stages.multimodal import (
        FEATURE_DIM,
        MediaFeatureStage,
        synthetic_media_table,
    )

    media = rd.from_arrow(synthetic_media_table(50))
    out = media.map_batches(
        MediaFeatureStage, batch_format="pyarrow", batch_size=16, concurrency=(1, 2)
    ).to_pandas()
    assert len(out) == 50
    assert all(len(v) == FEATURE_DIM for v in out["features"])
    # deterministic: same payload -> same features
    again = media.map_batches(
        MediaFeatureStage, batch_format="pyarrow", batch_size=16, concurrency=(1, 2)
    ).to_pandas()
    a = out.sort_values("media_id")["features"].tolist()
    b = again.sort_values("media_id")["features"].tolist()
    assert all((x == y).all() for x, y in zip(a, b))


def test_frame_sample_stage(ray_session):
    import ray.data as rd

    from geocoding_toolbox_ray.stages.multimodal import FrameSampleStage, synthetic_media_table

    media = rd.from_arrow(synthetic_media_table(12))
    out = media.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"frame_bytes": 32, "every": 2},
        batch_format="pyarrow",
        batch_size=8,
        concurrency=(1, 2),
    ).to_pandas()
    assert len(out) > 12  # 1 row in -> many frames out
    assert (out["frame_index"] % 2 == 0).all()


def test_pillow_decoder_is_gated():
    from geocoding_toolbox_ray.stages.multimodal import PillowImageDecoder

    try:
        import PIL  # noqa: F401

        PillowImageDecoder()  # constructs when PIL exists
    except ImportError:
        with pytest.raises(NotImplementedError):
            PillowImageDecoder()


def test_pillow_decoder_real_decode():
    """Exercises the REAL decode path — skipped where PIL is absent (this
    sandbox); runs green on any deployment with Pillow installed."""
    pytest.importorskip("PIL")
    import io

    import numpy as np
    from PIL import Image

    from geocoding_toolbox_ray.stages.multimodal import FEATURE_DIM, PillowImageDecoder

    buf = io.BytesIO()
    Image.new("RGB", (8, 8), (255, 0, 0)).save(buf, format="PNG")
    payload = buf.getvalue()
    dec = PillowImageDecoder()
    feats = dec.decode_features(payload)
    assert feats.shape == (FEATURE_DIM,) and feats.dtype == np.float32
    # red converts to a constant gray level; all 16 cell means equal
    assert np.allclose(feats, feats[0])
    thumb = dec.thumbnail(payload, 4, 4)
    assert Image.open(io.BytesIO(thumb)).size == (4, 4)


def test_lineage_sidecar_contents(ray_session, tmp_path):
    import ray.data as rd

    from geocoding_toolbox_ray.state.lineage import resumable_write

    p = tmp_path / "one.parquet"
    pa.parquet.write_table(pa.table({"v": [1, 2, 3]}), p)
    out_dir = str(tmp_path / "o")
    resumable_write([str(p)], lambda fs: rd.read_parquet(fs), out_dir, shard_size=1)
    sidecar = json.loads((Path(out_dir) / "shard=00000" / "lineage.json").read_text())
    assert sidecar["input_files"] == [str(p)]
    assert sidecar["rows"] == 3


def test_geocode_pages_resumable(ray_session, tmp_path):
    import ray.data as rd

    from geocoding_toolbox_ray.pipelines.geocode import geocode_pages_resumable
    from geocoding_toolbox_ray.sources.pages import generate_pages_dataset
    from geocoding_toolbox_ray.state.lineage import resume_report

    import numpy as np
    import pyarrow.parquet as pq

    from geocoding_toolbox_ray.sources.pages import pages_batch

    corpus = str(tmp_path / "pages")
    (tmp_path / "pages").mkdir()
    for i in range(4):
        pq.write_table(
            pages_batch(np.arange(i * 500, (i + 1) * 500)), f"{corpus}/part-{i}.parquet"
        )

    out = str(tmp_path / "geocoded")
    r1 = geocode_pages_resumable(corpus, out, shard_size=1)
    assert len(r1["ran"]) >= 2 and not r1["skipped"]
    report = resume_report(out)
    total_rows = sum(r["rows"] for r in report)
    assert total_rows > 0

    # rerun: everything skipped, nothing recomputed
    r2 = geocode_pages_resumable(corpus, out, shard_size=1)
    assert not r2["ran"] and len(r2["skipped"]) == r1["total_shards"]

    # the written output is the full 11-column table (sidecars filtered)
    import glob as _glob

    got = rd.read_parquet(sorted(_glob.glob(f"{out}/shard=*/*.parquet"))).to_pandas()
    assert total_rows == len(got)
    from geocoding_toolbox_ray.config import HEADER

    assert set(HEADER) <= set(got.columns)
