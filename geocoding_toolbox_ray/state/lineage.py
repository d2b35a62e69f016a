"""Resumable partitioned output with per-partition lineage + metrics.

The reference has no checkpointing — a crash loses the run (SURVEY.md
§4.1).  At 10^12 documents that is unacceptable, so the web-scale sink is:

* the input is split into deterministic shards (file groups);
* each shard runs as its own bounded Dataset pipeline and writes to
  ``out_dir/shard=NNNNN/`` followed by a ``lineage.json`` sidecar
  (input files, row count, output bytes, wall seconds) — the sidecar is
  written LAST, so its presence marks the shard complete (atomic-enough on
  a real object store: write temp + rename);
* a rerun lists completed shards and skips them — only missing/failed
  shards recompute.

``resume_report`` aggregates the sidecars into the run-level metrics table
(rows, bytes, wall time per partition — SURVEY.md A4).
"""

from __future__ import annotations

import json
import time
from pathlib import Path


def shard_input_files(files: list[str], shard_size: int) -> list[list[str]]:
    files = sorted(files)
    return [files[i : i + shard_size] for i in range(0, len(files), shard_size)]


def _shard_dir(out_dir: str, shard_id: int) -> Path:
    return Path(out_dir) / f"shard={shard_id:05d}"


def _lineage_path(out_dir: str, shard_id: int) -> Path:
    return _shard_dir(out_dir, shard_id) / "lineage.json"


def completed_shards(out_dir: str) -> set[int]:
    out = set()
    root = Path(out_dir)
    if not root.exists():
        return out
    for p in root.glob("shard=*/lineage.json"):
        out.add(int(p.parent.name.split("=")[1]))
    return out


def resumable_write(
    input_files: list[str],
    build_pipeline,
    out_dir: str,
    *,
    shard_size: int = 16,
) -> dict:
    """Run ``build_pipeline(files) -> Dataset`` per input shard, skipping
    shards whose lineage sidecar already exists.  Returns a summary dict.

    ``build_pipeline`` receives the shard's file list and must return the
    transformed Dataset to write (streaming end-to-end within the shard).
    """
    shards = shard_input_files(input_files, shard_size)
    done = completed_shards(out_dir)
    ran, skipped = [], []
    for sid, files in enumerate(shards):
        if sid in done:
            skipped.append(sid)
            continue
        t0 = time.perf_counter()
        sdir = _shard_dir(out_dir, sid)
        if sdir.exists():  # failed/partial prior attempt: start clean
            import shutil

            shutil.rmtree(sdir)
        sdir.mkdir(parents=True, exist_ok=True)
        ds = build_pipeline(files)
        ds.write_parquet(str(sdir))
        out_bytes = 0
        rows = 0
        import pyarrow.parquet as pq

        for f in sdir.glob("*.parquet"):
            out_bytes += f.stat().st_size
            rows += pq.read_metadata(f).num_rows
        lineage = {
            "shard_id": sid,
            "input_files": files,
            "rows": rows,
            "output_bytes": out_bytes,
            "wall_seconds": round(time.perf_counter() - t0, 3),
        }
        tmp = _lineage_path(out_dir, sid).with_suffix(".tmp")
        tmp.write_text(json.dumps(lineage))
        tmp.rename(_lineage_path(out_dir, sid))
        ran.append(sid)
    return {"ran": ran, "skipped": skipped, "total_shards": len(shards)}


def resume_report(out_dir: str) -> list[dict]:
    """Per-partition metrics table from the lineage sidecars (A4)."""
    out = []
    for p in sorted(Path(out_dir).glob("shard=*/lineage.json")):
        out.append(json.loads(p.read_text()))
    return out
