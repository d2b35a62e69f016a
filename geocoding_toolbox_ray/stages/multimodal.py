"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns next to
typed metadata columns (media_type, width/height or sample_rate, byte
size).  The Ray-side plumbing — schema, actor-pool stage shape, small
batch sizes for wide binary rows, output layout — is real and tested; the
actual codec work is stubbed behind ``Decoder`` implementations because
no image/audio library ships in this container:

* ``FakeDeterministicDecoder`` (default) — derives a fixed-length feature
  vector from the payload bytes (crc-seeded), deterministic so tests can
  assert end-to-end.
* ``PillowImageDecoder`` — real decode path, used automatically when PIL
  imports; raises ``NotImplementedError`` here otherwise.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),   # 'image' | 'audio' | 'video'
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_bytes", pa.int64()),
    ]
)

FEATURE_DIM = 16


class FakeDeterministicDecoder:
    """Stub codec: feature vector seeded from payload bytes (crc32)."""

    def decode_features(self, payload: bytes) -> np.ndarray:
        seed = zlib.crc32(payload)
        rng = np.random.RandomState(seed & 0x7FFFFFFF)
        return rng.standard_normal(FEATURE_DIM).astype(np.float32)

    def thumbnail(self, payload: bytes, w: int, h: int) -> bytes:
        # deterministic fake resize: crc-stamped header + truncated payload
        return zlib.crc32(payload).to_bytes(4, "little") + payload[: w * h]


class PillowImageDecoder:
    """Real image decode path (PIL); raises ``NotImplementedError`` at
    construction when PIL is absent (this sandbox) so callers fall back
    to ``FakeDeterministicDecoder`` explicitly.

    Features: decode -> grayscale -> 4x4 box-resize -> the 16 cell means
    scaled to [0, 1] (deterministic, interpolation-free).  Thumbnail:
    decode -> RGB resize (nearest, deterministic) -> PNG bytes.
    """

    def __init__(self):
        try:
            from PIL import Image
        except ImportError as exc:  # pragma: no cover - PIL absent in sandbox
            raise NotImplementedError(
                "PillowImageDecoder requires PIL; use FakeDeterministicDecoder"
            ) from exc
        self._Image = Image

    def decode_features(self, payload: bytes) -> np.ndarray:  # pragma: no cover - needs PIL
        import io

        side = int(FEATURE_DIM**0.5)  # 16 -> 4x4 grid
        img = self._Image.open(io.BytesIO(payload)).convert("L")
        small = img.resize((side, side), self._Image.BOX)
        return (np.asarray(small, np.float32) / 255.0).reshape(FEATURE_DIM)

    def thumbnail(self, payload: bytes, w: int, h: int) -> bytes:  # pragma: no cover - needs PIL
        import io

        img = self._Image.open(io.BytesIO(payload)).convert("RGB")
        out = io.BytesIO()
        img.resize((w, h), self._Image.NEAREST).save(out, format="PNG")
        return out.getvalue()


class MediaFeatureStage:
    """Actor stage: payload -> feature vector column (list<float32>).

    Batch sizes must stay small for wide binary rows (SURVEY.md memory
    guidance): pass ``batch_size<=256`` when payloads are MB-scale.
    """

    def __init__(self, decoder=None):
        self.decoder = decoder or FakeDeterministicDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = np.stack([self.decoder.decode_features(p) for p in payloads])
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "features": pa.array(list(feats), pa.list_(pa.float32())),
                "n_bytes": batch["n_bytes"],
            }
        )


class FrameSampleStage:
    """Actor stage: sample every k-th 'frame' (fixed-size byte window) of a
    video payload into its own row — 1 row in, 0..N rows out."""

    def __init__(self, frame_bytes: int = 256, every: int = 4):
        self.frame_bytes = frame_bytes
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, idxs = [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
            n_frames = max(1, len(payload) // self.frame_bytes)
            for fi in range(0, n_frames, self.every):
                ids.append(mid)
                idxs.append(fi)
                frames.append(payload[fi * self.frame_bytes : (fi + 1) * self.frame_bytes])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_index": pa.array(idxs, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def synthetic_media_table(n: int) -> pa.Table:
    """Deterministic media fixture (payload = seeded bytes)."""
    ids = np.arange(n, dtype=np.int64)
    types = np.array(["image", "audio", "video"], object)[ids % 3]
    payloads = [
        (zlib.crc32(str(i).encode()).to_bytes(4, "little") * (64 + int(i) % 32))
        for i in ids
    ]
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(types, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array((64 + ids % 64).astype(np.int32), pa.int32()),
            "height": pa.array((64 + ids % 48).astype(np.int32), pa.int32()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        },
        schema=MEDIA_SCHEMA,
    )
