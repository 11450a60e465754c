"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with sidecar metadata
columns; decode / resize / frame-sample run as actor-pool map_batches stages.
The decode kernels themselves are STUBBED (no image/audio libs in this
container — each stub either raises NotImplementedError or, with
``fake=True``, produces a deterministic fake) but the Ray-side plumbing —
schema, batch sizing, actor signature, output layout — is real and tested.

Batch-size note: binary payloads dominate block size; these stages should run
with small ``batch_size`` (e.g. 64) and ``target_max_block_size`` left at the
default so the streaming executor backpressures instead of OOMing.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),        # "image" | "audio" | "video"
        ("payload", pa.large_binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),        # -1 when unknown / not applicable
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def _payload_rng(payload: bytes) -> np.random.Generator:
    seed = int.from_bytes(
        hashlib.blake2b(payload, digest_size=8).digest(), "big"
    )
    return np.random.default_rng(seed)


class DecodeImage:
    """payload → feature vector. Real decode needs PIL/cv2 (absent here):
    ``fake=False`` raises NotImplementedError; ``fake=True`` emits a
    deterministic payload-seeded vector so downstream plumbing is testable."""

    def __init__(self, dim: int = 64, fake: bool = True):
        self.dim = dim
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = np.empty((len(payloads), self.dim), np.float32)
        for i, p in enumerate(payloads):
            if not self.fake:
                raise NotImplementedError(
                    "image decode requires PIL/cv2 — not available in this "
                    "environment; run with fake=True for plumbing tests"
                )
            feats[i] = _payload_rng(p or b"").standard_normal(self.dim)
        offs = pa.array(
            np.arange(0, (len(payloads) + 1) * self.dim, self.dim, dtype=np.int64),
            pa.int64(),
        )
        return pa.table(
            {
                "media_id": batch["media_id"],
                "feature": pa.LargeListArray.from_arrays(
                    offs, pa.array(feats.reshape(-1), pa.float32())
                ),
            }
        )


@dataclass
class ResizeImage:
    """payload → payload' (stub): records intended (w, h); fake mode passes
    the payload through and rewrites width/height metadata."""

    width: int = 256
    height: int = 256
    fake: bool = True

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("image resize requires PIL/cv2")
        n = len(batch)
        batch = batch.set_column(
            batch.schema.get_field_index("width"), "width",
            pa.array([self.width] * n, pa.int32()))
        return batch.set_column(
            batch.schema.get_field_index("height"), "height",
            pa.array([self.height] * n, pa.int32()))


@dataclass
class SampleFrames:
    """video payload → k frame payloads (stub): fake mode emits deterministic
    byte slices; preserves (media_id, frame_no) layout."""

    every_ms: int = 1000
    max_frames: int = 8
    fake: bool = True

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("video decode requires ffmpeg")
        ids, frame_no, frames = [], [], []
        for mid, p, dur in zip(
            batch["media_id"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["duration_ms"].to_pylist(),
        ):
            p = p or b""
            n = min(self.max_frames, max(1, (dur or 0) // self.every_ms or 1))
            for f in range(n):
                ids.append(mid)
                frame_no.append(f)
                lo = (f * max(1, len(p)) // max(1, n))
                frames.append(p[lo: lo + 16])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_no": pa.array(frame_no, pa.int32()),
                "frame": pa.array(frames, pa.large_binary()),
            }
        )


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows for plumbing tests."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, 64 + (i % 5) * 32, dtype=np.int64).astype(
            np.uint8).tobytes()
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append({"image": "image/jpeg", "audio": "audio/wav",
                             "video": "video/mp4"}[kind])
        rows["width"].append(640 if kind == "image" else -1)
        rows["height"].append(480 if kind == "image" else -1)
        rows["duration_ms"].append(5000 if kind != "image" else -1)
    return pa.table({k: pa.array(v, MEDIA_SCHEMA.field(k).type)
                     for k, v in rows.items()})
