"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with sidecar metadata
columns; decode / resize / frame-sample run as actor-pool map_batches stages.

Decode kernels are REAL for every format decodable without native media
libraries (none are installed in this container):

- image: PPM (P6) and uncompressed 24-bit BMP — pure numpy parsers;
- audio: WAV PCM via the stdlib ``wave`` module;
- video: a raw-frames container (``video/x-raw``: 16-byte header
  ``u32le width, height, fps, n_frames`` + concatenated RGB24 frames).

Compressed formats (JPEG/PNG/MP4/…) require PIL/ffmpeg and remain stubbed:
``fake=False`` raises NotImplementedError for them, ``fake=True`` produces a
deterministic payload-seeded vector so plumbing stays testable either way.

Batch-size note: binary payloads dominate block size; these stages should run
with small ``batch_size`` (e.g. 64) and ``target_max_block_size`` left at the
default so the streaming executor backpressures instead of OOMing.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
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

RAW_VIDEO_MAGIC = 0x52564944  # "RVID" — our raw-frames container tag


# ---------------------------------------------------------------------------
# codecs (pure numpy / stdlib)
# ---------------------------------------------------------------------------

def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → P6 PPM bytes."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """P6 PPM → (h, w, 3) uint8. Handles comments and arbitrary whitespace."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos: pos + 1].isspace():
            pos += 1
        if payload[pos: pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos: pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval 255 supported")
    data = np.frombuffer(payload, np.uint8, count=w * h * 3, offset=pos)
    return data.reshape(h, w, 3).copy()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP → (h, w, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, np.uint8, count=stride * h, offset=data_off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if flip:
        rows = rows[::-1]
    return rows[..., ::-1].copy()  # BGR → RGB


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV PCM → (mono float32 waveform in [-1, 1], sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        nch, sw, rate, n = (f.getnchannels(), f.getsampwidth(),
                            f.getframerate(), f.getnframes())
        raw = f.readframes(n)
    if sw == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif sw == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {sw}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, rate


def encode_raw_video(frames: np.ndarray, fps: int = 10) -> bytes:
    """(n, h, w, 3) uint8 → video/x-raw payload."""
    n, h, w = frames.shape[:3]
    header = struct.pack("<IIIII", RAW_VIDEO_MAGIC, w, h, fps, n)
    return header + frames.astype(np.uint8).tobytes()


def decode_raw_video(payload: bytes) -> tuple[np.ndarray, int]:
    """video/x-raw payload → ((n, h, w, 3) uint8, fps)."""
    magic, w, h, fps, n = struct.unpack_from("<IIIII", payload, 0)
    if magic != RAW_VIDEO_MAGIC:
        raise ValueError("not an x-raw video payload")
    data = np.frombuffer(payload, np.uint8, count=n * h * w * 3, offset=20)
    return data.reshape(n, h, w, 3).copy(), fps


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize, deterministic, pure numpy indexing."""
    h, w = img.shape[:2]
    yi = (np.arange(height) * h // height).clip(0, h - 1)
    xi = (np.arange(width) * w // width).clip(0, w - 1)
    return img[yi[:, None], xi[None, :]]


def _image_features(img: np.ndarray, dim: int) -> np.ndarray:
    """Deterministic feature vector: grayscale thumbnail resampled to
    ``dim`` cells, scaled to [0, 1]."""
    gray = img.astype(np.float32).mean(axis=2)
    side = max(1, int(np.sqrt(dim)))
    thumb = resize_nearest(gray[..., None], side, side)[..., 0]
    flat = thumb.reshape(-1) / 255.0
    out = np.zeros(dim, np.float32)
    out[: len(flat[:dim])] = flat[:dim]
    return out


def _payload_rng(payload: bytes) -> np.random.Generator:
    seed = int.from_bytes(
        hashlib.blake2b(payload, digest_size=8).digest(), "big"
    )
    return np.random.default_rng(seed)


_IMAGE_DECODERS = {
    "image/x-portable-pixmap": decode_ppm,
    "image/bmp": decode_bmp,
}


# ---------------------------------------------------------------------------
# stages
# ---------------------------------------------------------------------------

class DecodeImage:
    """payload → feature vector (list<float32>).

    PPM / BMP payloads decode for real (numpy parsers) into a grayscale
    thumbnail feature. Compressed formats need PIL/cv2 (absent here):
    ``fake=True`` falls back to a deterministic payload-seeded vector,
    ``fake=False`` raises NotImplementedError for them."""

    def __init__(self, dim: int = 64, fake: bool = True):
        self.dim = dim
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        mimes = batch["mime"].to_pylist()
        feats = np.empty((len(payloads), self.dim), np.float32)
        for i, (p, mime) in enumerate(zip(payloads, mimes)):
            dec = _IMAGE_DECODERS.get(mime or "")
            if dec is not None:
                feats[i] = _image_features(dec(p), self.dim)
            elif self.fake:
                feats[i] = _payload_rng(p or b"").standard_normal(self.dim)
            else:
                raise NotImplementedError(
                    f"decoding {mime!r} requires PIL/cv2 — not available in "
                    "this environment (PPM/BMP decode natively)")
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
    """payload → payload' at (width, height). PPM / BMP resize for real
    (nearest-neighbor, re-encoded as PPM); compressed formats pass through
    with metadata rewritten when ``fake=True``, else raise."""

    width: int = 256
    height: int = 256
    fake: bool = True

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        mimes = batch["mime"].to_pylist()
        out_payloads, out_mimes = [], []
        for p, mime in zip(payloads, mimes):
            dec = _IMAGE_DECODERS.get(mime or "")
            if dec is not None:
                img = resize_nearest(dec(p), self.width, self.height)
                out_payloads.append(encode_ppm(img))
                out_mimes.append("image/x-portable-pixmap")
            elif self.fake:
                out_payloads.append(p)
                out_mimes.append(mime)
            else:
                raise NotImplementedError(f"resizing {mime!r} requires PIL/cv2")
        n = len(batch)
        batch = batch.set_column(
            batch.schema.get_field_index("payload"), "payload",
            pa.array(out_payloads, pa.large_binary()))
        batch = batch.set_column(
            batch.schema.get_field_index("mime"), "mime",
            pa.array(out_mimes, pa.string()))
        batch = batch.set_column(
            batch.schema.get_field_index("width"), "width",
            pa.array([self.width] * n, pa.int32()))
        return batch.set_column(
            batch.schema.get_field_index("height"), "height",
            pa.array([self.height] * n, pa.int32()))


class DecodeAudio:
    """WAV payload → (n_samples, sample_rate, rms, zero-crossing rate) +
    a fixed-dim mean-pooled envelope vector. Real stdlib decode; compressed
    audio raises (no codecs in this container)."""

    def __init__(self, dim: int = 32):
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        n = len(payloads)
        n_samples = np.zeros(n, np.int64)
        rate = np.zeros(n, np.int32)
        rms = np.zeros(n, np.float64)
        zcr = np.zeros(n, np.float64)
        env = np.zeros((n, self.dim), np.float32)
        for i, p in enumerate(payloads):
            x, r = decode_wav(p)
            n_samples[i], rate[i] = len(x), r
            if len(x):
                rms[i] = float(np.sqrt(np.mean(x ** 2)))
                zcr[i] = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                cells = np.array_split(np.abs(x), self.dim)
                env[i] = [float(c.mean()) if len(c) else 0.0 for c in cells]
        offs = pa.array(np.arange(0, (n + 1) * self.dim, self.dim,
                                  dtype=np.int64), pa.int64())
        return pa.table({
            "media_id": batch["media_id"],
            "n_samples": pa.array(n_samples, pa.int64()),
            "sample_rate": pa.array(rate, pa.int32()),
            "rms": pa.array(rms, pa.float64()),
            "zcr": pa.array(zcr, pa.float64()),
            "envelope": pa.LargeListArray.from_arrays(
                offs, pa.array(env.reshape(-1), pa.float32())),
        })


@dataclass
class SampleFrames:
    """video payload → sampled frame payloads (one row per frame).

    ``video/x-raw`` payloads sample for real: every ``every_ms`` by the
    container's fps, capped at ``max_frames``, each frame re-encoded as PPM.
    Compressed video needs ffmpeg: fake mode emits deterministic byte
    slices, else raises."""

    every_ms: int = 1000
    max_frames: int = 8
    fake: bool = True

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_no, frames = [], [], []
        for mid, p, mime, dur in zip(
            batch["media_id"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["mime"].to_pylist(),
            batch["duration_ms"].to_pylist(),
        ):
            if mime == "video/x-raw":
                vid, fps = decode_raw_video(p)
                step = max(1, int(round(fps * self.every_ms / 1000.0)))
                take = list(range(0, len(vid), step))[: self.max_frames]
                for f_idx, src in enumerate(take):
                    ids.append(mid)
                    frame_no.append(f_idx)
                    frames.append(encode_ppm(vid[src]))
                continue
            if not self.fake:
                raise NotImplementedError(
                    f"decoding {mime!r} requires ffmpeg (x-raw decodes "
                    "natively)")
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


class MediaFeatures:
    """Actor-pool map_batches stage: media rows → deterministic QA
    features through the REAL decode kernels (the features every corpus
    audit computes before training on media): image mean brightness
    (float64 mean over all RGB channel values) and audio RMS (decoded
    waveform cast to float64 before the mean — int16/32768 values are
    exact in float32, and the float64 accumulation keeps the result
    bit-stable against a SQL double oracle). A feature that does not
    apply to the row's kind is 0.0 (frozen — avoids nullable-column
    hashing ambiguity in the driver compare)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        mimes = batch["mime"].to_pylist()
        n = len(payloads)
        brightness = np.zeros(n, np.float64)
        rms = np.zeros(n, np.float64)
        for i, (p, mime) in enumerate(zip(payloads, mimes)):
            dec = _IMAGE_DECODERS.get(mime or "")
            if dec is not None:
                brightness[i] = float(dec(p).astype(np.float64).mean())
            elif mime == "audio/wav":
                x, _ = decode_wav(p)
                if len(x):
                    x64 = x.astype(np.float64)
                    rms[i] = float(np.sqrt(np.mean(x64 * x64)))
            else:
                raise NotImplementedError(
                    f"features for {mime!r} need PIL/ffmpeg — not in this "
                    "container (PPM/BMP/WAV compute natively)")
        return pa.table({
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "brightness": pa.array(brightness, pa.float64()),
            "rms": pa.array(rms, pa.float64()),
        })


def synth_media_for_ids(ids: np.ndarray) -> pa.Table:
    """Closed-form media payloads per integer id — every byte is a pure
    arithmetic function of (id, position), so a SQL oracle can recompute
    the decoded features without any media library:

    - image row: 16×16 P6 PPM, channel value j (raster order, j in
      0..767) = ``(id*37 + j) % 251``;
    - audio row: 1024-sample 16-bit mono WAV @8kHz, sample i =
      ``((id*13 + i) % 201) - 100``.

    Returns MEDIA_SCHEMA rows, two per id (image + audio)."""
    ids = np.asarray(ids, np.int64)
    n = len(ids)
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    jj = np.arange(16 * 16 * 3, dtype=np.int64)
    ii = np.arange(1024, dtype=np.int64)
    pix = ((ids[:, None] * 37 + jj[None, :]) % 251).astype(np.uint8)
    smp = (((ids[:, None] * 13 + ii[None, :]) % 201) - 100).astype(np.int16)
    for r in range(n):
        rows["media_id"].append(int(ids[r]))
        rows["kind"].append("image")
        rows["payload"].append(encode_ppm(pix[r].reshape(16, 16, 3)))
        rows["mime"].append("image/x-portable-pixmap")
        rows["width"].append(16)
        rows["height"].append(16)
        rows["duration_ms"].append(-1)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(8000)
            f.writeframes(smp[r].tobytes())
        rows["media_id"].append(int(ids[r]))
        rows["kind"].append("audio")
        rows["payload"].append(buf.getvalue())
        rows["mime"].append("audio/wav")
        rows["width"].append(-1)
        rows["height"].append(-1)
        rows["duration_ms"].append(128)
        del buf
    return pa.table({k: pa.array(v, MEDIA_SCHEMA.field(k).type)
                     for k, v in rows.items()})


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic media rows with REAL decodable payloads: P6 images,
    16-bit PCM WAV audio, x-raw video."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w, h = 32 + (i % 4) * 8, 24 + (i % 3) * 8
            img = rng.integers(0, 256, (h, w, 3), dtype=np.int64).astype(np.uint8)
            payload, mime = encode_ppm(img), "image/x-portable-pixmap"
            width, height, dur = w, h, -1
        elif kind == "audio":
            r, sec = 8000, 1 + (i % 2)
            t = np.arange(r * sec) / r
            x = (0.5 * np.sin(2 * np.pi * (220 + 20 * (i % 5)) * t) * 32767
                 ).astype(np.int16)
            buf = io.BytesIO()
            with wave.open(buf, "wb") as f:
                f.setnchannels(1)
                f.setsampwidth(2)
                f.setframerate(r)
                f.writeframes(x.tobytes())
            payload, mime = buf.getvalue(), "audio/wav"
            width, height, dur = -1, -1, sec * 1000
        else:
            fps, nf, w, h = 10, 20 + (i % 3) * 10, 16, 12
            vid = rng.integers(0, 256, (nf, h, w, 3), dtype=np.int64).astype(
                np.uint8)
            payload, mime = encode_raw_video(vid, fps), "video/x-raw"
            width, height, dur = w, h, nf * 1000 // fps
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append(mime)
        rows["width"].append(width)
        rows["height"].append(height)
        rows["duration_ms"].append(dur)
    return pa.table({k: pa.array(v, MEDIA_SCHEMA.field(k).type)
                     for k, v in rows.items()})
