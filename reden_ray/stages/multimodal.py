"""Multimodal columns: opaque binary payloads + typed metadata.

Images / audio / video are carried as Arrow ``binary`` columns with
sidecar metadata columns; decode / resize / feature-extract /
frame-sample are actor-pool ``map_batches`` stages.

Round 2 replaces the round-1 fake decoder with REAL pure-Python codecs
for two modalities (no external codec libs exist in this container):

* BMP (24-bit uncompressed) — encode/decode in numpy + struct;
  features: width, height, mean R/G/B, brightness, aspect;
  ``resize_images`` does nearest-neighbor resampling and re-encodes.
* WAV (16-bit PCM mono) — encode/decode via stdlib ``wave``;
  features: duration, RMS, peak, zero-crossing rate.

Video (and any codec this container can't parse, e.g. JPEG/MP3) stays
behind ``DecodeStub``: ``NotImplementedError`` unless ``fake=True``
runs the deterministic fake — the declared environment limitation; the
Ray-side plumbing (schema, batch sizing, actor signature, output
layout) is identical to the real-codec path and tested.

Batch-size guidance: payload bytes x batch_size x concurrency must fit
the worker heap; for ~1 MiB images use batch_size<=64. Blocks holding
binary payloads should not be shuffled — derive features first, then
drop the payload column (same narrow-rows-only rule as the html column
in stages/extract.py).
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    {
        "media_id": pa.int64(),
        "url": pa.string(),
        "kind": pa.string(),       # image | audio | video
        "mime": pa.string(),
        "payload": pa.binary(),
        "width": pa.int32(),       # -1 when unknown / not applicable
        "height": pa.int32(),
        "duration_ms": pa.int32(),
    }
)

FEATURE_DIM = 8  # fixed-width feature vector across modalities


# ---------------------------------------------------------------------------
# Pure-Python codecs (no external libs)
# ---------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit uncompressed BMP bytes."""
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    image_size = row_size * h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + image_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, image_size, 2835, 2835, 0, 0
    )
    # BMP stores bottom-up BGR rows
    bgr = pixels[::-1, :, ::-1]
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    return header + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> (H, W, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    if bpp != 24:
        raise ValueError(f"unsupported BMP bpp {bpp}")
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8,
                         count=row_size * abs(h), offset=data_offset)
    rows = rows.reshape(abs(h), row_size)[:, : w * 3].reshape(abs(h), w, 3)
    if h > 0:  # bottom-up
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """float32 [-1, 1] mono samples -> 16-bit PCM WAV bytes."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as fh:
        fh.setnchannels(1)
        fh.setsampwidth(2)
        fh.setframerate(rate)
        fh.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float32 mono samples in [-1, 1], sample rate)."""
    with wave.open(io.BytesIO(payload), "rb") as fh:
        rate = fh.getframerate()
        n = fh.getnframes()
        raw = fh.readframes(n)
        width = fh.getsampwidth()
        channels = fh.getnchannels()
    if width != 2:
        raise ValueError(f"unsupported WAV sample width {width}")
    pcm = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32767.0
    if channels > 1:
        pcm = pcm.reshape(-1, channels).mean(axis=1)
    return pcm, rate


def resize_nearest(pixels: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resample of an (H, W, 3) image (vectorized)."""
    h, w, _ = pixels.shape
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return pixels[ys][:, xs]


# ---------------------------------------------------------------------------
# Feature extraction (real codecs, per-modality)
# ---------------------------------------------------------------------------


def image_features(payload: bytes) -> np.ndarray:
    px = decode_bmp(payload)
    h, w, _ = px.shape
    mean = px.reshape(-1, 3).mean(axis=0) / 255.0
    return np.array(
        [w, h, mean[0], mean[1], mean[2], float(mean.mean()), w / max(1, h), 0.0],
        dtype=np.float32,
    )


def audio_features(payload: bytes) -> np.ndarray:
    pcm, rate = decode_wav(payload)
    n = len(pcm)
    dur = n / rate if rate else 0.0
    rms = float(np.sqrt(np.mean(pcm**2))) if n else 0.0
    peak = float(np.abs(pcm).max()) if n else 0.0
    zcr = float(np.mean(np.abs(np.diff(np.sign(pcm))) > 0)) if n > 1 else 0.0
    return np.array([dur, rms, peak, zcr, float(rate), float(n), 0.0, 0.0],
                    dtype=np.float32)


def _fake_decode(payload: bytes, out_dim: int) -> np.ndarray:
    """Deterministic fake 'decode->feature' from payload bytes."""
    h = hashlib.blake2b(payload, digest_size=out_dim * 4 if out_dim <= 16 else 64).digest()
    raw = np.frombuffer((h * ((out_dim * 4) // len(h) + 1))[: out_dim * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


class MediaDecoder:
    """Actor-pool stage: media batches -> fixed-width feature vectors.

    REAL decode for mimes this container can parse (image/bmp,
    audio/wav); other mimes (video containers, JPEG, MP3 — no codec
    libs here) fall back to ``DecodeStub`` semantics: raise unless
    ``fake_fallback=True``.
    """

    def __init__(self, fake_fallback: bool = False):
        self.fake_fallback = fake_fallback

    def _decode_one(self, mime: str, payload: bytes) -> np.ndarray:
        if mime == "image/bmp":
            return image_features(payload)
        if mime in ("audio/wav", "audio/x-wav"):
            return audio_features(payload)
        if self.fake_fallback:
            return _fake_decode(payload, FEATURE_DIM)
        raise NotImplementedError(
            f"no codec for {mime!r} in this environment; pass "
            "fake_fallback=True to exercise the plumbing"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self._decode_one(m, p)
            for m, p in zip(batch.column("mime").to_pylist(),
                            batch.column("payload").to_pylist())
        ]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "url": batch.column("url"),
                "kind": batch.column("kind"),
                "feature": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
            }
        )


class DecodeStub:
    """Round-1 compatible stage: fake-or-raise for every mime (kept for
    codecs the container cannot parse at all)."""

    def __init__(self, feature_dim: int = FEATURE_DIM, fake: bool = False):
        self.feature_dim = feature_dim
        self.fake = fake

    def _decode_one(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "media codecs are not available in this environment; "
                "construct DecodeStub(fake=True) for plumbing tests"
            )
        return _fake_decode(payload, self.feature_dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._decode_one(p) for p in batch.column("payload").to_pylist()]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "url": batch.column("url"),
                "kind": batch.column("kind"),
                "feature": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
            }
        )


def decode_features(media_ds, feature_dim: int = FEATURE_DIM, fake: bool = False,
                    concurrency: int | tuple = (1, 2), batch_size: int = 64,
                    real_codecs: bool = True):
    """media Dataset -> (media_id, url, kind, feature) Dataset.

    ``real_codecs=True`` decodes BMP/WAV payloads for real and uses
    ``fake`` only as the fallback for unparseable mimes. Drops the
    payload column in the output — shuffle-safe narrow rows.
    """
    if real_codecs:
        return media_ds.map_batches(
            MediaDecoder,
            fn_constructor_kwargs={"fake_fallback": fake},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=1,
        )
    return media_ds.map_batches(
        DecodeStub,
        fn_constructor_kwargs={"feature_dim": feature_dim, "fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class ImageResizer:
    """Actor-pool stage: BMP payloads -> resized BMP payloads (nearest
    neighbor, longest side capped at ``max_side``)."""

    def __init__(self, max_side: int = 64):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_payloads, widths, heights = [], [], []
        for mime, payload, w0, h0 in zip(batch.column("mime").to_pylist(),
                                         batch.column("payload").to_pylist(),
                                         batch.column("width").to_pylist(),
                                         batch.column("height").to_pylist()):
            if mime != "image/bmp":
                # pass-through rows keep their sidecar metadata intact
                out_payloads.append(payload)
                widths.append(w0)
                heights.append(h0)
                continue
            px = decode_bmp(payload)
            h, w, _ = px.shape
            scale = self.max_side / max(h, w)
            if scale < 1.0:
                nh, nw = max(1, int(h * scale)), max(1, int(w * scale))
                px = resize_nearest(px, nh, nw)
            out_payloads.append(encode_bmp(px))
            heights.append(px.shape[0])
            widths.append(px.shape[1])
        t = batch.set_column(batch.column_names.index("payload"), "payload",
                             pa.array(out_payloads, pa.binary()))
        t = t.set_column(t.column_names.index("width"), "width",
                         pa.array(widths, pa.int32()))
        return t.set_column(t.column_names.index("height"), "height",
                            pa.array(heights, pa.int32()))


def resize_images(media_ds, max_side: int = 64,
                  concurrency: int | tuple = (1, 2), batch_size: int = 64):
    return media_ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"max_side": max_side},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def synth_media_table(n: int = 32, seed: int = 5) -> pa.Table:
    """Deterministic media rows with REAL BMP / WAV payloads (video
    rows keep an opaque payload — no pure-Python video container)."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = {name: [] for name in MEDIA_SCHEMA.names}
    for i in range(n):
        kind = kinds[i % 3]
        rows["media_id"].append(i)
        rows["url"].append(f"https://media.example/{i}")
        rows["kind"].append(kind)
        if kind == "image":
            w, h = 16 + (i % 4) * 8, 12 + (i % 3) * 8
            px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
            rows["mime"].append("image/bmp")
            rows["payload"].append(encode_bmp(px))
            rows["width"].append(w)
            rows["height"].append(h)
            rows["duration_ms"].append(-1)
        elif kind == "audio":
            dur_ms = 250 + (i % 5) * 125
            t = np.arange(int(8000 * dur_ms / 1000)) / 8000.0
            samples = 0.5 * np.sin(2 * np.pi * (220 + 20 * i) * t).astype(np.float32)
            rows["mime"].append("audio/wav")
            rows["payload"].append(encode_wav(samples))
            rows["width"].append(-1)
            rows["height"].append(-1)
            rows["duration_ms"].append(dur_ms)
        else:
            rows["mime"].append("video/mp4")
            rows["payload"].append(rng.bytes(256))
            rows["width"].append(640)
            rows["height"].append(480)
            rows["duration_ms"].append(1000 + i)
    return pa.table(
        {name: pa.array(rows[name], MEDIA_SCHEMA.field(name).type)
         for name in MEDIA_SCHEMA.names}
    )
