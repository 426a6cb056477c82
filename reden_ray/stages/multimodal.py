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
* AVI (RIFF container, uncompressed 24-bit DIB frames) — encode/decode
  in struct + numpy (round 3; closes the last declared stub); features:
  width, height, frame count, fps, duration, brightness, inter-frame
  motion; ``sample_video_frames`` re-encodes sampled frames as BMP.

Codecs this container genuinely can't parse (JPEG/MP3/MP4) raise
``NotImplementedError`` unless ``fake_fallback=True`` substitutes the
deterministic fake — the declared environment limitation; the Ray-side
plumbing (schema, batch sizing, actor signature, output layout) is
identical to the real-codec path and tested.

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


def _dib_rows(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> bottom-up BGR rows padded to 4 bytes (the
    DIB pixel layout shared by BMP files and uncompressed AVI frames)."""
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3
    bgr = pixels[::-1, :, ::-1]
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    return rows.tobytes()


def _undib_rows(data: bytes, w: int, h: int) -> np.ndarray:
    """Bottom-up padded BGR rows -> (H, W, 3) uint8 RGB."""
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8, count=row_size * h)
    rows = rows.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    return rows[::-1, :, ::-1].copy()


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """(N, H, W, 3) uint8 RGB -> uncompressed AVI (RIFF) bytes.

    Standard RIFF 'AVI ' layout: LIST hdrl {avih, LIST strl {strh
    'vids'/'DIB ', strf BITMAPINFOHEADER}} + LIST movi {'00db' DIB
    frames}. No index chunk (players tolerate its absence; our decoder
    walks movi directly)."""
    n, h, w, _ = frames.shape
    frame_bytes = [_dib_rows(f) for f in frames]
    frame_size = len(frame_bytes[0]) if frame_bytes else 0

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,   # dwMicroSecPerFrame
        frame_size * fps,   # dwMaxBytesPerSec
        0,                  # dwPaddingGranularity
        0,                  # dwFlags
        n,                  # dwTotalFrames
        0,                  # dwInitialFrames
        1,                  # dwStreams
        frame_size,         # dwSuggestedBufferSize
        w, h, 0, 0, 0, 0,   # dwWidth, dwHeight, dwReserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h",
        b"vids", b"DIB ",
        0, 0, 0,            # dwFlags, wPriority, wLanguage
        0,                  # dwInitialFrames
        1, fps,             # dwScale, dwRate -> fps = rate/scale
        0, n,               # dwStart, dwLength (frames)
        frame_size, 0, 0,   # dwSuggestedBufferSize, dwQuality, dwSampleSize
        0, 0, w, h,         # rcFrame
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 2835, 2835, 0, 0
    )

    def chunk(fcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) & 1 else b""
        return fcc + struct.pack("<I", len(data)) + data + pad

    def list_chunk(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    strl = list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = list_chunk(b"hdrl", chunk(b"avih", avih) + strl)
    movi = list_chunk(b"movi", b"".join(chunk(b"00db", fb) for fb in frame_bytes))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(payload: bytes) -> tuple[np.ndarray, float]:
    """Uncompressed AVI bytes -> ((N, H, W, 3) uint8 RGB, fps).

    Generic RIFF chunk walk: reads avih for dimensions, strh for the
    frame-rate rational, and every '00db'/'00dc' chunk under LIST movi
    as one DIB frame."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    w = h = 0
    usec_per_frame = 0
    rate, scale = 0, 1
    frames_raw: list[bytes] = []

    def walk(buf: bytes, start: int, end: int) -> None:
        nonlocal w, h, usec_per_frame, rate, scale
        pos = start
        while pos + 8 <= end:
            fcc = buf[pos:pos + 4]
            size = struct.unpack_from("<I", buf, pos + 4)[0]
            data_start = pos + 8
            if fcc == b"LIST":
                walk(buf, data_start + 4, data_start + size)  # skip list kind
            elif fcc == b"avih":
                usec_per_frame = struct.unpack_from("<I", buf, data_start)[0]
                w, h = struct.unpack_from("<II", buf, data_start + 32)
            elif fcc == b"strh":
                if buf[data_start:data_start + 4] == b"vids":
                    scale, rate = struct.unpack_from("<II", buf, data_start + 20)
            elif fcc[2:4] in (b"db", b"dc") and size:
                frames_raw.append(buf[data_start:data_start + size])
            pos = data_start + size + (size & 1)  # chunks are word-aligned

    walk(payload, 12, 8 + struct.unpack_from("<I", payload, 4)[0])
    if not w or not h:
        raise ValueError("AVI header missing dimensions")
    fps = (rate / scale) if scale and rate else (
        1_000_000 / usec_per_frame if usec_per_frame else 0.0)
    frames = np.stack([_undib_rows(fr, w, h) for fr in frames_raw]) if frames_raw \
        else np.zeros((0, h, w, 3), dtype=np.uint8)
    return frames, fps


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


def video_features(payload: bytes) -> np.ndarray:
    """AVI -> [w, h, n_frames, fps, duration_s, brightness, motion, 0]."""
    frames, fps = decode_avi(payload)
    n = len(frames)
    h, w = (frames.shape[1], frames.shape[2]) if n else (0, 0)
    dur = n / fps if fps else 0.0
    bright = float(frames.mean()) / 255.0 if n else 0.0
    motion = (
        float(np.abs(np.diff(frames.astype(np.int16), axis=0)).mean()) / 255.0
        if n > 1 else 0.0
    )
    return np.array([w, h, n, fps, dur, bright, motion, 0.0], dtype=np.float32)


VIDEO_MIMES = ("video/avi", "video/x-msvideo")


def _fake_decode(payload: bytes, out_dim: int) -> np.ndarray:
    """Deterministic fake 'decode->feature' from payload bytes."""
    h = hashlib.blake2b(payload, digest_size=out_dim * 4 if out_dim <= 16 else 64).digest()
    raw = np.frombuffer((h * ((out_dim * 4) // len(h) + 1))[: out_dim * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


class MediaDecoder:
    """Actor-pool stage: media batches -> fixed-width feature vectors.

    REAL decode for mimes this container can parse (image/bmp,
    audio/wav, video/avi); other mimes (JPEG, MP3, MP4 — no codec libs
    here) raise unless ``fake_fallback=True`` substitutes the
    deterministic fake.
    """

    def __init__(self, fake_fallback: bool = False):
        self.fake_fallback = fake_fallback

    def _decode_one(self, mime: str, payload: bytes) -> np.ndarray:
        if mime == "image/bmp":
            return image_features(payload)
        if mime in ("audio/wav", "audio/x-wav"):
            return audio_features(payload)
        if mime in VIDEO_MIMES:
            return video_features(payload)
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


def decode_features(media_ds, feature_dim: int = FEATURE_DIM, fake: bool = False,
                    concurrency: int | tuple = (1, 2), batch_size: int = 64):
    """media Dataset -> (media_id, url, kind, feature) Dataset.

    Decodes BMP / WAV / AVI payloads for real; ``fake`` enables the
    deterministic-fake fallback for genuinely unparseable mimes. Drops
    the payload column in the output — shuffle-safe narrow rows.
    """
    return media_ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"fake_fallback": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class FrameSampler:
    """Actor-pool stage: AVI payloads -> up to ``k`` evenly-spaced
    frames per video, each re-encoded as a standalone BMP row (the
    frame-sample operator of a multimodal training-data pipeline).
    Non-video rows are dropped; output rows are (media_id, url,
    frame_idx, payload, width, height)."""

    def __init__(self, k: int = 4):
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        mids, urls, idxs, payloads, ws, hs = [], [], [], [], [], []
        for mid, url, mime, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("url").to_pylist(),
            batch.column("mime").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if mime not in VIDEO_MIMES:
                continue
            frames, _fps = decode_avi(payload)
            n = len(frames)
            if not n:
                continue
            take = np.unique(np.linspace(0, n - 1, min(self.k, n)).astype(int))
            for fi in take:
                px = frames[fi]
                mids.append(mid)
                urls.append(url)
                idxs.append(int(fi))
                payloads.append(encode_bmp(px))
                hs.append(px.shape[0])
                ws.append(px.shape[1])
        return pa.table({
            "media_id": pa.array(mids, pa.int64()),
            "url": pa.array(urls, pa.string()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
        })


def sample_video_frames(media_ds, k: int = 4,
                        concurrency: int | tuple = (1, 2), batch_size: int = 16):
    """media Dataset -> one BMP row per sampled video frame."""
    return media_ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"k": k},
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
    """Deterministic media rows with REAL BMP / WAV / AVI payloads."""
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
            w, h = 16, 12
            n_frames, fps = 4 + (i % 3) * 2, 10
            frames = rng.randint(0, 256, size=(n_frames, h, w, 3), dtype=np.uint8)
            rows["mime"].append("video/avi")
            rows["payload"].append(encode_avi(frames, fps=fps))
            rows["width"].append(w)
            rows["height"].append(h)
            rows["duration_ms"].append(n_frames * 1000 // fps)
    return pa.table(
        {name: pa.array(rows[name], MEDIA_SCHEMA.field(name).type)
         for name in MEDIA_SCHEMA.names}
    )
