"""Multimodal columns: opaque binary payloads + typed metadata.

Images / audio / video are carried as Arrow ``binary`` columns with
sidecar metadata columns; decode / resize / feature-extract /
frame-sample are actor-pool ``map_batches`` stages. The decode codecs
(PIL/ffmpeg/librosa) are NOT available in this container, so the codec
call itself is stubbed: ``DecodeStub`` raises ``NotImplementedError``
unless constructed with ``fake=True``, in which case a deterministic
fake decoder exercises the full Ray-side plumbing (schema, batch
sizing, actor signature, output layout) — which is the part this repo
owns and tests.

Batch-size guidance: payload bytes x batch_size x concurrency must fit
the worker heap; for ~1 MiB images use batch_size<=64. Blocks holding
binary payloads should not be shuffled — derive features first, then
drop the payload column (same narrow-rows-only rule as the html column
in stages/extract.py).
"""

from __future__ import annotations

import hashlib

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


def _fake_decode(payload: bytes, out_dim: int) -> np.ndarray:
    """Deterministic fake 'decode->feature' from payload bytes."""
    h = hashlib.blake2b(payload, digest_size=out_dim * 4 if out_dim <= 16 else 64).digest()
    raw = np.frombuffer((h * ((out_dim * 4) // len(h) + 1))[: out_dim * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


class DecodeStub:
    """Actor-pool stage: media batches -> feature vectors.

    Real deployment: replace ``_decode_one`` with the codec call (PIL /
    torchaudio / pyav), loaded once in ``__init__``. Here the codec is
    unavailable: ``fake=False`` raises NotImplementedError at first
    batch; ``fake=True`` runs the deterministic fake.
    """

    def __init__(self, feature_dim: int = 8, fake: bool = False):
        self.feature_dim = feature_dim
        self.fake = fake
        # real impl: self.model = load_model_once()

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


def decode_features(media_ds, feature_dim: int = 8, fake: bool = False,
                    concurrency: int | tuple = (1, 2), batch_size: int = 64):
    """media Dataset -> (media_id, url, kind, feature) Dataset.

    Drops the payload column in the output — shuffle-safe narrow rows.
    """
    return media_ds.map_batches(
        DecodeStub,
        fn_constructor_kwargs={"feature_dim": feature_dim, "fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def synth_media_table(n: int = 32, seed: int = 5) -> pa.Table:
    """Deterministic fake media rows for plumbing tests."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = {
        "media_id": list(range(n)),
        "url": [f"https://media.example/{i}" for i in range(n)],
        "kind": [kinds[i % 3] for i in range(n)],
        "mime": ["application/octet-stream"] * n,
        "payload": [rng.bytes(128 + (i % 5) * 64) for i in range(n)],
        "width": [(-1 if i % 3 else 640) for i in range(n)],
        "height": [(-1 if i % 3 else 480) for i in range(n)],
        "duration_ms": [(-1 if i % 3 == 0 else 1000 + i) for i in range(n)],
    }
    return pa.table(
        {name: pa.array(rows[name], MEDIA_SCHEMA.field(name).type) for name in MEDIA_SCHEMA.names}
    )
