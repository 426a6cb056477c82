"""Tests for multimodal stages: real BMP/WAV codecs + stubbed fallback."""

import numpy as np
import pytest

import ray.data as rd

from reden_ray.stages.multimodal import (
    DecodeStub,
    decode_bmp,
    decode_features,
    decode_wav,
    encode_bmp,
    encode_wav,
    resize_images,
    resize_nearest,
    synth_media_table,
)


class TestCodecs:
    def test_bmp_roundtrip(self):
        rng = np.random.RandomState(3)
        px = rng.randint(0, 256, size=(13, 17, 3), dtype=np.uint8)  # odd width: padding
        assert (decode_bmp(encode_bmp(px)) == px).all()

    def test_wav_roundtrip(self):
        t = np.arange(800) / 8000.0
        samples = 0.25 * np.sin(2 * np.pi * 440 * t).astype(np.float32)
        pcm, rate = decode_wav(encode_wav(samples, rate=8000))
        assert rate == 8000
        assert len(pcm) == 800
        assert np.abs(pcm - samples).max() < 1e-3  # 16-bit quantization

    def test_resize_nearest(self):
        px = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
        small = resize_nearest(px, 2, 3)
        assert small.shape == (2, 3, 3)
        assert (small[0, 0] == px[0, 0]).all()


class TestPlumbing:
    def test_real_decode_schema_and_values(self):
        media = rd.from_arrow(synth_media_table(n=12))
        out = decode_features(media, fake=True).to_pandas()  # fake only for video
        assert len(out) == 12
        assert set(out.columns) == {"media_id", "url", "kind", "feature"}
        assert all(len(f) == 8 for f in out["feature"])
        by_id = dict(zip(out["media_id"], out["feature"]))
        # image rows: feature[0:2] = real decoded width/height
        img = synth_media_table(n=12).to_pylist()
        for r in img:
            if r["kind"] == "image":
                f = by_id[r["media_id"]]
                assert int(f[0]) == r["width"] and int(f[1]) == r["height"]
            if r["kind"] == "audio":
                f = by_id[r["media_id"]]
                assert abs(f[0] * 1000 - r["duration_ms"]) < 1.0  # duration
                assert 0.2 < f[1] < 0.5  # RMS of a 0.5-amplitude sine ~ 0.35

    def test_decode_determinism(self):
        def run():
            out = decode_features(rd.from_arrow(synth_media_table(n=12)),
                                  fake=True).to_pandas()
            return sorted(map(tuple, zip(out["media_id"], out["feature"].map(tuple))))

        assert run() == run()

    def test_unparseable_mime_raises_without_fallback(self):
        media = rd.from_arrow(synth_media_table(n=3))  # row 2 is video/mp4
        with pytest.raises(Exception, match="no codec|NotImplementedError"):
            decode_features(media, fake=False).to_pandas()

    def test_stub_raises_not_implemented(self):
        stub = DecodeStub(fake=False)
        with pytest.raises(NotImplementedError):
            stub._decode_one(b"payload")

    def test_payload_column_dropped(self):
        media = rd.from_arrow(synth_media_table(n=4))
        out = decode_features(media, fake=True)
        assert "payload" not in out.schema().names

    def test_resize_images_caps_longest_side(self):
        media = rd.from_arrow(synth_media_table(n=6))
        out = resize_images(media, max_side=10).to_pandas()
        imgs = out[out["kind"] == "image"]
        assert (imgs["width"].clip(lower=0) <= 10).all()
        assert (imgs["height"].clip(lower=0) <= 10).all()
        # resized payloads still decode
        for p in imgs["payload"]:
            decode_bmp(p)
