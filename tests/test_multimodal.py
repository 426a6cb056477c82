"""Tests for multimodal stages: real BMP/WAV/AVI codecs + fake fallback."""

import numpy as np
import pytest

import ray.data as rd

from reden_ray.stages.multimodal import (
    decode_avi,
    decode_bmp,
    decode_features,
    decode_wav,
    encode_avi,
    encode_bmp,
    encode_wav,
    resize_images,
    resize_nearest,
    sample_video_frames,
    synth_media_table,
    video_features,
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

    def test_avi_roundtrip(self):
        rng = np.random.RandomState(9)
        frames = rng.randint(0, 256, size=(5, 11, 17, 3), dtype=np.uint8)  # odd w
        got, fps = decode_avi(encode_avi(frames, fps=12))
        assert fps == 12.0
        assert got.shape == frames.shape
        assert (got == frames).all()

    def test_avi_features(self):
        frames = np.zeros((4, 8, 10, 3), dtype=np.uint8)
        frames[2:] = 255  # one big jump -> nonzero motion
        f = video_features(encode_avi(frames, fps=8))
        assert int(f[0]) == 10 and int(f[1]) == 8  # w, h
        assert int(f[2]) == 4 and f[3] == 8.0      # frames, fps
        assert abs(f[4] - 0.5) < 1e-6              # duration
        assert abs(f[5] - 0.5) < 1e-2              # brightness
        assert f[6] > 0.2                          # motion

    def test_avi_rejects_garbage(self):
        with pytest.raises(ValueError):
            decode_avi(b"not an avi at all, just bytes" * 4)


class TestPlumbing:
    def test_real_decode_schema_and_values(self):
        media = rd.from_arrow(synth_media_table(n=12))
        out = decode_features(media, fake=False).to_pandas()  # ALL mimes real now
        assert len(out) == 12
        assert set(out.columns) == {"media_id", "url", "kind", "feature"}
        assert all(len(f) == 8 for f in out["feature"])
        by_id = dict(zip(out["media_id"], out["feature"]))
        img = synth_media_table(n=12).to_pylist()
        for r in img:
            f = by_id[r["media_id"]]
            if r["kind"] == "image":
                # feature[0:2] = real decoded width/height
                assert int(f[0]) == r["width"] and int(f[1]) == r["height"]
            if r["kind"] == "audio":
                assert abs(f[0] * 1000 - r["duration_ms"]) < 1.0  # duration
                assert 0.2 < f[1] < 0.5  # RMS of a 0.5-amplitude sine ~ 0.35
            if r["kind"] == "video":
                assert int(f[0]) == r["width"] and int(f[1]) == r["height"]
                assert abs(f[4] * 1000 - r["duration_ms"]) < 1.0  # duration

    def test_decode_determinism(self):
        def run():
            out = decode_features(rd.from_arrow(synth_media_table(n=12)),
                                  fake=True).to_pandas()
            return sorted(map(tuple, zip(out["media_id"], out["feature"].map(tuple))))

        assert run() == run()

    def test_unparseable_mime_raises_without_fallback(self):
        # an mp4 row: no pure-Python parser for it in this container
        t = synth_media_table(n=1)
        t = t.set_column(t.column_names.index("mime"), "mime",
                         __import__("pyarrow").array(["video/mp4"]))
        with pytest.raises(Exception, match="no codec|NotImplementedError"):
            decode_features(rd.from_arrow(t), fake=False).to_pandas()

    def test_unparseable_mime_fake_fallback(self):
        t = synth_media_table(n=1)
        t = t.set_column(t.column_names.index("mime"), "mime",
                         __import__("pyarrow").array(["video/mp4"]))
        out = decode_features(rd.from_arrow(t), fake=True).to_pandas()
        assert len(out) == 1 and len(out["feature"][0]) == 8

    def test_frame_sampling(self):
        media = rd.from_arrow(synth_media_table(n=12))  # 4 video rows
        out = sample_video_frames(media, k=3).to_pandas()
        assert set(out.columns) == {"media_id", "url", "frame_idx", "payload",
                                    "width", "height"}
        videos = {r["media_id"]: r for r in synth_media_table(n=12).to_pylist()
                  if r["kind"] == "video"}
        assert set(out["media_id"]) == set(videos)
        for mid, grp in out.groupby("media_id"):
            assert len(grp) == 3  # every synth video has >= 4 frames
            assert list(grp["frame_idx"]) == sorted(grp["frame_idx"])
            for _, row in grp.iterrows():
                px = decode_bmp(row["payload"])  # sampled frames are real BMPs
                assert px.shape == (videos[mid]["height"], videos[mid]["width"], 3)

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
