"""Tests for multimodal plumbing (stubbed codecs)."""

import pytest

import ray.data as rd

from reden_ray.stages.multimodal import (
    DecodeStub,
    decode_features,
    synth_media_table,
)


class TestPlumbing:
    def test_fake_decode_schema_and_determinism(self):
        media = rd.from_arrow(synth_media_table(n=12))
        out = decode_features(media, feature_dim=8, fake=True).to_pandas()
        assert len(out) == 12
        assert set(out.columns) == {"media_id", "url", "kind", "feature"}
        assert all(len(f) == 8 for f in out["feature"])
        out2 = decode_features(rd.from_arrow(synth_media_table(n=12)),
                               feature_dim=8, fake=True).to_pandas()
        a = sorted(map(tuple, zip(out["media_id"], out["feature"].map(tuple))))
        b = sorted(map(tuple, zip(out2["media_id"], out2["feature"].map(tuple))))
        assert a == b

    def test_real_codec_path_raises_not_implemented(self):
        stub = DecodeStub(fake=False)
        with pytest.raises(NotImplementedError):
            stub._decode_one(b"payload")

    def test_payload_column_dropped(self):
        media = rd.from_arrow(synth_media_table(n=4))
        out = decode_features(media, fake=True)
        assert "payload" not in out.schema().names
