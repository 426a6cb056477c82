"""Equivalence: packed per-url linking path vs row-form path."""

import numpy as np
import pytest

from reden_ray.pipelines.nel import NELPipeline


@pytest.fixture(scope="module")
def both(unit_fixture):
    p = NELPipeline(unit_fixture)
    row = p.links(p.candidates()).to_pandas()
    packed = p.links(mentions_ds=p.mentions()).to_pandas()
    return row, packed


class TestPackedEquivalence:
    def test_same_links(self, both):
        row, packed = both
        key = ["url", "mention_id"]
        a = row.sort_values(key).reset_index(drop=True)
        b = packed.sort_values(key).reset_index(drop=True)
        assert len(a) == len(b)
        assert (a["uri"].values == b["uri"].values).all()
        assert (a["surface"].values == b["surface"].values).all()
        an, bn = a["score"].isna(), b["score"].isna()
        assert (an.values == bn.values).all()
        assert np.allclose(a["score"][~an], b["score"][~bn.values])

    def test_all_uris_match(self, both):
        row, packed = both
        key = ["url", "mention_id"]
        a = row.sort_values(key).reset_index(drop=True)
        b = packed.sort_values(key).reset_index(drop=True)
        assert all(list(x) == list(y) for x, y in zip(a["all_uris"], b["all_uris"]))
