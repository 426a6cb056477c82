"""Incremental crawl -> KG: delta linking + carry-forward must equal a
from-scratch run on the new snapshot, on both url-filter routes."""

import sys

import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

from reden_ray.pipelines.incremental import incremental_triples  # noqa: E402
from reden_ray.pipelines.webdemo import (  # noqa: E402
    nel_pipeline_over_documents,
    pages_from_documents,
)
from reden_ray.pipelines.webops import snapshot_b_pages  # noqa: E402

SF = "/root/testdata/sf0.001"


def _triples_df(ds) -> pd.DataFrame:
    df = ds.to_pandas() if not isinstance(ds, pd.DataFrame) else ds
    return df.sort_values(["subj", "pred", "obj"],
                          kind="stable").reset_index(drop=True)


@pytest.fixture(scope="module")
def full_on_b():
    """From-scratch run on snapshot B — the ground truth."""
    p, _ = nel_pipeline_over_documents(SF)
    pages_b = snapshot_b_pages(SF)
    links = p.links(mentions_ds=p.mentions(p.texts(pages_b)))
    return _triples_df(p.triples(links))


@pytest.fixture(scope="module")
def prev_state():
    p, pages_a = nel_pipeline_over_documents(SF)
    prev_links = p.links(
        mentions_ds=p.mentions(p.texts(pages_a))).materialize()
    return p, prev_links


class TestIncrementalEqualsFull:
    def test_broadcast_url_filter_route(self, full_on_b, prev_state):
        p, prev_links = prev_state
        got = _triples_df(incremental_triples(
            p, prev_links, pages_from_documents(SF), snapshot_b_pages(SF)))
        pd.testing.assert_frame_equal(got, full_on_b)

    def test_forced_join_url_filter_route(self, full_on_b, prev_state):
        """broadcast_url_limit=0 forces the left_semi / left_anti
        Dataset-join route for the delta/stale url sets."""
        p, prev_links = prev_state
        got = _triples_df(incremental_triples(
            p, prev_links, pages_from_documents(SF), snapshot_b_pages(SF),
            broadcast_url_limit=0, join_partitions=4))
        pd.testing.assert_frame_equal(got, full_on_b)

    def test_prev_hashes_checkpoint_route(self, full_on_b, prev_state):
        """With the persisted (url, h) fingerprint table the diff never
        reads snapshot A — result must be identical."""
        from reden_ray.pipelines.webops import page_content_hashes

        p, prev_links = prev_state
        prev_hashes = page_content_hashes(
            pages_from_documents(SF)).materialize()
        got = _triples_df(incremental_triples(
            p, prev_links, pages_from_documents(SF), snapshot_b_pages(SF),
            prev_hashes_ds=prev_hashes))
        pd.testing.assert_frame_equal(got, full_on_b)

    def test_identical_snapshots_reuse_all_links(self, prev_state):
        """A == B: zero pages re-link; the carried links alone must
        reproduce the full run on A."""
        p, prev_links = prev_state
        full_a = _triples_df(p.triples(prev_links))
        got = _triples_df(incremental_triples(
            p, prev_links, pages_from_documents(SF),
            pages_from_documents(SF)))
        pd.testing.assert_frame_equal(got, full_a)
