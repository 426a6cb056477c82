"""Tests for the dedup operator family."""

import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from reden_ray.stages.dedup import (
    embedding_dedup_clusters,
    exact_dedup_by_key,
    minhash_lsh_clusters,
    ngram_jaccard_clusters,
    simhash_clusters,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while rain falls on the quiet "
    "meadow and birds sing through the long afternoon hours near the river bend"
)
OTHER = (
    "completely different content about machine learning pipelines processing "
    "large volumes of structured data with distributed compute frameworks daily"
)


@pytest.fixture(scope="module")
def doc_ds():
    rows = [
        {"doc_id": 0, "text": BASE},
        {"doc_id": 1, "text": BASE},  # exact dup of 0
        {"doc_id": 2, "text": BASE.replace("dog", "cat")},  # near dup of 0
        {"doc_id": 3, "text": OTHER},
        {"doc_id": 4, "text": OTHER},  # exact dup of 3
        {"doc_id": 5, "text": "tiny"},
    ]
    return rd.from_arrow(pa.Table.from_pylist(rows))


class TestExactDedup:
    def test_min_id_per_key(self, doc_ds):
        out = exact_dedup_by_key(doc_ds, ["text"], "doc_id").to_pandas()
        kept = sorted(out["doc_id"])
        assert kept == [0, 2, 3, 5]


class TestMinHash:
    def test_exact_and_near_dups_found(self, doc_ds):
        cl = minhash_lsh_clusters(doc_ds, threshold=0.7)
        m = dict(zip(cl["doc_id"], cl["cluster"]))
        assert m[0] == 0 and m[1] == 0 and m[2] == 0  # near-dup joins cluster
        assert m[3] == 3 and m[4] == 3
        assert 5 not in m

    def test_exact_verify_mode_excludes_near_dups(self, doc_ds):
        cl = minhash_lsh_clusters(doc_ds, verify="exact")
        m = dict(zip(cl["doc_id"], cl["cluster"]))
        assert m == {0: 0, 1: 0, 3: 3, 4: 3}

    def test_dedup_keeps_representatives(self, doc_ds):
        from reden_ray.stages.dedup import minhash_dedup

        kept = sorted(r["doc_id"] for r in minhash_dedup(doc_ds, threshold=0.7).take_all())
        assert kept == [0, 3, 5]


class TestSimHash:
    def test_clusters(self, doc_ds):
        cl = simhash_clusters(doc_ds, max_hamming=3)
        m = dict(zip(cl["doc_id"], cl["cluster"]))
        assert m.get(0) == 0 and m.get(1) == 0  # identical -> hamming 0
        assert m.get(4) == 3


class TestNgramJaccard:
    def test_clusters(self, doc_ds):
        cl = ngram_jaccard_clusters(doc_ds, threshold=0.5)
        m = dict(zip(cl["doc_id"], cl["cluster"]))
        assert m[1] == 0 and m[2] == 0 and m[4] == 3


class TestEmbeddingDedup:
    def test_identical_vectors_cluster(self):
        rows = []
        base = [0.1 * i for i in range(16)]
        far = [1.0 - 0.05 * i for i in range(16)]
        rows.append({"vec_id": 0, "embedding": base})
        rows.append({"vec_id": 1, "embedding": base})
        rows.append({"vec_id": 2, "embedding": [x * 2 for x in base]})  # same direction
        rows.append({"vec_id": 3, "embedding": far})
        ds = rd.from_arrow(pa.Table.from_pylist(rows))
        cl = embedding_dedup_clusters(ds, threshold=0.999)
        m = dict(zip(cl["vec_id"], cl["cluster"]))
        assert m[0] == 0 and m[1] == 0 and m[2] == 0
        assert 3 not in m


class TestNoPairsEdge:
    def test_single_doc_corpus(self):
        one = rd.from_arrow(pa.Table.from_pylist([{"doc_id": 1, "text": "only one doc"}]))
        assert len(minhash_lsh_clusters(one)) == 0
        assert len(simhash_clusters(one)) == 0
        assert len(ngram_jaccard_clusters(one)) == 0


class TestDeterminism:
    def test_minhash_stable_across_runs(self, doc_ds):
        a = minhash_lsh_clusters(doc_ds, threshold=0.7)
        b = minhash_lsh_clusters(doc_ds, threshold=0.7)
        pd.testing.assert_frame_equal(a, b)
