"""Tests for the dedup operator family (all-distributed round-2 form)."""

import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from reden_ray.stages.cc import connected_components
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


def _cmap(clusters_ds, id_col="doc_id"):
    df = clusters_ds.to_pandas()
    return dict(zip(df[id_col], df["cluster"]))


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


# gate=default exercises the single-task numpy solve; gate=0 forces the
# iterative distributed min-label propagation — both must agree with
# the union-find semantics on every graph shape
_CC_GATES = [4_000_000, 0]


class TestConnectedComponents:
    @pytest.mark.parametrize("gate", _CC_GATES)
    def test_min_label_components(self, gate):
        # two components: {1,2,3,7} (chain) and {5,6}; dup + reversed edges
        edges = rd.from_arrow(pa.Table.from_pylist(
            [{"a": 2, "b": 1}, {"a": 2, "b": 3}, {"a": 3, "b": 7},
             {"a": 6, "b": 5}, {"a": 5, "b": 6}, {"a": 1, "b": 2}]))
        out = connected_components(edges, local_solve_max_edges=gate).to_pandas()
        m = dict(zip(out["node"], out["cluster"]))
        assert m == {1: 1, 2: 1, 3: 1, 7: 1, 5: 5, 6: 5}

    @pytest.mark.parametrize("gate", _CC_GATES)
    def test_long_chain_converges(self, gate):
        # path graph 0-1-...-7: long-diameter case for propagation
        edges = rd.from_arrow(pa.Table.from_pylist(
            [{"a": i, "b": i + 1} for i in range(7)]))
        out = connected_components(edges, local_solve_max_edges=gate).to_pandas()
        assert set(out["cluster"]) == {0}
        assert sorted(out["node"]) == list(range(8))

    def test_empty_edges(self):
        empty = rd.from_arrow(pa.table({"a": pa.array([], pa.int64()),
                                        "b": pa.array([], pa.int64())}))
        assert connected_components(empty).count() == 0

    @pytest.mark.parametrize("seed", [1, 23])
    @pytest.mark.parametrize("gate", _CC_GATES)
    def test_random_graphs_match_union_find(self, seed, gate):
        import numpy as np

        rng = np.random.RandomState(seed)
        n_nodes, n_edges = 60, 90  # dense-ish: short component diameters
        a = rng.randint(0, n_nodes, n_edges)
        b = rng.randint(0, n_nodes, n_edges)
        edges = rd.from_arrow(pa.table({"a": pa.array(a, pa.int64()),
                                        "b": pa.array(b, pa.int64())}))
        got = connected_components(edges, local_solve_max_edges=gate).to_pandas()
        got_map = dict(zip(got["node"], got["cluster"]))

        # local union-find oracle
        parent: dict[int, int] = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for x, y in zip(a.tolist(), b.tolist()):
            rx, ry = find(x), find(y)
            if rx != ry:
                parent[max(rx, ry)] = min(rx, ry)
        expect = {x: find(x) for x in parent}
        assert got_map == expect


class TestAttachPairTexts:
    def test_broadcast_and_join_paths_agree(self, doc_ds):
        from reden_ray.stages.dedup import _attach_pair_texts

        pairs = rd.from_arrow(pa.table({
            "a": pa.array([0, 0, 3], pa.int64()),
            "b": pa.array([1, 2, 4], pa.int64()),
        }))
        key = ["a", "b"]
        fast = (_attach_pair_texts(pairs, doc_ds, "doc_id", "text")
                .to_pandas().sort_values(key).reset_index(drop=True))
        slow = (_attach_pair_texts(pairs, doc_ds, "doc_id", "text",
                                   broadcast_id_limit=0, num_partitions=2)
                .to_pandas().sort_values(key).reset_index(drop=True))
        assert len(fast) == 3
        assert fast.equals(slow)
        assert fast.loc[0, "text_a"] == fast.loc[0, "text_b"]  # exact dup 0-1

    def test_text_gate_falls_back_to_joins(self, doc_ds):
        from reden_ray.stages.dedup import _attach_pair_texts

        pairs = rd.from_arrow(pa.table({
            "a": pa.array([3], pa.int64()), "b": pa.array([4], pa.int64())}))
        out = _attach_pair_texts(pairs, doc_ds, "doc_id", "text",
                                 broadcast_text_bytes=0,
                                 num_partitions=2).to_pandas()
        assert len(out) == 1 and out.loc[0, "text_a"] == out.loc[0, "text_b"]


class TestExactDedup:
    def test_min_id_per_key(self, doc_ds):
        out = exact_dedup_by_key(doc_ds, ["text"], "doc_id").to_pandas()
        kept = sorted(out["doc_id"])
        assert kept == [0, 2, 3, 5]


class TestMinHash:
    def test_exact_and_near_dups_found(self, doc_ds):
        m = _cmap(minhash_lsh_clusters(doc_ds, threshold=0.7))
        assert m[0] == 0 and m[1] == 0 and m[2] == 0  # near-dup joins cluster
        assert m[3] == 3 and m[4] == 3
        assert 5 not in m

    def test_exact_verify_mode_excludes_near_dups(self, doc_ds):
        m = _cmap(minhash_lsh_clusters(doc_ds, verify="exact"))
        assert m == {0: 0, 1: 0, 3: 3, 4: 3}

    def test_dedup_keeps_representatives(self, doc_ds):
        from reden_ray.stages.dedup import minhash_dedup

        kept = sorted(r["doc_id"] for r in minhash_dedup(doc_ds, threshold=0.7).take_all())
        assert kept == [0, 3, 5]


class TestNegativeIdsRejected:
    def test_negative_doc_id_raises(self):
        """(a=-1, b=n) is reserved for in-band truncation markers, so
        negative doc ids must be rejected loudly, not silently stripped
        as markers downstream."""
        rows = [
            {"doc_id": -7, "text": BASE},
            {"doc_id": 1, "text": BASE},
        ]
        ds = rd.from_arrow(pa.Table.from_pylist(rows))
        with pytest.raises(Exception, match="non-negative doc ids"):
            minhash_lsh_clusters(ds, verify="exact").to_pandas()


class TestSimHash:
    def test_clusters(self, doc_ds):
        m = _cmap(simhash_clusters(doc_ds, max_hamming=3))
        assert m.get(0) == 0 and m.get(1) == 0  # identical -> hamming 0
        assert m.get(4) == 3


class TestNgramJaccard:
    def test_clusters(self, doc_ds):
        m = _cmap(ngram_jaccard_clusters(doc_ds, threshold=0.5))
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
        m = _cmap(embedding_dedup_clusters(ds, threshold=0.999), id_col="vec_id")
        assert m[0] == 0 and m[1] == 0 and m[2] == 0
        assert 3 not in m


class TestNoPairsEdge:
    def test_single_doc_corpus(self):
        one = rd.from_arrow(pa.Table.from_pylist([{"doc_id": 1, "text": "only one doc"}]))
        assert minhash_lsh_clusters(one).count() == 0
        assert simhash_clusters(one).count() == 0
        assert ngram_jaccard_clusters(one).count() == 0


class TestTruncationReporting:
    """Per-bucket caps are skew armor; VERDICT requires they never be
    silent. Overfill a bucket and assert the stats channel reports it."""

    @pytest.fixture(scope="class")
    def hot_ds(self):
        # 30 identical docs -> one hot LSH bucket per band
        rows = [{"doc_id": i, "text": BASE} for i in range(30)]
        return rd.from_arrow(pa.Table.from_pylist(rows))

    def test_minhash_overfull_bucket_reported(self, hot_ds):
        stats: dict = {}
        out = minhash_lsh_clusters(hot_ds, verify="exact", max_bucket=10,
                                   stats=stats)
        m = _cmap(out)
        assert stats["truncated_buckets"] > 0
        assert stats["dropped_rows"] > 0
        # retained members still cluster correctly
        assert all(v == 0 for k, v in m.items() if k < 10)

    def test_simhash_overfull_bucket_reported(self, hot_ds):
        stats: dict = {}
        simhash_clusters(hot_ds, max_bucket=10, stats=stats).materialize()
        assert stats["truncated_buckets"] > 0
        assert stats["dropped_rows"] > 0

    def test_ngram_overfull_bucket_reported(self, hot_ds):
        stats: dict = {}
        ngram_jaccard_clusters(hot_ds, max_bucket=10, stats=stats).materialize()
        assert stats["truncated_buckets"] > 0
        assert stats["dropped_rows"] > 0

    def test_embedding_overfull_bucket_reported(self):
        base = [0.1 * i for i in range(16)]
        rows = [{"vec_id": i, "embedding": base} for i in range(30)]
        ds = rd.from_arrow(pa.Table.from_pylist(rows))
        stats: dict = {}
        embedding_dedup_clusters(ds, threshold=0.999, max_bucket=10,
                                 stats=stats).materialize()
        assert stats["truncated_buckets"] > 0
        assert stats["dropped_rows"] > 0

    def test_no_truncation_reports_zero(self, doc_ds):
        stats: dict = {}
        minhash_lsh_clusters(doc_ds, verify="exact", stats=stats).materialize()
        assert stats == {"truncated_buckets": 0, "dropped_rows": 0}


class TestDeterminism:
    def test_minhash_stable_across_runs(self, doc_ds):
        def run():
            df = minhash_lsh_clusters(doc_ds, threshold=0.7).to_pandas()
            return df.sort_values("doc_id").reset_index(drop=True)

        pd.testing.assert_frame_equal(run(), run())


class TestKeepBestPerCluster:
    """Quality-aware cluster collapse: max quality wins, ties -> min id."""

    def _run(self, cluster_rows, quality_rows, *, blocks=1):
        from reden_ray.stages.dedup import keep_best_per_cluster

        cdf = pd.DataFrame(cluster_rows, columns=["doc_id", "cluster"])
        qdf = pd.DataFrame(quality_rows, columns=["doc_id", "q"])
        cds = rd.from_pandas(cdf).repartition(blocks)
        qds = rd.from_pandas(qdf).repartition(blocks)
        out = keep_best_per_cluster(cds, qds, "q").to_pandas()
        return {int(r.cluster): (int(r.keep_id), int(r.q))
                for r in out.itertuples()}

    def test_argmax_and_tiebreak(self):
        clusters = [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)]
        quality = [(1, 5), (2, 9), (3, 9), (10, 4), (11, 4)]
        got = self._run(clusters, quality)
        # cluster 1: quality 9 tie between 2 and 3 -> min id 2
        # cluster 10: quality tie -> min id 10
        assert got == {1: (2, 9), 10: (10, 4)}

    def test_block_split_invariance(self):
        clusters = [(i, i % 7) for i in range(50)]
        quality = [(i, (i * 13) % 11) for i in range(50)]
        a = self._run(clusters, quality, blocks=1)
        b = self._run(clusters, quality, blocks=8)
        assert a == b

    def test_member_missing_quality_dropped(self):
        # inner-join semantics: a cluster member absent from the
        # quality table cannot win
        clusters = [(1, 1), (2, 1)]
        quality = [(1, 3)]
        got = self._run(clusters, quality)
        assert got == {1: (1, 3)}


class TestKeepTopKPerCluster:
    def _run(self, clusters, quality, k):
        import pyarrow as pa

        import ray.data as rd

        from reden_ray.stages.dedup import keep_topk_per_cluster

        cds = rd.from_arrow(pa.Table.from_pylist(
            [{"doc_id": i, "cluster": c} for i, c in clusters]))
        qds = rd.from_arrow(pa.Table.from_pylist(
            [{"doc_id": i, "q": v} for i, v in quality]))
        df = keep_topk_per_cluster(cds, qds, "q", k=k).to_pandas()
        return sorted(
            (int(r["cluster"]), int(r["rnk"]), int(r["keep_id"]),
             int(r["q"])) for _, r in df.iterrows())

    def test_budget_and_rank_order(self):
        clusters = [(1, 10), (2, 10), (3, 10), (4, 20)]
        quality = [(1, 5), (2, 9), (3, 9), (4, 1)]
        got = self._run(clusters, quality, k=2)
        # cluster 10: rank1 = id 2 (q 9, min id of the tied 9s),
        # rank2 = id 3; id 1 dropped by the budget
        assert got == [(10, 1, 2, 9), (10, 2, 3, 9), (20, 1, 4, 1)]

    def test_k1_equals_keep_best(self):
        import pyarrow as pa

        import ray.data as rd

        from reden_ray.stages.dedup import (keep_best_per_cluster,
                                            keep_topk_per_cluster)

        clusters = [{"doc_id": i, "cluster": i % 3} for i in range(30)]
        quality = [{"doc_id": i, "q": (i * 7) % 11} for i in range(30)]
        cds = rd.from_arrow(pa.Table.from_pylist(clusters))
        qds = rd.from_arrow(pa.Table.from_pylist(quality))
        best = keep_best_per_cluster(cds, qds, "q").to_pandas()
        topk = keep_topk_per_cluster(cds, qds, "q", k=1).to_pandas()
        a = best[["cluster", "keep_id", "q"]].sort_values("cluster") \
            .reset_index(drop=True)
        b = topk[["cluster", "keep_id", "q"]].sort_values("cluster") \
            .reset_index(drop=True)
        assert a.equals(b)

    def test_block_split_invariant(self):
        clusters = [(i, i % 4) for i in range(60)]
        quality = [(i, (i * 13) % 17) for i in range(60)]
        one = self._run(clusters, quality, k=3)
        import pyarrow as pa

        import ray.data as rd

        from reden_ray.stages.dedup import keep_topk_per_cluster

        cds = rd.from_arrow(pa.Table.from_pylist(
            [{"doc_id": i, "cluster": c} for i, c in clusters])).repartition(7)
        qds = rd.from_arrow(pa.Table.from_pylist(
            [{"doc_id": i, "q": v} for i, v in quality])).repartition(5)
        df = keep_topk_per_cluster(cds, qds, "q", k=3).to_pandas()
        many = sorted(
            (int(r["cluster"]), int(r["rnk"]), int(r["keep_id"]),
             int(r["q"])) for _, r in df.iterrows())
        assert one == many
