"""Tests for similarity search (brute-force exact + IVF approximate)."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from reden_ray.stages.similarity import brute_force_topk, ivf_topk, kmeans_fit


def _make_ds(n=200, dim=16, seed=13):
    rng = np.random.RandomState(seed)
    vecs = rng.randn(n, dim).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
    })
    return rd.from_arrow(t), vecs


class TestBruteForce:
    def test_matches_numpy_oracle(self):
        ds, vecs = _make_ds()
        q = {0: vecs[0].tolist(), 7: vecs[7].tolist()}
        out = brute_force_topk(ds, q, k=5)
        norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        for qid in (0, 7):
            sims = norm @ norm[qid]
            expect = set(np.argsort(-sims)[:5].tolist())
            got = set(out[out["query_id"] == qid]["vec_id"])
            assert got == expect

    def test_self_is_top1(self):
        ds, vecs = _make_ds()
        out = brute_force_topk(ds, {3: vecs[3].tolist()}, k=3)
        assert out.iloc[0]["vec_id"] == 3
        assert abs(out.iloc[0]["score"] - 1.0) < 1e-5

    def test_k_larger_than_n(self):
        ds, vecs = _make_ds(n=4)
        out = brute_force_topk(ds, {0: vecs[0].tolist()}, k=10)
        assert len(out) == 4


class TestEmbedDocuments:
    def test_self_similarity_top1(self):
        rows = [
            {"doc_id": 0, "text": "alpha beta gamma delta epsilon words here"},
            {"doc_id": 1, "text": "alpha beta gamma delta epsilon words there"},
            {"doc_id": 2, "text": "completely unrelated vocabulary tokens appear"},
        ]
        ds = rd.from_arrow(pa.Table.from_pylist(rows))
        from reden_ray.functions.text import embed_text
        from reden_ray.stages.similarity import brute_force_topk, embed_documents

        emb = embed_documents(ds)
        q = {0: embed_text(rows[0]["text"]).tolist()}
        out = brute_force_topk(emb, q, k=3)
        assert list(out["vec_id"])[0] == 0          # self first
        assert list(out["vec_id"])[1] == 1          # near-dup second
        assert out["score"].iloc[0] > 0.999

    def test_deterministic(self):
        from reden_ray.functions.text import embed_text

        a = embed_text("the quick brown fox")
        b = embed_text("the quick brown fox")
        assert (a == b).all()
        assert abs(float((a * a).sum()) - 1.0) < 1e-5


class TestIVF:
    def test_kmeans_deterministic(self):
        ds, _ = _make_ds()
        c1 = kmeans_fit(ds, n_clusters=4, iters=2)
        c2 = kmeans_fit(ds, n_clusters=4, iters=2)
        assert np.allclose(c1, c2)

    def test_recall_reasonable_and_self_found(self):
        ds, vecs = _make_ds()
        q = {0: vecs[0].tolist()}
        exact = set(brute_force_topk(ds, q, k=10)["vec_id"])
        approx = ivf_topk(ds, q, k=10, n_clusters=8, nprobe=4)
        got = set(approx["vec_id"])
        assert 0 in got  # self always in a probed partition
        assert len(got & exact) >= 5  # recall@10 >= 0.5 with half the cells probed

    def test_index_prunes_reads_and_recall(self, tmp_path):
        from reden_ray.stages.similarity import ivf_build, ivf_probe

        ds, vecs = _make_ds(n=400)
        idx = str(tmp_path / "ivf")
        ivf_build(ds, idx, n_clusters=8)
        # index layout: one hive partition dir per non-empty centroid
        parts = sorted(p.name for p in (tmp_path / "ivf").glob("centroid=*"))
        assert 1 < len(parts) <= 8
        q = {0: vecs[0].tolist(), 5: vecs[5].tolist()}
        out, stats = ivf_probe(idx, q, k=10, nprobe=6)
        # the read fraction is REAL pruning: <= probed/total partitions
        assert stats["probed_partitions"] < stats["n_partitions_on_disk"] or (
            stats["read_fraction"] == 1.0 and len(parts) <= 6
        )
        assert stats["read_fraction"] <= 1.0
        exact = brute_force_topk(ds, q, k=10)
        for qid in (0, 5):
            e = set(exact[exact["query_id"] == qid]["vec_id"])
            g = set(out[out["query_id"] == qid]["vec_id"])
            assert len(g & e) >= 9  # recall@10 >= 0.9 at nprobe=6/8

    def test_full_probe_is_exact(self, tmp_path):
        """nprobe = n_clusters reads every partition and must return
        EXACTLY the brute-force top-k (same ids, same order) — the
        invariant behind the q21b SQL oracle."""
        from reden_ray.stages.similarity import ivf_build, ivf_probe

        ds, vecs = _make_ds(n=300, seed=7)
        idx = str(tmp_path / "ivf_full")
        ivf_build(ds, idx, n_clusters=8)
        q = {0: vecs[0].tolist(), 3: vecs[3].tolist()}
        out, stats = ivf_probe(idx, q, k=10, nprobe=8)
        assert stats["read_fraction"] == 1.0
        exact = brute_force_topk(ds, q, k=10)
        for qid in (0, 3):
            e = list(exact[exact["query_id"] == qid]["vec_id"])
            g = list(out[out["query_id"] == qid]["vec_id"])
            assert g == e

    def test_probe_reuses_index_without_rebuild(self, tmp_path):
        from reden_ray.stages.similarity import ivf_build, ivf_probe

        ds, vecs = _make_ds(n=100)
        idx = str(tmp_path / "ivf2")
        ivf_build(ds, idx, n_clusters=4)
        out1, s1 = ivf_probe(idx, {0: vecs[0].tolist()}, k=5, nprobe=2)
        out2, s2 = ivf_probe(idx, {0: vecs[0].tolist()}, k=5, nprobe=2)
        assert list(out1["vec_id"]) == list(out2["vec_id"])
        assert s1 == s2
