"""Web-native crawl operators: URL canonicalization, link graph,
PageRank (local + forced-distributed), snapshot diff."""

import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo")

import ray.data as rd  # noqa: E402

from reden_ray.pipelines import webops as W  # noqa: E402
from reden_ray.stages.graphrank import _rank_solve_local, pagerank  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(f"CREATE VIEW documents AS SELECT * "
          f"FROM read_parquet('{SF}/documents.parquet')")
    return c


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


class TestQ41UrlCanonical:
    def test_matches_oracle(self, con):
        ray_df = W.q41_url_canonical_dedup(SF)
        sql_df = con.sql(W.Q41_SQL).df()
        pd.testing.assert_frame_equal(canon(ray_df), canon(sql_df))

    def test_all_five_variants_collapse(self):
        df = W.q41_url_canonical_dedup(SF)
        # 500 docs -> 100 logical pages, every group of 5 variants
        # collapses to ONE canonical url
        assert len(df) == 100
        assert (df["n_dupes"] == 5).all()
        assert df["canon_url"].str.match(
            r"^https://site\d+\.example\.org/a/\d+\?q=1$").all()

    def test_canonicalize_kernel_cases(self):
        urls = pa.array([
            "https://a.example/x?utm_source=s&q=2",
            "HTTPS://A.EXAMPLE:443/x?q=2",
            "http://a.example:80/x/?q=2#frag",
            "https://a.example/x?q=2&gclid=abc",
            "https://a.example/deep/path/",
            "https://a.example/",
        ])
        got = W.canonicalize_url_column(urls).to_pylist()
        assert got == [
            "https://a.example/x?q=2",
            "https://a.example/x?q=2",
            "http://a.example/x?q=2",
            "https://a.example/x?q=2",
            "https://a.example/deep/path",
            "https://a.example/",
        ]


class TestQ42LinkGraph:
    def test_matches_oracle(self, con):
        ray_df = W.q42_link_graph(SF)
        sql_df = con.sql(W.Q42_SQL).df()
        pd.testing.assert_frame_equal(canon(ray_df), canon(sql_df))

    def test_total_links_is_three_per_page(self):
        df = W.q42_link_graph(SF)
        assert df["n_links"].sum() == 500 * W.N_OUTLINKS

    def test_anchors_really_parsed_from_html(self):
        pages = linked = W.linked_pages_from_documents(SF).take(1)[0]
        html = linked["html"].decode("utf-8")
        assert html.count('href="') == W.N_OUTLINKS
        assert "<nav>" in html


class TestPageRank:
    def _random_edges(self, seed: int, n_nodes=30, n_edges=200):
        rng = np.random.RandomState(seed)
        src = [f"n{i}" for i in rng.randint(0, n_nodes, n_edges)]
        dst = [f"n{i}" for i in rng.randint(0, n_nodes, n_edges)]
        w = rng.randint(1, 5, n_edges).astype(float)
        return src, dst, w

    def test_local_path_matches_reference_solve(self):
        src, dst, w = self._random_edges(3)
        edges = rd.from_arrow(pa.table({"src": src, "dst": dst, "w": w}))
        got = pagerank(edges, n_iters=4).to_pandas() \
            .sort_values("node").reset_index(drop=True)
        ref = _rank_solve_local(np.array(src, dtype=object),
                                np.array(dst, dtype=object),
                                np.asarray(w), 4, 0.85) \
            .sort_values("node").reset_index(drop=True)
        assert (got["node"] == ref["node"]).all()
        assert np.allclose(got["rank"], ref["rank"], atol=1e-12)

    def test_forced_distributed_matches_local(self):
        src, dst, w = self._random_edges(11)
        # dangling nodes: n0/n1 appear only as destinations
        src = [s for s in src if s not in ("n0", "n1")]
        dst, w = dst[: len(src)], w[: len(src)]
        edges = rd.from_arrow(pa.table({"src": src, "dst": dst, "w": w}))
        loc = pagerank(edges, n_iters=4).to_pandas() \
            .sort_values("node").reset_index(drop=True)
        dist = pagerank(edges, n_iters=4, local_solve_max_edges=0,
                        num_buckets=5).to_pandas() \
            .sort_values("node").reset_index(drop=True)
        assert (loc["node"] == dist["node"]).all()
        assert np.allclose(loc["rank"], dist["rank"], atol=1e-12)

    def test_rank_is_a_distribution(self):
        src, dst, w = self._random_edges(5)
        edges = rd.from_arrow(pa.table({"src": src, "dst": dst, "w": w}))
        df = pagerank(edges, n_iters=6).to_pandas()
        assert abs(df["rank"].sum() - 1.0) < 1e-9
        assert (df["rank"] > 0).all()

    def test_star_graph_center_wins(self):
        # leaves all point at the hub -> hub outranks every leaf
        src = [f"leaf{i}" for i in range(10)]
        dst = ["hub"] * 10
        edges = rd.from_arrow(pa.table(
            {"src": src, "dst": dst, "w": [1.0] * 10}))
        df = pagerank(edges, n_iters=8).to_pandas().set_index("node")
        assert df.loc["hub", "rank"] > df.drop("hub")["rank"].max() * 3

    def test_empty_edges(self):
        edges = rd.from_arrow(pa.table({
            "src": pa.array([], pa.string()),
            "dst": pa.array([], pa.string()),
            "w": pa.array([], pa.float64())}))
        assert pagerank(edges).count() == 0

    def test_q42b_matches_oracle(self, con):
        ray_df = W.q42b_host_pagerank(SF)
        sql_df = con.sql(W.Q42B_SQL).df()
        pd.testing.assert_frame_equal(canon(ray_df), canon(sql_df))


class TestQ44DuplicateNgramSpans:
    def test_matches_oracle(self, con):
        from reden_ray.pipelines import relational as R

        ray_df = R.q44_duplicate_ngram_spans(SF)
        sql_df = con.sql(R.Q44_SQL).df()
        pd.testing.assert_frame_equal(canon(ray_df), canon(sql_df))

    def test_planted_duplicate_span_found(self):
        """Two docs sharing a verbatim 8-word run must surface it."""
        import ray

        from reden_ray.pipelines import relational as R

        run = "alpha beta gamma delta epsilon zeta eta theta"
        docs = pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([f"x {run} y", f"z {run}", "unrelated words only"],
                             pa.string()),
        })
        import os
        import tempfile

        import pyarrow.parquet as pq
        d = tempfile.mkdtemp(prefix="q44_")
        pq.write_table(docs, os.path.join(d, "documents.parquet"))
        out = R.q44_duplicate_ngram_spans(d)
        assert run in set(out["gram"])
        row = out[out["gram"] == run].iloc[0]
        assert row["n_docs"] == 2 and row["n_occ"] == 2


class TestQ43SnapshotDiff:
    def test_matches_oracle(self, con):
        ray_df = W.q43_snapshot_diff(SF)
        sql_df = con.sql(W.Q43_SQL).df()
        pd.testing.assert_frame_equal(canon(ray_df), canon(sql_df))

    def test_status_counts(self):
        df = W.q43_snapshot_diff(SF)
        by = df["status"].value_counts()
        # 500 docs: %11==0 deleted (46), %7==0 and not deleted changed,
        # %13==0 added (39), rest unchanged
        assert by["deleted"] == len([i for i in range(500) if i % 11 == 0])
        assert by["added"] == len([i for i in range(500) if i % 13 == 0])
        assert by["changed"] == len(
            [i for i in range(500) if i % 11 != 0 and i % 7 == 0])
        assert by.sum() == len(df)

    def test_identical_snapshots_all_unchanged(self):
        a = W._snapshot_a(SF)
        b = W._snapshot_a(SF)
        df = W.snapshot_diff(a, b).to_pandas()
        assert (df["status"] == "unchanged").all()
        assert len(df) == 500
