"""Graph-embedding prep tests (q83-q84): deterministic random walks,
two-hop neighbourhood aggregation — both routes of each size gate."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{SF}/documents.parquet'")
    return con


def _assert_matches_oracle(got: pd.DataFrame, sql: str):
    con = _con()
    want = con.sql(sql).df()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def _toy_edges(pairs):
    df = pd.DataFrame(pairs, columns=["src_id", "dst_id"])
    df = df.groupby(["src_id", "dst_id"], as_index=False).size()
    df = df.rename(columns={"size": "cnt"})
    return rd.from_pandas(df.astype("int64"))


class TestRandomWalks:
    def test_matches_oracle(self):
        from reden_ray.pipelines.graphprep import (Q83_SQL,
                                                   q83_random_walks)

        _assert_matches_oracle(q83_random_walks(SF), Q83_SQL)

    def test_gate_equivalence(self):
        """Broadcast-CSR route == per-step bucket-join route on the
        same graph (forced gate 0)."""
        from reden_ray.pipelines.graphprep import random_walks

        rng = np.random.default_rng(9)
        pairs = [(int(a), int(b))
                 for a, b in rng.integers(0, 40, size=(300, 2))]
        key = ["start_id", "step", "node_id"]
        a = random_walks(_toy_edges(pairs)).to_pandas()
        b = random_walks(_toy_edges(pairs),
                         node_broadcast_limit=0).to_pandas()
        pd.testing.assert_frame_equal(
            a[key].sort_values(key).reset_index(drop=True),
            b[key].sort_values(key).reset_index(drop=True))

    def test_dead_end_stops_walk(self):
        """A walk that reaches a node with no out-edges stops emitting
        (both routes)."""
        from reden_ray.pipelines.graphprep import random_walks

        # 0 -> 1 only; 1 is a dead end. Walk from 0: steps 0,1 then stop.
        edges = _toy_edges([(0, 1)])
        for gate in (10, 0):
            out = random_walks(edges, k_steps=3,
                               node_broadcast_limit=gate).to_pandas()
            out = out.sort_values(["start_id", "step"])
            assert out["step"].tolist() == [0, 1]
            assert out["node_id"].tolist() == [0, 1]

    def test_partition_invariance(self):
        from reden_ray.pipelines.graphprep import random_walks

        rng = np.random.default_rng(3)
        pairs = [(int(a), int(b))
                 for a, b in rng.integers(0, 25, size=(200, 2))]
        df = pd.DataFrame(pairs, columns=["src_id", "dst_id"])
        df = df.groupby(["src_id", "dst_id"], as_index=False).size()
        df = df.rename(columns={"size": "cnt"}).astype("int64")
        key = ["start_id", "step", "node_id"]
        a = random_walks(rd.from_pandas(df).repartition(2)).to_pandas()
        b = random_walks(rd.from_pandas(df).repartition(11)).to_pandas()
        pd.testing.assert_frame_equal(
            a[key].sort_values(key).reset_index(drop=True),
            b[key].sort_values(key).reset_index(drop=True))


class TestTwoHop:
    def test_matches_oracle(self):
        from reden_ray.pipelines.graphprep import (Q84_SQL,
                                                   q84_two_hop_features)

        _assert_matches_oracle(q84_two_hop_features(SF), Q84_SQL)

    def test_gate_equivalence_vs_dense_matmul(self):
        """Both gate routes equal the dense A·f / A²·f computed with
        numpy on a random multigraph."""
        from reden_ray.pipelines.graphprep import two_hop_features

        rng = np.random.default_rng(17)
        n = 30
        pairs = [(int(a), int(b))
                 for a, b in rng.integers(0, n, size=(150, 2))]
        f = rng.integers(1, 100, size=n).astype(np.int64)
        A = np.zeros((n, n), np.int64)
        for a, b in pairs:
            A[a, b] += 1
        h1_sum, h1_cnt = A @ f, A.sum(axis=1)
        h2_sum, h2_cnt = A @ h1_sum, A @ h1_cnt

        feats = rd.from_pandas(pd.DataFrame(
            {"node": np.arange(n, dtype=np.int64), "f": f}))
        for gate in (10 ** 6, 0):
            out = two_hop_features(_toy_edges(pairs), feats,
                                   node_broadcast_limit=gate)
            out = out.set_index("doc_id").sort_index()
            srcs = sorted({a for a, _ in pairs})
            assert out.index.tolist() == srcs
            for v in srcs:
                assert out.loc[v, "h1_sum"] == h1_sum[v]
                assert out.loc[v, "h1_cnt"] == h1_cnt[v]
                assert out.loc[v, "h2_sum"] == h2_sum[v]
                assert out.loc[v, "h2_cnt"] == h2_cnt[v]
