"""Seed-distance BFS (graphrank.seed_distance) and reciprocity tests."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from reden_ray.stages.graphrank import seed_distance
from reden_ray.pipelines.graphstats import reciprocity


def _edges(pairs, src="src", dst="dst"):
    return rd.from_arrow(pa.table({
        src: pa.array([p[0] for p in pairs], pa.string()),
        dst: pa.array([p[1] for p in pairs], pa.string()),
    }))


def _dist_map(ds):
    df = ds.to_pandas()
    if df.empty:  # Ray to_pandas drops the schema of an all-empty Dataset
        return {}
    return dict(zip(df["node"], df["dist"]))


class TestSeedDistance:
    def test_chain(self):
        ds = _edges([("a", "b"), ("b", "c"), ("c", "d")])
        got = _dist_map(seed_distance(ds, ["a"]))
        assert got == {"a": 0, "b": 1, "c": 2, "d": 3}

    def test_horizon_bounds_distance(self):
        ds = _edges([("a", "b"), ("b", "c"), ("c", "d")])
        got = _dist_map(seed_distance(ds, ["a"], max_rounds=2))
        assert got == {"a": 0, "b": 1, "c": 2}  # d beyond horizon: omitted

    def test_multi_seed_takes_min(self):
        ds = _edges([("a", "b"), ("b", "c"), ("z", "c")])
        got = _dist_map(seed_distance(ds, ["a", "z"]))
        assert got["c"] == 1  # via z, not 2 via a

    def test_seed_not_in_graph_ignored(self):
        ds = _edges([("a", "b")])
        got = _dist_map(seed_distance(ds, ["nope"]))
        assert got == {}

    def test_unreachable_omitted_and_duplicate_edges_harmless(self):
        ds = _edges([("a", "b"), ("a", "b"), ("x", "y")])
        got = _dist_map(seed_distance(ds, ["a"]))
        assert got == {"a": 0, "b": 1}

    def test_distributed_path_matches_local(self):
        rng = np.random.RandomState(7)
        n = 60
        pairs = [(f"v{rng.randint(n)}", f"v{rng.randint(n)}")
                 for _ in range(300)]
        seeds = ["v0", "v1", "v2"]
        local = _dist_map(seed_distance(_edges(pairs), seeds, max_rounds=6))
        dist = _dist_map(seed_distance(_edges(pairs), seeds, max_rounds=6,
                                       local_solve_max_edges=0,
                                       num_buckets=4))
        assert local == dist

    def test_empty_inputs(self):
        empty = _edges([])
        assert _dist_map(seed_distance(empty, ["a"])) == {}
        some = _edges([("a", "b")])
        assert _dist_map(seed_distance(some, [])) == {}


def _int_edges(pairs):
    return rd.from_arrow(pa.table({
        "s": pa.array([p[0] for p in pairs], pa.int64()),
        "d": pa.array([p[1] for p in pairs], pa.int64()),
    }))


class TestReciprocity:
    def test_hand_graph(self):
        # 1->2, 2->1 (reciprocated pair), 1->3 (one-way)
        df = reciprocity(_int_edges([(1, 2), (2, 1), (1, 3)])).to_pandas()
        got = df.set_index("node").to_dict("index")
        assert got["n1"] == {"n_out": 2, "n_recip": 1, "recip_ppm": 500_000}
        assert got["n2"] == {"n_out": 1, "n_recip": 1, "recip_ppm": 1_000_000}
        assert "n3" not in got  # no out-edges

    def test_self_loop_counts_as_reciprocated(self):
        df = reciprocity(_int_edges([(5, 5)])).to_pandas()
        assert df.iloc[0].to_dict() == {
            "node": "n5", "n_out": 1, "n_recip": 1, "recip_ppm": 1_000_000}

    def test_duplicate_edges_collapse_across_blocks(self):
        # same directed edge repeated in separate input blocks must
        # count once: the unordered-pair exchange dedups globally
        a = _int_edges([(1, 2), (2, 1)])
        b = _int_edges([(1, 2), (1, 4)])
        df = reciprocity(a.union(b)).to_pandas()
        got = df.set_index("node").to_dict("index")
        assert got["n1"] == {"n_out": 2, "n_recip": 1, "recip_ppm": 500_000}

    def test_matches_bruteforce_on_random_graph(self):
        rng = np.random.RandomState(11)
        pairs = list({(int(rng.randint(20)), int(rng.randint(20)))
                      for _ in range(120)})
        df = reciprocity(_int_edges(pairs)).to_pandas()
        es = set(pairs)
        exp = {}
        for s in sorted({p[0] for p in pairs}):
            outs = [d for (ss, d) in es if ss == s]
            rec = sum((d, s) in es for d in outs)
            exp[f"n{s}"] = {"n_out": len(outs), "n_recip": rec,
                            "recip_ppm": 1_000_000 * rec // len(outs)}
        assert df.set_index("node").to_dict("index") == exp


from reden_ray.stages.graphrank import label_propagation


def _label_map(ds):
    df = ds.to_pandas()
    if df.empty:
        return {}
    return dict(zip(df["node"], df["label"]))


class TestLabelPropagation:
    def test_two_triangles_with_bridge(self):
        # two triangles joined by one bridge edge: each triangle
        # converges to its lexicographic min member's label
        tri1 = [("a", "b"), ("b", "c"), ("c", "a")]
        tri2 = [("x", "y"), ("y", "z"), ("z", "x")]
        bridge = [("c", "x")]
        got = _label_map(label_propagation(
            _edges(tri1 + tri2 + bridge), n_rounds=6))
        assert got["a"] == got["b"] == got["c"]
        assert got["x"] == got["y"] == got["z"]

    def test_isolated_self_loop_keeps_label(self):
        got = _label_map(label_propagation(_edges([("q", "q")])))
        assert got == {"q": "q"}

    def test_star_adopts_center_then_center_adopts_majority(self):
        # star: center 'm' with leaves 'a','b','c'. Round 1: every
        # leaf sees only {m} -> m; center sees {a,b,c} all count 1 ->
        # min 'a'. Round 2: leaves see {a} -> a; center sees {m,m,m}
        # -> m. Fixed rounds make this deterministic.
        ds = _edges([("m", "a"), ("m", "b"), ("m", "c")])
        got1 = _label_map(label_propagation(ds, n_rounds=1))
        assert got1 == {"m": "a", "a": "m", "b": "m", "c": "m"}
        got2 = _label_map(label_propagation(ds, n_rounds=2))
        assert got2 == {"m": "m", "a": "a", "b": "a", "c": "a"}

    def test_distributed_path_matches_local(self):
        rng = np.random.RandomState(23)
        n = 40
        pairs = [(f"v{rng.randint(n)}", f"v{rng.randint(n)}")
                 for _ in range(160)]
        local = _label_map(label_propagation(_edges(pairs), n_rounds=4))
        dist = _label_map(label_propagation(
            _edges(pairs), n_rounds=4, local_solve_max_edges=0,
            num_buckets=4))
        assert local == dist

    def test_duplicate_and_reverse_edges_collapse(self):
        # (a,b) three times and (b,a) once must tally like ONE
        # undirected edge
        many = _label_map(label_propagation(
            _edges([("a", "b"), ("a", "b"), ("a", "b"), ("b", "a"),
                    ("b", "c")]), n_rounds=3))
        once = _label_map(label_propagation(
            _edges([("a", "b"), ("b", "c")]), n_rounds=3))
        assert many == once

    def test_empty(self):
        assert _label_map(label_propagation(_edges([]))) == {}


from reden_ray.stages.graphrank import hits, trustrank


def _w_edges(pairs):
    return rd.from_arrow(pa.table({
        "src": pa.array([p[0] for p in pairs], pa.string()),
        "dst": pa.array([p[1] for p in pairs], pa.string()),
        "w": pa.array([1.0] * len(pairs), pa.float64()),
    }))


class TestTrustRank:
    def test_mass_decays_along_cycle(self):
        # cycle s -> a -> b -> s: no dangling sink, so trust strictly
        # decays with hop distance from the seed (a chain would NOT
        # show this: its endpoint accumulates recycled dangling mass)
        t = trustrank(_w_edges([("s", "a"), ("a", "b"), ("b", "s")]),
                      ["s"], n_iters=12).to_pandas() \
            .set_index("node")["trust"]
        assert t["s"] > t["a"] > t["b"] > 0

    def test_unreachable_node_gets_zero(self):
        t = trustrank(_w_edges([("s", "a"), ("x", "y")]), ["s"],
                      n_iters=4).to_pandas().set_index("node")["trust"]
        assert t["y"] == 0.0  # no path from the seed, no restart mass

    def test_no_seeds_in_graph_empty(self):
        out = trustrank(_w_edges([("a", "b")]), ["zz"]).to_pandas()
        assert len(out) == 0

    def test_mass_conserves_to_one(self):
        rng = np.random.RandomState(41)
        pairs = [(f"v{rng.randint(15)}", f"v{rng.randint(15)}")
                 for _ in range(60)]
        t = trustrank(_w_edges(pairs), ["v0", "v1"],
                      n_iters=6).to_pandas()["trust"]
        # dangling mass restarts at the seeds, so total mass is 1
        assert abs(t.sum() - 1.0) < 1e-9

    def test_distributed_path_matches_local(self):
        rng = np.random.RandomState(43)
        pairs = [(f"v{rng.randint(25)}", f"v{rng.randint(25)}")
                 for _ in range(120)]
        seeds = ["v0", "v3"]
        lo = trustrank(_w_edges(pairs), seeds, n_iters=4).to_pandas()
        hi = trustrank(_w_edges(pairs), seeds, n_iters=4,
                       local_solve_max_edges=0, num_buckets=4).to_pandas()
        a = lo.sort_values("node").reset_index(drop=True)
        b = hi.sort_values("node").reset_index(drop=True)
        assert list(a["node"]) == list(b["node"])
        # float partial-sum order differs between the paths; e9 is far
        # tighter than the e6 the oracle uses
        assert np.allclose(a["trust"], b["trust"], atol=1e-9)


class TestHits:
    def test_hub_and_authority_separate(self):
        # h1, h2 both point at a1, a2: pure hubs vs pure authorities
        pairs = [("h1", "a1"), ("h1", "a2"), ("h2", "a1"), ("h2", "a2")]
        df = hits(_edges(pairs), n_iters=4).to_pandas().set_index("node")
        assert df.loc["h1", "hub"] > 0 and df.loc["h1", "auth"] == 0
        assert df.loc["a1", "auth"] > 0 and df.loc["a1", "hub"] == 0
        # symmetric structure -> equal scores
        assert abs(df.loc["h1", "hub"] - df.loc["h2", "hub"]) < 1e-12
        assert abs(df.loc["a1", "auth"] - df.loc["a2", "auth"]) < 1e-12

    def test_l1_normalized(self):
        rng = np.random.RandomState(47)
        pairs = list({(f"v{rng.randint(12)}", f"v{rng.randint(12)}")
                      for _ in range(50)})
        df = hits(_edges(pairs), n_iters=5).to_pandas()
        assert abs(df["hub"].sum() - 1.0) < 1e-9
        assert abs(df["auth"].sum() - 1.0) < 1e-9

    def test_better_cited_node_outranks(self):
        # a2 cited by two hubs, a1 by one
        pairs = [("h1", "a1"), ("h1", "a2"), ("h2", "a2")]
        df = hits(_edges(pairs), n_iters=6).to_pandas().set_index("node")
        assert df.loc["a2", "auth"] > df.loc["a1", "auth"]

    def test_distributed_path_matches_local(self):
        rng = np.random.RandomState(53)
        pairs = list({(f"v{rng.randint(20)}", f"v{rng.randint(20)}")
                      for _ in range(90)})
        lo = hits(_edges(pairs), n_iters=4).to_pandas()
        hi = hits(_edges(pairs), n_iters=4, local_solve_max_edges=0,
                  num_buckets=4).to_pandas()
        a = lo.sort_values("node").reset_index(drop=True)
        b = hi.sort_values("node").reset_index(drop=True)
        assert list(a["node"]) == list(b["node"])
        assert np.allclose(a["hub"], b["hub"], atol=1e-9)
        assert np.allclose(a["auth"], b["auth"], atol=1e-9)

    def test_empty(self):
        assert len(hits(_edges([])).to_pandas()) == 0


from reden_ray.pipelines.graphstats import degree_assortativity_moments


class TestAssortativity:
    def test_hand_graph_moments(self):
        # edges: 1->2, 1->3, 2->3  (outdeg: 1:2, 2:1; indeg: 2:1, 3:2)
        df = degree_assortativity_moments(
            _int_edges([(1, 2), (1, 3), (2, 3)])).iloc[0]
        # per-edge (x=outdeg(src), y=indeg(dst)): (2,1), (2,2), (1,2)
        assert df["n_edges"] == 3
        assert df["sx"] == 5 and df["sy"] == 5
        assert df["sxy"] == 2 * 1 + 2 * 2 + 1 * 2
        assert df["sx2"] == 4 + 4 + 1 and df["sy2"] == 1 + 4 + 4

    def test_duplicate_edges_collapse(self):
        once = degree_assortativity_moments(
            _int_edges([(1, 2), (2, 3)])).iloc[0]
        many = degree_assortativity_moments(
            _int_edges([(1, 2), (1, 2), (2, 3), (2, 3), (2, 3)])).iloc[0]
        assert once.to_dict() == many.to_dict()

    def test_pearson_matches_numpy(self):
        rng = np.random.RandomState(71)
        pairs = list({(int(rng.randint(40)), int(rng.randint(40)))
                      for _ in range(200)})
        m = degree_assortativity_moments(_int_edges(pairs)).iloc[0]
        es = sorted(set(pairs))
        from collections import Counter
        od = Counter(s for s, _ in es)
        idg = Counter(d for _, d in es)
        x = np.array([od[s] for s, d in es], dtype=float)
        y = np.array([idg[d] for s, d in es], dtype=float)
        n = len(es)
        r_mom = (n * m["sxy"] - m["sx"] * m["sy"]) / np.sqrt(
            float((n * m["sx2"] - m["sx"] ** 2))
            * float((n * m["sy2"] - m["sy"] ** 2)))
        assert abs(r_mom - np.corrcoef(x, y)[0, 1]) < 1e-12


class TestModularityPieces:
    def test_planted_communities_positive_q(self):
        # two dense triangles + one bridge: compute modularity of the
        # TRUE partition with the same exact integer algebra the
        # pipeline uses, as an independent cross-check of the formula
        edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
        lab = {1: "a", 2: "a", 3: "a", 4: "b", 5: "b", 6: "b"}
        m = len(edges)
        deg = {}
        for u, v in edges:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        e_c, d_c = {}, {}
        for u, v in edges:
            if lab[u] == lab[v]:
                e_c[lab[u]] = e_c.get(lab[u], 0) + 1
        for v, dv in deg.items():
            d_c[lab[v]] = d_c.get(lab[v], 0) + dv
        q_num = 4 * m * sum(e_c.values()) - sum(d * d for d in d_c.values())
        q_den = 4 * m * m
        # known value: e_in=6, d_a=d_b=7 -> (168 - 98)/196
        assert (q_num, q_den) == (70, 196)
        assert q_num / q_den > 0.35  # strongly modular partition

    def test_toward_zero_ppm_matches_duckdb(self):
        import duckdb
        con = duckdb.connect()
        for num, den in [(-17018, 3968064), (70, 196), (-1, 3), (5, 3)]:
            sql = con.execute(
                f"SELECT CAST(CASE WHEN n >= 0 "
                f"THEN (n * 1000000) // d "
                f"ELSE -((-n * 1000000) // d) END AS BIGINT) "
                f"FROM (SELECT CAST({num} AS BIGINT) AS n, "
                f"CAST({den} AS BIGINT) AS d)"
            ).fetchone()[0]
            py = (abs(num) * 1_000_000 // den) * (1 if num >= 0 else -1)
            assert sql == py, (num, den, sql, py)
