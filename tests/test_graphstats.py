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
