"""Unit tests for the fusion-graph linker core (A1-A4, M11, J2/J4).

Hand-built graphs with analytically known pruning / degree / argmax
outcomes; parity semantics cited in reden_ray.stages.linker.
"""

import math

from reden_ray import SAMEAS_PRED
from reden_ray.stages.linker import (
    betweenness_scores,
    build_fusion_graph,
    closeness_scores,
    degree_scores,
    eigenvector_scores,
    link_context,
    prune_graph,
)


def cand(url, mid, surface, entity, uris=None, rank=0):
    return {
        "url": url,
        "mention_id": mid,
        "surface": surface,
        "surface_norm": surface.lower(),
        "cand_rank": rank,
        "entity_id": entity,
        "uris": uris or [entity],
    }


HUB = "http://kb/hub"
E1, E2, D1 = "http://kb/e1", "http://kb/e2", "http://kb/d1"
MEMBER = "http://kb/onto#member"


def kb_of(**triples):
    """kb index {subj: [(pred, obj, is_lit, w)]}"""
    return {s: [(p, o, False, 1.0) for (p, o) in lst] for s, lst in triples.items()}


class TestGraphBuild:
    def test_simple_graph_no_parallel_edges_no_self_loops(self):
        kb = {E1: [(MEMBER, HUB, False, 1.0), (MEMBER, HUB, False, 2.0),
                   ("p2", E1, False, 1.0)]}
        edges, adj, cv, inv = build_fusion_graph([cand("u", 0, "a", E1)], kb, {})
        assert list(edges) == [(E1, HUB)]
        assert edges[(E1, HUB)] == (MEMBER, 1.0)  # first edge wins

    def test_sameas_predicate_skipped(self):
        kb = {E1: [(SAMEAS_PRED, E2, False, 1.0)]}
        edges, *_ = build_fusion_graph([cand("u", 0, "a", E1)], kb, {})
        assert edges == {}

    def test_equivalent_statements_rerooted_at_base(self):
        # J4: triples under an equivalent URI become edges from the base.
        eq = "http://dbp/e1"
        kb = {eq: [(MEMBER, HUB, False, 1.0)]}
        edges, *_ = build_fusion_graph(
            [cand("u", 0, "a", E1, uris=[E1, eq])], kb, {})
        assert list(edges) == [(E1, HUB)]

    def test_sameas_table_expansion_one_hop(self):
        eq = "http://dbp/e1"
        kb = {eq: [(MEMBER, HUB, False, 1.0)]}
        edges, *_ = build_fusion_graph(
            [cand("u", 0, "a", E1)], kb, {E1: [eq]})
        assert list(edges) == [(E1, HUB)]

    def test_vertex_identity_is_decoded(self):
        kb = {E1: [(MEMBER, "http://kb/a%20b", False, 1.0)]}
        edges, *_ = build_fusion_graph([cand("u", 0, "a", E1)], kb, {})
        assert list(edges) == [(E1, "http://kb/a b")]

    def test_rels_weight_override(self):
        kb = {E1: [(MEMBER, HUB, False, 1.0)]}
        edges, *_ = build_fusion_graph(
            [cand("u", 0, "a", E1)], kb, {}, rels={MEMBER: 5.0})
        assert edges[(E1, HUB)] == (MEMBER, 5.0)


class TestPruning:
    def test_hub_kept_when_two_mentions(self):
        kb = kb_of(**{E1: [(MEMBER, HUB)], E2: [(MEMBER, HUB)]})
        rows = [cand("u", 0, "a", E1), cand("u", 1, "b", E2)]
        edges, adj, cv, inv = build_fusion_graph(rows, kb, {})
        prune_graph(edges, adj, cv, inv)
        assert HUB in adj and len(edges) == 2

    def test_hub_pruned_when_one_mention(self):
        kb = kb_of(**{E1: [(MEMBER, HUB)], D1: []})
        rows = [cand("u", 0, "a", E1), cand("u", 1, "b", D1)]
        edges, adj, cv, inv = build_fusion_graph(rows, kb, {})
        prune_graph(edges, adj, cv, inv)
        assert HUB not in adj and edges == {}

    def test_hub_pruned_when_two_candidates_same_mention(self):
        # two candidates of the SAME mention -> 1 distinct mention -> prune
        kb = kb_of(**{E1: [(MEMBER, HUB)], D1: [(MEMBER, HUB)]})
        rows = [cand("u", 0, "a", E1, rank=0), cand("u", 0, "a", D1, rank=1),
                cand("u", 1, "b", E2)]
        edges, adj, cv, inv = build_fusion_graph(rows, kb, {})
        prune_graph(edges, adj, cv, inv)
        assert HUB not in adj

    def test_candidates_never_pruned(self):
        kb = kb_of(**{E1: [("knows", E2)]})
        rows = [cand("u", 0, "a", E1), cand("u", 1, "b", E2)]
        edges, adj, cv, inv = build_fusion_graph(rows, kb, {})
        prune_graph(edges, adj, cv, inv)
        assert E1 in adj and E2 in adj and (E1, E2) in edges


class TestCentrality:
    def test_degree(self):
        edges = {("a", "b"): ("p", 1.0), ("c", "b"): ("p", 1.0)}
        d = degree_scores(edges)
        assert d == {"a": 1.0, "b": 2.0, "c": 1.0}

    def test_closeness_path(self):
        adj = {"a": {"b"}, "b": {"a", "c"}, "c": {"b"}}
        c = closeness_scores(adj)
        assert c["b"] == 0.5 and math.isclose(c["a"], 1 / 3)

    def test_eigenvector_star(self):
        adj = {"h": {"a", "b", "c"}, "a": {"h"}, "b": {"h"}, "c": {"h"}}
        e = eigenvector_scores(adj)
        assert e["h"] > e["a"] and math.isclose(e["a"], e["b"])

    def test_betweenness_path(self):
        adj = {"a": {"b"}, "b": {"a", "c"}, "c": {"b"}}
        b = betweenness_scores(adj)
        assert b["b"] > b["a"] == b["c"] == 0.0

    def test_weighted_degree(self):
        # sna DegreeCentrality sums getEdgeWeight over incident edges
        edges = {("a", "b"): ("p", 3.0), ("c", "b"): ("q", 0.5)}
        d = degree_scores(edges)
        assert d == {"a": 3.0, "b": 3.5, "c": 0.5}

    def test_closeness_unreachable_is_zero(self):
        # exact sna FreemanClosenessCentrality semantics: any
        # unreachable vertex -> +inf distance sum -> score 0.0
        adj = {"a": {"b"}, "b": {"a"}, "c": set()}
        c = closeness_scores(adj)
        assert c == {"a": 0.0, "b": 0.0, "c": 0.0}

    def test_weighted_closeness(self):
        # path a -2.0- b -0.5- c: dist(a)=2+2.5, dist(b)=2+0.5, dist(c)=0.5+2.5
        adj = {"a": {"b"}, "b": {"a", "c"}, "c": {"b"}}
        pw = {("a", "b"): 2.0, ("b", "c"): 0.5}
        c = closeness_scores(adj, pw)
        assert math.isclose(c["b"], 1 / 2.5)
        assert math.isclose(c["a"], 1 / 4.5)
        assert math.isclose(c["c"], 1 / 3.0)

    def test_rels_weight_flips_degree_winner(self):
        # Unweighted, E1 and E2 tie on degree and the (score, uri)
        # tie-break picks E2 (lexicographically larger). A -relsFile
        # weight of 5 on E1's predicate flips the winner to E1.
        PRED_Q = "http://kb/onto#q"
        kb = kb_of(**{E2: [(MEMBER, HUB)], D1: [(MEMBER, HUB)]})
        kb[E1] = [(PRED_Q, HUB, False, 1.0)]
        rows = [cand("u", 0, "m0", E1, rank=0), cand("u", 0, "m0", E2, rank=1),
                cand("u", 1, "m1", D1)]
        unweighted = link_context(rows, kb, {})
        assert unweighted[0]["uri"] == E2  # degree tie, lexicographic
        weighted = link_context(rows, kb, {}, rels={PRED_Q: 5.0})
        assert weighted[0]["uri"] == E1   # weight 5 beats weight 1
        assert weighted[0]["score"] == 5.0


class TestLinkContext:
    def test_gold_beats_decoy(self):
        kb = kb_of(**{
            E1: [(MEMBER, HUB)], E2: [(MEMBER, HUB)],
            D1: [(MEMBER, "http://kb/otherhub")],
        })
        rows = [cand("u", 0, "Shared", E1, rank=0), cand("u", 0, "Shared", D1, rank=1),
                cand("u", 1, "Other", E2)]
        links = link_context(rows, kb, {})
        by_mid = {l["mention_id"]: l for l in links}
        assert by_mid[0]["uri"] == E1
        assert by_mid[0]["score"] == 1.0
        assert by_mid[1]["uri"] == E2

    def test_tie_breaks_to_lexicographically_largest(self):
        rows = [cand("u", 0, "s", "http://kb/aa", rank=0),
                cand("u", 0, "s", "http://kb/zz", rank=1),
                cand("u", 1, "t", E2)]
        links = link_context(rows, {}, {})
        assert links[0]["uri"] == "http://kb/zz"

    def test_no_ambiguity_fast_path(self):
        # M11: no mention has >1 candidate -> direct assignment, NaN score
        rows = [cand("u", 0, "a", E1, uris=[E1, "http://eq/1"]),
                cand("u", 1, "b", E2)]
        links = link_context(rows, {}, {})
        assert [l["uri"] for l in links] == [E1, E2]
        assert all(math.isnan(l["score"]) for l in links)
        assert links[0]["all_uris"] == [E1, "http://eq/1"]

    def test_prefered_uri_order_filters(self):
        rows = [cand("u", 0, "a", E1, uris=[E1, "http://dbp/x"]),
                cand("u", 1, "b", E2)]
        links = link_context(rows, {}, {}, prefered_uri_order="dbp")
        assert links[0]["all_uris"] == ["http://dbp/x"]
        # no match -> fall back to winning vertex
        links = link_context(rows, {}, {}, prefered_uri_order="zzz")
        assert links[0]["all_uris"] == [E1]

    def test_empty(self):
        assert link_context([], {}, {}) == []


class TestVectorizedDegreeEquivalence:
    """_int_degree_scores (vectorized default) vs an independent dict/set
    reference of the fusion+prune+degree semantics, on randomized pages."""

    @staticmethod
    def _ref_degree(mention_recs):
        edges, adj, cand, inverted = set(), {}, set(), {}
        for mid, recs in mention_recs:
            for _eid, vid, _em, edge_keys in recs:
                cand.add(vid)
                adj.setdefault(vid, set())
                inverted[vid] = mid
                for key in edge_keys.tolist():
                    if key not in edges:
                        edges.add(key)
                        dst = key & 0xFFFFFFFF
                        adj[vid].add(dst)
                        adj.setdefault(dst, set()).add(vid)
        doomed = [v for v, nb in adj.items()
                  if v not in cand
                  and len({inverted[n] for n in nb if n in inverted}) < 2]
        for v in doomed:
            for n in adj.pop(v):
                adj[n].discard(v)
                edges.discard((v << 32) | n)
                edges.discard((n << 32) | v)
        deg = {}
        for e in edges:
            deg[e >> 32] = deg.get(e >> 32, 0.0) + 1.0
            deg[e & 0xFFFFFFFF] = deg.get(e & 0xFFFFFFFF, 0.0) + 1.0
        return deg

    def test_random_pages_match_reference(self):
        import random

        import numpy as np

        from reden_ray.stages.linker import _int_degree_scores

        rng = random.Random(4242)
        for trial in range(200):
            n_mentions = rng.randint(1, 8)
            n_vertices = rng.randint(2, 30)
            page = []
            for mi in range(n_mentions):
                mid = rng.choice([mi, mi + 100, 7])  # allow repeated mids
                recs = []
                for _ in range(rng.randint(1, 4)):
                    vid = rng.randrange(n_vertices)
                    dsts = [rng.randrange(n_vertices)
                            for _ in range(rng.randint(0, 6))]
                    arr = np.unique(np.asarray(dsts, dtype=np.int64)) \
                        if dsts else np.empty(0, dtype=np.int64)
                    arr = arr[arr != vid]
                    recs.append((f"e{vid}", vid, [f"e{vid}"],
                                 (vid << 32) | arr))
                page.append((mid, tuple(recs)))
            want = self._ref_degree(page)
            cand_vids = {r[1] for _m, recs in page for r in recs}
            # both the vectorized path and the size-adaptive dispatcher
            # (dict path at this page size) must match the reference
            from reden_ray.stages.linker import _int_adj_scores

            for got in (_int_degree_scores(page), _int_adj_scores(page, "degree")):
                for v in cand_vids:
                    assert got.get(v, 0.0) == want.get(v, 0.0), (trial, v)

    def test_large_page_crosses_vectorized_threshold(self):
        import random

        import numpy as np

        from reden_ray.stages.linker import (_DEGREE_VECTORIZE_MIN_KEYS,
                                             _int_adj_scores)

        rng = random.Random(7)
        page = []
        total = 0
        mi = 0
        while total <= _DEGREE_VECTORIZE_MIN_KEYS:
            vid = rng.randrange(500)
            dsts = np.unique(np.asarray(
                [rng.randrange(500) for _ in range(40)], dtype=np.int64))
            dsts = dsts[dsts != vid]
            page.append((mi, ((f"e{vid}", vid, [f"e{vid}"],
                               (vid << 32) | dsts),)))
            total += dsts.size
            mi += 1
        got = _int_adj_scores(page, "degree")  # dispatches vectorized
        want = self._ref_degree(page)
        for _m, recs in page:
            v = recs[0][1]
            assert got.get(v, 0.0) == want.get(v, 0.0)
