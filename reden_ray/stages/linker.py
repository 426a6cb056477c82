"""Per-document fusion graph + pruning + centrality + argmax (A1-A4).

This is the algorithmic core of the reference. The DEFAULT execution
shape is a FUSED zero-shuffle map (``link_documents_from_mentions``):
candidate lookup + graph linking run inside one batch fn, exact via
per-page block contiguity which the stage PROVES at runtime (tagged
boundary rows detect urls straddling a block split; straddled urls
are re-linked through the sort path). The url-hash
bucket ``groupby(...).map_groups`` paths (``link_documents`` for
row-form candidates, ``link_documents_packed(shuffle="sort")`` for
packed rows) remain for inputs with arbitrary partitioning. Semantics
in all paths:

* A1 graph fusion — union of all candidate-neighborhood edges into one
  simple directed labeled weighted graph per context; parallel edges
  collapse (first predicate wins) and self-loops are skipped
  (src/fr/lip6/reden/nelinker/GraphHandlerNEL.java:211-343; vertex
  identity = URL-decoded URI, Util.java:88-99). Statements of a
  candidate's sameAs-equivalents are re-rooted at the base URI
  (GraphHandlerNEL.java:251-333); the sameAs predicate itself is never
  an edge. One-hop sameAs expansion = J4 (GraphHandlerNEL.java:114-197).
* A2 pruning — delete every non-candidate vertex whose candidate
  neighbors cover < 2 distinct mentions; candidate vertices are never
  deleted (CentralityHandler.java:100-122; mention lookup via the J2
  inverted index, DicoProcessingNEL.java:387-401, last-writer-wins on
  URI collisions — we fix the iteration order to (mention_id, cand_rank)
  so the collision winner is deterministic).
* A3 centrality — degree (default) / closeness / eigenvector /
  betweenness over the pruned graph (CentralityHandler.java:136-171;
  the reference recomputes per candidate — we compute once per graph).
* A4 per-mention argmax — max score; ties break on the
  lexicographically LARGEST base URI (deterministic replacement for the
  reference's JVM-hash-order tie-break, Util.java:53-68 — documented
  divergence, SURVEY.md §7.6). ``prefered_uri_order="ALL"`` emits the
  winner's whole equivalence list (CentralityHandler.java:196-212).
* M11 eligibility — a context with no multi-candidate mention takes the
  NoAmbiguity fast path: first candidate assigned directly, score null
  (MainNELApp.java:418-442; ResultsAndEvaluationNEL.java:138-190).

Scale note: with a broadcast KB index this stage is a single shuffle of
narrow candidate rows on ``url``. When the KB no longer fits in one
broadcast object, use ``explode_candidate_uris`` + a hash join against
the ``kb_triples`` Dataset (J3) and regroup on ``url`` — same group
function, edges arriving as rows.
"""

from __future__ import annotations

import math
import operator as _operator

import pandas as pd

from .. import SAMEAS_PRED
from ..functions.uri import decompose
from ..state.broadcast import get_broadcast
from .candidates import MAX_CANDIDATES


# ---------------------------------------------------------------------------
# Graph assembly (A1)
# ---------------------------------------------------------------------------


# Per-worker cache of each candidate's expanded KB neighborhood.
# The probe expansion (base + equivalence URIs + sameAs hop), the KB
# lookups and the URL-decoding of every neighbor are IDENTICAL for
# every page that mentions the same dictionary entry — profiling showed
# they dominate build_fusion_graph. Keyed by the identity of the
# (kb, sameas, rels) broadcast objects (pinned so ids can't be reused),
# valued by {(entity_id, uris): (decoded_vertex, [(dst, pred, w)])}.
_NEIGH_CACHES: dict[tuple, tuple] = {}
_NEIGH_CACHES_MAX = 4  # distinct broadcast states per worker process


# ---------------------------------------------------------------------------
# Interned link state (hot-path core shared by the fused / packed / bucket
# paths). Without a -relsFile every edge weight is 1.0 (GraphHandlerNEL
# .java:286) and no measure can distinguish weights, so the LINKING graph
# only needs edge EXISTENCE — vertices intern to small ints once per
# worker and edges pack into single ints, replacing per-page hashing of
# long URI strings. With a -relsFile, recs additionally carry per-edge
# weights: the reference's sna DegreeCentrality sums edge weights and its
# FreemanClosenessCentrality runs weighted shortest paths (verified by
# decompiling jgrapht-sna-1.2.jar; betweenness/eigenvector are unweighted)
# (measured ~2.5x on the fused link stage; the string-keyed
# ``build_fusion_graph`` above remains the S11 edge-dump path, which does
# need predicates).
# ---------------------------------------------------------------------------


class _LinkState:
    """Per-worker interned views of the broadcast dictionaries.

    * ``intern``: decomposed vertex string -> small int vid
    * ``ent_recs``: (entity_id, uris) -> (entity_id, vid, emitted_uris,
      dst_vids) — the candidate's decoded vertex, its ``_emit`` URI list
      (depends only on prefered_uri_order) and its expanded KB
      neighborhood as int vids (J4 sameAs hop included)
    * ``norm_recs``: surface_norm -> tuple of candidate records in
      cand_rank order, D1-deduped and K2-capped — the whole per-mention
      candidate generation collapses to one dict hit
    """

    __slots__ = ("index", "kb", "sameas", "pref", "intern",
                 "ent_recs", "norm_recs", "rels", "weighted")

    def __init__(self, index, kb, sameas, pref: str, rels=None):
        self.index = index
        self.kb = kb
        self.sameas = sameas
        self.pref = pref
        self.rels = rels
        # a -relsFile changes degree (weight sum) and closeness
        # (weighted shortest paths) in the reference's sna library —
        # see degree_scores/closeness_scores. Only then do recs carry
        # per-edge weights; the default stays on the packed-int fast path.
        self.weighted = bool(rels)
        self.intern: dict[str, int] = {}
        self.ent_recs: dict[tuple, tuple] = {}
        self.norm_recs: dict[str, tuple] = {}

    def _vid(self, vertex: str) -> int:
        vid = self.intern.get(vertex)
        if vid is None:
            vid = len(self.intern)
            self.intern[vertex] = vid
        return vid

    def ent_rec(self, entity_id: str, uris: tuple) -> tuple:
        rec = self.ent_recs.get((entity_id, uris))
        if rec is None:
            vid = self._vid(decompose(entity_id))
            probe: list[str] = [entity_id]
            for u in uris:
                if u != entity_id:
                    probe.append(u)
            for u in self.sameas.get(entity_id, ()):  # J4: one hop
                if u not in probe:
                    probe.append(u)
            dsts: list[int] = []
            wmap: dict[int, float] | None = {} if self.weighted else None
            for u in probe:
                for pred, obj, _is_lit, _w in self.kb.get(u, ()):
                    if pred == SAMEAS_PRED:
                        continue
                    d = self._vid(decompose(obj))
                    dsts.append(d)
                    if wmap is not None and d not in wmap:
                        # first-predicate-wins per (src, dst) pair,
                        # mirroring SimpleDirectedGraph.addEdge returning
                        # false on duplicates (GraphHandlerNEL.java:288)
                        wmap[d] = self.rels.get(pred, _w)
            if self.pref == "ALL":
                emitted = list(uris)  # CentralityHandler.java:205-211
            else:
                emitted = [u for u in uris if self.pref in u] or [entity_id]
            # Pre-packed UNIQUE directed edge keys (vid << 32 | dst),
            # self-loops dropped (GraphHandlerNEL vertex1 != vertex2) —
            # page-level graph fusion reduces to np.unique over the
            # concatenation of these per-candidate arrays.
            import numpy as np

            if dsts:
                arr = np.unique(np.asarray(dsts, dtype=np.int64))
                arr = arr[arr != vid]
                edge_keys = (vid << 32) | arr
                edge_ws = (
                    np.asarray([wmap[int(d)] for d in arr], dtype=np.float64)
                    if wmap is not None else None
                )
            else:
                edge_keys = np.empty(0, dtype=np.int64)
                edge_ws = (np.empty(0, dtype=np.float64)
                           if wmap is not None else None)
            rec = (entity_id, vid, emitted, edge_keys, edge_ws)
            self.ent_recs[(entity_id, uris)] = rec
        return rec

    def mention_recs(self, norm: str) -> tuple:
        recs = self.norm_recs.get(norm)
        if recs is None:
            cands = self.index.get(norm) if self.index is not None else None
            if not cands:
                recs = ()
            else:
                seen: set[tuple] = set()  # D1
                out = []
                for entity_id, uris, _ne in cands:
                    if uris in seen:
                        continue
                    seen.add(uris)
                    out.append(self.ent_rec(entity_id, uris))
                    if len(out) >= MAX_CANDIDATES:  # K2
                        break
                recs = tuple(out)
            self.norm_recs[norm] = recs
        return recs


_LINK_STATES: dict[tuple, tuple] = {}
_LINK_STATES_MAX = 4


def _link_state(index, kb, sameas, pref: str, rels=None) -> _LinkState:
    key = (id(index), id(kb), id(sameas), pref,
           id(rels) if rels else 0)
    hit = _LINK_STATES.get(key)
    if hit is None:
        if len(_LINK_STATES) >= _LINK_STATES_MAX:
            _LINK_STATES.pop(next(iter(_LINK_STATES)))
        # pin (index, kb, sameas, rels) — ids are the key
        hit = ((index, kb, sameas, rels),
               _LinkState(index, kb, sameas, pref, rels))
        _LINK_STATES[key] = hit
    return hit[1]


def _int_adj_scores(mention_recs: list, measure: str, weighted: bool = False):
    """Graph fusion (A1) + pruning (A2) + centrality (A3) over the int-
    interned representation. ``mention_recs``: [(mention_id, recs)] in
    ascending mention_id, recs in cand_rank order. Returns {vid: score}.

    Semantics mirror build_fusion_graph/prune_graph exactly: simple
    directed graph (first edge wins = existence), self-loops skipped,
    J2 inverted index last-writer-wins in (mention_id, cand_rank) order,
    non-candidate vertices covering < 2 distinct mentions pruned.

    Degree (the production default) is sized-adaptive: typical web
    pages (tens-hundreds of edges) run the dict/set build — measured
    35 us/page vs 129 us for numpy, whose fixed per-op overhead
    dominates small graphs — while outlier pages with big fused graphs
    switch to the fully vectorized ``_int_degree_scores`` (np.unique
    over the pre-packed per-rec edge keys, O(E log E) in C). The other
    measures always use the dict build (they need full adjacency)."""
    if measure == "degree" and not weighted:
        n_keys = sum(r[3].size for _mid, recs in mention_recs for r in recs)
        if n_keys > _DEGREE_VECTORIZE_MIN_KEYS:
            return _int_degree_scores(mention_recs)
    edges: set[int] = set()       # (src << 32) | dst
    # weighted mode (a -relsFile run): per-edge weight, first-edge-wins
    # across candidates in (mention_id, cand_rank) order — the same
    # order build_fusion_graph resolves duplicate pairs in
    edge_w: dict[int, float] | None = {} if weighted else None
    adj: dict[int, set[int]] = {}
    cand_vids: set[int] = set()
    inverted: dict[int, int] = {}
    for mid, recs in mention_recs:
        for rec in recs:
            vid, edge_keys = rec[1], rec[3]
            ws = rec[4] if weighted else None
            cand_vids.add(vid)
            nb = adj.get(vid)
            if nb is None:
                nb = adj[vid] = set()
            inverted[vid] = mid  # J2 last-writer-wins
            for i, key in enumerate(edge_keys.tolist()):  # pre-uniqued, no self-loops
                if key not in edges:
                    edges.add(key)
                    if edge_w is not None:
                        edge_w[key] = float(ws[i]) if ws is not None else 1.0
                    dst = key & 0xFFFFFFFF
                    nb.add(dst)
                    dnb = adj.get(dst)
                    if dnb is None:
                        adj[dst] = {vid}
                    else:
                        dnb.add(vid)
    # A2 prune
    doomed = []
    for v, neigh in adj.items():
        if v in cand_vids:
            continue
        seen_mids = {inverted[n] for n in neigh if n in inverted}
        if len(seen_mids) < 2:
            doomed.append(v)
    for v in doomed:
        for n in adj.pop(v, ()):
            adj[n].discard(v)
            edges.discard((v << 32) | n)
            edges.discard((n << 32) | v)
            if edge_w is not None:
                edge_w.pop((v << 32) | n, None)
                edge_w.pop((n << 32) | v, None)
    if measure == "degree":
        deg: dict[int, float] = {}
        get = deg.get
        if edge_w is not None:
            for e, w in edge_w.items():
                s = e >> 32
                d = e & 0xFFFFFFFF
                deg[s] = get(s, 0.0) + w
                deg[d] = get(d, 0.0) + w
        else:
            for e in edges:
                s = e >> 32
                d = e & 0xFFFFFFFF
                deg[s] = get(s, 0.0) + 1.0
                deg[d] = get(d, 0.0) + 1.0
        return deg
    if measure == "closeness" and edge_w is not None:
        pw: dict[tuple, float] = {}
        for e, w in edge_w.items():
            s, d = e >> 32, e & 0xFFFFFFFF
            sk = (s, d) if s <= d else (d, s)
            old = pw.get(sk)
            pw[sk] = w if old is None else min(old, w)
        return closeness_scores(adj, pw or None)
    return _MEASURES[measure](None, adj)  # closeness/eigen/betweenness: adj only


# crossover where np.unique-based scoring beats the dict/set build
# (measured: dict 0.45 us/edge-key linear; numpy ~100 us fixed + C sort)
_DEGREE_VECTORIZE_MIN_KEYS = 1024


def _int_degree_scores(mention_recs: list) -> dict:
    """Vectorized A1+A2+A3(degree): same semantics as the dict path.

    * fusion: np.unique over the concatenated per-rec edge-key arrays
      (keys pre-deduped per rec, self-loops pre-dropped);
    * prune: a non-candidate vertex only ever appears as an edge DST
      (non-candidates emit no edges), so coverage = distinct mentions
      among its unique (src-candidate -> mention) pairs;
    * degree: per remaining unique directed edge, +1 to both endpoints
      (matches the dict path's count over the edge set)."""
    import numpy as np

    inverted: dict[int, int] = {}   # vid -> mention ordinal (LWW)
    mid_ord: dict[int, int] = {}
    parts = []
    for mid, recs in mention_recs:
        mi = mid_ord.setdefault(mid, len(mid_ord))
        for rec in recs:
            inverted[rec[1]] = mi  # J2 last-writer-wins
            if rec[3].size:
                parts.append(rec[3])
    if not parts:
        return {}
    keys = np.unique(np.concatenate(parts)) if len(parts) > 1 else parts[0]
    src = keys >> 32
    dst = keys & 0xFFFFFFFF
    cand = np.fromiter(inverted.keys(), dtype=np.int64, count=len(inverted))
    cand_sorted = np.sort(cand)
    nc_mask = ~_isin_sorted(dst, cand_sorted)
    if nc_mask.any():
        nc_src = src[nc_mask]
        nc_dst = dst[nc_mask]
        us, inv = np.unique(nc_src, return_inverse=True)
        us_mid = np.fromiter((inverted[int(v)] for v in us),
                             dtype=np.int64, count=len(us))
        upairs = np.unique((nc_dst << 32) | us_mid[inv])
        ud, cnt = np.unique(upairs >> 32, return_counts=True)
        doomed = ud[cnt < 2]
        if doomed.size:
            keep = ~_isin_sorted(dst, doomed)
            src = src[keep]
            dst = dst[keep]
    if not src.size:  # every edge pruned -> all degrees 0
        return {}
    verts, counts = np.unique(np.concatenate([src, dst]), return_counts=True)
    pos = np.searchsorted(verts, cand)
    pos_c = np.minimum(pos, verts.size - 1)
    ok = verts[pos_c] == cand
    return {int(v): float(c)
            for v, c in zip(cand[ok].tolist(), counts[pos_c[ok]].tolist())}


def _isin_sorted(values, sorted_arr):
    """np.isin against an already-sorted unique array via searchsorted."""
    import numpy as np

    pos = np.searchsorted(sorted_arr, values)
    pos = np.minimum(pos, sorted_arr.size - 1)
    return sorted_arr[pos] == values


def _link_page_cols(mention_recs: list, state: _LinkState, measure: str):
    """Link one page given [(mid, surface, norm, recs)] in ascending
    mention_id. Returns (mids, surfs, norms, uris, all_uris, scores)
    column lists — url is attached by the caller."""
    o_mid: list[int] = []
    o_surf: list[str] = []
    o_norm: list[str] = []
    o_uri: list[str] = []
    o_all: list[list] = []
    o_score: list[float] = []
    graph = False
    for _mid, _s, _n, recs in mention_recs:
        if len(recs) > 1:
            graph = True
            break
    if not graph:
        # M11 NoAmbiguity fast path
        for mid, surface, norm, recs in mention_recs:
            eid, _vid, emitted = recs[0][0], recs[0][1], recs[0][2]
            o_mid.append(mid)
            o_surf.append(surface)
            o_norm.append(norm)
            o_uri.append(eid)
            o_all.append(emitted)
            o_score.append(float("nan"))
        return o_mid, o_surf, o_norm, o_uri, o_all, o_score
    scores = _int_adj_scores([(m[0], m[3]) for m in mention_recs], measure,
                             weighted=state.weighted)
    for mid, surface, norm, recs in mention_recs:
        best = None
        best_key = None
        for rec in recs:
            s = scores.get(rec[1], 0.0)
            key = (s, rec[0])  # tie -> lexicographically largest URI
            if best_key is None or key > best_key:
                best, best_key = rec, key
        o_mid.append(mid)
        o_surf.append(surface)
        o_norm.append(norm)
        o_uri.append(best[0])
        o_all.append(best[2])
        o_score.append(best_key[0])
    return o_mid, o_surf, o_norm, o_uri, o_all, o_score


def _neigh_cache(kb, sameas, rels) -> dict:
    key = (id(kb), id(sameas), id(rels) if rels else 0)
    hit = _NEIGH_CACHES.get(key)
    if hit is None:
        if len(_NEIGH_CACHES) >= _NEIGH_CACHES_MAX:
            _NEIGH_CACHES.pop(next(iter(_NEIGH_CACHES)))
        # pin the state objects: their ids are the key, so they must
        # not be garbage-collected and reused while the cache lives
        hit = ((kb, sameas, rels), {})
        _NEIGH_CACHES[key] = hit
    return hit[1]


def _entity_edges(base: str, uris, kb, sameas, rels, cache: dict):
    """(decoded vertex, [(decoded_dst, pred, weight)]) for one candidate."""
    ckey = (base, tuple(uris))
    ent = cache.get(ckey)
    if ent is None:
        vb = decompose(base)
        probe: list[str] = [base]
        for u in uris:
            if u != base:
                probe.append(u)
        for u in sameas.get(base, ()):  # J4: one hop, non-transitive
            if u not in probe:
                probe.append(u)
        elist: list[tuple[str, str, float]] = []
        for u in probe:
            for pred, obj, _is_lit, w in kb.get(u, ()):
                if pred == SAMEAS_PRED:
                    continue
                elist.append((decompose(obj), pred, rels.get(pred, w) if rels else w))
        ent = (vb, elist)
        cache[ckey] = ent
    return ent


def build_fusion_graph(
    cand_rows: list[dict],
    kb: dict[str, list[tuple[str, str, bool, float]]],
    sameas: dict[str, list[str]],
    rels: dict[str, float] | None = None,
):
    """Build the per-context fusion graph.

    ``cand_rows``: candidate dicts sorted by (mention_id, cand_rank).
    Returns (edges, adj, cand_vertex_of_row, inverted) where
      edges: {(src, dst): (pred, weight)}  — simple digraph
      adj:   {vertex: set(neighbor)}       — undirected adjacency
      inverted: {candidate_vertex: mention_id}  (J2, last-writer-wins)
    """
    edges: dict[tuple[str, str], tuple[str, float]] = {}
    adj: dict[str, set[str]] = {}
    cand_vertices: set[str] = set()
    inverted: dict[str, int] = {}
    cache = _neigh_cache(kb, sameas, rels)

    for row in cand_rows:
        vb, elist = _entity_edges(row["entity_id"], row["uris"], kb, sameas,
                                  rels, cache)
        cand_vertices.add(vb)
        adj.setdefault(vb, set())
        inverted[vb] = row["mention_id"]  # last-writer-wins (J2)
        for dst, pred, weight in elist:
            if vb == dst:
                continue  # self-loops skipped (GraphHandlerNEL vertex1!=vertex2)
            key = (vb, dst)
            if key not in edges:  # SimpleDirectedGraph: first edge wins
                edges[key] = (pred, weight)
                adj.setdefault(vb, set()).add(dst)
                adj.setdefault(dst, set()).add(vb)
    return edges, adj, cand_vertices, inverted


def prune_graph(edges, adj, cand_vertices, inverted):
    """A2: delete non-candidate vertices adjacent to candidates of < 2
    distinct mentions (CentralityHandler.java:100-122). In place."""
    doomed = []
    for v, neigh in adj.items():
        if v in cand_vertices:
            continue
        mentions = {inverted[n] for n in neigh if n in inverted}
        if len(mentions) < 2:
            doomed.append(v)
    for v in doomed:
        for n in adj.pop(v, ()):  # remove incident edges
            adj[n].discard(v)
            edges.pop((v, n), None)
            edges.pop((n, v), None)
    return edges, adj


# ---------------------------------------------------------------------------
# Centrality measures (A3) — computed once per pruned graph
# ---------------------------------------------------------------------------


def degree_scores(edges) -> dict[str, float]:
    """Degree = sum of incident directed edge WEIGHTS (in + out).

    Exact parity with dk.aaue.sna DegreeCentrality.calculate (decompiled
    from the reference's jgrapht-sna-1.2.jar): score(v) = sum of
    getEdgeWeight over edgesOf(v), then / (n-1) — the normalization is a
    per-graph constant, rank-preserving under per-mention argmax, so we
    skip it. Without a -relsFile every weight is 1.0 (GraphHandlerNEL
    .java:286) and this degenerates to the edge count."""
    weighted = isinstance(edges, dict)
    deg: dict[str, float] = {}
    for key, val in (edges.items() if weighted else ((e, None) for e in edges)):
        src, dst = key
        # val = (pred, weight) on the string path, a bare float on the
        # weighted join path, None (dict.fromkeys) on the unweighted one
        if not weighted or val is None:
            w = 1.0
        elif isinstance(val, tuple):
            w = float(val[1])
        else:
            w = float(val)
        deg[src] = deg.get(src, 0.0) + w
        deg[dst] = deg.get(dst, 0.0) + w
    return deg


def closeness_scores(adj, pair_w: dict | None = None) -> dict[str, float]:
    """Freeman closeness, exact parity with dk.aaue.sna
    FreemanClosenessCentrality + FloydWarshallAllShortestPaths
    (decompiled from the reference's jar):

    * paths are UNDIRECTED (the sna FW seeds d[s][t]=d[t][s]=w and
      relaxes both directions even for a directed graph) and WEIGHTED
      (it calls getEdgeWeight — so a -relsFile run DOES change
      closeness, unlike betweenness/eigenvector);
    * closeness(v) = 1 / sum of distances to ALL other vertices — if
      ANY vertex is unreachable the sum is +inf and the score is 0.0
      (calculate() breaks at the first infinite partial sum).

    ``pair_w``: optional {frozenset-ish (u, v) sorted tuple: weight}.
    When both (u,v) and (v,u) carry different weights the reference's
    symmetric seed is last-edge-wins over a HashSet (nondeterministic);
    we use min(w) deterministically — identical when weights agree,
    and strictly a documented tie-rule where the reference is random.
    Unweighted (pair_w None) uses BFS."""
    import heapq

    n = len(adj)
    out: dict[str, float] = {}
    for s in adj:
        if pair_w is None:
            dist = {s: 0.0}
            frontier = [s]
            total = 0.0
            while frontier:
                nxt = []
                for v in frontier:
                    for nb in adj[v]:
                        if nb not in dist:
                            dist[nb] = dist[v] + 1.0
                            total += dist[nb]
                            nxt.append(nb)
                frontier = nxt
        else:
            dist = {}
            heap = [(0.0, s)]
            total = 0.0
            while heap:
                d, v = heapq.heappop(heap)
                if v in dist:
                    continue
                dist[v] = d
                total += d
                for nb in adj[v]:
                    if nb not in dist:
                        key = (v, nb) if v <= nb else (nb, v)
                        heapq.heappush(heap, (d + pair_w.get(key, 1.0), nb))
        # any unreachable vertex in the (pruned) graph -> +inf sum -> 0.0
        out[s] = 1.0 / total if (len(dist) == n and total) else 0.0
    return out


def eigenvector_scores(adj, iters: int = 50) -> dict[str, float]:
    """Power iteration on the undirected adjacency."""
    verts = sorted(adj)
    if not verts:
        return {}
    x = {v: 1.0 for v in verts}
    for _ in range(iters):
        nx = {v: sum(x[n] for n in adj[v]) for v in verts}
        norm = math.sqrt(sum(val * val for val in nx.values())) or 1.0
        x = {v: val / norm for v, val in nx.items()}
    return x


def betweenness_scores(adj) -> dict[str, float]:
    """Brandes betweenness (unweighted, undirected). Small graphs only —
    the reference itself flags it 'avoid it, too long'
    (config/config-authors-bnf.properties:25)."""
    verts = sorted(adj)
    cb = {v: 0.0 for v in verts}
    for s in verts:
        stack: list[str] = []
        pred: dict[str, list[str]] = {v: [] for v in verts}
        sigma = {v: 0.0 for v in verts}
        sigma[s] = 1.0
        dist = {v: -1 for v in verts}
        dist[s] = 0
        queue = [s]
        while queue:
            v = queue.pop(0)
            stack.append(v)
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    queue.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    pred[w].append(v)
        delta = {v: 0.0 for v in verts}
        while stack:
            w = stack.pop()
            for v in pred[w]:
                delta[v] += (sigma[v] / sigma[w]) * (1 + delta[w])
            if w != s:
                cb[w] += delta[w]
    return cb


def _pair_weights(edges) -> dict | None:
    """Symmetric {sorted (u,v): weight} from a weighted edge dict, or
    None when the graph is effectively unweighted (every w == 1.0 or no
    weight information — the common no-relsFile case, which keeps
    closeness on the fast BFS route). min(w) over the two directions is
    the deterministic stand-in for the reference's last-edge-wins seed
    (see closeness_scores docstring)."""
    if not isinstance(edges, dict):
        return None
    pw: dict[tuple, float] = {}
    uniform = True
    for key, val in edges.items():
        if val is None:
            continue
        w = float(val[1]) if isinstance(val, tuple) else float(val)
        if w != 1.0:
            uniform = False
        u, v = key
        sk = (u, v) if u <= v else (v, u)
        old = pw.get(sk)
        pw[sk] = w if old is None else min(old, w)
    return None if uniform else pw


_MEASURES = {
    "degree": lambda edges, adj: degree_scores(edges),
    "closeness": lambda edges, adj: closeness_scores(adj, _pair_weights(edges)),
    "eigenvector": lambda edges, adj: eigenvector_scores(adj),
    "betweenness": lambda edges, adj: betweenness_scores(adj),
}


# ---------------------------------------------------------------------------
# Per-context linking (M11 + A4)
# ---------------------------------------------------------------------------


def link_context(
    cand_rows: list[dict],
    kb,
    sameas,
    rels=None,
    measure: str = "degree",
    prefered_uri_order: str = "ALL",
) -> list[dict]:
    """Link one context's mentions. Returns link dicts.

    Thin dict-row adapter over the interned ``_link_page_cols`` core —
    the fused, packed and bucket paths all reduce to the same per-page
    function, so path equivalence is structural, not coincidental.
    ``rels`` (a -relsFile) changes degree (weight sum, sna
    DegreeCentrality) and closeness (weighted shortest paths, sna
    FloydWarshall — both verified by decompiling the reference's
    jgrapht-sna-1.2.jar); betweenness and eigenvector are unweighted in
    that library, so rels cannot affect them."""
    if not cand_rows:
        return []
    by_mention: dict[int, list[dict]] = {}
    for row in cand_rows:
        by_mention.setdefault(row["mention_id"], []).append(row)
    state = _link_state(None, kb, sameas, prefered_uri_order, rels)
    page = []
    for mid in sorted(by_mention):
        rows = by_mention[mid]
        rows.sort(key=_BY_RANK)
        recs = tuple(
            state.ent_rec(r["entity_id"], tuple(r["uris"])) for r in rows
        )
        page.append((mid, rows[0]["surface"], rows[0]["surface_norm"], recs))
    mids, surfs, norms, uris, all_uris, scores = _link_page_cols(page, state, measure)
    url = cand_rows[0]["url"]
    return [
        {"url": url, "mention_id": m, "surface": s, "surface_norm": n,
         "uri": u, "all_uris": a, "score": sc}
        for m, s, n, u, a, sc in zip(mids, surfs, norms, uris, all_uris, scores)
    ]


def _emit(row: dict, score: float | None, prefered_uri_order: str) -> dict:
    uris = list(row["uris"])
    if prefered_uri_order == "ALL":
        emitted = uris  # whole equivalence list (CentralityHandler.java:205-211)
    else:
        emitted = [u for u in uris if prefered_uri_order in u] or [row["entity_id"]]
    return {
        "url": row["url"],
        "mention_id": row["mention_id"],
        "surface": row["surface"],
        "surface_norm": row["surface_norm"],
        "uri": row["entity_id"],
        "all_uris": emitted,
        "score": float("nan") if score is None else float(score),
    }


# ---------------------------------------------------------------------------
# Dataset-level stage
# ---------------------------------------------------------------------------
# The shuffle key is hash(url) % num_buckets rather than raw url: one
# map_groups invocation then handles a whole BUCKET of documents with a
# plain pandas groupby loop inside, instead of paying Ray's per-group
# UDF dispatch for millions of tiny per-url groups. Bucket count bounds
# task count and is the explicit partitioning knob for a cluster run.

_LINK_COLUMNS = ["url", "mention_id", "surface", "surface_norm", "uri", "all_uris", "score"]

# Arrow schema of a links Dataset row (typed empty-links construction)
def _link_schema():
    import pyarrow as pa

    return pa.schema({
        "url": pa.string(), "mention_id": pa.int64(), "surface": pa.string(),
        "surface_norm": pa.string(), "uri": pa.string(),
        "all_uris": pa.list_(pa.string()), "score": pa.float64(),
    })


LINK_SCHEMA = _link_schema()

# Power of two (Arrow bit-and bucketing). 256 smooths the straggler
# tail vs 64 on one node and leaves headroom for a few hundred
# cluster-wide link tasks; raise for larger clusters.
DEFAULT_URL_BUCKETS = 256


def add_url_bucket(df: pd.DataFrame, num_buckets: int) -> pd.DataFrame:
    """Stable (process-independent) hash bucket of the url column
    (pandas fallback for inputs without a precomputed url_hash)."""
    df = df.copy()
    df["__bucket"] = (
        pd.util.hash_pandas_object(df["url"], index=False) % num_buckets
    ).astype("int64")
    return df


def add_bucket_arrow(num_buckets: int):
    """Arrow-native bucketing from the precomputed ``url_hash`` column:
    a vectorized bit-and (num_buckets must be a power of two). Keeps
    blocks in Arrow — pandas blocks of object strings serialize ~3x
    larger through the shuffle."""
    assert num_buckets & (num_buckets - 1) == 0, "num_buckets must be a power of 2"
    import pyarrow as pa
    import pyarrow.compute as pc

    def add(t: pa.Table) -> pa.Table:
        b = pc.bit_wise_and(t.column("url_hash"), pa.scalar(num_buckets - 1, pa.int64()))
        return t.append_column("__bucket", b)

    return add


def make_link_bucket_fn(kb_ref, sameas_ref, rels=None, measure="degree",
                        prefered_uri_order="ALL"):
    """Bucket fn: links every url group inside one bucket; broadcast
    state fetched (and per-worker cached) on first call."""

    def link_bucket(df: pd.DataFrame) -> pd.DataFrame:
        kb = get_broadcast(kb_ref)
        sameas = get_broadcast(sameas_ref)
        df = df.sort_values(["url", "mention_id", "cand_rank"], kind="stable")
        out: list[dict] = []
        cur_url, cur_rows = None, []
        # itertuples + manual run-length grouping: ~10x cheaper than
        # df.groupby + to_dict("records") on millions of tiny groups.
        for t in df.itertuples(index=False):
            if t.url != cur_url:
                if cur_rows:
                    out.extend(link_context(cur_rows, kb, sameas, rels, measure,
                                            prefered_uri_order))
                cur_url, cur_rows = t.url, []
            cur_rows.append(
                {"url": t.url, "mention_id": t.mention_id, "surface": t.surface,
                 "surface_norm": t.surface_norm, "cand_rank": t.cand_rank,
                 "entity_id": t.entity_id, "uris": t.uris_str.split(" ")}
            )
        if cur_rows:
            out.extend(link_context(cur_rows, kb, sameas, rels, measure,
                                    prefered_uri_order))
        return _links_arrow(out)

    return link_bucket


def _links_arrow(out: list[dict]):
    """Arrow links table (zero-copy-friendly downstream blocks)."""
    return _links_arrow_cols(
        [r["url"] for r in out],
        [r["mention_id"] for r in out],
        [r["surface"] for r in out],
        [r["surface_norm"] for r in out],
        [r["uri"] for r in out],
        [r["all_uris"] for r in out],
        [r["score"] for r in out],
    )


def _links_arrow_cols(urls, mids, surfs, norms, uris, all_uris, scores):
    """Arrow links table from pre-accumulated column lists."""
    import pyarrow as pa

    return pa.table({
        "url": pa.array(urls, pa.string()),
        "mention_id": pa.array(mids, pa.int64()),
        "surface": pa.array(surfs, pa.string()),
        "surface_norm": pa.array(norms, pa.string()),
        "uri": pa.array(uris, pa.string()),
        "all_uris": pa.array(all_uris, pa.list_(pa.string())),
        "score": pa.array(scores, pa.float64()),
    })


_BY_MID = _operator.itemgetter(0)
_BY_RANK = _operator.itemgetter("cand_rank")


def link_documents(candidates_ds, kb_ref, sameas_ref, rels=None,
                   measure: str = "degree", prefered_uri_order: str = "ALL",
                   num_buckets: int = DEFAULT_URL_BUCKETS):
    """candidates Dataset -> links Dataset (one shuffle, keyed on
    hash(url) bucket)."""
    fn = make_link_bucket_fn(kb_ref, sameas_ref, rels, measure, prefered_uri_order)
    bucketed = candidates_ds.map_batches(
        add_bucket_arrow(num_buckets), batch_format="pyarrow"
    )
    return (
        bucketed.groupby("__bucket")
        .map_groups(fn, batch_format="pandas")
    )


def _make_packed_link_fn(kb_ref, sameas_ref, rels, measure, prefered_uri_order):
    """Batch fn: packed per-url rows -> links. Payloads of the same url
    within the batch merge (deterministic order)."""
    import pickle
    import zlib

    def link_batch(df: pd.DataFrame) -> pd.DataFrame:
        kb = get_broadcast(kb_ref)
        sameas = get_broadcast(sameas_ref)
        per_url: dict[str, list] = {}
        for url, payload in zip(df["url"].tolist(), df["payload"].tolist()):
            per_url.setdefault(url, []).append(payload)
        out: list[dict] = []
        for url in sorted(per_url):
            tuples: list[tuple] = []
            for payload in per_url[url]:
                tuples.extend(pickle.loads(zlib.decompress(payload)))
            tuples.sort(key=lambda t: (t[0], t[3]))  # (mention_id, cand_rank)
            rows = [
                {"url": url, "mention_id": mid, "surface": surface,
                 "surface_norm": norm, "cand_rank": rank,
                 "entity_id": entity_id, "uris": uris}
                for (mid, surface, norm, rank, entity_id, uris) in tuples
            ]
            out.extend(link_context(rows, kb, sameas, rels, measure,
                                    prefered_uri_order))
        return _links_arrow(out)

    return link_batch


def link_documents_packed(packed_ds, kb_ref, sameas_ref, rels=None,
                          measure: str = "degree", prefered_uri_order: str = "ALL",
                          num_buckets: int = DEFAULT_URL_BUCKETS,
                          shuffle: str = "sort"):
    """Packed per-url candidates -> links Dataset.

    ``shuffle="sort"`` (default): the url-hash bucket groupby — one
    zlib-compressed binary row per page through the sort. Exact for ANY
    input partitioning (a url's payload fragments merge in the bucket
    fn), so it is the safe public default for packed rows re-read from
    arbitrary Parquet.

    ``shuffle="none"``: NO shuffle at all — each packed row links
    independently inside a plain ``map_batches``. Exact iff every url
    has all its candidate tuples in ONE batch, which whole-block
    packing guarantees (``generate_candidates_packed(batch_size=None)``
    + the NER stage emitting a page's mentions contiguously). Callers
    must opt in knowingly; the NEL pipeline's default fast path is the
    fused ``link_documents_from_mentions`` which self-verifies
    contiguity at runtime instead of assuming it. Output of the two
    modes is identical on unfragmented input (tested)."""
    fn = _make_packed_link_fn(kb_ref, sameas_ref, rels, measure, prefered_uri_order)
    if shuffle == "none":
        return packed_ds.map_batches(fn, batch_format="pandas", batch_size=None)
    bucketed = packed_ds.map_batches(
        add_bucket_arrow(num_buckets), batch_format="pyarrow"
    )
    return bucketed.groupby("__bucket").map_groups(fn, batch_format="pandas")


# Per-worker bounded ADAPTIVE memo for the fused path: pages with
# IDENTICAL mention sequences (mention_id is page-local, so boilerplate
# / duplicated pages collide exactly) produce identical links modulo
# the url column. Web corpora repeat pages heavily; a memo hit skips
# candidate generation AND graph linking. Keyed by the broadcast-state
# identity + the page's (mention_id, surface, surface_norm) signature;
# FIFO-bounded. On corpora with no repeats the memo is pure overhead
# (8192 fat tuple entries churning through FIFO eviction + GC pressure
# — measured ~15-20% on the fused stage), so each worker self-disables
# after a probe window with a sub-threshold hit rate.
_CTX_MEMOS: dict[tuple, "_CtxMemo"] = {}
_CTX_MEMOS_MAX = 4
# Per-memo entry cap; env-tunable (REDEN_CTX_MEMO_MAX=0 disables
# memoization outright for corpora known to have no repeated pages).
import os as _os

_CTX_MEMO_MAX_ENTRIES = int(_os.environ.get("REDEN_CTX_MEMO_MAX", "8192"))
# Probe window is per WORKER: at the old 20k-page window a 32-worker run
# over a 600k-page no-repeat corpus paid signature+insert overhead on
# EVERY page (32 x 20k >= corpus) while an 8-worker run paid it on 27%
# — the asymmetry alone skewed measured N-vs-4N scaling. 2k pages is
# plenty to detect boilerplate repetition (hot pages repeat thousands
# of times in web corpora) at ~0.3% of a 600k-page/32-worker run.
_CTX_MEMO_PROBE = 2_000    # pages before the hit rate is judged
_CTX_MEMO_MIN_RATE = 0.02  # keep memoizing only above this hit rate


class _CtxMemo:
    __slots__ = ("map", "hits", "misses", "off")

    def __init__(self):
        self.map: dict = {}
        self.hits = 0
        self.misses = 0
        self.off = _CTX_MEMO_MAX_ENTRIES <= 0

    def judge(self) -> None:
        n = self.hits + self.misses
        if n >= _CTX_MEMO_PROBE and self.hits < n * _CTX_MEMO_MIN_RATE:
            self.off = True
            self.map.clear()


def _ctx_memo(state_key: tuple) -> "_CtxMemo":
    memo = _CTX_MEMOS.get(state_key)
    if memo is None:
        if len(_CTX_MEMOS) >= _CTX_MEMOS_MAX:
            _CTX_MEMOS.pop(next(iter(_CTX_MEMOS)))
        memo = _CtxMemo()
        _CTX_MEMOS[state_key] = memo
    return memo


# Per-process batch-tag state for the fused path's straddle detection:
# a random 44-bit process salt + 20-bit in-process counter gives every
# fused batch invocation a cluster-unique int64 tag (pids alone collide
# across nodes).
_BTAG_SALT: int | None = None
_BTAG_COUNTER = 0


def _next_btag() -> int:
    global _BTAG_SALT, _BTAG_COUNTER
    if _BTAG_SALT is None:
        import os

        _BTAG_SALT = int.from_bytes(os.urandom(8), "big") & 0x7FFF_FFFF_FFF0_0000
    _BTAG_COUNTER = (_BTAG_COUNTER + 1) & 0xFFFFF
    return _BTAG_SALT | _BTAG_COUNTER


# Fused-path output chunking: the link batch fn yields url-aligned
# chunks of ~this many (estimated Arrow) bytes. Ray's BlockOutputBuffer
# concatenates yielded batches and cuts blocks at ADD boundaries; it
# only slices INSIDE a built block when the block reaches 1.5x
# target_max_block_size, and since the buffer is always <= target
# before an add, that needs a single added chunk >= 0.5x target
# (64 MiB at the 128 MiB default). Chunks bounded well under that make
# every materialized link block url-aligned BY CONSTRUCTION — which is
# what lets NELPipeline.triples skip the (url, uri) pair-dedup shuffle
# on clean fused runs (measured ~12 s of poorly-scaling all-to-all at
# 2.4M pages / 32 CPUs).
_FUSED_CHUNK_BYTES = 16 << 20
# A single page whose link rows alone approach the 0.5x-target slice
# bound would void the url-alignment guarantee (a page cannot be split
# across yields) — fail loudly instead of risking silent duplicates.
_FUSED_PAGE_BYTES_HARD = 48 << 20


def _cols_arrow_bytes(cols) -> int:
    """Estimated Arrow bytes of one page's link columns (url excluded):
    string data + 16B/element offset+validity slack, 36B/row fixed
    (mention_id + score + __btag)."""
    b = 36 * len(cols[0])
    for s in cols[1]:
        b += len(s) + 16
    for s in cols[2]:
        b += len(s) + 16
    for s in cols[3]:
        b += len(s) + 16
    for lst in cols[4]:
        b += 16
        for s in lst:
            b += len(s) + 16
    return b


def link_documents_from_mentions(mentions_ds, dico_ref, kb_ref, sameas_ref,
                                 rels=None, measure: str = "degree",
                                 prefered_uri_order: str = "ALL",
                                 stats: dict | None = None,
                                 chunk_bytes: int = _FUSED_CHUNK_BYTES,
                                 page_bytes_hard: int = _FUSED_PAGE_BYTES_HARD):
    """Mentions -> links in ONE fused map stage, zero shuffle and zero
    intermediate serialization — SELF-VERIFYING against block
    fragmentation.

    Candidate generation (J1 broadcast exact-match, D1 dedup, K2 cap —
    same logic as CandidateGen) runs INSIDE the link batch fn, so the
    candidate tuples never cross a process boundary: no packing, no
    pickling, no sort. Exactness needs each url's mention rows in one
    batch; whole-block batches over the NER stage's per-page-contiguous
    output normally guarantee that, but Ray's dynamic block splitting
    can cut an oversized block mid-page. Instead of assuming, the stage
    PROVES contiguity at runtime:

    1. each batch also re-emits the mention rows of its FIRST and LAST
       url tagged with a batch-unique ``__btag`` (a url fragmented
       across blocks can only ever sit at block edges — map stages
       preserve row order, so fragments land in adjacent batches);
    2. after materializing, urls whose boundary rows carry >= 2
       distinct tags are *straddled* — their fused links were computed
       from partial contexts;
    3. straddled urls (normally zero) have their fused links dropped
       and are re-linked exactly through the packed + sort path, built
       from the boundary mention rows themselves (no lineage re-run).

    Common case cost: a handful of extra rows per batch and one tiny
    driver read of distinct (url, tag) pairs — no shuffle, no fallback
    re-execution. Output is YIELDED in url-aligned ~``chunk_bytes``
    chunks (never cutting a page), which keeps every materialized link
    block url-aligned (see ``_FUSED_CHUNK_BYTES``) — downstream triple
    emission relies on that to skip its (url, uri) dedup shuffle on
    clean runs. ``stats`` (optional dict) receives
    ``{"straddled_urls": n, "boundary_pairs": n, "max_block_bytes": n,
    "fused_clean": bool, "url_aligned_blocks": bool}``."""
    import pyarrow as pa
    import pyarrow.compute as pc

    state_key = (dico_ref.hex(), kb_ref.hex(), sameas_ref.hex(), measure,
                 prefered_uri_order,
                 tuple(sorted(rels.items())) if rels else ())

    chunk = int(chunk_bytes)
    page_hard = int(page_bytes_hard)

    def link_batch(batch):
        state = _link_state(get_broadcast(dico_ref), get_broadcast(kb_ref),
                            get_broadcast(sameas_ref), prefered_uri_order)
        memo = _ctx_memo(state_key)
        mention_recs = state.mention_recs

        urls = batch.column("url").to_pylist()
        mids = batch.column("mention_id").to_pylist()
        surfs = batch.column("surface").to_pylist()
        norms = batch.column("surface_norm").to_pylist()
        edge_urls = {urls[0], urls[-1]} if urls else set()
        btag = _next_btag()
        b_url, b_mid, b_surf, b_norm = [], [], [], []
        o_url: list[str] = []
        o_mid: list[int] = []
        o_surf: list[str] = []
        o_norm: list[str] = []
        o_uri: list[str] = []
        o_all: list[list] = []
        o_score: list[float] = []

        def flush() -> "pa.Table":
            t = _links_arrow_cols(o_url, o_mid, o_surf, o_norm, o_uri, o_all,
                                  o_score)
            return t.append_column("__btag", pa.nulls(t.num_rows, pa.int64()))

        def link_page(url: str, s: int, e: int) -> int:
            """Link one page's contiguous mention rows [s, e); returns the
            page's estimated Arrow output bytes (for chunk accounting)."""
            if url in edge_urls:
                b_url.extend([url] * (e - s))
                b_mid.extend(mids[s:e])
                b_surf.extend(surfs[s:e])
                b_norm.extend(norms[s:e])
            sig = None
            entry = None
            if not memo.off:
                sig = (tuple(mids[s:e]), tuple(surfs[s:e]), tuple(norms[s:e]))
                entry = memo.map.get(sig)
                if entry is None:
                    memo.misses += 1
                else:
                    memo.hits += 1
            if entry is None:
                page = []
                for i in range(s, e):
                    recs = mention_recs(norms[i])
                    if recs:
                        page.append((mids[i], surfs[i], norms[i], recs))
                page.sort(key=_BY_MID)  # ascending mention_id (A4 emit order)
                cols = _link_page_cols(page, state, measure)
                entry = (cols, _cols_arrow_bytes(cols))
                if sig is not None:
                    if len(memo.map) >= _CTX_MEMO_MAX_ENTRIES:
                        memo.map.pop(next(iter(memo.map)))
                    memo.map[sig] = entry
                    memo.judge()
            cols, col_bytes = entry
            o_url.extend([url] * len(cols[0]))
            o_mid.extend(cols[0])
            o_surf.extend(cols[1])
            o_norm.extend(cols[2])
            o_uri.extend(cols[3])
            o_all.extend(cols[4])
            o_score.extend(cols[5])
            return col_bytes + len(cols[0]) * (len(url) + 16)

        acc = 0
        start = 0
        for i in range(1, len(urls) + 1):
            if i == len(urls) or urls[i] != urls[start]:
                page_bytes = link_page(urls[start], start, i)
                start = i
                if page_bytes >= page_hard:
                    raise RuntimeError(
                        f"fused link path: one page ({urls[start - 1]!r}) "
                        f"produced ~{page_bytes >> 20} MiB of link rows — too "
                        "large to keep link blocks url-aligned. Re-run with "
                        "NELConfig.link_shuffle='sort' for this corpus."
                    )
                acc += page_bytes
                if acc >= chunk:
                    # url-aligned chunk: flushed only BETWEEN pages, and
                    # bounded (chunk + one page) << 0.5x target block
                    # size, so Ray never slices inside it (see
                    # _FUSED_CHUNK_BYTES note above)
                    yield flush()
                    for lst in (o_url, o_mid, o_surf, o_norm, o_uri, o_all,
                                o_score):
                        lst.clear()
                    acc = 0
        # final (possibly empty) chunk keeps the per-batch schema stable
        yield flush()
        if b_url:
            n = len(b_url)
            yield pa.table({
                "url": pa.array(b_url, pa.string()),
                "mention_id": pa.array(b_mid, pa.int64()),
                "surface": pa.array(b_surf, pa.string()),
                "surface_norm": pa.array(b_norm, pa.string()),
                "uri": pa.nulls(n, pa.string()),
                "all_uris": pa.nulls(n, pa.list_(pa.string())),
                "score": pa.nulls(n, pa.float64()),
                "__btag": pa.array([btag] * n, pa.int64()),
            })

    mixed = mentions_ds.map_batches(
        link_batch, batch_format="pyarrow", batch_size=None
    ).materialize()

    # distinct (url, __btag) pairs, deduped per block before the driver
    # read: <= a few rows per source batch regardless of corpus size.
    def _pairs(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("__btag")))
        return t.group_by(["url", "__btag"]).aggregate([])

    pairs = (
        mixed.select_columns(["url", "__btag"])
        .map_batches(_pairs, batch_format="pyarrow")
        .to_pandas()
    )
    tag_counts = pairs.groupby("url")["__btag"].nunique() if len(pairs) else None
    straddled = (
        set(tag_counts[tag_counts >= 2].index) if tag_counts is not None else set()
    )
    if stats is not None:
        stats["straddled_urls"] = len(straddled)
        stats["boundary_pairs"] = int(len(pairs))
        # Publish the materialized link-block ceiling so downstream
        # consumers (NELPipeline.triples' structured-fast-path guard)
        # can decide WITHOUT re-materializing: the returned dataset is
        # a zero-copy Arrow filter over these already-pinned blocks,
        # cheap to re-scan per consumer — rewriting ~10 GiB of link
        # rows into the object store just to measure them costs more
        # than every consumer's filter re-scan combined.
        max_block = 0
        for bundle in mixed.iter_internal_ref_bundles():
            for meta in bundle.metadata:
                max_block = max(max_block, meta.size_bytes or 0)
        stats["max_block_bytes"] = max_block
        stats["fused_clean"] = not straddled
        # chunked yields (see _FUSED_CHUNK_BYTES) keep every link block
        # url-aligned, so on a clean run the per-batch (url, uri)
        # combiner in triple emission is globally exact with NO dedup
        # shuffle
        stats["url_aligned_blocks"] = True

    if not straddled:
        def keep_links(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_null(t.column("__btag"))).drop_columns(["__btag"])

        return mixed.map_batches(keep_links, batch_format="pyarrow")

    # Rare path: at least one url's fused links came from a partial
    # context. Drop them and re-link exactly via the sort path, fed by
    # the boundary mention rows already in `mixed` (fragments of a url
    # are row-disjoint, so their union is the complete mention set).
    bad = pa.array(sorted(straddled), pa.string())

    def keep_good(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.is_null(t.column("__btag")),
            pc.invert(pc.is_in(t.column("url"), value_set=bad)),
        )
        return t.filter(mask).drop_columns(["__btag"])

    def boundary_mentions(t: pa.Table) -> pa.Table:
        from .ner import stable_url_hash

        mask = pc.and_(
            pc.is_valid(t.column("__btag")),
            pc.is_in(t.column("url"), value_set=bad),
        )
        t = t.filter(mask).select(["url", "mention_id", "surface", "surface_norm"])
        uh = pa.array([stable_url_hash(u) for u in t.column("url").to_pylist()],
                      pa.int64())
        return t.append_column("url_hash", uh)

    from .candidates import generate_candidates_packed

    good = mixed.map_batches(keep_good, batch_format="pyarrow")
    repair_mentions = mixed.map_batches(boundary_mentions, batch_format="pyarrow")
    repaired = link_documents_packed(
        generate_candidates_packed(repair_mentions, dico_ref, batch_size=8192),
        kb_ref, sameas_ref, rels=rels, measure=measure,
        prefered_uri_order=prefered_uri_order, num_buckets=16, shuffle="sort",
    )
    return good.union(repaired)


def make_edges_bucket_fn(kb_ref, sameas_ref, rels=None, pruned: bool = True):
    """Bucket fn emitting the (optionally pruned) fusion-graph edge list
    per url — the S11 debug dump / S13 predicate-frequency feed."""

    def edges_bucket(df: pd.DataFrame) -> pd.DataFrame:
        kb = get_broadcast(kb_ref)
        sameas = get_broadcast(sameas_ref)
        df = df.sort_values(["url", "mention_id", "cand_rank"], kind="stable")
        recs: list[dict] = []

        def flush(url: str, rows: list[dict]) -> None:
            counts: dict[int, int] = {}
            for r in rows:
                counts[r["mention_id"]] = counts.get(r["mention_id"], 0) + 1
            if all(v <= 1 for v in counts.values()):
                return  # M11 NoAmbiguity contexts build no graph
            edges, adj, cand_vertices, inverted = build_fusion_graph(rows, kb, sameas, rels)
            if pruned:
                prune_graph(edges, adj, cand_vertices, inverted)
            for (s, d), (p, w) in sorted(edges.items()):
                recs.append({"url": url, "src": s, "pred": p, "dst": d, "weight": w})

        cur_url, cur_rows = None, []
        for t in df.itertuples(index=False):
            if t.url != cur_url:
                if cur_rows:
                    flush(cur_url, cur_rows)
                cur_url, cur_rows = t.url, []
            cur_rows.append(
                {"url": t.url, "mention_id": t.mention_id, "surface": t.surface,
                 "surface_norm": t.surface_norm, "cand_rank": t.cand_rank,
                 "entity_id": t.entity_id, "uris": t.uris_str.split(" ")}
            )
        if cur_rows:
            flush(cur_url, cur_rows)
        return pd.DataFrame(recs, columns=["url", "src", "pred", "dst", "weight"])

    return edges_bucket


def fusion_edges(candidates_ds, kb_ref, sameas_ref, rels=None, pruned: bool = True,
                 num_buckets: int = DEFAULT_URL_BUCKETS):
    """candidates Dataset -> per-url fusion-graph edges Dataset."""
    fn = make_edges_bucket_fn(kb_ref, sameas_ref, rels, pruned)
    bucketed = candidates_ds.map_batches(
        add_bucket_arrow(num_buckets), batch_format="pyarrow"
    )
    return bucketed.groupby("__bucket").map_groups(fn, batch_format="pandas")
