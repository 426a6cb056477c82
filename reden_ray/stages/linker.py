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

import pandas as pd

from .. import SAMEAS_PRED
from ..functions.uri import decompose
from ..state.broadcast import get_broadcast


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
    """Degree = number of incident directed edges (in + out)."""
    deg: dict[str, float] = {}
    for src, dst in edges:
        deg[src] = deg.get(src, 0.0) + 1.0
        deg[dst] = deg.get(dst, 0.0) + 1.0
    return deg


def closeness_scores(adj) -> dict[str, float]:
    """Freeman closeness: 1 / sum of BFS distances to reachable vertices."""
    out: dict[str, float] = {}
    for s in adj:
        dist = {s: 0}
        frontier = [s]
        total = 0
        while frontier:
            nxt = []
            for v in frontier:
                for n in adj[v]:
                    if n not in dist:
                        dist[n] = dist[v] + 1
                        total += dist[n]
                        nxt.append(n)
            frontier = nxt
        out[s] = 1.0 / total if total else 0.0
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


_MEASURES = {
    "degree": lambda edges, adj: degree_scores(edges),
    "closeness": lambda edges, adj: closeness_scores(adj),
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
    """Link one context's mentions. Returns link dicts."""
    if not cand_rows:
        return []
    by_mention: dict[int, list[dict]] = {}
    for row in cand_rows:
        by_mention.setdefault(row["mention_id"], []).append(row)
    for rows in by_mention.values():
        rows.sort(key=lambda r: r["cand_rank"])

    # M11 eligibility: NoAmbiguity fast path (no mention has >1 candidate)
    if all(len(rows) <= 1 for rows in by_mention.values()):
        out = []
        for mid in sorted(by_mention):
            row = by_mention[mid][0]
            out.append(_emit(row, None, prefered_uri_order))
        return out

    edges, adj, cand_vertices, inverted = build_fusion_graph(cand_rows, kb, sameas, rels)
    prune_graph(edges, adj, cand_vertices, inverted)
    scores = _MEASURES[measure](edges, adj)

    out = []
    for mid in sorted(by_mention):
        rows = by_mention[mid]
        best_row, best_key = None, None
        for row in rows:
            vb = decompose(row["entity_id"])
            s = scores.get(vb, 0.0)
            key = (s, row["entity_id"])  # tie -> lexicographically largest URI
            if best_key is None or key > best_key:
                best_row, best_key = row, key
        out.append(_emit(best_row, best_key[0], prefered_uri_order))
    return out


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
    import pyarrow as pa

    return pa.table({
        "url": pa.array([r["url"] for r in out], pa.string()),
        "mention_id": pa.array([r["mention_id"] for r in out], pa.int64()),
        "surface": pa.array([r["surface"] for r in out], pa.string()),
        "surface_norm": pa.array([r["surface_norm"] for r in out], pa.string()),
        "uri": pa.array([r["uri"] for r in out], pa.string()),
        "all_uris": pa.array([r["all_uris"] for r in out], pa.list_(pa.string())),
        "score": pa.array([r["score"] for r in out], pa.float64()),
    })


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
_CTX_MEMO_PROBE = 20_000   # pages before the hit rate is judged
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


def link_documents_from_mentions(mentions_ds, dico_ref, kb_ref, sameas_ref,
                                 rels=None, measure: str = "degree",
                                 prefered_uri_order: str = "ALL",
                                 stats: dict | None = None):
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
    re-execution. ``stats`` (optional dict) receives
    ``{"straddled_urls": n, "boundary_pairs": n}``."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .candidates import MAX_CANDIDATES

    state_key = (dico_ref.hex(), kb_ref.hex(), sameas_ref.hex(), measure,
                 prefered_uri_order,
                 tuple(sorted(rels.items())) if rels else ())

    def link_batch(batch) -> "pa.Table":
        index = get_broadcast(dico_ref)
        kb = get_broadcast(kb_ref)
        sameas = get_broadcast(sameas_ref)
        memo = _ctx_memo(state_key)
        out: list[dict] = []

        urls = batch.column("url").to_pylist()
        mids = batch.column("mention_id").to_pylist()
        surfs = batch.column("surface").to_pylist()
        norms = batch.column("surface_norm").to_pylist()
        edge_urls = {urls[0], urls[-1]} if urls else set()
        btag = _next_btag()
        b_url, b_mid, b_surf, b_norm = [], [], [], []

        def link_page(url: str, s: int, e: int) -> None:
            """Link one page's contiguous mention rows [s, e)."""
            if url in edge_urls:
                b_url.extend([url] * (e - s))
                b_mid.extend(mids[s:e])
                b_surf.extend(surfs[s:e])
                b_norm.extend(norms[s:e])
            sig = None
            tpls = None
            if not memo.off:
                sig = (tuple(mids[s:e]), tuple(surfs[s:e]), tuple(norms[s:e]))
                tpls = memo.map.get(sig)
                if tpls is None:
                    memo.misses += 1
                else:
                    memo.hits += 1
            if tpls is None:
                cur_rows: list[dict] = []
                for i in range(s, e):
                    cands = index.get(norms[i])
                    if not cands:
                        continue
                    seen: set[tuple[str, ...]] = set()  # D1
                    rank = 0
                    for entity_id, uris, _ne in cands:
                        if uris in seen:
                            continue
                        seen.add(uris)
                        cur_rows.append(
                            {"url": url, "mention_id": mids[i],
                             "surface": surfs[i], "surface_norm": norms[i],
                             "cand_rank": rank, "entity_id": entity_id,
                             "uris": list(uris)})
                        rank += 1
                        if rank >= MAX_CANDIDATES:  # K2
                            break
                tpls = [
                    {k: v for k, v in d.items() if k != "url"}
                    for d in link_context(cur_rows, kb, sameas, rels, measure,
                                          prefered_uri_order)
                ]
                if sig is not None:
                    if len(memo.map) >= _CTX_MEMO_MAX_ENTRIES:
                        memo.map.pop(next(iter(memo.map)))
                    memo.map[sig] = tpls
                    memo.judge()
            for t in tpls:
                d = dict(t)
                d["url"] = url
                out.append(d)

        start = 0
        for i in range(1, len(urls) + 1):
            if i == len(urls) or urls[i] != urls[start]:
                link_page(urls[start], start, i)
                start = i
        t = _links_arrow(out)
        t = t.append_column("__btag", pa.nulls(t.num_rows, pa.int64()))
        if b_url:
            n = len(b_url)
            t = pa.concat_tables([t, pa.table({
                "url": pa.array(b_url, pa.string()),
                "mention_id": pa.array(b_mid, pa.int64()),
                "surface": pa.array(b_surf, pa.string()),
                "surface_norm": pa.array(b_norm, pa.string()),
                "uri": pa.nulls(n, pa.string()),
                "all_uris": pa.nulls(n, pa.list_(pa.string())),
                "score": pa.nulls(n, pa.float64()),
                "__btag": pa.array([btag] * n, pa.int64()),
            })])
        return t

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
