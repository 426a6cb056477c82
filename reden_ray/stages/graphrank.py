"""Distributed PageRank over an edge Dataset (iterative graph rank).

The reference ranks candidate URIs by centrality over per-context
fusion graphs (CentralityHandler.java via stages/linker.py A3); this
module is the corpus-LEVEL counterpart a web-scale KG pipeline needs:
rank the HOST graph (who links to whom across the crawl) to weight
sources during canonicalization / quality filtering. PageRank is an
*iterative* primitive none of the groupby/join/window operators cover
— each round propagates mass along edges — so it gets the same
treatment as connected components (stages/cc.py):

* Below ``local_solve_max_edges`` the solve runs as ONE vectorized
  numpy task (factorize endpoints, ``np.bincount`` propagation): a
  distributed round costs two hash-bucket exchanges of fixed overhead
  that dwarf the work on small graphs. Host graphs are |hosts|^2-ish
  — usually millions of rows even for trillion-page crawls — so this
  is the common path.
* Above the gate, each iteration runs as two bucketed exchanges of
  pre-reduced rows (the CC pattern, stages/cc.py:199-230): ranks and
  normalized edges co-locate on hash(src) so every node's out-edges
  and rank meet in one bucket (contribution join + per-bucket partial
  sums), then contributions and the node list co-locate on hash(dst)
  to finalize ``r' = (1-a)/N + a*(contrib + dangling/N)``. Nothing
  node- or edge-shaped ever sits on the driver; only the scalar
  dangling mass does.

Semantics (both paths, bit-for-bit the same formula):
  nodes    = distinct endpoints of the edge list
  p(s->d)  = w(s->d) / sum_d' w(s->d')      (weight-normalized)
  r_0      = 1/N
  r_{i+1}(d) = (1-alpha)/N + alpha * (sum_s r_i(s) p(s->d)
                                      + dangling_i / N)
  dangling_i = sum of r_i over nodes with no out-edges
Self-loops and duplicate (src, dst) rows are legal (weights add).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..functions.bucket import add_bucket

# encoded row kinds flowing through the union exchanges
_K_RANK = 0   # (key=node, val=rank)
_K_EDGE = 1   # (key=src, dst=dst, val=normalized weight)
_K_CONTRIB = 2  # (key=dst, val=partial contribution)
_K_NODE = 3   # (key=node, val=0) — finalize coalesce side
_K_DANGLING = 4  # (key='', val=partial dangling rank mass)

_ENC_SCHEMA = pa.schema({
    "key": pa.string(), "dst": pa.string(),
    "val": pa.float64(), "kind": pa.int8(),
})


def _enc(key, dst, val, kind: int) -> pa.Table:
    n = len(key)
    return pa.table({
        "key": pa.array(key, pa.string()),
        "dst": pa.array(dst, pa.string()) if dst is not None
        else pa.nulls(n, pa.string()),
        "val": pa.array(np.asarray(val, dtype=np.float64), pa.float64()),
        "kind": pa.array(np.full(n, kind, dtype=np.int8), pa.int8()),
    })


def _rank_solve_local(src: np.ndarray, dst: np.ndarray, w: np.ndarray,
                      n_iters: int, alpha: float) -> pd.DataFrame:
    """Vectorized single-heap solve. ``src``/``dst`` are object arrays
    of node keys; factorization order is np.unique (sorted) so the
    result is deterministic regardless of input row order."""
    nodes, codes = np.unique(np.concatenate([src, dst]), return_inverse=True)
    s = codes[: len(src)]
    d = codes[len(src):]
    n = len(nodes)
    out_w = np.bincount(s, weights=w, minlength=n)
    p = w / out_w[s]
    r = np.full(n, 1.0 / n)
    no_out = out_w == 0.0
    for _ in range(n_iters):
        contrib = np.bincount(d, weights=r[s] * p, minlength=n)
        dangling = float(r[no_out].sum())
        r = (1.0 - alpha) / n + alpha * (contrib + dangling / n)
    return pd.DataFrame({"node": nodes, "rank": r})


def pagerank(
    edges_ds,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    n_iters: int = 4,
    alpha: float = 0.85,
    num_buckets: int = 64,
    local_solve_max_edges: int = 4_000_000,
):
    """Edge Dataset -> ``(node, rank)`` Dataset, one row per distinct
    endpoint. See module docstring for the formula and the size gate."""

    def enc_edges(t: pa.Table) -> pa.Table:
        return _enc(
            t.column(src_col).cast(pa.string()).to_pylist(),
            t.column(dst_col).cast(pa.string()).to_pylist(),
            t.column(weight_col).cast(pa.float64()).to_numpy(zero_copy_only=False),
            _K_EDGE,
        )

    # The edge set is reused every round: coalesce tiny upstream blocks
    # and materialize the encoded form once (the CC idiom, cc.py:115-120).
    edges = (
        edges_ds.map_batches(enc_edges, batch_format="pyarrow")
        .repartition(8)
        .materialize()
    )
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "rank": pa.array([], pa.float64()),
        }))

    if n_edges <= local_solve_max_edges:
        def solve(t: pa.Table) -> pa.Table:
            df = _rank_solve_local(
                np.asarray(t.column("key").to_pylist(), dtype=object),
                np.asarray(t.column("dst").to_pylist(), dtype=object),
                t.column("val").to_numpy(zero_copy_only=False),
                n_iters, alpha)
            return pa.Table.from_pandas(df, preserve_index=False)

        return edges.repartition(1).map_batches(
            solve, batch_size=None, batch_format="pyarrow")

    # ---- distributed path ------------------------------------------------
    num_buckets = max(4, min(num_buckets, n_edges // 25_000 + 4))

    # One-time: normalize weights per src (all of a src's edges share a
    # bucket, so the normalization is a bucket-local groupby-transform).
    def normalize_bucket(df: pd.DataFrame) -> pa.Table:
        tot = df.groupby("key")["val"].transform("sum")
        t = _enc(df["key"].to_numpy(dtype=object), None,
                 df["val"].to_numpy() / tot.to_numpy(), _K_EDGE)
        return t.set_column(1, "dst",
                            pa.array(df["dst"].to_numpy(dtype=object),
                                     pa.string()))

    edges_norm = (
        edges.map_batches(lambda t: add_bucket(t, "key", num_buckets),
                          batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda df: normalize_bucket(df.drop(columns="__bucket")),
                    batch_format="pandas")
        .materialize()
    )

    # Node universe + N, once. (Distinct over both endpoints: a bucketed
    # per-bucket dedup of pre-deduped per-batch partials.)
    def node_partials(t: pa.Table) -> pa.Table:
        ks = np.unique(np.concatenate([
            np.asarray(t.column("key").to_pylist(), dtype=object),
            np.asarray(t.column("dst").to_pylist(), dtype=object)]))
        return _enc(ks, None, np.zeros(len(ks)), _K_NODE)

    def dedup_bucket(df: pd.DataFrame) -> pa.Table:
        u = df.drop_duplicates("key")
        return _enc(u["key"].to_numpy(dtype=object), None,
                    np.zeros(len(u)), _K_NODE)

    nodes = (
        edges.map_batches(node_partials, batch_format="pyarrow")
        .map_batches(lambda t: add_bucket(t, "key", num_buckets),
                     batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda df: dedup_bucket(df.drop(columns="__bucket")),
                    batch_format="pandas")
        .materialize()
    )
    n_nodes = nodes.count()

    def init_rank(t: pa.Table) -> pa.Table:
        return _enc(t.column("key").to_pylist(), None,
                    np.full(t.num_rows, 1.0 / n_nodes), _K_RANK)

    ranks = nodes.map_batches(init_rank, batch_format="pyarrow")

    def contrib_bucket(df: pd.DataFrame) -> pa.Table:
        """Ranks + edges co-located on hash(src): join, emit per-bucket
        partial contribution sums by dst, plus the bucket's dangling
        rank mass (a node's rank and ALL its out-edges share a bucket,
        so 'no edge rows for this key' == dangling)."""
        r = df[df["kind"] == _K_RANK]
        e = df[df["kind"] == _K_EDGE]
        rmap = pd.Series(r["val"].to_numpy(), index=r["key"])
        parts = []
        if len(e):
            rv = rmap.reindex(e["key"]).to_numpy()
            c = pd.DataFrame({"key": e["dst"].to_numpy(),
                              "val": rv * e["val"].to_numpy()})
            c = c.groupby("key", as_index=False)["val"].sum()
            parts.append(_enc(c["key"].to_numpy(dtype=object), None,
                              c["val"].to_numpy(), _K_CONTRIB))
        dangling = float(rmap[~rmap.index.isin(e["key"])].sum())
        parts.append(_enc([""], None, [dangling], _K_DANGLING))
        return pa.concat_tables(parts)

    def finalize_bucket(dangling: float):
        def fin(df: pd.DataFrame) -> pa.Table:
            n = df[df["kind"] == _K_NODE]
            c = df[df["kind"] == _K_CONTRIB]
            csum = c.groupby("key")["val"].sum()
            cv = csum.reindex(n["key"]).fillna(0.0).to_numpy()
            r = (1.0 - alpha) / n_nodes + alpha * (cv + dangling / n_nodes)
            return _enc(n["key"].to_numpy(dtype=object), None, r, _K_RANK)
        return fin

    def only_kind(kind: int):
        def f(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return t.filter(pc.equal(t["kind"], pa.scalar(kind, pa.int8())))
        return f

    for _ in range(n_iters):
        contrib = (
            ranks.union(edges_norm)
            .map_batches(lambda t: add_bucket(t, "key", num_buckets),
                         batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(lambda df: contrib_bucket(df.drop(columns="__bucket")),
                        batch_format="pandas")
            .materialize()
        )
        # scalar only — the one thing the driver holds per round
        dangling = contrib.map_batches(
            only_kind(_K_DANGLING), batch_format="pyarrow").sum("val") or 0.0
        ranks = (
            nodes.union(contrib.map_batches(only_kind(_K_CONTRIB),
                                            batch_format="pyarrow"))
            .map_batches(lambda t: add_bucket(t, "key", num_buckets),
                         batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(lambda df, _d=dangling: finalize_bucket(_d)(
                df.drop(columns="__bucket")), batch_format="pandas")
            .materialize()
        )

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["key"].to_numpy(),
                             "rank": df["val"].to_numpy()})

    return ranks.map_batches(emit, batch_format="pandas")


# ---------------------------------------------------------------------------
# Multi-source BFS hop distance (TrustRank-style seed propagation)
# ---------------------------------------------------------------------------

def _dist_solve_local(src: np.ndarray, dst: np.ndarray, seeds: set,
                      max_rounds: int) -> pd.DataFrame:
    """Vectorized single-heap BFS: repeated scatter-min over the edge
    list. Deterministic (integer distances, min is order-free)."""
    nodes, codes = np.unique(np.concatenate([src, dst]), return_inverse=True)
    s = codes[: len(src)]
    d = codes[len(src):]
    n = len(nodes)
    big = np.iinfo(np.int64).max
    dist = np.full(n, big, dtype=np.int64)
    seed_mask = np.isin(nodes, np.asarray(sorted(seeds), dtype=object))
    dist[seed_mask] = 0
    for _ in range(max_rounds):
        reach = dist[s] != big
        if not reach.any():
            break
        cand = dist[s[reach]] + 1
        before = dist.copy()
        np.minimum.at(dist, d[reach], cand)
        if (dist == before).all():
            break
    keep = dist != big
    return pd.DataFrame({"node": nodes[keep], "dist": dist[keep]})


def seed_distance(
    edges_ds,
    seeds: list,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 8,
    num_buckets: int = 64,
    local_solve_max_edges: int = 4_000_000,
):
    """Edge Dataset + seed node list -> ``(node, dist)`` Dataset: the
    minimum hop count from ANY seed, bounded by ``max_rounds`` (nodes
    beyond the horizon, or unreachable, are omitted). This is the
    TrustRank / spam-distance primitive: distance from a hand-curated
    trusted seed set is a per-host quality prior, and the bounded
    horizon is what production systems use anyway (trust decays to
    noise past a few hops).

    Shape: the frontier iteration is min-label propagation with a +1
    increment — exactly the connected-components exchange pattern
    (stages/cc.py:199-230), so it reuses the same size gate:

    * below ``local_solve_max_edges``: ONE numpy task (scatter-min
      rounds over factorized endpoints) — a distributed round is two
      bucketed exchanges of fixed overhead, which dwarfs the work on
      vocabulary-sized host graphs (even a trillion-page crawl has
      ~1e8 hosts);
    * above: per round, dist rows and edges co-locate on hash(src)
      (one bucketed exchange) to emit per-bucket pre-reduced
      ``(dst, dist+1)`` candidate partials, then candidates and
      current dists co-locate on hash(node) to take the min. Rows are
      (string, int64) pairs — nothing wide moves, nothing node-shaped
      sits on the driver. Early exit when a round changes nothing
      (cheap count aggregate of an ``updated`` flag column).

    The seed list is driver-held and broadcast in-closure: TrustRank
    seed sets are small by construction (hand-audited). For a
    Dataset-sized seed set, union it in as kind-tagged rows instead.
    """
    seeds = set(seeds)
    if not seeds:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "dist": pa.array([], pa.int64()),
        }))

    def enc_edges(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "key": t.column(src_col).cast(pa.string()),
            "dst": t.column(dst_col).cast(pa.string()),
            "val": pa.nulls(n, pa.int64()),
            "kind": pa.array(np.full(n, 1, dtype=np.int8), pa.int8()),
        })

    edges = (
        edges_ds.map_batches(enc_edges, batch_format="pyarrow")
        .repartition(8)
        .materialize()
    )
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "dist": pa.array([], pa.int64()),
        }))

    if n_edges <= local_solve_max_edges:
        def solve(t: pa.Table) -> pa.Table:
            df = _dist_solve_local(
                np.asarray(t.column("key").to_pylist(), dtype=object),
                np.asarray(t.column("dst").to_pylist(), dtype=object),
                seeds, max_rounds)
            # explicit types: an all-empty result must keep its schema
            return pa.table({
                "node": pa.array(df["node"].to_numpy(dtype=object),
                                 pa.string()),
                "dist": pa.array(df["dist"].to_numpy(), pa.int64()),
            })

        return edges.repartition(1).map_batches(
            solve, batch_size=None, batch_format="pyarrow")

    # ---- distributed path (the cc.py exchange pair, min-plus) -----------
    num_buckets = max(4, min(num_buckets, n_edges // 25_000 + 4))

    def node_seed_rows(t: pa.Table) -> pa.Table:
        ks = np.unique(np.concatenate([
            np.asarray(t.column("key").to_pylist(), dtype=object),
            np.asarray(t.column("dst").to_pylist(), dtype=object)]))
        in_seed = np.isin(ks, np.asarray(sorted(seeds), dtype=object))
        ks = ks[in_seed]
        return pa.table({
            "key": pa.array(ks, pa.string()),
            "dst": pa.nulls(len(ks), pa.string()),
            "val": pa.array(np.zeros(len(ks), dtype=np.int64), pa.int64()),
            "kind": pa.array(np.zeros(len(ks), dtype=np.int8), pa.int8()),
        })

    def dedup_min(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("key", as_index=False)["val"].min()
        return pa.table({
            "key": pa.array(g["key"].to_numpy(dtype=object), pa.string()),
            "dst": pa.nulls(len(g), pa.string()),
            "val": pa.array(g["val"].to_numpy(), pa.int64()),
            "kind": pa.array(np.zeros(len(g), dtype=np.int8), pa.int8()),
        })

    dists = (
        edges.map_batches(node_seed_rows, batch_format="pyarrow")
        .map_batches(lambda t: add_bucket(t, "key", num_buckets),
                     batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda df: dedup_min(df.drop(columns="__bucket")),
                    batch_format="pandas")
        .materialize()
    )

    def relax_bucket(df: pd.DataFrame) -> pa.Table:
        """dists + edges on hash(src): emit pre-reduced (dst, d+1)."""
        dd = df[df["kind"] == 0]
        ee = df[df["kind"] == 1]
        if not len(dd) or not len(ee):
            return pa.table({
                "key": pa.array([], pa.string()),
                "dst": pa.nulls(0, pa.string()),
                "val": pa.array([], pa.int64()),
                "kind": pa.array([], pa.int8()),
            })
        dmap = pd.Series(dd["val"].to_numpy(), index=dd["key"])
        dv = dmap.reindex(ee["key"]).to_numpy()
        m = pd.notna(dv)
        c = pd.DataFrame({"key": ee["dst"].to_numpy()[m],
                          "val": dv[m].astype(np.int64) + 1})
        c = c.groupby("key", as_index=False)["val"].min()
        # kind 3 = CANDIDATE: min_merge must distinguish these from
        # existing dist rows (kind 0) or its updated-count early exit
        # would see every new node as already known and stop the BFS
        # after one hop
        return pa.table({
            "key": pa.array(c["key"].to_numpy(dtype=object), pa.string()),
            "dst": pa.nulls(len(c), pa.string()),
            "val": pa.array(c["val"].to_numpy(), pa.int64()),
            "kind": pa.array(np.full(len(c), 3, dtype=np.int8), pa.int8()),
        })

    def min_merge(df: pd.DataFrame) -> pa.Table:
        """old dists (kind 0) + candidates: min per node; mark updates
        in kind (2 = value changed or node is new) for the early-exit
        count — the driver reads ONE integer per round."""
        old = df[df["kind"] == 0].drop_duplicates("key")
        omap = pd.Series(old["val"].to_numpy(), index=old["key"])
        g = df.groupby("key", as_index=False)["val"].min()
        ov = omap.reindex(g["key"]).to_numpy()
        upd = pd.isna(ov) | (g["val"].to_numpy() < np.nan_to_num(
            ov, nan=np.iinfo(np.int64).max))
        return pa.table({
            "key": pa.array(g["key"].to_numpy(dtype=object), pa.string()),
            "dst": pa.nulls(len(g), pa.string()),
            "val": pa.array(g["val"].to_numpy(), pa.int64()),
            "kind": pa.array(np.where(upd, 2, 0).astype(np.int8), pa.int8()),
        })

    def clear_flag(t: pa.Table) -> pa.Table:
        return t.set_column(
            3, "kind", pa.array(np.zeros(t.num_rows, dtype=np.int8),
                                pa.int8()))

    for _ in range(max_rounds):
        cand = (
            dists.union(edges)
            .map_batches(lambda t: add_bucket(t, "key", num_buckets),
                         batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(lambda df: relax_bucket(df.drop(columns="__bucket")),
                        batch_format="pandas")
        )
        merged = (
            dists.union(cand)
            .map_batches(lambda t: add_bucket(t, "key", num_buckets),
                         batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(lambda df: min_merge(df.drop(columns="__bucket")),
                        batch_format="pandas")
            .materialize()
        )
        n_upd = merged.map_batches(
            lambda t: pa.table({"u": pa.array(
                [int(pc.sum(pc.cast(pc.equal(t["kind"],
                 pa.scalar(2, pa.int8())), pa.int64())).as_py() or 0)],
                pa.int64())}), batch_format="pyarrow").sum("u") or 0
        dists = merged.map_batches(clear_flag, batch_format="pyarrow")
        if n_upd == 0:
            break

    def emit(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["key"], "dist": t["val"]})

    return dists.map_batches(emit, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Synchronous label propagation (community detection)
# ---------------------------------------------------------------------------

def _lpa_solve_local(src: np.ndarray, dst: np.ndarray,
                     n_rounds: int) -> pd.DataFrame:
    """Vectorized single-heap synchronous LPA. Deterministic: labels
    start as the node keys themselves, each round every node adopts
    the most frequent label among its (undirected, deduped) neighbors
    with ties broken toward the LEXICOGRAPHICALLY smallest label;
    isolated nodes keep their label. np.unique's sort order equals
    binary-collation string order, so index comparisons below are
    exactly the SQL ``ORDER BY label`` tie-break."""
    nodes, codes = np.unique(np.concatenate([src, dst]), return_inverse=True)
    s = codes[: len(src)]
    d = codes[len(src):]
    n = len(nodes)
    # symmetrize + dedup undirected edges (self-loops contribute once)
    und = np.unique(np.stack([np.concatenate([s, d]),
                              np.concatenate([d, s])], axis=1), axis=0)
    eu, ev = und[:, 0], und[:, 1]
    lab = np.arange(n, dtype=np.int64)
    for _ in range(n_rounds):
        # tally neighbor labels: count[(v, lab[u])] over edges u->v
        cells = ev * n + lab[eu]
        uniq_cells, c = np.unique(cells, return_counts=True)
        v = uniq_cells // n
        l = uniq_cells % n
        # per v: argmax count, tie -> min label index
        ordr = np.lexsort((l, -c, v))
        v_o = v[ordr]
        first = np.ones(len(v_o), dtype=bool)
        first[1:] = v_o[1:] != v_o[:-1]
        new = lab.copy()
        new[v_o[first]] = l[ordr][first]
        lab = new
    return pd.DataFrame({"node": nodes, "label": nodes[lab]})


def label_propagation(
    edges_ds,
    src_col: str = "src",
    dst_col: str = "dst",
    n_rounds: int = 4,
    num_buckets: int = 64,
    local_solve_max_edges: int = 4_000_000,
):
    """Edge Dataset -> ``(node, label)`` community assignment after
    ``n_rounds`` of synchronous label propagation (Raghavan et al.
    2007, public literature). A third iterative-graph primitive next
    to PageRank (weighted mass flow) and seed_distance (min-plus):
    the per-round reduce is a frequency ARGMAX over neighbor labels.

    Fixed synchronous rounds — not run-to-convergence — because
    synchronous LPA can oscillate on bipartite structures; a bounded
    round count is what keeps the operator deterministic AND gives the
    SQL oracle a finite unroll. Distributed shape: identical exchange
    pair to seed_distance (labels+edges co-locate on hash(src) to emit
    per-bucket (dst, label, count) partials — a head node's tally rows
    are pre-reduced per bucket — then partials+labels co-locate on
    hash(node) for the global argmax merge; isolated nodes keep their
    label via the kind-0 coalesce row).
    """
    def enc_edges(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "key": t.column(src_col).cast(pa.string()),
            "dst": t.column(dst_col).cast(pa.string()),
            "val": pa.nulls(n, pa.string()),
            "kind": pa.array(np.full(n, 1, dtype=np.int8), pa.int8()),
        })

    edges = (
        edges_ds.map_batches(enc_edges, batch_format="pyarrow")
        .repartition(8)
        .materialize()
    )
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "label": pa.array([], pa.string()),
        }))

    if n_edges <= local_solve_max_edges:
        def solve(t: pa.Table) -> pa.Table:
            df = _lpa_solve_local(
                np.asarray(t.column("key").to_pylist(), dtype=object),
                np.asarray(t.column("dst").to_pylist(), dtype=object),
                n_rounds)
            return pa.table({
                "node": pa.array(df["node"].to_numpy(dtype=object),
                                 pa.string()),
                "label": pa.array(df["label"].to_numpy(dtype=object),
                                  pa.string()),
            })

        return edges.repartition(1).map_batches(
            solve, batch_size=None, batch_format="pyarrow")

    # ---- distributed path ----------------------------------------------
    num_buckets = max(4, min(num_buckets, n_edges // 25_000 + 4))

    # undirected dedup: route both directions through the unordered
    # pair bucket once, dedup in-bucket (the reciprocity idiom)
    def sym(t: pa.Table) -> pa.Table:
        k = t.column("key").to_pylist()
        d = t.column("dst").to_pylist()
        ks = k + d
        ds_ = d + k
        pk = [min(a, b) + "\x1f" + max(a, b) for a, b in zip(ks, ds_)]
        return pa.table({
            "key": pa.array(ks, pa.string()),
            "dst": pa.array(ds_, pa.string()),
            "pk": pa.array(pk, pa.string()),
        })

    def dedup_pairs(df: pd.DataFrame) -> pa.Table:
        u = df.drop_duplicates(["key", "dst"])
        n = len(u)
        return pa.table({
            "key": pa.array(u["key"].to_numpy(dtype=object), pa.string()),
            "dst": pa.array(u["dst"].to_numpy(dtype=object), pa.string()),
            "val": pa.nulls(n, pa.string()),
            "cnt": pa.array(np.zeros(n, dtype=np.int64), pa.int64()),
            "kind": pa.array(np.full(n, 1, dtype=np.int8), pa.int8()),
        })

    und = (
        edges.map_batches(sym, batch_format="pyarrow")
        .map_batches(lambda t: add_bucket(t, "pk", num_buckets),
                     batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda df: dedup_pairs(
            df.drop(columns=["__bucket", "pk"])), batch_format="pandas")
        .materialize()
    )

    def node_rows(t: pa.Table) -> pa.Table:
        ks = np.unique(np.asarray(t.column("key").to_pylist(), dtype=object))
        n = len(ks)
        return pa.table({
            "key": pa.array(ks, pa.string()),
            "dst": pa.nulls(n, pa.string()),
            "val": pa.array(ks, pa.string()),   # initial label = own key
            "cnt": pa.array(np.zeros(n, dtype=np.int64), pa.int64()),
            "kind": pa.array(np.zeros(n, dtype=np.int8), pa.int8()),
        })

    def dedup_nodes(df: pd.DataFrame) -> pa.Table:
        u = df.drop_duplicates("key")
        n = len(u)
        return pa.table({
            "key": pa.array(u["key"].to_numpy(dtype=object), pa.string()),
            "dst": pa.nulls(n, pa.string()),
            "val": pa.array(u["val"].to_numpy(dtype=object), pa.string()),
            "cnt": pa.array(np.zeros(n, dtype=np.int64), pa.int64()),
            "kind": pa.array(np.zeros(n, dtype=np.int8), pa.int8()),
        })

    labels = (
        und.map_batches(node_rows, batch_format="pyarrow")
        .map_batches(lambda t: add_bucket(t, "key", num_buckets),
                     batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda df: dedup_nodes(df.drop(columns="__bucket")),
                    batch_format="pandas")
        .materialize()
    )

    def tally_bucket(df: pd.DataFrame) -> pa.Table:
        """labels + und edges on hash(src): per-bucket pre-reduced
        (dst, label, count) partials (kind 2)."""
        lb = df[df["kind"] == 0]
        ee = df[df["kind"] == 1]
        if not len(lb) or not len(ee):
            return pa.table({
                "key": pa.array([], pa.string()),
                "dst": pa.nulls(0, pa.string()),
                "val": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
                "kind": pa.array([], pa.int8()),
            })
        lmap = pd.Series(lb["val"].to_numpy(), index=lb["key"])
        lv = lmap.reindex(ee["key"]).to_numpy()
        g = pd.DataFrame({"key": ee["dst"].to_numpy(), "val": lv})
        g = g.groupby(["key", "val"], as_index=False).size()
        n = len(g)
        return pa.table({
            "key": pa.array(g["key"].to_numpy(dtype=object), pa.string()),
            "dst": pa.nulls(n, pa.string()),
            "val": pa.array(g["val"].to_numpy(dtype=object), pa.string()),
            "cnt": pa.array(g["size"].to_numpy(), pa.int64()),
            "kind": pa.array(np.full(n, 2, dtype=np.int8), pa.int8()),
        })

    def argmax_merge(df: pd.DataFrame) -> pa.Table:
        old = df[df["kind"] == 0]
        tal = df[df["kind"] == 2]
        new = old[["key", "val"]].copy()
        if len(tal):
            g = (tal.groupby(["key", "val"], as_index=False)["cnt"].sum()
                 .sort_values(["key", "cnt", "val"],
                              ascending=[True, False, True],
                              kind="stable")
                 .drop_duplicates("key"))
            pick = pd.Series(g["val"].to_numpy(), index=g["key"])
            got = pick.reindex(new["key"]).to_numpy()
            keep_old = pd.isna(got)
            new["val"] = np.where(keep_old, new["val"].to_numpy(), got)
        n = len(new)
        return pa.table({
            "key": pa.array(new["key"].to_numpy(dtype=object), pa.string()),
            "dst": pa.nulls(n, pa.string()),
            "val": pa.array(new["val"].to_numpy(dtype=object), pa.string()),
            "cnt": pa.array(np.zeros(n, dtype=np.int64), pa.int64()),
            "kind": pa.array(np.zeros(n, dtype=np.int8), pa.int8()),
        })

    for _ in range(n_rounds):
        tally = (
            labels.union(und)
            .map_batches(lambda t: add_bucket(t, "key", num_buckets),
                         batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(lambda df: tally_bucket(df.drop(columns="__bucket")),
                        batch_format="pandas")
        )
        labels = (
            labels.union(tally)
            .map_batches(lambda t: add_bucket(t, "key", num_buckets),
                         batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(lambda df: argmax_merge(df.drop(columns="__bucket")),
                        batch_format="pandas")
            .materialize()
        )

    def emit(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["key"], "label": t["val"]})

    return labels.map_batches(emit, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# TrustRank (personalized PageRank with a seed restart vector)
# ---------------------------------------------------------------------------

def _trust_solve_local(src: np.ndarray, dst: np.ndarray, w: np.ndarray,
                       seeds: set, n_iters: int,
                       alpha: float) -> pd.DataFrame:
    """Single-heap solve of the seeded power iteration. Identical
    structure to _rank_solve_local with the uniform vector 1/N
    replaced by the seed restart vector e (uniform over seeds∩nodes,
    0 elsewhere); dangling mass redistributes to the seeds — the
    standard TrustRank choice (Gyongyi et al. 2004, public
    literature)."""
    nodes, codes = np.unique(np.concatenate([src, dst]), return_inverse=True)
    s = codes[: len(src)]
    d = codes[len(src):]
    n = len(nodes)
    seed_mask = np.isin(nodes, np.asarray(sorted(seeds), dtype=object))
    k = int(seed_mask.sum())
    if k == 0:
        return pd.DataFrame({"node": nodes[:0], "trust": np.zeros(0)})
    e = np.where(seed_mask, 1.0 / k, 0.0)
    out_w = np.bincount(s, weights=w, minlength=n)
    p = w / out_w[s]
    r = e.copy()
    no_out = out_w == 0.0
    for _ in range(n_iters):
        contrib = np.bincount(d, weights=r[s] * p, minlength=n)
        dangling = float(r[no_out].sum())
        r = (1.0 - alpha) * e + alpha * (contrib + dangling * e)
    return pd.DataFrame({"node": nodes, "trust": r})


def trustrank(
    edges_ds,
    seeds: list,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    n_iters: int = 4,
    alpha: float = 0.85,
    num_buckets: int = 64,
    local_solve_max_edges: int = 4_000_000,
):
    """Edge Dataset + trusted seed list -> ``(node, trust)`` Dataset.
    The biased-restart complement of ``seed_distance``: where BFS gives
    a hop HORIZON from the seeds, TrustRank gives a damped MASS that
    decays along every path and splits across out-degree — the
    canonical web-spam prior. Deliberately a SEPARATE implementation
    from ``pagerank`` even though only the restart vector differs:
    sharing the loop would change the uniform path's float evaluation
    order ((1-a)/n vs (1-a)*e) and ulp-level drift is exactly what the
    e6-rounded oracle hash is sensitive to.

    Same dual shape as the other iterative primitives: one numpy task
    below the edge gate; above it, per round, the contribution join on
    hash(src) then the finalize merge on hash(node) (node rows CARRY
    their restart weight e in ``val`` so the finalize needs no second
    broadcast), with only the scalar dangling mass on the driver.
    """
    seeds = set(seeds)
    empty = rd.from_arrow(pa.table({
        "node": pa.array([], pa.string()),
        "trust": pa.array([], pa.float64()),
    }))
    if not seeds:
        return empty

    def enc_edges(t: pa.Table) -> pa.Table:
        return _enc(
            t.column(src_col).cast(pa.string()).to_pylist(),
            t.column(dst_col).cast(pa.string()).to_pylist(),
            t.column(weight_col).cast(pa.float64()).to_numpy(
                zero_copy_only=False),
            _K_EDGE,
        )

    edges = (
        edges_ds.map_batches(enc_edges, batch_format="pyarrow")
        .repartition(8)
        .materialize()
    )
    n_edges = edges.count()
    if n_edges == 0:
        return empty

    if n_edges <= local_solve_max_edges:
        def solve(t: pa.Table) -> pa.Table:
            df = _trust_solve_local(
                np.asarray(t.column("key").to_pylist(), dtype=object),
                np.asarray(t.column("dst").to_pylist(), dtype=object),
                t.column("val").to_numpy(zero_copy_only=False),
                seeds, n_iters, alpha)
            return pa.table({
                "node": pa.array(df["node"].to_numpy(dtype=object),
                                 pa.string()),
                "trust": pa.array(df["trust"].to_numpy(), pa.float64()),
            })

        return edges.repartition(1).map_batches(
            solve, batch_size=None, batch_format="pyarrow")

    # ---- distributed path ----------------------------------------------
    num_buckets = max(4, min(num_buckets, n_edges // 25_000 + 4))

    def normalize_bucket(df: pd.DataFrame) -> pa.Table:
        tot = df.groupby("key")["val"].transform("sum")
        t = _enc(df["key"].to_numpy(dtype=object), None,
                 df["val"].to_numpy() / tot.to_numpy(), _K_EDGE)
        return t.set_column(1, "dst",
                            pa.array(df["dst"].to_numpy(dtype=object),
                                     pa.string()))

    edges_norm = (
        edges.map_batches(lambda t: add_bucket(t, "key", num_buckets),
                          batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda df: normalize_bucket(df.drop(columns="__bucket")),
                    batch_format="pandas")
        .materialize()
    )

    def node_partials(t: pa.Table) -> pa.Table:
        ks = np.unique(np.concatenate([
            np.asarray(t.column("key").to_pylist(), dtype=object),
            np.asarray(t.column("dst").to_pylist(), dtype=object)]))
        ind = np.isin(ks, np.asarray(sorted(seeds), dtype=object))
        return _enc(ks, None, ind.astype(np.float64), _K_NODE)

    def dedup_bucket(df: pd.DataFrame) -> pa.Table:
        u = df.drop_duplicates("key")
        return _enc(u["key"].to_numpy(dtype=object), None,
                    u["val"].to_numpy(), _K_NODE)

    nodes_ind = (
        edges.map_batches(node_partials, batch_format="pyarrow")
        .map_batches(lambda t: add_bucket(t, "key", num_buckets),
                     batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda df: dedup_bucket(df.drop(columns="__bucket")),
                    batch_format="pandas")
        .materialize()
    )
    n_seeds = int(round(nodes_ind.sum("val") or 0.0))
    if n_seeds == 0:
        return empty

    def to_e(t: pa.Table) -> pa.Table:
        v = t.column("val").to_numpy(zero_copy_only=False)
        return t.set_column(2, "val",
                            pa.array(np.where(v > 0.0, 1.0 / n_seeds, 0.0),
                                     pa.float64()))

    # node rows whose val IS the restart weight e(v)
    nodes = nodes_ind.map_batches(to_e, batch_format="pyarrow").materialize()

    def init_rank(t: pa.Table) -> pa.Table:
        return _enc(t.column("key").to_pylist(), None,
                    t.column("val").to_numpy(zero_copy_only=False), _K_RANK)

    ranks = nodes.map_batches(init_rank, batch_format="pyarrow")

    def contrib_bucket(df: pd.DataFrame) -> pa.Table:
        r = df[df["kind"] == _K_RANK]
        e = df[df["kind"] == _K_EDGE]
        rmap = pd.Series(r["val"].to_numpy(), index=r["key"])
        parts = []
        if len(e):
            rv = rmap.reindex(e["key"]).to_numpy()
            c = pd.DataFrame({"key": e["dst"].to_numpy(),
                              "val": rv * e["val"].to_numpy()})
            c = c.groupby("key", as_index=False)["val"].sum()
            parts.append(_enc(c["key"].to_numpy(dtype=object), None,
                              c["val"].to_numpy(), _K_CONTRIB))
        dangling = float(rmap[~rmap.index.isin(e["key"])].sum())
        parts.append(_enc([""], None, [dangling], _K_DANGLING))
        return pa.concat_tables(parts)

    def finalize_bucket(dangling: float):
        def fin(df: pd.DataFrame) -> pa.Table:
            n = df[df["kind"] == _K_NODE]
            c = df[df["kind"] == _K_CONTRIB]
            csum = c.groupby("key")["val"].sum()
            cv = csum.reindex(n["key"]).fillna(0.0).to_numpy()
            ev = n["val"].to_numpy()
            r = (1.0 - alpha) * ev + alpha * (cv + dangling * ev)
            return _enc(n["key"].to_numpy(dtype=object), None, r, _K_RANK)
        return fin

    def only_kind(kind: int):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["kind"], pa.scalar(kind, pa.int8())))
        return f

    for _ in range(n_iters):
        contrib = (
            ranks.union(edges_norm)
            .map_batches(lambda t: add_bucket(t, "key", num_buckets),
                         batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(lambda df: contrib_bucket(df.drop(columns="__bucket")),
                        batch_format="pandas")
            .materialize()
        )
        dangling = contrib.map_batches(
            only_kind(_K_DANGLING), batch_format="pyarrow").sum("val") or 0.0
        ranks = (
            nodes.union(contrib.map_batches(only_kind(_K_CONTRIB),
                                            batch_format="pyarrow"))
            .map_batches(lambda t: add_bucket(t, "key", num_buckets),
                         batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(lambda df, _d=dangling: finalize_bucket(_d)(
                df.drop(columns="__bucket")), batch_format="pandas")
            .materialize()
        )

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["key"].to_numpy(),
                             "trust": df["val"].to_numpy()})

    return ranks.map_batches(emit, batch_format="pandas")


# ---------------------------------------------------------------------------
# HITS (hubs and authorities, L1-normalized)
# ---------------------------------------------------------------------------

def _hits_solve_local(src: np.ndarray, dst: np.ndarray,
                      n_iters: int) -> pd.DataFrame:
    """Single-heap HITS over DISTINCT directed edges. L1 (sum)
    normalization instead of Kleinberg's L2: same fixpoint direction,
    and the normalizer is a plain SUM both engines can evaluate
    without sqrt. Update order per iteration: authorities from the
    CURRENT hubs, then hubs from the NEW authorities."""
    nodes, codes = np.unique(np.concatenate([src, dst]), return_inverse=True)
    s = codes[: len(src)]
    d = codes[len(src):]
    n = len(nodes)
    h = np.full(n, 1.0 / n)
    a = np.zeros(n)
    for _ in range(n_iters):
        a_raw = np.bincount(d, weights=h[s], minlength=n)
        tot = float(a_raw.sum())
        a = a_raw / tot if tot > 0.0 else a_raw
        h_raw = np.bincount(s, weights=a[d], minlength=n)
        tot = float(h_raw.sum())
        h = h_raw / tot if tot > 0.0 else h_raw
    return pd.DataFrame({"node": nodes, "hub": h, "auth": a})


def hits(
    edges_ds,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iters: int = 4,
    num_buckets: int = 64,
    local_solve_max_edges: int = 4_000_000,
):
    """Edge Dataset (distinct directed edges) -> ``(node, hub, auth)``.
    Kleinberg's HITS (1999, public literature) with L1 normalization;
    the bidirectional complement of PageRank: a round pushes mass
    ALONG edges (hub -> authority) then AGAINST them (authority ->
    hub), so the distributed path keeps TWO materialized edge
    encodings — forward keyed by src and reversed keyed by dst — and
    runs the same contribution-join exchange once in each direction
    per round, with only the two scalar normalizers on the driver.
    Duplicate (src, dst) rows are NOT collapsed here; feed distinct
    edges (duplicates add weight, which the oracle's DISTINCT would
    not see)."""
    def enc_dir(a_col: str, b_col: str):
        def enc(t: pa.Table) -> pa.Table:
            return _enc(
                t.column(a_col).cast(pa.string()).to_pylist(),
                t.column(b_col).cast(pa.string()).to_pylist(),
                np.ones(t.num_rows), _K_EDGE)
        return enc

    fwd = (edges_ds.map_batches(enc_dir(src_col, dst_col),
                                batch_format="pyarrow")
           .repartition(8).materialize())
    n_edges = fwd.count()
    if n_edges == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "hub": pa.array([], pa.float64()),
            "auth": pa.array([], pa.float64()),
        }))

    if n_edges <= local_solve_max_edges:
        def solve(t: pa.Table) -> pa.Table:
            df = _hits_solve_local(
                np.asarray(t.column("key").to_pylist(), dtype=object),
                np.asarray(t.column("dst").to_pylist(), dtype=object),
                n_iters)
            return pa.table({
                "node": pa.array(df["node"].to_numpy(dtype=object),
                                 pa.string()),
                "hub": pa.array(df["hub"].to_numpy(), pa.float64()),
                "auth": pa.array(df["auth"].to_numpy(), pa.float64()),
            })

        return fwd.repartition(1).map_batches(
            solve, batch_size=None, batch_format="pyarrow")

    # ---- distributed path ----------------------------------------------
    num_buckets = max(4, min(num_buckets, n_edges // 25_000 + 4))
    rev = (edges_ds.map_batches(enc_dir(dst_col, src_col),
                                batch_format="pyarrow")
           .repartition(8).materialize())

    def node_partials(t: pa.Table) -> pa.Table:
        ks = np.unique(np.concatenate([
            np.asarray(t.column("key").to_pylist(), dtype=object),
            np.asarray(t.column("dst").to_pylist(), dtype=object)]))
        return _enc(ks, None, np.zeros(len(ks)), _K_NODE)

    def dedup_bucket(df: pd.DataFrame) -> pa.Table:
        u = df.drop_duplicates("key")
        return _enc(u["key"].to_numpy(dtype=object), None,
                    np.zeros(len(u)), _K_NODE)

    nodes = (
        fwd.map_batches(node_partials, batch_format="pyarrow")
        .map_batches(lambda t: add_bucket(t, "key", num_buckets),
                     batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda df: dedup_bucket(df.drop(columns="__bucket")),
                    batch_format="pandas")
        .materialize()
    )
    n_nodes = nodes.count()

    def const_rank(v: float):
        def f(t: pa.Table) -> pa.Table:
            return _enc(t.column("key").to_pylist(), None,
                        np.full(t.num_rows, v), _K_RANK)
        return f

    def push(scores, edges_enc):
        """scores keyed like edges_enc: one contribution exchange ->
        UN-normalized (node, raw) rank rows coalesced over all nodes."""
        def contrib_bucket(df: pd.DataFrame) -> pa.Table:
            r = df[df["kind"] == _K_RANK]
            e = df[df["kind"] == _K_EDGE]
            if not len(e):
                return _enc([], None, [], _K_CONTRIB)
            rmap = pd.Series(r["val"].to_numpy(), index=r["key"])
            rv = rmap.reindex(e["key"]).fillna(0.0).to_numpy()
            c = pd.DataFrame({"key": e["dst"].to_numpy(), "val": rv})
            c = c.groupby("key", as_index=False)["val"].sum()
            return _enc(c["key"].to_numpy(dtype=object), None,
                        c["val"].to_numpy(), _K_CONTRIB)

        def coalesce(df: pd.DataFrame) -> pa.Table:
            n = df[df["kind"] == _K_NODE]
            c = df[df["kind"] == _K_CONTRIB]
            csum = c.groupby("key")["val"].sum()
            cv = csum.reindex(n["key"]).fillna(0.0).to_numpy()
            return _enc(n["key"].to_numpy(dtype=object), None, cv, _K_RANK)

        contrib = (
            scores.union(edges_enc)
            .map_batches(lambda t: add_bucket(t, "key", num_buckets),
                         batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(lambda df: contrib_bucket(
                df.drop(columns="__bucket")), batch_format="pandas")
        )
        return (
            nodes.union(contrib)
            .map_batches(lambda t: add_bucket(t, "key", num_buckets),
                         batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(lambda df: coalesce(df.drop(columns="__bucket")),
                        batch_format="pandas")
            .materialize()
        )

    def normalize(ranks):
        tot = ranks.sum("val") or 0.0
        if tot <= 0.0:
            return ranks

        def div(t: pa.Table) -> pa.Table:
            return t.set_column(
                2, "val", pc.divide(t["val"], pa.scalar(float(tot))))

        return ranks.map_batches(div, batch_format="pyarrow").materialize()

    hubs = nodes.map_batches(const_rank(1.0 / n_nodes),
                             batch_format="pyarrow").materialize()
    auths = None
    for _ in range(n_iters):
        auths = normalize(push(hubs, fwd))
        hubs = normalize(push(auths, rev))

    # final hub/auth zip stays distributed: kind-tag the two score sets
    # (_K_RANK = hub, _K_CONTRIB = auth), co-locate on hash(node),
    # merge in-bucket — nothing node-shaped touches the driver
    def tag(kind: int):
        def f(t: pa.Table) -> pa.Table:
            return t.set_column(
                3, "kind", pa.array(np.full(t.num_rows, kind,
                                            dtype=np.int8), pa.int8()))
        return f

    def zip_bucket(df: pd.DataFrame) -> pa.Table:
        h = df[df["kind"] == _K_RANK].drop_duplicates("key")
        a = df[df["kind"] == _K_CONTRIB].drop_duplicates("key")
        amap = pd.Series(a["val"].to_numpy(), index=a["key"])
        av = amap.reindex(h["key"]).fillna(0.0).to_numpy()
        return pa.table({
            "node": pa.array(h["key"].to_numpy(dtype=object), pa.string()),
            "hub": pa.array(h["val"].to_numpy(), pa.float64()),
            "auth": pa.array(av, pa.float64()),
        })

    return (
        hubs.map_batches(tag(_K_RANK), batch_format="pyarrow")
        .union(auths.map_batches(tag(_K_CONTRIB), batch_format="pyarrow"))
        .map_batches(lambda t: add_bucket(t, "key", num_buckets),
                     batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda df: zip_bucket(df.drop(columns="__bucket")),
                    batch_format="pandas")
    )
