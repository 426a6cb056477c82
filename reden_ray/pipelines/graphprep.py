"""Graph-embedding preparation operators (q83-q84).

The KG the linker emits (and the crawl link graph the web family
extracts) feeds representation learning; these are the two standard
data-prep passes between "graph built" and "model trained", each
Dataset-plane and hash-verified:

* q83 — deterministic random-walk corpus generation (the DeepWalk /
  node2vec sampling step): K-step walks from every node, where step t
  from node v moves to the ``mix(v, t) mod deg(v)``-th neighbour of
  v's DISTINCT-sorted adjacency. The walk policy is a pure arithmetic
  function of (node, step) — zero sampler state, so walks are
  reproducible under any partitioning (the q46/q81 property) and the
  whole corpus hash-verifies against an unrolled SQL mirror. Below
  the shared node gate the adjacency broadcasts once as CSR arrays
  and ALL K steps run inside one vectorized map (zero exchanges);
  above it each step is one union-tagged hash-bucket join (the
  triangles idiom) shipping (start, cur) int64 pairs — K bounded
  exchanges, nothing node-shaped on the driver. Walks reaching a
  dead-end node (no out-edges) stop emitting — the same drop an
  inner join produces, on both engines.
* q84 — two-hop neighbourhood feature aggregation (the GraphSAGE /
  GNN feature-prep pass): h1(v) = aggregate of v's out-neighbour
  features, h2(v) = aggregate of neighbours' h1 — rows of A·f and
  A²·f under multiset (message-passing) semantics. Combiner-first:
  edges pre-reduce to (src, dst, cnt) before any exchange; the
  node-shaped feature / h1 tables broadcast under the shared gate and
  fall back to the same union-tagged bucket join above it, where the
  flow stays on the Dataset plane end to end.

Edges come from the q42 synthetic nav corpus at DOC granularity: the
Ray side PARSES the html anchors (vectorized polars extraction); the
oracle recomputes the nav arithmetically — so the gate verifies the
parse, never a copy of it (the q42/q71 discipline).

Reference analogue: the reference stops at the fused graph
(``GraphHandlerNEL.java``); this family is the beyond-reference
training-data surface over it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Sum

from ..state.broadcast import get_broadcast
from ..stages.windows import grouped_by_key_buckets
from .selection import _NODE_BROADCAST_LIMIT, _coalesce_if_tiny
from .webops import _HREF_RE, linked_pages_from_documents

# walk-policy mix constants (match the SQL mirrors verbatim; the
# pre-mod keeps the product well inside int64 for any node id)
_WALK_KEY_MOD = 1_000_003
_WALK_A = 2_654_435_761
_WALK_B = 40_503
_WALK_C = 12_345
WALK_STEPS = 4

_PATH_ID_RE = r"/p/(?P<id>\d+)$"


def doc_link_edges(pages_ds) -> "rd.Dataset":
    """pages(url, html) → multiset doc-level edges pre-reduced to
    (src_id, dst_id, cnt): anchor hrefs parsed vectorized (polars
    extract_all), target ids from the /p/<id> path. Each block
    combines duplicate (src, dst) pairs before the one exchange."""
    import polars as pl

    def edge_partials(t: pa.Table) -> pa.Table:
        src = pc.cast(pc.struct_field(
            pc.extract_regex(t["url"], pattern=_PATH_ID_RE), "id"),
            pa.int64())
        html = pc.cast(t["html"], pa.string())
        pf = pl.DataFrame({"src_id": pl.from_arrow(src),
                           "html": pl.from_arrow(html)})
        out = (
            pf.with_columns(pl.col("html").str.extract_all(_HREF_RE)
                            .alias("href"))
            .drop("html")
            .explode("href")
            .drop_nulls("href")
            .with_columns(pl.col("href").str.extract(_HREF_RE, 1)
                          .str.extract(r"/p/(\d+)$", 1)
                          .cast(pl.Int64).alias("dst_id"))
            .drop_nulls("dst_id")
            .group_by(["src_id", "dst_id"])
            .agg(pl.len().alias("cnt"))
        ).to_arrow()
        return pa.table({
            "src_id": out["src_id"].cast(pa.int64()),
            "dst_id": out["dst_id"].cast(pa.int64()),
            "cnt": out["cnt"].cast(pa.int64()),
        })

    return (pages_ds.map_batches(edge_partials, batch_format="pyarrow")
            .groupby(["src_id", "dst_id"])
            .aggregate(Sum("cnt", alias_name="cnt")))


def _walk_mix(cur: np.ndarray, step: int) -> np.ndarray:
    return ((cur % _WALK_KEY_MOD) * _WALK_A + step * _WALK_B + _WALK_C)


def _distinct_srcs(edges_ds) -> "rd.Dataset":
    """One column of distinct src ids (edges are already unique per
    (src, dst), so src distinct = one groupby of narrow rows)."""
    return (edges_ds.groupby("src_id").aggregate(Sum("cnt"))
            .map_batches(lambda t: t.select(["src_id"]),
                         batch_format="pyarrow"))


def random_walks(edges_ds, k_steps: int = WALK_STEPS,
                 node_broadcast_limit: int = _NODE_BROADCAST_LIMIT
                 ) -> "rd.Dataset":
    """K-step deterministic walks from EVERY node with out-edges.
    Emits (start_id, step, node_id) for step 0..K; a walk that hits a
    dead end stops emitting from that step on."""
    edges = _coalesce_if_tiny(edges_ds.materialize())
    starts = _distinct_srcs(edges)
    n_nodes = starts.count()

    if n_nodes <= node_broadcast_limit:
        at = pa.concat_tables(
            list(edges.select_columns(["src_id", "dst_id"])
                 .iter_batches(batch_format="pyarrow")))
        df = at.to_pandas().sort_values(["src_id", "dst_id"],
                                        kind="stable")
        srcs = df["src_id"].to_numpy()
        dsts = df["dst_id"].to_numpy()
        uniq, counts = np.unique(srcs, return_counts=True)
        offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
        csr_ref = ray.put((uniq, offsets, dsts))

        def walk(t: pa.Table) -> pa.Table:
            u, off, d = get_broadcast(csr_ref)
            cur = t["src_id"].to_numpy(zero_copy_only=False)
            start = cur
            out_s, out_t, out_n = [start], [np.zeros(len(cur), np.int64)], [cur]
            for s in range(1, k_steps + 1):
                pos = np.searchsorted(u, cur)
                alive = (pos < len(u)) & (u[np.minimum(pos, len(u) - 1)]
                                          == cur)
                if not alive.all():
                    start, cur, pos = start[alive], cur[alive], pos[alive]
                if len(cur) == 0:
                    break
                deg = off[pos + 1] - off[pos]
                idx = _walk_mix(cur, s) % deg
                cur = d[off[pos] + idx]
                out_s.append(start)
                out_t.append(np.full(len(cur), s, np.int64))
                out_n.append(cur)
            return pa.table({
                "start_id": pa.array(np.concatenate(out_s), pa.int64()),
                "step": pa.array(np.concatenate(out_t), pa.int64()),
                "node_id": pa.array(np.concatenate(out_n), pa.int64()),
            })

        return starts.map_batches(walk, batch_format="pyarrow")

    # scale path: per-step union-tagged bucket join on the current
    # node. Adjacency rows re-shuffle each step (K bounded exchanges
    # of 2-3 int64 columns); walk rows are (start, cur) pairs.
    def tag_adj(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["src_id"],
            "start_id": pa.nulls(len(t), pa.int64()),
            "dst_id": t["dst_id"],
            "__is_adj": pa.array([True] * len(t), pa.bool_()),
        })

    adj_tagged = edges.map_batches(tag_adj, batch_format="pyarrow")
    walks = starts.map_batches(
        lambda t: pa.table({"start_id": t["src_id"],
                            "node_id": t["src_id"]}),
        batch_format="pyarrow")

    def with_step(s):
        return lambda t: pa.table({
            "start_id": t["start_id"],
            "step": pa.array(np.full(len(t), s, np.int64)),
            "node_id": t["node_id"]})

    out = [walks.map_batches(with_step(0), batch_format="pyarrow")]
    for s in range(1, k_steps + 1):
        def tag_walk(t: pa.Table) -> pa.Table:
            return pa.table({
                "node": t["node_id"], "start_id": t["start_id"],
                "dst_id": pa.nulls(len(t), pa.int64()),
                "__is_adj": pa.array([False] * len(t), pa.bool_()),
            })

        tagged = adj_tagged.union(
            walks.map_batches(tag_walk, batch_format="pyarrow"))

        def hop(df: pd.DataFrame, step=s) -> pd.DataFrame:
            frames = []
            for _, grp in df.groupby("node", sort=False):
                a = grp[grp["__is_adj"]].sort_values("dst_id",
                                                     kind="stable")
                w = grp[~grp["__is_adj"]]
                if len(a) == 0 or len(w) == 0:
                    continue
                # the union's nullable columns surface as float64 in
                # the bucket frame; cast back so the next round's
                # bucket hash sees int64 (float-hashed keys would land
                # in different buckets than the int adjacency)
                cur = w["node"].to_numpy().astype(np.int64)
                idx = (_walk_mix(cur, step) % len(a)).astype(np.int64)
                frames.append(pd.DataFrame({
                    "start_id": w["start_id"].to_numpy().astype(np.int64),
                    "node_id": a["dst_id"].to_numpy().astype(np.int64)[idx]}))
            if not frames:
                return pd.DataFrame({
                    "start_id": pd.array([], dtype="int64"),
                    "node_id": pd.array([], dtype="int64")})
            return pd.concat(frames, ignore_index=True)

        walks = grouped_by_key_buckets(tagged, "node", hop).materialize()
        out.append(walks.map_batches(with_step(s), batch_format="pyarrow"))

    res = out[0]
    for o in out[1:]:
        res = res.union(o)
    return res


def q83_random_walks(sf_dir: str) -> pd.DataFrame:
    edges = doc_link_edges(linked_pages_from_documents(sf_dir))
    return random_walks(edges).to_pandas()


def _walk_sql(k_steps: int = WALK_STEPS) -> str:
    steps = []
    unions = ["SELECT start, 0 AS step, cur AS node FROM w0"]
    for s in range(1, k_steps + 1):
        p = s - 1
        mix = (f"((w{p}.cur % {_WALK_KEY_MOD}) * {_WALK_A} "
               f"+ {s} * {_WALK_B} + {_WALK_C}) % adj.deg")
        steps.append(
            f"w{s} AS (SELECT w{p}.start, adj.dst AS cur FROM w{p} "
            f"JOIN adj ON adj.src = w{p}.cur AND adj.idx = {mix})")
        unions.append(f"SELECT start, {s} AS step, cur AS node FROM w{s}")
    step_sql = ",\n".join(steps)
    union_sql = " UNION ALL ".join(unions)
    return f"""
WITH n AS (SELECT COUNT(*) AS n FROM documents),
ks(k) AS (VALUES (0), (1), (2)),
tgt AS (
  SELECT d.doc_id AS src,
         (d.doc_id * 65537 + ks.k * 97 + 13) % (SELECT n FROM n) AS dst
  FROM documents d CROSS JOIN ks
), dedges AS (SELECT DISTINCT src, dst FROM tgt),
adj AS (
  SELECT src, dst,
         CAST(ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1
              AS BIGINT) AS idx,
         CAST(COUNT(*) OVER (PARTITION BY src) AS BIGINT) AS deg
  FROM dedges
), w0 AS (SELECT DISTINCT src AS start, src AS cur FROM dedges),
{step_sql}
SELECT CAST(start AS BIGINT) AS start_id, CAST(step AS BIGINT) AS step,
       CAST(node AS BIGINT) AS node_id
FROM ({union_sql})
"""


Q83_SQL = _walk_sql()


# ---------------------------------------------------------------------------
# Q84 — two-hop neighbourhood feature aggregation (GNN feature prep)
# ---------------------------------------------------------------------------

def _message_reduce(edges, node_ds, val_cols,
                    node_broadcast_limit: int) -> "rd.Dataset":
    """edges(src_id, dst_id, cnt) × node_ds(node, <val_cols>) →
    per-src sums of cnt·value plus cnt itself (multiset message
    passing: one row of A·[vals, 1] per source node). Node values
    broadcast under the gate (searchsorted attach); union-tagged
    bucket join above it — the Dataset plane either way."""
    n_nodes = node_ds.count()

    if n_nodes <= node_broadcast_limit:
        nt = node_ds.to_pandas()
        ids = nt["node"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ref = ray.put((ids[order],
                       {c: nt[c].to_numpy()[order] for c in val_cols}))

        def attach(t: pa.Table) -> pa.Table:
            bids, bvals = get_broadcast(ref)
            dst = t["dst_id"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(bids, dst)
            # drop messages to nodes absent from the value table (the
            # inner-join semantics of the SQL mirror); never read a
            # wrong searchsorted slot silently
            found = ((pos < len(bids))
                     & (bids[np.minimum(pos, len(bids) - 1)] == dst))
            pos = pos[found]
            cnt = t["cnt"].to_numpy(zero_copy_only=False)[found]
            src = t["src_id"].to_numpy(zero_copy_only=False)[found]
            cols = {"src_id": pa.array(src, pa.int64())}
            for c in val_cols:
                cols["m_" + c] = pa.array(bvals[c][pos] * cnt, pa.int64())
            cols["m_cnt"] = pa.array(cnt, pa.int64())
            return pa.table(cols)

        msgs = edges.map_batches(attach, batch_format="pyarrow")
    else:
        def tag_node(t: pa.Table) -> pa.Table:
            cols = {"dst_id": t["node"],
                    "src_id": pa.nulls(len(t), pa.int64()),
                    "cnt": pa.nulls(len(t), pa.int64())}
            for c in val_cols:
                cols[c] = t[c]
            cols["__is_node"] = pa.array([True] * len(t), pa.bool_())
            return pa.table(cols)

        def tag_edge(t: pa.Table) -> pa.Table:
            cols = {"dst_id": t["dst_id"], "src_id": t["src_id"],
                    "cnt": t["cnt"]}
            for c in val_cols:
                cols[c] = pa.nulls(len(t), pa.int64())
            cols["__is_node"] = pa.array([False] * len(t), pa.bool_())
            return pa.table(cols)

        tagged = (node_ds.map_batches(tag_node, batch_format="pyarrow")
                  .union(edges.map_batches(tag_edge,
                                           batch_format="pyarrow")))

        def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
            nodes = df[df["__is_node"]]
            e = df[~df["__is_node"]]
            m = e.merge(nodes[["dst_id"] + list(val_cols)], on="dst_id",
                        suffixes=("_e", ""))
            out = {"src_id": m["src_id"].astype("int64"),
                   "m_cnt": m["cnt"].astype("int64")}
            for c in val_cols:
                out["m_" + c] = (m[c] * m["cnt"]).astype("int64")
            return pd.DataFrame(out)

        msgs = grouped_by_key_buckets(tagged, "dst_id", join_bucket)

    aggs = [Sum("m_" + c, alias_name="s_" + c) for c in val_cols]
    aggs.append(Sum("m_cnt", alias_name="s_cnt"))
    return msgs.groupby("src_id").aggregate(*aggs)


def two_hop_features(edges_ds, feats_ds,
                     node_broadcast_limit: int = _NODE_BROADCAST_LIMIT
                     ) -> pd.DataFrame:
    """Multiset 1- and 2-hop aggregates per source node over
    ``feats_ds(node, f)``: h1 = A·[f, 1], h2 = A·h1. The final
    h1⋈h2 combine happens on node-sized frames (the output itself);
    above-gate deployments write each hop's Dataset instead."""
    edges = _coalesce_if_tiny(edges_ds.materialize())

    h1_ds = _message_reduce(edges, feats_ds, ["f"],
                            node_broadcast_limit)
    h1_nodes = h1_ds.map_batches(
        lambda t: pa.table({"node": t["src_id"], "f": t["s_f"],
                            "g": t["s_cnt"]}),
        batch_format="pyarrow")
    h2_ds = _message_reduce(edges, h1_nodes, ["f", "g"],
                            node_broadcast_limit)

    h1 = h1_ds.to_pandas().rename(columns={
        "src_id": "doc_id", "s_f": "h1_sum", "s_cnt": "h1_cnt"})
    h2 = h2_ds.to_pandas().rename(columns={
        "src_id": "doc_id", "s_f": "h2_sum", "s_g": "h2_cnt"}).drop(
        columns=["s_cnt"])
    out = h1.merge(h2, on="doc_id", how="left")
    for c in ("h2_sum", "h2_cnt"):
        out[c] = out[c].fillna(0).astype("int64")
    return out[["doc_id", "h1_cnt", "h1_sum", "h2_cnt", "h2_sum"]]


def q84_two_hop_features(sf_dir: str) -> pd.DataFrame:
    edges = doc_link_edges(linked_pages_from_documents(sf_dir))
    feats = rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "n_chars"]).map_batches(
        lambda t: pa.table({"node": t["doc_id"], "f": t["n_chars"]}),
        batch_format="pyarrow")
    return two_hop_features(edges, feats)


Q84_SQL = """
WITH n AS (SELECT COUNT(*) AS n FROM documents),
ks(k) AS (VALUES (0), (1), (2)),
tgt AS (
  SELECT d.doc_id AS src,
         (d.doc_id * 65537 + ks.k * 97 + 13) % (SELECT n FROM n) AS dst
  FROM documents d CROSS JOIN ks
), e AS (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM tgt GROUP BY src, dst
), h1 AS (
  SELECT e.src AS node, CAST(SUM(e.cnt) AS BIGINT) AS h1_cnt,
         CAST(SUM(e.cnt * d.n_chars) AS BIGINT) AS h1_sum
  FROM e JOIN documents d ON d.doc_id = e.dst
  GROUP BY e.src
), h2 AS (
  SELECT e.src AS node, CAST(SUM(e.cnt * h1.h1_cnt) AS BIGINT) AS h2_cnt,
         CAST(SUM(e.cnt * h1.h1_sum) AS BIGINT) AS h2_sum
  FROM e JOIN h1 ON h1.node = e.dst
  GROUP BY e.src
)
SELECT h1.node AS doc_id, h1.h1_cnt, h1.h1_sum,
       COALESCE(h2.h2_cnt, 0) AS h2_cnt, COALESCE(h2.h2_sum, 0) AS h2_sum
FROM h1 LEFT JOIN h2 ON h2.node = h1.node
"""
