"""Distributed connected components over an edge Dataset.

The near-dup family (stages/dedup.py) clusters verified candidate
pairs. Round 1 ran a driver-side union-find over a collected pair set;
at web-scale duplicate rates (30-50%) that pair set is O(corpus), so
this module replaces it with iterative **min-label propagation** that
never leaves the Dataset plane:

* state = one ``(node, label)`` row per node (label starts at
  ``min(node, min neighbor)``);
* each round, every node's current label is sent to all its neighbors
  and the per-node min is re-taken — two hash-bucket groupby shuffles
  of narrow int64 rows per round;
* labels are monotonically non-increasing, so the global label sum is
  strictly decreasing until the fixed point: an unchanged sum is the
  convergence test (one tiny scalar aggregate per round);
* from round 3 on, a POINTER-JUMPING shortcut (label <- label(label),
  one extra hash-bucket cogroup per round) kicks in, so long-diameter
  components converge in O(log d) rounds instead of O(d).

LSH duplicate clusters are near-cliques (every member collides with
the representative in some band), so the typical round count is 2-4
and the shortcut never engages; it exists for adversarial chain-like
duplicate graphs.

Equivalent output to union-find: every node that appears in an edge is
assigned the MINIMUM node id of its component.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

_ENC_SCHEMA = pa.schema({"node": pa.int64(), "val": pa.int64(), "kind": pa.int8()})


def _add_bucket(num_buckets: int):
    from ..functions.bucket import add_bucket

    def add(t: pa.Table) -> pa.Table:
        return add_bucket(t, "node", num_buckets, out="__b")

    return add


def _enc(node: np.ndarray, val: np.ndarray, kind: int) -> pa.Table:
    return pa.table(
        {
            "node": pa.array(node.astype("int64"), pa.int64()),
            "val": pa.array(val.astype("int64"), pa.int64()),
            "kind": pa.array(np.full(len(node), kind, dtype=np.int8), pa.int8()),
        },
        schema=_ENC_SCHEMA,
    )


def _local_cc_batch(t: pa.Table) -> pa.Table:
    """Single-task component solve over one encoded-edge block:
    vectorized min-label propagation with pointer jumping (O(log d)
    numpy rounds, no Python loop over edges). Input rows are the
    BIDIRECTIONAL encoding, so every ``val`` also appears as ``node``
    and searchsorted against the unique node set is total."""
    node = t.column("node").to_numpy(zero_copy_only=False)
    val = t.column("val").to_numpy(zero_copy_only=False)
    uniq, inv_n = np.unique(node, return_inverse=True)
    inv_v = np.searchsorted(uniq, val)
    label = np.arange(len(uniq), dtype=np.int64)
    while True:
        new = label.copy()
        np.minimum.at(new, inv_n, label[inv_v])  # neighbor min
        new = new[new]  # pointer jump
        if np.array_equal(new, label):
            break
        label = new
    return pa.table({"node": pa.array(uniq, pa.int64()),
                     "cluster": pa.array(uniq[label], pa.int64())})


def connected_components(
    edges_ds,
    num_buckets: int = 64,
    max_iter: int = 30,
    local_solve_max_edges: int = 4_000_000,
):
    """Edge Dataset (columns ``a``, ``b``; int-castable) ->
    ``(node, cluster)`` Dataset with one row per distinct endpoint,
    ``cluster`` = min node id of the connected component.

    Duplicate / bidirectional / self edges are all tolerated.

    Below ``local_solve_max_edges`` ENCODED rows (2x the input pairs,
    int64 triplets — the default gate is ~100 MB) the component solve
    runs as vectorized label propagation inside ONE Ray task instead
    of iterated distributed rounds: each distributed round costs two
    hash-bucket shuffles of fixed overhead that dwarf the work on
    small pair sets (measured 1.5-1.9 s for a 160k-row graph that the
    single-task solve finishes in <0.1 s). Above the gate the
    iterative min-label propagation runs unchanged — the pair set at
    web-scale duplicate rates is O(corpus) and must never sit in one
    heap.
    """

    def bidir(t: pa.Table) -> pa.Table:
        a = t.column("a").cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        b = t.column("b").cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        node = np.concatenate([a, b])
        val = np.concatenate([b, a])
        return _enc(node, val, kind=1)

    # Edges are reused every round: coalesce the (often many tiny)
    # upstream blocks and materialize the encoded form once — the edge
    # block count enters every round's union + groupby overhead.
    edges = (
        edges_ds.map_batches(bidir, batch_format="pyarrow")
        .repartition(8)
        .materialize()
    )
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "cluster": pa.array([], pa.int64())})
        )
    if n_edges <= local_solve_max_edges:
        return (
            edges.repartition(1)
            .map_batches(_local_cc_batch, batch_size=None,
                         batch_format="pyarrow")
        )

    # scale bucket count to the edge set: tiny problems pay per-group
    # fixed overhead, huge ones need spread
    num_buckets = max(4, min(num_buckets, n_edges // 25_000 + 4))

    # Initial label candidates: (node, min(node, neighbor)) — one free
    # propagation step folded into the init.
    def init_labels(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy(zero_copy_only=False)
        val = t.column("val").to_numpy(zero_copy_only=False)
        return _enc(node, np.minimum(node, val), kind=0)

    cand = edges.map_batches(init_labels, batch_format="pyarrow")

    def reduce_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("node", as_index=False)["val"].min()
        return out.rename(columns={"val": "label"}).astype(
            {"node": "int64", "label": "int64"}
        )

    def propagate_bucket(df: pd.DataFrame) -> pd.DataFrame:
        lab = df.loc[df["kind"] == 0].groupby("node")["val"].min()
        e = df.loc[df["kind"] == 1]
        # message to every neighbor + keep own label
        node = np.concatenate([lab.index.to_numpy(), e["val"].to_numpy()])
        val = np.concatenate([lab.to_numpy(), lab.reindex(e["node"]).to_numpy()])
        out = pd.DataFrame(
            {
                "node": node.astype("int64"),
                "val": val.astype("int64"),
                "kind": np.zeros(len(node), dtype=np.int8),
            }
        )
        return out

    def shortcut_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # kind 0: (key=node, val=label) own rows; kind 1: (key=label,
        # val=node) lookup requests — label-of-label resolves in-bucket
        # because every label IS a node id (min of node ids).
        lab = df.loc[df["kind"] == 0].set_index("node")["val"]
        req = df.loc[df["kind"] == 1]
        return pd.DataFrame({
            "node": req["val"].to_numpy(dtype="int64"),
            "label": lab.reindex(req["node"]).to_numpy(dtype="int64"),
        })

    def apply_shortcut(labels_ds):
        def enc_pair(df: pd.DataFrame) -> pd.DataFrame:
            own = pd.DataFrame({"node": df["node"].astype("int64"),
                                "val": df["label"].astype("int64"),
                                "kind": np.zeros(len(df), dtype=np.int8)})
            req = pd.DataFrame({"node": df["label"].astype("int64"),
                                "val": df["node"].astype("int64"),
                                "kind": np.ones(len(df), dtype=np.int8)})
            return pd.concat([own, req], ignore_index=True)

        return (
            labels_ds.map_batches(enc_pair, batch_format="pandas")
            .map_batches(_add_bucket(num_buckets), batch_format="pyarrow")
            .groupby("__b")
            .map_groups(shortcut_bucket, batch_format="pandas")
            .materialize()
        )

    prev_sum: int | None = None
    labels = None
    for it in range(max_iter):
        labels = (
            cand.map_batches(_add_bucket(num_buckets), batch_format="pyarrow")
            .groupby("__b")
            .map_groups(reduce_bucket, batch_format="pandas")
            .materialize()
        )
        if it >= 2:
            # pointer jumping: halves the remaining diameter per round
            labels = apply_shortcut(labels)
        # labels are per-node mins and monotonically non-increasing ->
        # unchanged sum == fixed point. (Python-int exact via Arrow sum.)
        s = labels.sum("label")
        if s == prev_sum:
            break
        prev_sum = s
        lab_enc = labels.map_batches(
            lambda df: pd.DataFrame(
                {
                    "node": df["node"].astype("int64"),
                    "val": df["label"].astype("int64"),
                    "kind": np.zeros(len(df), dtype=np.int8),
                }
            ),
            batch_format="pandas",
        )
        cand = (
            lab_enc.union(edges)
            .map_batches(_add_bucket(num_buckets), batch_format="pyarrow")
            .groupby("__b")
            .map_groups(propagate_bucket, batch_format="pandas")
        )

    return labels.map_batches(
        lambda df: df.rename(columns={"label": "cluster"})[["node", "cluster"]],
        batch_format="pandas",
    )
