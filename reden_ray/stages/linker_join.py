"""Distributed-join linking path (J3): for KBs too large to broadcast.

The broadcast path (stages/linker.py) holds the whole KB index in one
object-store entry — right whenever the KB fits a node. At web scale
(full DBpedia-class KBs) the KB is a Dataset, and candidate
neighborhoods arrive via a hash-partitioned equi-join instead
(SURVEY.md J3 / §4.2 row 1):

    candidates --explode probe uris--> (url, ..., probe_uri)
        ⋈ kb_triples ON probe_uri = subj          (shuffle on subj)
    edges+candidates --union, regroup on url bucket--> link per doc
                                                  (shuffle on url)

Semantics match the broadcast path EXCEPT parallel-edge resolution:
REDEN keeps the FIRST statement per (src, dst) pair in Jena iteration
order (GraphHandlerNEL.java:211-343); join output order is
nondeterministic, so we keep the (pred, weight)-MINIMUM per pair —
deterministic, and invisible to degree scoring (degree counts pairs,
not labels). Link output is therefore identical to the broadcast path
under degree centrality; edge-label reports may differ on parallel
edges (documented divergence).

Partitioning assumptions: the probe⋈subj join hash-partitions on the
URI; head entities ("France"-scale neighborhoods) produce large join
outputs bounded per (url, mention) by the K2 candidate cap upstream —
cap neighbor fan-out with ``max_neighbors_per_uri`` if a KB subject's
edge list is pathological.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from .. import SAMEAS_PRED
from ..functions.uri import decompose
from .linker import (
    DEFAULT_URL_BUCKETS,
    LINK_SCHEMA,
    _LINK_COLUMNS,
    _MEASURES,
    prune_graph,
)
from .linker import _emit as emit_link


def explode_probe_uris(candidates_ds, sameas_ds=None, num_partitions: int = 8):
    """candidates -> one row per (candidate, probe uri).

    The probe set is base ∪ equivalence list (the ``uris`` column). One
    extra hop from a ``sameas`` Dataset is folded in by a small join
    when provided (J4); at dictionary-build time the equivalence list
    normally already contains it.
    """

    def explode(t: pa.Table) -> pa.Table:
        # vectorized fan-out: probe set = base entity ∪ (uris ≠ base).
        # Probe ORDER is irrelevant downstream (edges key on the pair
        # and resolve by (pred, weight)-min), so base rows and the
        # flattened equivalence rows are emitted as two blocks.
        import pyarrow.compute as pc

        base_cols = ["url", "mention_id", "cand_rank", "entity_id"]
        parts = pc.split_pattern(t["uris_str"].combine_chunks(), " ")
        flat = pc.list_flatten(parts)
        idx = pc.list_parent_indices(parts)
        ent_rep = t["entity_id"].combine_chunks().take(idx)
        keep = pc.invert(pc.equal(flat, ent_rep))
        idx_f = idx.filter(keep)
        extra = pa.table({
            **{c: t[c].take(idx_f) for c in base_cols},
            "probe_uri": flat.filter(keep).cast(pa.string()),
        })
        base = pa.table({
            **{c: t[c] for c in base_cols},
            "probe_uri": t["entity_id"].cast(pa.string()),
        })
        return pa.concat_tables([base, extra]).combine_chunks()

    out = candidates_ds.map_batches(explode, batch_format="pyarrow")
    if sameas_ds is not None:
        extra = candidates_ds.map_batches(
            lambda t: pa.table({
                "url": t["url"], "mention_id": t["mention_id"],
                "cand_rank": t["cand_rank"], "entity_id": t["entity_id"],
                "uri": t["entity_id"],
            }),
            batch_format="pyarrow",
        ).join(sameas_ds, join_type="inner", num_partitions=num_partitions, on=("uri",))
        extra = extra.map_batches(
            lambda t: pa.table({
                "url": t["url"], "mention_id": t["mention_id"],
                "cand_rank": t["cand_rank"], "entity_id": t["entity_id"],
                "probe_uri": t["equiv_uri"],
            }),
            batch_format="pyarrow",
        )
        out = out.union(extra)
    return out


def apply_rels_weights(pred_col, weight_col, rels: dict[str, float] | None):
    """Vectorized -relsFile predicate-weight override (same semantics
    as the broadcast path's ``rels.get(pred, w)`` in
    linker._entity_edges): index_in + take yields null for preds not in
    ``rels``; coalesce falls back to the raw KB weight."""
    import pyarrow.compute as pc

    weight = pc.cast(weight_col, pa.float64())
    if not rels:
        return weight
    rel_keys = pa.array(list(rels.keys()), pa.string())
    rel_vals = pa.array([float(v) for v in rels.values()], pa.float64())
    idx = pc.index_in(pred_col, rel_keys)
    return pc.coalesce(pc.take(rel_vals, idx), weight)


def link_documents_via_join(
    candidates_ds,
    kb_triples_ds,
    sameas_ds=None,
    rels: dict[str, float] | None = None,
    measure: str = "degree",
    prefered_uri_order: str = "ALL",
    num_partitions: int = 16,
    num_buckets: int = DEFAULT_URL_BUCKETS,
):
    """candidates + kb Datasets -> links Dataset (two shuffles:
    subj-hash join, then url-bucket regroup).

    ``rels`` (the reference's -relsFile predicate weights) overrides
    edge weights per predicate exactly like the broadcast path's
    ``_entity_edges`` (linker.py) — applied vectorized on the joined
    edge rows before the (pred, weight)-min resolution."""
    if candidates_ds.count() == 0:
        # Ray joins can't take a fully-empty side — short-circuit with
        # a typed empty links Dataset (callers pin candidates, so this
        # count() is metadata-only)
        import ray.data as rd

        return rd.from_arrow(LINK_SCHEMA.empty_table())
    probes = explode_probe_uris(candidates_ds, sameas_ds, num_partitions=num_partitions)
    edges = probes.join(
        kb_triples_ds,
        join_type="inner",
        num_partitions=num_partitions,
        on=("probe_uri",),
        right_on=("subj",),
    )

    def edge_rows(t: pa.Table) -> pa.Table:
        weight = apply_rels_weights(t["pred"], t["weight"], rels)
        return pa.table({
            "url": t["url"],
            "mention_id": t["mention_id"],
            "cand_rank": t["cand_rank"],
            "entity_id": t["entity_id"],
            "surface": pa.nulls(t.num_rows, pa.string()),
            "surface_norm": pa.nulls(t.num_rows, pa.string()),
            "uris_str": pa.nulls(t.num_rows, pa.string()),
            "kind": pa.array(["edge"] * t.num_rows, pa.string()),
            "pred": t["pred"],
            "obj": t["obj"],
            "weight": weight,
        })

    def cand_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "url": t["url"],
            "mention_id": t["mention_id"],
            "cand_rank": t["cand_rank"],
            "entity_id": t["entity_id"],
            "surface": t["surface"],
            "surface_norm": t["surface_norm"],
            "uris_str": t["uris_str"],
            "kind": pa.array(["cand"] * t.num_rows, pa.string()),
            "pred": pa.nulls(t.num_rows, pa.string()),
            "obj": pa.nulls(t.num_rows, pa.string()),
            "weight": pa.nulls(t.num_rows, pa.float64()),
        })

    from ..functions.bucket import add_bucket

    unioned = candidates_ds.map_batches(cand_rows, batch_format="pyarrow").union(
        edges.map_batches(edge_rows, batch_format="pyarrow")
    )
    bucketed = unioned.map_batches(
        lambda t: add_bucket(t, "url", num_buckets), batch_format="pyarrow"
    )

    def link_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out: list[dict] = []
        df = df.sort_values(["url", "mention_id", "cand_rank"], kind="stable")
        for _url, g in df.groupby("url", sort=False):
            out.extend(_link_from_rows(g, measure, prefered_uri_order))
        return pd.DataFrame(out, columns=_LINK_COLUMNS)

    return bucketed.groupby("__bucket").map_groups(link_bucket, batch_format="pandas")


def _link_from_rows(g: pd.DataFrame, measure: str, prefered_uri_order: str) -> list[dict]:
    cands = g[g["kind"] == "cand"]
    if cands.empty:
        return []
    by_mention: dict[int, list[dict]] = {}
    for t in cands.itertuples(index=False):
        by_mention.setdefault(t.mention_id, []).append({
            "url": t.url, "mention_id": t.mention_id, "surface": t.surface,
            "surface_norm": t.surface_norm, "cand_rank": t.cand_rank,
            "entity_id": t.entity_id, "uris": t.uris_str.split(" "),
        })
    for rows in by_mention.values():
        rows.sort(key=lambda r: r["cand_rank"])

    if all(len(rows) <= 1 for rows in by_mention.values()):
        return [emit_link(by_mention[mid][0], None, prefered_uri_order)
                for mid in sorted(by_mention)]

    # graph from joined edge rows; (pred, weight)-min per (src, dst)
    edge_best: dict[tuple[str, str], tuple[str, float]] = {}
    adj: dict[str, set[str]] = {}
    cand_vertices: set[str] = set()
    inverted: dict[str, int] = {}
    for mid in sorted(by_mention):
        for r in by_mention[mid]:
            vb = decompose(r["entity_id"])
            cand_vertices.add(vb)
            adj.setdefault(vb, set())
            inverted[vb] = mid
    e = g[g["kind"] == "edge"]
    for t in e.itertuples(index=False):
        if t.pred == SAMEAS_PRED:
            continue
        src = decompose(t.entity_id)
        dst = decompose(t.obj)
        if src == dst:
            continue
        key = (src, dst)
        cur = edge_best.get(key)
        nxt = (t.pred, float(t.weight))
        if cur is None or nxt < cur:
            edge_best[key] = nxt
            adj.setdefault(src, set()).add(dst)
            adj.setdefault(dst, set()).add(src)

    prune_graph(edge_best, adj, cand_vertices, inverted)
    scores = _MEASURES[measure](edge_best, adj)
    out = []
    for mid in sorted(by_mention):
        best_row, best_key = None, None
        for row in by_mention[mid]:
            s = scores.get(decompose(row["entity_id"]), 0.0)
            key = (s, row["entity_id"])
            if best_key is None or key > best_key:
                best_row, best_key = row, key
        out.append(emit_link(best_row, best_key[0], prefered_uri_order))
    return out
