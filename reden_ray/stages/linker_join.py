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

The graph rows shipped through the url regroup are COMPACT: every
centrality measure (A3) scores the pruned pair/adjacency STRUCTURE
only — edge labels (pred, weight) never influence the links output in
either path — so the join ships distinct, pre-decomposed
``(url, src_v, dst_v)`` vertex pairs instead of full triple rows:

* sameAs predicates are filtered KB-side (they expand probes, J4,
  never become graph edges — same as the broadcast path);
* ``decompose`` (the vertex-identity function) is applied ONCE per
  distinct URI per batch on the KB side and the probe side, not once
  per joined row;
* probes are deduped to distinct (url, candidate-vertex, probe-uri)
  BEFORE the join — co-mentioned repeated candidates in a page fan
  out zero extra join rows;
* joined pairs are deduped again per batch before the url regroup,
  and the per-url graph build dedupes exactly (directed pairs, the
  same identity REDEN's Jena model uses: GraphHandlerNEL.java:211-343
  keeps one statement per (src, dst); statement labels are invisible
  to CentralityHandler scoring).

Link output is therefore identical to the broadcast path under every
measure. Parallel-edge LABELS (which the broadcast path resolves
first-statement-wins for its debug/report surfaces) do not exist on
this path at all — the join path emits links, not edge-label reports.

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
        # Probe ORDER is irrelevant downstream (edges key on the
        # deduped vertex pair), so base rows and the flattened
        # equivalence rows are emitted as two blocks.
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


def decompose_column(col) -> pa.Array:
    """Vectorized ``decompose`` over an Arrow string column.

    factorize hashes the column at C speed; decompose (lru-cached) runs
    once per DISTINCT value — URI columns here repeat heavily (head
    entities appear in most pages), so this is ~uniques/rows the cost
    of a per-row loop."""
    import numpy as np

    vals = col.to_numpy(zero_copy_only=False)
    codes, uniq = pd.factorize(vals)
    # factorize assigns code -1 to nulls, which would silently index
    # dec[-1] (the LAST unique's decomposition) and corrupt vertex
    # identity. Current call sites (entity_id, kb obj) are non-null by
    # construction — fail loudly if that ever changes (ADVICE r04).
    if (codes < 0).any():
        raise ValueError(
            f"decompose_column: {int((codes < 0).sum())} null URI(s) in input"
        )
    dec = np.array([decompose(u) for u in uniq], dtype=object)
    return pa.array(dec[codes], pa.string())


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
    sameas_broadcast_row_limit: int = 4_000_000,
    kb_subj_filter_ref=None,
):
    """candidates + kb Datasets -> links Dataset (two shuffles:
    subj-hash join, then url-bucket regroup; the sameAs hop is a
    broadcast map-side expansion under ``sameas_broadcast_row_limit``,
    a third join above it).

    ``kb_subj_filter_ref`` (optional): broadcast ref to an Arrow string
    array holding a SUPERSET of every probe URI this run can emit — the
    semi-join reduction. When set, the KB side is filtered map-side
    (``is_in(subj, universe)``) BEFORE the join shuffle, so the "one
    unavoidable KB-sized exchange" ships only subjects that can
    possibly match instead of the whole KB (a DBpedia-class KB is
    ~99% non-candidate subjects). Lossless for an inner join by
    construction; callers must guarantee the superset property
    (NELPipeline derives the universe from the same dictionary +
    sameAs tables the probes come from — see probe_universe_ref).

    ``rels`` (the reference's -relsFile predicate weights) changes
    degree (weight sum) and closeness (weighted shortest paths) in the
    reference's sna library — verified by decompiling its
    jgrapht-sna-1.2.jar (DegreeCentrality sums getEdgeWeight over
    edgesOf; FreemanClosenessCentrality seeds a symmetrized weighted
    Floyd-Warshall). When provided, edge pairs carry a ``w`` column
    (min weight per collapsed parallel-edge pair — deterministic where
    the reference's HashSet iteration order is not) through the same
    exchanges; the default rels=None path is shape-identical to before
    (no extra column ships). Betweenness/eigenvector ignore weights in
    both the reference and here."""
    import pyarrow.compute as pc

    if candidates_ds.count() == 0:
        # Ray joins can't take a fully-empty side — short-circuit with
        # a typed empty links Dataset (callers pin candidates, so this
        # count() is metadata-only)
        import ray.data as rd

        return rd.from_arrow(LINK_SCHEMA.empty_table())
    # weights can only influence scoring for degree/closeness — for the
    # unweighted measures skip the extra column entirely
    weighted = bool(rels) and measure in ("degree", "closeness")

    # sameAs (J4) is an equivalence-pair table — vocabulary-sized by
    # nature, orders of magnitude smaller than the KB that forced this
    # path. Under the row gate it broadcasts as a map-side hop instead
    # of paying a second distributed hash join (same size-gating
    # pattern as relational.BROADCAST_ROW_LIMIT); the join fallback
    # stays for a genuinely huge equivalence table.
    samap_ref = None
    sameas_join_ds = None
    if sameas_ds is not None:
        if sameas_ds.count() <= sameas_broadcast_row_limit:
            from ..state.broadcast import put_broadcast

            sp = sameas_ds.to_pandas()
            samap: dict[str, list[str]] = {}
            for u, eq in zip(sp["uri"], sp["equiv_uri"]):
                samap.setdefault(u, []).append(eq)
            samap_ref = put_broadcast(samap)
        else:
            sameas_join_ds = sameas_ds

    def compact_probes(t: pa.Table) -> pa.Table:
        # explode base ∪ equivalence-list ∪ broadcast-sameAs probes,
        # then distinct (url, candidate-vertex, probe): repeated
        # candidates across a page's mentions join the KB once, not
        # per mention
        import numpy as np

        from ..state.broadcast import get_broadcast

        urls = t["url"].combine_chunks()
        ents = t["entity_id"].combine_chunks()
        src = decompose_column(ents)
        parts = pc.split_pattern(t["uris_str"].combine_chunks(), " ")
        flat = pc.list_flatten(parts)
        idx = pc.list_parent_indices(parts)
        keep = pc.invert(pc.equal(flat, ents.take(idx)))
        idx_f = idx.filter(keep)
        pieces = [
            pa.table({"url": urls, "src_v": src,
                      "probe_uri": ents.cast(pa.string())}),
            pa.table({"url": urls.take(idx_f), "src_v": src.take(idx_f),
                      "probe_uri": flat.filter(keep).cast(pa.string())}),
        ]
        if samap_ref is not None:
            m = get_broadcast(samap_ref)
            ent_np = ents.to_numpy(zero_copy_only=False)
            codes, uniq = pd.factorize(ent_np)
            hops = [m.get(u) for u in uniq]
            counts = np.fromiter((len(h) if h else 0 for h in hops),
                                 dtype=np.int64, count=len(hops))
            row_counts = counts[codes]
            if row_counts.any():
                rep = np.repeat(np.arange(len(ent_np)), row_counts)
                probe_vals = np.concatenate(
                    [hops[cd] for cd in codes if counts[cd]])
                rep_idx = pa.array(rep, pa.int64())
                pieces.append(pa.table({
                    "url": urls.take(rep_idx), "src_v": src.take(rep_idx),
                    "probe_uri": pa.array(probe_vals, pa.string()),
                }))
        out = pa.concat_tables(pieces).combine_chunks()
        return out.group_by(["url", "src_v", "probe_uri"]).aggregate([])

    def prep_kb(t: pa.Table) -> pa.Table:
        # sameAs rows expand probes (J4), never become graph edges;
        # distinct (subj, decomposed obj) — parallel edges (several
        # preds per pair) collapse here, exactly as the per-url pair
        # dedup would do later but before the join fans them out.
        # Weighted runs keep min(rels-mapped weight) per pair.
        if kb_subj_filter_ref is not None:
            from ..state.broadcast import get_broadcast

            t = t.filter(pc.is_in(
                t["subj"], value_set=get_broadcast(kb_subj_filter_ref)))
        t = t.filter(pc.not_equal(t["pred"], SAMEAS_PRED))
        if weighted:
            w = apply_rels_weights(t["pred"], t["weight"], rels)
            out = pa.table({"subj": t["subj"],
                            "dst_v": decompose_column(t["obj"]), "w": w})
            agg = out.group_by(["subj", "dst_v"]).aggregate([("w", "min")])
            return agg.rename_columns(
                ["w" if c == "w_min" else c for c in agg.column_names])
        out = pa.table({"subj": t["subj"], "dst_v": decompose_column(t["obj"])})
        return out.group_by(["subj", "dst_v"]).aggregate([])

    if sameas_join_ds is None:
        probes = candidates_ds.map_batches(compact_probes, batch_format="pyarrow")
    else:
        # over-gate equivalence table: distributed sameAs join, then
        # project+dedupe to the compact probe shape
        raw = explode_probe_uris(candidates_ds, sameas_join_ds,
                                 num_partitions=num_partitions)

        def project(t: pa.Table) -> pa.Table:
            out = pa.table({
                "url": t["url"],
                "src_v": decompose_column(t["entity_id"]),
                "probe_uri": t["probe_uri"],
            })
            return out.group_by(["url", "src_v", "probe_uri"]).aggregate([])

        probes = raw.map_batches(project, batch_format="pyarrow")

    kb_prepped = kb_triples_ds.map_batches(prep_kb, batch_format="pyarrow")
    if kb_subj_filter_ref is not None:
        # The semi-join filter empties most padding/non-candidate KB
        # blocks; zero-row blocks reaching a hash join poison its key
        # resolution (see functions/blocks.py). The filtered KB is
        # candidate-neighborhood-sized by construction, so pinning it
        # is cheap — and a FULLY filtered-out KB must short-circuit
        # (links still emit from candidates alone, with no graph).
        from ..functions.blocks import pin_nonempty

        kb_prepped = pin_nonempty(kb_prepped)
        if kb_prepped.count() == 0:
            kb_prepped = None
    if kb_prepped is not None:
        edges = probes.join(
            kb_prepped,
            join_type="inner",
            num_partitions=num_partitions,
            on=("probe_uri",),
            right_on=("subj",),
        )  # the one unavoidable KB-sized exchange of this path
    else:
        edges = None

    def edge_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["src_v"], t["dst_v"]))  # self-loops
        if weighted:
            pairs = (pa.table({"url": t["url"], "src_v": t["src_v"],
                               "dst_v": t["dst_v"], "w": t["w"]})
                     .group_by(["url", "src_v", "dst_v"])
                     .aggregate([("w", "min")]))
            w_col = pairs["w_min"]
        else:
            pairs = (pa.table({"url": t["url"], "src_v": t["src_v"],
                               "dst_v": t["dst_v"]})
                     .group_by(["url", "src_v", "dst_v"]).aggregate([]))
        n = pairs.num_rows
        out = {
            "url": pairs["url"],
            "mention_id": pa.nulls(n, pa.int64()),
            "cand_rank": pa.nulls(n, pa.int32()),
            "entity_id": pa.nulls(n, pa.string()),
            "surface": pa.nulls(n, pa.string()),
            "surface_norm": pa.nulls(n, pa.string()),
            "uris_str": pa.nulls(n, pa.string()),
            "kind": pa.array(["edge"] * n, pa.string()),
            "src_v": pairs["src_v"],
            "dst_v": pairs["dst_v"],
        }
        if weighted:
            out["w"] = w_col
        return pa.table(out)

    def cand_rows(t: pa.Table) -> pa.Table:
        out = {
            "url": t["url"],
            "mention_id": t["mention_id"],
            "cand_rank": pc.cast(t["cand_rank"], pa.int32()),
            "entity_id": t["entity_id"],
            "surface": t["surface"],
            "surface_norm": t["surface_norm"],
            "uris_str": t["uris_str"],
            "kind": pa.array(["cand"] * t.num_rows, pa.string()),
            "src_v": decompose_column(t["entity_id"]),
            "dst_v": pa.nulls(t.num_rows, pa.string()),
        }
        if weighted:
            out["w"] = pa.nulls(t.num_rows, pa.float64())
        return pa.table(out)

    from ..functions.bucket import add_bucket

    unioned = candidates_ds.map_batches(cand_rows, batch_format="pyarrow")
    if edges is not None:
        unioned = unioned.union(
            edges.map_batches(edge_rows, batch_format="pyarrow"))
    bucketed = unioned.map_batches(
        lambda t: add_bucket(t, "url", num_buckets), batch_format="pyarrow"
    )

    def link_bucket(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        out: list[dict] = []
        # NaN mention_ids (edge rows) sort last within each url, so
        # every url group is [cand rows (by mention, rank)] + [edges]
        df = df.sort_values(["url", "mention_id", "cand_rank"], kind="stable")
        col_names = ["url", "mention_id", "cand_rank", "entity_id", "surface",
                     "surface_norm", "uris_str", "kind", "src_v", "dst_v"]
        if weighted:
            col_names.append("w")
        cols = {c: df[c].to_numpy() for c in col_names}
        url = cols["url"]
        n = len(url)
        if n == 0:
            return pd.DataFrame(out, columns=_LINK_COLUMNS)
        # group boundaries by url — numpy slicing instead of pandas
        # groupby iteration (sub-DataFrame construction per url was the
        # dominant cost at ~60k urls per task)
        starts = np.concatenate(([0], np.flatnonzero(url[1:] != url[:-1]) + 1))
        ends = np.concatenate((starts[1:], [n]))
        for s, e in zip(starts, ends):
            out.extend(_link_from_slice(cols, int(s), int(e), measure,
                                        prefered_uri_order))
        return pd.DataFrame(out, columns=_LINK_COLUMNS)

    return bucketed.groupby("__bucket").map_groups(link_bucket, batch_format="pandas")


def _link_from_slice(cols: dict, s: int, e: int, measure: str,
                     prefered_uri_order: str) -> list[dict]:
    """One url's compact rows (columns sliced [s:e)) -> link dicts —
    the same A1-A4 core as the broadcast path: fuse, prune, score once
    per graph, per-mention argmax with the deterministic
    (score, entity_id) tie-break."""
    kind = cols["kind"]
    # cand rows sort before edge rows (non-null mention_id first)
    c_end = s
    while c_end < e and kind[c_end] == "cand":
        c_end += 1
    if c_end == s:
        return []
    url = cols["url"][s]
    mid_a = cols["mention_id"]
    rank_a = cols["cand_rank"]
    ent_a = cols["entity_id"]
    surf_a = cols["surface"]
    norm_a = cols["surface_norm"]
    uris_a = cols["uris_str"]
    src_a = cols["src_v"]
    by_mention: dict[int, list[dict]] = {}
    for i in range(s, c_end):
        # int(): the unioned mention_id column is nullable (edge rows),
        # so pandas holds it as float64 — links must emit int64
        mid = int(mid_a[i])
        by_mention.setdefault(mid, []).append({
            "url": url, "mention_id": mid, "surface": surf_a[i],
            "surface_norm": norm_a[i], "cand_rank": int(rank_a[i]),
            "entity_id": ent_a[i], "src_v": src_a[i],
            "uris": uris_a[i].split(" "),
        })
    # rows arrive (mention_id, cand_rank)-sorted; dict preserves
    # insertion order, so by_mention keys are already ascending and
    # each mention's rows already rank-ascending
    if all(len(rows) <= 1 for rows in by_mention.values()):
        return [emit_link(rows[0], None, prefered_uri_order)
                for rows in by_mention.values()]

    adj: dict[str, set[str]] = {}
    cand_vertices: set[str] = set()
    inverted: dict[str, int] = {}
    for mid, rows in by_mention.items():
        for r in rows:
            vb = r["src_v"]
            cand_vertices.add(vb)
            adj.setdefault(vb, set())
            inverted[vb] = mid
    # exact directed-pair dedup (per-batch dedup upstream is partial:
    # the same pair can arrive via several join batches) — weighted
    # runs keep min(w) per pair, matching prep_kb/edge_rows
    dst_a = cols["dst_v"]
    w_a = cols.get("w")
    if w_a is not None:
        pairs: dict = {}
        for src, dst, w in zip(src_a[c_end:e], dst_a[c_end:e], w_a[c_end:e]):
            k = (src, dst)
            old = pairs.get(k)
            if old is None or w < old:
                pairs[k] = float(w)
    else:
        pairs = dict.fromkeys(zip(src_a[c_end:e], dst_a[c_end:e]))
    for src, dst in pairs:
        adj.setdefault(src, set()).add(dst)
        adj.setdefault(dst, set()).add(src)

    prune_graph(pairs, adj, cand_vertices, inverted)
    scores = _MEASURES[measure](pairs, adj)
    out = []
    for rows in by_mention.values():
        best_row, best_key = None, None
        for row in rows:
            sc = scores.get(row["src_v"], 0.0)
            key = (sc, row["entity_id"])
            if best_key is None or key > best_key:
                best_row, best_key = row, key
        out.append(emit_link(best_row, best_key[0], prefered_uri_order))
    return out
