"""Broadcast small-side state: build once, ``ray.put`` once, read everywhere.

The reference re-opens its Lucene dictionary index on every lookup call
(src/fr/lip6/reden/nelinker/DicoProcessingNEL.java:305-339) and rebuilds
a Jena model per context (GraphHandlerNEL.java:78-103). Here each
small side (alias dictionary, KB neighborhood index, sameAs map) is
loaded into a plain dict ONCE on the driver, put into the object store
ONCE (``ray.put``), and fetched zero-RPC by every task/actor on the node
via ``get_broadcast`` — which also caches the deserialized object per
worker process so repeated ``map_groups`` calls don't re-deserialize.

At web scale, when a side no longer fits in one object, the same
interfaces are served by the distributed-join path in
``reden_ray.stages.linker`` (J3) instead of a broadcast.
"""

from __future__ import annotations

from typing import Any

import pyarrow.parquet as pq

import ray

# Per-worker-process cache of deserialized broadcast objects.
_CACHE: dict[str, Any] = {}


def put_broadcast(obj: Any) -> "ray.ObjectRef":
    return ray.put(obj)


def get_broadcast(ref: "ray.ObjectRef") -> Any:
    key = ref.hex()
    if key not in _CACHE:
        _CACHE[key] = ray.get(ref)
    return _CACHE[key]


# ---------------------------------------------------------------------------
# Index builders (driver-side, from Parquet)
# ---------------------------------------------------------------------------


def load_dictionary_index(path: str) -> dict[str, list[tuple[str, tuple[str, ...], str]]]:
    """surface_norm -> [(entity_id, uris, ne_type), ...] (J1 build side).

    Mirrors the Lucene index contents: doc = {nameForm, uris}
    (DicoProcessingNEL.java:277-290), exact-match key = normalized alias.
    """
    t = pq.read_table(path, columns=["surface_norm", "entity_id", "uris", "ne_type"])
    idx: dict[str, list[tuple[str, tuple[str, ...], str]]] = {}
    for norm, ent, uris, ne in zip(
        t["surface_norm"].to_pylist(),
        t["entity_id"].to_pylist(),
        t["uris"].to_pylist(),
        t["ne_type"].to_pylist(),
    ):
        idx.setdefault(norm, []).append((ent, tuple(uris), ne))
    return idx


def load_gazetteer_surfaces(path: str) -> list[tuple[str, str]]:
    """[(surface, ne_type)] for the NER trie."""
    t = pq.read_table(path, columns=["surface", "ne_type"])
    return sorted(zip(t["surface"].to_pylist(), t["ne_type"].to_pylist()))


def kb_index_from_table(
    t, into: dict | None = None
) -> dict[str, list[tuple[str, str, bool, float]]]:
    """Fold KB triple rows (an Arrow table) into the subj-keyed
    neighborhood index. ``into`` accumulates across several tables
    (e.g. the object-store blocks of a semi-join-reduced KB)."""
    idx: dict[str, list[tuple[str, str, bool, float]]] = (
        {} if into is None else into)
    for s, p, o, lit, w in zip(
        t["subj"].to_pylist(),
        t["pred"].to_pylist(),
        t["obj"].to_pylist(),
        t["obj_is_literal"].to_pylist(),
        t["weight"].to_pylist(),
    ):
        idx.setdefault(s, []).append((p, o, bool(lit), float(w)))
    return idx


def load_kb_index(path: str) -> dict[str, list[tuple[str, str, bool, float]]]:
    """subj -> [(pred, obj, obj_is_literal, weight)] — replaces the
    per-URI N3 cache + Jena Model (GraphHandlerNEL.java:78-103,351-384)."""
    return kb_index_from_table(pq.read_table(path))


def load_sameas_index(path: str) -> dict[str, list[str]]:
    """uri -> [equiv_uri] (one hop, non-transitive — J4,
    GraphHandlerNEL.java:114-197)."""
    t = pq.read_table(path)
    idx: dict[str, list[str]] = {}
    for u, e in zip(t["uri"].to_pylist(), t["equiv_uri"].to_pylist()):
        idx.setdefault(u, []).append(e)
    return idx


def invert_sameas(sameas: dict[str, list[str]]) -> dict[str, str]:
    """equiv_uri -> base uri (for re-rooting triples at the base URI)."""
    out: dict[str, str] = {}
    for base, eqs in sameas.items():
        for e in eqs:
            out.setdefault(e, base)
    return out


def load_rels_weights(path: str | None) -> dict[str, float]:
    """Relation-weight table (ST3): ``predicate weight`` lines; default 1.0
    (GraphHandlerNEL.java:236-249, CLI -relsFile MainNELApp.java:160-162)."""
    if not path:
        return {}
    out: dict[str, float] = {}
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            parts = line.split()
            if len(parts) >= 2:
                out[parts[0]] = float(parts[1])
    return out
