"""Dictionary construction pipeline (reference Mode 2 analog).

The reference builds its alias dictionary by crawling SPARQL endpoints
per letter shard (src/fr/lip6/reden/ldextractor/AppAdhoc.java:49-292,
per-source classes under ldextractor/per and ldextractor/loc), merging
rows per entity and generating ~15 alias patterns
(per/AuthorBNF.java:138-192). In a sealed, network-free pipeline the
crawl is replaced by a deterministic builder over an ENTITY TABLE —
`(entity_id, first, last, gender, particle, birth, death, uris...)` —
expressed Ray-Data-first:

    read entities -> flat_map(make_aliases rows) -> dictionary parquet

The per-letter shard loop becomes the Dataset's natural block
partitioning; the skip-if-output-exists checkpoint becomes the
partitioned-write manifest (state/manifest.py). The TSV alias format
(`alternative_name \t normalized_name \t uri1 [\t uri2...]`,
config/config-authors-bnf.properties:45-46) is also supported as a
reader for drop-in compatibility.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.alias import make_aliases, normalized_display_name
from ..functions.dates import clean_year
from ..functions.text import normalize_surface

DICTIONARY_SCHEMA = pa.schema(
    {
        "surface": pa.string(),
        "surface_norm": pa.string(),
        "canonical_name": pa.string(),
        "entity_id": pa.string(),
        "uris": pa.list_(pa.string()),
        "ne_type": pa.string(),
    }
)


def explode_entity_batch(batch: pa.Table) -> pa.Table:
    """entities batch -> dictionary rows (one per alias)."""
    cols = {name: batch.column(name).to_pylist() for name in batch.column_names}
    n = batch.num_rows
    surf, norm, canon, ent, uris_col, ne = [], [], [], [], [], []
    for i in range(n):
        first = cols.get("first", [""] * n)[i] or ""
        last = cols.get("last", [""] * n)[i] or ""
        gender = cols.get("gender", [""] * n)[i] or ""
        particle = cols.get("particle", [""] * n)[i] or ""
        birth = clean_year(cols.get("birth", [None] * n)[i])
        death = clean_year(cols.get("death", [None] * n)[i])
        entity_id = cols["entity_id"][i]
        uris = list(cols.get("uris", [[]] * n)[i] or [])
        if entity_id not in uris:
            uris = [entity_id, *uris]
        ne_type = cols.get("ne_type", ["PER"] * n)[i]
        canonical = normalized_display_name(first, last, birth, death)
        for alias in make_aliases(first, last, gender, particle):
            surf.append(alias)
            norm.append(normalize_surface(alias))
            canon.append(canonical)
            ent.append(entity_id)
            uris_col.append(uris)
            ne.append(ne_type)
    return pa.table(
        {
            "surface": pa.array(surf, pa.string()),
            "surface_norm": pa.array(norm, pa.string()),
            "canonical_name": pa.array(canon, pa.string()),
            "entity_id": pa.array(ent, pa.string()),
            "uris": pa.array(uris_col, pa.list_(pa.string())),
            "ne_type": pa.array(ne, pa.string()),
        },
        schema=DICTIONARY_SCHEMA,
    )


def build_dictionary(entities_ds, greater_than: int | None = None,
                     lesser_than: int | None = None):
    """entities Dataset -> dictionary Dataset (alias-exploded).

    ``greater_than`` / ``lesser_than`` are the TemporalExtent date
    bounds of the reference's Mode-2 crawl
    (ldextractor/TemporalExtent.java:9-34, rendered as STRICT birthdate
    FILTERs in per/QueryAuthorBNF.java:69-85; CLI params
    AppAdhoc.java:301-324): keep an entity iff its cleaned birth year
    satisfies ``birth > greater_than`` and ``birth < lesser_than``.
    Like the SPARQL FILTER on an unbound variable, entities whose birth
    year cannot be parsed are dropped when any bound is set.
    """
    ds = entities_ds
    if greater_than is not None or lesser_than is not None:

        def in_bounds(batch: pa.Table) -> pa.Table:
            births = (batch.column("birth").to_pylist()
                      if "birth" in batch.column_names else [None] * batch.num_rows)
            keep = []
            for b in births:
                y = clean_year(b)
                try:
                    yi = int(y)
                except (TypeError, ValueError):
                    keep.append(False)  # unparseable under a FILTER -> dropped
                    continue
                ok = True
                if greater_than is not None:
                    ok = ok and yi > greater_than
                if lesser_than is not None:
                    ok = ok and yi < lesser_than
                keep.append(ok)
            return batch.filter(pa.array(keep))

        ds = ds.map_batches(in_bounds, batch_format="pyarrow")
    return ds.map_batches(explode_entity_batch, batch_format="pyarrow")


def merge_entity_rows(raw_ds):
    """A10: crawler-row merge — group raw per-solution rows by entity
    and accumulate distinct sameAs refs and cleaned rejected forms
    (reference: QueryAuthorBNF.java:161-240, where SPARQL solution rows
    for the same author URI are folded into one bean). Input columns:
    (entity_id, first, last, gender, particle, birth, death, uri,
    rejected_form); output: one row per entity with collected lists.
    """
    import pandas as pd

    from ..functions.alias import clean_rejected_forms

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for ent, g in df.groupby("entity_id", sort=True):
            first_row = g.iloc[0]
            uris = [ent]
            for u in g["uri"]:
                if u and u not in uris:
                    uris.append(u)
            forms = clean_rejected_forms([f for f in g["rejected_form"] if f])
            out.append({
                "entity_id": ent,
                "first": first_row.get("first", ""),
                "last": first_row.get("last", ""),
                "gender": first_row.get("gender", ""),
                "particle": first_row.get("particle", ""),
                "birth": first_row.get("birth", None),
                "death": first_row.get("death", None),
                "uris": uris,
                "rejected_forms": forms,
            })
        return pd.DataFrame(out)

    from ..functions.bucket import add_bucket

    bucketed = raw_ds.map_batches(lambda t: add_bucket(t, "entity_id", 64),
                                  batch_format="pyarrow")
    return bucketed.groupby("__bucket").map_groups(merge, batch_format="pandas")


def read_tsv_dictionary(path: str):
    """Read the reference's ragged TSV alias format into the dictionary
    schema (reader parity: DicoProcessingNEL.java:82-97 — tab separator,
    no quoting, URIs from column 2 onward)."""
    import ray.data as rd

    def parse(batch: pa.Table) -> pa.Table:
        surf, norm, canon, ent, uris_col, ne = [], [], [], [], [], []
        for line in batch.column("text").to_pylist():
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 3:
                continue
            alias, canonical, uris = parts[0], parts[1], parts[2:]
            surf.append(alias)
            norm.append(normalize_surface(alias))
            canon.append(canonical)
            ent.append(uris[0])
            uris_col.append(uris)
            ne.append("PER")
        return pa.table(
            {
                "surface": pa.array(surf, pa.string()),
                "surface_norm": pa.array(norm, pa.string()),
                "canonical_name": pa.array(canon, pa.string()),
                "entity_id": pa.array(ent, pa.string()),
                "uris": pa.array(uris_col, pa.list_(pa.string())),
                "ne_type": pa.array(ne, pa.string()),
            },
            schema=DICTIONARY_SCHEMA,
        )

    return rd.read_text(path).map_batches(parse, batch_format="pyarrow")
