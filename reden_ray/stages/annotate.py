"""Annotated-output writer + visualization data (S10/S15, Mode 3).

* ``annotate_pages`` — the Parquet analog of the reference's DOM
  mutation + re-serialization (`ref_auto` attributes,
  src/fr/lip6/reden/nelinker/ResultsAndEvaluationNEL.java:79-111): a
  url-bucket join of pages x links producing one row per page with an
  ``annotations`` JSON column ``[{mention_id, surface, uri[, score]}]``
  sorted by mention_id. ``add_scores=True`` mirrors the reference's
  ``addScores`` config (config/config-authors-bnf.properties; score
  written at ResultsAndEvaluationNEL.java:98-104): the winning
  centrality score is written into each annotation (null for
  NoAmbiguity fast-path links, which carry no score).
* ``produce_visu_data`` — Mode 3 (MainNELApp.java:126-150): linked-URI
  occurrence counts enriched with configured properties, rendered as a
  GeoJSON-style FeatureCollection
  (enrichne/EnrichmentHandler.java:122-153; property lists like
  config/latlong.properties).
"""

from __future__ import annotations

import json

import pandas as pd
import pyarrow as pa

from .linker import DEFAULT_URL_BUCKETS, add_url_bucket
from .reports import enrich_links, uri_occurrences


def annotate_pages(texts_ds, links_ds, num_buckets: int = DEFAULT_URL_BUCKETS,
                   add_scores: bool = False):
    """(url, text) x links -> (url, text, annotations JSON).

    Both sides shuffle once on the url hash bucket; pages without links
    get an empty annotation list (left-join semantics). With
    ``add_scores=True`` each annotation carries the link's score
    (reference ``addScores``).
    """
    import math

    link_cols = ["url", "mention_id", "surface", "uri"] + (
        ["score"] if add_scores else [])

    def tag_pages(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__kind"] = "page"
        return add_url_bucket(df, num_buckets)

    def tag_links(df: pd.DataFrame) -> pd.DataFrame:
        df = df[link_cols].copy()
        df["__kind"] = "link"
        return add_url_bucket(df, num_buckets)

    pages_b = texts_ds.select_columns(["url", "text"]).map_batches(
        tag_pages, batch_format="pandas"
    )
    links_b = links_ds.map_batches(tag_links, batch_format="pandas")

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        pages = df[df["__kind"] == "page"]
        links = df[df["__kind"] == "link"]
        ann: dict[str, list[dict]] = {}
        if len(links):
            for t in links.sort_values(["url", "mention_id"]).itertuples(index=False):
                a = {"mention_id": int(t.mention_id), "surface": t.surface, "uri": t.uri}
                if add_scores:
                    # score may arrive as None (e.g. an all-NoAmbiguity
                    # batch yields an Arrow null / object column)
                    s = None if t.score is None else float(t.score)
                    a["score"] = None if s is None or math.isnan(s) else s
                ann.setdefault(t.url, []).append(a)
        out = pages[["url", "text"]].copy()
        out["annotations"] = out["url"].map(lambda u: json.dumps(ann.get(u, [])))
        return out

    return pages_b.union(links_b).groupby("__bucket").map_groups(
        join_bucket, batch_format="pandas"
    )


def visu_features(links_ds, kb_ref, prop_lists: dict[str, list[str]]):
    """links -> Dataset of GeoJSON Feature rows (one per linked uri):
    ``(uri, feature)`` where ``feature`` is the serialized Feature.

    Fully Dataset-plane (Mode 3 at scale): per-uri occurrence counts
    join the J7-enriched property row by a hash-partitioned
    ``Dataset.join`` on uri — nothing corpus-sized reaches the driver.
    Consume with ``write_visu_data`` (sharded JSON sink) or assemble the
    (vocabulary-bounded) FeatureCollection with ``produce_visu_data``.
    """
    from ..functions.blocks import pin_nonempty

    occ = pin_nonempty(uri_occurrences(links_ds).repartition(4))
    if occ.count() == 0:  # Ray joins can't take a fully-empty side
        import ray.data as rd

        return rd.from_arrow(pa.schema(
            {"uri": pa.string(), "feature": pa.string()}).empty_table())
    one_per_uri = links_ds.groupby("uri").map_groups(
        lambda df: df.head(1), batch_format="pandas"
    )
    enriched = pin_nonempty(enrich_links(one_per_uri, kb_ref, prop_lists).map_batches(
        lambda t: t.select(["uri", *prop_lists]), batch_format="pyarrow"
    ).repartition(4))
    merged = occ.join(enriched, join_type="left_outer", num_partitions=4,
                      on=("uri",))

    def to_features(df: pd.DataFrame) -> pd.DataFrame:
        out_uri, out_feat = [], []
        for t in df.itertuples(index=False):
            props = {"uri": t.uri, "occurrences": int(t.occurrences)}
            for name in prop_lists:
                v = getattr(t, name, None)
                props[name] = None if pd.isna(v) else v
            feature = {"type": "Feature", "properties": props, "geometry": None}
            lat, lon = props.get("lat"), props.get("lon")
            if lat is not None and lon is not None:
                try:
                    feature["geometry"] = {
                        "type": "Point",
                        "coordinates": [float(lon), float(lat)],
                    }
                except (TypeError, ValueError):
                    pass
            out_uri.append(t.uri)
            out_feat.append(json.dumps(feature, sort_keys=True))
        return pd.DataFrame({"uri": out_uri, "feature": out_feat})

    return merged.map_batches(to_features, batch_format="pandas")


def write_visu_data(links_ds, kb_ref, prop_lists: dict[str, list[str]],
                    out_dir: str):
    """Dataset sink for Mode 3: sharded JSON files of Feature rows
    (scale-safe; no driver materialization). Returns the feature count."""
    feats = visu_features(links_ds, kb_ref, prop_lists).materialize()
    feats.write_json(out_dir)
    return feats.count()


def produce_visu_data(links_ds, kb_ref, prop_lists: dict[str, list[str]]) -> dict:
    """links -> GeoJSON FeatureCollection dict, assembled from the
    Dataset-plane ``visu_features`` rows — bounded by the number of
    DISTINCT linked uris (vocabulary-sized), which is the contract for
    pulling it to the driver; corpora whose linked vocabulary is itself
    huge should use ``write_visu_data`` instead."""
    rows = visu_features(links_ds, kb_ref, prop_lists).to_pandas()
    rows = rows.sort_values("uri")
    return {"type": "FeatureCollection",
            "features": [json.loads(f) for f in rows["feature"]]}
