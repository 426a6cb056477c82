"""Side-report pipelines (reference S11-S14 analogs) + text analytics.

* ``ambiguity_report`` — #candidate URIs per mention (S12,
  src/fr/lip6/reden/MainNELApp.java:266-275).
* ``predicate_frequency`` — global fusion-graph edge-label counts
  (S13, ResultsAndEvaluationNEL.java:371-387 fed by
  CentralityHandler.java:126-134) — expressed as a proper groupby
  aggregation instead of the reference's mutable static map
  (MainNELApp.java:56).
* ``uri_occurrences`` — linked-URI counts (A9,
  EnrichmentHandler.java:80-94).
* ``correct_mention_counts`` — per-surface correct-link counts (A8,
  ResultsAndEvaluationNEL.java:295-301).
* ``enrich_links`` — J7 enrichment join: first matching property value
  per configured property list (EnrichmentHandler.java:162-187,
  GeodataGeneration.java:43-65; property lists config/latlong.properties,
  config/authors.properties).
* Text analytics (langid / quality / token counts / fingerprints) as
  vectorizable ``map_batches`` stages over a documents table.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Count, Max, Min, Sum

from ..functions.text import (
    count_tokens_bpe,
    count_tokens_ws,
    detect_language,
    fingerprint_md5,
    quality_features,
    simhash64,
)
from ..state.broadcast import get_broadcast


def ambiguity_report(candidates_ds):
    """(url, mention_id, surface) -> n_candidates."""
    return (
        candidates_ds.groupby(["url", "mention_id"])
        .aggregate(Count(alias_name="n_candidates"))
    )


def predicate_frequency(edges_ds):
    """fusion edges -> (pred, freq) sorted descending."""
    return (
        edges_ds.groupby("pred")
        .aggregate(Count(alias_name="freq"))
        .sort("freq", descending=True)
    )


def uri_occurrences(links_ds):
    return links_ds.groupby("uri").aggregate(Count(alias_name="occurrences"))


def entity_temporal_extent(links_ds, pages_ds, num_buckets: int | None = None):
    """Per-entity temporal extent over the crawl: for every linked
    entity, the first / last ``warc_ts`` of the pages it appears on and
    its distinct-url support — the KG-temporal sibling of the
    reference's TemporalExtent (date-bounded dictionary build;
    ldextractor/TemporalExtent.java) applied to the OUTPUT graph
    instead of the input KB.

    Scale shape: both sides reduce keys-only per block (links to
    DISTINCT (url, uri); pages to (url, ts_ms) int64 — html never
    moves), union-tagged through ONE url-keyed exchange (the
    snapshot-diff idiom); in-bucket the ts attaches by url and partial
    rows pre-combine per uri (min/max ts + distinct-url count — EXACT
    across buckets because the partition key IS url); the final
    groupby sums/mins/maxes vocabulary-sized partials."""
    import pyarrow.compute as pc

    from ..stages.windows import DEFAULT_KEY_BUCKETS, grouped_by_key_buckets

    def link_rows(t: pa.Table) -> pa.Table:
        d = (t.select(["url", "uri"])
             .group_by(["url", "uri"]).aggregate([]))
        return d.append_column(
            "ts_ms", pa.array([None] * d.num_rows, pa.int64()))

    def page_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "url": t["url"],
            "uri": pa.array([None] * t.num_rows, pa.string()),
            "ts_ms": pc.cast(t["warc_ts"], pa.int64()),
        })

    tagged = links_ds.map_batches(link_rows, batch_format="pyarrow").union(
        pages_ds.map_batches(page_rows, batch_format="pyarrow"))

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        ts = (df.loc[df["uri"].isna()].drop_duplicates("url")
              .set_index("url")["ts_ms"])
        l = df.loc[df["uri"].notna(), ["url", "uri"]].drop_duplicates()
        # fail loudly (int cast raises on NaN) if a linked url has no
        # page row — links derive from pages, so that is corruption
        l = l.assign(ts_ms=l["url"].map(ts).astype("int64"))
        out = l.groupby("uri", as_index=False).agg(
            fs=("ts_ms", "min"), ls=("ts_ms", "max"), nu=("url", "nunique"))
        return out.astype({"fs": "int64", "ls": "int64", "nu": "int64"})

    partials = grouped_by_key_buckets(
        tagged, "url", attach, num_buckets or DEFAULT_KEY_BUCKETS)
    return (partials.groupby("uri")
            .aggregate(Min("fs", alias_name="first_seen_ms"),
                       Max("ls", alias_name="last_seen_ms"),
                       Sum("nu", alias_name="n_urls")))


_LIFT_SCALE = 1_000_000


def cooccurrence_lift(links_ds, num_buckets: int | None = None):
    """Co-occurrence edges weighted by quantized lift (the PMI ratio
    before the log): lift_e6 = floor(n_ab * N * 1e6 / (n_a * n_b)),
    where n_x = distinct urls containing entity x and N = distinct urls
    with >=1 link. Lift > 1e6 means the pair co-occurs more than
    independence predicts — the standard relatedness weight for
    co-mention KG edges. Integer arithmetic end-to-end so the score
    itself hash-verifies (the q47/q48 quantization idiom).

    Scale shape: edges stay distributed (cooccurrence_edges); the
    marginals are vocabulary-sized — computed with ONE url-keyed
    exchange (distinct-url counts per uri are exact per bucket because
    the partition key is url, plus a sentinel row per bucket carrying
    the bucket's distinct-url total), broadcast once, attached
    map-side. NOTE: the int64 product n_ab*N*1e6 is exact at any
    corpus this sandbox can hold; at 10^12-url scale switch the lift
    to float128/log space (the counts themselves stay exact)."""
    import numpy as np

    import ray

    from ..state.broadcast import get_broadcast
    from ..stages.windows import DEFAULT_KEY_BUCKETS, grouped_by_key_buckets

    nb = num_buckets or DEFAULT_KEY_BUCKETS

    def distinct_rows(t: pa.Table) -> pa.Table:
        return (t.select(["url", "uri"])
                .group_by(["url", "uri"]).aggregate([]))

    distinct = links_ds.map_batches(distinct_rows, batch_format="pyarrow")

    _N_SENTINEL = "\x00N"   # impossible as a URI; carries the url total

    def marginal_partials(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["url", "uri"])
        out = df.groupby("uri", as_index=False).agg(m=("url", "nunique"))
        total = pd.DataFrame({"uri": [_N_SENTINEL],
                              "m": [df["url"].nunique()]})
        return pd.concat([out, total], ignore_index=True).astype({"m": "int64"})

    marg = (grouped_by_key_buckets(distinct, "url", marginal_partials, nb)
            .groupby("uri").aggregate(Sum("m", alias_name="m"))
            .to_pandas())
    n_total = int(marg.loc[marg["uri"] == _N_SENTINEL, "m"].iloc[0])
    m_map = dict(zip(marg["uri"], marg["m"].astype(int)))
    m_map.pop(_N_SENTINEL)
    m_ref = ray.put(m_map)

    def attach_lift(t: pa.Table) -> pa.Table:
        mm = get_broadcast(m_ref)
        ma = np.array([mm[u] for u in t["uri_a"].to_pylist()], np.int64)
        mb = np.array([mm[u] for u in t["uri_b"].to_pylist()], np.int64)
        nab = t["n_urls"].to_numpy(zero_copy_only=False).astype(np.int64)
        lift = nab * n_total * _LIFT_SCALE // (ma * mb)
        return t.append_column("lift_e6", pa.array(lift, pa.int64()))

    return (cooccurrence_edges(links_ds, nb)
            .map_batches(attach_lift, batch_format="pyarrow"))


def cooccurrence_edges(links_ds, num_buckets: int | None = None):
    """Entity co-occurrence network over the link decisions: one
    undirected edge (uri_a < uri_b) per pair of DISTINCT entities
    linked within the same url, weighted by the number of urls where
    they co-occur — the canonical KG-construction output downstream of
    disambiguation (co-mention graphs for entity relatedness; the
    corpus-level sibling of the reference's per-context fusion graph,
    GraphHandlerNEL.java:78-103, which never leaves one document).

    Scale shape: per-block DISTINCT (url, uri) combiner (duplicate
    mentions of an entity in one doc collapse before anything moves),
    ONE url-keyed bucketed exchange, in-bucket vectorized pair mint
    (each url's pairs are quadratic in its DISTINCT entity count —
    naturally bounded by document length, the standard co-occurrence
    semantics), per-bucket (pair, n) partial counts, and a final
    pre-reduced groupby sum. No text or list columns ever move."""
    from ..stages.windows import DEFAULT_KEY_BUCKETS, grouped_by_key_buckets

    def distinct_rows(t: pa.Table) -> pa.Table:
        return (t.select(["url", "uri"])
                .group_by(["url", "uri"]).aggregate([]))

    distinct = links_ds.map_batches(distinct_rows, batch_format="pyarrow")

    def mint_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["url", "uri"])   # cross-block repeats
        m = df.merge(df, on="url")
        m = m[m["uri_x"] < m["uri_y"]]
        out = (m.groupby(["uri_x", "uri_y"], sort=False).size()
               .rename("n").reset_index())
        out.columns = ["uri_a", "uri_b", "n"]
        return out

    partials = grouped_by_key_buckets(
        distinct, "url", mint_pairs, num_buckets or DEFAULT_KEY_BUCKETS)
    return (partials.groupby(["uri_a", "uri_b"])
            .aggregate(Sum("n", alias_name="n_urls")))


def correct_mention_counts(links_ds, gold_df: pd.DataFrame):
    """A8 per-surface correct counts, derived from the EvalInfo records
    (ResultsAndEvaluationNEL.java:295-301). Links are pre-filtered to
    the (small) gold key set BEFORE materializing, so this stays safe
    against corpus-scale links."""
    from .evaluate import eval_records

    r = eval_records(links_ds, gold_df)
    ok = r[r["gold_uri"].notna() & r["choice_is_correct"]]
    out = ok.groupby("surface").size().reset_index(name="n_correct")
    return out.sort_values(["n_correct", "surface"], ascending=[False, True]).reset_index(drop=True)


class EnrichLinks:
    """J7: links batches -> + one column per (name, [property prefs]),
    taking the FIRST matching property value in list order (coalesce).

    The per-(name, uri) coalesce is precomputed ONCE per worker in
    ``__init__`` (one pass over the broadcast KB); each batch is then a
    vectorized Series lookup instead of nested per-row loops."""

    def __init__(self, kb_ref, prop_lists: dict[str, list[str]]):
        kb = get_broadcast(kb_ref)
        self.maps: dict[str, pd.Series] = {}
        for name, prefs in prop_lists.items():
            rank = {p: i for i, p in enumerate(prefs)}  # list order = preference
            best: dict[str, tuple[int, str]] = {}
            for uri, triples in kb.items():
                for pred, obj, _lit, _w in triples:
                    r = rank.get(pred)
                    if r is not None and (uri not in best or r < best[uri][0]):
                        best[uri] = (r, obj)
            self.maps[name] = pd.Series({u: v for u, (_r, v) in best.items()},
                                        dtype="object")

    def __call__(self, batch: pa.Table) -> pa.Table:
        uris = batch.column("uri").to_numpy(zero_copy_only=False)
        for name, m in self.maps.items():
            vals = m.reindex(uris).to_numpy()
            vals = [None if v is None or (isinstance(v, float) and pd.isna(v)) else v
                    for v in vals]
            batch = batch.append_column(name, pa.array(vals, pa.string()))
        return batch


def enrich_links(links_ds, kb_ref, prop_lists: dict[str, list[str]],
                 concurrency: int | tuple = (1, 2)):
    return links_ds.map_batches(
        EnrichLinks, fn_constructor_args=(kb_ref, prop_lists),
        batch_format="pyarrow", concurrency=concurrency, num_cpus=1,
    )


# ---------------------------------------------------------------------------
# Text analytics over a documents table (doc_id, text, ...)
# ---------------------------------------------------------------------------


def text_stats_batch(batch: pa.Table) -> pa.Table:
    """doc_id + frozen quality/token/fingerprint features per document."""
    texts = batch.column("text").to_pylist()
    feats = [quality_features(t) for t in texts]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_chars": pa.array([int(f["n_chars"]) for f in feats], pa.int64()),
            "n_tokens": pa.array([int(f["n_tokens"]) for f in feats], pa.int64()),
            "n_words": pa.array([int(f["n_words"]) for f in feats], pa.int64()),
            "n_bpe_tokens": pa.array([count_tokens_bpe(t) for t in texts], pa.int64()),
            "alpha_ratio": pa.array([f["alpha_ratio"] for f in feats], pa.float64()),
            "punct_ratio": pa.array([f["punct_ratio"] for f in feats], pa.float64()),
            "stop_ratio": pa.array([f["stop_ratio"] for f in feats], pa.float64()),
            "mean_word_len": pa.array([f["mean_word_len"] for f in feats], pa.float64()),
            "fingerprint": pa.array([fingerprint_md5(t) for t in texts], pa.string()),
            "simhash": pa.array([simhash64(t) for t in texts], pa.uint64()),
            "lang_detected": pa.array([detect_language(t) for t in texts], pa.string()),
        }
    )


def text_stats(documents_ds, batch_size: int = 1024):
    return documents_ds.map_batches(text_stats_batch, batch_format="pyarrow",
                                    batch_size=batch_size)


def token_count_totals(documents_ds):
    """Corpus-wide token totals: per-batch combiner + single-row aggregate."""

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table({
            "ws_tokens": pa.array([sum(count_tokens_ws(t) for t in texts)], pa.int64()),
            "bpe_tokens": pa.array([sum(count_tokens_bpe(t) for t in texts)], pa.int64()),
            "docs": pa.array([len(texts)], pa.int64()),
        })

    parts = documents_ds.map_batches(partial, batch_format="pyarrow")
    return parts.aggregate(Sum("ws_tokens", alias_name="ws_tokens"),
                           Sum("bpe_tokens", alias_name="bpe_tokens"),
                           Sum("docs", alias_name="docs"))
