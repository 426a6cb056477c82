"""Incremental crawl -> incremental KG (delta linking + carry-forward).

The reference's checkpoint idiom is skip-if-output-exists at shard
granularity (QueryAuthorBNF.java:60-66, GraphHandlerNEL.java:353-356);
state/manifest.py lifts it to partition-granular resume of ONE corpus.
This module covers the other production axis: a NEW crawl snapshot
arrives and only a fraction of pages changed. Re-linking the whole
corpus wastes exactly the compute resume was invented to save, so:

1. ``snapshot_diff`` (pipelines/webops.py) classifies urls between the
   previous and the new snapshot — keys-only, one bucketed exchange.
2. Pages classified ``added``/``changed`` (the DELTA) run through the
   full per-document link path (extract -> NER -> candidates -> fusion
   graph -> argmax). Nothing else is extracted or linked.
3. Links of ``deleted``/``changed`` urls (the STALE set) are dropped
   from the previous run's link checkpoint; the rest carry forward
   unchanged.
4. The merged links (carried ∪ delta) feed the UNCHANGED corpus-level
   tail — canonical-label argmax and entity/KB emission are global
   aggregates over vocabulary-sized reductions, so they recompute from
   scratch every run by design.

The result is EXACTLY the triples a full run on the new snapshot
produces (pytest-gated hash equality; driver query
``nel_triples_incremental`` verifies it against the full SQL linking
algebra over the mutated corpus): linking is per-document, so a page's
link rows depend only on its own text, and every cross-document
aggregate is derived downstream of the merged links.

Both url-set applications are size-gated like every broadcast in this
repo: below ``broadcast_url_limit`` the delta/stale sets ship once via
``ray.put`` and pages/links filter per batch (zero fat-row movement);
above it they run as ``left_semi`` / ``left_anti`` Dataset joins on
url — narrow link rows and the delta slice of pages cross one hash
exchange each, never the full corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_DELTA = ("added", "changed")
_STALE = ("deleted", "changed")


def _urls_with_status(diff_ds, statuses, keep_status: bool = False):
    import pyarrow.compute as pc

    want = list(statuses)
    cols = ["url", "status"] if keep_status else ["url"]

    def f(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["status"], value_set=pa.array(want))) \
            .select(cols)

    return diff_ds.map_batches(f, batch_format="pyarrow")


def _bucketed_anti_by_url(rows_ds, drop_urls_ds, num_buckets: int = 64):
    """rows minus rows whose url appears in ``drop_urls_ds`` — one
    hash(url)-bucketed exchange, union-tag encoding (drop-side rows are
    minted as all-null rows of the SAME schema plus ``__drop`` = 1), so
    arbitrary payload types (lists included) pass through untouched."""
    from ..functions.bucket import add_bucket

    schema = rows_ds.schema()
    fields = list(zip(schema.names, schema.types))

    def tag_rows(t: pa.Table) -> pa.Table:
        out = t.append_column("__drop", pa.array(
            np.zeros(t.num_rows, dtype=np.int8), pa.int8()))
        return add_bucket(out, "url", num_buckets)

    def mint_drops(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {name: (t["url"] if name == "url" else pa.nulls(n, typ))
                for name, typ in fields}
        out = pa.table(cols).append_column(
            "__drop", pa.array(np.ones(n, dtype=np.int8), pa.int8()))
        return add_bucket(out, "url", num_buckets)

    def filter_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        drops = t.filter(pc.equal(t["__drop"], pa.scalar(1, pa.int8())))
        keep = t.filter(pc.equal(t["__drop"], pa.scalar(0, pa.int8())))
        if drops.num_rows:
            keep = keep.filter(pc.invert(pc.is_in(
                keep["url"], value_set=drops["url"].combine_chunks())))
        return keep.drop_columns(["__drop", "__bucket"])

    tagged = rows_ds.map_batches(tag_rows, batch_format="pyarrow").union(
        drop_urls_ds.map_batches(mint_drops, batch_format="pyarrow"))
    return (tagged.groupby("__bucket")
            .map_groups(filter_bucket, batch_format="pyarrow"))


def incremental_links(pipeline, prev_links_ds, pages_a_ds, pages_b_ds,
                      prev_hashes_ds=None, pages_b_narrow_ds=None,
                      num_buckets: int = 64,
                      broadcast_url_limit: int = 2_000_000,
                      join_partitions: int = 16):
    """Merged link set for snapshot B given snapshot A's links.

    ``pipeline`` is the NELPipeline whose config/dictionary both runs
    share (the standing contract — a dictionary change invalidates
    carried links, so it must re-run full).

    ``prev_hashes_ds`` — the (url, h) content fingerprints persisted
    with snapshot A's link checkpoint (webops.page_content_hashes).
    When given, the diff never touches snapshot A's pages at all: the
    production checkpoint stores the fingerprints, so an incremental
    run scans ONLY the new snapshot (measured: the A-side re-scan was
    ~40% of the whole incremental wall at 600k pages). Without it,
    ``pages_a_ds`` is hashed on the fly (text column only — the
    projection keeps the fat html out of the diff read).

    ``pages_b_narrow_ds`` — an optional (url, text) source for the
    diff's B side with column pruning pushed into the READ (e.g.
    ``read_parquet(dir, columns=["url", "text"])``); a map-side
    projection over ``pages_b_ds`` cannot prune what the scan already
    fetched, and html dominates the page bytes."""
    import ray

    from .webops import page_content_hashes, snapshot_diff_keys

    def narrow(ds):
        def mk(t: pa.Table) -> pa.Table:
            return pa.table({"url": t["url"],
                             "text": t["text"].cast(pa.string())})
        return ds.map_batches(mk, batch_format="pyarrow")

    a_keys = (prev_hashes_ds if prev_hashes_ds is not None
              else page_content_hashes(narrow(pages_a_ds)))
    b_narrow = (pages_b_narrow_ds if pages_b_narrow_ds is not None
                else narrow(pages_b_ds))
    diff = snapshot_diff_keys(a_keys, page_content_hashes(b_narrow),
                              num_buckets=num_buckets).materialize()

    # ONE driver pull of the (url, status) rows decides the gate and,
    # below it, builds both url sets — not three passes over the diff
    aff = _urls_with_status(diff, ("added", "changed", "deleted"),
                            keep_status=True).materialize()
    n_affected = aff.count()  # free on the materialized narrow rows
    if n_affected <= broadcast_url_limit:
        df = aff.to_pandas()
        if "url" not in df.columns:  # all-empty Dataset: no columns
            df = pd.DataFrame({"url": [], "status": []})
        n_delta = int(df["status"].isin(_DELTA).sum())
        ref = ray.put((frozenset(df.loc[df["status"].isin(_DELTA), "url"]),
                       frozenset(df.loc[df["status"].isin(_STALE), "url"])))

        def keep(which: int, member: bool):
            def f(t: pa.Table) -> pa.Table:
                from ..state.broadcast import get_broadcast

                sets = get_broadcast(ref)
                urls = pd.Series(t.column("url").to_numpy(zero_copy_only=False))
                mask = urls.isin(sets[which]).to_numpy()
                return t.filter(pa.array(mask if member else ~mask))
            return f

        delta_pages = pages_b_ds.map_batches(keep(0, True),
                                             batch_format="pyarrow")
        carried = prev_links_ds.map_batches(keep(1, False),
                                            batch_format="pyarrow")
    else:
        delta_urls = _urls_with_status(aff, _DELTA)
        stale_urls = _urls_with_status(aff, _STALE)
        n_delta = delta_urls.count()
        # pages: left_semi Dataset.join (the latest_page_per_url attach
        # path, extract.py:205 — binary payloads are join-safe)
        delta_pages = pages_b_ds.join(delta_urls, join_type="left_semi",
                                      num_partitions=join_partitions,
                                      on=("url",))
        # links carry list<string> columns, which Arrow's hash join
        # rejects as non-key payload — anti-join them with the repo's
        # union-tag bucketed exchange instead (all of a url's rows and
        # its stale marker land in one bucket; filter is pure Arrow)
        carried = _bucketed_anti_by_url(prev_links_ds, stale_urls,
                                        num_buckets=num_buckets)

    if n_delta == 0:
        return carried  # identical snapshots: nothing to link

    new_links = pipeline.links(
        mentions_ds=pipeline.mentions(pipeline.texts(delta_pages)))
    # align schemas: both sides are link rows from the same pipeline
    # config; column ORDER can differ between a parquet checkpoint and
    # a fresh run
    cols = sorted(new_links.schema().names)

    def order(t: pa.Table) -> pa.Table:
        return t.select(cols)

    return (carried.map_batches(order, batch_format="pyarrow")
            .union(new_links.map_batches(order, batch_format="pyarrow")))


def incremental_triples(pipeline, prev_links_ds, pages_a_ds, pages_b_ds,
                        **kw) -> "ray.data.Dataset":  # noqa: F821
    """Snapshot-B triples computed incrementally — hash-equal to a full
    run on B (see module docstring)."""
    return pipeline.triples(
        incremental_links(pipeline, prev_links_ds, pages_a_ds, pages_b_ds,
                          **kw))
