"""Candidate generation: exact-match dictionary lookup (J1/ST1/K2/D1).

Reference semantics (all parity-cited into /root/reference):
* exact match on the M1-normalized surface form, case-insensitive —
  NOT fuzzy (src/fr/lip6/reden/nelinker/DicoProcessingNEL.java:144-183,
  KeywordAnalyzer term query :316).
* duplicate candidate URI lists are dropped (D1, :163-175).
* candidate set capped at 100 per mention (K2, ``searcher.search(query,
  100)`` :319).

The dictionary index is the Lucene-index replacement: a plain dict
``surface_norm -> [(entity_id, uris, ne_type)]`` loaded ONCE per actor
from a ``ray.put`` broadcast (the reference reopens the index per call).
At web scale with a dictionary too large to broadcast, the same output
is produced by the hash-partitioned join path in
``candidates_via_join`` (mentions ⋈ dictionary on surface_norm).
"""

from __future__ import annotations

import pyarrow as pa

from ..state.broadcast import get_broadcast

MAX_CANDIDATES = 100  # K2 parity: DicoProcessingNEL.java:319


class CandidateGen:
    """Actor-pool stage: mentions batches -> candidates table."""

    def __init__(self, dico_ref):
        self.index = get_broadcast(dico_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        has_hash = "url_hash" in batch.column_names
        hash_in = (
            batch.column("url_hash").to_pylist()
            if has_hash
            else [0] * batch.num_rows
        )
        urls, hashes, mids, surfs, norms, ranks, ents, uris_col = [], [], [], [], [], [], [], []
        for url, uh, mid, surface, norm in zip(
            batch.column("url").to_pylist(),
            hash_in,
            batch.column("mention_id").to_pylist(),
            batch.column("surface").to_pylist(),
            batch.column("surface_norm").to_pylist(),
        ):
            cands = self.index.get(norm)
            if not cands:
                continue
            seen: set[tuple[str, ...]] = set()  # D1 dedup of identical URI lists
            rank = 0
            for entity_id, uris, _ne in cands:
                if uris in seen:
                    continue
                seen.add(uris)
                urls.append(url)
                hashes.append(uh)
                mids.append(mid)
                surfs.append(surface)
                norms.append(norm)
                ranks.append(rank)
                ents.append(entity_id)
                # space-joined equivalence list: URIs contain no spaces,
                # and a flat string column shuffles ~10x faster than
                # list<string> through Ray's sort-based groupby.
                uris_col.append(" ".join(uris))
                rank += 1
                if rank >= MAX_CANDIDATES:  # K2 cap
                    break
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "url_hash": pa.array(hashes, pa.int64()),
                "mention_id": pa.array(mids, pa.int64()),
                "surface": pa.array(surfs, pa.string()),
                "surface_norm": pa.array(norms, pa.string()),
                "cand_rank": pa.array(ranks, pa.int32()),
                "entity_id": pa.array(ents, pa.string()),
                "uris_str": pa.array(uris_col, pa.string()),
            }
        )


def make_candidate_fn(dico_ref):
    """Task-pool candidate-gen fn; the index is fetched through the
    per-worker broadcast cache (no per-task rebuild)."""

    def gen(batch: pa.Table) -> pa.Table:
        worker = CandidateGen.__new__(CandidateGen)
        worker.index = get_broadcast(dico_ref)
        return worker(batch)

    return gen


def generate_candidates(mentions_ds, dico_ref, concurrency: int | tuple = (1, 4),
                        batch_size: int = 4096, actor_pool: bool = False):
    """mentions Dataset -> candidates Dataset.

    Task pool by default (elastic, index cached per worker process);
    ``actor_pool=True`` uses a CandidateGen actor pool instead (hard
    resource isolation at the cost of ramp-up)."""
    if actor_pool:
        return mentions_ds.map_batches(
            CandidateGen,
            fn_constructor_args=(dico_ref,),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=1,
        )
    return mentions_ds.map_batches(
        make_candidate_fn(dico_ref), batch_format="pyarrow", batch_size=batch_size
    )


class PackedCandidateGen:
    """Hot-path variant: emits ONE ROW PER URL with the url's candidate
    tuples pickled into a binary payload.

    The per-document linker shuffles on hash(url); packing collapses
    the shuffle from one row per (mention, candidate) to one row per
    page (~20x fewer rows through the sort) and hands the linker ready
    lists instead of per-row DataFrame iteration. A url whose mentions
    straddle a batch boundary yields multiple rows; the linker merges
    payloads per url. The row-form ``CandidateGen`` remains the API
    for reports/eval/joins.
    """

    def __init__(self, dico_ref):
        self.index = get_broadcast(dico_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pickle
        import zlib

        urls_out, hashes_out, payloads = [], [], []
        cur_url, cur_hash, cur_rows = None, 0, []

        def flush():
            if cur_rows:
                urls_out.append(cur_url)
                hashes_out.append(cur_hash)
                # zlib-1: ~4x smaller payloads through the link sort
                # (~74us/page to compress, amortized across workers) —
                # the sort-based shuffle is byte-bound, not row-bound
                payloads.append(zlib.compress(pickle.dumps(cur_rows, protocol=5), 1))

        has_hash = "url_hash" in batch.column_names
        hash_in = (
            batch.column("url_hash").to_pylist()
            if has_hash
            else [0] * batch.num_rows
        )
        for url, uh, mid, surface, norm in zip(
            batch.column("url").to_pylist(),
            hash_in,
            batch.column("mention_id").to_pylist(),
            batch.column("surface").to_pylist(),
            batch.column("surface_norm").to_pylist(),
        ):
            if url != cur_url:
                flush()
                cur_url, cur_hash, cur_rows = url, uh, []
            cands = self.index.get(norm)
            if not cands:
                continue
            seen: set[tuple[str, ...]] = set()
            rank = 0
            for entity_id, uris, _ne in cands:
                if uris in seen:
                    continue
                seen.add(uris)
                cur_rows.append((mid, surface, norm, rank, entity_id, list(uris)))
                rank += 1
                if rank >= MAX_CANDIDATES:
                    break
        flush()
        return pa.table(
            {
                "url": pa.array(urls_out, pa.string()),
                "url_hash": pa.array(hashes_out, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )


def generate_candidates_packed(mentions_ds, dico_ref, batch_size: int | None = None):
    """mentions Dataset -> packed per-url candidates (linker hot path).

    ``batch_size=None`` (default) packs WHOLE BLOCKS: the NER stage
    emits a page's mention rows contiguously within its output block,
    so whole-block packing yields exactly ONE packed row per url —
    which is what lets ``link_documents_packed(shuffle="none")`` skip
    the link sort entirely. Pass a row-count batch_size only when
    feeding the sort-based path (fragmented urls merge there)."""

    def gen(batch: pa.Table) -> pa.Table:
        worker = PackedCandidateGen.__new__(PackedCandidateGen)
        worker.index = get_broadcast(dico_ref)
        return worker(batch)

    return mentions_ds.map_batches(gen, batch_format="pyarrow", batch_size=batch_size)


def dictionary_with_order(dictionary_path: str):
    """Read the dictionary Parquet as a Dataset carrying an explicit
    ``dict_row`` file-order column and a flat ``uris_str`` column.

    ``dict_row`` is the determinism anchor for the join path: the
    broadcast index ranks candidates by dictionary-file order (the
    Lucene-hit order of the reference, DicoProcessingNEL.java:319), and
    join output order is NOT deterministic — carrying the order through
    the join and sorting on it makes both paths emit identical ranks.

    This function only runs when the dictionary is OVER the broadcast
    size gate, so the driver must never hold the data: it reads only
    the Parquet FOOTERS (per-row-group row counts, in sorted-file
    order) to compute each row group's global start offset, then loads
    the row groups in parallel tasks that mint ``dict_row`` from their
    offset — one narrow metadata scan on the driver regardless of
    dictionary size.
    """
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    import ray.data as rd

    from ..state.manifest import list_parquet_files

    files = [str(f) for f in list_parquet_files(dictionary_path)]
    items, offset = [], 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            n = md.row_group(rg).num_rows
            items.append({"path": f, "row_group": rg, "start": offset})
            offset += n

    def load(batch: pa.Table) -> pa.Table:
        out = []
        for path, rg, start in zip(batch["path"].to_pylist(),
                                   batch["row_group"].to_pylist(),
                                   batch["start"].to_pylist()):
            t = pq.ParquetFile(path).read_row_group(
                rg, columns=["surface_norm", "entity_id", "uris"])
            # no ne_type: the mention side carries its own (join would
            # collide); uris list -> flat string, vectorized
            out.append(pa.table({
                "surface_norm": t["surface_norm"].combine_chunks(),
                "entity_id": t["entity_id"].combine_chunks(),
                "uris_str": pc.binary_join(
                    t["uris"].combine_chunks(),
                    pa.scalar(" ", pa.string())),
                "dict_row": pa.array(
                    np.arange(start, start + t.num_rows), pa.int64()),
            }))
        return pa.concat_tables(out)

    return rd.from_items(items).map_batches(
        load, batch_size=1, batch_format="pyarrow")


def candidates_via_join(mentions_ds, dictionary_ds, num_partitions: int = 64,
                        num_buckets: int = 64):
    """Scale path: hash-partitioned equi-join on ``surface_norm`` (J1).

    For dictionaries too large to broadcast. Produces the same rows as
    ``CandidateGen``: after the join, rows re-bucket on the page axis
    (``url_hash`` when present — the linker's own bucketing key) and
    rank/D1-dedup/K2-cap VECTORIZED inside each bucket — no per-mention
    group dispatch, no ``iterrows``. ``dictionary_ds`` must carry
    ``dict_row`` + ``uris_str`` (see ``dictionary_with_order``) so
    candidate ranks are deterministic despite join-output order.
    """
    import pandas as pd

    joined = mentions_ds.join(
        dictionary_ds,
        join_type="inner",
        on=("surface_norm",),
        num_partitions=num_partitions,
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        from ..functions.bucket import add_bucket as bucket_arrow

        if "url_hash" in t.column_names:
            # url_hash is a precomputed non-negative 63-bit hash
            h = t["url_hash"].combine_chunks().to_numpy(zero_copy_only=False)
            return t.append_column("__bucket", pa.array(h % num_buckets, pa.int64()))
        return bucket_arrow(t, "url", num_buckets)

    out_cols = ["url", "url_hash", "mention_id", "surface", "surface_norm",
                "cand_rank", "entity_id", "uris_str"]

    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(columns=out_cols)
        if "url_hash" not in df.columns:
            df = df.assign(url_hash=0)
        df = df.sort_values(["url", "mention_id", "dict_row"], kind="stable")
        df = df.drop_duplicates(["url", "mention_id", "uris_str"])  # D1
        df = df.assign(
            cand_rank=df.groupby(["url", "mention_id"], sort=False).cumcount()
            .astype("int32"))
        df = df[df["cand_rank"] < MAX_CANDIDATES]  # K2 cap
        return df[out_cols]

    return (
        joined.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(rank_bucket, batch_format="pandas")
    )
