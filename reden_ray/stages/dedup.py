"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's exact dedups (D1-D5 — candidate-list dedup
DicoProcessingNEL.java:163-175, seen-URI dedup GraphHandlerNEL.java:55-67,
final-triple dedup), this module provides the near-dup family a 100 TB
text pipeline needs. All are expressed Ray-Data-first and NOTHING
materializes O(corpus) state on the driver:

* exact_dedup_by_key — hash-partitioned groupby + first (per-batch
  combiner first, so the shuffle moves at most |distinct| rows/batch).
* minhash_lsh_clusters — shingle -> minhash -> band -> bucket groupby
  -> candidate-pair Dataset -> distributed text attach (semi-join +
  two hash joins) -> pair verify -> distributed connected components.
* simhash_clusters — 64-bit simhash, Hamming<=k via 4-band exact
  blocking; the full hash rides along in the band rows so verification
  happens INSIDE the bucket group (payload co-located, no second pass).
* ngram_jaccard_clusters — min-ngram-hash blocking over (doc_id,
  bucket) int rows only; texts attach to candidate pairs via the same
  semi-join shape as minhash, exact word-ngram Jaccard verifies the
  pairs vectorized.
* embedding_dedup_clusters — cosine near-dup over an embedding column
  (random-hyperplane LSH buckets; exact cosine verify in-bucket with a
  vectorized matmul).

Every ``*_clusters`` returns a ``(id, cluster)`` **Dataset** where
cluster = the MINIMUM doc id of the duplicate component (deterministic;
computed by iterative min-label propagation, stages/cc.py). ``*_dedup``
variants drop non-representatives via a hash-partitioned
``Dataset.join(..., "left_anti")`` — no driver-side doomed set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.text import (
    char_shingles,
    hamming64,
    jaccard,
    minhash_params,
    minhash_signature,
    shingle_hashes64,
    simhash64,
    simhash64_batch,
    word_ngrams,
)
from ..functions.bucket import add_bucket as add_bucket_arrow
from .cc import connected_components

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_by_key(ds, key_cols: list[str], id_col: str):
    """Keep the min-``id_col`` row per distinct ``key_cols`` value.

    Per-batch combiner (pa.Table.group_by min) then hash-partitioned
    groupby — the shuffle moves pre-reduced rows only.
    """

    def combine(batch: pa.Table) -> pa.Table:
        out = batch.group_by(key_cols).aggregate([(id_col, "min")])
        # rename the aggregate column BY NAME (pyarrow emits
        # '<col>_min'); positional renames depend on key-column order,
        # which is not contractual across pyarrow versions.
        return out.rename_columns(
            [id_col if c == f"{id_col}_min" else c for c in out.column_names]
        ).select([*key_cols, id_col])

    pre = ds.select_columns([*key_cols, id_col]).map_batches(combine, batch_format="pyarrow")

    def final_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized min per key within the bucket — no per-key dispatch
        return df.groupby(key_cols, as_index=False)[id_col].min()

    bucketed = pre.map_batches(
        lambda t: add_bucket_arrow(t, key_cols[0], 64), batch_format="pyarrow")
    return bucketed.groupby("__bucket").map_groups(final_bucket, batch_format="pandas")


# ---------------------------------------------------------------------------
# Candidate-pair generation shared by the near-dup family
# ---------------------------------------------------------------------------


def _pairs_frame(recs: list[tuple[int, int]]) -> pd.DataFrame:
    out = pd.DataFrame(recs, columns=["a", "b"])
    return out.astype({"a": "int64", "b": "int64"})


def grouped_pairs(rows_ds, group_cols: list[str], hash_col: str,
                  pair_fn, num_buckets: int = 128):
    """Candidate-pair Dataset from exact-match groups, hash-bucketed.

    Shuffles on hash(hash_col) % num_buckets (equal groups share their
    hash column, hence a bucket), then loops the bucket's groups in
    plain pandas — Ray never dispatches per tiny group. ``pair_fn(g)``
    returns ``[(a, b), ...]`` — or ``([(a, b), ...], n_dropped)`` when
    the fn capped its group's membership — for one group's frame;
    because the group frame carries the blocking payload, pair_fn can
    VERIFY in place. Returns a Dataset with int64 columns ``a``, ``b``
    (may contain duplicates across groups — downstream CC tolerates
    them; dedup with ``distinct_pairs`` when verification per pair is
    expensive). Groups that reported dropped members emit a MARKER row
    ``(a=-1, b=n_dropped)``; route the output through
    ``_strip_truncation_markers`` before CC / distinct_pairs.

    Because the marker is in-band (shares the pair schema), doc ids
    MUST be non-negative — a corpus with negative ids would have real
    pairs silently stripped as markers. Enforced here, vectorized, at
    the one choke point every near-dup entry point flows through.
    """

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if "doc_id" in df.columns and len(df) and (df["doc_id"] < 0).any():
            bad = int(df.loc[df["doc_id"] < 0, "doc_id"].iloc[0])
            raise ValueError(
                f"near-dup blocking requires non-negative doc ids (got {bad}): "
                "(a=-1, b=n) rows are reserved as truncation markers — "
                "remap ids to >= 0 before dedup")
        recs: list[tuple[int, int]] = []
        for _, g in df.groupby(group_cols, sort=False):
            if len(g) < 2:
                continue
            r = pair_fn(g)
            pairs, dropped = r if isinstance(r, tuple) else (r, 0)
            recs.extend(pairs)
            if dropped:
                recs.append((-1, dropped))
        return _pairs_frame(recs)

    bucketed = rows_ds.map_batches(
        lambda t: add_bucket_arrow(t, hash_col, num_buckets, out="__b"),
        batch_format="pyarrow")
    return bucketed.groupby("__b").map_groups(bucket_pairs, batch_format="pandas")


def _strip_truncation_markers(pairs_ds, stats: dict | None = None):
    """Remove ``(a=-1, b=n_dropped)`` truncation markers from a pair
    Dataset. NEVER silent: workers log a warning per batch containing
    markers; with a ``stats`` dict the caller additionally gets exact
    totals (``truncated_buckets``, ``dropped_rows``) — that path
    materializes the pairs (they are cap-bounded, not corpus-sized)."""
    if stats is not None:
        pairs_ds = pairs_ds.materialize()
        mk = pairs_ds.map_batches(
            lambda t: t.filter(pc.less(t.column("a"), 0)),
            batch_format="pyarrow",
        ).to_pandas()
        stats["truncated_buckets"] = int(len(mk))
        stats["dropped_rows"] = int(mk["b"].sum()) if len(mk) else 0

    def strip(t: pa.Table) -> pa.Table:
        mask = pc.less(t.column("a"), 0)
        n = pc.sum(mask).as_py() or 0
        if n:
            import logging

            dropped = pc.sum(
                pc.if_else(mask, t.column("b"), pa.scalar(0, pa.int64()))
            ).as_py()
            logging.getLogger(__name__).warning(
                "near-dup blocking: %d bucket(s) over max_bucket, "
                "%d member row(s) not paired (raise max_bucket or add bands)",
                n, dropped)
        return t.filter(pc.invert(mask))

    return pairs_ds.map_batches(strip, batch_format="pyarrow")


def distinct_pairs(pairs_ds, num_buckets: int = 64):
    """Exact (a, b) dedup — combiner + hash-bucket shuffle."""

    def combine(t: pa.Table) -> pa.Table:
        return t.select(["a", "b"]).group_by(["a", "b"]).aggregate([])

    pre = pairs_ds.map_batches(combine, batch_format="pyarrow")

    return (
        pre.map_batches(lambda t: add_bucket_arrow(t, "a", num_buckets, out="__b"),
                        batch_format="pyarrow")
        .groupby("__b")
        .map_groups(lambda df: df.drop_duplicates(["a", "b"])[["a", "b"]],
                    batch_format="pandas")
    )


def _clusters_from_pairs(pairs_ds, id_col: str):
    """Verified pair Dataset -> (id_col, cluster) Dataset.

    Row order is unspecified (content is deterministic); consumers that
    need an ordering sort the — much smaller — cluster table themselves
    rather than paying a global sort here."""
    cc = connected_components(pairs_ds)
    return cc.map_batches(
        lambda t: pa.table({id_col: t.column("node"), "cluster": t.column("cluster")}),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


class MinHashSignatures:
    """Stateful stage: (id, text) batches -> one row per (doc, band)
    with the band signature bytes. Permutation params built once per
    worker."""

    def __init__(self, id_col: str, text_col: str, num_perm: int, bands: int,
                 shingle_k: int, seed: int = 7, with_content_hash: bool = False):
        assert num_perm % bands == 0
        self.id_col, self.text_col = id_col, text_col
        self.num_perm, self.bands = num_perm, bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k
        self.with_content_hash = with_content_hash
        self.a, self.b = minhash_params(num_perm, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        ids, bands, sigs, chashes = [], [], [], []
        for doc_id, text in zip(
            batch.column(self.id_col).to_pylist(),
            batch.column(self.text_col).to_pylist(),
        ):
            sig = minhash_signature(shingle_hashes64(text, self.shingle_k),
                                    self.a, self.b)
            ch = (hashlib.blake2b(text.encode("utf-8"), digest_size=16).digest()
                  if self.with_content_hash else b"")
            for band in range(self.bands):
                chunk = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                ids.append(doc_id)
                bands.append(band)
                sigs.append(chunk.tobytes())
                if self.with_content_hash:
                    chashes.append(ch)
        cols = {
            "doc_id": pa.array(ids, pa.int64()),
            "band": pa.array(bands, pa.int32()),
            "sig": pa.array(sigs, pa.binary()),
        }
        if self.with_content_hash:
            cols["chash"] = pa.array(chashes, pa.binary())
        return pa.table(cols)


def _attach_pair_texts(pairs_ds, ds, id_col: str, text_col: str,
                       num_partitions: int = 8,
                       broadcast_id_limit: int = 5_000_000,
                       broadcast_text_bytes: int = 512 << 20):
    """pairs (a, b) + docs -> (a, b, text_a, text_b).

    Size-gated like every small-side attach in this repo:

    * endpoint-id set under ``broadcast_id_limit`` rows (int64s — the
      default gate is 40 MB): the corpus is filtered MAP-SIDE against
      the broadcast id set instead of a semi-join shuffle;
    * the filtered candidate texts under ``broadcast_text_bytes``:
      texts attach map-side from a broadcast dict — zero exchanges on
      the pair stream;
    * above either gate the fully-distributed fallback runs: semi-join
      the corpus down to candidate endpoints, then hash-join the
      candidate-text table onto each pair side.

    Endpoint counts are bounded by the banding pair caps, so the
    broadcast path is the common case; a pathological corpus (tens of
    millions of near-dup candidates) degrades to the join path, never
    to a driver OOM.
    """
    import numpy as np

    import ray

    from ..functions.blocks import pin_nonempty
    from ..state.broadcast import get_broadcast
    from .canonicalize import exact_dedup

    endpoints_a = pairs_ds.map_batches(
        lambda t: pa.table({id_col: t.column("a")}), batch_format="pyarrow")
    endpoints_b = pairs_ds.map_batches(
        lambda t: pa.table({id_col: t.column("b")}), batch_format="pyarrow")
    # pin_nonempty: exact_dedup's map_groups can emit schema-less empty
    # blocks that break the semi-join's key resolution (see blocks.py)
    endpoints = pin_nonempty(exact_dedup(endpoints_a.union(endpoints_b), [id_col]))

    if endpoints.count() <= broadcast_id_limit:
        ids = np.sort(endpoints.to_pandas()[id_col].to_numpy().astype("int64"))
        id_ref = ray.put(ids)

        def flt(t: pa.Table) -> pa.Table:
            keep = np.isin(
                t.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False),
                get_broadcast(id_ref))
            return t.filter(pa.array(keep))

        cand_docs = pin_nonempty(
            ds.select_columns([id_col, text_col]).map_batches(
                flt, batch_format="pyarrow"))
        if cand_docs.size_bytes() <= broadcast_text_bytes:
            # Arrow-native broadcast attach (ADVICE r04): the candidate
            # texts stay an Arrow (sorted-id array, text array) pair —
            # never a driver-side Python dict (which roughly doubled
            # the footprint and deserialized per worker). ray.put of
            # Arrow/numpy buffers is plasma-backed: one shared-memory
            # copy per NODE, zero-copy views in every worker. Lookup is
            # vectorized searchsorted + take, no per-row Python.
            tbl = pa.concat_tables(
                ray.get(cand_docs.to_arrow_refs())).combine_chunks()
            ids_arr = tbl[id_col].cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            order = np.argsort(ids_arr, kind="stable")
            sid_ref = ray.put(ids_arr[order])
            txt_ref = ray.put(
                tbl[text_col].take(pa.array(order)).combine_chunks())

            def attach(t: pa.Table) -> pa.Table:
                sid = get_broadcast(sid_ref)
                txt = get_broadcast(txt_ref)

                def locate(col) -> tuple[np.ndarray, np.ndarray]:
                    v = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
                    if len(sid) == 0:
                        return (np.zeros(len(v), np.int64),
                                np.zeros(len(v), bool))
                    pos = np.searchsorted(sid, v)
                    pos_c = np.minimum(pos, len(sid) - 1)
                    return pos_c, (pos < len(sid)) & (sid[pos_c] == v)

                pos_a, ok_a = locate(t.column("a"))
                pos_b, ok_b = locate(t.column("b"))
                # inner-join parity: drop pairs whose endpoint is not
                # in the corpus (cannot happen for pairs derived from
                # it, but the join path would drop them)
                keep = ok_a & ok_b
                t2 = t.filter(pa.array(keep))
                return pa.table({
                    "a": t2.column("a"),
                    "b": t2.column("b"),
                    "text_a": txt.take(pa.array(pos_a[keep])),
                    "text_b": txt.take(pa.array(pos_b[keep])),
                })

            return pairs_ds.map_batches(attach, batch_format="pyarrow")
    else:
        # candidate texts are bounded by the banding pair caps — pin
        # them so the two attach joins don't re-run the semi-join
        # lineage (and so a single streaming plan never stacks 3
        # all-to-all ops + join aggregators, which can starve a small
        # CPU budget).
        cand_docs = pin_nonempty(
            ds.select_columns([id_col, text_col]).join(
                endpoints, join_type="left_semi", num_partitions=num_partitions,
                on=(id_col,),
            )
        )

    ta = cand_docs.map_batches(
        lambda t: pa.table({"a": t.column(id_col).cast(pa.int64()),
                            "text_a": t.column(text_col)}),
        batch_format="pyarrow")
    tb = cand_docs.map_batches(
        lambda t: pa.table({"b": t.column(id_col).cast(pa.int64()),
                            "text_b": t.column(text_col)}),
        batch_format="pyarrow")
    # pin between the two joins: a single streaming plan with two
    # concurrent hash-shuffle aggregator pools can starve a small CPU
    # budget; the pinned side is pair-sized (bounded), not corpus-sized.
    j = pin_nonempty(pairs_ds.join(ta, join_type="inner",
                                   num_partitions=num_partitions, on=("a",)))
    return j.join(tb, join_type="inner", num_partitions=num_partitions, on=("b",))


def minhash_lsh_clusters(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.7,
    verify: str = "jaccard",
    concurrency: int | tuple = (1, 4),
    max_bucket: int = 200,
    stats: dict | None = None,
):
    """Returns a (id_col, cluster) Dataset for docs in near-dup clusters.

    ``max_bucket`` caps per-bucket membership (skew armor against hot
    bands from boilerplate text: pairing is O(n^2) per bucket). Capped
    buckets are REPORTED, never silent — workers log a warning, and a
    caller-supplied ``stats`` dict receives exact
    ``truncated_buckets`` / ``dropped_rows`` totals.

    shingle -> minhash -> (band, sig) groupby (the LSH bucket shuffle)
    -> verified candidate-pair Dataset -> distributed connected
    components.

    ``verify="exact"`` keeps content-identical texts only (exact dedup
    routed through the LSH plumbing — recall 1.0 since identical docs
    collide in every band, and SQL-recomputable for the oracle gate).
    A 128-bit content hash rides in the band rows, so verification
    happens INSIDE the bucket group — no second pass over the corpus.

    ``verify="jaccard"`` keeps pairs with true shingle-Jaccard >=
    threshold (near-dup). Texts are too big to ride per-band rows, so
    the pair endpoints' texts are co-located distributedly: semi-join
    the corpus down to candidate docs, then two hash joins attach
    text_a/text_b; verification is a vectorized pass over the pairs.
    """
    exact = verify == "exact"

    def sig_rows(batch: pa.Table) -> pa.Table:
        worker = MinHashSignatures(id_col, text_col, num_perm, bands, shingle_k,
                                   with_content_hash=exact)
        return worker(batch)

    sigs = ds.map_batches(sig_rows, batch_format="pyarrow")

    if exact:
        # in-bucket verification on the co-located content hash
        def equal_hash_pairs(g: pd.DataFrame):
            items = sorted(zip(g["doc_id"], g["chash"]))
            dropped = max(0, len(items) - max_bucket)
            items = items[:max_bucket]
            return [
                (items[i][0], items[j][0])
                for i in range(len(items)) for j in range(i + 1, len(items))
                if items[i][1] == items[j][1]
            ], dropped

        verified = _strip_truncation_markers(
            grouped_pairs(sigs, ["band", "sig"], "sig", equal_hash_pairs), stats)
        return _clusters_from_pairs(verified, id_col)

    def all_pairs(g: pd.DataFrame):
        ids = sorted(g["doc_id"].tolist())
        dropped = max(0, len(ids) - max_bucket)
        ids = ids[:max_bucket]
        return ([(ids[i], ids[j]) for i in range(len(ids))
                 for j in range(i + 1, len(ids))], dropped)

    # dedup before verification: the same pair collides in many bands.
    # Pairs are bounded (banding caps) and fan out to three consumers
    # (two endpoint projections + the attach join) — pin them once,
    # dropping the schema-less empty groupby blocks that would
    # otherwise break join key resolution downstream (see blocks.py).
    from ..functions.blocks import pin_nonempty

    pairs = pin_nonempty(distinct_pairs(
        _strip_truncation_markers(
            grouped_pairs(sigs, ["band", "sig"], "sig", all_pairs), stats)
    ))
    if pairs.count() == 0:  # no candidates anywhere: skip the joins
        import ray.data as rd

        return rd.from_arrow(pa.table({id_col: pa.array([], pa.int64()),
                                       "cluster": pa.array([], pa.int64())}))
    with_texts = _attach_pair_texts(pairs, ds, id_col, text_col)

    def check(t: pa.Table) -> pa.Table:
        out_a, out_b = [], []
        # endpoints repeat across pairs (a near-dup doc collides with
        # its whole cluster): shingle each distinct endpoint once per
        # batch, keyed by id
        memo: dict[int, set] = {}

        def sh(doc, text):
            s = memo.get(doc)
            if s is None:
                s = memo[doc] = char_shingles(text, shingle_k)
            return s

        for a, b, x, y in zip(
            t.column("a").to_pylist(), t.column("b").to_pylist(),
            t.column("text_a").to_pylist(), t.column("text_b").to_pylist(),
        ):
            if jaccard(sh(a, x), sh(b, y)) >= threshold:
                out_a.append(a)
                out_b.append(b)
        return pa.table({"a": pa.array(out_a, pa.int64()),
                         "b": pa.array(out_b, pa.int64())})

    verified = with_texts.map_batches(check, batch_format="pyarrow")
    return _clusters_from_pairs(verified, id_col)


def drop_duplicates_by_clusters(ds, clusters_ds, id_col: str,
                                num_partitions: int = 8):
    """Dataset minus cluster non-representatives (keep min-id rep):
    hash-partitioned anti-join; no driver-side doomed set."""
    doomed = clusters_ds.map_batches(
        lambda t: t.filter(pc.not_equal(t.column(id_col), t.column("cluster")))
        .select([id_col]),
        batch_format="pyarrow",
    )
    # pin_nonempty: drop the schema-less empty groupby/sort output
    # blocks (they break the join's key resolution — see blocks.py) and
    # pin so the cluster lineage doesn't re-run inside the join plan.
    from ..functions.blocks import pin_nonempty

    doomed = pin_nonempty(doomed)
    if doomed.count() == 0:  # no dups: Ray joins can't take an empty side
        return ds
    return ds.join(doomed, join_type="left_anti",
                   num_partitions=num_partitions, on=(id_col,))


def minhash_dedup(ds, id_col="doc_id", text_col="text", **kw):
    """Dataset minus near-duplicates (keep min-id representative)."""
    clusters = minhash_lsh_clusters(ds, id_col, text_col, **kw)
    return drop_duplicates_by_clusters(ds, clusters, id_col)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_clusters(
    ds, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3,
    max_bucket: int = 200, stats: dict | None = None,
):
    """Near-dup clusters by 64-bit SimHash with Hamming <= max_hamming.

    Blocking: split the 64-bit hash into 4 16-bit bands; two docs within
    Hamming 3 share at least one exact band (pigeonhole). Bucket
    groupby on (band, value); the full hash rides in the band rows, so
    the exact-Hamming verify happens inside the bucket group.
    ``max_bucket`` caps per-bucket membership; truncation is logged and
    totalled into ``stats`` when given (see minhash_lsh_clusters).
    Returns a (id_col, cluster) Dataset.
    """

    def sim_rows(batch: pa.Table) -> pa.Table:
        import numpy as np

        hs = simhash64_batch(batch.column(text_col).to_pylist())
        n = len(hs)
        ids = np.repeat(
            batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64), 4)
        h_rep = np.repeat(hs, 4)
        bands = np.tile(np.arange(4, dtype=np.uint64), n)
        vals = (h_rep >> (bands * np.uint64(16))) & np.uint64(0xFFFF)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "band": pa.array(bands.astype(np.int32), pa.int32()),
                "val": pa.array(vals.astype(np.int32), pa.int32()),
                "h": pa.array(h_rep, pa.uint64()),
            }
        )

    rows = ds.map_batches(sim_rows, batch_format="pyarrow")

    def hamming_pairs(g: pd.DataFrame):
        items = sorted(zip(g["doc_id"], g["h"]))
        dropped = max(0, len(items) - max_bucket)
        items = items[:max_bucket]
        out = []
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                (a, ha), (b, hb) = items[i], items[j]
                if hamming64(int(ha), int(hb)) <= max_hamming:
                    out.append((a, b))
        return out, dropped

    pairs = _strip_truncation_markers(
        grouped_pairs(rows, ["band", "val"], "val", hamming_pairs), stats)
    return _clusters_from_pairs(pairs, id_col)


# ---------------------------------------------------------------------------
# Word-ngram Jaccard
# ---------------------------------------------------------------------------


def ngram_jaccard_clusters(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    blocks: int = 4,
    max_bucket: int = 200,
    stats: dict | None = None,
):
    """Blocking on the ``blocks`` SMALLEST word-ngram hashes (each doc
    lands in up to ``blocks`` buckets). Multi-min blocking fixes the
    single-min recall fragility: two docs that differ by up to
    ``blocks - 1`` n-grams are GUARANTEED to share a bucket, and docs
    with Jaccard j share one with prob ~1-(1-j)^blocks.

    The blocking shuffle moves ONLY (doc_id, bucket) int64 rows — 16
    bytes x ``blocks`` per doc, never the text (which an earlier
    version replicated x ``blocks`` through the all-to-all). Candidate
    pairs then get their texts attached by the same distributed
    semi-join + two hash joins the minhash path uses, and exact
    word-ngram Jaccard verifies vectorized over the pair rows.
    ``max_bucket`` caps per-bucket membership; truncation is logged and
    totalled into ``stats`` when given.
    Returns a (id_col, cluster) Dataset."""

    def block_rows(batch: pa.Table) -> pa.Table:
        ids, buckets = [], []
        for doc_id, text in zip(
            batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
        ):
            grams = word_ngrams(text, n)
            hashes = sorted(hash_tuple(g) & 0xFFFF_FFFF for g in grams)[:blocks] or [0]
            for h in hashes:
                ids.append(doc_id)
                buckets.append(h)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "bucket": pa.array(buckets, pa.int64()),
            }
        )

    rows = ds.map_batches(block_rows, batch_format="pyarrow")

    def all_pairs(g: pd.DataFrame):
        ids = sorted(g["doc_id"].tolist())
        dropped = max(0, len(ids) - max_bucket)
        ids = ids[:max_bucket]
        return ([(ids[i], ids[j]) for i in range(len(ids))
                 for j in range(i + 1, len(ids))], dropped)

    from ..functions.blocks import pin_nonempty

    pairs = pin_nonempty(distinct_pairs(
        _strip_truncation_markers(
            grouped_pairs(rows, ["bucket"], "bucket", all_pairs), stats)
    ))
    if pairs.count() == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({id_col: pa.array([], pa.int64()),
                                       "cluster": pa.array([], pa.int64())}))
    with_texts = _attach_pair_texts(pairs, ds, id_col, text_col)

    def check(t: pa.Table) -> pa.Table:
        out_a, out_b = [], []
        memo: dict[int, set] = {}  # n-gram each distinct endpoint once

        def ng(doc, text):
            s = memo.get(doc)
            if s is None:
                s = memo[doc] = word_ngrams(text, n)
            return s

        for a, b, x, y in zip(
            t.column("a").to_pylist(), t.column("b").to_pylist(),
            t.column("text_a").to_pylist(), t.column("text_b").to_pylist(),
        ):
            if jaccard(ng(a, x), ng(b, y)) >= threshold:
                out_a.append(a)
                out_b.append(b)
        return pa.table({"a": pa.array(out_a, pa.int64()),
                         "b": pa.array(out_b, pa.int64())})

    verified = with_texts.map_batches(check, batch_format="pyarrow")
    return _clusters_from_pairs(verified, id_col)


def hash_tuple(t: tuple) -> int:
    """Stable (process-independent) hash of a word tuple."""
    import hashlib

    return int.from_bytes(
        hashlib.blake2b(" ".join(t).encode("utf-8"), digest_size=8).digest(), "big"
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_dedup_clusters(
    ds,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 11,
    max_bucket: int = 500,
    stats: dict | None = None,
):
    """Cosine near-dup via random-hyperplane LSH buckets + exact verify.

    Two near-identical vectors land in the same sign-pattern bucket with
    high probability; exact cosine runs only within buckets (vectorized
    numpy matmul per bucket). ``max_bucket`` caps per-bucket membership;
    truncation is logged and totalled into ``stats`` when given.
    Returns a (id_col, cluster) Dataset.
    """

    def bucket_rows(batch: pa.Table) -> pa.Table:
        from .similarity import _as_matrix

        vecs = (_as_matrix(batch, vec_col) if batch.num_rows
                else np.empty((0, 0), dtype=np.float32))
        if vecs.size == 0:
            return pa.table({"vid": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64()),
                             "vec": pa.array([], pa.list_(pa.float32()))})
        rng = np.random.RandomState(seed)
        planes = rng.randn(vecs.shape[1], n_planes).astype(np.float32)
        signs = (vecs @ planes) > 0
        buckets = (signs * (1 << np.arange(n_planes))).sum(axis=1)
        return pa.table(
            {
                "vid": batch.column(id_col).cast(pa.int64()),
                "bucket": pa.array(buckets.astype("int64"), pa.int64()),
                "vec": batch.column(vec_col),
            }
        )

    rows = ds.map_batches(bucket_rows, batch_format="pyarrow")

    def cosine_pairs(g: pd.DataFrame):
        items = sorted(zip(g["vid"], g["vec"]))
        dropped = max(0, len(items) - max_bucket)
        items = items[:max_bucket]
        if len(items) < 2:
            return [], dropped
        ids = np.fromiter((int(i) for i, _ in items), dtype=np.int64,
                          count=len(items))
        m = np.array([list(v) for _, v in items], dtype=np.float32)
        m = m / (np.linalg.norm(m, axis=1, keepdims=True) + 1e-12)
        sims = m @ m.T
        iu, ju = np.nonzero(np.triu(sims >= threshold, k=1))
        out = list(zip(ids[iu].tolist(), ids[ju].tolist()))
        return out, dropped

    pairs = _strip_truncation_markers(
        grouped_pairs(rows, ["bucket"], "bucket", cosine_pairs), stats)
    return _clusters_from_pairs(pairs, id_col)


# ---------------------------------------------------------------------------
# Quality-aware cluster collapse (keep the BEST member, not the min id)
# ---------------------------------------------------------------------------


def keep_best_per_cluster(clusters_ds, quality_ds, quality_col: str,
                          id_col: str = "doc_id",
                          num_buckets: int = 64,
                          num_partitions: int = 8):
    """Collapse near-dup clusters keeping the HIGHEST-quality member.

    Production curation pipelines (FineWeb, Gopher) do not keep an
    arbitrary representative of a near-dup cluster — they keep the
    best one under a quality signal and drop the rest. This operator
    takes any ``(id, cluster)`` Dataset from the ``*_clusters`` family
    plus a ``(id, quality)`` Dataset and returns one row per cluster:
    ``(cluster, keep_id, <quality_col>)`` where ``keep_id`` is the
    member with the maximum quality, ties broken by MINIMUM id
    (deterministic, matching the min-label convention of cc.py).

    Scale shape (100 TB): the quality attach is a hash join on the id
    (both sides project to 2-3 int64 columns first — no text moves);
    the per-cluster argmax is COMBINER-FIRST — every block reduces to
    at most one candidate row per cluster before the single bucketed
    exchange, so a million-member boilerplate cluster ships one
    3-int64 row per block, never its membership.
    """
    from ..functions.blocks import pin_nonempty

    clusters2 = clusters_ds.map_batches(
        lambda t: pa.table({id_col: t.column(id_col).cast(pa.int64()),
                            "cluster": t.column("cluster").cast(pa.int64())}),
        batch_format="pyarrow")
    qual2 = quality_ds.map_batches(
        lambda t: pa.table({id_col: t.column(id_col).cast(pa.int64()),
                            quality_col: t.column(quality_col).cast(pa.int64())}),
        batch_format="pyarrow")
    joined = pin_nonempty(clusters2.join(
        qual2, join_type="inner", num_partitions=num_partitions,
        on=(id_col,)))

    def best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cluster", quality_col, id_col],
                            ascending=[True, False, True], kind="stable")
        out = df.groupby("cluster", as_index=False).head(1)
        return out[["cluster", id_col, quality_col]]

    # per-block combiner: >=1 candidate per (cluster, block) survives
    partials = joined.map_batches(best, batch_format="pandas")
    bucketed = partials.map_batches(
        lambda t: add_bucket_arrow(t, "cluster", num_buckets),
        batch_format="pyarrow")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = best(df).rename(columns={id_col: "keep_id"})
        return out[["cluster", "keep_id", quality_col]]

    return bucketed.groupby("__bucket").map_groups(final, batch_format="pandas")


def keep_topk_per_cluster(clusters_ds, quality_ds, quality_col: str,
                          k: int, id_col: str = "doc_id",
                          num_buckets: int = 64,
                          num_partitions: int = 8):
    """The dedup-BUDGET generalization of ``keep_best_per_cluster``:
    keep the top ``k`` members of each near-dup cluster under the
    quality signal (quality desc, id asc — the same deterministic
    order), emitting ``(cluster, keep_id, <quality_col>, rnk)`` with
    ``rnk`` 1..k. k=1 degenerates to keep-best. Some curation recipes
    keep a small budget per cluster rather than a single exemplar to
    preserve benign template variation.

    Same combiner-first bound as keep-best, scaled by k: every block
    reduces to at most k candidate rows per cluster before the single
    bucketed exchange (top-k of a union == top-k of per-block top-k's,
    the q61 bottom-k argument), so a million-member cluster ships
    k x n_blocks pre-reduced 3-int64 rows, never its membership."""
    from ..functions.blocks import pin_nonempty

    clusters2 = clusters_ds.map_batches(
        lambda t: pa.table({id_col: t.column(id_col).cast(pa.int64()),
                            "cluster": t.column("cluster").cast(pa.int64())}),
        batch_format="pyarrow")
    qual2 = quality_ds.map_batches(
        lambda t: pa.table({id_col: t.column(id_col).cast(pa.int64()),
                            quality_col: t.column(quality_col).cast(pa.int64())}),
        batch_format="pyarrow")
    joined = pin_nonempty(clusters2.join(
        qual2, join_type="inner", num_partitions=num_partitions,
        on=(id_col,)))

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cluster", quality_col, id_col],
                            ascending=[True, False, True], kind="stable")
        return df.groupby("cluster", as_index=False).head(k)

    partials = joined.map_batches(topk, batch_format="pandas")
    bucketed = partials.map_batches(
        lambda t: add_bucket_arrow(t, "cluster", num_buckets),
        batch_format="pyarrow")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = topk(df).rename(columns={id_col: "keep_id"})
        out["rnk"] = out.groupby("cluster").cumcount().astype("int64") + 1
        return out[["cluster", "keep_id", quality_col, "rnk"]]

    return bucketed.groupby("__bucket").map_groups(final,
                                                   batch_format="pandas")
