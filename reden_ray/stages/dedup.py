"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's exact dedups (D1-D5 — candidate-list dedup
DicoProcessingNEL.java:163-175, seen-URI dedup GraphHandlerNEL.java:55-67,
final-triple dedup), this module provides the near-dup family a 100 TB
text pipeline needs. All are expressed Ray-Data-first:

* exact_dedup_by_key — hash-partitioned groupby + first (per-batch
  combiner first, so the shuffle moves at most |distinct| rows/batch).
* minhash_lsh_dedup — shingle -> minhash -> band -> bucket groupby ->
  candidate pairs -> Jaccard verify -> connected components.
* simhash_dedup — 64-bit simhash, Hamming<=k via 4-band exact blocking.
* ngram_jaccard_dedup — word-ngram Jaccard inside cheap blocking buckets.
* embedding_dedup — cosine near-dup over an embedding column
  (LSH random-hyperplane bucketing; exact cosine verify inside bucket).

Cluster representative = the MINIMUM doc id in the duplicate cluster
(deterministic). Candidate-pair sets are bounded by banding; the final
union-find over surviving pairs runs on the driver — pairs, not docs,
so this is safe whenever near-dup rate is sane; the connected-components
label-propagation alternative for adversarial inputs is documented in
the docstring of ``_connected_components``.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.text import (
    char_shingles,
    hamming64,
    jaccard,
    minhash_params,
    minhash_signature,
    simhash64,
    word_ngrams,
)

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
        return out.rename_columns([*key_cols, id_col])

    pre = ds.select_columns([*key_cols, id_col]).map_batches(combine, batch_format="pyarrow")

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bucket"] = (
            pd.util.hash_pandas_object(df[key_cols[0]], index=False) % 64
        ).astype("int64")
        return df

    def final_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized min per key within the bucket — no per-key dispatch
        return df.groupby(key_cols, as_index=False)[id_col].min()

    bucketed = pre.map_batches(add_bucket, batch_format="pandas")
    return bucketed.groupby("__bucket").map_groups(final_bucket, batch_format="pandas")


# ---------------------------------------------------------------------------
# Pair verification + clustering shared by the near-dup family
# ---------------------------------------------------------------------------


def _connected_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find over candidate pairs -> {doc_id: cluster_rep(min id)}.

    Driver-side on the PAIR set (bounded by banding). At adversarial
    duplicate rates, replace with distributed min-label propagation:
    iterate ``edges.groupby(node).aggregate(Min(label))`` until fixed
    point — same output, no driver state.
    """
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _pairs_from_buckets(bucket_members: pd.DataFrame, id_col: str, max_bucket: int = 200):
    """Emit unique candidate pairs from each bucket (cap guards skew)."""
    seen: set[tuple[int, int]] = set()
    for _, g in bucket_members.groupby("bucket", sort=False):
        ids = sorted(g[id_col].tolist())[:max_bucket]
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                seen.add((ids[i], ids[j]))
    return seen


def grouped_pairs(rows_ds, group_cols: list[str], hash_col: str,
                  pair_fn, num_buckets: int = 128):
    """Candidate pairs from exact-match groups, hash-bucketed.

    Shuffles on hash(hash_col) % num_buckets (equal groups share their
    hash column, hence a bucket), then loops the bucket's groups in
    plain pandas — Ray never dispatches per tiny group. ``pair_fn(g)``
    returns [(a, b), ...] for one group's frame.
    """

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b"] = (
            pd.util.hash_pandas_object(df[hash_col], index=False) % num_buckets
        ).astype("int64")
        return df

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        recs: list[dict] = []
        for _, g in df.groupby(group_cols, sort=False):
            if len(g) < 2:
                continue
            for a, b in pair_fn(g):
                recs.append({"a": a, "b": b})
        return pd.DataFrame(recs, columns=["a", "b"])

    bucketed = rows_ds.map_batches(add_bucket, batch_format="pandas")
    pairs_ds = bucketed.groupby("__b").map_groups(bucket_pairs, batch_format="pandas")
    # to_pandas (vectorized block concat), NOT take_all: row-wise
    # materialization of pandas blocks costs ~0.5 ms/row.
    df = pairs_ds.to_pandas()
    if df.empty or "a" not in df.columns:  # all-empty blocks lose names
        return set()
    return set(zip(df["a"].tolist(), df["b"].tolist()))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


class MinHashSignatures:
    """Actor-pool stage: (id, text) batches -> one row per (doc, band)
    with the band signature bytes. Permutation params built once per
    actor in __init__."""

    def __init__(self, id_col: str, text_col: str, num_perm: int, bands: int,
                 shingle_k: int, seed: int = 7):
        assert num_perm % bands == 0
        self.id_col, self.text_col = id_col, text_col
        self.num_perm, self.bands = num_perm, bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k
        self.a, self.b = minhash_params(num_perm, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, bands, sigs = [], [], []
        for doc_id, text in zip(
            batch.column(self.id_col).to_pylist(),
            batch.column(self.text_col).to_pylist(),
        ):
            sig = minhash_signature(char_shingles(text, self.shingle_k), self.a, self.b)
            for band in range(self.bands):
                chunk = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                ids.append(doc_id)
                bands.append(band)
                sigs.append(chunk.tobytes())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "band": pa.array(bands, pa.int32()),
                "sig": pa.array(sigs, pa.binary()),
            }
        )


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
) -> pd.DataFrame:
    """Returns DataFrame (doc_id, cluster) for docs in near-dup clusters.

    shingle -> minhash (actor pool) -> (band, sig) groupby (the LSH
    bucket shuffle) -> per-bucket candidate pairs -> driver verify over
    ONLY the candidate docs. ``verify="jaccard"`` keeps pairs with true
    shingle-Jaccard >= threshold (near-dup); ``verify="exact"`` keeps
    byte-identical texts only (exact dedup routed through the LSH
    plumbing — recall 1.0 since identical docs collide in every band,
    and SQL-recomputable for the oracle gate).
    """
    def sig_rows(batch: pa.Table) -> pa.Table:
        worker = MinHashSignatures(id_col, text_col, num_perm, bands, shingle_k)
        return worker(batch)

    sigs = ds.map_batches(sig_rows, batch_format="pyarrow")

    def all_pairs(g: pd.DataFrame):
        ids = sorted(g["doc_id"].tolist())[:200]
        return [(ids[i], ids[j]) for i in range(len(ids)) for j in range(i + 1, len(ids))]

    pairs = grouped_pairs(sigs, ["band", "sig"], "sig", all_pairs)
    if not pairs:
        return pd.DataFrame(columns=[id_col, "cluster"])

    # Verify on the candidate docs only (small side).
    cand_ids = sorted({x for p in pairs for x in p})
    texts = _collect_texts(ds, id_col, text_col, cand_ids)
    if verify == "exact":
        good = [
            (a, b) for a, b in pairs
            if a in texts and b in texts and texts[a] == texts[b]
        ]
    else:
        shingle_cache = {i: char_shingles(texts[i], shingle_k) for i in cand_ids if i in texts}
        good = [
            (a, b)
            for a, b in pairs
            if a in shingle_cache and b in shingle_cache
            and jaccard(shingle_cache[a], shingle_cache[b]) >= threshold
        ]
    comp = _connected_components(good)
    return pd.DataFrame(
        sorted((doc, rep) for doc, rep in comp.items()), columns=[id_col, "cluster"]
    )


def _collect_texts(ds, id_col: str, text_col: str, ids: list[int]) -> dict:
    idset = set(ids)

    def pick(batch: pa.Table) -> pa.Table:
        mask = pa.array([i in idset for i in batch.column(id_col).to_pylist()])
        return batch.filter(mask).select([id_col, text_col])

    df = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    return dict(zip(df[id_col].tolist(), df[text_col].tolist()))


def minhash_dedup(ds, id_col="doc_id", text_col="text", **kw):
    """Dataset minus near-duplicates (keep min-id representative)."""
    clusters = minhash_lsh_clusters(ds, id_col, text_col, **kw)
    doomed = set(clusters[clusters[id_col] != clusters["cluster"]][id_col])

    def keep(batch: pa.Table) -> pa.Table:
        mask = pa.array([i not in doomed for i in batch.column(id_col).to_pylist()])
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_clusters(
    ds, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3
) -> pd.DataFrame:
    """Near-dup clusters by 64-bit SimHash with Hamming <= max_hamming.

    Blocking: split the 64-bit hash into 4 16-bit bands; two docs within
    Hamming 3 share at least one exact band (pigeonhole). Bucket
    groupby on (band, value), verify exact Hamming per pair.
    """

    def sim_rows(batch: pa.Table) -> pa.Table:
        ids, bands, vals, hashes = [], [], [], []
        for doc_id, text in zip(
            batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
        ):
            h = simhash64(text)
            for band in range(4):
                ids.append(doc_id)
                bands.append(band)
                vals.append((h >> (band * 16)) & 0xFFFF)
                hashes.append(h)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "band": pa.array(bands, pa.int32()),
                "val": pa.array(vals, pa.int32()),
                "h": pa.array(hashes, pa.uint64()),
            }
        )

    rows = ds.map_batches(sim_rows, batch_format="pyarrow")

    def hamming_pairs(g: pd.DataFrame):
        items = sorted(zip(g["doc_id"], g["h"]))[:200]
        out = []
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                (a, ha), (b, hb) = items[i], items[j]
                if hamming64(int(ha), int(hb)) <= max_hamming:
                    out.append((a, b))
        return out

    pairs = grouped_pairs(rows, ["band", "val"], "val", hamming_pairs)
    comp = _connected_components(sorted(pairs))
    return pd.DataFrame(
        sorted((doc, rep) for doc, rep in comp.items()), columns=[id_col, "cluster"]
    )


# ---------------------------------------------------------------------------
# Word-ngram Jaccard
# ---------------------------------------------------------------------------


def ngram_jaccard_clusters(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> pd.DataFrame:
    """Blocking on the min word-ngram hash; exact Jaccard verify."""

    def block_rows(batch: pa.Table) -> pa.Table:
        ids, buckets, texts = [], [], []
        for doc_id, text in zip(
            batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
        ):
            grams = word_ngrams(text, n)
            bucket = min((hash_tuple(g) for g in grams), default=0) & 0xFFFF_FFFF
            ids.append(doc_id)
            buckets.append(bucket)
            texts.append(text)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "bucket": pa.array(buckets, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )

    rows = ds.map_batches(block_rows, batch_format="pyarrow")

    def jaccard_pairs(g: pd.DataFrame):
        items = sorted(zip(g["doc_id"], g["text"]))[:200]
        grams = {i: word_ngrams(t, n) for i, t in items}
        out = []
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                a, b = items[i][0], items[j][0]
                if jaccard(grams[a], grams[b]) >= threshold:
                    out.append((a, b))
        return out

    pairs = grouped_pairs(rows, ["bucket"], "bucket", jaccard_pairs)
    comp = _connected_components(sorted(pairs))
    return pd.DataFrame(
        sorted((doc, rep) for doc, rep in comp.items()), columns=[id_col, "cluster"]
    )


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
) -> pd.DataFrame:
    """Cosine near-dup via random-hyperplane LSH buckets + exact verify.

    Two near-identical vectors land in the same sign-pattern bucket with
    high probability; exact cosine runs only within buckets (vectorized
    numpy matmul per bucket).
    """

    def bucket_rows(batch: pa.Table) -> pa.Table:
        import numpy as _np

        vecs = _np.array(batch.column(vec_col).to_pylist(), dtype=_np.float32)
        if vecs.size == 0:
            return pa.table({"vid": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64()),
                             "vec": pa.array([], pa.list_(pa.float32()))})
        rng = _np.random.RandomState(seed)
        planes = rng.randn(vecs.shape[1], n_planes).astype(_np.float32)
        signs = (vecs @ planes) > 0
        buckets = (signs * (1 << _np.arange(n_planes))).sum(axis=1)
        return pa.table(
            {
                "vid": batch.column(id_col).cast(pa.int64()),
                "bucket": pa.array(buckets.astype("int64"), pa.int64()),
                "vec": batch.column(vec_col),
            }
        )

    rows = ds.map_batches(bucket_rows, batch_format="pyarrow")

    def cosine_pairs(g: pd.DataFrame):
        items = sorted(zip(g["vid"], g["vec"]))[:500]
        if len(items) < 2:
            return []
        ids = [int(i) for i, _ in items]
        m = np.array([list(v) for _, v in items], dtype=np.float32)
        m = m / (np.linalg.norm(m, axis=1, keepdims=True) + 1e-12)
        sims = m @ m.T
        out = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if sims[i, j] >= threshold:
                    out.append((ids[i], ids[j]))
        return out

    pairs = grouped_pairs(rows, ["bucket"], "bucket", cosine_pairs)
    comp = _connected_components(sorted(pairs))
    return pd.DataFrame(
        sorted((doc, rep) for doc, rep in comp.items()), columns=[id_col, "cluster"]
    )


_ = defaultdict  # keep import for future use
