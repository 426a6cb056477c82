"""Similarity search over an embedding column (list<float>).

* ``brute_force_topk`` — baseline exact cosine top-k: the query matrix
  is broadcast once (``ray.put``); each batch computes a vectorized
  numpy matmul against it and emits per-batch partial top-k rows; the
  global top-k merge runs over the tiny partial set. No full shuffle —
  the only data movement is |queries| x k rows per batch.
* ``ivf_build`` / ``ivf_probe`` — the scale path: deterministic
  k-means (seeded init, few Lloyd iterations via per-batch partial
  sums) assigns each vector to a centroid, and ``ivf_build`` SHUFFLES
  the vectors ONCE into centroid-partitioned Parquet
  (``index_dir/centroid=<c>/``). ``ivf_probe`` then reads ONLY the
  ``nprobe`` nearest centroid partitions per query set — the read
  fraction really is |probed| / |n_clusters|, reported in the returned
  stats. Recall < 1.0 by construction (asserted >= 0.9 vs the exact
  result in tests). ``ivf_topk`` composes build+probe for one-shot use.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..state.broadcast import get_broadcast


def embed_documents(docs_ds, id_col: str = "doc_id", text_col: str = "text",
                    dim: int = 64, batch_size: int = 2048):
    """documents -> (id, embedding list<float>) via the deterministic
    feature-hashing vectorizer (functions.text.embed_text); batched
    map_batches, ready for brute_force_topk / ivf_topk /
    embedding_dedup_clusters."""
    from ..functions.text import embed_text

    def emb(t: pa.Table) -> pa.Table:
        vecs = [embed_text(x, dim).tolist() for x in t[text_col].to_pylist()]
        return pa.table({
            "vec_id": t[id_col].cast(pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
        })

    return docs_ds.map_batches(emb, batch_format="pyarrow", batch_size=batch_size)


def _as_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    """(n, dim) float32 matrix from a list<float> column.

    Flattens the Arrow list values straight into numpy (no Python-object
    round trip) when every row has the same length — the embedding-table
    invariant; falls back to the object path for ragged/null rows."""
    col = batch.column(vec_col).combine_chunks()
    try:
        if col.null_count == 0 and len(col) > 0:
            offs = np.diff(col.offsets.to_numpy())
            if (offs == offs[0]).all() and offs[0] > 0:
                flat = col.flatten().to_numpy(zero_copy_only=False)
                return np.ascontiguousarray(
                    flat.reshape(len(col), int(offs[0])), dtype=np.float32)
    except AttributeError:  # FixedSizeList or unexpected layout
        try:
            flat = col.flatten().to_numpy(zero_copy_only=False)
            return np.ascontiguousarray(
                flat.reshape(len(col), -1), dtype=np.float32)
        except Exception:
            pass
    return np.array(col.to_pylist(), dtype=np.float32)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / (np.linalg.norm(m, axis=1, keepdims=True) + 1e-12)


class BatchTopK:
    """Actor-pool stage: per-batch exact cosine vs broadcast queries."""

    def __init__(self, queries_ref, id_col: str, vec_col: str, k: int):
        q = get_broadcast(queries_ref)  # dict {query_id: vector} or ndarray rows
        self.qids = sorted(q)
        self.qmat = _normalize(np.array([q[i] for i in self.qids], dtype=np.float32))
        self.id_col, self.vec_col, self.k = id_col, vec_col, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             self.id_col: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        m = _normalize(_as_matrix(batch, self.vec_col))
        sims = self.qmat @ m.T  # (nq, nb)
        k = min(self.k, sims.shape[1])
        # partial top-k per query within this batch — all-numpy emit
        idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        qid_arr = np.repeat(np.asarray(self.qids, dtype=np.int64), k)
        top_ids = np.asarray(ids, dtype=np.int64)[idx.ravel()]
        top_scores = np.take_along_axis(sims, idx, axis=1).ravel().astype(np.float64)
        return pa.table({"query_id": pa.array(qid_arr, pa.int64()),
                         self.id_col: pa.array(top_ids, pa.int64()),
                         "score": pa.array(top_scores, pa.float64())})


def brute_force_topk(ds, queries: dict[int, list[float]], k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     concurrency: int | tuple = (1, 4)) -> pd.DataFrame:
    """Exact cosine top-k. Returns DataFrame (query_id, id_col, score)
    sorted by (query_id, -score, id_col); |result| = |queries| * k."""
    qref = ray.put(queries)
    partials = ds.map_batches(
        BatchTopK,
        fn_constructor_args=(qref, id_col, vec_col, k),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
    df = partials.to_pandas()  # tiny: |queries| * k * n_batches
    df = df.sort_values(["query_id", "score", id_col], ascending=[True, False, True],
                        kind="stable")
    out = df.groupby("query_id", as_index=False, sort=True).head(k)
    return out.reset_index(drop=True)


# ---------------------------------------------------------------------------
# IVF (inverted-file) approximate search
# ---------------------------------------------------------------------------


def kmeans_fit(ds, vec_col: str = "embedding", n_clusters: int = 16,
               iters: int = 5, seed: int = 3) -> np.ndarray:
    """Deterministic distributed k-means via per-batch partial sums.

    Init: first batch's rows hashed by a seeded RNG choice. Each Lloyd
    iteration is one pass: map_batches emits (cluster, sum_vec, count)
    partials; the driver merges (centroid count x dim — tiny).
    """
    first = ds.limit(max(n_clusters * 4, 64)).to_pandas()
    m = np.array(first[vec_col].tolist(), dtype=np.float32)
    rng = np.random.RandomState(seed)
    centroids = m[rng.choice(len(m), size=n_clusters, replace=len(m) < n_clusters)]

    for _ in range(iters):
        cref = ray.put(centroids)

        def partial(batch: pa.Table) -> pa.Table:
            c = _normalize(get_broadcast(cref))
            v = _as_matrix(batch, vec_col)
            if v.size == 0:
                return pa.table({"cluster": pa.array([], pa.int32()),
                                 "vsum": pa.array([], pa.list_(pa.float64())),
                                 "cnt": pa.array([], pa.int64())})
            assign = np.argmax(_normalize(v) @ c.T, axis=1)
            out_c, out_s, out_n = [], [], []
            for ci in np.unique(assign):
                sel = v[assign == ci]
                out_c.append(int(ci))
                out_s.append(sel.sum(axis=0).astype("float64").tolist())
                out_n.append(int(sel.shape[0]))
            return pa.table({"cluster": pa.array(out_c, pa.int32()),
                             "vsum": pa.array(out_s, pa.list_(pa.float64())),
                             "cnt": pa.array(out_n, pa.int64())})

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        new = centroids.copy()
        for ci, g in parts.groupby("cluster"):
            tot = np.sum(np.array(g["vsum"].tolist()), axis=0)
            n = g["cnt"].sum()
            if n:
                new[int(ci)] = (tot / n).astype(np.float32)
        centroids = new
    return centroids


def ivf_build(ds, index_dir: str, n_clusters: int = 16,
              id_col: str = "vec_id", vec_col: str = "embedding",
              seed: int = 3) -> np.ndarray:
    """One-time shuffle of vectors into centroid-partitioned Parquet.

    Writes ``index_dir/centroid=<c>/*.parquet`` (hive layout) plus the
    centroid matrix (``_centroids.npy``). This is the partition layout
    the probe path prunes on — the cost is paid once, amortized over
    every later query set.
    """
    import os

    centroids = kmeans_fit(ds, vec_col, n_clusters, seed=seed)
    cref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             vec_col: pa.array([], pa.list_(pa.float32())),
                             "centroid": pa.array([], pa.int32())})
        c = _normalize(get_broadcast(cref))
        v = _normalize(_as_matrix(batch, vec_col))
        a = np.argmax(v @ c.T, axis=1).astype("int32")
        return pa.table({id_col: batch.column(id_col).cast(pa.int64()),
                         vec_col: batch.column(vec_col),
                         "centroid": pa.array(a, pa.int32())})

    os.makedirs(index_dir, exist_ok=True)
    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["centroid"])
    np.save(os.path.join(index_dir, "_centroids.npy"), centroids)
    return centroids


def ivf_probe(index_dir: str, queries: dict[int, list[float]], k: int = 10,
              nprobe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding",
              ) -> tuple[pd.DataFrame, dict]:
    """Approximate top-k reading ONLY the probed centroid partitions.

    Returns (result frame, stats) where stats records the actual read
    fraction (probed partitions / total partitions).
    """
    import glob
    import os

    centroids = np.load(os.path.join(index_dir, "_centroids.npy"))
    cn = _normalize(centroids)
    qids = sorted(queries)
    qmat = _normalize(np.array([queries[i] for i in qids], dtype=np.float32))
    nprobe = min(nprobe, len(centroids))
    probed = np.argsort(-(qmat @ cn.T), axis=1)[:, :nprobe]
    probe_sets = {qid: set(map(int, probed[i])) for i, qid in enumerate(qids)}
    allowed = sorted(set().union(*probe_sets.values())) if probe_sets else []

    part_dirs = sorted(glob.glob(os.path.join(index_dir, "centroid=*")))
    n_parts = len(part_dirs)
    present = {int(p.rsplit("=", 1)[1]): p for p in part_dirs}
    probe_dirs = [present[c] for c in allowed if c in present]
    stats = {
        "n_clusters": len(centroids),
        "n_partitions_on_disk": n_parts,
        "probed_partitions": len(probe_dirs),
        "read_fraction": len(probe_dirs) / n_parts if n_parts else 0.0,
    }
    if not probe_dirs:
        return (pd.DataFrame(columns=["query_id", id_col, "score"]), stats)

    # read ONLY the probed partition dirs' files; Ray re-infers the
    # hive `centroid=` key from the file paths as a column.
    import ray.data as rd

    probe_files = sorted(
        f for c in allowed if c in present
        for f in glob.glob(os.path.join(present[c], "*.parquet"))
    )
    sub = rd.read_parquet(probe_files)
    qref = ray.put((qids, qmat, probe_sets))

    def scan(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        qids_l, qm, psets = get_broadcast(qref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        # hive-inferred partition key may arrive as string or dictionary
        cents = pc.cast(
            batch.column("centroid").combine_chunks().cast(pa.string()),
            pa.int64()).to_numpy(zero_copy_only=False)
        v = _normalize(_as_matrix(batch, vec_col))
        sims = qm @ v.T  # (nq, nb)
        out_q, out_i, out_s = [], [], []
        for qi, qid in enumerate(qids_l):
            mask = np.isin(cents, list(psets[qid]))
            if not mask.any():
                continue
            row = sims[qi][mask]
            kk = min(k, row.shape[0])
            idx = np.argpartition(-row, kk - 1)[:kk]
            sel_ids = ids[mask][idx]
            out_q.extend([qid] * kk)
            out_i.extend(sel_ids.tolist())
            out_s.extend(row[idx].astype("float64").tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         id_col: pa.array(out_i, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})

    df = sub.map_batches(scan, batch_format="pyarrow").to_pandas()
    df = df.sort_values(["query_id", "score", id_col], ascending=[True, False, True],
                        kind="stable")
    out = df.groupby("query_id", as_index=False, sort=True).head(k).reset_index(drop=True)
    return out, stats


def ivf_topk(ds, queries: dict[int, list[float]], k: int = 10, n_clusters: int = 16,
             nprobe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding",
             seed: int = 3, index_dir: str | None = None) -> pd.DataFrame:
    """Build (or reuse) the centroid-partitioned index, then probe it.

    With ``index_dir`` given and already populated, the build is
    skipped entirely — the steady-state path reads only
    nprobe/n_clusters of the data. Logs the measured read fraction.
    """
    import logging
    import os
    import tempfile

    if index_dir is None:
        index_dir = tempfile.mkdtemp(prefix="ivf_index_")
    if not os.path.exists(os.path.join(index_dir, "_centroids.npy")):
        ivf_build(ds, index_dir, n_clusters, id_col, vec_col, seed)
    out, stats = ivf_probe(index_dir, queries, k, nprobe, id_col, vec_col)
    logging.getLogger(__name__).info("ivf_probe stats: %s", stats)
    return out
