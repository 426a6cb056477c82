"""Exact set-similarity self-join via prefix filtering (PPJoin-style).

The EXACT counterpart of the approximate near-dup family in
stages/dedup.py: find every document pair whose distinct-token Jaccard
meets a threshold, with no probabilistic misses. This is the classic
All-Pairs / PPJoin algorithm (Bayardo et al., WWW 2007; Xiao et al.,
WWW 2008 — public literature):

1. order the vocabulary by ascending document frequency (rarest
   first); any CONSISTENT total order preserves correctness, df-order
   is what keeps candidate buckets small;
2. each document emits only its PREFIX — the first
   ``|S| - ceil(tau*|S|) + 1`` tokens under that order. Completeness:
   if J(A,B) >= tau then |A∩B| >= ceil(tau*max(|A|,|B|)), so the
   FIRST common token (in global order) sits within both prefixes —
   its position in A is at most |A| - |A∩B| + 1 <= prefix_len(A);
3. co-locate prefix rows on hash(token): every qualifying pair shares
   a bucket through at least that first common token. Candidate pairs
   are minted in-bucket (quadratic only in each token's prefix-df,
   NOT its raw df — the whole point of step 1), then deduped on the
   pair key;
4. verify exactly: attach both texts (the size-gated broadcast /
   semi-join attach shared with MinHash, dedup._attach_pair_texts),
   recompute distinct-token intersection, keep pairs with
   ``1e6*|∩| >= tau_ppm*|∪|`` — an INTEGER inequality, so the
   surviving pairs and their ``jac_ppm = 1e6*|∩| // |∪|`` scores
   hash-verify against a brute-force SQL oracle.

Scale notes: the df pass is combiner-first (distinct tokens per doc
per block); the rank map is vocabulary-sized and broadcast once as a
sorted Arrow/numpy pair (searchsorted lookup, no Python dicts) — at
open-web vocabulary sizes swap in a distributed rank (sort the df
table, zip with row number, hash-join ranks onto prefix rows; same
algebra, one more exchange). Hot prefix buckets are capped with
REPORTED truncation (``truncated_buckets`` counter on the returned
stats) — caps trade recall for wall-time exactly like the LSH band
caps, and the fixture-scale oracle runs uncapped.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Sum

from ..functions.bucket import add_bucket
from ..state.broadcast import get_broadcast


def _distinct_tokens(text_col: pa.ChunkedArray | pa.Array):
    """-> (parent row index per token, token) with per-doc DISTINCT
    semantics, vectorized."""
    words = pc.split_pattern(text_col, " ")
    flat = pc.list_flatten(words)
    par = pc.list_parent_indices(words)
    keep = pc.not_equal(flat, pa.scalar(""))
    flat = flat.filter(keep).to_numpy(zero_copy_only=False)
    par = par.filter(keep).to_numpy(zero_copy_only=False).astype(np.int64)
    if len(flat) == 0:
        return par, flat
    # distinct within doc: unique on (par, token)
    df = pd.DataFrame({"p": par, "w": flat}).drop_duplicates()
    return df["p"].to_numpy(), df["w"].to_numpy(dtype=object)


def token_df(ds, text_col: str = "text"):
    """Vocabulary document frequencies, combiner-first: per-block
    distinct (token, partial-df) rows, ONE vocabulary-sized groupby."""

    def partial(t: pa.Table) -> pa.Table:
        _, w = _distinct_tokens(t[text_col])
        uniq, cnt = np.unique(w, return_counts=True)
        return pa.table({"w": pa.array(uniq, pa.string()),
                         "df_p": pa.array(cnt.astype(np.int64))})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("w").aggregate(Sum("df_p", alias_name="df")))


def jaccard_join(ds, id_col: str = "doc_id", text_col: str = "text",
                 tau_ppm: int = 900_000, num_buckets: int = 64,
                 bucket_cap: int = 20_000):
    """-> pairs Dataset (a, b, jac_ppm), a < b, exact distinct-token
    Jaccard >= tau_ppm/1e6. See module docstring for the algorithm."""
    from .canonicalize import exact_dedup
    from .dedup import _attach_pair_texts

    # ---- global df-ascending token rank, broadcast once -----------------
    dft = token_df(ds, text_col).to_pandas()
    if len(dft) == 0:
        return rd.from_arrow(pa.table({
            "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
            "jac_ppm": pa.array([], pa.int64())}))
    order = np.lexsort((dft["w"].to_numpy(dtype=object),
                        dft["df"].to_numpy()))
    ranked = dft["w"].to_numpy(dtype=object)[order]
    # searchsorted needs LEX-sorted keys; carry the df-rank alongside
    lex = np.argsort(ranked, kind="stable")
    tok_sorted = ranked[lex]                       # lex order
    rank_of = np.empty(len(ranked), dtype=np.int64)
    rank_of[lex] = np.arange(len(ranked))          # df-rank per lex slot
    tok_ref = ray.put(tok_sorted.astype(object))
    rank_ref = ray.put(rank_of)

    # ---- prefix emission -----------------------------------------------
    def prefixes(t: pa.Table) -> pa.Table:
        toks = get_broadcast(tok_ref)
        ranks = get_broadcast(rank_ref)
        par, w = _distinct_tokens(t[text_col])
        ids = t[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        if len(w) == 0:
            return pa.table({"tok_rank": pa.array([], pa.int64()),
                             "doc": pa.array([], pa.int64())})
        pos = np.searchsorted(toks, w)
        r = ranks[pos]                              # global df-rank per token
        df = pd.DataFrame({"p": par, "r": r})
        df = df.sort_values(["p", "r"], kind="stable")
        sizes = df.groupby("p").size()
        n = sizes.reindex(df["p"]).to_numpy()
        # prefix length = n - ceil(tau*n) + 1, all-integer ceil
        plen = n - (tau_ppm * n + 999_999) // 1_000_000 + 1
        in_doc_pos = df.groupby("p").cumcount().to_numpy()
        keep = in_doc_pos < plen
        return pa.table({
            "tok_rank": pa.array(df["r"].to_numpy()[keep], pa.int64()),
            "doc": pa.array(ids[df["p"].to_numpy()[keep]], pa.int64()),
        })

    prefix_rows = ds.map_batches(prefixes, batch_format="pyarrow")

    # ---- candidate pairs per prefix token ------------------------------
    def mint_pairs(df: pd.DataFrame) -> pa.Table:
        outs_a, outs_b, trunc = [], [], 0
        for _, g in df.groupby("tok_rank"):
            docs = np.unique(g["doc"].to_numpy())
            if len(docs) < 2:
                continue
            if len(docs) * (len(docs) - 1) // 2 > bucket_cap:
                trunc += 1
                docs = docs[: int((2 * bucket_cap) ** 0.5) + 1]
            ia, ib = np.triu_indices(len(docs), k=1)
            outs_a.append(docs[ia])
            outs_b.append(docs[ib])
        if not outs_a:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "trunc_p": pa.array([], pa.int64())})
        a = np.concatenate(outs_a)
        b = np.concatenate(outs_b)
        tr = np.zeros(len(a), dtype=np.int64)
        if len(a):
            tr[0] = trunc  # piggyback the truncation count, summed later
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64()),
                         "trunc_p": pa.array(tr, pa.int64())})

    cand = (
        prefix_rows.map_batches(
            lambda t: add_bucket(t, "tok_rank", num_buckets),
            batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda df: mint_pairs(df.drop(columns="__bucket")),
                    batch_format="pandas")
        .materialize()  # consumed twice: truncation audit + pair dedup
    )
    n_trunc = cand.sum("trunc_p") or 0
    if n_trunc:
        import logging
        logging.getLogger(__name__).warning(
            "jaccard_join: %d prefix buckets truncated at cap=%d — "
            "result is a LOWER BOUND on qualifying pairs", n_trunc,
            bucket_cap)
    pairs = exact_dedup(
        cand.map_batches(lambda t: t.select(["a", "b"]),
                         batch_format="pyarrow"), ["a", "b"])

    # ---- exact verify ---------------------------------------------------
    with_texts = _attach_pair_texts(pairs, ds, id_col, text_col)

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "jac_ppm": pa.array([], pa.int64())})
        ta = t["text_a"].to_pylist()
        tb = t["text_b"].to_pylist()
        inter = np.empty(t.num_rows, dtype=np.int64)
        union = np.empty(t.num_rows, dtype=np.int64)
        for i, (xa, xb) in enumerate(zip(ta, tb)):
            sa = set(xa.split(" ")) - {""}
            sb = set(xb.split(" ")) - {""}
            o = len(sa & sb)
            inter[i] = o
            union[i] = len(sa) + len(sb) - o
        ok = (union > 0) & (1_000_000 * inter >= tau_ppm * union)
        return pa.table({
            "a": t["a"].filter(pa.array(ok)),
            "b": t["b"].filter(pa.array(ok)),
            "jac_ppm": pa.array(
                1_000_000 * inter[ok] // union[ok], pa.int64()),
        })

    return with_texts.map_batches(verify, batch_format="pyarrow")
