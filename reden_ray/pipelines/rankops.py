"""Ranking & freshness operators (q87-q89).

Three selection/ranking shapes an LLM-data or web-serving pipeline
runs after scoring, each combiner-first and hash-verified:

* q87 — grouped top-N by value (most-recent-N-per-entity): the
  mergeable exact form of "keep each customer's N latest orders".
  Per-batch partial top-N (≤N rows per (key, block) leave each block
  — the q61 bottom-k bound, but by VALUE not by hash), ONE key-bucket
  exchange of partials, vectorized final top-N per bucket.
  Deterministic ties: (value desc, id desc).
* q88 — reciprocal-rank fusion (the hybrid-retrieval merge): two
  per-group rankings of the same documents (by length and by token
  count — both computed, not read) fused as
  score = SCALE//(K+rank_a) + SCALE//(K+rank_b) with K=60 in pure
  integer arithmetic, so the fused ranking hash-verifies. ONE bucket
  exchange; both ranks and the fusion are vectorized argsorts inside
  the bucket.
* q89 — freshness-decayed activity score (time-decay aggregation with
  an exact dyadic kernel): weight = 2^40 >> age_days instead of
  exp(-λ·age) — the decay is a right-shift, both engines compute it
  bit-identically, and the per-user totals stay hash-exact. Two
  passes: a max-timestamp aggregate (one scalar), then a stateless
  weighted-count scan with per-batch (user, partial) combiners.

Scale notes: q87 ships ≤N rows per (key, block); q88 ships one narrow
row per doc into its group bucket; q89 ships pre-reduced per-user
partials. Nothing is globally sorted and nothing lands on the driver
beyond scalars and final frames.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Max, Sum

from ..stages.windows import grouped_by_key_buckets

TOP_N = 3
_RRF_K = 60
_RRF_SCALE = 1 << 20
_DECAY_SCALE = 1 << 40
_US_PER_DAY = 86_400_000_000


# ---------------------------------------------------------------------------
# Q87 — grouped top-N by value
# ---------------------------------------------------------------------------

def top_n_per_group(ds, key_col: str, value_col: str, id_col: str,
                    n: int = TOP_N) -> "rd.Dataset":
    """Exact top-``n`` rows per key by (value desc, id desc), with
    rank ``rk`` 1..n. Mergeable: top-n of a union == top-n of per-block
    top-n's, so only ≤n rows per (key, block) are exchanged."""

    def partial_topn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, value_col, id_col],
                            ascending=[True, False, False],
                            kind="stable")
        return df.groupby(key_col, sort=False).head(n)

    pre = ds.map_batches(partial_topn, batch_format="pandas")

    def final_topn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, value_col, id_col],
                            ascending=[True, False, False],
                            kind="stable")
        out = df.groupby(key_col, sort=False).head(n).copy()
        out["rk"] = out.groupby(key_col, sort=False).cumcount() + 1
        return out

    return grouped_by_key_buckets(pre, key_col, final_topn)


def q87_latest_orders(sf_dir: str) -> pd.DataFrame:
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_orderdate",
                                  "o_orderkey"])
    narrowed = ds.map_batches(
        lambda t: pa.table({
            "o_custkey": t["o_custkey"],
            "date_us": pc.cast(pc.cast(t["o_orderdate"],
                                       pa.timestamp("us")), pa.int64()),
            "o_orderkey": t["o_orderkey"]}),
        batch_format="pyarrow")
    out = top_n_per_group(narrowed, "o_custkey", "date_us",
                          "o_orderkey").to_pandas()
    out["rk"] = out["rk"].astype("int64")
    return out


Q87_SQL = f"""
WITH o AS (
  SELECT o_custkey, epoch_us(o_orderdate) AS date_us, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC,
                                     o_orderkey DESC) AS rk
  FROM orders
)
SELECT o_custkey, date_us, o_orderkey, CAST(rk AS BIGINT) AS rk
FROM o WHERE rk <= {TOP_N}
"""


# ---------------------------------------------------------------------------
# Q88 — reciprocal-rank fusion per group
# ---------------------------------------------------------------------------

def rrf_fuse(ds, group_col: str, id_col: str,
             metric_a: str, metric_b: str) -> "rd.Dataset":
    """Fuse two per-group rankings (each by metric desc, id asc) into
    integer RRF scores: rra/rrb are the two ranks, rrf_score their
    reciprocal-rank sum at K=60, SCALE=2^20."""

    def fuse(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, grp in df.groupby(group_col, sort=False):
            ra = (grp.sort_values([metric_a, id_col],
                                  ascending=[False, True], kind="stable")
                  .reset_index(drop=True))
            ra["rra"] = np.arange(1, len(ra) + 1, dtype=np.int64)
            rb = (grp.sort_values([metric_b, id_col],
                                  ascending=[False, True], kind="stable")
                  [[id_col]].reset_index(drop=True))
            rb["rrb"] = np.arange(1, len(rb) + 1, dtype=np.int64)
            m = ra.merge(rb, on=id_col)
            m["rrf_score"] = (_RRF_SCALE // (_RRF_K + m["rra"])
                              + _RRF_SCALE // (_RRF_K + m["rrb"]))
            frames.append(m[[group_col, id_col, "rra", "rrb",
                             "rrf_score"]])
        if not frames:
            return pd.DataFrame({group_col: pd.array([], dtype="str"),
                                 id_col: pd.array([], dtype="int64"),
                                 "rra": pd.array([], dtype="int64"),
                                 "rrb": pd.array([], dtype="int64"),
                                 "rrf_score": pd.array([], dtype="int64")})
        return pd.concat(frames, ignore_index=True)

    return grouped_by_key_buckets(ds, group_col, fuse)


def q88_rank_fusion(sf_dir: str) -> pd.DataFrame:
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "text", "n_chars"])

    def metrics(t: pa.Table) -> pa.Table:
        toks = pc.list_value_length(pc.utf8_split_whitespace(
            pc.utf8_trim_whitespace(t["text"])))
        return pa.table({
            "source": t["source"],
            "doc_id": t["doc_id"],
            "n_chars": t["n_chars"],
            "n_tokens": pc.cast(toks, pa.int64()),
        })

    out = rrf_fuse(ds.map_batches(metrics, batch_format="pyarrow"),
                   "source", "doc_id", "n_chars", "n_tokens").to_pandas()
    for c in ("rra", "rrb", "rrf_score"):
        out[c] = out[c].astype("int64")
    return out


Q88_SQL = f"""
WITH m AS (
  SELECT source, doc_id, n_chars,
         CAST(length(string_split_regex(trim(text), '\\s+')) AS BIGINT)
             AS n_tokens
  FROM documents
), r AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id ASC) AS rra,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_tokens DESC, doc_id ASC) AS rrb
  FROM m
)
SELECT source, doc_id, CAST(rra AS BIGINT) AS rra,
       CAST(rrb AS BIGINT) AS rrb,
       CAST({_RRF_SCALE} // ({_RRF_K} + rra)
            + {_RRF_SCALE} // ({_RRF_K} + rrb) AS BIGINT) AS rrf_score
FROM r
"""


# ---------------------------------------------------------------------------
# Q89 — freshness-decayed activity score
# ---------------------------------------------------------------------------

def decayed_activity(events_ds, key_col: str = "user_id",
                     ts_col: str = "ts") -> pd.DataFrame:
    """Per-key freshness score Σ 2^40 >> min(age_days, 40), where age
    is measured from the corpus max timestamp. The dyadic kernel makes
    the decayed total exactly reproducible (no float exp)."""

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table({
            key_col: t[key_col],
            "__ts_us": pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                               pa.int64()),
        })

    narrow = events_ds.map_batches(to_us, batch_format="pyarrow")
    max_ts = narrow.aggregate(Max("__ts_us"))["max(__ts_us)"]

    def partial(t: pa.Table) -> pa.Table:
        ts = t["__ts_us"].to_numpy(zero_copy_only=False)
        age_days = np.minimum((max_ts - ts) // _US_PER_DAY, 40)
        w = np.int64(_DECAY_SCALE) >> age_days
        tt = pa.table({key_col: t[key_col],
                       "w": pa.array(w, pa.int64()),
                       "one": pa.array(np.ones(len(ts), np.int64))})
        g = tt.group_by([key_col]).aggregate([("w", "sum"),
                                              ("one", "sum")])
        return g.rename_columns([key_col, "pw", "pn"])

    out = (narrow.map_batches(partial, batch_format="pyarrow")
           .groupby(key_col)
           .aggregate(Sum("pw", alias_name="decay_score"),
                      Sum("pn", alias_name="n_events"))
           .to_pandas())
    out["decay_score"] = out["decay_score"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return out


def q89_decayed_activity(sf_dir: str) -> pd.DataFrame:
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    return decayed_activity(ds)


Q89_SQL = f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS ts_us FROM events
), mx AS (SELECT MAX(ts_us) AS m FROM e)
SELECT user_id,
       CAST(SUM({_DECAY_SCALE} >> LEAST(
           ((SELECT m FROM mx) - ts_us) // {_US_PER_DAY}, 40))
           AS BIGINT) AS decay_score,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM e GROUP BY user_id
"""
