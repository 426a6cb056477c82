"""Entity-fusion operators for KG construction (q79-q82).

The reference links mentions to KB entities one page at a time; a
web-scale KG build then has to FUSE what millions of pages assert into
one canonical graph. This family covers the four fusion steps the
reference leaves to its downstream consumer, each Dataset-plane,
combiner-first, and hash-verified against a DuckDB oracle:

* q79 — majority-vote attribute fusion (truth discovery): per entity,
  pick the modal attribute value with a deterministic tie-break
  (highest support, then lexicographically smallest value — the same
  argmax-with-stable-tie-break discipline as the linker's per-mention
  winner, ``stages/linker.py`` A4). Per-batch (entity, value) count
  combiner → one exchange of pre-reduced rows → bucketed argmax. The
  corpus itself is never re-shuffled.
* q80 — temporal validity intervals (SCD2 / change-data-capture): per
  key, collapse consecutive runs of an attribute value into
  ``[valid_from, valid_to)`` intervals ordered by event time. The one
  inherent all-to-all ships only the four narrow columns the interval
  needs; run detection is vectorized pandas inside each key bucket.
  This is the temporal-KG analogue of the reference's birth/death
  validity windows (``functions/dates.py`` M5-M7) derived from
  observation streams instead of KB literals.
* q81 — negative sampling for KG-embedding training (TransE-style
  corruption): for every true (head, relation) edge, mint a
  deterministic corrupted tail via an arithmetic mix hash over dense
  entity codes, then filter false negatives (corrupted pairs that are
  real edges) with a bucketed anti-join. Zero stored sampler state —
  the same resumability property as q46's mixture sampler.
* q82 — fuzzy record linkage (blocked Levenshtein): the approximate
  variant of the reference's exact normalized-surface dictionary join
  (``functions/text.py`` M1 / J1): block on a key prefix, then verify
  candidate pairs with a numpy-vectorized edit-distance kernel
  (DP rows swept across the PAIR axis — no per-pair Python DP). Block
  sizes are capped with reported truncation, the q17 discipline.

Scale notes: q79/q81 exchange pre-reduced or pre-deduped rows only;
q80 ships keys+timestamps (no payload); q82's pair count is bounded by
sum over blocks of C(|block|, 2) with an explicit per-block cap. None
of the four materializes O(corpus) on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Sum

from ..stages.canonicalize import exact_dedup
from ..stages.windows import grouped_by_key_buckets
from ..state.broadcast import get_broadcast


def _read(sf_dir: str, table: str, columns=None):
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# Q79 — majority-vote attribute fusion (truth discovery)
# ---------------------------------------------------------------------------

def majority_vote(ds, key_col: str, value_col: str) -> pd.DataFrame:
    """Per ``key_col``, the modal ``value_col`` with deterministic
    tie-break (max count, then min value), plus its support and the
    number of distinct values observed.

    Combiner-first: each block emits (key, value, cnt) partials —
    bounded by distinct pairs per block, not rows — so the only
    exchange moves pre-reduced rows. The argmax runs per hash bucket
    (one task per bucket, vectorized pandas inside).
    """

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([key_col, value_col]).group_by(
            [key_col, value_col]).aggregate([([], "count_all")])
        return g.rename_columns([key_col, value_col, "cnt"])

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby([key_col, value_col]).aggregate(Sum("cnt")))

    def argmax_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={"sum(cnt)": "cnt"})
        per_key = df.groupby(key_col, sort=False).agg(
            n_distinct=("cnt", "size")).reset_index()
        win = (df.sort_values([key_col, "cnt", value_col],
                              ascending=[True, False, True],
                              kind="stable")
               .drop_duplicates(key_col))
        out = win.merge(per_key, on=key_col)
        return pd.DataFrame({
            key_col: out[key_col],
            "canon_value": out[value_col],
            "support": out["cnt"].astype("int64"),
            "n_distinct": out["n_distinct"].astype("int64"),
        })

    return grouped_by_key_buckets(counts, key_col, argmax_bucket).to_pandas()


def q79_attribute_fusion(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    return majority_vote(ds, "o_custkey", "o_orderpriority")


Q79_SQL = """
WITH c AS (
  SELECT o_custkey, o_orderpriority, COUNT(*) AS cnt
  FROM orders GROUP BY o_custkey, o_orderpriority
), r AS (
  SELECT o_custkey, o_orderpriority, cnt,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY cnt DESC, o_orderpriority ASC) AS rn,
         COUNT(*) OVER (PARTITION BY o_custkey) AS n_distinct
  FROM c
)
SELECT o_custkey, o_orderpriority AS canon_value,
       CAST(cnt AS BIGINT) AS support,
       CAST(n_distinct AS BIGINT) AS n_distinct
FROM r WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Q80 — temporal validity intervals (SCD2 change capture)
# ---------------------------------------------------------------------------

_TS_MAX = np.int64(np.iinfo(np.int64).max)


def change_intervals(events_ds, key_col: str = "user_id",
                     value_col: str = "event_type",
                     ts_col: str = "ts",
                     order_col: str = "event_id") -> "rd.Dataset":
    """Collapse each key's event stream into validity intervals: one
    row per maximal run of consecutive equal ``value_col``, with
    ``valid_from_us`` = the run's first timestamp, ``valid_to_us`` =
    the next run's first timestamp (int64-max sentinel for the open
    final run), and the run's event count.

    ONE hash-bucket exchange of the four narrow columns; run detection
    is a vectorized shift-compare + cumsum per bucket. Ordering inside
    a key is (ts, order_col) so equal timestamps break
    deterministically.
    """

    def narrow(t: pa.Table) -> pa.Table:
        return pa.table({
            key_col: t[key_col],
            "__ts_us": pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                               pa.int64()),
            value_col: t[value_col],
            order_col: t[order_col],
        })

    def collapse(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, "__ts_us", order_col], kind="stable")
        new_run = (df[key_col].ne(df[key_col].shift())
                   | df[value_col].ne(df[value_col].shift()))
        run = new_run.cumsum()
        g = df.groupby(run, sort=False)
        out = pd.DataFrame({
            key_col: g[key_col].first(),
            value_col: g[value_col].first(),
            "valid_from_us": g["__ts_us"].first().astype("int64"),
            "n_events": g.size().astype("int64"),
        })
        nxt = out["valid_from_us"].shift(-1, fill_value=_TS_MAX)
        same_key = out[key_col].eq(out[key_col].shift(-1))
        out["valid_to_us"] = np.where(same_key, nxt, _TS_MAX).astype("int64")
        return out[[key_col, value_col, "valid_from_us", "valid_to_us",
                    "n_events"]]

    pre = events_ds.map_batches(narrow, batch_format="pyarrow")
    return grouped_by_key_buckets(pre, key_col, collapse)


def q80_change_intervals(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type", "event_id"])
    return change_intervals(ds).to_pandas()


Q80_SQL = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events
), o AS (
  SELECT *, LAG(event_type) OVER (
      PARTITION BY user_id ORDER BY ts_us, event_id) AS prev
  FROM e
), g AS (
  SELECT *, SUM(CASE WHEN prev IS NULL OR prev <> event_type
                     THEN 1 ELSE 0 END) OVER (
      PARTITION BY user_id ORDER BY ts_us, event_id
      ROWS UNBOUNDED PRECEDING) AS run
  FROM o
), r AS (
  SELECT user_id, run, MIN(event_type) AS event_type,
         MIN(ts_us) AS valid_from_us, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM g GROUP BY user_id, run
)
SELECT user_id, event_type, valid_from_us,
       COALESCE(LEAD(valid_from_us) OVER (
           PARTITION BY user_id ORDER BY valid_from_us),
           9223372036854775807) AS valid_to_us,
       n_events
FROM r
"""


# ---------------------------------------------------------------------------
# Q81 — deterministic negative sampling for KG-embedding training
# ---------------------------------------------------------------------------

_NEG_A = np.int64(2654435761)   # Knuth multiplicative constants; the
_NEG_B = np.int64(40503)        # mix stays well inside int64 for any
_NEG_C = np.int64(12345)        # key below ~2^31 after the % below.
_NEG_KEY_MOD = np.int64(1_000_003)


def negative_samples(edges_ds, head_col: str, tail_col: str,
                     num_buckets: int = 32) -> "rd.Dataset":
    """TransE-style corruption: for each distinct true edge
    (head, tail), mint ONE candidate corrupted tail by an arithmetic
    mix hash over dense tail codes, then drop false negatives
    (candidates that are themselves true edges) and self-corruptions.

    The tail vocabulary is broadcast once (``ray.put``); the candidate
    mint is a stateless vectorized map; the false-negative filter is a
    bucketed anti-join of two pre-deduped keys-only tables. Nothing is
    sampled from mutable state, so the output is reproducible under
    any re-partitioning — the checkpoint-free property q46 documents.
    """
    edges = exact_dedup(edges_ds, [head_col, tail_col],
                        num_buckets=num_buckets)

    vocab = sorted(
        r[tail_col]
        for r in exact_dedup(edges_ds, [tail_col]).take_all())
    n_types = np.int64(len(vocab))
    code_of = {v: i for i, v in enumerate(vocab)}
    vocab_ref = ray.put((vocab, code_of))

    def mint(t: pa.Table) -> pa.Table:
        voc, codes = get_broadcast(vocab_ref)
        heads = t[head_col].to_numpy(zero_copy_only=False).astype(np.int64)
        tails = t[tail_col].to_pylist()
        tcode = np.fromiter((codes[v] for v in tails), np.int64,
                            count=len(tails))
        mix = ((heads % _NEG_KEY_MOD) * _NEG_A + tcode * _NEG_B + _NEG_C)
        neg = mix % n_types
        keep = np.flatnonzero(neg != tcode)
        return pa.table({
            head_col: pa.array(heads[keep], pa.int64()),
            "pos_" + tail_col: pa.array([tails[i] for i in keep],
                                        pa.string()),
            "neg_" + tail_col: pa.array([voc[neg[i]] for i in keep],
                                        pa.string()),
        })

    cands = edges.map_batches(mint, batch_format="pyarrow")

    # false-negative filter: (head, neg) must not be a true edge.
    # Tag-union the two keys-only tables, anti-join inside each bucket.
    neg_col = "neg_" + tail_col

    def tag_edge(t: pa.Table) -> pa.Table:
        return pa.table({
            head_col: t[head_col],
            "__probe": t[tail_col],
            "pos_" + tail_col: pa.nulls(len(t), pa.string()),
            "__is_edge": pa.array([True] * len(t), pa.bool_()),
        })

    def tag_cand(t: pa.Table) -> pa.Table:
        return pa.table({
            head_col: t[head_col],
            "__probe": t[neg_col],
            "pos_" + tail_col: t["pos_" + tail_col],
            "__is_edge": pa.array([False] * len(t), pa.bool_()),
        })

    tagged = (edges.map_batches(tag_edge, batch_format="pyarrow")
              .union(cands.map_batches(tag_cand, batch_format="pyarrow")))

    def anti(df: pd.DataFrame) -> pd.DataFrame:
        true_keys = df.loc[df["__is_edge"], [head_col, "__probe"]]
        cand = df.loc[~df["__is_edge"]]
        keep = cand.merge(true_keys, on=[head_col, "__probe"],
                          how="left", indicator=True)
        keep = keep[keep["_merge"] == "left_only"]
        return pd.DataFrame({
            head_col: keep[head_col].astype("int64"),
            "pos_" + tail_col: keep["pos_" + tail_col],
            neg_col: keep["__probe"],
        })

    return grouped_by_key_buckets(tagged, head_col, anti,
                                  num_buckets=num_buckets)


def q81_negative_samples(sf_dir: str) -> pd.DataFrame:
    # (user, props) is the sparse head→tail edge list in the synthetic
    # tables (user × event_type is fully saturated, which would filter
    # every corruption as a false negative).
    ds = _read(sf_dir, "events", ["user_id", "props"])
    return negative_samples(ds, "user_id", "props").to_pandas()


Q81_SQL = f"""
WITH t AS (
  SELECT DISTINCT user_id, props FROM events
), v AS (
  SELECT props,
         CAST(ROW_NUMBER() OVER (ORDER BY props) - 1 AS BIGINT) AS code
  FROM (SELECT DISTINCT props FROM events)
), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
c AS (
  SELECT t.user_id, t.props AS pos_props,
         ((t.user_id % {int(_NEG_KEY_MOD)}) * {int(_NEG_A)}
          + v.code * {int(_NEG_B)} + {int(_NEG_C)}) % n.n AS neg_code,
         v.code AS pos_code
  FROM t JOIN v ON t.props = v.props CROSS JOIN n
)
SELECT c.user_id, c.pos_props, v2.props AS neg_props
FROM c JOIN v v2 ON v2.code = c.neg_code
WHERE c.neg_code <> c.pos_code
  AND NOT EXISTS (SELECT 1 FROM t
                  WHERE t.user_id = c.user_id AND t.props = v2.props)
"""


# ---------------------------------------------------------------------------
# Q82 — fuzzy record linkage: blocking + vectorized Levenshtein verify
# ---------------------------------------------------------------------------

def levenshtein_batch(a: list[str], b: list[str]) -> np.ndarray:
    """Exact edit distance for N string pairs at once: the classic DP,
    but each DP cell update is a numpy op across the PAIR axis — no
    per-pair Python loop. O(La*Lb) vector ops of length N. Strings are
    compared as UTF-8 bytes (byte-level edits)."""
    n = len(a)
    if n == 0:
        return np.zeros(0, np.int64)
    ab = [s.encode("utf-8") for s in a]
    bb = [s.encode("utf-8") for s in b]
    la, lb = max(map(len, ab)), max(map(len, bb))
    am = np.zeros((n, la), np.uint8)
    bm = np.zeros((n, lb), np.uint8)
    alen = np.fromiter(map(len, ab), np.int64, count=n)
    blen = np.fromiter(map(len, bb), np.int64, count=n)
    for i, s in enumerate(ab):
        am[i, :len(s)] = np.frombuffer(s, np.uint8)
    for i, s in enumerate(bb):
        bm[i, :len(s)] = np.frombuffer(s, np.uint8)

    # prev[p, j] = distance(a_p[:i], b_p[:j]), vectorized over the pair
    # axis p. The within-row dependency cur[j] = min(cur[j], cur[j-1]+1)
    # is resolved without a Python scan by the standard transform
    #   cur[j] = j + cummin_{k<=j}(cur0[k] - k)
    # where cur0 carries only the substitute/delete terms. Padded b
    # positions (j > blen) never contaminate the readout at column
    # blen because DP values flow left-to-right only.
    jj = np.arange(lb + 1, dtype=np.int64)
    prev = np.tile(jj, (n, 1))
    result = np.where(alen == 0, blen, np.int64(0))
    rows = np.arange(n)
    for i in range(1, la + 1):
        ai = am[:, i - 1][:, None]
        cost = (ai != bm).astype(np.int64)
        cur0 = np.empty_like(prev)
        cur0[:, 0] = i
        np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost, out=cur0[:, 1:])
        cur = np.minimum.accumulate(cur0 - jj, axis=1) + jj
        done_now = alen == i
        if done_now.any():
            result = np.where(done_now, cur[rows, blen], result)
        prev = cur
    return result


def fuzzy_block_pairs(ds, key_col: str, name_col: str,
                      block_chars: int, max_dist: int,
                      block_cap: int = 20000) -> "rd.Dataset":
    """Blocked fuzzy self-join: candidate pairs share the first
    ``block_chars`` characters of ``name_col``; survivors have
    Levenshtein distance ≤ ``max_dist`` (computed by the vectorized
    kernel above). Emits (key_1, key_2, lev) with key_1 < key_2.

    The block shuffle ships (key, name) only. Blocks larger than
    ``block_cap`` rows are truncated to their ``key_col``-smallest
    members with a logged warning — the q17 reported-truncation
    discipline (an oversized block means the blocking key is too
    coarse, and silently quadratic work is worse than a visible cap).
    """

    def add_block(t: pa.Table) -> pa.Table:
        return pa.table({
            key_col: t[key_col],
            name_col: t[name_col],
            "__block": pc.utf8_slice_codeunits(t[name_col], 0, block_chars),
        })

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, grp in df.groupby("__block", sort=False):
            if len(grp) > block_cap:
                import logging
                logging.getLogger(__name__).warning(
                    "fuzzy block truncated: %d > cap %d",
                    len(grp), block_cap)
                grp = grp.nsmallest(block_cap, key_col)
            if len(grp) < 2:
                continue
            grp = grp.sort_values(key_col, kind="stable")
            keys = grp[key_col].to_numpy()
            names = grp[name_col].tolist()
            ii, jj = np.triu_indices(len(grp), k=1)
            d = levenshtein_batch([names[i] for i in ii],
                                  [names[j] for j in jj])
            keep = d <= max_dist
            frames.append(pd.DataFrame({
                "key_1": keys[ii[keep]],
                "key_2": keys[jj[keep]],
                "lev": d[keep].astype("int64"),
            }))
        if not frames:
            return pd.DataFrame({
                "key_1": pd.array([], dtype="int64"),
                "key_2": pd.array([], dtype="int64"),
                "lev": pd.array([], dtype="int64")})
        return pd.concat(frames, ignore_index=True)

    pre = ds.map_batches(add_block, batch_format="pyarrow")
    return grouped_by_key_buckets(pre, "__block", verify)


def q82_fuzzy_name_links(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    return fuzzy_block_pairs(ds, "c_custkey", "c_name",
                             block_chars=15, max_dist=2).to_pandas()


Q82_SQL = """
SELECT a.c_custkey AS key_1, b.c_custkey AS key_2,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS lev
FROM customer a JOIN customer b
  ON substr(a.c_name, 1, 15) = substr(b.c_name, 1, 15)
 AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 2
"""
