"""Corpus-curation operators for training-data pipelines (q45-q48).

Beyond-reference family (like q34-q39): the calibration / mixing /
clustering steps a 100 TB pretraining-data pipeline runs between the
dedup and quality passes that the rest of the repo covers. Every
operator is Dataset-plane, combiner-first, and hash-verified against a
DuckDB oracle with all-integer (or exact-string) output columns — the
q42b PageRank precedent: floats are either avoided outright or pinned
to identical IEEE-double operations on both engines.

* q45 — exact distributed quantiles of document length (the knob that
  sets length-filter thresholds): per-batch value-count combiner, one
  exchange of pre-reduced ``(value, cnt)`` rows, driver-side CDF over
  the vocabulary-sized histogram. ``percentile_disc`` semantics
  reproduced exactly (position ``ceil(q*n)``, verified against DuckDB
  across randomized n).
* q46 — stratified domain-mixture sampling (the Pile/Dolma data-mixing
  step): a deterministic Knuth multiplicative hash of the doc key
  against per-host target rates. Stateless vectorized filter, ZERO
  shuffles, reproducible without any stored sample state — the
  property that makes the sample resumable/checkpoint-free at 100 TB.
* q47 — distributed k-means over the embedding table (topic balancing
  / cluster-aware mixing): broadcast centroids, per-batch integer
  partial sums (quantized coordinates, so the reduce is exact and
  order-independent — run-to-run deterministic regardless of block
  arrival order), driver update of the K×D-sized state, T assignment
  rounds. The oracle unrolls the same Lloyd iterations as generated
  SQL CTEs (the q42b pattern).
* q48 — bigram language-model coverage scoring (the KenLM-shaped
  quality filter): a bigram model counted from a deterministic
  reference subset (combiner-first, one gram-keyed exchange of
  pre-reduced partials), broadcast once, then a single vectorized
  scoring scan (searchsorted against the sorted gram vocabulary — no
  per-row Python dict lookups). Integer outputs (occurrence counts and
  model-mass sums) keep the oracle exact; a real deployment swaps the
  coverage stats for log-prob sums behind the same plumbing.

Scale notes: q45's histogram is bounded by distinct document lengths
(≤ max doc bytes — vocabulary-sized at any corpus size); q46 never
shuffles; q47's per-round exchange is ``num_blocks × K`` bounded
partial rows and the model state is K×D; q48's model side mirrors the
q35 broadcast-probe shape — above a size gate the same score pass
becomes a hash join against the model table (documented, not needed
for a bigram vocabulary).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Sum

from ..state.broadcast import get_broadcast


def _read(sf_dir: str, table: str, columns=None):
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# Q45 — exact distributed quantiles of document length
# ---------------------------------------------------------------------------

# permille targets; 1-indexed sorted position is ceil(q*n) computed in
# IEEE double exactly as DuckDB's percentile_disc does (verified by a
# randomized sweep in tests/test_curation.py)
QUANTILES_PERMILLE = (10, 100, 250, 500, 750, 900, 990)


def exact_quantiles(ds, value_col: str,
                    permille=QUANTILES_PERMILLE) -> pd.DataFrame:
    """Exact percentile_disc over ``value_col`` via a value-count
    histogram: per-batch combiner → ONE exchange of pre-reduced
    ``(value, cnt)`` rows → driver CDF over the vocabulary-sized
    result. Never sorts or collects the corpus itself."""

    def partial(t: pa.Table) -> pa.Table:
        vc = t.column(value_col).value_counts()
        return pa.table({
            value_col: vc.field("values"),
            "cnt": pc.cast(vc.field("counts"), pa.int64()),
        })

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(value_col).aggregate(Sum("cnt")).to_pandas())
    if len(hist) == 0:
        return pd.DataFrame({"q_permille": pd.array([], dtype="int64"),
                             "value": pd.array([], dtype="int64")})
    vals = hist[value_col].to_numpy()
    cnts = hist["sum(cnt)"].to_numpy()
    order = np.argsort(vals, kind="stable")
    vals, cnts = vals[order], cnts[order]
    cum = np.cumsum(cnts)
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for pm in permille:
        if n == 0:
            break
        pos = max(math.ceil((pm / 1000.0) * n), 1)  # 1-indexed
        out_q.append(pm)
        out_v.append(int(vals[int(np.searchsorted(cum, pos))]))
    return pd.DataFrame({"q_permille": pd.array(out_q, dtype="int64"),
                         "value": pd.array(out_v, dtype="int64")})


def q45_length_quantiles(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", ["n_chars"])
    return exact_quantiles(ds, "n_chars")


# --- q75: approximate percentiles via a mergeable fixed-grid histogram
# (the approx_percentile operator class of Spark/Presto/DuckDB). q45's
# exact path ships one register per DISTINCT VALUE — unbounded for
# continuous metrics; this sketch bins values into a FIXED grid
# (bin = min(v // W, B-1)), so at ANY corpus size each block emits
# <= B pre-reduced (bin, cnt) rows and the estimate's error is bounded
# a priori by W-1 (the chosen bin's upper edge is returned; the true
# percentile_disc value lies in the same bin — pytest-gated against
# exact_quantiles). Registers are SUMS, so the sketch AND its
# quantized answer are block-split invariant and hash-verify exactly
# (the q68 CMS idiom); the position formula is the q45-verified
# ceil(pm*n/1000), in pure integer arithmetic on both engines.
HIST_BIN_WIDTH = 16
HIST_N_BINS = 4096


def approx_quantiles_histogram(ds, value_col: str,
                               permille=QUANTILES_PERMILLE,
                               bin_width: int = HIST_BIN_WIDTH,
                               n_bins: int = HIST_N_BINS) -> pd.DataFrame:
    def partial(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        bins = np.minimum(v // bin_width, n_bins - 1).astype(np.int64)
        cnt = np.bincount(bins, minlength=0)
        nz = np.flatnonzero(cnt)
        return pa.table({"bin": pa.array(nz, pa.int64()),
                         "cnt": pa.array(cnt[nz], pa.int64())})

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("bin").aggregate(Sum("cnt")).to_pandas())
    if len(hist) == 0:
        return pd.DataFrame({"q_permille": pd.array([], dtype="int64"),
                             "est_value": pd.array([], dtype="int64")})
    bins = hist["bin"].to_numpy()
    cnts = hist["sum(cnt)"].to_numpy()
    order = np.argsort(bins, kind="stable")
    bins, cnts = bins[order], cnts[order]
    cum = np.cumsum(cnts)
    n = int(cum[-1])
    out_q, out_v = [], []
    for pm in permille:
        pos = max((pm * n + 999) // 1000, 1)   # integer ceil(pm*n/1000)
        b = int(bins[int(np.searchsorted(cum, pos))])
        out_q.append(pm)
        out_v.append((b + 1) * bin_width - 1)  # bin upper edge
    return pd.DataFrame({"q_permille": pd.array(out_q, dtype="int64"),
                         "est_value": pd.array(out_v, dtype="int64")})


def q75_approx_length_quantiles(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", ["n_chars"])
    return approx_quantiles_histogram(ds, "n_chars")


_Q75_PM_VALUES = ", ".join(f"({pm})" for pm in QUANTILES_PERMILLE)


# --- q76: GROUPED approx quantiles (per-domain percentile profile).
# The per-host calibration pass every domain-aware quality filter
# needs (CCNet buckets its perplexity thresholds per language/domain
# the same way): p10..p99 of doc length PER source. Distribution: the
# q75 fixed-grid sketch per (key, bin) — each block emits <= keys×B
# pre-reduced rows — through ONE hash(key)-bucket exchange
# (grouped_by_key_buckets: one dispatch per BUCKET, never per key, so
# millions of hosts don't become millions of map_groups dispatches),
# then a fully VECTORIZED in-bucket solve: per-key cumsum + 7
# first-row-past-position selections via boolean idxmax — no Python
# loop over keys anywhere. Same integer position/upper-edge arithmetic
# as q75, so the grouped estimates hash-verify against a
# PARTITION-BY-key windowed SQL oracle.
def grouped_approx_quantiles(ds, key_col: str, value_col: str,
                             permille=QUANTILES_PERMILLE,
                             bin_width: int = HIST_BIN_WIDTH,
                             n_bins: int = HIST_N_BINS) -> pd.DataFrame:
    from ..stages.windows import grouped_by_key_buckets

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        bins = np.minimum(v // bin_width, n_bins - 1).astype(np.int64)
        g = (pa.table({key_col: t[key_col],
                       "bin": pa.array(bins, pa.int64())})
             .group_by([key_col, "bin"]).aggregate([([], "count_all")]))
        return g.rename_columns([key_col, "bin", "cnt"])

    cols = [key_col, "q_permille", "est_value"]

    def solve(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({key_col: pd.array([], dtype="str"),
                                 "q_permille": pd.array([], dtype="int64"),
                                 "est_value": pd.array([], dtype="int64")})
        # combine same-(key, bin) partials from different blocks, then
        # per-key CDF — all columnar, no per-key dispatch
        h = (df.groupby([key_col, "bin"], as_index=False)["cnt"].sum()
             .sort_values([key_col, "bin"], kind="stable",
                          ignore_index=True))
        cum = h.groupby(key_col, sort=False)["cnt"].cumsum().to_numpy()
        n = h.groupby(key_col, sort=False)["cnt"].transform("sum").to_numpy()
        outs = []
        for pm in permille:
            pos = np.maximum((pm * n + 999) // 1000, 1)
            hit = pd.Series(cum >= pos)  # first True per key = the bin
            idx = hit.groupby(h[key_col], sort=False).idxmax().to_numpy()
            sel = h.iloc[idx]
            outs.append(pd.DataFrame({
                key_col: sel[key_col].to_numpy(),
                "q_permille": np.full(len(sel), pm, dtype=np.int64),
                "est_value": ((sel["bin"].to_numpy() + 1) * bin_width - 1
                              ).astype(np.int64)}))
        return pd.concat(outs, ignore_index=True)[cols]

    out = grouped_by_key_buckets(
        ds.map_batches(partial, batch_format="pyarrow"), key_col, solve
    ).to_pandas()
    return out.sort_values([key_col, "q_permille"],
                           ignore_index=True)[cols]


def q76_source_length_quantiles(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", ["source", "n_chars"])
    return grouped_approx_quantiles(ds, "source", "n_chars")


# --- q78: percentile-rank transform (CDF normalization) WITHOUT a
# global sort. Quality scores from different featurizers are only
# comparable after rank-normalizing each to its corpus CDF (the
# quantile-transform step before mixing/filtering on a combined
# score). The naive route is a global sort + window rank — an
# all-to-all of every row. This one is two passes, no row ever
# re-shuffled: (1) the q45 value-count histogram (pre-reduced
# (value, cnt) rows, vocabulary-sized), (2) the sorted CDF broadcast
# once via ray.put and every row's rank attached MAP-SIDE by
# searchsorted. Rank = COUNT of strictly-smaller rows — an integer, so
# the transform hash-verifies against the SQL window exactly. At
# 100 TB with a continuous metric, swap pass 1 for the q75 fixed-grid
# histogram (same plumbing, W-bounded rank error).
def rank_transform(ds, value_col: str, out_col: str = "n_smaller"):
    def partial(t: pa.Table) -> pa.Table:
        vc = t.column(value_col).value_counts()
        return pa.table({"v": vc.field("values"),
                         "cnt": pc.cast(vc.field("counts"), pa.int64())})

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("v").aggregate(Sum("cnt")).to_pandas())
    vals = hist["v"].to_numpy()
    order = np.argsort(vals, kind="stable")
    vals = vals[order]
    below = np.concatenate(
        ([0], np.cumsum(hist["sum(cnt)"].to_numpy()[order])[:-1]))
    cdf_ref = ray.put((vals, below.astype(np.int64)))

    def attach(t: pa.Table) -> pa.Table:
        cvals, cbelow = get_broadcast(cdf_ref)
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(cvals, v, side="left")
        return t.append_column(out_col, pa.array(cbelow[idx], pa.int64()))

    return ds.map_batches(attach, batch_format="pyarrow")


def q78_rank_transform(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    return rank_transform(ds, "n_chars").to_pandas()


Q78_SQL = """
SELECT doc_id, n_chars,
       CAST(COUNT(*) OVER (
            ORDER BY n_chars
            RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            AS BIGINT) AS n_smaller
FROM documents
"""


Q76_SQL = f"""
WITH v AS (
  SELECT source, LEAST(n_chars // {HIST_BIN_WIDTH}, {HIST_N_BINS - 1}) AS bin
  FROM documents
), h AS (
  SELECT source, bin, COUNT(*) AS c FROM v GROUP BY source, bin
), s AS (
  SELECT source, bin,
         SUM(c) OVER (PARTITION BY source ORDER BY bin) AS cum,
         SUM(c) OVER (PARTITION BY source) AS n
  FROM h
)
SELECT s.source, CAST(q.pm AS BIGINT) AS q_permille,
       CAST(MIN((s.bin + 1) * {HIST_BIN_WIDTH} - 1) AS BIGINT) AS est_value
FROM (VALUES {_Q75_PM_VALUES}) q(pm)
JOIN s ON s.cum >= GREATEST((q.pm * s.n + 999) // 1000, 1)
GROUP BY s.source, q.pm
"""


Q75_SQL = f"""
WITH v AS (
  SELECT LEAST(n_chars // {HIST_BIN_WIDTH}, {HIST_N_BINS - 1}) AS bin
  FROM documents
), h AS (
  SELECT bin, COUNT(*) AS c FROM v GROUP BY bin
), s AS (
  SELECT bin, SUM(c) OVER (ORDER BY bin) AS cum FROM h
), nn AS (SELECT COUNT(*) AS n FROM documents)
SELECT CAST(q.pm AS BIGINT) AS q_permille,
       CAST(MIN((s.bin + 1) * {HIST_BIN_WIDTH} - 1) AS BIGINT) AS est_value
FROM (VALUES {_Q75_PM_VALUES}) q(pm) CROSS JOIN nn
JOIN s ON s.cum >= GREATEST((q.pm * nn.n + 999) // 1000, 1)
GROUP BY q.pm
"""


Q45_SQL = "\nUNION ALL\n".join(
    f"SELECT CAST({pm} AS BIGINT) AS q_permille, "
    f"percentile_disc({pm / 1000.0}) WITHIN GROUP (ORDER BY n_chars) AS value "
    f"FROM documents"
    for pm in QUANTILES_PERMILLE
)


# ---------------------------------------------------------------------------
# Q46 — stratified domain-mixture sampling
# ---------------------------------------------------------------------------

# Knuth multiplicative hash: deterministic, seedless, identical integer
# arithmetic in numpy int64 and DuckDB BIGINT (doc_id * KNUTH stays
# below 2^63 for doc_id < ~3.4e9; the documented scale path splits the
# key into 32-bit halves first).
_KNUTH = 2654435761
_MIX_MOD = 1000


def _mix_rate_permille(host_id):
    """Per-host target sampling rate (deterministic spread 50..930)."""
    return 50 + 55 * host_id


def q46_domain_mixture_sample(sf_dir: str) -> pd.DataFrame:
    """Keep each document iff hash(doc_id) lands under its host's
    target rate — the domain-reweighting sample, reproducible from the
    key alone (zero shuffles, no stored sample state). Hosts are the
    same deterministic doc_id%17 spread as q33/q34."""
    ds = _read(sf_dir, "documents", ["doc_id"])

    def keep(t: pa.Table) -> pa.Table:
        doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hid = doc % 17
        rate = _mix_rate_permille(hid)
        h = (doc * _KNUTH) % 4294967296 % _MIX_MOD
        m = h < rate
        kept, khid = doc[m], hid[m]
        hid_s = pc.cast(pa.array(khid, pa.int64()), pa.string())
        host = pc.binary_join_element_wise(
            "https://cdn", hid_s, ".example.org", "")
        return pa.table({
            "doc_id": pa.array(kept, pa.int64()),
            "host": host,
            "rate_permille": pa.array(_mix_rate_permille(khid), pa.int64()),
        })

    return ds.map_batches(keep, batch_format="pyarrow").to_pandas()


Q46_SQL = f"""
SELECT doc_id,
       'https://cdn' || CAST(doc_id % 17 AS VARCHAR) || '.example.org' AS host,
       CAST(50 + 55 * (doc_id % 17) AS BIGINT) AS rate_permille
FROM documents
WHERE ((doc_id * {_KNUTH}) % 4294967296) % {_MIX_MOD} < 50 + 55 * (doc_id % 17)
"""


# ---------------------------------------------------------------------------
# Q47 — distributed k-means over the embedding table
# ---------------------------------------------------------------------------

_KMEANS_K = 8
_KMEANS_ROUNDS = 3           # assignment rounds (Lloyd); updates between
_KMEANS_SCALE = 1048576.0    # 2^20: float32*2^20 is exact in float64


def _quantize(x: np.ndarray) -> np.ndarray:
    """Round-half-away-from-zero to int64 — DuckDB ROUND semantics
    (numpy's .round is half-even). x*SCALE is exactly representable
    (float32 mantissa shifted), so ties are deterministic."""
    xs = x.astype(np.float64) * _KMEANS_SCALE
    return np.where(xs >= 0, np.floor(xs + 0.5),
                    np.ceil(xs - 0.5)).astype(np.int64)


def _kmeans_quantized(t: pa.Table) -> np.ndarray:
    from ..stages.similarity import _as_matrix

    return _quantize(_as_matrix(t, "embedding"))


def kmeans_assign(ds, k: int = _KMEANS_K, rounds: int = _KMEANS_ROUNDS):
    """Lloyd's algorithm, Ray-Data-shaped: centroids broadcast per
    round, per-batch INTEGER partial sums (quantized coordinates make
    the cross-block reduce exact and order-independent — the output is
    identical regardless of block arrival order), K×D driver state.
    Returns the final (vec_id, cluster) assignment Dataset.

    Initial centroids are the embeddings of vec_id < k. Empty clusters
    keep their previous centroid (both engines agree). At 100 TB each
    round is one corpus scan with a num_blocks×K-bounded partial
    exchange; you would persist the quantized matrix once to Parquet
    instead of re-deriving it per round."""
    init = (ds.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], pa.scalar(k))),
        batch_format="pyarrow").to_pandas().sort_values("vec_id"))
    if len(init) < k:
        raise ValueError(f"need vec_id 0..{k-1} present for seeding")
    emb = np.stack([np.asarray(e, dtype=np.float32)
                    for e in init["embedding"]])
    centroids = _quantize(emb).astype(np.float64)

    def assign(xq: np.ndarray, cents: np.ndarray) -> np.ndarray:
        # ||x-c||^2; argmin takes the lowest cluster index on ties
        d = ((xq[:, None, :].astype(np.float64) - cents[None, :, :]) ** 2
             ).sum(axis=2)
        return d.argmin(axis=1)

    for _ in range(rounds - 1):
        c_ref = ray.put(centroids)

        def partial_sums(t: pa.Table) -> pa.Table:
            xq = _kmeans_quantized(t)
            a = assign(xq, get_broadcast(c_ref))
            cols: dict = {"k": pa.array(np.arange(_KMEANS_K), pa.int64())}
            sums = np.zeros((_KMEANS_K, xq.shape[1]), np.int64)
            np.add.at(sums, a, xq)
            cnt = np.bincount(a, minlength=_KMEANS_K).astype(np.int64)
            cols["m"] = pa.array(cnt, pa.int64())
            for d_i in range(xq.shape[1]):
                cols[f"s{d_i}"] = pa.array(sums[:, d_i], pa.int64())
            return pa.table(cols)

        parts = ds.map_batches(partial_sums,
                               batch_format="pyarrow").to_pandas()
        red = parts.groupby("k", as_index=True).sum().sort_index()
        m = red["m"].to_numpy().astype(np.float64)
        s = red[[f"s{i}" for i in range(centroids.shape[1])]].to_numpy(
        ).astype(np.float64)
        nonempty = m > 0
        centroids = centroids.copy()
        centroids[nonempty] = s[nonempty] / m[nonempty, None]

    c_ref = ray.put(centroids)

    def final_assign(t: pa.Table) -> pa.Table:
        a = assign(_kmeans_quantized(t), get_broadcast(c_ref))
        return pa.table({"vec_id": t["vec_id"],
                         "cluster": pa.array(a.astype(np.int64), pa.int64())})

    return ds.map_batches(final_assign, batch_format="pyarrow")


def q47_kmeans_clusters(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return kmeans_assign(ds).to_pandas()


def _q47_sql(k: int = _KMEANS_K, rounds: int = _KMEANS_ROUNDS) -> str:
    """The same Lloyd rounds unrolled as SQL CTEs (q42b pattern):
    identical quantization (ROUND is half-away in DuckDB, matching
    _quantize), identical integer centroid sums, identical double
    division — the engines evaluate the same IEEE doubles end to end
    up to intra-sum ordering, and assignments are integers."""
    parts = [f"""ptsq AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS d,
         CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * {_KMEANS_SCALE}, 0)
              AS BIGINT) AS xq
  FROM embeddings
)""", f"""c0 AS (
  SELECT vec_id AS k, d, CAST(xq AS DOUBLE) AS c FROM ptsq WHERE vec_id < {k}
)"""]
    for i in range(1, rounds + 1):
        prev = f"c{i - 1}"
        parts.append(f"""dist{i} AS (
  SELECT p.vec_id, c.k,
         SUM((CAST(p.xq AS DOUBLE) - c.c) * (CAST(p.xq AS DOUBLE) - c.c)) AS dd
  FROM ptsq p JOIN {prev} c ON c.d = p.d
  GROUP BY p.vec_id, c.k
)""")
        parts.append(f"""a{i} AS (
  SELECT vec_id, k FROM (
    SELECT vec_id, k,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dd, k) AS rn
    FROM dist{i}) WHERE rn = 1
)""")
        if i < rounds:
            parts.append(f"""c{i} AS (
  SELECT pc.k, pc.d, COALESCE(u.s / u.m, pc.c) AS c
  FROM {prev} pc LEFT JOIN (
    SELECT a.k, p.d, CAST(SUM(p.xq) AS DOUBLE) AS s,
           CAST(COUNT(*) AS DOUBLE) AS m
    FROM a{i} a JOIN ptsq p ON p.vec_id = a.vec_id
    GROUP BY a.k, p.d) u ON u.k = pc.k AND u.d = pc.d
)""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT vec_id, CAST(k AS BIGINT) AS cluster FROM a{rounds}")


Q47_SQL = _q47_sql()


# ---------------------------------------------------------------------------
# Q48 — bigram language-model coverage scoring
# ---------------------------------------------------------------------------

_LM_SUBSET_MOD = 29  # model reference subset: doc_id % 29 == 0


def _bigrams_flat(t: pa.Table):
    """Vectorized within-document bigram minting (the q44 idiom at
    n=2): returns (grams Arrow array, parent doc row index ndarray)."""
    words = pc.split_pattern(t["text"], " ")
    flat = pc.list_flatten(words).combine_chunks()
    if len(flat) < 2:
        return pa.array([], pa.string()), np.zeros(0, np.int64)
    par = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
    m = len(flat) - 1
    grams = pc.binary_join_element_wise(flat.slice(0, m), flat.slice(1, m),
                                        " ")
    same_doc = par[:m] == par[1:]
    return grams.filter(pa.array(same_doc)), par[:m][same_doc]


def q48_bigram_lm_score(sf_dir: str) -> pd.DataFrame:
    """Score every document against a bigram model counted from the
    deterministic reference subset. Outputs exact integers per doc:
    total bigram occurrences, occurrences known to the model, and the
    summed model counts of the known occurrences (the order-independent
    integer stand-in for a log-prob sum; docs with zero bigrams carry
    no row, matching the oracle's bigram-table join)."""
    from ..stages.windows import grouped_by_key_buckets

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def model_partial(t: pa.Table) -> pa.Table:
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        sub = t.filter(pa.array(doc % _LM_SUBSET_MOD == 0))
        grams, _ = _bigrams_flat(sub)
        g = pa.table({"gram": grams}).group_by("gram").aggregate(
            [("gram", "count")])
        return pa.table({"gram": g["gram"],
                         "cnt": pc.cast(g["gram_count"], pa.int64())})

    def model_final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("gram", as_index=False)["cnt"].sum()
        out["cnt"] = out["cnt"].astype("int64")
        return out

    model = grouped_by_key_buckets(
        ds.map_batches(model_partial, batch_format="pyarrow"),
        "gram", model_final).to_pandas()
    # bigram-vocabulary-sized by construction (q35 broadcast-probe
    # shape); above a byte gate this becomes a hash join on gram
    model = model.sort_values("gram", kind="stable")
    grams_sorted = model["gram"].to_numpy(dtype=object)
    counts_sorted = model["cnt"].to_numpy().astype(np.int64)
    m_ref = ray.put((grams_sorted, counts_sorted))

    def score(t: pa.Table) -> pa.Table:
        g_sorted, c_sorted = get_broadcast(m_ref)
        grams, par = _bigrams_flat(t)
        n_rows = t.num_rows
        garr = grams.to_numpy(zero_copy_only=False)
        if len(g_sorted):
            pos = np.searchsorted(g_sorted, garr)
            pos_c = np.clip(pos, 0, len(g_sorted) - 1)
            known = g_sorted[pos_c] == garr
            mass = np.where(known, c_sorted[pos_c], 0)
        else:
            known = np.zeros(len(garr), bool)
            mass = np.zeros(len(garr), np.int64)
        n_bi = np.bincount(par, minlength=n_rows).astype(np.int64)
        n_known = np.bincount(par, weights=known.astype(np.float64),
                              minlength=n_rows).astype(np.int64)
        kmass = np.bincount(par, weights=mass.astype(np.float64),
                            minlength=n_rows).astype(np.int64)
        keep = n_bi > 0
        return pa.table({
            "doc_id": t["doc_id"].filter(pa.array(keep)),
            "n_bigrams": pa.array(n_bi[keep], pa.int64()),
            "n_known": pa.array(n_known[keep], pa.int64()),
            "known_mass": pa.array(kmass[keep], pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow").to_pandas()


# ---------------------------------------------------------------------------
# Q49 — SemDeDup-lite: k-means-cell-bounded exact near-dup over embeddings
# ---------------------------------------------------------------------------

# Near-dup pairs are planted by unioning the table with integer-
# perturbed copies (id+100000, each quantized coordinate shifted by a
# deterministic hash in -3..+3 quanta) — the same plant-and-recover
# protocol as q17c/q18b/q19b. EVERYTHING downstream is int64: cells are
# the argmin-L2 assignment to the quantized seed centroids (vec_id<8),
# so there are no float ties anywhere and both engines agree exactly.
_SEMDEDUP_R2 = 10_000        # planted pairs have d2 <= 64*9 = 576;
#                              the nearest natural pair is ~1e12
_SEMDEDUP_COPY_OFFSET = 100_000
_SEMDEDUP_PERT_MOD = 7


def _pert(ids: np.ndarray, dim: int) -> np.ndarray:
    """(n, dim) deterministic perturbation in -3..+3 quanta; d is
    1-based to match SQL generate_subscripts."""
    d = np.arange(1, dim + 1, dtype=np.int64)[None, :]
    return ((ids[:, None] * 31 + d) * _KNUTH) % 4294967296 \
        % _SEMDEDUP_PERT_MOD - 3


def q49_semantic_dedup(sf_dir: str) -> pd.DataFrame:
    """SemDeDup-shaped semantic dedup: cluster cells bound the
    comparison space (never all-pairs), then exact integer L2 within
    each cell. One corpus scan to assign + ONE cell-keyed exchange;
    at 100 TB you add a per-cell pair cap with reported truncation
    (the LSH-bucket discipline in stages/dedup.py) and ship int16
    quantized vectors instead of the raw floats."""
    from ..stages.windows import grouped_by_key_buckets

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    init = (ds.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], pa.scalar(_KMEANS_K))),
        batch_format="pyarrow").to_pandas().sort_values("vec_id"))
    emb = np.stack([np.asarray(e, dtype=np.float32)
                    for e in init["embedding"]])
    cents = _quantize(emb)                       # (K, D) int64 — exact
    c_ref = ray.put(cents)

    def assign_union(t: pa.Table) -> pa.Table:
        xq = _kmeans_quantized(t)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        xq2 = xq + _pert(ids, xq.shape[1])       # perturbed copies
        allq = np.concatenate([xq, xq2])
        pid = np.concatenate([ids, ids + _SEMDEDUP_COPY_OFFSET])
        c = get_broadcast(c_ref)
        d2 = ((allq[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        cell = d2.argmin(axis=1).astype(np.int64)
        flat = pa.array(allq.ravel(), pa.int64())
        offs = pa.array(np.arange(len(pid) + 1, dtype=np.int32)
                        * allq.shape[1])
        return pa.table({"pid": pa.array(pid, pa.int64()),
                         "cell": pa.array(cell, pa.int64()),
                         "xq": pa.ListArray.from_arrays(offs, flat)})

    pts = ds.map_batches(assign_union, batch_format="pyarrow")

    def pairs_in_cells(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_d = [], [], []
        for _, g in df.groupby("cell", sort=False):
            x = np.stack(g["xq"].to_numpy())
            pid = g["pid"].to_numpy()
            order = np.argsort(pid, kind="stable")
            x, pid = x[order], pid[order]
            d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(axis=2)
            ia, ib = np.triu_indices(len(pid), 1)
            hit = d2[ia, ib] <= _SEMDEDUP_R2
            out_a.append(pid[ia[hit]])
            out_b.append(pid[ib[hit]])
            out_d.append(d2[ia[hit], ib[hit]])
        if not out_a:
            return pd.DataFrame({"id_a": pd.array([], dtype="int64"),
                                 "id_b": pd.array([], dtype="int64"),
                                 "d2": pd.array([], dtype="int64")})
        return pd.DataFrame({
            "id_a": np.concatenate(out_a).astype("int64"),
            "id_b": np.concatenate(out_b).astype("int64"),
            "d2": np.concatenate(out_d).astype("int64")})

    return grouped_by_key_buckets(pts, "cell", pairs_in_cells).to_pandas()


Q49_SQL = f"""
WITH base AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS d,
         CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * {_KMEANS_SCALE}, 0)
              AS BIGINT) AS xq
  FROM embeddings
), pts AS (
  SELECT vec_id AS pid, d, xq FROM base
  UNION ALL
  SELECT vec_id + {_SEMDEDUP_COPY_OFFSET}, d,
         xq + ((((vec_id * 31 + d) * {_KNUTH}) % 4294967296)
               % {_SEMDEDUP_PERT_MOD}) - 3
  FROM base
), c0 AS (
  SELECT pid AS k, d, xq AS c FROM pts WHERE pid < {_KMEANS_K}
), dist AS (
  SELECT p.pid, c.k, SUM((p.xq - c.c) * (p.xq - c.c)) AS dd
  FROM pts p JOIN c0 c ON c.d = p.d GROUP BY p.pid, c.k
), a AS (
  SELECT pid, k FROM (
    SELECT pid, k, ROW_NUMBER() OVER (PARTITION BY pid ORDER BY dd, k) AS rn
    FROM dist) WHERE rn = 1
), pairs AS (
  SELECT x.pid AS id_a, y.pid AS id_b
  FROM a x JOIN a y ON x.k = y.k AND x.pid < y.pid
), pd AS (
  SELECT p.id_a, p.id_b, SUM((x.xq - y.xq) * (x.xq - y.xq)) AS d2
  FROM pairs p
  JOIN pts x ON x.pid = p.id_a
  JOIN pts y ON y.pid = p.id_b AND y.d = x.d
  GROUP BY p.id_a, p.id_b
)
SELECT id_a, id_b, CAST(d2 AS BIGINT) AS d2 FROM pd WHERE d2 <= {_SEMDEDUP_R2}
"""


# ---------------------------------------------------------------------------
# Q50 — BPE tokenizer training (distributed word-frequency pass +
# vocabulary-sized merge loop)
# ---------------------------------------------------------------------------

# Real BPE trainers (GPT-2/SentencePiece-style) scan the corpus ONCE
# for word frequencies — the only corpus-sized step, distributed here
# as a per-batch value-count combiner + one word-keyed exchange of
# pre-reduced rows — then run the merge loop over the vocabulary-sized
# (word, freq) table. The merge loop uses a wrapped-symbol string
# encoding (\x01 sym \x02, space-joined) whose str.replace is EXACTLY
# the greedy-left non-overlapping symbol-list merge, with no
# cross-symbol false matches; DuckDB's replace has identical
# semantics, so the oracle unrolls the same merges as CTEs (the
# q42b/q47 pattern). Tie-break: max count, then lexicographically
# smallest (left, right) — binary collation on both engines.
_BPE_MERGES = 6
_BPE_W0, _BPE_W1 = "\x01", "\x02"  # symbol wrappers (never in corpus words)


def _bpe_seq(word: str) -> str:
    return " ".join(_BPE_W0 + ch + _BPE_W1 for ch in word)


def bpe_train(word_freq: pd.DataFrame, n_merges: int = _BPE_MERGES
              ) -> pd.DataFrame:
    """Merge loop over the vocabulary-sized (word, f) table: returns
    one row per merge step (step, l, r, cnt)."""
    from collections import Counter

    seqs = {w: _bpe_seq(w) for w in word_freq["word"]}
    freq = dict(zip(word_freq["word"], word_freq["f"]))
    out_step, out_l, out_r, out_c = [], [], [], []
    for step in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for w, seq in seqs.items():
            syms = [s[1:-1] for s in seq.split(" ")]
            f = freq[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        (l, r), cnt = min(pairs.items(),
                          key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        pat = _BPE_W0 + l + _BPE_W1 + " " + _BPE_W0 + r + _BPE_W1
        rep = _BPE_W0 + l + r + _BPE_W1
        seqs = {w: s.replace(pat, rep) for w, s in seqs.items()}
        out_step.append(step)
        out_l.append(l)
        out_r.append(r)
        out_c.append(int(cnt))
    return pd.DataFrame({"step": pd.array(out_step, dtype="int64"),
                         "l": out_l, "r": out_r,
                         "cnt": pd.array(out_c, dtype="int64")})


def word_frequencies(ds, text_col: str = "text") -> pd.DataFrame:
    """Distributed (word, f) table: per-batch value-count combiner +
    one word-keyed exchange of pre-reduced rows. The only corpus-sized
    step of BPE training (q50) and the vocabulary source for corpus
    tokenization (q70)."""
    from ..stages.windows import grouped_by_key_buckets

    def wf_partial(t: pa.Table) -> pa.Table:
        words = pc.list_flatten(pc.split_pattern(t[text_col], " "))
        words = words.filter(pc.not_equal(words, pa.scalar("")))
        vc = words.value_counts()
        return pa.table({"word": vc.field("values"),
                         "f": pc.cast(vc.field("counts"), pa.int64())})

    def wf_final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("word", as_index=False)["f"].sum()
        out["f"] = out["f"].astype("int64")
        return out

    return grouped_by_key_buckets(
        ds.map_batches(wf_partial, batch_format="pyarrow"),
        "word", wf_final).to_pandas()


def q50_bpe_merges(sf_dir: str) -> pd.DataFrame:
    return bpe_train(word_frequencies(_read(sf_dir, "documents", ["text"])))


def _q50_sql(n_merges: int = _BPE_MERGES) -> str:
    w0, w1 = "chr(1)", "chr(2)"
    parts = [f"""wf AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS f FROM (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY word
)""", f"""s0 AS (
  SELECT word, f,
         array_to_string(list_transform(generate_series(1, length(word)),
                                        i -> {w0} || word[i] || {w1}),
                         ' ') AS seq
  FROM wf
)"""]
    for i in range(1, n_merges + 1):
        prev = f"s{i - 1}"
        parts.append(f"""t{i} AS (
  SELECT word, f, unnest(string_split(seq, ' ')) AS sym,
         generate_subscripts(string_split(seq, ' '), 1) AS idx
  FROM {prev}
)""")
        parts.append(f"""c{i} AS (
  SELECT substr(sym, 2, length(sym) - 2) AS l,
         substr(nxt, 2, length(nxt) - 2) AS r,
         CAST(SUM(f) AS BIGINT) AS cnt
  FROM (SELECT f, sym, LEAD(sym) OVER (PARTITION BY word ORDER BY idx) AS nxt
        FROM t{i})
  WHERE nxt IS NOT NULL GROUP BY 1, 2
)""")
        parts.append(
            f"b{i} AS (SELECT l, r, cnt FROM c{i} "
            f"ORDER BY cnt DESC, l, r LIMIT 1)")
        if i < n_merges:
            parts.append(f"""s{i} AS (
  SELECT word, f,
         replace(seq,
                 (SELECT {w0} || l || {w1} || ' ' || {w0} || r || {w1} FROM b{i}),
                 (SELECT {w0} || l || r || {w1} FROM b{i})) AS seq
  FROM {prev}
)""")
    final = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS step, l, r, cnt FROM b{i}"
        for i in range(1, n_merges + 1))
    return "WITH " + ",\n".join(parts) + "\n" + final


Q50_SQL = _q50_sql()


# ---------------------------------------------------------------------------
# Q70 — corpus tokenization with the trained BPE (apply q50's merges)
# ---------------------------------------------------------------------------

# The missing half of the tokenizer story: q50 TRAINS the merges, q70
# APPLIES them across the corpus — the pass that feeds q39's
# token-budget sharding with real (not whitespace) token counts. The
# merge applications run ONCE over the vocabulary-sized word table on
# the driver (the same greedy-left wrapped-symbol replace the trainer
# used, so train/apply can never disagree on segmentation); the
# resulting word -> token-count model is broadcast once and the corpus
# pass is a ZERO-SHUFFLE vectorized searchsorted scan (the q48 shape).
# At 100 TB the vocabulary table rides the documented size-gate
# precedent (hash join on word above the byte gate).


def bpe_apply(word_freq: pd.DataFrame, merges: pd.DataFrame) -> dict[str, str]:
    """Final wrapped-symbol sequence per vocabulary word after applying
    the merge list in training order."""
    seqs = {w: _bpe_seq(w) for w in word_freq["word"]}
    for l, r in zip(merges["l"], merges["r"]):
        pat = _BPE_W0 + l + _BPE_W1 + " " + _BPE_W0 + r + _BPE_W1
        rep = _BPE_W0 + l + r + _BPE_W1
        seqs = {w: s.replace(pat, rep) for w, s in seqs.items()}
    return seqs


def bpe_token_counts(ds, id_col: str, text_col: str,
                     word_freq: pd.DataFrame, merges: pd.DataFrame):
    """Per-document BPE token counts. Words outside the training
    vocabulary fall back to character count (the no-merge encoding);
    documents with no words emit no row (inner-join semantics)."""
    seqs = bpe_apply(word_freq, merges)
    vocab = np.array(sorted(seqs), dtype=object)
    lens = np.array([seqs[w].count(" ") + 1 for w in vocab], np.int64)
    ref = ray.put((vocab, lens))

    def count(t: pa.Table) -> pa.Table:
        v, ln = get_broadcast(ref)
        words = pc.split_pattern(t[text_col], " ")
        flat = pc.list_flatten(words)
        par = pc.list_parent_indices(words)
        keep = pc.not_equal(flat, pa.scalar(""))
        flat, par = flat.filter(keep), par.filter(keep)
        warr = flat.to_numpy(zero_copy_only=False)
        parr = par.to_numpy(zero_copy_only=False)
        if len(v) and len(warr):
            pos = np.clip(np.searchsorted(v, warr), 0, len(v) - 1)
            known = v[pos] == warr
            n = np.where(known, ln[pos],
                         np.fromiter((len(w) for w in warr), np.int64,
                                     len(warr)))
        else:
            n = np.fromiter((len(w) for w in warr), np.int64, len(warr))
        n_rows = t.num_rows
        tot = np.bincount(parr, weights=n.astype(np.float64),
                          minlength=n_rows).astype(np.int64)
        hit = np.bincount(parr, minlength=n_rows)
        keep_rows = pa.array(hit > 0)
        return pa.table({id_col: t[id_col].filter(keep_rows),
                         "n_bpe": pa.array(tot[hit > 0], pa.int64())})

    return ds.map_batches(count, batch_format="pyarrow")


def q70_bpe_tokenize(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    wf = word_frequencies(ds)
    merges = bpe_train(wf)
    return bpe_token_counts(ds, "doc_id", "text", wf, merges).to_pandas()


def _q70_sql(n_merges: int = _BPE_MERGES) -> str:
    """q50's unrolled merge CTEs carried to the FINAL sequence table,
    then token counts joined back onto the document word stream."""
    w0, w1 = "chr(1)", "chr(2)"
    parts = [f"""wf AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS f FROM (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY word
)""", f"""s0 AS (
  SELECT word, f,
         array_to_string(list_transform(generate_series(1, length(word)),
                                        i -> {w0} || word[i] || {w1}),
                         ' ') AS seq
  FROM wf
)"""]
    for i in range(1, n_merges + 1):
        prev = f"s{i - 1}"
        parts.append(f"""t{i} AS (
  SELECT word, f, unnest(string_split(seq, ' ')) AS sym,
         generate_subscripts(string_split(seq, ' '), 1) AS idx
  FROM {prev}
)""")
        parts.append(f"""c{i} AS (
  SELECT substr(sym, 2, length(sym) - 2) AS l,
         substr(nxt, 2, length(nxt) - 2) AS r,
         CAST(SUM(f) AS BIGINT) AS cnt
  FROM (SELECT f, sym, LEAD(sym) OVER (PARTITION BY word ORDER BY idx) AS nxt
        FROM t{i})
  WHERE nxt IS NOT NULL GROUP BY 1, 2
)""")
        parts.append(
            f"b{i} AS (SELECT l, r, cnt FROM c{i} "
            f"ORDER BY cnt DESC, l, r LIMIT 1)")
        parts.append(f"""s{i} AS (
  SELECT word, f,
         replace(seq,
                 (SELECT {w0} || l || {w1} || ' ' || {w0} || r || {w1} FROM b{i}),
                 (SELECT {w0} || l || r || {w1} FROM b{i})) AS seq
  FROM {prev}
)""")
    parts.append(f"""wl AS (
  SELECT word, CAST(len(string_split(seq, ' ')) AS BIGINT) AS n
  FROM s{n_merges}
)""")
    parts.append("""tok AS (
  SELECT doc_id, word FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> ''
)""")
    return ("WITH " + ",\n".join(parts) + "\n"
            "SELECT tok.doc_id, CAST(SUM(wl.n) AS BIGINT) AS n_bpe\n"
            "FROM tok JOIN wl USING (word) GROUP BY tok.doc_id")


Q70_SQL = _q70_sql()


# ---------------------------------------------------------------------------
# Q51 — HyperLogLog distinct-count registers (sketch aggregation)
# ---------------------------------------------------------------------------

# The register TABLE is the verified object (all-integer, exact on
# both engines); the cardinality estimate derived from it is checked
# against the exact distinct count in pytest. Registers are a max-
# semilattice, so the per-batch combiner bounds the exchange to
# (n_event_types × 2^P) rows per block regardless of corpus size —
# the whole point of sketches at 100 TB. Rank extraction avoids
# floating log2 entirely: numpy uses an exact power-of-two
# searchsorted, SQL uses length(bin(w)).
_HLL_P = 6                     # 2^6 = 64 registers per group
_HLL_WBITS = 32 - _HLL_P       # hash is 32-bit multiplicative


def hll_ranks(user_id: np.ndarray):
    """(bucket, rank) per item from the 32-bit Knuth hash."""
    h = (user_id.astype(np.int64) * _KNUTH) % 4294967296
    bucket = h % (1 << _HLL_P)
    w = h >> _HLL_P
    powers = 1 << np.arange(0, _HLL_WBITS + 1, dtype=np.int64)
    bitlen = np.searchsorted(powers, w, side="right")  # 0 for w == 0
    rank = np.where(w == 0, _HLL_WBITS + 1, _HLL_WBITS + 1 - bitlen)
    return bucket, rank.astype(np.int64)


def hll_estimate(max_ranks: np.ndarray) -> float:
    """Standard HLL estimator over one group's full register vector
    (zeros for untouched registers); linear-counting small-range
    correction included."""
    m = 1 << _HLL_P
    alpha = 0.709 if m >= 128 else {16: 0.673, 32: 0.697, 64: 0.709}[m]
    est = alpha * m * m / np.sum(2.0 ** -max_ranks)
    zeros = int((max_ranks == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def q51_hll_registers(sf_dir: str) -> pd.DataFrame:
    """Distinct users per event type as HLL registers: per-batch max
    combiner, ONE exchange of pre-reduced (type, bucket, rank) rows."""
    from ..stages.windows import grouped_by_key_buckets

    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        bucket, rank = hll_ranks(uid)
        out = pa.table({"event_type": t["event_type"],
                        "bucket": pa.array(bucket, pa.int64()),
                        "rank": pa.array(rank, pa.int64())})
        g = out.group_by(["event_type", "bucket"]).aggregate([("rank", "max")])
        return pa.table({"event_type": g["event_type"],
                         "bucket": g["bucket"],
                         "rank": pc.cast(g["rank_max"], pa.int64())})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["event_type", "bucket"], as_index=False)["rank"]
               .max().rename(columns={"rank": "max_rank"}))
        out["max_rank"] = out["max_rank"].astype("int64")
        return out

    return grouped_by_key_buckets(
        ds.map_batches(partial, batch_format="pyarrow"),
        "event_type", final).to_pandas()


Q51_SQL = f"""
WITH h AS (
  SELECT event_type, ((user_id * {_KNUTH}) % 4294967296) AS hv FROM events
), r AS (
  SELECT event_type, hv % {1 << _HLL_P} AS bucket,
         hv // {1 << _HLL_P} AS w
  FROM h
), rk AS (
  SELECT event_type, bucket,
         CASE WHEN w = 0 THEN {_HLL_WBITS + 1}
              ELSE {_HLL_WBITS + 1} - length(bin(w)) END AS rank
  FROM r
)
SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
       CAST(MAX(rank) AS BIGINT) AS max_rank
FROM rk GROUP BY event_type, bucket
"""


# ---------------------------------------------------------------------------
# Q52 — inverted-index build (term -> ordered posting list)
# ---------------------------------------------------------------------------


def q52_inverted_index(sf_dir: str) -> pd.DataFrame:
    """The search-engine staple (and the corpus-side analog of the
    reference's Lucene dictionary indexing, SURVEY §2 S5): per-batch
    DISTINCT (term, doc_id) pairs — the combiner that stops head terms
    from shipping every occurrence — then ONE term-keyed exchange and
    per-term ordered posting assembly. At 100 TB posting lists shard
    by (term, doc-range) instead of one string per term; df and the
    ordered assembly are unchanged."""
    from ..stages.windows import grouped_by_key_buckets

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def pairs(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(t["text"], " ")
        flat = pc.list_flatten(words)
        par = pc.list_parent_indices(words)
        doc = t["doc_id"].take(par)
        keep = pc.not_equal(flat, pa.scalar(""))
        return (pa.table({"term": flat.filter(keep),
                          "doc_id": doc.filter(keep)})
                .group_by(["term", "doc_id"]).aggregate([]))

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["term", "doc_id"]).sort_values(
            ["term", "doc_id"], kind="stable")
        g = df.groupby("term", sort=False)
        out = g.agg(df_count=("doc_id", "size"),
                    postings=("doc_id",
                              lambda s: ",".join(map(str, s)))).reset_index()
        out["df_count"] = out["df_count"].astype("int64")
        return out

    return grouped_by_key_buckets(
        ds.map_batches(pairs, batch_format="pyarrow"),
        "term", assemble).to_pandas()


Q52_SQL = """
WITH p AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> ''
)
SELECT term, CAST(COUNT(*) AS BIGINT) AS df_count,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM p GROUP BY term
"""


# ---------------------------------------------------------------------------
# Q53 — distributed normal-equations accumulation (linear quality-
# classifier training)
# ---------------------------------------------------------------------------

# The RefinedWeb/C4-style "train a quality classifier" step, split the
# way it actually distributes: the corpus-sized pass accumulates the
# exact second-moment matrix of [features, label] as INTEGER partial
# sums (a per-batch X^T X combiner — the exchange is a constant
# 15 rows per block at any corpus size), and the D×D solve happens on
# the driver. The moment table is the hash-verified object; the ridge
# solve + prediction quality are pytest-gated. The label here is a
# deterministic stand-in (n_chars >= threshold); a real pipeline
# feeds human/LLM labels through the identical plumbing.
_Q53_Y_THRESHOLD = 300
_Q53_DIM = 5  # [1, n_chars, n_words, n_uniq_words, y]


def _q53_features(t: pa.Table) -> np.ndarray:
    import polars as pl

    txt = pl.from_arrow(t.column("text").combine_chunks())
    words = txt.str.split(" ")
    n_chars = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_words = words.list.len().to_numpy().astype(np.int64)
    n_uniq = words.list.n_unique().to_numpy().astype(np.int64)
    y = (n_chars >= _Q53_Y_THRESHOLD).astype(np.int64)
    return np.column_stack([np.ones(len(n_chars), np.int64),
                            n_chars, n_words, n_uniq, y])


def q53_moment_matrix(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", ["text", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        x = _q53_features(t)
        m = x.T @ x                      # (5,5) int64, exact
        iu, ju = np.triu_indices(_Q53_DIM)
        return pa.table({"i": pa.array(iu.astype(np.int64)),
                         "j": pa.array(ju.astype(np.int64)),
                         "value": pa.array(m[iu, ju], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby(["i", "j"], as_index=False)["value"].sum()
    out["value"] = out["value"].astype("int64")
    return out


def ridge_from_moments(moments: pd.DataFrame, lam: float = 1.0
                       ) -> np.ndarray:
    """Solve the ridge normal equations from the exact moment table —
    the driver-side half of the classifier training."""
    m = np.zeros((_Q53_DIM, _Q53_DIM), np.float64)
    for r in moments.itertuples():
        m[r.i, r.j] = m[r.j, r.i] = r.value
    xtx = m[:-1, :-1]
    xty = m[:-1, -1]
    return np.linalg.solve(xtx + lam * np.eye(_Q53_DIM - 1), xty)


def _q53_sql() -> str:
    feats = ["f0", "f1", "f2", "f3", "y"]
    sums = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS i, CAST({j} AS BIGINT) AS j, "
        f"CAST(SUM({feats[i]} * {feats[j]}) AS BIGINT) AS value FROM f"
        for i in range(_Q53_DIM) for j in range(i, _Q53_DIM))
    return f"""
WITH f AS (
  SELECT 1 AS f0, n_chars AS f1,
         len(string_split(text, ' ')) AS f2,
         len(list_distinct(string_split(text, ' '))) AS f3,
         CASE WHEN n_chars >= {_Q53_Y_THRESHOLD} THEN 1 ELSE 0 END AS y
  FROM documents
)
{sums}"""


Q53_SQL = _q53_sql()


# ---------------------------------------------------------------------------
# Q54 — as-of join (event-time point lookup, an operator Ray Data
# lacks natively)
# ---------------------------------------------------------------------------

# For every 'view' event, the user's most recent 'click' at-or-before
# its timestamp. Ray-shape: both streams union-tagged through ONE
# user-hash-bucketed exchange, then a vectorized pandas merge_asof per
# bucket (every row of a user co-located; the right stream is deduped
# to max event_id per (user, ts) so ties are deterministic — matching
# DuckDB's ASOF JOIN, which requires a unique right side). Partition
# assumption: a user's history fits a bucket — the same contract as
# the session/window operators (stages/windows.py).


def asof_join(left_ds, right_ds, key_col: str, ts_col: str,
              left_id: str, right_id: str, num_buckets: int = 64):
    """Generic as-of (backward, inclusive) join: for each left row,
    the right row with the greatest ts <= left ts for the same key.
    Returns (left_id, right_id, lag_us) as fixed output columns
    ("left_id"/"right_id"), matched rows only."""
    import ray.data as _rd

    from ..functions.bucket import add_bucket

    def tag(kind: str):
        def fn(t: pa.Table) -> pa.Table:
            out = pa.table({
                key_col: t[key_col],
                ts_col: t[ts_col],
                "__id": t[left_id if kind == "l" else right_id],
                "__side": pa.array([kind] * t.num_rows, pa.string()),
            })
            return add_bucket(out, key_col, num_buckets)
        return fn

    both = left_ds.map_batches(tag("l"), batch_format="pyarrow").union(
        right_ds.map_batches(tag("r"), batch_format="pyarrow"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["__side"] == "l"]
        r = df[df["__side"] == "r"]
        # deterministic unique right side: max id per (key, ts)
        r = (r.sort_values([key_col, ts_col, "__id"], kind="stable")
             .drop_duplicates([key_col, ts_col], keep="last"))
        if l.empty or r.empty:
            return pd.DataFrame({"left_id": pd.array([], dtype="int64"),
                                 "right_id": pd.array([], dtype="int64"),
                                 "lag_us": pd.array([], dtype="int64")})
        r = r.rename(columns={"__id": "__rid", ts_col: "__rts"})
        m = pd.merge_asof(
            l.sort_values(ts_col, kind="stable"),
            r.sort_values("__rts", kind="stable")[
                [key_col, "__rts", "__rid"]],
            left_on=ts_col, right_on="__rts", by=key_col,
            direction="backward")
        m = m[m["__rid"].notna()]
        lag = (m[ts_col].astype("int64") - m["__rts"].astype("int64"))
        return pd.DataFrame({"left_id": m["__id"].astype("int64"),
                             "right_id": m["__rid"].astype("int64"),
                             "lag_us": lag.astype("int64")})

    return (both.groupby("__bucket")
            .map_groups(lambda d: merge(d.drop(columns=["__bucket"])),
                        batch_format="pandas"))


def q54_asof_join(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def side(kind: str):
        return ds.map_batches(
            lambda t, k=kind: t.filter(pc.equal(t["event_type"],
                                                pa.scalar(k))),
            batch_format="pyarrow")

    out = asof_join(side("view"), side("click"), key_col="user_id",
                    ts_col="ts", left_id="event_id", right_id="event_id")
    return out.to_pandas().rename(columns={"left_id": "view_id",
                                           "right_id": "click_id"})


Q54_SQL = """
WITH v AS (
  SELECT event_id AS view_id, user_id, ts FROM events
  WHERE event_type = 'view'
), c0 AS (
  SELECT user_id, ts, MAX(event_id) AS click_id FROM events
  WHERE event_type = 'click' GROUP BY user_id, ts
)
SELECT v.view_id, c.click_id,
       CAST(epoch_us(v.ts) - epoch_us(c.ts) AS BIGINT) AS lag_us
FROM v ASOF JOIN c0 c ON v.user_id = c.user_id AND v.ts >= c.ts
"""


# ---------------------------------------------------------------------------
# Q55 — range (interval) join via bin replication
# ---------------------------------------------------------------------------

# Join events to OVERLAPPING value bands [k*5, k*5+12): the classic
# range join Ray Data has no operator for. Scale shape: each interval
# replicates to the ceil(width/bin)=3 bins it spans (bounded blowup),
# each point maps to exactly 1 bin, ONE co-locating exchange, then a
# vectorized in-bin interval check — no all-pairs, works for interval
# tables far beyond broadcast size (for THIS 102-row band table a
# broadcast filter would win; the bin path is the one that generalizes,
# and the in-bin verify is identical either way).
_RANGE_BIN = 5.0
_BAND_W = 12.0
_N_BANDS = 102  # covers value in [0, 510)


def q55_range_join(sf_dir: str) -> pd.DataFrame:
    from ..stages.windows import grouped_by_key_buckets

    ds = _read(sf_dir, "events", ["event_id", "value"])
    spans = int(np.ceil(_BAND_W / _RANGE_BIN))

    def point_rows(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bin": pa.array((v // _RANGE_BIN).astype(np.int64)),
            "event_id": t["event_id"],
            "value": t["value"],
            "band_id": pa.array(np.full(t.num_rows, -1, np.int64)),
        })

    def band_rows() -> pa.Table:
        k = np.arange(_N_BANDS, dtype=np.int64)
        lo = k * _RANGE_BIN
        bins = (lo // _RANGE_BIN).astype(np.int64)
        rep_bin = (bins[:, None] + np.arange(spans)[None, :]).ravel()
        rep_band = np.repeat(k, spans)
        return pa.table({
            "bin": pa.array(rep_bin),
            "event_id": pa.array(np.full(len(rep_bin), -1, np.int64)),
            "value": pa.array(np.zeros(len(rep_bin))),
            "band_id": pa.array(rep_band),
        })

    both = ds.map_batches(point_rows, batch_format="pyarrow").union(
        rd.from_arrow(band_rows()))

    def join_bin(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, g in df.groupby("bin", sort=False):
            pts = g[g["band_id"] < 0]
            bands = g[g["band_id"] >= 0]
            if pts.empty or bands.empty:
                continue
            k = bands["band_id"].to_numpy()
            lo = k * _RANGE_BIN
            hi = lo + _BAND_W
            v = pts["value"].to_numpy()
            hit = (v[:, None] >= lo[None, :]) & (v[:, None] < hi[None, :])
            ia, ib = np.nonzero(hit)
            out.append(pd.DataFrame({
                "event_id": pts["event_id"].to_numpy()[ia],
                "band_id": k[ib]}))
        if not out:
            return pd.DataFrame({"event_id": pd.array([], dtype="int64"),
                                 "band_id": pd.array([], dtype="int64")})
        res = pd.concat(out, ignore_index=True)
        return res.astype({"event_id": "int64", "band_id": "int64"})

    return grouped_by_key_buckets(both, "bin", join_bin).to_pandas()


Q55_SQL = f"""
WITH bands AS (
  SELECT k AS band_id, k * {_RANGE_BIN} AS lo, k * {_RANGE_BIN} + {_BAND_W} AS hi
  FROM range(0, {_N_BANDS}) t(k)
)
SELECT e.event_id, CAST(b.band_id AS BIGINT) AS band_id
FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
"""


Q48_SQL = f"""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS idx
  FROM documents
), g AS (
  SELECT doc_id, word || ' ' || LEAD(word) OVER win AS gram
  FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY idx)
), bi AS (
  SELECT doc_id, gram FROM g WHERE gram IS NOT NULL
), model AS (
  SELECT gram, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM bi WHERE doc_id % {_LM_SUBSET_MOD} = 0 GROUP BY gram
)
SELECT b.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(COUNT(m.gram) AS BIGINT) AS n_known,
       CAST(COALESCE(SUM(m.cnt), 0) AS BIGINT) AS known_mass
FROM bi b LEFT JOIN model m ON m.gram = b.gram
GROUP BY b.doc_id
"""


# --- q93: equi-depth quantile binning (the feature-bucketization
# transform: assign every row its decile so downstream mixing /
# stratification can treat a continuous metric as a categorical one).
# Composition of two existing planes: the q45 exact-quantile cutpoints
# (one pre-reduced histogram exchange) broadcast once via ray.put, then
# a STATELESS map attaches bin = #cutpoints strictly below the value
# (np.searchsorted left) — rows are never shuffled. Duplicate
# cutpoints (tight distributions) are kept on BOTH engines, so bin
# ids and the oracle's correlated-subquery count agree exactly.
DEPTH_PERMILLE = tuple(range(100, 1000, 100))


def equi_depth_bins(ds, value_col: str,
                    permille=DEPTH_PERMILLE) -> "rd.Dataset":
    cuts_df = exact_quantiles(ds, value_col, permille)
    cuts = np.sort(cuts_df["value"].to_numpy().astype(np.int64))
    cuts_ref = ray.put(cuts)

    def assign(t: pa.Table) -> pa.Table:
        c = get_broadcast(cuts_ref)
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        return t.append_column(
            "depth_bin",
            pa.array(np.searchsorted(c, v, side="left"), pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow")


def q93_depth_bins(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    return equi_depth_bins(ds, "n_chars").to_pandas()


Q93_SQL = f"""
WITH cuts AS (
  {" UNION ALL ".join(
      f"SELECT percentile_disc({pm / 1000.0}) "
      f"WITHIN GROUP (ORDER BY n_chars) AS cut FROM documents"
      for pm in DEPTH_PERMILLE)}
)
SELECT d.doc_id, d.n_chars,
       CAST((SELECT COUNT(*) FROM cuts WHERE cuts.cut < d.n_chars)
            AS BIGINT) AS depth_bin
FROM documents d
"""


# --- q94: skip-gram co-occurrence pair counts (the word2vec /
# GloVe-style training-pair mint). Forward window d in 1..W over each
# document's space-split token stream; per-batch PARTIAL pair counts
# (vectorized polars shift-over-doc, no Python loop over tokens)
# combine before the ONE pair-keyed exchange, so a head pair ships one
# row per block — the q42-edge discipline. Output bounded by the
# min-count threshold (the standard word2vec min_count), applied
# identically in the oracle's HAVING.
SKIPGRAM_WINDOW = 2
SKIPGRAM_MIN_COUNT = 3


def skipgram_pairs(ds, text_col: str = "text",
                   window: int = SKIPGRAM_WINDOW,
                   min_count: int = SKIPGRAM_MIN_COUNT) -> pd.DataFrame:
    import polars as pl

    def partial(t: pa.Table) -> pa.Table:
        pf = pl.DataFrame({
            "doc": np.arange(len(t), dtype=np.int64),
            "w": pl.from_arrow(pc.split_pattern(t[text_col], " ")),
        }).explode("w")
        pieces = []
        for d in range(1, window + 1):
            p = pf.with_columns(
                pl.col("w").shift(-d).over("doc").alias("w2"))
            pieces.append(p.drop_nulls("w2"))
        out = (pl.concat(pieces)
               .group_by(["w", "w2"])
               .agg(pl.len().alias("cnt"))).to_arrow()
        return pa.table({
            "w1": out["w"].cast(pa.string()),
            "w2": out["w2"].cast(pa.string()),
            "cnt": out["cnt"].cast(pa.int64()),
        })

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["w1", "w2"])
              .aggregate(Sum("cnt", alias_name="cnt")))
    out = counts.map_batches(
        lambda t: t.filter(pc.greater_equal(
            t["cnt"], pa.scalar(min_count, pa.int64()))),
        batch_format="pyarrow").to_pandas()
    out["cnt"] = out["cnt"].astype("int64")
    return out


def q94_skipgram_pairs(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", ["text"])
    return skipgram_pairs(ds)


Q94_SQL = f"""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS idx
  FROM documents
)
SELECT a.w AS w1, b.w AS w2, CAST(COUNT(*) AS BIGINT) AS cnt
FROM w a JOIN w b
  ON a.doc_id = b.doc_id
 AND b.idx - a.idx BETWEEN 1 AND {SKIPGRAM_WINDOW}
GROUP BY a.w, b.w
HAVING COUNT(*) >= {SKIPGRAM_MIN_COUNT}
"""


# --- q95: lexical-diversity profile per source (type-token ratio —
# the Heaps'-law / vocabulary-growth quality signal used to flag
# template-generated or degenerate text). Tokens = combiner-first
# per-source sums; types = per-batch DISTINCT (source, word) partials
# (head words ship once per block) → one word-keyed exchange →
# per-source count. TTR quantized to parts-per-million integer so the
# profile hash-verifies.
def lexical_diversity(ds, group_col: str = "source",
                      text_col: str = "text") -> pd.DataFrame:
    def tok_partial(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(t[text_col], " ")
        return pa.table({
            group_col: t[group_col],
            "n": pc.cast(pc.list_value_length(words), pa.int64()),
        })

    tokens = (ds.map_batches(tok_partial, batch_format="pyarrow")
              .groupby(group_col)
              .aggregate(Sum("n", alias_name="n_tokens")).to_pandas())

    def type_partial(t: pa.Table) -> pa.Table:
        import polars as pl

        pf = pl.DataFrame({
            group_col: pl.from_arrow(t[group_col]),
            "w": pl.from_arrow(pc.split_pattern(t[text_col], " ")),
        }).explode("w").unique()
        out = pf.to_arrow()
        return pa.table({group_col: out[group_col].cast(pa.string()),
                         "w": out["w"].cast(pa.string())})

    from ..stages.canonicalize import exact_dedup

    distinct = exact_dedup(
        ds.map_batches(type_partial, batch_format="pyarrow"),
        [group_col, "w"])
    types = (distinct.map_batches(lambda t: pa.table({
                 group_col: t[group_col],
                 "one": pa.array(np.ones(len(t), np.int64))}),
                 batch_format="pyarrow")
             .groupby(group_col)
             .aggregate(Sum("one", alias_name="n_types")).to_pandas())

    out = tokens.merge(types, on=group_col)
    out["ttr_ppm"] = (out["n_types"] * 1_000_000
                      // out["n_tokens"]).astype("int64")
    out["n_tokens"] = out["n_tokens"].astype("int64")
    out["n_types"] = out["n_types"].astype("int64")
    return out[[group_col, "n_tokens", "n_types", "ttr_ppm"]]


def q95_lexical_diversity(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", ["source", "text"])
    return lexical_diversity(ds)


Q95_SQL = """
WITH w AS (
  SELECT source, unnest(string_split(text, ' ')) AS word FROM documents
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT word) AS BIGINT) AS n_types,
       CAST(COUNT(DISTINCT word) * 1000000 // COUNT(*) AS BIGINT)
           AS ttr_ppm
FROM w GROUP BY source
"""
