"""Statistical quality profiling over the document corpus.

Two corpus-QA operators a training-data pipeline runs before mixing:

* q97 — per-source length-outlier detection (Chebyshev k=3/2 over
  n_chars) in EXACT integer moment algebra: the float-free restatement
  of ``|x - mean| > (p/q)*sigma`` is ``q^2*(x*n - s)^2 >
  p^2*(n*ss - s^2)`` with s = sum, ss = sum of squares, so both
  engines evaluate the identical integers and the outlier ROWS
  themselves hash-verify. k is rational ON PURPOSE — sigma never
  needs to be computed, only compared against, so no sqrt/float
  enters either engine.
  Shape: per-batch (source, n, sum, sumsq) partials (≤ |sources| rows
  leave each block), vocabulary-sized groupby, moments broadcast
  in-closure, then a stateless zero-shuffle flag scan.

* q99 — per-source token-distribution drift vs the corpus: a
  chi-square statistic over the 64-bucket hashed vocabulary (the q56
  DSIR feature space), integer-quantized to e6 so the statistic itself
  hash-verifies. Shape: per-batch (source, bucket) bincount partials
  (≤ |sources|×64 rows per block at ANY corpus size), ONE tiny
  groupby, exact Python-int contingency math over the |sources|×64
  table on the driver (DuckDB side runs the same algebra in HUGEINT).

Scale notes: q97's squared-deviation compare is int64-safe while
|x*n - sum| < 2^31.5 ≈ 3.04e9 (guard-asserted; past that, center the
moments per source or switch the scan to Python-int objects — the
DuckDB oracle is already exact via HUGEINT). q99's driver state is
|sources|×64 cells regardless of corpus size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Sum

_CHEB_P, _CHEB_Q = 3, 2          # flag |x - mean| > (3/2) sigma
_I64_SAFE = 1_518_500_249        # floor(sqrt(int64max / _CHEB_Q^2))


def _read(sf_dir: str, table: str, columns=None):
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# Q97 — per-source length outliers (integer Chebyshev)
# ---------------------------------------------------------------------------

def source_moments(ds, key_col: str = "source", val_col: str = "n_chars"):
    """(key, n, s, ss) exact int64 moments, combiner-first."""

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": t.column(key_col).to_pandas(),
            "x": t.column(val_col).to_numpy(zero_copy_only=False),
        })
        g = df.groupby("k")["x"].agg(n="count", s="sum",
                                     ss=lambda v: int((v * v).sum()))
        g = g.reset_index()
        return pa.table({
            "k": pa.array(g["k"], pa.string()),
            "n_p": pa.array(g["n"].to_numpy(), pa.int64()),
            "s_p": pa.array(g["s"].to_numpy(), pa.int64()),
            "ss_p": pa.array(g["ss"].to_numpy(), pa.int64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("k")
            .aggregate(Sum("n_p", alias_name="n"),
                       Sum("s_p", alias_name="s"),
                       Sum("ss_p", alias_name="ss")))


def length_outliers(ds, key_col: str = "source", val_col: str = "n_chars",
                    id_col: str = "doc_id",
                    k_num: int = _CHEB_P, k_den: int = _CHEB_Q):
    """documents -> the outlier rows (id, key, val). The moment table
    is vocabulary-sized (one row per source) so it rides in-closure;
    document rows never shuffle."""
    mom = source_moments(ds, key_col, val_col).to_pandas()
    # rhs per source as EXACT Python ints (n*ss - s*s overflows int64
    # ~1e5 sources earlier than the lhs does)
    rhs = {
        r["k"]: k_num * k_num * (int(r["n"]) * int(r["ss"])
                                 - int(r["s"]) ** 2)
        for _, r in mom.iterrows()
    }
    nmap = {r["k"]: int(r["n"]) for _, r in mom.iterrows()}
    smap = {r["k"]: int(r["s"]) for _, r in mom.iterrows()}

    def flag(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_pandas()
        x = t.column(val_col).to_numpy(zero_copy_only=False)
        n = keys.map(nmap).to_numpy(dtype=np.int64)
        s = keys.map(smap).to_numpy(dtype=np.int64)
        r = keys.map(rhs).to_numpy(dtype=np.float64)  # compare-only copy
        dev = x * n - s
        assert np.abs(dev).max(initial=0) <= _I64_SAFE, \
            "center moments per source before squaring at this scale"
        lhs = k_den * k_den * dev * dev
        # float compare is exact here: both sides < 2^63 and the
        # deciding magnitudes are far apart; redo borderline rows in
        # exact ints to keep the operator bit-honest
        out = lhs.astype(np.float64) > r
        near = np.abs(lhs.astype(np.float64) - r) < 1e6
        if near.any():
            rl = keys.map(rhs)
            for i in np.nonzero(near)[0]:
                out[i] = int(lhs[i]) > int(rl.iloc[i])
        return pa.table({
            id_col: t.column(id_col).filter(pa.array(out)),
            key_col: t.column(key_col).filter(pa.array(out)),
            val_col: t.column(val_col).filter(pa.array(out)),
        })

    return ds.map_batches(flag, batch_format="pyarrow")


def q97_length_outliers(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    df = length_outliers(ds).to_pandas()
    if df.empty:  # Ray drops the schema of an all-empty Dataset
        df = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                           "source": pd.Series(dtype=object),
                           "n_chars": pd.Series(dtype="int64")})
    return df


Q97_SQL = f"""
WITH m AS (
  SELECT source,
         CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(n_chars) AS HUGEINT) AS s,
         CAST(SUM(n_chars * n_chars) AS HUGEINT) AS ss
  FROM documents GROUP BY source
)
SELECT d.doc_id, d.source, d.n_chars
FROM documents d JOIN m ON m.source = d.source
WHERE {_CHEB_Q * _CHEB_Q} * (d.n_chars * m.n - m.s)
      * (d.n_chars * m.n - m.s)
      > {_CHEB_P * _CHEB_P} * (m.n * m.ss - m.s * m.s)
"""


# ---------------------------------------------------------------------------
# Q99 — per-source token-distribution drift (hashed-vocab chi-square)
# ---------------------------------------------------------------------------

_DRIFT_BUCKETS = 64
_DRIFT_SCALE = 1_000_000


def source_token_histogram(ds, key_col: str = "source"):
    """(key, b, c) exact token counts over the q56 hashed vocabulary;
    per-batch bincount partials bound each block's contribution to
    |sources| x B rows."""
    from .selection import _tokens_with_buckets

    def partial(t: pa.Table) -> pa.Table:
        par, bk = _tokens_with_buckets(t)
        keys = t.column(key_col).to_pandas()
        codes, uniq = pd.factorize(keys)
        cell = codes[par] * _DRIFT_BUCKETS + bk
        c = np.bincount(cell, minlength=len(uniq) * _DRIFT_BUCKETS)
        nz = np.nonzero(c)[0]
        return pa.table({
            "k": pa.array(uniq[nz // _DRIFT_BUCKETS], pa.string()),
            "b": pa.array((nz % _DRIFT_BUCKETS).astype(np.int64)),
            "c_p": pa.array(c[nz].astype(np.int64)),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["k", "b"])
            .aggregate(Sum("c_p", alias_name="c")))


def source_drift(ds, key_col: str = "source") -> pd.DataFrame:
    """-> (source, chi_e6): integer-quantized chi-square of each
    source's hashed-token distribution against the pooled corpus,
    summed over ALL buckets the corpus populates (zero-observed cells
    contribute their full expected mass, as in the true statistic)."""
    cnt = source_token_histogram(ds, key_col).to_pandas()
    # exact contingency math over the |sources| x B table
    tb = cnt.groupby("b")["c"].sum().to_dict()          # bucket marginals
    ssum = cnt.groupby("k")["c"].sum().to_dict()        # source totals
    tt = int(cnt["c"].sum())
    obs = {(r["k"], int(r["b"])): int(r["c"]) for _, r in cnt.iterrows()}
    rows = []
    for k in sorted(ssum):
        s = int(ssum[k])
        chi = 0
        for b, t in tb.items():
            t = int(t)
            c = obs.get((k, int(b)), 0)
            num = (c * tt - s * t) ** 2
            chi += _DRIFT_SCALE * num // (s * t * tt)
        rows.append({"source": k, "chi_e6": chi})
    return pd.DataFrame(rows)


def q99_source_drift(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])
    return source_drift(ds)


Q99_SQL = f"""
WITH w AS (
  SELECT source, unnest(string_split(text, ' ')) AS word FROM documents
), wf AS (
  SELECT source,
         (length(word) * 131 + ascii(word) * 31 + ascii(reverse(word)))
           % {_DRIFT_BUCKETS} AS b
  FROM w WHERE word <> ''
), cnt AS (
  SELECT source, b, CAST(COUNT(*) AS HUGEINT) AS c FROM wf GROUP BY source, b
), tb AS (
  SELECT b, SUM(c) AS t FROM cnt GROUP BY b
), ss AS (
  SELECT source, SUM(c) AS s FROM cnt GROUP BY source
), tot AS (
  SELECT SUM(c) AS tt FROM cnt
), grid AS (
  SELECT ss.source, ss.s, tb.b, tb.t, (SELECT tt FROM tot) AS tt
  FROM ss CROSS JOIN tb
), j AS (
  SELECT g.source, COALESCE(c.c, 0) AS c, g.s, g.t, g.tt
  FROM grid g LEFT JOIN cnt c ON c.source = g.source AND c.b = g.b
)
SELECT source,
       CAST(SUM({_DRIFT_SCALE} * ((c * tt - s * t) * (c * tt - s * t))
                // (s * t * tt)) AS BIGINT) AS chi_e6
FROM j GROUP BY source
"""


# ---------------------------------------------------------------------------
# Q102 — per-source MAD robust outliers (median absolute deviation)
# ---------------------------------------------------------------------------

_MAD_K = 3


def value_histogram(ds, key_col: str = "source", val_col: str = "n_chars"):
    """Exact (key, value, count) histogram, combiner-first: each block
    contributes at most |keys| x |distinct values in block| pre-reduced
    rows. For a bounded value domain (lengths, scores, years) the
    global histogram is vocabulary-sized no matter the corpus size —
    that is what makes EXACT medians distributable."""

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": t.column(key_col).to_pandas(),
            "v": t.column(val_col).to_numpy(zero_copy_only=False),
        })
        g = df.groupby(["k", "v"], as_index=False).size()
        return pa.table({
            "k": pa.array(g["k"], pa.string()),
            "v": pa.array(g["v"].to_numpy(), pa.int64()),
            "c_p": pa.array(g["size"].to_numpy(), pa.int64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["k", "v"])
            .aggregate(Sum("c_p", alias_name="c")))


def _disc_median(vals: np.ndarray, cnts: np.ndarray) -> int:
    """Lower-middle discrete median from a (value, count) histogram —
    exactly DuckDB's quantile_disc(0.5): the element at 0-based index
    (n-1)//2 of the sorted expansion."""
    o = np.argsort(vals, kind="stable")
    v = vals[o]
    c = cnts[o]
    n = int(c.sum())
    tgt = (n - 1) // 2 + 1          # 1-based rank of the lower middle
    cum = np.cumsum(c)
    return int(v[np.searchsorted(cum, tgt)])


def mad_outliers(ds, key_col: str = "source", val_col: str = "n_chars",
                 id_col: str = "doc_id", k: int = _MAD_K):
    """The ROBUST counterpart of q97: flag rows with
    ``|x - median| > k * MAD`` where MAD = median(|x - median|), both
    medians DISCRETE (lower-middle) so every quantity is an exact
    integer on both engines. ONE corpus pass builds the per-source
    value histogram; median AND MAD both derive from that same
    histogram (the |v - med| histogram is a re-keying of it — no
    second corpus pass); the tiny (med, mad) table rides in-closure
    for a zero-shuffle flag scan."""
    hist = value_histogram(ds, key_col, val_col).to_pandas()
    med, mad = {}, {}
    for key, g in hist.groupby("k"):
        v = g["v"].to_numpy()
        c = g["c"].to_numpy()
        m = _disc_median(v, c)
        med[key] = m
        mad[key] = _disc_median(np.abs(v - m), c)

    def flag(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_pandas()
        x = t.column(val_col).to_numpy(zero_copy_only=False)
        m = keys.map(med).to_numpy(dtype=np.int64)
        a = keys.map(mad).to_numpy(dtype=np.int64)
        out = np.abs(x - m) > k * a
        return pa.table({
            id_col: t.column(id_col).filter(pa.array(out)),
            key_col: t.column(key_col).filter(pa.array(out)),
            val_col: t.column(val_col).filter(pa.array(out)),
        })

    return ds.map_batches(flag, batch_format="pyarrow")


def q102_mad_outliers(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    df = mad_outliers(ds).to_pandas()
    if df.empty:  # Ray drops the schema of an all-empty Dataset
        df = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                           "source": pd.Series(dtype=object),
                           "n_chars": pd.Series(dtype="int64")})
    return df


Q102_SQL = f"""
WITH m AS (
  SELECT source, quantile_disc(n_chars, 0.5) AS med
  FROM documents GROUP BY source
), a AS (
  SELECT d.source, quantile_disc(ABS(d.n_chars - m.med), 0.5) AS mad
  FROM documents d JOIN m USING (source) GROUP BY d.source
)
SELECT d.doc_id, d.source, d.n_chars
FROM documents d JOIN m USING (source) JOIN a USING (source)
WHERE ABS(d.n_chars - m.med) > {_MAD_K} * a.mad
"""


# ---------------------------------------------------------------------------
# Q108 — source-affinity matrix (pairwise token-distribution overlap)
# ---------------------------------------------------------------------------

def source_affinity(ds, key_col: str = "source") -> pd.DataFrame:
    """-> (src_a, src_b, dot, na2, nb2) for every source pair a < b:
    the EXACT integer inner product and squared norms of the two
    sources' hashed-vocab count vectors (the q99 histogram — ONE
    corpus pass, |sources| x 64 cells). Cosine = dot/sqrt(na2*nb2) is
    derivable downstream; the operator deliberately reports the raw
    integer moments so the affinity matrix itself hash-verifies (no
    sqrt on either engine). The corpus-mixing use: near-identical
    sources are merge candidates, low-affinity sources diversify."""
    cnt = source_token_histogram(ds, key_col).to_pandas()
    vecs = {}
    for k, g in cnt.groupby("k"):
        v = np.zeros(_DRIFT_BUCKETS, dtype=np.int64)
        v[g["b"].to_numpy()] = g["c"].to_numpy()
        vecs[k] = v
    keys = sorted(vecs)
    rows = []
    for i, a in enumerate(keys):
        for b in keys[i + 1:]:
            va, vb = vecs[a], vecs[b]
            rows.append({
                "src_a": a, "src_b": b,
                "dot": int(np.dot(va, vb)),
                "na2": int(np.dot(va, va)),
                "nb2": int(np.dot(vb, vb)),
            })
    return pd.DataFrame(rows)


def q108_source_affinity(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])
    return source_affinity(ds)


Q108_SQL = f"""
WITH w AS (
  SELECT source, unnest(string_split(text, ' ')) AS word FROM documents
), wf AS (
  SELECT source,
         (length(word) * 131 + ascii(word) * 31 + ascii(reverse(word)))
           % {_DRIFT_BUCKETS} AS b
  FROM w WHERE word <> ''
), cnt AS (
  SELECT source, b, CAST(COUNT(*) AS BIGINT) AS c FROM wf GROUP BY source, b
), norms AS (
  SELECT source, SUM(c * c) AS n2 FROM cnt GROUP BY source
)
SELECT a.source AS src_a, b.source AS src_b,
       CAST(COALESCE(SUM(ca.c * cb.c), 0) AS BIGINT) AS dot,
       CAST(MIN(na.n2) AS BIGINT) AS na2,
       CAST(MIN(nb.n2) AS BIGINT) AS nb2
FROM (SELECT DISTINCT source FROM cnt) a
JOIN (SELECT DISTINCT source FROM cnt) b ON a.source < b.source
JOIN norms na ON na.source = a.source
JOIN norms nb ON nb.source = b.source
LEFT JOIN cnt ca ON ca.source = a.source
LEFT JOIN cnt cb ON cb.source = b.source AND cb.b = ca.b
GROUP BY a.source, b.source
"""


# ---------------------------------------------------------------------------
# Q113 — first-seen vocabulary growth per crawl day (Heaps-law curve)
# ---------------------------------------------------------------------------

_NOVELTY_DAYS = 30


def vocab_novelty(ds, text_col: str = "text",
                  day_col: str = "day") -> pd.DataFrame:
    """(day, text) -> (day, n_new): how many distinct tokens make
    their FIRST corpus appearance on each day — the vocabulary-growth
    curve a crawl operator watches to detect template collapse (flat
    curve) or scraper drift (spike). Shape: per-block (token, min-day)
    partials — min is a semilattice, so each block ships one row per
    distinct token it contains — ONE token-keyed exchange for the
    global min, then a ≤|days| count. No corpus-scale state anywhere;
    the intermediate is vocabulary-sized."""
    from ..stages.setjoin import _distinct_tokens

    def partial(t: pa.Table) -> pa.Table:
        par, w = _distinct_tokens(t[text_col])
        if len(w) == 0:
            return pa.table({"w": pa.array([], pa.string()),
                             "d_p": pa.array([], pa.int64())})
        days = t.column(day_col).to_numpy(zero_copy_only=False)[par]
        g = pd.DataFrame({"w": w, "d": days}).groupby(
            "w", as_index=False)["d"].min()
        return pa.table({
            "w": pa.array(g["w"].to_numpy(dtype=object), pa.string()),
            "d_p": pa.array(g["d"].to_numpy(), pa.int64()),
        })

    from ray.data.aggregate import Count, Min

    first = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("w").aggregate(Min("d_p", alias_name="first_day")))
    out = (first.groupby("first_day").aggregate(Count(alias_name="n_new"))
           .to_pandas())
    return pd.DataFrame({
        "day": out["first_day"].astype("int64"),
        "n_new": out["n_new"].astype("int64"),
    })


def q113_vocab_novelty(sf_dir: str) -> pd.DataFrame:
    """Day = doc_id % 30 (arithmetic crawl-day mint, the q42/q96
    precedent). The shared ~38-token base vocabulary all first-appears
    on day 0, so every doc_id % 7 == 0 page additionally contributes a
    genuinely novel token 'nv<doc_id>' — giving the growth curve real
    per-day variation for the oracle to check (mirrored in SQL)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def with_day(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        d = ids % _NOVELTY_DAYS
        txt = t.column("text").to_pylist()
        txt = [x + f" nv{i}" if int(i) % 7 == 0 else x
               for i, x in zip(ids, txt)]
        return pa.table({
            "doc_id": t["doc_id"],
            "text": pa.array(txt, pa.string()),
            "day": pa.array(d, pa.int64()),
        })

    return vocab_novelty(ds.map_batches(with_day, batch_format="pyarrow"))


Q113_SQL = f"""
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN text || ' nv' || CAST(doc_id AS VARCHAR)
              ELSE text END AS text
  FROM documents
), w AS (
  SELECT doc_id % {_NOVELTY_DAYS} AS day,
         unnest(string_split(text, ' ')) AS word
  FROM aug
), f AS (
  SELECT word, MIN(day) AS first_day FROM w WHERE word <> ''
  GROUP BY word
)
SELECT first_day AS day, CAST(COUNT(*) AS BIGINT) AS n_new
FROM f GROUP BY first_day
"""
