"""Scale-mechanism operators (q66-q69): skew-mitigated join, ranked
retrieval, Count-Min frequency sketch, deterministic corpus split.

Beyond-reference family (like q45-q65): each operator here exists
because of a SPECIFIC distributed-execution mechanism a 100 TB pipeline
needs, and the mechanism — not just the answer — is what the tests pin
down. All outputs are integer/string-exact so the DuckDB oracles are
bit-exact (the q42b/q51 precedent).

* q66 — skew-mitigated hash join (``skew_join``): the head-entity
  problem the north-star calls out. A plain hash join co-locates every
  probe row of a hot key on ONE reducer; at web scale a single head
  entity (think "Paris") can be 1% of the corpus and that reducer
  becomes the job. Here the big side's key-frequency head is estimated
  with the mergeable Misra-Gries sketch (q60 machinery, <= capacity
  rows per block), the dimension rows of hot keys are broadcast once
  (``ray.put``) and attached MAP-SIDE with a zero-copy Arrow hash join
  per batch — hot probe rows never enter the exchange — while the cold
  tail flows through the ordinary distributed hash join. The split is
  LOSSLESS for any hot-set choice (each row joins by exactly one
  route), so the MG estimate only steers placement, never the answer;
  pytest plants a 50%-hot-key stream and asserts the detector routes
  it around the shuffle and that forced-hot / forced-cold / auto all
  produce identical frames.
* q67 — ranked retrieval over the corpus (``quantized_idf_topk``): the
  search-serving counterpart of the q52 inverted index. Scores are the
  classic tf x idf with the idf quantized to an integer
  ``((N - df + 1) * 2^20) // (df + 1)`` — monotone in the real
  log-idf's argument, so rankings are the ones a float BM25-lite would
  give for this corpus shape, and both engines agree bit-for-bit (the
  q56 quantized-ratio precedent; a production deployment swaps float
  idf + length normalization into the same passes). Plumbing: one
  bounded df pass (per-block DISTINCT (term, doc) pairs restricted to
  the query vocabulary), idf table broadcast in the task closure, then
  a ZERO-SHUFFLE scoring scan with per-batch partial top-k and a
  driver merge of <= k rows per block — no global sort.
* q68 — Count-Min sketch (Cormode & Muthukrishnan 2005): the third
  mergeable frequency summary next to q51 (HLL, distinct) and q60
  (Misra-Gries, heavy hitters). Unlike MG, CMS registers are SUMS, so
  the whole sketch — registers AND point estimates, including the
  collision-inflated overestimates — is a deterministic function of
  the multiset alone, independent of block boundaries: the hash check
  verifies the approximation itself (the q59 Bloom precedent, which
  this generalizes from membership to frequency). Per-block partial
  registers (<= D*W cells leave a block), one pre-reduced exchange,
  estimates = min over D rows. The one-sided error bound
  (0 <= est - true <= N*e/W w.h.p.) is pytest-gated across random
  streams and block splits.
* q69 — deterministic train/valid/test split: exhaustive, disjoint,
  reproducible-from-the-key-alone assignment by the same public Knuth
  multiplicative hash the q46 mixture sampler uses. Zero shuffles,
  zero state; the split of any row can be recomputed by anyone holding
  the key, which is what makes downstream decontamination (q35) and
  eval hygiene auditable.

Scale notes: q66's sketch pass reads ONLY the key column (pruned
Parquet scan) and ships <= capacity rows per block; fold it into any
earlier pass over the big side when one exists. The broadcast side is
|hot keys| dimension rows — bounded by the sketch capacity, not by the
data. q67's df pass ships only (query-term, doc) matches and the
scoring pass ships <= k rows per block. q68's exchange is <= D*W
pre-reduced cells per block at any corpus size; the register table
itself is D*W cells total (vocabulary-sized — at 100 TB it rides the
same size-gate precedent as the q42b/q59 broadcast tables).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..functions.blocks import pin_nonempty
from ..state.broadcast import get_broadcast, put_broadcast


def _read(sf_dir: str, table: str, columns=None):
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# Q66 — skew-mitigated hash join
# ---------------------------------------------------------------------------

_HOT_CAPACITY = 32           # MG sketch capacity for head detection
_HOT_MIN_FRAC = 1.0 / 64.0   # a key is "hot" above this stream fraction


_COLD_BROADCAST_LIMIT = 64 << 20  # measured bytes under which the cold
                                  # dimension side is broadcast too


def skew_join(big_ds, small_ds, key: str, *,
              hot_capacity: int = _HOT_CAPACITY,
              hot_min_frac: float = _HOT_MIN_FRAC,
              num_partitions: int = 16,
              force_hot=None,
              cold_broadcast_limit: int = _COLD_BROADCAST_LIMIT):
    """Inner equi-join of a skewed big side against a dimension, with
    the key-frequency head routed around the shuffle.

    Both sides must carry ``key`` under the same name; output columns
    are the big side's, then the small side's non-key columns, in
    schema order (identical on both routes, so the union is clean).

    ``force_hot``: explicit hot-key list (skips the sketch pass) —
    used by the driver query so routing is deterministic, and by tests
    to force all-hot / all-cold extremes. ``force_hot=[]`` degenerates
    to the plain (gated) hash join.

    The cold route itself is size-gated on the MEASURED pinned bytes
    of the cold dimension side: under ``cold_broadcast_limit`` it is a
    broadcast map-side Arrow join (the whole operator is then
    shuffle-free); above it, the distributed hash join. Tests force
    the gate to 0 to pin the distributed route's algebra.

    Losslessness: every big row has key in H or not; every small row
    likewise; inner join distributes over that disjoint partition, so
    hot-route ∪ cold-route == plain join for ANY H. The sketch only
    decides placement.
    """
    from .selection import heavy_hitters

    big_cols = list(big_ds.schema().names)
    small_cols = [c for c in small_ds.schema().names if c != key]
    out_cols = big_cols + small_cols

    # pin the dimension side ONCE (materialize + metadata-only size)
    small_pinned = pin_nonempty(small_ds)
    under_gate = small_pinned.size_bytes() <= cold_broadcast_limit

    def _bcast_join(ref, route=None):
        def fn(t: pa.Table) -> pa.Table:
            probe = t if route is None else route(t)
            return probe.join(get_broadcast(ref), keys=[key],
                              join_type="inner").select(out_cols)
        return fn

    if force_hot is None and under_gate:
        # the whole dimension fits under the broadcast gate: routing is
        # pointless — ONE map-side join, zero shuffles, zero filters
        tbl = pa.concat_tables(
            ray.get(small_pinned.to_arrow_refs())).combine_chunks()
        ref = put_broadcast(tbl.select([key] + small_cols))
        return big_ds.map_batches(_bcast_join(ref), batch_format="pyarrow")

    if force_hot is not None:
        hot_keys = sorted(set(force_hot))
    else:
        # head detection: MG partials over the key column only (pruned
        # read, <= capacity rows leave each block). MG under-counts by
        # at most N/(capacity+1), so anything truly above
        # hot_min_frac + 1/(capacity+1) of the stream is guaranteed in.
        n_big = big_ds.count()
        hh = heavy_hitters(big_ds.select_columns([key]), key,
                           capacity=hot_capacity)
        thresh = hot_min_frac * n_big
        hot_keys = sorted(hh.loc[hh["mg_count"] >= thresh, key].tolist())

    def _route(t: pa.Table, keep_hot: bool) -> pa.Table:
        vals = pa.array(hot_keys, type=t.schema.field(key).type)
        m = pc.is_in(t[key], value_set=vals)
        return t.filter(m if keep_hot else pc.invert(m))

    parts = []
    small_all = None
    if under_gate:  # one collect serves the hot AND cold dimension rows
        small_all = pa.concat_tables(
            ray.get(small_pinned.to_arrow_refs())).combine_chunks()

    if hot_keys:
        # dimension rows of hot keys: bounded by |hot_keys| (sketch
        # capacity), never by data size -> one ray.put, read everywhere
        if small_all is not None:
            small_hot = _route(small_all, True)
        else:
            small_hot = pa.concat_tables(
                ray.get(small_pinned.map_batches(
                    lambda t: _route(t, True), batch_format="pyarrow",
                ).to_arrow_refs()))
        if small_hot.num_rows:
            href = put_broadcast(small_hot.select([key] + small_cols))
            parts.append(big_ds.map_batches(
                _bcast_join(href, route=lambda t: _route(t, True)),
                batch_format="pyarrow"))

    # cold tail: size gate on the MEASURED pinned bytes (the J1/J3
    # precedent) — under it the cold dimension broadcasts too (the
    # whole operator is shuffle-free); above it, the distributed hash
    # join engages. A fully empty join side dies in Ray 2.49
    # (functions/blocks.py), hence the emptiness guards.
    if small_all is not None:
        small_cold_tbl = _route(small_all, False) if hot_keys else small_all
        if small_cold_tbl.num_rows:
            cref = put_broadcast(small_cold_tbl.select([key] + small_cols))
            route = (lambda t: _route(t, False)) if hot_keys else None
            parts.append(big_ds.map_batches(_bcast_join(cref, route=route),
                                            batch_format="pyarrow"))
    else:
        small_cold = pin_nonempty(small_pinned.map_batches(
            lambda t: _route(t, False), batch_format="pyarrow"))
        if small_cold.count() > 0:
            big_cold = big_ds.map_batches(
                lambda t: _route(t, False), batch_format="pyarrow")
            cold = big_cold.join(small_cold, join_type="inner",
                                 num_partitions=num_partitions, on=(key,))
            parts.append(cold.map_batches(
                lambda t: t.select(out_cols), batch_format="pyarrow"))

    if not parts:
        return big_ds.limit(0).map_batches(
            lambda t: t.select([]), batch_format="pyarrow")
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


# driver query: events ⋈ customer on user_id, per-segment rollup. The
# first ten user ids are force-routed through the broadcast side so the
# hash check covers BOTH routes and their union deterministically; the
# MG auto-detection (block-split-dependent by construction, lossless by
# construction) is pytest-gated with planted skew instead.
_Q66_FORCE_HOT = tuple(range(10))


def q66_skew_join_revenue(sf_dir: str) -> pd.DataFrame:
    from ..stages.windows import grouped_by_key_buckets

    # the probe side carries ONLY the key: the downstream rollup needs
    # row counts, not event ids, so nothing else should ride the join
    events = _read(sf_dir, "events", ["user_id"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]) \
        .map_batches(lambda t: t.rename_columns(["user_id", "c_mktsegment"]),
                     batch_format="pyarrow")
    joined = skew_join(events, cust, "user_id",
                       force_hot=list(_Q66_FORCE_HOT))

    # combiner-first per-segment rollup: per-block (segment, user)
    # partials, one segment-keyed exchange of pre-reduced rows
    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["c_mktsegment", "user_id"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["c_mktsegment", "user_id", "n_part"])

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        per_user = df.groupby(["c_mktsegment", "user_id"], as_index=False)[
            "n_part"].sum()
        g = per_user.groupby("c_mktsegment")
        out = pd.DataFrame({
            "mktsegment": list(g.groups),
            "n_events": g["n_part"].sum().astype("int64").values,
            "n_users": g["user_id"].nunique().astype("int64").values,
        })
        return out

    return (grouped_by_key_buckets(
        joined.map_batches(partial, batch_format="pyarrow"),
        "c_mktsegment", finish, num_buckets=4)
        .to_pandas().sort_values("mktsegment").reset_index(drop=True))


Q66_SQL = """
SELECT c.c_mktsegment AS mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q67 — ranked retrieval (quantized tf-idf top-k)
# ---------------------------------------------------------------------------

_IDF_SCALE = 1 << 20
_Q67_TERMS = ("join", "vector", "spark", "window", "merge", "stream")
_Q67_K = 20


def quantized_idf_topk(ds, id_col: str, text_col: str, terms,
                       k: int = _Q67_K) -> pd.DataFrame:
    """Top-k documents by sum of tf(d,t) * idf_q(t) over the query
    terms, idf_q = ((N - df + 1) * 2^20) // (df + 1). Ties broken by
    ascending id. Tokenization is the q52 single-space split, so the
    retrieval layer and the index layer agree on the term domain."""
    from ..stages.windows import grouped_by_key_buckets

    terms = sorted(set(terms))
    term_set = pa.array(terms)
    n_docs = ds.count()

    def _matches(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(t[text_col], " ")
        flat = pc.list_flatten(words)
        par = pc.list_parent_indices(words)
        doc = t[id_col].take(par)
        keep = pc.is_in(flat, value_set=term_set)
        return pa.table({"term": flat.filter(keep),
                         id_col: doc.filter(keep)})

    # df pass: per-block DISTINCT (term, doc) pairs -> one term-keyed
    # exchange of the (tiny) query-vocabulary matches
    def df_pairs(t: pa.Table) -> pa.Table:
        return _matches(t).group_by(["term", id_col]).aggregate([])

    def df_count(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates(["term", id_col]).groupby("term")
        return pd.DataFrame({"term": list(g.groups),
                             "df": g[id_col].nunique().astype("int64").values})

    dfs = grouped_by_key_buckets(
        ds.map_batches(df_pairs, batch_format="pyarrow"),
        "term", df_count, num_buckets=4).to_pandas()
    if dfs.empty:  # no document holds any query term
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "score_q": pd.Series([], dtype="int64")})
    # idf in exact python ints (fits int64: N*2^20 at N ~ 10^10 still
    # < 2^63; beyond that drop SCALE)
    idf = {t: ((n_docs - int(d) + 1) * _IDF_SCALE) // (int(d) + 1)
           for t, d in zip(dfs["term"], dfs["df"])}

    # scoring scan: zero shuffles, <= k rows leave each block
    def score(t: pa.Table) -> pa.Table:
        m = _matches(t)
        if m.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "score_q": pa.array([], pa.int64())})
        tf = m.group_by([id_col, "term"]).aggregate([("term", "count")]) \
              .to_pandas()
        tf["score_q"] = (tf["term_count"].astype("int64")
                         * tf["term"].map(idf).astype("int64"))
        s = tf.groupby(id_col, as_index=False)["score_q"].sum()
        s = s.sort_values(["score_q", id_col],
                          ascending=[False, True]).head(k)
        return pa.table({id_col: pa.array(s[id_col].to_numpy(), pa.int64()),
                         "score_q": pa.array(s["score_q"].to_numpy(),
                                             pa.int64())})

    parts = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    return (parts.sort_values(["score_q", id_col], ascending=[False, True])
            .head(k).reset_index(drop=True))


def q67_ranked_retrieval(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return quantized_idf_topk(ds, "doc_id", "text", _Q67_TERMS)


def _q67_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in sorted(set(_Q67_TERMS)))
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), n AS (SELECT COUNT(*) AS nn FROM documents),
df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok
  WHERE term IN ({terms}) GROUP BY 1
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok
  WHERE term IN ({terms}) GROUP BY 1, 2
)
SELECT tf.doc_id,
       CAST(SUM(tf.tf * (((n.nn - df.df + 1) * {_IDF_SCALE}) // (df.df + 1)))
            AS BIGINT) AS score_q
FROM tf JOIN df USING (term) CROSS JOIN n
GROUP BY tf.doc_id
ORDER BY score_q DESC, tf.doc_id
LIMIT {_Q67_K}
"""


# ---------------------------------------------------------------------------
# Q68 — Count-Min sketch
# ---------------------------------------------------------------------------

_CMS_W = 1024
# public 32-bit mixing constants (Knuth's multiplicative constant and
# two xxHash primes)
_CMS_A = (2654435761, 2246822519, 3266489917)
_CMS_PROBES = 160  # keys 0..159 probed; absent keys expose collisions


def _cms_positions(keys: np.ndarray, a: int) -> np.ndarray:
    return ((keys.astype(np.uint64) * np.uint64(a))
            % np.uint64(1 << 32)) % np.uint64(_CMS_W)


def cms_registers(ds, key_col: str) -> pd.DataFrame:
    """D x W Count-Min registers of the int key stream: per-block
    bincount partials (<= D*W nonzero cells leave a block), one
    pre-reduced pos-keyed exchange. Registers are sums, so the table is
    block-split invariant — the sketch itself hash-verifies."""
    from ..stages.windows import grouped_by_key_buckets

    def partial(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy()
        rs, poss, cs = [], [], []
        for r, a in enumerate(_CMS_A):
            cnt = np.bincount(_cms_positions(keys, a).astype(np.int64),
                              minlength=_CMS_W)
            nz = np.nonzero(cnt)[0]
            rs.append(np.full(len(nz), r, np.int64))
            poss.append(nz.astype(np.int64))
            cs.append(cnt[nz].astype(np.int64))
        return pa.table({"r": np.concatenate(rs), "pos": np.concatenate(poss),
                         "c": np.concatenate(cs)})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["r", "pos"], as_index=False)["c"].sum()

    return grouped_by_key_buckets(
        ds.map_batches(partial, batch_format="pyarrow"),
        "pos", merge, num_buckets=8).to_pandas()


def cms_estimate(registers: pd.DataFrame, probe_keys: np.ndarray) -> np.ndarray:
    """Point-frequency estimates: min over the D rows at each key's
    positions; absent cells read 0."""
    est = np.full(len(probe_keys), np.iinfo(np.int64).max, np.int64)
    for r, a in enumerate(_CMS_A):
        cells = np.zeros(_CMS_W, np.int64)
        sel = registers[registers["r"] == r]
        cells[sel["pos"].to_numpy()] = sel["c"].to_numpy()
        est = np.minimum(est, cells[_cms_positions(probe_keys, a).astype(np.int64)])
    return est


def q68_cms_frequency(sf_dir: str) -> pd.DataFrame:
    """CMS over the event user stream, probed at keys 0..159 (ids above
    the live range are deliberate: their nonzero estimates are pure
    hash collisions, and the oracle verifies those too — the
    approximation itself is the checked object, q59-style)."""
    regs = cms_registers(_read(sf_dir, "events", ["user_id"]), "user_id")
    probes = np.arange(_CMS_PROBES, dtype=np.int64)
    return pd.DataFrame({"user_id": probes,
                         "cms_est": cms_estimate(regs, probes)})


def _q68_sql() -> str:
    legs = " UNION ALL ".join(
        f"SELECT {r} AS r, ((user_id * {a}) % 4294967296) % {_CMS_W} AS pos"
        f" FROM events"
        for r, a in enumerate(_CMS_A))
    joins = "\n".join(
        f"LEFT JOIN reg g{r} ON g{r}.r = {r} AND"
        f" g{r}.pos = ((p.user_id * {a}) % 4294967296) % {_CMS_W}"
        for r, a in enumerate(_CMS_A))
    least = ", ".join(f"COALESCE(g{r}.c, 0)" for r in range(len(_CMS_A)))
    return f"""
WITH reg AS (
  SELECT r, pos, CAST(COUNT(*) AS BIGINT) AS c FROM ({legs}) GROUP BY r, pos
), probes AS (SELECT * FROM range({_CMS_PROBES}) t(user_id))
SELECT CAST(p.user_id AS BIGINT) AS user_id,
       CAST(LEAST({least}) AS BIGINT) AS cms_est
FROM probes p
{joins}
"""


# ---------------------------------------------------------------------------
# Q72 — pivot (long -> wide feature-table construction)
# ---------------------------------------------------------------------------

_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_counts(ds, row_key: str, col_key: str, categories) -> pd.DataFrame:
    """Long-to-wide count pivot: one row per ``row_key``, one int64
    column ``n_<category>`` per listed category — the feature-matrix
    step of classifier training over event logs. Categories must be
    declared (a distributed output schema cannot be data-dependent);
    values outside the list are dropped. Per-block (row, col) partial
    counts combine BEFORE the single row-keyed exchange — a user with
    a million events ships at most |categories| rows per block — and
    the wide reshape happens inside the bucket."""
    from ..stages.windows import grouped_by_key_buckets

    cats = list(categories)
    out_names = [f"n_{c}" for c in cats]

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t[col_key], value_set=pa.array(cats))
        g = t.filter(keep).group_by([row_key, col_key]).aggregate(
            [([], "count_all")])
        return g.rename_columns([row_key, col_key, "n_part"])

    def widen(df: pd.DataFrame) -> pd.DataFrame:
        per = df.groupby([row_key, col_key])["n_part"].sum().unstack(
            col_key, fill_value=0)
        per = per.reindex(columns=cats, fill_value=0).astype("int64")
        per.columns = out_names
        return per.reset_index()

    out = grouped_by_key_buckets(
        ds.map_batches(partial, batch_format="pyarrow"),
        row_key, widen).to_pandas()
    return (out.sort_values(row_key, kind="stable").reset_index(drop=True)
            [[row_key] + out_names])


def q72_event_pivot(sf_dir: str) -> pd.DataFrame:
    return pivot_counts(_read(sf_dir, "events", ["user_id", "event_type"]),
                        "user_id", "event_type", _PIVOT_TYPES)


def _q72_sql() -> str:
    cols = ",\n       ".join(
        f"CAST(COUNT(*) FILTER (WHERE event_type = '{c}') AS BIGINT)"
        f" AS n_{c}" for c in _PIVOT_TYPES)
    return f"SELECT user_id,\n       {cols}\nFROM events GROUP BY user_id"


# ---------------------------------------------------------------------------
# Q73 — per-key time-series resample + gap-fill (hourly activity curve)
# ---------------------------------------------------------------------------


def resample_cumulative(ds, key_col: str, ts_col: str,
                        freq: str = "h") -> pd.DataFrame:
    """Regular-grid resampling of an irregular event stream: for every
    key, one row per ``freq`` bucket between the key's first and last
    event, carrying the CUMULATIVE event count at that bucket's close —
    gap buckets are emitted with the carried value (forward fill). The
    alignment step every time-series feature pipeline needs before
    windowed models.

    Distribution: per-block (key, bucket) partial counts (an event-heavy
    key ships <= its active buckets per block, never per event), ONE
    key-bucketed exchange, and the grid mint + cumsum run vectorized
    inside the bucket. Grid length is bounded by the key's own span —
    nothing global materializes."""
    from ..stages.windows import grouped_by_key_buckets

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({
            key_col: t[key_col],
            "bucket_ts": pc.floor_temporal(t[ts_col], unit="hour"),
        }).group_by([key_col, "bucket_ts"]).aggregate([([], "count_all")])
        return g.rename_columns([key_col, "bucket_ts", "n_part"])

    def fill(df: pd.DataFrame) -> pd.DataFrame:
        per = df.groupby([key_col, "bucket_ts"], as_index=False)[
            "n_part"].sum()
        outs = []
        for k, grp in per.groupby(key_col, sort=False):
            s = grp.set_index("bucket_ts")["n_part"].sort_index()
            grid = pd.date_range(s.index.min(), s.index.max(), freq=freq)
            cum = s.reindex(grid, fill_value=0).cumsum()
            outs.append(pd.DataFrame({key_col: k, "bucket_ts": grid,
                                      "n_cum": cum.to_numpy()}))
        out = pd.concat(outs, ignore_index=True) if outs else pd.DataFrame(
            columns=[key_col, "bucket_ts", "n_cum"])
        out["n_cum"] = out["n_cum"].astype("int64")
        return out

    return (grouped_by_key_buckets(
        ds.map_batches(partial, batch_format="pyarrow"), key_col, fill)
        .to_pandas())


def q73_activity_resample(sf_dir: str) -> pd.DataFrame:
    return resample_cumulative(
        _read(sf_dir, "events", ["user_id", "ts"]), "user_id", "ts")


Q73_SQL = """
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS h,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), span AS (
  SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM hourly GROUP BY 1
), grid AS (
  SELECT user_id,
         unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS bucket_ts
  FROM span
)
SELECT g.user_id, g.bucket_ts,
       CAST(SUM(COALESCE(hh.n, 0)) OVER (
            PARTITION BY g.user_id ORDER BY g.bucket_ts) AS BIGINT) AS n_cum
FROM grid g LEFT JOIN hourly hh
  ON hh.user_id = g.user_id AND hh.h = g.bucket_ts
"""


# ---------------------------------------------------------------------------
# Q69 — deterministic train/valid/test split
# ---------------------------------------------------------------------------

_KNUTH = 2654435761
_SPLIT_BOUNDS = (900, 950)  # permille: [0,900) train, [900,950) valid, rest test


def hash_split(ds, id_col: str):
    """Exhaustive disjoint split assignment from the key alone: the
    q46 Knuth multiplicative hash into permille buckets. Stateless,
    zero shuffles; any party holding the key recomputes the split."""
    lo, hi = _SPLIT_BOUNDS

    def assign(t: pa.Table) -> pa.Table:
        d = t[id_col].to_numpy().astype(np.uint64)
        m = ((d * np.uint64(_KNUTH)) % np.uint64(1 << 32)) % np.uint64(1000)
        split = np.where(m < lo, "train", np.where(m < hi, "valid", "test"))
        return pa.table({id_col: t[id_col], "split": pa.array(split)})

    return ds.map_batches(assign, batch_format="pyarrow")


def q69_dataset_split(sf_dir: str) -> pd.DataFrame:
    return hash_split(
        _read(sf_dir, "documents", ["doc_id"]), "doc_id").to_pandas()


Q69_SQL = f"""
SELECT doc_id,
       CASE WHEN ((doc_id * {_KNUTH}) % 4294967296) % 1000 < {_SPLIT_BOUNDS[0]}
            THEN 'train'
            WHEN ((doc_id * {_KNUTH}) % 4294967296) % 1000 < {_SPLIT_BOUNDS[1]}
            THEN 'valid' ELSE 'test' END AS split
FROM documents
"""

import ray  # noqa: E402  (used by skew_join's bounded hot-side collect)
