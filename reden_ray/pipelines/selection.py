"""Data-selection & sketch operators for training-data pipelines
(q56-q63).

Beyond-reference family (like q45-q55): the selection, membership and
frequency machinery a 100 TB pretraining pipeline runs around its dedup
and quality passes. Every operator is Dataset-plane and combiner-first;
outputs are all-integer (or exact-string) so the DuckDB oracles are
bit-exact — the q42b/q51 precedent.

* q56 — DSIR-shaped importance resampling (Xie et al. 2023, "Data
  Selection for Language Models via Importance Resampling"): hashed
  word-feature counts for a target distribution (here the ``lang='en'``
  slice) vs the raw corpus, a per-bucket importance weight, one
  vectorized scoring scan, and a deterministic top-N selection. The
  published method scores log(p/q) of hashed n-grams; this keeps the
  exact same plumbing with an integer quantized ratio
  ``((ct+1) * 2^20) // (cr+1)`` so both engines agree bit-for-bit (a
  real deployment swaps in float log-ratios behind the same passes).
  Model build: B-bounded partial rows per block (B=64). Scoring: zero
  shuffles (model broadcast once). Selection: per-batch partial top-N,
  driver final — no global sort.
* q57 — triangle counting over the host link graph (the community /
  spam-cluster signal on a crawl graph): canonical undirected distinct
  edges, degree-ordered orientation (every out-neighborhood is
  O(sqrt(m)) — the node-iterator bound), wedge generation by a
  vectorized self-merge within src-bucketed groups, and a union-tagged
  bucket join against the oriented edge set to close wedges. Per-host
  triangle counts come out of a final combiner-first groupby.
* q58 — single-pass ROLLUP (grouping sets): one corpus scan emits
  partials for ALL grouping sets — (month, event_type), (month), ()
  — derived locally from the finest per-block aggregate, then ONE
  exchange of pre-reduced rows. The classic "don't scan once per
  grouping set" trick; oracle is DuckDB's native GROUP BY ROLLUP.
* q59 — Bloom-filter membership (the seen-URL / visited-set filter,
  reference ST5 at corpus scale): K=3 Knuth-multiplicative bit
  positions into an M=4096-bit filter, registers built as a
  max-semilattice of per-block OR partials (the q51 HLL shape:
  exchange bounded to M/32 words per block), broadcast once, then a
  vectorized probe scan. Both engines compute the identical filter, so
  the hash check covers the FALSE POSITIVES too, not just the happy
  path — the approximation itself is verified, and the output carries
  ``exact_member`` alongside ``bloom_member`` to expose the FP rows.
* q60 — Misra-Gries heavy hitters (mergeable frequency summaries,
  Agarwal et al. 2012): per-block MG summaries of capacity k merge by
  counter addition + (k+1)-th-count decrement; the exchange ships at
  most k rows per block at ANY corpus size. The driver query runs at a
  capacity above the stream's distinct count, where MG is provably
  exact (no decrements fire) and the SQL oracle is a plain GROUP BY;
  the under-capacity guarantees (every item with freq > N/(k+1)
  retained; 0 <= true - estimate <= N/(k+1)) are pytest-gated across
  random streams and random merge orders, where hash determinism is
  impossible by construction (decrements depend on block boundaries).

Scale notes: q56's model is 2xB ints (broadcast, never reshipped);
q57's only corpus-sized exchanges are the distinct-edge reduce, the
wedge bucket shuffle, and the closure join — wedge volume is bounded by
sum(out_deg^2) <= m^1.5 under degree orientation; q58's exchange is
(groups x 3) pre-reduced rows per block; q59's register exchange is
<= M/32 rows per block and the probe pass is shuffle-free; q60 ships
<= k rows per block. The q57 degree/rank table and q59 member list are
broadcast here (vocabulary-sized at sandbox scale) with the documented
join fallback at web scale — the same size-gate precedent as the
PageRank and KB-index paths.

Later additions: q61 deterministic bottom-k per-group sampling (the
mergeable KMV sketch — see ``bottom_k_per_group`` / ``kmv_estimate``),
q62 k-core decomposition (iterative peeling; the oracle unrolls the
rounds as MATERIALIZED CTEs), q63 funnel analysis (ordered
sequence-prefix matching per user — a shape neither groupby nor join
covers; the only lossless per-block reduction is DISTINCT
(key, type, ts), which ``funnel_counts`` documents and applies).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Sum

from ..state.broadcast import get_broadcast

_KNUTH = 2654435761  # Knuth multiplicative hash constant (public)
_M32 = 4294967296
# node-shaped state above this many rows routes through Dataset joins
# instead of a driver broadcast (shared by the graph operators)
_NODE_BROADCAST_LIMIT = 2_000_000


def _read(sf_dir: str, table: str, columns=None):
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# Q56 — DSIR-shaped hashed-feature importance resampling
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 64
_DSIR_SCALE = 1 << 20
_DSIR_TOP_N = 200


def _word_buckets(words: np.ndarray) -> np.ndarray:
    """Deterministic per-word feature bucket, computed over the UNIQUE
    words of a batch only (vocabulary-sized loop; the per-token path is
    fancy-indexed). The hash — length*131 + first-codepoint*31 +
    last-codepoint, mod B — is chosen to be exactly expressible in SQL
    (length / ascii / ascii(reverse)); a production DSIR run swaps in a
    murmur-style n-gram hash behind the same passes."""
    out = np.empty(len(words), dtype=np.int64)
    for i, w in enumerate(words):
        out[i] = (len(w) * 131 + ord(w[0]) * 31 + ord(w[-1])) % _DSIR_BUCKETS
    return out


def _tokens_with_buckets(t: pa.Table):
    """text column -> (parent doc index per token, bucket per token)."""
    words = pc.split_pattern(t["text"], " ")
    flat = pc.list_flatten(words)
    par = pc.list_parent_indices(words)
    keep = pc.not_equal(flat, pa.scalar(""))
    flat = flat.filter(keep).to_numpy(zero_copy_only=False)
    par = par.filter(keep).to_numpy(zero_copy_only=False).astype(np.int64)
    uniq, inv = np.unique(flat, return_inverse=True)
    return par, _word_buckets(uniq)[inv]


def dsir_model(ds, target_mask_col: str = "__is_target") -> np.ndarray:
    """Per-bucket (target_count, raw_count) over the corpus: per-batch
    bincount combiner -> <=B rows per block -> driver sum. Returns the
    integer weight vector w[b] = ((ct+1) * SCALE) // (cr+1)."""

    def partial(t: pa.Table) -> pa.Table:
        par, bk = _tokens_with_buckets(t)
        is_t = t[target_mask_col].to_numpy(zero_copy_only=False)[par]
        cr = np.bincount(bk, minlength=_DSIR_BUCKETS)
        ct = np.bincount(bk[is_t], minlength=_DSIR_BUCKETS)
        b = np.arange(_DSIR_BUCKETS, dtype=np.int64)
        return pa.table({"b": pa.array(b),
                         "ct": pa.array(ct.astype(np.int64)),
                         "cr": pa.array(cr.astype(np.int64))})

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("b").aggregate(Sum("ct"), Sum("cr")).to_pandas())
    ct = np.zeros(_DSIR_BUCKETS, dtype=np.int64)
    cr = np.zeros(_DSIR_BUCKETS, dtype=np.int64)
    ct[hist["b"].to_numpy()] = hist["sum(ct)"].to_numpy()
    cr[hist["b"].to_numpy()] = hist["sum(cr)"].to_numpy()
    return (ct + 1) * _DSIR_SCALE // (cr + 1)


def dsir_select(ds, weights: np.ndarray, id_col: str = "doc_id",
                top_n: int = _DSIR_TOP_N) -> pd.DataFrame:
    """Score every document against the broadcast weight vector and
    keep the global top-N by (score desc, id asc): per-batch partial
    top-N (N rows leave each block), driver final — no global sort."""
    w_ref = ray.put(weights)

    def score(t: pa.Table) -> pa.Table:
        w = get_broadcast(w_ref)
        par, bk = _tokens_with_buckets(t)
        s = np.zeros(t.num_rows, dtype=np.int64)
        np.add.at(s, par, w[bk])  # int64-exact segment sum
        ids = t[id_col].to_numpy(zero_copy_only=False)
        has = np.zeros(t.num_rows, dtype=bool)
        has[par] = True  # docs with zero tokens get no score row (SQL parity)
        order = np.lexsort((ids[has], -s[has]))[:top_n]
        return pa.table({id_col: pa.array(ids[has][order]),
                         "dsir_score": pa.array(s[has][order])})

    parts = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["dsir_score", id_col],
                              ascending=[False, True], kind="stable")
    return parts.head(top_n).reset_index(drop=True)


def q56_dsir_sample(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def mark(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__is_target", pc.equal(t["lang"], pa.scalar("en")))

    marked = ds.map_batches(mark, batch_format="pyarrow")
    w = dsir_model(marked)
    return dsir_select(marked, w)


Q56_SQL = f"""
WITH w AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word FROM documents
), wf AS (
  SELECT doc_id, lang,
         (length(word) * 131 + ascii(word) * 31 + ascii(reverse(word)))
           % {_DSIR_BUCKETS} AS b
  FROM w WHERE word <> ''
), model AS (
  SELECT b, SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct,
         COUNT(*) AS cr
  FROM wf GROUP BY b
), scored AS (
  SELECT wf.doc_id,
         SUM(((m.ct + 1) * {_DSIR_SCALE}) // (m.cr + 1)) AS dsir_score
  FROM wf JOIN model m USING (b) GROUP BY wf.doc_id
), ranked AS (
  SELECT doc_id, dsir_score,
         ROW_NUMBER() OVER (ORDER BY dsir_score DESC, doc_id) AS rn
  FROM scored
)
SELECT doc_id, CAST(dsir_score AS BIGINT) AS dsir_score
FROM ranked WHERE rn <= {_DSIR_TOP_N}
"""


# ---------------------------------------------------------------------------
# Q57 — triangle counting over the host link graph
# ---------------------------------------------------------------------------

_TRI_BUCKETS = 32


def _coalesce_if_tiny(ds):
    """Repartition when blocks are tiny (the q43 snapshot-diff idiom):
    a small materialized set left in O(read tasks) blocks pays chained
    per-block dispatch for no actual data movement; at scale blocks
    arrive right-sized and the condition never fires."""
    n_rows, n_blocks = ds.count(), max(1, ds.num_blocks())
    target = max(1, n_rows // 250_000 + 1)
    if n_rows / n_blocks < 50_000 and n_blocks > target:
        ds = ds.repartition(target).materialize()
    return ds


def _derived_hosts(t: pa.Table) -> pa.Table:
    """doc_id -> the q33-derived 'cdnN.example.org' host stream (17
    distinct hosts; shared by q60/q61 and their SQL mirrors)."""
    hid = pc.subtract(t["doc_id"],
                      pc.multiply(pc.divide(t["doc_id"], 17),
                                  pa.scalar(17, pa.int64())))
    host = pc.binary_join_element_wise(
        "cdn", pc.cast(hid, pa.string()), ".example.org", "")
    return pa.table({"host": host, "doc_id": t["doc_id"]})


def undirected_distinct_edges(edges_ds, src_col: str = "src_host",
                              dst_col: str = "dst_host"):
    """Weighted directed edge list -> canonical undirected distinct
    (u < v) pairs: per-block distinct combiner, then dedup inside ONE
    u-keyed bucket exchange (duplicate pairs share u, so co-location
    by u makes the in-bucket drop_duplicates global)."""
    from ..stages.windows import grouped_by_key_buckets

    def canon(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t[src_col], t[dst_col])
        s, d = t[src_col].filter(keep), t[dst_col].filter(keep)
        lo = pc.min_element_wise(s, d)
        hi = pc.max_element_wise(s, d)
        return (pa.table({"u": lo, "v": hi})
                .group_by(["u", "v"]).aggregate([]))

    pairs = edges_ds.map_batches(canon, batch_format="pyarrow")
    return grouped_by_key_buckets(
        pairs, "u", lambda df: df.drop_duplicates(["u", "v"]),
        num_buckets=_TRI_BUCKETS)


def triangle_counts(edges_ds, src_col: str = "src_host",
                    dst_col: str = "dst_host",
                    node_broadcast_limit: int = _NODE_BROADCAST_LIMIT
                    ) -> pd.DataFrame:
    """Per-host triangle counts by degree-oriented wedge closure.

    Orientation compares (degree, node) tuples per edge, so the degree
    attach is the only node-shaped state — size-gated on the MEASURED
    node count (the KB-gate discipline): below ``node_broadcast_limit``
    the degree table broadcasts once and the attach is a vectorized
    map; above it the attach is two hash joins on the endpoints and
    nothing node-shaped lands on the driver. Everything corpus-sized
    stays on the Dataset plane: the distinct-edge reduce, the
    src-bucketed wedge self-merge, and the union-tagged closure join."""
    from ..functions.bucket import add_bucket

    # distinct pairs are consumed by three downstream passes (degrees,
    # orientation, and the closure union twice) — materialize once so
    # the pages->edges chain doesn't re-execute per consumer; coalesce
    # when blocks are tiny (the q43 snapshot-diff idiom: a small edge
    # set left in O(read tasks) blocks pays ~5 exchanges of per-block
    # dispatch for no actual data movement; at scale blocks arrive
    # right-sized and the condition never fires)
    und = _coalesce_if_tiny(
        undirected_distinct_edges(edges_ds, src_col, dst_col).materialize())

    deg_ds = _degrees_ds(und).materialize()
    n_nodes = deg_ds.count()
    if n_nodes == 0:
        return pd.DataFrame({"host": pd.array([], dtype=object),
                             "n_triangles": pd.array([], dtype="int64")})

    # attach per-endpoint degrees, then orient low (deg, node) ->
    # high (deg, node); out-degree is then O(sqrt m)
    def orient_rows(df: pd.DataFrame) -> pd.DataFrame:
        fwd = (df["deg_u"].to_numpy() < df["deg_v"].to_numpy()) | (
            (df["deg_u"].to_numpy() == df["deg_v"].to_numpy())
            & (df["u"].to_numpy() < df["v"].to_numpy()))
        return pd.DataFrame({
            "src": np.where(fwd, df["u"], df["v"]),
            "dst": np.where(fwd, df["v"], df["u"]),
            "ddeg": np.where(fwd, df["deg_v"], df["deg_u"]).astype(np.int64)})

    if n_nodes <= node_broadcast_limit:
        degs = deg_ds.to_pandas()
        deg_ref = ray.put(dict(zip(degs["node"], degs["deg"].astype(int))))

        def attach(df: pd.DataFrame) -> pd.DataFrame:
            dk = get_broadcast(deg_ref)
            df = df.assign(deg_u=df["u"].map(dk).astype(np.int64),
                           deg_v=df["v"].map(dk).astype(np.int64))
            return orient_rows(df)

        oriented = und.map_batches(attach, batch_format="pandas")
    else:  # web-scale route: two hash-join degree attaches
        du = deg_ds.map_batches(
            lambda t: pa.table({"u": t["node"],
                                "deg_u": pc.cast(t["deg"], pa.int64())}),
            batch_format="pyarrow")
        dv = deg_ds.map_batches(
            lambda t: pa.table({"v": t["node"],
                                "deg_v": pc.cast(t["deg"], pa.int64())}),
            batch_format="pyarrow")
        np_ = max(8, und.num_blocks())
        attached = (und.join(du, join_type="inner", on=("u",),
                             num_partitions=np_)
                    .join(dv, join_type="inner", on=("v",),
                          num_partitions=np_))
        oriented = attached.map_batches(orient_rows, batch_format="pandas")

    # consumed twice (wedge generation + the closure union)
    oriented = oriented.materialize()

    # wedges: vectorized self-merge within src-bucketed groups (all
    # out-edges of a src are co-located by the bucket exchange);
    # neighbor order is the same (deg, node) total order, carried as
    # the (ddeg, dst) tuple
    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns="__bucket")
        m = df.merge(df, on="src", suffixes=("_1", "_2"))
        lt = (m["ddeg_1"].to_numpy() < m["ddeg_2"].to_numpy()) | (
            (m["ddeg_1"].to_numpy() == m["ddeg_2"].to_numpy())
            & (m["dst_1"].to_numpy() < m["dst_2"].to_numpy()))
        m = m[lt]
        return pd.DataFrame({"b": m["dst_1"], "c": m["dst_2"],
                             "apex": m["src"]})

    wedge_ds = (oriented.map_batches(
        lambda t: add_bucket(t, "src", _TRI_BUCKETS), batch_format="pyarrow")
        .groupby("__bucket").map_groups(wedges, batch_format="pandas"))

    # closure: union-tag wedges and oriented edges, co-locate by b, and
    # match (b, c) inside each bucket (the q43 snapshot-diff idiom)
    def tag_edge(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"b": df["src"], "c": df["dst"],
                             "apex": "", "__kind": "edge"})

    def tag_wedge(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["b", "c", "apex"]].copy()
        out["__kind"] = "wedge"
        return out

    tagged = (oriented.map_batches(tag_edge, batch_format="pandas")
              .union(wedge_ds.map_batches(tag_wedge, batch_format="pandas"))
              .map_batches(lambda t: add_bucket(t, "b", _TRI_BUCKETS),
                           batch_format="pyarrow"))

    def close(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["__kind"] == "edge"][["b", "c"]]
        wdg = df[df["__kind"] == "wedge"][["b", "c", "apex"]]
        tri = wdg.merge(e, on=["b", "c"])
        hosts = pd.concat([tri["apex"], tri["b"], tri["c"]])
        c = hosts.value_counts()
        return pd.DataFrame({"host": c.index,
                             "n_part": c.to_numpy().astype(np.int64)})

    per_host = (tagged.groupby("__bucket")
                .map_groups(lambda df: close(df.drop(columns="__bucket")),
                            batch_format="pandas")
                .groupby("host")
                .aggregate(Sum("n_part", alias_name="n_triangles")))
    out = per_host.to_pandas()
    out["n_triangles"] = out["n_triangles"].astype("int64")
    return out


def q57_triangle_counts(sf_dir: str) -> pd.DataFrame:
    from .webops import host_link_edges, linked_pages_from_documents

    return triangle_counts(
        host_link_edges(linked_pages_from_documents(sf_dir)))


def _q57_sql() -> str:
    from .webops import _Q42_EDGES_CTE

    return f"""
WITH {_Q42_EDGES_CTE},
und AS (
  SELECT DISTINCT LEAST(src_host, dst_host) AS u,
         GREATEST(src_host, dst_host) AS v
  FROM edges WHERE src_host <> dst_host
), tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM und e1
  JOIN und e2 ON e2.u = e1.v
  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
), hosts AS (
  SELECT a AS host FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT host, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM hosts GROUP BY host
"""


# ---------------------------------------------------------------------------
# Q58 — single-pass ROLLUP / grouping sets
# ---------------------------------------------------------------------------


def rollup_events(ds) -> pd.DataFrame:
    """ONE scan emits partials for all three grouping sets of
    ROLLUP(month, event_type); sentinels month=-1 / event_type='' mark
    rolled-up levels and gid is DuckDB's GROUPING id (0 detail, 1
    month-level, 3 grand total). The exchange ships pre-reduced rows
    only (<= 3x distinct groups per block)."""
    from ..stages.windows import grouped_by_key_buckets

    def partials(t: pa.Table) -> pa.Table:
        month = pc.cast(pc.month(t["ts"]), pa.int64())
        fv = pc.cast(pc.floor(t["value"]), pa.int64())
        base = pa.table({"month": month, "event_type": t["event_type"],
                         "fv": fv,
                         "one": pa.array(np.ones(t.num_rows, np.int64))})
        # count rides a ones column (COUNT(*) semantics — a null value
        # must still count the row); SUM skips nulls on both engines,
        # and an all-null group's null sum becomes 0 to stay integer
        # (the oracle COALESCEs identically)
        g = base.group_by(["month", "event_type"]).aggregate(
            [("fv", "sum"), ("one", "sum")])
        d = g.to_pandas()
        d = d.rename(columns={"fv_sum": "sv", "one_sum": "nv"})
        d["sv"] = d["sv"].fillna(0).astype("int64")
        lv1 = d.groupby("month", as_index=False)[["sv", "nv"]].sum()
        lv1["event_type"] = ""
        lv3 = pd.DataFrame({"month": [-1], "event_type": [""],
                            "sv": [d["sv"].sum()], "nv": [d["nv"].sum()]})
        d["gid"], lv1["gid"], lv3["gid"] = 0, 1, 3
        allp = pd.concat([d, lv1, lv3], ignore_index=True)
        allp["gkey"] = (allp["gid"].astype(str) + "|"
                        + allp["month"].astype(str) + "|"
                        + allp["event_type"])
        return pa.Table.from_pandas(
            allp[["gkey", "gid", "month", "event_type", "sv", "nv"]],
            preserve_index=False)

    def reduce(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["gid", "month", "event_type"], as_index=False)[
            ["sv", "nv"]].sum()
        return pd.DataFrame({
            "gid": g["gid"].astype("int64"),
            "month": g["month"].astype("int64"),
            "event_type": g["event_type"],
            "n_events": g["nv"].astype("int64"),
            "sum_floor_value": g["sv"].astype("int64")})

    return grouped_by_key_buckets(
        ds.map_batches(partials, batch_format="pyarrow"),
        "gkey", reduce, num_buckets=8).to_pandas()


def q58_rollup(sf_dir: str) -> pd.DataFrame:
    return rollup_events(_read(sf_dir, "events",
                               ["ts", "event_type", "value"]))


Q58_SQL = """
WITH e AS (
  SELECT month(ts) AS m, event_type, CAST(FLOOR(value) AS BIGINT) AS fv
  FROM events
)
SELECT CAST(GROUPING(m) * 2 + GROUPING(event_type) AS BIGINT) AS gid,
       CAST(COALESCE(m, -1) AS BIGINT) AS month,
       COALESCE(event_type, '') AS event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(fv) AS BIGINT) AS sum_floor_value
FROM e GROUP BY ROLLUP(m, event_type)
""".replace("CAST(SUM(fv) AS BIGINT)",
              "CAST(COALESCE(SUM(fv), 0) AS BIGINT)")


# ---------------------------------------------------------------------------
# Q59 — Bloom-filter membership (seen-set filter)
# ---------------------------------------------------------------------------

_BLOOM_M = 4096          # bits
_BLOOM_K = 3             # hash functions
_BLOOM_STEP = 40503      # per-hash offset multiplier (public constant)
_BLOOM_WORDS = _BLOOM_M // 32


def _bloom_positions(keys: np.ndarray) -> np.ndarray:
    """(n, K) int64 bit positions; int64-exact for keys < 2^31."""
    k = np.arange(_BLOOM_K, dtype=np.int64)
    return ((keys[:, None] * _KNUTH + k[None, :] * _BLOOM_STEP)
            % _M32) % _BLOOM_M


def bloom_registers(ds, key_col: str) -> np.ndarray:
    """Build the M-bit filter as packed int64 words (32 bits used per
    word so the SQL mirror stays in BIGINT): per-block OR partials ->
    <= M/32 (word, register) rows per block -> driver OR. A
    max/OR-semilattice, so the reduce is order-independent (q51)."""

    def partial(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.unique(_bloom_positions(keys))
        word, bit = pos // 32, pos % 32
        regs = np.zeros(_BLOOM_WORDS, dtype=np.int64)
        np.bitwise_or.at(regs, word, np.int64(1) << bit)
        nz = np.nonzero(regs)[0]
        return pa.table({"word": pa.array(nz.astype(np.int64)),
                         "reg": pa.array(regs[nz])})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    regs = np.zeros(_BLOOM_WORDS, dtype=np.int64)
    if len(parts):  # an empty member stream leaves an all-zero filter
        np.bitwise_or.at(regs, parts["word"].to_numpy(),
                         parts["reg"].to_numpy())
    return regs


def bloom_probe(ds, regs: np.ndarray, key_col: str,
                out_col: str = "bloom_member"):
    """Vectorized membership test against the broadcast registers —
    zero shuffles; the filter is shipped once per worker."""
    regs_ref = ray.put(regs)

    def test(t: pa.Table) -> pa.Table:
        r = get_broadcast(regs_ref)
        keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = _bloom_positions(keys)
        hit = ((r[pos // 32] >> (pos % 32)) & 1).all(axis=1)
        return t.append_column(out_col,
                               pa.array(hit.astype(np.int64), pa.int64()))

    return ds.map_batches(test, batch_format="pyarrow")


def q59_bloom_membership(sf_dir: str) -> pd.DataFrame:
    """Seen-set demo over the documents table: the filter holds the
    ``lang='en'`` doc ids; every doc probes a derived key
    (doc_id*3 + 7) mod n. ``exact_member`` (a broadcast sorted-id
    lookup here; the very set a Bloom filter replaces at scale — kept
    only to expose the false-positive rows in the verified output)
    rides along so bloom_member vs exact_member differences are the
    hash-checked FP set."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    n = ds.count()
    members = ds.filter(expr="lang == 'en'")
    regs = bloom_registers(members, "doc_id")

    mem_ids = np.sort(members.to_pandas()["doc_id"].to_numpy())
    mem_ref = ray.put(mem_ids)

    def probe_keys(t: pa.Table) -> pa.Table:
        p = pc.add(pc.multiply(t["doc_id"], pa.scalar(3, pa.int64())),
                   pa.scalar(7, pa.int64()))
        p = pc.subtract(p, pc.multiply(pc.divide(p, n),
                                       pa.scalar(n, pa.int64())))
        return pa.table({"doc_id": t["doc_id"], "probe_key": p})

    probes = ds.map_batches(probe_keys, batch_format="pyarrow")
    tested = bloom_probe(probes, regs, "probe_key")

    def exact(t: pa.Table) -> pa.Table:
        mem = get_broadcast(mem_ref)
        keys = t["probe_key"].to_numpy(zero_copy_only=False)
        if len(mem) == 0:
            ok = np.zeros(len(keys), dtype=bool)
        else:
            i = np.searchsorted(mem, keys)
            ok = (i < len(mem)) & (mem[np.minimum(i, len(mem) - 1)] == keys)
        return t.append_column(
            "exact_member", pa.array(ok.astype(np.int64), pa.int64()))

    return tested.map_batches(exact, batch_format="pyarrow").to_pandas()


Q59_SQL = f"""
WITH n AS (SELECT COUNT(*) AS n FROM documents),
mem AS (SELECT doc_id FROM documents WHERE lang = 'en'),
ks(k) AS (VALUES (0), (1), (2)),
bits AS (
  SELECT DISTINCT
    ((doc_id * {_KNUTH} + k * {_BLOOM_STEP}) % {_M32}) % {_BLOOM_M} AS pos
  FROM mem CROSS JOIN ks
), probe AS (
  SELECT doc_id, (doc_id * 3 + 7) % (SELECT n FROM n) AS p FROM documents
), pb AS (
  SELECT doc_id, p,
    ((p * {_KNUTH} + k * {_BLOOM_STEP}) % {_M32}) % {_BLOOM_M} AS pos
  FROM probe CROSS JOIN ks
), hits AS (
  SELECT doc_id, COUNT(*) AS nhit FROM pb JOIN bits USING (pos)
  GROUP BY doc_id
)
SELECT pr.doc_id, CAST(pr.p AS BIGINT) AS probe_key,
       CAST(CASE WHEN COALESCE(h.nhit, 0) = {_BLOOM_K} THEN 1 ELSE 0 END
            AS BIGINT) AS bloom_member,
       CAST(CASE WHEN pr.p IN (SELECT doc_id FROM mem) THEN 1 ELSE 0 END
            AS BIGINT) AS exact_member
FROM probe pr LEFT JOIN hits h ON h.doc_id = pr.doc_id
"""


# ---------------------------------------------------------------------------
# Q60 — Misra-Gries heavy hitters (mergeable frequency summaries)
# ---------------------------------------------------------------------------

_MG_CAPACITY = 32


def mg_summarize(items: np.ndarray, counts: np.ndarray,
                 capacity: int) -> tuple[np.ndarray, np.ndarray]:
    """Misra-Gries reduce of a (item, count) multiset to <= capacity
    counters: if more than ``capacity`` distinct items, subtract the
    (capacity+1)-th largest count from all and drop the non-positive
    (Agarwal et al. 2012 merge rule — associative error composition)."""
    if len(items) > capacity:
        order = np.argsort(counts, kind="stable")[::-1]
        items, counts = items[order], counts[order]
        dec = counts[capacity]
        counts = counts - dec
        keep = counts > 0
        items, counts = items[keep], counts[keep]
    return items, counts


def heavy_hitters(ds, key_col: str, capacity: int = _MG_CAPACITY,
                  num_buckets: int = 8) -> pd.DataFrame:
    """Mergeable MG summary of the key stream: per-block value_counts
    + MG truncation (<= capacity rows leave each block), one key-bucket
    exchange with an in-bucket MG re-merge, and a driver-side final
    merge over <= capacity*num_buckets rows. Estimates are exact
    (no decrement fires anywhere) whenever the stream's distinct count
    is <= capacity; otherwise they carry the standard one-sided
    N/(capacity+1) error, pytest-gated."""
    from ..stages.windows import grouped_by_key_buckets

    def partial(t: pa.Table) -> pa.Table:
        vc = t[key_col].value_counts()
        it = vc.field("values").to_numpy(zero_copy_only=False)
        ct = vc.field("counts").to_numpy().astype(np.int64)
        it, ct = mg_summarize(it, ct, capacity)
        return pa.table({key_col: pa.array(it),
                         "mg_count": pa.array(ct, pa.int64())})

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key_col, as_index=False)["mg_count"].sum()
        it, ct = mg_summarize(g[key_col].to_numpy(),
                              g["mg_count"].to_numpy().astype(np.int64),
                              capacity)
        return pd.DataFrame({key_col: it, "mg_count": ct})

    parts = grouped_by_key_buckets(
        ds.map_batches(partial, batch_format="pyarrow"),
        key_col, merge_bucket, num_buckets=num_buckets).to_pandas()
    g = parts.groupby(key_col, as_index=False)["mg_count"].sum()
    it, ct = mg_summarize(g[key_col].to_numpy(),
                          g["mg_count"].to_numpy().astype(np.int64),
                          capacity)
    out = pd.DataFrame({key_col: it, "mg_count": ct.astype("int64")})
    return out.sort_values(key_col, kind="stable").reset_index(drop=True)


def q60_heavy_hitters(sf_dir: str) -> pd.DataFrame:
    """Host-frequency heavy hitters over the q33 derived host stream
    (17 distinct hosts < capacity 32, so MG is provably exact here and
    the oracle is a plain GROUP BY; under-capacity behavior is
    pytest-gated where it belongs — the estimates are then block-
    boundary-dependent by construction)."""
    ds = _read(sf_dir, "documents", ["doc_id"])
    hosts = ds.map_batches(
        lambda t: _derived_hosts(t).select(["host"]),
        batch_format="pyarrow")
    return heavy_hitters(hosts, "host")


Q60_SQL = """
SELECT 'cdn' || CAST(doc_id % 17 AS VARCHAR) || '.example.org' AS host,
       CAST(COUNT(*) AS BIGINT) AS mg_count
FROM documents GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q61 — deterministic bottom-k sampling per group (KMV sketch)
# ---------------------------------------------------------------------------

_BOTTOMK_K = 5


def bottom_k_per_group(ds, group_col: str, id_col: str,
                       k: int = _BOTTOMK_K) -> pd.DataFrame:
    """The mergeable uniform-sample sketch: per group, keep the k ids
    with the smallest Knuth hash rank. Per-block partial bottom-k (at
    most k rows per group leave each block), ONE group-keyed exchange,
    in-bucket final bottom-k. bottom-k of a union == bottom-k of
    bottom-k's, so the reduce is order-independent and the sample is
    reproducible from the keys alone (resumable at 100 TB, no stored
    sampler state) — and the k-th smallest hash doubles as the KMV
    distinct-count estimator."""
    from ..stages.windows import grouped_by_key_buckets

    def partial(t: pa.Table) -> pa.Table:
        df = t.select([group_col, id_col]).to_pandas()
        ids = df[id_col].to_numpy().astype(np.int64)
        df["hv"] = (ids * _KNUTH) % _M32
        df = df.sort_values([group_col, "hv", id_col], kind="stable")
        return pa.Table.from_pandas(df.groupby(group_col, sort=False).head(k),
                                    preserve_index=False)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([group_col, "hv", id_col], kind="stable")
        out = df.groupby(group_col, sort=False).head(k).copy()
        out["smp_rank"] = out.groupby(group_col, sort=False).cumcount() + 1
        out["smp_rank"] = out["smp_rank"].astype("int64")
        return out[[group_col, "smp_rank", id_col]]

    return grouped_by_key_buckets(
        ds.map_batches(partial, batch_format="pyarrow"),
        group_col, final, num_buckets=8).to_pandas()


def q61_bottomk_sample(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", ["doc_id"])
    return bottom_k_per_group(
        ds.map_batches(_derived_hosts, batch_format="pyarrow"),
        "host", "doc_id")


Q61_SQL = f"""
WITH d AS (
  SELECT doc_id,
         'cdn' || CAST(doc_id % 17 AS VARCHAR) || '.example.org' AS host,
         (doc_id * {_KNUTH}) % {_M32} AS hv
  FROM documents
), r AS (
  SELECT host, doc_id,
         ROW_NUMBER() OVER (PARTITION BY host ORDER BY hv, doc_id)
           AS smp_rank
  FROM d
)
SELECT host, CAST(smp_rank AS BIGINT) AS smp_rank, doc_id
FROM r WHERE smp_rank <= {_BOTTOMK_K}
"""


# ---------------------------------------------------------------------------
# Q77 — WEIGHTED bottom-k sample (quality-proportional data selection)
# ---------------------------------------------------------------------------
# The sampling step AFTER quality scoring: pick k docs per host with
# inclusion probability increasing in an integer quality weight — the
# Efraimidis–Spirakis weighted-reservoir idea with the float priority
# u^(1/w) replaced by the integer rank hash(id) // w (w >= 1), which
# keeps the whole sample reproducible from the keys alone AND
# hash-verifiable (identical floor-div arithmetic in DuckDB). Same
# mergeable-sketch property as q61: bottom-k by (rank, id) of a union
# == bottom-k of per-block bottom-k's, so per-block partials bound the
# exchange to k rows per (host, block) and the reduce is
# order-independent. Weight here is the q8-style length proxy
# 1 + n_chars // 64; a real pipeline plugs its quality score in.

_WEIGHTED_K = 5
_WEIGHT_CHARS_DIV = 64


def weighted_bottom_k_per_group(ds, group_col: str, id_col: str,
                                weight_col: str,
                                k: int = _WEIGHTED_K) -> pd.DataFrame:
    """Per group, the k ids with the smallest hash(id) // weight —
    heavier rows get systematically smaller ranks, the integer analog
    of weighted sampling without replacement. Per-block partial
    bottom-k, ONE group-keyed exchange, in-bucket final bottom-k."""
    from ..stages.windows import grouped_by_key_buckets

    def partial(t: pa.Table) -> pa.Table:
        df = t.select([group_col, id_col, weight_col]).to_pandas()
        ids = df[id_col].to_numpy().astype(np.int64)
        w = np.maximum(df[weight_col].to_numpy().astype(np.int64), 1)
        df["rk"] = ((ids * _KNUTH) % _M32) // w
        df = df.sort_values([group_col, "rk", id_col], kind="stable")
        return pa.Table.from_pandas(
            df.groupby(group_col, sort=False).head(k), preserve_index=False)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([group_col, "rk", id_col], kind="stable")
        out = df.groupby(group_col, sort=False).head(k).copy()
        out["smp_rank"] = out.groupby(group_col, sort=False).cumcount() + 1
        out["smp_rank"] = out["smp_rank"].astype("int64")
        out["rk"] = out["rk"].astype("int64")
        return out[[group_col, "smp_rank", id_col, "rk"]]

    return grouped_by_key_buckets(
        ds.map_batches(partial, batch_format="pyarrow"),
        group_col, final, num_buckets=8).to_pandas()


def q77_weighted_sample(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def prep(t: pa.Table) -> pa.Table:
        return _derived_hosts(t).append_column(
            "w", pc.add(pc.divide(t["n_chars"],
                                  pa.scalar(_WEIGHT_CHARS_DIV, pa.int64())),
                        pa.scalar(1, pa.int64())))

    return weighted_bottom_k_per_group(
        ds.map_batches(prep, batch_format="pyarrow"),
        "host", "doc_id", "w")


Q77_SQL = f"""
WITH d AS (
  SELECT doc_id,
         'cdn' || CAST(doc_id % 17 AS VARCHAR) || '.example.org' AS host,
         ((doc_id * {_KNUTH}) % {_M32})
           // GREATEST(1 + n_chars // {_WEIGHT_CHARS_DIV}, 1) AS rk
  FROM documents
), r AS (
  SELECT host, doc_id, rk,
         ROW_NUMBER() OVER (PARTITION BY host ORDER BY rk, doc_id)
           AS smp_rank
  FROM d
)
SELECT host, CAST(smp_rank AS BIGINT) AS smp_rank, doc_id,
       CAST(rk AS BIGINT) AS rk
FROM r WHERE smp_rank <= {_WEIGHTED_K}
"""


# ---------------------------------------------------------------------------
# Q62 — k-core decomposition (iterative peeling)
# ---------------------------------------------------------------------------

_KCORE_K = 18
_KCORE_MIN_LINKS = 2   # sparsify the fixture host graph before peeling
_KCORE_MAX_ROUNDS = 12


def _degrees_ds(und_ds):
    """Dataset-plane per-node degrees over distinct undirected (u, v)
    pairs: per-block value-count combiner, one node-keyed reduce (one
    row per host leaves each block). Stays a Dataset so node-shaped
    state never has to land on the driver."""

    def part(df: pd.DataFrame) -> pd.DataFrame:
        c = pd.concat([df["u"], df["v"]]).value_counts()
        return pd.DataFrame({"node": c.index, "d": c.to_numpy()})

    return (und_ds.map_batches(part, batch_format="pandas")
            .groupby("node").aggregate(Sum("d", alias_name="deg")))


def k_core(edges_ds, k: int = _KCORE_K, src_col: str = "src_host",
           dst_col: str = "dst_host",
           max_rounds: int = _KCORE_MAX_ROUNDS,
           node_broadcast_limit: int = _NODE_BROADCAST_LIMIT
           ) -> pd.DataFrame:
    """Maximal subgraph where every node has degree >= k, by iterative
    peeling: each round drops nodes with current degree < k and the
    edges touching them, until a fixpoint. Degrees reduce combiner-
    first each round and STAY on the Dataset plane; the per-round node
    filter is size-gated on the MEASURED surviving-node count (the
    KB-gate discipline, pipelines/nel.py): below ``node_broadcast_
    limit`` the keep-set broadcasts once and the filter is a vectorized
    Arrow is_in; above it the filter is two left_semi Dataset joins on
    the endpoints (the incremental.py idiom) and nothing node-shaped
    ever lands on the driver. Extra rounds after the fixpoint are
    no-ops, which is what lets the SQL oracle unroll a FIXED number of
    rounds; raises if ``max_rounds`` did not reach the fixpoint so the
    oracle can never silently diverge. (The returned node table is
    driver-side — callers at web scale take ``_degrees_ds`` of the
    final edge set instead.)"""
    edges = undirected_distinct_edges(edges_ds, src_col, dst_col).materialize()
    # coalesce tiny blocks before the peel rounds (each round re-scans
    # the edge set; O(read tasks) near-empty blocks pay per-round
    # dispatch for nothing — the q43/q57 idiom, never fires at scale)
    edges = _coalesce_if_tiny(edges)

    peels = 0
    while True:  # max_rounds PEELS need max_rounds+1 fixpoint checks
        deg_ds = _degrees_ds(edges).materialize()
        n_nodes = deg_ds.count()
        if n_nodes == 0:
            return pd.DataFrame({"host": pd.array([], dtype=object),
                                 "core_degree": pd.array([], dtype="int64")})
        keep_ds = deg_ds.filter(expr=f"deg >= {k}").materialize()
        n_keep = keep_ds.count()
        if n_keep == n_nodes:
            out = deg_ds.to_pandas().rename(
                columns={"node": "host", "deg": "core_degree"})
            out = out.sort_values("host", kind="stable").reset_index(drop=True)
            out["core_degree"] = out["core_degree"].astype("int64")
            return out
        if peels >= max_rounds:  # ANY further peel (incl. to-empty)
            raise RuntimeError(  # would exceed the oracle's unroll
                f"k_core did not converge in {max_rounds} rounds")
        if n_keep == 0:  # one more peel empties the graph: fixpoint
            return pd.DataFrame({"host": pd.array([], dtype=object),
                                 "core_degree": pd.array([], dtype="int64")})

        if n_keep <= node_broadcast_limit:
            keep = keep_ds.to_pandas()["node"].to_numpy()
            keep_ref = ray.put(np.sort(keep))

            def flt(t: pa.Table) -> pa.Table:
                kp = pa.array(get_broadcast(keep_ref), pa.string())
                return t.filter(pc.and_(pc.is_in(t["u"], value_set=kp),
                                        pc.is_in(t["v"], value_set=kp)))

            edges = edges.map_batches(flt, batch_format="pyarrow")
        else:  # web-scale route: nothing node-shaped on the driver
            keep_u = keep_ds.map_batches(
                lambda t: pa.table({"u": t["node"]}),
                batch_format="pyarrow")
            keep_v = keep_ds.map_batches(
                lambda t: pa.table({"v": t["node"]}),
                batch_format="pyarrow")
            edges = (edges.join(keep_u, join_type="left_semi", on=("u",),
                                num_partitions=max(8, edges.num_blocks()))
                     .join(keep_v, join_type="left_semi", on=("v",),
                           num_partitions=max(8, edges.num_blocks())))
        # re-coalesce as the graph peels down (no-op when block count
        # is already at target — only fires if blocks proliferated)
        edges = _coalesce_if_tiny(edges.materialize())
        peels += 1


def kmv_estimate(hashes_bottom_k: np.ndarray, k: int) -> float:
    """KMV distinct-count estimate from a group's bottom-k hash ranks
    (Bar-Yossef et al. 2002): (k-1) * 2^32 / h_(k), valid when the
    group has >= k distinct keys. The q61 sample doubles as this
    sketch — one pass buys both a uniform sample and a cardinality
    estimate per group."""
    if len(hashes_bottom_k) < k:
        return float(len(hashes_bottom_k))  # exact below k
    return (k - 1) * float(_M32) / float(np.sort(hashes_bottom_k)[k - 1])


def q62_kcore(sf_dir: str) -> pd.DataFrame:
    from .webops import host_link_edges, linked_pages_from_documents

    edges = host_link_edges(linked_pages_from_documents(sf_dir))
    sparse = edges.filter(
        expr=f"n_links >= {_KCORE_MIN_LINKS}")
    return k_core(sparse)


def _q62_sql() -> str:
    from .webops import _Q42_EDGES_CTE

    # each round references the previous edge set three times; without
    # MATERIALIZED, DuckDB inlines CTEs and the plan (and the base
    # parquet scan) blows up 3^rounds-fold
    rounds = []
    prev = "e0"
    for i in range(1, _KCORE_MAX_ROUNDS + 1):
        rounds.append(f"""
d{i} AS MATERIALIZED (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT u AS node FROM {prev} UNION ALL SELECT v FROM {prev}
  ) GROUP BY node
), k{i} AS (SELECT node FROM d{i} WHERE deg >= {_KCORE_K}),
e{i} AS MATERIALIZED (
  SELECT u, v FROM {prev}
  WHERE u IN (SELECT node FROM k{i}) AND v IN (SELECT node FROM k{i})
)""")
        prev = f"e{i}"
    return f"""
WITH {_Q42_EDGES_CTE},
e0 AS MATERIALIZED (
  SELECT DISTINCT LEAST(src_host, dst_host) AS u,
         GREATEST(src_host, dst_host) AS v
  FROM edges WHERE src_host <> dst_host AND n_links >= {_KCORE_MIN_LINKS}
),{",".join(rounds)}
SELECT node AS host, CAST(COUNT(*) AS BIGINT) AS core_degree FROM (
  SELECT u AS node FROM {prev} UNION ALL SELECT v FROM {prev}
) GROUP BY node
"""


# ---------------------------------------------------------------------------
# Q63 — funnel analysis (ordered sequence matching per key)
# ---------------------------------------------------------------------------

_FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_counts(events_ds, steps=_FUNNEL_STEPS, key_col: str = "user_id",
                  num_buckets: int = 16) -> pd.DataFrame:
    """How many users complete each prefix of ``steps`` in strict
    timestamp order (greedy earliest match: step i+1 must occur
    STRICTLY after the chosen step-i event). A sequential-pattern
    operator none of the groupby/join shapes cover.

    Distribution: events are pre-filtered to the funnel types at the
    read, pre-reduced per block to DISTINCT (key, type, ts) rows (equal
    timestamps are interchangeable under strict-> matching, so the
    dedup is lossless — the one reduction sequential semantics allow:
    a later step's answer can be ANY of a user's timestamps depending
    on the earlier match, so per-block mins don't compose), then ONE
    key-bucketed exchange; the per-prefix match inside each bucket is
    a chain of vectorized groupby-min merges, and only <=len(steps)
    partial-count rows leave each bucket."""
    from ..stages.windows import grouped_by_key_buckets

    step_arr = pa.array(list(steps))

    def pre(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["event_type"], value_set=step_arr)
        f = t.filter(keep).select([key_col, "event_type", "ts"])
        return f.group_by([key_col, "event_type", "ts"]).aggregate([])

    def match_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # reached: per-user timestamp of the latest matched step so far
        reached = (df[df["event_type"] == steps[0]]
                   .groupby(key_col, as_index=False)["ts"].min()
                   .rename(columns={"ts": "t"}))
        out_stage = [1]
        out_n = [len(reached)]
        for s in steps[1:]:
            nxt = df[df["event_type"] == s].merge(reached, on=key_col)
            nxt = nxt[nxt["ts"] > nxt["t"]]
            reached = (nxt.groupby(key_col, as_index=False)["ts"].min()
                       .rename(columns={"ts": "t"}))
            out_stage.append(out_stage[-1] + 1)
            out_n.append(len(reached))
        return pd.DataFrame({"stage": np.array(out_stage, dtype=np.int64),
                             "n_part": np.array(out_n, dtype=np.int64)})

    per_bucket = grouped_by_key_buckets(
        events_ds.map_batches(pre, batch_format="pyarrow"),
        key_col, match_bucket, num_buckets=num_buckets)
    # final reduce on the driver: at most len(steps) x num_buckets
    # partial rows exist at ANY corpus size, and the oracle emits every
    # stage (COUNT over an empty CTE is 0) — zero-fill covers buckets
    # that never materialized, incl. the no-matching-events case
    parts = per_bucket.to_pandas()
    out = pd.DataFrame({"stage": np.arange(1, len(steps) + 1,
                                           dtype=np.int64)})
    if len(parts):
        agg = parts.groupby("stage", as_index=False)["n_part"].sum()
        out = out.merge(agg.rename(columns={"n_part": "n_users"}),
                        on="stage", how="left")
    else:
        out["n_users"] = 0
    out["n_users"] = out["n_users"].fillna(0).astype("int64")
    return out.reset_index(drop=True)


def q63_funnel(sf_dir: str) -> pd.DataFrame:
    return funnel_counts(_read(sf_dir, "events",
                               ["user_id", "event_type", "ts"]))


Q63_SQL = f"""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t FROM events
  WHERE event_type = '{_FUNNEL_STEPS[0]}' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e
  JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
  WHERE e.event_type = '{_FUNNEL_STEPS[1]}' GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e
  JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
  WHERE e.event_type = '{_FUNNEL_STEPS[2]}' GROUP BY e.user_id
)
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS stage, CAST(COUNT(*) AS BIGINT) AS n_users
  FROM s1
  UNION ALL
  SELECT CAST(2 AS BIGINT), CAST(COUNT(*) AS BIGINT) FROM s2
  UNION ALL
  SELECT CAST(3 AS BIGINT), CAST(COUNT(*) AS BIGINT) FROM s3
)
"""


# ---------------------------------------------------------------------------
# Q64 — table profiler (per-column stats in one pass)
# ---------------------------------------------------------------------------

_PROFILE_COLUMNS = ("doc_id", "text", "lang", "source", "n_chars")


def profile_table(ds, columns) -> pd.DataFrame:
    """Per-column (n_rows, n_null, n_distinct, min, max) — the
    first-contact profiling pass over an unknown table. Counts and
    min/max reduce per block to ONE partial row per column; exact
    distinct ships per-block DISTINCT (column, value) pairs through one
    exchange (combiner-first, so a head value contributes one row per
    block). At 100 TB the exact-distinct plane swaps for the q51 HLL
    registers behind the same output column; min/max compare in the
    NATIVE type and stringify only for display, so integer columns
    don't get lexicographic minima."""
    from ..stages.windows import grouped_by_key_buckets

    def stat_partials(t: pa.Table) -> pa.Table:
        rows = []
        for c in columns:
            col = t[c]
            valid = pc.drop_null(col)
            mn = pc.min(valid).as_py() if len(valid) else None
            mx = pc.max(valid).as_py() if len(valid) else None
            rows.append({"column": c, "n_rows": t.num_rows,
                         "n_null": t.num_rows - len(valid),
                         "min_v": None if mn is None else str(mn),
                         "max_v": None if mx is None else str(mx),
                         # native-type ordering key: stringified value
                         # ties are broken by re-parsing on the driver,
                         # so keep the raw python value's repr kind
                         "is_num": pa.types.is_integer(col.type)})
        return pa.Table.from_pylist(rows)

    def val_partials(t: pa.Table) -> pa.Table:
        outs = []
        for c in columns:
            v = pc.drop_null(t[c]).unique()
            outs.append(pa.table({
                "column": pa.array([c] * len(v), pa.string()),
                "value": pc.cast(v, pa.string()),
            }))
        return pa.concat_tables(outs)

    stats = ds.map_batches(stat_partials, batch_format="pyarrow").to_pandas()

    def count_distinct(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.drop_duplicates(["column", "value"])
             .groupby("column", as_index=False).size()
             .rename(columns={"size": "nd_part"}))
        return g

    nd = grouped_by_key_buckets(
        ds.map_batches(val_partials, batch_format="pyarrow"),
        "value", count_distinct, num_buckets=16).to_pandas()
    nd = nd.groupby("column", as_index=False)["nd_part"].sum()

    out = []
    for c in columns:
        sc = stats[stats["column"] == c]
        is_num = bool(sc["is_num"].iloc[0]) if len(sc) else False
        mns = [v for v in sc["min_v"] if v is not None]
        mxs = [v for v in sc["max_v"] if v is not None]
        key = (lambda x: int(x)) if is_num else (lambda x: x)
        ndc = nd[nd["column"] == c]["nd_part"]
        out.append({
            "column": c,
            "n_rows": int(sc["n_rows"].sum()),
            "n_null": int(sc["n_null"].sum()),
            "n_distinct": int(ndc.iloc[0]) if len(ndc) else 0,
            "min_v": min(mns, key=key) if mns else None,
            "max_v": max(mxs, key=key) if mxs else None,
        })
    df = pd.DataFrame(out)
    for c in ("n_rows", "n_null", "n_distinct"):
        df[c] = df[c].astype("int64")
    return df.sort_values("column", kind="stable").reset_index(drop=True)


def q64_profile(sf_dir: str) -> pd.DataFrame:
    return profile_table(_read(sf_dir, "documents",
                               list(_PROFILE_COLUMNS)),
                         _PROFILE_COLUMNS)


Q64_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS column, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_v,
       CAST(MAX({c}) AS VARCHAR) AS max_v
FROM documents"""
    for c in _PROFILE_COLUMNS)
