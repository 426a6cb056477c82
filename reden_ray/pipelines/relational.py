"""Relational operator demonstrations over the TPC-H-ish test tables.

Each function is one ``queries()`` entry in ``__ray_entry__`` with a
matching DuckDB oracle; together they cover the reference's relational
operator surface (SURVEY.md §2: filters/projections M12, aggregations
A5-A9, joins J1/J3/J7 analogs, sort/limit K1, distinct D2-D5) expressed
Ray-Data-first:

* column pruning at the read (``read_parquet(columns=[...])``),
* vectorized pyarrow.compute batch transforms,
* broadcast joins for small sides, hash-partitioned ``Dataset.join``
  for large-large,
* per-batch combiners before groupby shuffles,
* ``groupby().map_groups`` for window/session semantics.

Float aggregates are rounded (2dp money sums, 6dp means/ratios) on BOTH
the Ray and oracle sides: distributed partial-sum order differs from
DuckDB's accumulation order in the low bits.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..state.broadcast import get_broadcast


def _read(sf_dir: str, table: str, columns=None):
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _round_cols(df: pd.DataFrame, spec: dict[str, int]) -> pd.DataFrame:
    for col, nd in spec.items():
        df[col] = df[col].round(nd)
    return df


# Q1 — filter + computed column + grouped aggregation (TPC-H Q1 shape)
#
# Money/quantity columns carry exactly 2 decimal places, so every
# aggregate is computed in EXACT integer arithmetic (per-row 1e-2 /
# 1e-4 units, integer sums, floor-division averages): float partial-sum
# reordering across Ray blocks vs DuckDB's accumulation order otherwise
# flips rounding at decimal boundaries (observed at sf0.1).


def _e2(col) -> pa.Array:
    return pc.cast(pc.round(pc.multiply(col, pa.scalar(100.0))), pa.int64())


def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount", "l_shipdate"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(pd.Timestamp("1998-09-02"))))
        price_e2 = _e2(t["l_extendedprice"])
        disc_e2 = _e2(t["l_discount"])
        qty_e2 = _e2(t["l_quantity"])
        # price*(1-disc) in exact 1e-4 units: price_e2 * (100 - disc_e2)
        disc_price_e4 = pc.multiply(price_e2, pc.subtract(pa.scalar(100, pa.int64()), disc_e2))
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "qty_e2": qty_e2,
            "price_e2": price_e2,
            "disc_e2": disc_e2,
            "disc_price_e4": disc_price_e4,
        })

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_e2", alias_name="sum_qty_e2"),
            Sum("price_e2", alias_name="sum_base_price_e2"),
            Sum("disc_price_e4", alias_name="sum_disc_price_e4"),
            Sum("disc_e2", alias_name="_sum_disc_e2"),
            Count(alias_name="count_order"),
        )
        .to_pandas()
    )
    # exact-rational averages in 1e-6 units via integer floor division
    out["avg_qty_e6"] = out["sum_qty_e2"] * 10000 // out["count_order"]
    out["avg_disc_e6"] = out["_sum_disc_e2"] * 10000 // out["count_order"]
    return out.drop(columns=["_sum_disc_e2"])


Q1_SQL = """
WITH x AS (
  SELECT l_returnflag, l_linestatus,
         CAST(ROUND(l_quantity * 100, 0) AS BIGINT)      AS qty_e2,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS price_e2,
         CAST(ROUND(l_discount * 100, 0) AS BIGINT)      AS disc_e2
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
)
SELECT l_returnflag, l_linestatus,
       CAST(SUM(qty_e2) AS BIGINT)                     AS sum_qty_e2,
       CAST(SUM(price_e2) AS BIGINT)                   AS sum_base_price_e2,
       CAST(SUM(price_e2 * (100 - disc_e2)) AS BIGINT) AS sum_disc_price_e4,
       COUNT(*)                                        AS count_order,
       CAST(SUM(qty_e2)  * 10000 // COUNT(*) AS BIGINT) AS avg_qty_e6,
       CAST(SUM(disc_e2) * 10000 // COUNT(*) AS BIGINT) AS avg_disc_e6
FROM x GROUP BY l_returnflag, l_linestatus
"""


# Q2 — global sort + limit (K1 top-k)
def q2_top_orders(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    out = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)
    return out.to_pandas()


Q2_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


# Largest dimension table we will collect to the driver and ship to
# every worker as a broadcast lookup.  `customer` GROWS with sf (~150k
# rows/sf in TPC-H terms): at sandbox scales it is a textbook broadcast
# side, but at 100-TB scale it must flow through a hash-partitioned
# `Dataset.join` instead.  `ds.count()` on a fresh parquet read is
# metadata-only (row counts from footers), so the gate itself is cheap.
# Tests force this to 0 to exercise the distributed path
# (tests/test_relational.py::test_q3_q14_distributed_join_path).
BROADCAST_ROW_LIMIT = 2_000_000


def _join_partitions() -> int:
    """Partition count for hash-shuffle Dataset.join. Ray schedules
    `num_partitions` aggregator actors that all need CPU slots at once:
    32 partitions under a 4-CPU test session stalls the whole join
    (observed), so track the session's CPU count — which on a real
    cluster is the total core count, exactly the right task width."""
    try:
        return max(8, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        return 8


# Q3 — small-side broadcast join (J1 pattern), distributed join above gate
class _KeyLookup:
    """Vectorized key->value map lookup appended as a new column.

    INNER-join semantics: rows whose key is absent from the map are
    DROPPED, so the broadcast path and the hash-partitioned
    ``Dataset.join(join_type="inner")`` scale path above
    BROADCAST_ROW_LIMIT return the same answer (and both match the
    inner-join SQL oracles)."""

    def __init__(self, ref, key_col: str, out_col: str):
        # pandas Series index = C-speed vectorized hash lookup per batch
        self.m = pd.Series(get_broadcast(ref))
        self.key_col, self.out_col = key_col, out_col

    def __call__(self, t: pa.Table) -> pa.Table:
        keys = t[self.key_col].to_numpy(zero_copy_only=False)
        vals = self.m.reindex(keys).to_numpy()
        matched = pd.notna(vals)
        if not matched.all():
            t = t.filter(pa.array(matched))
            vals = vals[matched]
        return t.append_column(self.out_col, pa.array(vals, pa.string()))


def q3_segment_revenue(sf_dir: str) -> pd.DataFrame:
    cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    if cust_ds.count() <= BROADCAST_ROW_LIMIT:
        cust = cust_ds.to_pandas()
        ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))
        withseg = orders.map_batches(
            _KeyLookup, fn_constructor_args=(ref, "o_custkey", "c_mktsegment"),
            batch_format="pyarrow", concurrency=(1, 2), num_cpus=1)
    else:  # scale path: customer too big to broadcast
        withseg = orders.join(cust_ds, join_type="inner",
                              num_partitions=_join_partitions(),
                              on=("o_custkey",), right_on=("c_custkey",))
    out = (
        withseg.groupby("c_mktsegment")
        .aggregate(Sum("o_totalprice", alias_name="revenue"),
                   Count(alias_name="n_orders"))
        .to_pandas()
    )
    return _round_cols(out, {"revenue": 2})


Q3_SQL = """
SELECT c_mktsegment, ROUND(SUM(o_totalprice), 2) AS revenue, COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# Q4 — large-large hash-partitioned join (J3 pattern)
def q4_order_priority_revenue(sf_dir: str) -> pd.DataFrame:
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(t: pa.Table) -> pa.Table:
        # exact 1e-4-unit revenue per row (see q1 note), then a
        # PER-BATCH combiner on l_orderkey: lineitem files are
        # clustered by orderkey, so this shrinks the join's big side
        # ~6x (avg items/order) before the hash exchange; partials for
        # an orderkey split across batches stay correct because the
        # final priority groupby sums them.
        price_e2 = _e2(t["l_extendedprice"])
        disc_e2 = _e2(t["l_discount"])
        r = pc.multiply(price_e2, pc.subtract(pa.scalar(100, pa.int64()), disc_e2))
        part = pa.table({"l_orderkey": t["l_orderkey"], "revenue_e4_part": r})
        g = part.group_by("l_orderkey").aggregate(
            [("revenue_e4_part", "sum"), ("revenue_e4_part", "count")])
        # select by NAME — pyarrow puts the group keys last
        return pa.table({
            "l_orderkey": g["l_orderkey"],
            "revenue_e4_part": g["revenue_e4_part_sum"],
            "n_items_part": g["revenue_e4_part_count"],
        })

    li = li.map_batches(rev, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = li.join(orders, join_type="inner", num_partitions=8,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    def combine(t: pa.Table) -> pa.Table:
        # post-join combiner: collapse each join-output block to its
        # <=5 priority partials so the final Aggregate exchanges a
        # handful of rows per block, not the whole join output
        # (measured 5.0 -> 3.4 s at sf0.1)
        g = t.group_by("o_orderpriority").aggregate(
            [("revenue_e4_part", "sum"), ("n_items_part", "sum")])
        return pa.table({
            "o_orderpriority": g["o_orderpriority"],
            "revenue_e4_part": g["revenue_e4_part_sum"],
            "n_items_part": g["n_items_part_sum"],
        })

    return (
        joined.map_batches(combine, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("revenue_e4_part", alias_name="revenue_e4"),
                   Sum("n_items_part", alias_name="n_items"))
        .to_pandas()
    )


Q4_SQL = """
SELECT o_orderpriority,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))) AS BIGINT) AS revenue_e4,
       COUNT(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


# Q5 — distinct (D2/D5 pattern: combiner + groupby)
def q5_distinct_flags(sf_dir: str) -> pd.DataFrame:
    from ..stages.canonicalize import exact_dedup

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"])
    return exact_dedup(ds, ["l_returnflag", "l_linestatus"]).to_pandas()


Q5_SQL = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


# Q6 — event-type frequency (A6 predicate-frequency analog)
def q6_event_type_counts(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["event_type", "value"])
    out = (
        ds.groupby("event_type")
        .aggregate(Count(alias_name="freq"), Sum("value", alias_name="total_value"))
        .to_pandas()
    )
    return _round_cols(out, {"total_value": 2})


Q6_SQL = """
SELECT event_type, COUNT(*) AS freq, ROUND(SUM(value), 2) AS total_value
FROM events GROUP BY event_type
"""


# Q7 — exact dedup keeping min id (D5)
def q7_exact_dedup_docs(sf_dir: str) -> pd.DataFrame:
    from ..stages.dedup import exact_dedup_by_key

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def keyed(t: pa.Table) -> pa.Table:
        key = pc.utf8_slice_codeunits(t["text"], 0, 20)
        return pa.table({"key": key, "doc_id": t["doc_id"]})

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow")
    return exact_dedup_by_key(keyed_ds, ["key"], "doc_id").to_pandas()


Q7_SQL = """
SELECT substring(text, 1, 20) AS key, MIN(doc_id) AS doc_id
FROM documents GROUP BY 1
"""


# Q8 — per-document text stats (frozen definitions; SQL-recomputable)
def q8_text_stats(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        import hashlib

        text = t["text"]
        # vectorized Arrow kernels for everything except the md5 digest,
        # which is inherently per-row (but now runs over already-
        # normalized strings instead of doing regex+lower in Python too)
        n_chars = pc.cast(pc.utf8_length(text), pa.int64())
        n_tokens = pc.cast(
            pc.list_value_length(pc.utf8_split_whitespace(pc.utf8_trim_whitespace(text))),
            pa.int64(),
        )
        norm = pc.utf8_lower(
            pc.utf8_trim_whitespace(
                pc.replace_substring_regex(text, r"[^a-zA-Z]+", " ")
            )
        )
        fps = [hashlib.md5(x.encode()).hexdigest() for x in norm.to_pylist()]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": n_chars,
                "n_tokens": n_tokens,
                "fingerprint": pa.array(fps, pa.string()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow").to_pandas()


Q8_SQL = r"""
SELECT doc_id,
       length(text)                                           AS n_chars,
       len(string_split_regex(trim(text), '\s+'))             AS n_tokens,
       md5(lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g')))) AS fingerprint
FROM documents
"""


# Q9 — corpus token totals (combiner + single global aggregate)
def q9_token_totals(sf_dir: str) -> pd.DataFrame:
    from ..stages.reports import token_count_totals

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    row = token_count_totals(ds)
    return pd.DataFrame([row])


Q9_SQL = r"""
SELECT SUM(len(string_split_regex(trim(text), '\s+')))::BIGINT        AS ws_tokens,
       SUM(len(regexp_extract_all(text, '[^\W\d_]+|\d+|[^\w\s]')))::BIGINT AS bpe_tokens,
       COUNT(*)                                                        AS docs
FROM documents
"""


# Q10 — brute-force cosine top-k similarity search
def q10_topk_cosine(sf_dir: str) -> pd.DataFrame:
    import pyarrow.parquet as pq

    from ..stages.similarity import brute_force_topk

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
                        filters=[("vec_id", "in", [0, 1])])  # pruned read
    queries = {
        int(v): e
        for v, e in zip(emb["vec_id"].to_pylist(), emb["embedding"].to_pylist())
    }
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = brute_force_topk(ds, queries, k=10)
    return out[["query_id", "vec_id"]]


Q10_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id IN (0, 1)),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(e.embedding, q.qe) AS score,
         row_number() OVER (PARTITION BY q.query_id ORDER BY list_cosine_similarity(e.embedding, q.qe) DESC, e.vec_id) AS rn
  FROM embeddings e CROSS JOIN q
)
SELECT query_id, vec_id FROM scored WHERE rn <= 10
"""


# Q13 — simple groupby stats over documents (exact integer average)
def q13_lang_stats(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    out = (
        ds.groupby("lang")
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="_sum_chars"))
        .to_pandas()
    )
    out["avg_chars_e6"] = out["_sum_chars"] * 1_000_000 // out["n_docs"]
    return out.drop(columns=["_sum_chars"])


Q13_SQL = """
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) * 1000000 // COUNT(*) AS BIGINT) AS avg_chars_e6
FROM documents GROUP BY lang
"""


# Q14 — multi-way join through dimension chain.  nation (25) and region
# (5) are constant-size regardless of sf and always pre-merged on the
# driver; customer scales with sf, so the custkey hop is broadcast only
# below BROADCAST_ROW_LIMIT and a hash-partitioned Dataset.join above.
def q14_nation_revenue(sf_dir: str) -> pd.DataFrame:
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    nr = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    if cust_ds.count() <= BROADCAST_ROW_LIMIT:
        cust = cust_ds.to_pandas()
        dim = cust.merge(nr, left_on="c_nationkey", right_on="n_nationkey")
        ref = ray.put(dict(zip(dim["c_custkey"], dim["r_name"])))
        withr = orders.map_batches(
            _KeyLookup, fn_constructor_args=(ref, "o_custkey", "r_name"),
            batch_format="pyarrow", concurrency=(1, 2), num_cpus=1)
    else:  # scale path: one big join for the scaling hop, then a
        # constant-size nationkey->r_name broadcast for the dimension tail
        joined = orders.join(cust_ds, join_type="inner",
                             num_partitions=_join_partitions(),
                             on=("o_custkey",), right_on=("c_custkey",))
        ref = ray.put(dict(zip(nr["n_nationkey"], nr["r_name"])))
        withr = joined.map_batches(
            _KeyLookup, fn_constructor_args=(ref, "c_nationkey", "r_name"),
            batch_format="pyarrow", concurrency=(1, 2), num_cpus=1)
    out = (
        withr.groupby("r_name")
        .aggregate(Sum("o_totalprice", alias_name="revenue"),
                   Count(alias_name="n_orders"))
        .to_pandas()
    )
    return _round_cols(out, {"revenue": 2})


Q14_SQL = """
SELECT r_name, ROUND(SUM(o_totalprice), 2) AS revenue, COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# Q15 — per-key running aggregate: ONE hash-bucket shuffle, vectorized
# groupby.cumsum inside each bucket (no per-key map_groups dispatch)
def q15_running_user_value(sf_dir: str) -> pd.DataFrame:
    from ..stages.windows import grouped_by_key_buckets

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def running_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        df["running_value"] = df.groupby("user_id", sort=False)["value"].cumsum().round(6)
        return df[["event_id", "user_id", "running_value"]]

    return grouped_by_key_buckets(ds, "user_id", running_bucket).to_pandas()


Q15_SQL = """
SELECT event_id, user_id,
       ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS running_value
FROM events
"""


# Q30 — training-data quality filter chain over documents
def q30_quality_filter(sf_dir: str) -> pd.DataFrame:
    """Filter documents by frozen quality predicates (length band,
    language allowlist, whitespace-token count) — the standard
    pre-training corpus filter, vectorized in Arrow."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "n_chars"])

    def flt(t: pa.Table) -> pa.Table:
        n_tok = pc.list_value_length(pc.utf8_split_whitespace(t["text"]))
        keep = pc.and_(
            pc.and_(pc.greater_equal(t["n_chars"], pa.scalar(100)),
                    pc.less_equal(t["n_chars"], pa.scalar(400))),
            pc.and_(pc.is_in(t["lang"], value_set=pa.array(["en", "fr", "de"])),
                    pc.greater_equal(n_tok, pa.scalar(20))),
        )
        out = t.filter(keep)
        n_tok_kept = pc.list_value_length(pc.utf8_split_whitespace(out["text"]))
        return pa.table({
            "doc_id": out["doc_id"],
            "lang": out["lang"],
            "n_chars": out["n_chars"],
            "n_tokens": pc.cast(n_tok_kept, pa.int64()),
        })

    return ds.map_batches(flt, batch_format="pyarrow").to_pandas()


Q30_SQL = r"""
SELECT doc_id, lang, n_chars,
       len(string_split_regex(trim(text), '\s+')) AS n_tokens
FROM documents
WHERE n_chars BETWEEN 100 AND 400
  AND lang IN ('en', 'fr', 'de')
  AND len(string_split_regex(trim(text), '\s+')) >= 20
"""


# Q32 — PII scrubbing (training-data hygiene). The synthetic corpus
# carries no contact data, so both sides deterministically APPEND a
# doc_id-derived email + phone tail to every document before masking —
# the operator is exercised on every row and the whole transform stays
# SQL-recomputable (Arrow and DuckDB share RE2, so replace output is
# byte-identical).
def q32_pii_scrub(sf_dir: str) -> pd.DataFrame:
    from ..functions.text import scrub_pii_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def scrub(t: pa.Table) -> pa.Table:
        did = pc.cast(t["doc_id"], pa.string())
        raw = pc.binary_join_element_wise(
            t["text"], " Contact user", did, "@example.com or call +1 555-01",
            did, ".", "")
        clean, n_emails, n_phones = scrub_pii_batch(raw)
        return pa.table({
            "doc_id": t["doc_id"],
            "clean_text": clean,
            "n_emails": pc.cast(n_emails, pa.int64()),
            "n_phones": pc.cast(n_phones, pa.int64()),
        })

    return ds.map_batches(scrub, batch_format="pyarrow").to_pandas()


Q32_SQL = r"""
WITH x AS (
  SELECT doc_id,
         text || ' Contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or call +1 555-01'
              || CAST(doc_id AS VARCHAR) || '.' AS raw
  FROM documents
), e AS (
  SELECT doc_id,
         len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
         regexp_replace(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS no_email
  FROM x
)
SELECT doc_id,
       regexp_replace(no_email, '\+?\d[\d()\-. ]{6,}\d', '<PHONE>', 'g') AS clean_text,
       CAST(n_emails AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(no_email, '\+?\d[\d()\-. ]{6,}\d')) AS BIGINT) AS n_phones
FROM e
"""


# Q33 — per-host corpus stats + domain blocklist (web-pipeline URL
# hygiene). The derived page corpus is single-host, so both sides
# deterministically spread doc_ids over 17 hosts first; the OPERATOR —
# RE2 host extraction, blocklist filter, combiner-first per-host
# aggregate — is the real thing a crawl pipeline runs before training.
_BLOCKED_HOSTS = ["cdn3.example.org", "cdn7.example.org"]
_HOST_PATTERN = r"^https?://(?P<host>[^/]+)/"


def q33_host_stats(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def host_partials(t: pa.Table) -> pa.Table:
        did = pc.cast(t["doc_id"], pa.string())
        hid = pc.cast(pc.subtract(t["doc_id"],
                                  pc.multiply(pc.divide(t["doc_id"], 17),
                                              pa.scalar(17, pa.int64()))),
                      pa.string())
        url = pc.binary_join_element_wise(
            "https://cdn", hid, ".example.org/docs/", did, "")
        host = pc.struct_field(
            pc.extract_regex(url, pattern=_HOST_PATTERN), "host")
        part = pa.table({"host": host, "n_chars": t["n_chars"]})
        part = part.filter(pc.and_(
            pc.is_valid(part["host"]),
            pc.invert(pc.is_in(part["host"],
                               value_set=pa.array(_BLOCKED_HOSTS)))))
        # per-batch combiner: <=17 rows leave each block
        g = part.group_by("host").aggregate(
            [("n_chars", "sum"), ("n_chars", "count")])
        return pa.table({"host": g["host"], "n_chars_part": g["n_chars_sum"],
                         "n_pages_part": g["n_chars_count"]})

    return (
        ds.map_batches(host_partials, batch_format="pyarrow")
        .groupby("host")
        .aggregate(Sum("n_pages_part", alias_name="n_pages"),
                   Sum("n_chars_part", alias_name="n_chars"))
        .to_pandas()
    )


Q33_SQL = r"""
WITH x AS (
  SELECT 'https://cdn' || CAST(doc_id % 17 AS VARCHAR)
         || '.example.org/docs/' || CAST(doc_id AS VARCHAR) AS url,
         n_chars
  FROM documents
), h AS (
  SELECT regexp_extract(url, '^https?://([^/]+)/', 1) AS host, n_chars FROM x
)
SELECT host, COUNT(*) AS n_pages, CAST(SUM(n_chars) AS BIGINT) AS n_chars
FROM h
WHERE host <> '' AND host NOT IN ('cdn3.example.org', 'cdn7.example.org')
GROUP BY host
"""


# Q34 — per-host document cap (hot-domain downsampling: the C4 /
# RefinedWeb "max pages per domain" curation step). Deterministic rule:
# keep the K lowest doc_ids per host. Combiner-first: per-batch partial
# top-K per host (top-K is a semilattice, so block partials compose),
# then ONE hash-bucket shuffle of the bounded partials and the same
# rule per bucket — the corpus itself never crosses the exchange. Same
# 17-host doc_id spread as q33 (the synthetic corpus is single-host).
_HOST_CAP_K = 10


def q34_host_cap(sf_dir: str) -> pd.DataFrame:
    import numpy as np

    from ..stages.windows import grouped_by_key_buckets

    ds = _read(sf_dir, "documents", ["doc_id"])

    def partial_cap(t: pa.Table) -> pa.Table:
        doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hid = doc % 17
        order = np.lexsort((doc, hid))
        h_sorted = hid[order]
        starts = np.flatnonzero(np.r_[True, h_sorted[1:] != h_sorted[:-1]])
        lens = np.diff(np.r_[starts, len(h_sorted)])
        rank = np.arange(len(h_sorted)) - np.repeat(starts, lens)
        kept = doc[order[rank < _HOST_CAP_K]]
        hid_s = pc.cast(pa.array(kept % 17, pa.int64()), pa.string())
        host = pc.binary_join_element_wise("https://cdn", hid_s,
                                           ".example.org", "")
        return pa.table({"doc_id": pa.array(kept, pa.int64()), "host": host})

    partials = ds.map_batches(partial_cap, batch_format="pyarrow")

    def final_cap(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["host", "doc_id"], kind="stable")
                .groupby("host", sort=False).head(_HOST_CAP_K))

    return grouped_by_key_buckets(partials, "host", final_cap).to_pandas()


Q34_SQL = f"""
WITH x AS (
  SELECT doc_id,
         'https://cdn' || CAST(doc_id % 17 AS VARCHAR) || '.example.org' AS host
  FROM documents
), r AS (
  SELECT doc_id, host,
         ROW_NUMBER() OVER (PARTITION BY host ORDER BY doc_id) AS rn
  FROM x
)
SELECT doc_id, host FROM r WHERE rn <= {_HOST_CAP_K}
"""


# Q35 — benchmark decontamination (training-data hygiene): flag every
# document containing any probe phrase from a broadcast eval-set. The
# probe set here is a deterministic stand-in — the first 8
# space-separated words of every doc_id % 97 == 0 document (a real
# pipeline broadcasts eval-benchmark 13-gram sets, often as a Bloom
# filter; the OPERATOR — small probe side broadcast once via ray.put,
# corpus scanned once with vectorized substring kernels, zero shuffles
# — is exactly that shape). The documents table carries planted
# duplicates, so probes hit beyond their own source docs.
def q35_decontaminate(sf_dir: str) -> pd.DataFrame:
    import numpy as np

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def probe_rows(t: pa.Table) -> pa.Table:
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].filter(pa.array(doc % 97 == 0)).to_pylist()
        probes = {" ".join(x.split(" ")[:8]) for x in texts}
        probes.discard("")
        return pa.table({"probe": pa.array(sorted(probes), pa.string())})

    # eval-suite-sized by construction: collect + broadcast once
    probes = sorted(set(
        ds.map_batches(probe_rows, batch_format="pyarrow")
        .to_pandas()["probe"]))
    p_ref = ray.put(probes)

    def flag(t: pa.Table) -> pa.Table:
        n = np.zeros(t.num_rows, np.int64)
        for probe in get_broadcast(p_ref):
            hit = pc.fill_null(pc.match_substring(t["text"], probe), False)
            n += hit.to_numpy(zero_copy_only=False).astype(np.int64)
        out = pa.table({"doc_id": t["doc_id"],
                        "n_probes_hit": pa.array(n, pa.int64())})
        return out.filter(pc.greater(out["n_probes_hit"], 0))

    return ds.map_batches(flag, batch_format="pyarrow").to_pandas()


Q35_SQL = r"""
WITH p AS (
  SELECT DISTINCT
         array_to_string(list_slice(string_split(text, ' '), 1, 8), ' ') AS probe
  FROM documents WHERE doc_id % 97 = 0
), pp AS (
  SELECT probe FROM p WHERE length(probe) > 0
)
SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_probes_hit
FROM documents d, pp
WHERE contains(d.text, pp.probe)
GROUP BY d.doc_id
"""


# Q36 — corpus-level line dedup (C4's "discard any line occurring more
# than once in the corpus", keeping one occurrence). The synthetic
# corpus has no newlines, so BOTH sides deterministically chunk each
# document's space-split words into 10-word "lines" first; the
# OPERATOR is the real C4 step. Rule: a line survives only in the
# minimum-doc_id document containing that exact line text; documents
# reassemble their surviving lines in order and vanish when nothing
# survives. Two exchanges, both necessary: co-locate equal lines
# (hash-bucket on line), then regroup survivors per document. Line
# splitting is Arrow-vectorized (split_pattern + list_slice +
# binary_join per chunk index — no Python loop over rows). At 100 TB
# you would ship (line_hash, doc_id, ln) through the first exchange and
# re-derive text by re-scanning the corpus against surviving keys; the
# exact-text form here keeps the oracle byte-exact.
_LINE_WORDS = 10


def _line_rows(t: pa.Table) -> pa.Table:
    """Arrow-vectorized 10-word "line" mint shared by q36 and q74:
    (doc_id, ln, line) — split_pattern + list_slice + binary_join per
    chunk index, no Python loop over rows."""
    import numpy as np

    words = pc.split_pattern(t["text"], " ")
    wc = pc.list_value_length(words)
    base = pa.table({"doc_id": t["doc_id"], "w": words})
    n_chunks = -(-(pc.max(wc).as_py() or 0) // _LINE_WORDS)
    pieces = []
    for k in range(n_chunks):
        sub = base.filter(pc.greater(wc, k * _LINE_WORDS))
        line = pc.binary_join(
            pc.list_slice(sub["w"], k * _LINE_WORDS,
                          (k + 1) * _LINE_WORDS), " ")
        pieces.append(pa.table({
            "doc_id": sub["doc_id"],
            "ln": pa.array(np.full(sub.num_rows, k, np.int64)),
            "line": line,
        }))
    if not pieces:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "ln": pa.array([], pa.int64()),
                         "line": pa.array([], pa.string())})
    return pa.concat_tables(pieces)


def q36_line_dedup(sf_dir: str) -> pd.DataFrame:
    from ..stages.windows import grouped_by_key_buckets

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    rows = ds.map_batches(_line_rows, batch_format="pyarrow")

    def keep_owner_rows(df: pd.DataFrame) -> pd.DataFrame:
        owner = df.groupby("line", sort=False)["doc_id"].transform("min")
        return df[df["doc_id"] == owner]

    kept = grouped_by_key_buckets(rows, "line", keep_owner_rows)

    def rebuild(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "ln"], kind="stable")
        out = (df.groupby("doc_id", sort=False)["line"]
               .agg(" ".join).reset_index())
        out.columns = ["doc_id", "clean_text"]
        return out

    return grouped_by_key_buckets(kept, "doc_id", rebuild).to_pandas()


Q36_SQL = f"""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS idx
  FROM documents
), l AS (
  SELECT doc_id, (idx - 1) // {_LINE_WORDS} AS ln,
         string_agg(word, ' ' ORDER BY idx) AS line
  FROM w GROUP BY doc_id, (idx - 1) // {_LINE_WORDS}
), k AS (
  SELECT doc_id, ln, line,
         MIN(doc_id) OVER (PARTITION BY line) AS owner
  FROM l
)
SELECT doc_id, string_agg(line, ' ' ORDER BY ln) AS clean_text
FROM k WHERE doc_id = owner GROUP BY doc_id
"""


# Q37 — within-document repetition stats (the Gopher quality-filter
# family: documents dominated by repeated n-grams are low-quality
# machine-generated or boilerplate text). Metric: the fraction of a
# document's word-2-gram INSTANCES that are duplicates
# (1 − distinct/count). Purely per-document — a stateless Arrow map
# with zero shuffles: flatten words once, mint 2-grams with one
# offset-by-one binary_join_element_wise over the flat array (masked at
# document boundaries), then a per-batch group_by count/count_distinct.
def q37_repetition_stats(sf_dir: str) -> pd.DataFrame:
    import numpy as np

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def rep_stats(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(t["text"], " ")
        flat = pc.list_flatten(words).combine_chunks()
        par = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        if len(flat) < 2:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_grams": pa.array([], pa.int64()),
                             "dup2gram_frac": pa.array([], pa.float64())})
        left = flat.slice(0, len(flat) - 1)
        right = flat.slice(1)
        same_doc = par[:-1] == par[1:]
        grams = pc.binary_join_element_wise(left, right, " ")
        g = pa.table({
            "d": pa.array(par[:-1][same_doc], pa.int64()),
            "gram": grams.filter(pa.array(same_doc)),
        }).group_by("d").aggregate([("gram", "count"),
                                    ("gram", "count_distinct")])
        n = g["gram_count"].to_numpy(zero_copy_only=False).astype(np.float64)
        nd = g["gram_count_distinct"].to_numpy(
            zero_copy_only=False).astype(np.float64)
        return pa.table({
            "doc_id": t["doc_id"].take(g["d"]),
            "n_grams": pc.cast(g["gram_count"], pa.int64()),
            "dup2gram_frac": pa.array(np.round(1.0 - nd / n, 6)),
        })

    return ds.map_batches(rep_stats, batch_format="pyarrow").to_pandas()


Q37_SQL = r"""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS idx
  FROM documents
), g AS (
  SELECT doc_id,
         word || ' ' || LEAD(word) OVER (PARTITION BY doc_id ORDER BY idx) AS gram
  FROM w
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       ROUND(1 - COUNT(DISTINCT gram) * 1.0 / COUNT(*), 6) AS dup2gram_frac
FROM g WHERE gram IS NOT NULL
GROUP BY doc_id
"""


# Q38 — per-host top-K terms (corpus analytics: vocabulary profiling /
# per-domain content summaries). The classic combiner-first wide text
# aggregation: per-batch (host, word) partial counts via one vectorized
# Arrow group_by over the flattened word array — only distinct pairs
# leave each block — then ONE hash-bucket shuffle keyed on host (the
# final top-K needs all of a host's words co-located); the per-bucket
# finalizer re-sums partials and ranks. Deterministic tie-break:
# higher count first, then lexicographic word. Same 17-host doc_id
# spread as q33.
_TOP_TERMS_K = 3


def q38_top_terms(sf_dir: str) -> pd.DataFrame:
    import numpy as np

    from ..stages.windows import grouped_by_key_buckets

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def partials(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(t["text"], " ")
        flat = pc.list_flatten(words).combine_chunks()
        par = pc.list_parent_indices(words)
        doc = t["doc_id"].take(par)
        hid = pc.cast(pc.subtract(doc, pc.multiply(
            pc.divide(doc, 17), pa.scalar(17, pa.int64()))), pa.string())
        host = pc.binary_join_element_wise("https://cdn", hid,
                                           ".example.org", "")
        g = (pa.table({"host": host, "word": flat})
             .group_by(["host", "word"]).aggregate([([], "count_all")]))
        return pa.table({"host": g["host"], "word": g["word"],
                         "cnt": pc.cast(g["count_all"], pa.int64())})

    pre = ds.map_batches(partials, batch_format="pyarrow")

    def top_k(df: pd.DataFrame) -> pd.DataFrame:
        total = (df.groupby(["host", "word"], as_index=False)["cnt"].sum()
                 .sort_values(["host", "cnt", "word"],
                              ascending=[True, False, True],
                              kind="stable"))
        out = total.groupby("host", sort=False).head(_TOP_TERMS_K).copy()
        out["rank"] = out.groupby("host", sort=False).cumcount() + 1
        return out[["host", "rank", "word", "cnt"]]

    return grouped_by_key_buckets(pre, "host", top_k).to_pandas()


Q38_SQL = f"""
WITH w AS (
  SELECT 'https://cdn' || CAST(doc_id % 17 AS VARCHAR) || '.example.org' AS host,
         unnest(string_split(text, ' ')) AS word
  FROM documents
), c AS (
  SELECT host, word, COUNT(*) AS cnt FROM w GROUP BY host, word
), r AS (
  SELECT host, word, cnt,
         ROW_NUMBER() OVER (PARTITION BY host
                            ORDER BY cnt DESC, word ASC) AS rank
  FROM c
)
SELECT host, CAST(rank AS BIGINT) AS rank, word, CAST(cnt AS BIGINT) AS cnt
FROM r WHERE rank <= {_TOP_TERMS_K}
"""


# Q39 — token-budget sharding (training-output packing: assign each
# document, in deterministic doc_id order, to the shard whose running
# token total it starts in — the "pack docs into ~N-token training
# shards" step before writing tokenized data). shard =
# exclusive_prefix_sum(n_tokens) // budget, exact integer arithmetic.
#
# This is a DISTRIBUTED ORDERED PREFIX SUM — a different shape from
# every groupby/join operator in this file: (1) per-batch combiner
# sums n_tokens into fixed-width doc_id RANGE buckets (tiny table),
# (2) the driver prefix-sums the bucket totals into exclusive offsets
# (vocabulary-sized, broadcast via ray.put), (3) ONE range-keyed
# bucket shuffle co-locates each range, which sorts by doc_id and adds
# its offset to a local exclusive cumsum. No global sort, no
# corpus-sized exchange beyond the one co-locating shuffle.
_SHARD_TOKEN_BUDGET = 2000
_SHARD_RANGE_WIDTH = 1024   # min doc_ids per range bucket
_SHARD_MAX_RANGES = 65536   # driver histogram stays <= this many rows


def q39_token_shards(sf_dir: str) -> pd.DataFrame:
    import numpy as np

    from ..stages.windows import grouped_by_key_buckets

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    # adaptive range width: bounds the driver-side histogram at
    # _SHARD_MAX_RANGES rows for ANY id domain (sparse 64-bit ids
    # included); the shard assignment is width-invariant, width only
    # trades histogram size against per-range sort size. One cheap
    # doc_id-column scan.
    max_id = ds.max("doc_id") or 0
    width = max(_SHARD_RANGE_WIDTH, (max_id // _SHARD_MAX_RANGES) + 1)

    def token_rows(t: pa.Table) -> pa.Table:
        wc = pc.list_value_length(pc.split_pattern(t["text"], " "))
        rng = pc.divide(t["doc_id"], pa.scalar(width, pa.int64()))
        return pa.table({"doc_id": t["doc_id"],
                         "n_tokens": pc.cast(wc, pa.int64()),
                         "rng": pc.cast(rng, pa.int64())})

    rows = ds.map_batches(token_rows, batch_format="pyarrow")

    def range_partials(t: pa.Table) -> pa.Table:
        g = t.select(["rng", "n_tokens"]).group_by("rng").aggregate(
            [("n_tokens", "sum")])
        return pa.table({"rng": g["rng"],
                         "tok": pc.cast(g["n_tokens_sum"], pa.int64())})

    # tiny: one row per doc_id range per block, re-summed here
    hist = (rows.map_batches(range_partials, batch_format="pyarrow")
            .to_pandas().groupby("rng", as_index=False)["tok"].sum()
            .sort_values("rng"))
    offsets = dict(zip(
        hist["rng"],
        np.concatenate(([0], np.cumsum(hist["tok"].to_numpy())[:-1]))))
    off_ref = ray.put(offsets)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        off = get_broadcast(off_ref)
        out = []
        for rng, g in df.groupby("rng", sort=False):
            g = g.sort_values("doc_id", kind="stable")
            cum = int(off[rng]) + np.concatenate(
                ([0], np.cumsum(g["n_tokens"].to_numpy())[:-1]))
            out.append(pd.DataFrame({
                "doc_id": g["doc_id"].to_numpy(),
                "n_tokens": g["n_tokens"].to_numpy(),
                "shard": cum // _SHARD_TOKEN_BUDGET,
            }))
        return pd.concat(out) if out else pd.DataFrame(
            {"doc_id": [], "n_tokens": [], "shard": []}).astype("int64")

    return grouped_by_key_buckets(rows, "rng", assign).to_pandas()


Q39_SQL = f"""
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
), c AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM t
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(cum // {_SHARD_TOKEN_BUDGET} AS BIGINT) AS shard
FROM c
"""


# Q44 — cross-document duplicate n-gram spans (ExactSubstr-lite: the
# "deduplicating training data" signal — word sequences repeated
# VERBATIM across distinct documents, the spans a suffix-array dedup
# would mask). Mint is one vectorized pass over the flattened word
# array (the q37 idiom generalized: N shifted slices joined in one
# binary_join_element_wise, masked where the window crosses a document
# boundary), then a per-batch combiner collapses to distinct (gram,
# doc, count) partials before the single gram-keyed exchange — the
# same ship-the-string tradeoff as q36's line dedup; at 100 TB you'd
# ship a 64-bit gram hash + re-attach representatives, which is the
# documented scale path of the minhash family (dedup.py).
_XDOC_NGRAM_N = 8


def q44_duplicate_ngram_spans(sf_dir: str) -> pd.DataFrame:
    import numpy as np

    from ..stages.windows import grouped_by_key_buckets

    n = _XDOC_NGRAM_N
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def gram_partials(t: pa.Table) -> pa.Table:
        empty = pa.table({"gram": pa.array([], pa.string()),
                          "doc_id": pa.array([], pa.int64()),
                          "n_part": pa.array([], pa.int64())})
        words = pc.split_pattern(t["text"], " ")
        flat = pc.list_flatten(words).combine_chunks()
        if len(flat) < n:
            return empty
        par = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        m = len(flat) - (n - 1)
        shifted = [flat.slice(k, m) for k in range(n)]
        grams = pc.binary_join_element_wise(*shifted, " ")
        same_doc = pa.array(par[: m] == par[n - 1:])
        g = pa.table({
            "gram": grams.filter(same_doc),
            "doc_id": t["doc_id"].take(par[: m][par[: m] == par[n - 1:]]),
        }).group_by(["gram", "doc_id"]).aggregate([("doc_id", "count")])
        return pa.table({"gram": g["gram"], "doc_id": g["doc_id"],
                         "n_part": pc.cast(g["doc_id_count"], pa.int64())})

    rows = ds.map_batches(gram_partials, batch_format="pyarrow")

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        per_doc = df.groupby(["gram", "doc_id"], as_index=False)["n_part"].sum()
        agg = (per_doc.groupby("gram")
               .agg(n_docs=("doc_id", "nunique"), n_occ=("n_part", "sum"))
               .reset_index())
        out = agg[agg["n_docs"] >= 2]
        return pd.DataFrame({"gram": out["gram"],
                             "n_docs": out["n_docs"].astype("int64"),
                             "n_occ": out["n_occ"].astype("int64")})

    return grouped_by_key_buckets(rows, "gram", finalize).to_pandas()


_Q44_LEADS = " || ' ' || ".join(
    ["word"] + [f"LEAD(word, {k}) OVER win" for k in range(1, _XDOC_NGRAM_N)])

Q44_SQL = f"""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS idx
  FROM documents
), g AS (
  SELECT doc_id, {_Q44_LEADS} AS gram
  FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY idx)
)
SELECT gram, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occ
FROM g WHERE gram IS NOT NULL
GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
"""


# Q16 — sessionization (30-min gap): ONE hash-bucket shuffle,
# vectorized gap detection across all keys in the bucket at once
def q16_user_sessions(sf_dir: str) -> pd.DataFrame:
    from ..stages.windows import grouped_by_key_buckets

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def sessions_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        new_user = df["user_id"] != df["user_id"].shift()
        gap = df["ts"].diff() > pd.Timedelta(minutes=30)
        df = df.assign(__new_s=(new_user | gap).astype("int64"))
        out = df.groupby("user_id", as_index=False).agg(
            n_sessions=("__new_s", "sum"), n_events=("user_id", "size"))
        out["n_sessions"] = out["n_sessions"].astype("int64")
        return out

    return grouped_by_key_buckets(ds, "user_id", sessions_bucket).to_pandas()


Q16_SQL = """
WITH w AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                      > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
)
SELECT user_id, SUM(new_s)::BIGINT AS n_sessions, COUNT(*) AS n_events
FROM w GROUP BY user_id
"""


# Q74 — per-host boilerplate line removal (the CCNet / RefinedWeb
# nav-footer rule): a "line" that recurs across >= _BP_MIN_DOCS
# DISTINCT documents of the SAME host is boilerplate (site chrome —
# navigation, footers, cookie banners) and is stripped from EVERY
# document on that host. Distinct semantics from q36 (corpus-level C4
# rule keeps one owner copy; here recurring lines vanish everywhere,
# and only within their host). Lines are the shared 10-word chunks
# (_line_rows); host is the deterministic doc_id % 17 mint (q34
# precedent). Two exchanges, both necessary: co-locate equal line
# texts (hash-bucket on line — equal lines land together regardless of
# host, so the per-(host, line) distinct-doc count is exact
# in-bucket), then regroup per document to rebuild. Output: only
# AFFECTED documents — (doc_id, n_removed, clean_text); clean_text is
# '' when every line was chrome. At 100 TB you'd ship (hid,
# line_hash, doc_id, ln) through the first exchange and re-derive
# surviving text by re-scanning the corpus against the boilerplate key
# set; the exact-text form keeps the oracle byte-exact (q36 note).
_BP_MIN_DOCS = 2


def q74_boilerplate_removal(sf_dir: str) -> pd.DataFrame:
    from ..stages.windows import grouped_by_key_buckets

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    rows = ds.map_batches(_line_rows, batch_format="pyarrow")

    def mark_bp(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df.assign(is_bp=pd.Series([], dtype=bool))
        df = df.assign(__hid=df["doc_id"] % 17)
        nd = df.groupby(["__hid", "line"], sort=False)["doc_id"].transform(
            "nunique")
        return df.assign(is_bp=nd >= _BP_MIN_DOCS).drop(columns="__hid")

    marked = grouped_by_key_buckets(rows, "line", mark_bp)

    def rebuild(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "ln"], kind="stable")
        n_removed = (df.groupby("doc_id", sort=False)["is_bp"].sum()
                     .astype("int64"))
        clean = (df[~df["is_bp"]]
                 .groupby("doc_id", sort=False)["line"].agg(" ".join))
        out = n_removed.to_frame("n_removed")
        out["clean_text"] = clean.reindex(out.index).fillna("")
        return out.reset_index()[["doc_id", "n_removed", "clean_text"]]

    # rebuild emits every doc (always non-empty per bucket — Ray's
    # pandas size estimator can't size 0-row object columns); the
    # affected-docs filter runs Arrow-side where empty blocks are fine
    rebuilt = grouped_by_key_buckets(marked, "doc_id", rebuild)
    return rebuilt.map_batches(
        lambda t: t.filter(pc.greater(t["n_removed"], 0)),
        batch_format="pyarrow").to_pandas()


Q74_SQL = f"""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS idx
  FROM documents
), l AS (
  SELECT doc_id, doc_id % 17 AS hid, (idx - 1) // {_LINE_WORDS} AS ln,
         string_agg(word, ' ' ORDER BY idx) AS line
  FROM w GROUP BY doc_id, (idx - 1) // {_LINE_WORDS}
), bp AS (
  SELECT hid, line FROM l
  GROUP BY hid, line HAVING COUNT(DISTINCT doc_id) >= {_BP_MIN_DOCS}
), c AS (
  SELECT l.doc_id, l.ln, l.line, (b.line IS NOT NULL) AS is_bp
  FROM l LEFT JOIN bp b ON b.hid = l.hid AND b.line = l.line
)
SELECT doc_id,
       CAST(COUNT(*) FILTER (WHERE is_bp) AS BIGINT) AS n_removed,
       COALESCE(string_agg(line, ' ' ORDER BY ln) FILTER (WHERE NOT is_bp),
                '') AS clean_text
FROM c GROUP BY doc_id
HAVING COUNT(*) FILTER (WHERE is_bp) > 0
"""


# Q90 — cross-document line containment (quote / superset detection:
# the directional complement of q19's symmetric Jaccard resemblance —
# a short doc fully quoted inside a long one scores low Jaccard but
# containment ~1). Docs are DISTINCT sets of 10-word lines (the
# q36/q74 mint); candidate pairs come from co-occurrence in a line's
# per-line doc list, capped at _CONTAIN_CAP by smallest doc_id — the
# cap is DETERMINISTIC and mirrored as a ROW_NUMBER in the oracle, so
# unlike q17-q19's LSH blocking the whole operator hash-verifies
# end-to-end. Combiner-first everywhere: distinct (doc, line) per
# block (docs are row-atomic, so per-block distinct is global),
# ONE line-bucket exchange emitting (a, b) pair rows, a pair-keyed
# count reduce, and a size-gated broadcast attach of the node-shaped
# per-doc line counts (found-mask searchsorted — the graphprep
# discipline). Runs over the q17b duplicated corpus so exact twins
# anchor the output at containment 1000 both ways.
_CONTAIN_CAP = 50
_CONTAIN_MIN_PM = 600


def line_containment_pairs(docs_ds, cap: int = _CONTAIN_CAP,
                           min_pm: int = _CONTAIN_MIN_PM) -> pd.DataFrame:
    from ..stages.windows import grouped_by_key_buckets

    def distinct_lines(t: pa.Table) -> pa.Table:
        lines = _line_rows(t).select(["doc_id", "line"])
        return lines.group_by(["doc_id", "line"]).aggregate([])

    rows = docs_ds.map_batches(distinct_lines, batch_format="pyarrow")

    sizes = (rows.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"],
                            "one": pa.array(
                                np.ones(len(t), np.int64))}),
        batch_format="pyarrow")
        .groupby("doc_id").aggregate(Sum("one", alias_name="n_lines"))
        .to_pandas())
    ids = sizes["doc_id"].to_numpy()
    order = np.argsort(ids, kind="stable")
    sz_ref = ray.put((ids[order],
                      sizes["n_lines"].to_numpy()[order].astype(np.int64)))

    def pair_rows(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, grp in df.groupby("line", sort=False):
            d = np.sort(grp["doc_id"].to_numpy().astype(np.int64))[:cap]
            if len(d) < 2:
                continue
            ii, jj = np.triu_indices(len(d), k=1)
            frames.append(pd.DataFrame({"a": d[ii], "b": d[jj]}))
        if not frames:
            return pd.DataFrame({"a": pd.array([], dtype="int64"),
                                 "b": pd.array([], dtype="int64")})
        out = pd.concat(frames, ignore_index=True)
        return out.groupby(["a", "b"], as_index=False).size().rename(
            columns={"size": "shared"})

    pairs = (grouped_by_key_buckets(rows, "line", pair_rows)
             .groupby(["a", "b"])
             .aggregate(Sum("shared", alias_name="shared")))

    def score(t: pa.Table) -> pa.Table:
        bids, bn = get_broadcast(sz_ref)
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        sh = t["shared"].to_numpy(zero_copy_only=False)
        pa_ = np.searchsorted(bids, a)
        pb_ = np.searchsorted(bids, b)
        la, lb = bn[pa_], bn[pb_]
        c_a = sh * 1000 // la
        c_b = sh * 1000 // lb
        keep = np.maximum(c_a, c_b) >= min_pm
        return pa.table({
            "a": pa.array(a[keep], pa.int64()),
            "b": pa.array(b[keep], pa.int64()),
            "shared": pa.array(sh[keep], pa.int64()),
            "la": pa.array(la[keep], pa.int64()),
            "lb": pa.array(lb[keep], pa.int64()),
            "c_a_pm": pa.array(c_a[keep], pa.int64()),
            "c_b_pm": pa.array(c_b[keep], pa.int64()),
        })

    return pairs.map_batches(score, batch_format="pyarrow").to_pandas()


def q90_line_containment(sf_dir: str) -> pd.DataFrame:
    from .webdemo import duplicated_documents

    return line_containment_pairs(duplicated_documents(sf_dir))


Q90_SQL = f"""
WITH u AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text FROM documents
), w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS idx
  FROM u
), l AS (
  SELECT doc_id, (idx - 1) // {_LINE_WORDS} AS ln,
         string_agg(word, ' ' ORDER BY idx) AS line
  FROM w GROUP BY doc_id, (idx - 1) // {_LINE_WORDS}
), dl AS (SELECT DISTINCT doc_id, line FROM l),
sz AS (SELECT doc_id, COUNT(*) AS n_lines FROM dl GROUP BY doc_id),
cap AS (
  SELECT doc_id, line FROM (
    SELECT doc_id, line,
           ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id) AS rn
    FROM dl) WHERE rn <= {_CONTAIN_CAP}
), p AS (
  SELECT x.doc_id AS a, y.doc_id AS b, CAST(COUNT(*) AS BIGINT) AS shared
  FROM cap x JOIN cap y ON x.line = y.line AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
)
SELECT p.a, p.b, p.shared,
       CAST(sa.n_lines AS BIGINT) AS la, CAST(sb.n_lines AS BIGINT) AS lb,
       CAST(p.shared * 1000 // sa.n_lines AS BIGINT) AS c_a_pm,
       CAST(p.shared * 1000 // sb.n_lines AS BIGINT) AS c_b_pm
FROM p JOIN sz sa ON sa.doc_id = p.a JOIN sz sb ON sb.doc_id = p.b
WHERE GREATEST(p.shared * 1000 // sa.n_lines,
               p.shared * 1000 // sb.n_lines) >= {_CONTAIN_MIN_PM}
"""
