"""Web-native corpus operators over derived Common-Crawl-shaped pages.

Like pipelines/webdemo.py, every input here is minted DETERMINISTICALLY
from the testdata ``documents`` table (no external data), so a DuckDB
oracle can re-derive the same input arithmetically and every operator
is hash-verified end-to-end:

* ``q41`` — URL canonicalization + canonical-URL dedup: the crawl-side
  twin of the content dedup family (stages/dedup.py). Five messy
  variants of every logical URL (tracking params, fragments, uppercase
  scheme/host, default port, trailing slash) collapse to one canonical
  form via a fixed chain of RE2 rewrites — Arrow kernels on the Ray
  side, the SAME regexes in DuckDB (both engines are RE2, so the chain
  is verifiable byte-for-byte). Combiner-first: each block reduces to
  distinct (canon_url, count, min_doc) partials before the one groupby.
* ``q42`` — host-level link-graph extraction: anchors are REALLY parsed
  out of the html bytes (vectorized polars ``extract_all``; the builder
  plants ``<nav>`` links whose targets the oracle recomputes
  arithmetically), mapped to hosts, and aggregated to a weighted edge
  list with a per-batch combiner — at web scale only (src_host,
  dst_host, partial_count) rows ever cross the exchange, never anchors.
* ``q42b`` — PageRank over that host graph (stages/graphrank.py): the
  iterative-propagation primitive, size-gated exactly like connected
  components. The oracle is the same damped power iteration unrolled as
  generated SQL CTEs — fully hash-verified (ranks projected to e6
  ints; see relational.py's float-determinism note).
* ``q43`` — crawl snapshot diff (added/deleted/changed/unchanged per
  url between two crawl snapshots): the incremental-crawl bookkeeping
  every refresh pipeline runs. Keys-only by construction — the text
  never crosses the exchange, only (url, content-hash-64, side); the
  two sides meet in ONE hash(url)-bucketed exchange. The 64-bit
  content hash is computed with the same vectorized polars hash the
  bucketing plane uses (functions/bucket.py) — both sides of the diff
  hash in the same environment, so hash equality == text equality
  (modulo 2^-64 collisions); the oracle compares text directly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Min, Sum

from ..functions.bucket import add_bucket, hash_column
from ..functions.text import text_to_html

# ---------------------------------------------------------------------------
# Q41 — URL canonicalization + canonical-URL dedup
# ---------------------------------------------------------------------------

# One canonicalization pipeline, expressed as data so the Ray kernels
# and the DuckDB oracle consume the SAME patterns (both RE2):
_URL_SPLIT = (r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://"
              r"(?P<hostport>[^/?#]*)(?P<rest>[^#]*)")
_TRACK = "utm_[A-Za-z0-9_]+|fbclid|gclid|ref"
_REST_REWRITES: list[tuple[str, str]] = [
    (rf"({_TRACK})=[^&]*&", ""),        # tracking param followed by more
    (rf"[?&](?:{_TRACK})=[^&]*$", ""),  # tracking param at the end
    (r"/+\?", "?"),                     # trailing path slash before query
    (r"(.)/+$", r"\1"),                 # trailing path slash at the end
]


def mint_messy_urls(documents_ds):
    """documents -> (doc_id, url): five deterministic messy variants per
    logical page (vectorized Arrow mint; the oracle mirrors it as CASE
    arithmetic). doc_id//5 is the logical page, doc_id%5 the variant."""

    def mint(t: pa.Table) -> pa.Table:
        doc = t["doc_id"]
        gid = pc.divide(doc, pa.scalar(5, pa.int64()))
        v = pc.subtract(doc, pc.multiply(gid, pa.scalar(5, pa.int64())))
        h = pc.subtract(gid, pc.multiply(pc.divide(gid, pa.scalar(23, pa.int64())),
                                         pa.scalar(23, pa.int64())))
        gs = pc.cast(gid, pa.string())
        hs = pc.cast(h, pa.string())
        ds_ = pc.cast(doc, pa.string())
        base = pc.binary_join_element_wise(
            "https://site", hs, ".example.org/a/", gs, "")
        variants = [
            pc.binary_join_element_wise(base, "?utm_source=feed&q=1", ""),
            pc.binary_join_element_wise(base, "?q=1#frag", ""),
            pc.binary_join_element_wise(
                "HTTPS://SITE", hs, ".EXAMPLE.ORG:443/a/", gs, "?q=1", ""),
            pc.binary_join_element_wise(base, "/?q=1", ""),
            pc.binary_join_element_wise(base, "?q=1&fbclid=x", ds_, ""),
        ]
        url = variants[4]
        for k in (3, 2, 1, 0):
            url = pc.if_else(pc.equal(v, pa.scalar(k, pa.int64())),
                             variants[k], url)
        return pa.table({"doc_id": doc, "url": url})

    return documents_ds.map_batches(mint, batch_format="pyarrow")


def canonicalize_url_column(url: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized canonical form: lowercase scheme+host, strip the
    scheme's default port, drop the fragment, drop tracking params,
    strip trailing path slashes. Pure RE2 rewrites — the DuckDB oracle
    applies the identical chain."""
    m = pc.extract_regex(url, pattern=_URL_SPLIT)
    scheme = pc.utf8_lower(pc.struct_field(m, "scheme"))
    hostport = pc.utf8_lower(pc.struct_field(m, "hostport"))
    rest = pc.struct_field(m, "rest")
    host = pc.if_else(
        pc.equal(scheme, pa.scalar("https")),
        pc.replace_substring_regex(hostport, pattern=":443$", replacement=""),
        pc.if_else(
            pc.equal(scheme, pa.scalar("http")),
            pc.replace_substring_regex(hostport, pattern=":80$", replacement=""),
            hostport))
    for pat, rep in _REST_REWRITES:
        rest = pc.replace_substring_regex(rest, pattern=pat, replacement=rep)
    rest = pc.if_else(pc.equal(rest, pa.scalar("")), pa.scalar("/"), rest)
    return pc.binary_join_element_wise(scheme, "://", host, rest, "")


def q41_url_canonical_dedup(sf_dir: str) -> pd.DataFrame:
    """Canonical-URL groups: (canon_url, n_dupes, keeper_doc_id)."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def partials(t: pa.Table) -> pa.Table:
        canon = canonicalize_url_column(t["url"])
        g = (pa.table({"canon_url": canon, "doc_id": t["doc_id"]})
             .group_by("canon_url")
             .aggregate([("doc_id", "count"), ("doc_id", "min")]))
        return pa.table({
            "canon_url": g["canon_url"],
            "n_part": pc.cast(g["doc_id_count"], pa.int64()),
            "min_part": g["doc_id_min"],
        })

    return (
        mint_messy_urls(docs)
        .map_batches(partials, batch_format="pyarrow")
        .groupby("canon_url")
        .aggregate(Sum("n_part", alias_name="n_dupes"),
                   Min("min_part", alias_name="keeper_doc_id"))
        .to_pandas()
    )


def _sql_canon_chain(expr_scheme: str, expr_hostport: str, expr_rest: str) -> str:
    """The canonicalization chain as DuckDB SQL over three column
    expressions — generated from the same _REST_REWRITES table the
    Arrow kernels consume."""
    host = (f"CASE WHEN {expr_scheme} = 'https' THEN "
            f"regexp_replace({expr_hostport}, ':443$', '') "
            f"WHEN {expr_scheme} = 'http' THEN "
            f"regexp_replace({expr_hostport}, ':80$', '') "
            f"ELSE {expr_hostport} END")
    rest = expr_rest
    for pat, rep in _REST_REWRITES:
        pat_sql = pat.replace("'", "''")
        rep_sql = rep.replace("\\", "\\")
        rest = f"regexp_replace({rest}, '{pat_sql}', '{rep_sql}', 'g')"
    rest = f"CASE WHEN {rest} = '' THEN '/' ELSE {rest} END"
    return f"{expr_scheme} || '://' || {host} || {rest}"


Q41_SQL = f"""
WITH m AS (
  SELECT doc_id, doc_id // 5 AS gid, doc_id % 5 AS v,
         (doc_id // 5) % 23 AS h
  FROM documents
), u AS (
  SELECT doc_id, CASE v
    WHEN 0 THEN 'https://site' || CAST(h AS VARCHAR) || '.example.org/a/'
                || CAST(gid AS VARCHAR) || '?utm_source=feed&q=1'
    WHEN 1 THEN 'https://site' || CAST(h AS VARCHAR) || '.example.org/a/'
                || CAST(gid AS VARCHAR) || '?q=1#frag'
    WHEN 2 THEN 'HTTPS://SITE' || CAST(h AS VARCHAR) || '.EXAMPLE.ORG:443/a/'
                || CAST(gid AS VARCHAR) || '?q=1'
    WHEN 3 THEN 'https://site' || CAST(h AS VARCHAR) || '.example.org/a/'
                || CAST(gid AS VARCHAR) || '/?q=1'
    ELSE 'https://site' || CAST(h AS VARCHAR) || '.example.org/a/'
         || CAST(gid AS VARCHAR) || '?q=1&fbclid=x' || CAST(doc_id AS VARCHAR)
  END AS url FROM m
), s AS (
  SELECT doc_id,
         lower(regexp_extract(url, '{_URL_SPLIT}', 1)) AS scheme,
         lower(regexp_extract(url, '{_URL_SPLIT}', 2)) AS hostport,
         regexp_extract(url, '{_URL_SPLIT}', 3) AS rest
  FROM u
)
SELECT {_sql_canon_chain('scheme', 'hostport', 'rest')} AS canon_url,
       CAST(COUNT(*) AS BIGINT) AS n_dupes,
       MIN(doc_id) AS keeper_doc_id
FROM s
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q42 — host link-graph extraction; Q42b — PageRank over it
# ---------------------------------------------------------------------------

N_HOSTS = 31
N_OUTLINKS = 3
_LINK_MULT = 65537
_LINK_STEP = 97
_LINK_OFF = 13
_HOST_RE = r"^https?://(?P<host>[^/]+)/"
_HREF_RE = r'href="([^"]+)"'


def _doc_host(i: int) -> str:
    return f"site{i % N_HOSTS}.example"


def linked_pages_from_documents(sf_dir: str):
    """documents -> pages whose html carries a real <nav> of anchors to
    ``N_OUTLINKS`` deterministic targets: t_k = (doc_id*65537 + k*97
    + 13) mod n_docs. The extractor must find them IN the html bytes;
    the oracle recomputes them arithmetically."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    n_docs = ds.count()

    def to_pages(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        htmls = []
        for i, x in zip(ids, texts):
            nav = "".join(
                '<a href="https://{h}/p/{t}">ref{k}</a>'.format(
                    h=_doc_host(tk), t=tk, k=k)
                for k, tk in (
                    (k, (i * _LINK_MULT + k * _LINK_STEP + _LINK_OFF) % n_docs)
                    for k in range(N_OUTLINKS)))
            base = text_to_html(x, title=f"Doc {i}").decode("utf-8")
            htmls.append(base.replace(
                "</body></html>",
                f"<nav>{nav}</nav></body></html>").encode("utf-8"))
        return pa.table({
            "url": pa.array([f"https://{_doc_host(i)}/p/{i}" for i in ids],
                            pa.string()),
            "html": pa.array(htmls, pa.binary()),
        })

    return ds.map_batches(to_pages, batch_format="pyarrow")


def host_link_edges(pages_ds):
    """pages(url, html) -> weighted host edge list (src_host, dst_host,
    n_links). Anchor extraction is vectorized (polars extract_all over
    the decoded html); each block combines to distinct (src, dst,
    partial-count) rows before the single groupby exchange."""
    import polars as pl

    def edge_partials(t: pa.Table) -> pa.Table:
        src_host = pc.struct_field(
            pc.extract_regex(t["url"], pattern=_HOST_RE), "host")
        html = pc.cast(t["html"], pa.string())
        pf = pl.DataFrame({
            "src_host": pl.from_arrow(src_host),
            "html": pl.from_arrow(html),
        })
        exploded = (
            pf.with_columns(pl.col("html").str.extract_all(_HREF_RE)
                            .alias("href"))
            .drop("html")
            .explode("href")
            .drop_nulls("href")
            .with_columns(pl.col("href").str.extract(_HREF_RE, 1)
                          .str.extract(_HOST_RE, 1).alias("dst_host"))
            .drop_nulls("dst_host")
            .group_by(["src_host", "dst_host"])
            .agg(pl.len().alias("n_part"))
        )
        out = exploded.to_arrow()
        return pa.table({
            "src_host": out["src_host"].cast(pa.string()),
            "dst_host": out["dst_host"].cast(pa.string()),
            "n_part": out["n_part"].cast(pa.int64()),
        })

    return (
        pages_ds.map_batches(edge_partials, batch_format="pyarrow")
        .groupby(["src_host", "dst_host"])
        .aggregate(Sum("n_part", alias_name="n_links"))
    )


def q42_link_graph(sf_dir: str) -> pd.DataFrame:
    return host_link_edges(linked_pages_from_documents(sf_dir)).to_pandas()


_Q42_EDGES_CTE = """n AS (SELECT COUNT(*) AS n FROM documents),
ks(k) AS (VALUES (0), (1), (2)),
tgt AS (
  SELECT d.doc_id,
         (d.doc_id * 65537 + ks.k * 97 + 13) % (SELECT n FROM n) AS t
  FROM documents d CROSS JOIN ks
),
edges AS (
  SELECT 'site' || CAST(doc_id % 31 AS VARCHAR) || '.example' AS src_host,
         'site' || CAST(t % 31 AS VARCHAR) || '.example' AS dst_host,
         CAST(COUNT(*) AS BIGINT) AS n_links
  FROM tgt GROUP BY 1, 2
)"""

Q42_SQL = f"WITH {_Q42_EDGES_CTE}\nSELECT src_host, dst_host, n_links FROM edges"


# ---------------------------------------------------------------------------
# Q71 — anchor-text aggregation per target host
# ---------------------------------------------------------------------------

# The classic web-search relevance signal: what OTHER pages call a
# target ("anchor text"), aggregated per destination. Unlike q42 this
# must parse the anchor's inner text, not just the href — the full
# <a ...>text</a> tag is extracted (vectorized polars extract_all over
# the html bytes), then href-host and inner text pulled from each tag.
# Per-block (dst_host, anchor_text) partials combine BEFORE the single
# groupby exchange, so a head target (every page linking "home" to the
# front page) contributes one row per block, never one per anchor —
# the same head-key bound as q42's edge partials. The oracle recomputes
# the synthetic nav arithmetically (the q42 precedent), so the check
# verifies the parse, not a copy of it.
_ANCHOR_RE = r'<a href="([^"]+)"[^>]*>([^<]*)</a>'


def anchor_text_counts(pages_ds):
    """pages(url, html) -> (dst_host, anchor_text, n_refs)."""
    import polars as pl

    def partials(t: pa.Table) -> pa.Table:
        html = pc.cast(t["html"], pa.string())
        pf = pl.DataFrame({"html": pl.from_arrow(html)})
        ex = (
            pf.with_columns(pl.col("html").str.extract_all(_ANCHOR_RE)
                            .alias("tag"))
            .drop("html")
            .explode("tag")
            .drop_nulls("tag")
            .with_columns(
                pl.col("tag").str.extract(_ANCHOR_RE, 1)
                .str.extract(_HOST_RE, 1).alias("dst_host"),
                pl.col("tag").str.extract(_ANCHOR_RE, 2)
                .alias("anchor_text"))
            .drop_nulls("dst_host")
            .group_by(["dst_host", "anchor_text"])
            .agg(pl.len().alias("n_part"))
        )
        out = ex.to_arrow()
        return pa.table({
            "dst_host": out["dst_host"].cast(pa.string()),
            "anchor_text": out["anchor_text"].cast(pa.string()),
            "n_part": out["n_part"].cast(pa.int64()),
        })

    return (
        pages_ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["dst_host", "anchor_text"])
        .aggregate(Sum("n_part", alias_name="n_refs"))
    )


def q71_anchor_text(sf_dir: str) -> pd.DataFrame:
    return anchor_text_counts(linked_pages_from_documents(sf_dir)).to_pandas()


Q71_SQL = f"""
WITH n AS (SELECT COUNT(*) AS n FROM documents),
ks(k) AS (VALUES (0), (1), (2)),
tgt AS (
  SELECT d.doc_id, ks.k,
         (d.doc_id * {_LINK_MULT} + ks.k * {_LINK_STEP} + {_LINK_OFF})
           % (SELECT n FROM n) AS t
  FROM documents d CROSS JOIN ks
)
SELECT 'site' || CAST(t % {N_HOSTS} AS VARCHAR) || '.example' AS dst_host,
       'ref' || CAST(k AS VARCHAR) AS anchor_text,
       CAST(COUNT(*) AS BIGINT) AS n_refs
FROM tgt GROUP BY 1, 2
"""


PAGERANK_ITERS = 4
PAGERANK_ALPHA = 0.85


def q42b_host_pagerank(sf_dir: str) -> pd.DataFrame:
    """PageRank over the extracted host graph; ranks projected to e6
    ints for hash-stable comparison (float partial-sum order differs
    between engines in the low bits only)."""
    from ..stages.graphrank import pagerank

    edges = host_link_edges(linked_pages_from_documents(sf_dir))
    ranks = pagerank(edges, src_col="src_host", dst_col="dst_host",
                     weight_col="n_links", n_iters=PAGERANK_ITERS,
                     alpha=PAGERANK_ALPHA)

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "host": t["node"],
            "rank_e6": pc.cast(pc.round(pc.multiply(
                t["rank"], pa.scalar(1_000_000.0))), pa.int64()),
        })

    return ranks.map_batches(project, batch_format="pyarrow").to_pandas()


def _q42b_sql(n_iters: int = PAGERANK_ITERS) -> str:
    """The same damped power iteration unrolled as SQL CTEs. The
    damping constants are written as (1.0 - 0.85) / 0.85 so both
    engines evaluate the identical IEEE doubles."""
    parts = [
        _Q42_EDGES_CTE,
        "wout AS (SELECT src_host, SUM(n_links) AS w FROM edges GROUP BY src_host)",
        ("hosts AS (SELECT DISTINCT h AS host FROM "
         "(SELECT src_host AS h FROM edges UNION ALL SELECT dst_host FROM edges))"),
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM hosts)",
        "r0 AS (SELECT host, 1.0 / (SELECT n FROM nn) AS r FROM hosts)",
    ]
    for i in range(1, n_iters + 1):
        prev = f"r{i - 1}"
        parts.append(f"""r{i} AS (
  SELECT h.host,
         (1.0 - 0.85) / (SELECT n FROM nn)
         + 0.85 * (COALESCE(c.c, 0)
                   + (SELECT COALESCE(SUM(p.r), 0) FROM {prev} p
                      LEFT JOIN wout w ON w.src_host = p.host
                      WHERE w.src_host IS NULL) / (SELECT n FROM nn)) AS r
  FROM hosts h LEFT JOIN (
    SELECT e.dst_host AS host, SUM(p.r * e.n_links / w.w) AS c
    FROM edges e
    JOIN {prev} p ON p.host = e.src_host
    JOIN wout w ON w.src_host = e.src_host
    GROUP BY e.dst_host) c ON c.host = h.host
)""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT host, CAST(ROUND(r * 1000000) AS BIGINT) AS rank_e6"
              f" FROM r{n_iters}")


Q42B_SQL = _q42b_sql()


# ---------------------------------------------------------------------------
# Q43 — crawl snapshot diff
# ---------------------------------------------------------------------------

_DIFF_URL_PREFIX = "https://docs.example/"
_ADDED_ID_SHIFT = 200_000


def _snapshot_a(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def mk(t: pa.Table) -> pa.Table:
        return pa.table({
            "url": pc.binary_join_element_wise(
                _DIFF_URL_PREFIX, pc.cast(t["doc_id"], pa.string()), ""),
            "text": pc.cast(t["text"], pa.string()),
        })

    return ds.map_batches(mk, batch_format="pyarrow")


def _snapshot_b(sf_dir: str):
    """The 'next crawl': doc_id%11==0 pages dropped, doc_id%7==0 pages
    revised, one new page per doc_id%13==0."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def survivors(t: pa.Table) -> pa.Table:
        doc = t["doc_id"]
        mod11 = pc.subtract(doc, pc.multiply(
            pc.divide(doc, pa.scalar(11, pa.int64())), pa.scalar(11, pa.int64())))
        t = t.filter(pc.not_equal(mod11, pa.scalar(0, pa.int64())))
        doc = t["doc_id"]
        mod7 = pc.subtract(doc, pc.multiply(
            pc.divide(doc, pa.scalar(7, pa.int64())), pa.scalar(7, pa.int64())))
        text = pc.cast(t["text"], pa.string())
        revised = pc.binary_join_element_wise(text, " [rev2]", "")
        return pa.table({
            "url": pc.binary_join_element_wise(
                _DIFF_URL_PREFIX, pc.cast(doc, pa.string()), ""),
            "text": pc.if_else(pc.equal(mod7, pa.scalar(0, pa.int64())),
                               revised, text),
        })

    def added(t: pa.Table) -> pa.Table:
        doc = t["doc_id"]
        mod13 = pc.subtract(doc, pc.multiply(
            pc.divide(doc, pa.scalar(13, pa.int64())), pa.scalar(13, pa.int64())))
        t = t.filter(pc.equal(mod13, pa.scalar(0, pa.int64())))
        nid = pc.cast(pc.add(t["doc_id"],
                             pa.scalar(_ADDED_ID_SHIFT, pa.int64())), pa.string())
        return pa.table({
            "url": pc.binary_join_element_wise(_DIFF_URL_PREFIX, nid, ""),
            "text": pc.binary_join_element_wise("new page ", nid, ""),
        })

    return (ds.map_batches(survivors, batch_format="pyarrow")
            .union(ds.map_batches(added, batch_format="pyarrow")))


def snapshot_b_pages(sf_dir: str):
    """Full-schema pages (url, warc_ts, html, text, lang) for the
    'next crawl' snapshot — the SAME mutation rules as ``_snapshot_b``
    (deleted %11, revised %7, added %13) over webdemo's page derivation
    (same URL namespace), so the incremental pipeline's input is
    SQL-reconstructable (``nel_triples_incremental``'s oracle feeds the
    mutated corpus into the full linking algebra)."""
    import ray.data as _rd

    from .webdemo import EPOCH_MS, URL_PREFIX

    ds = _rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "text", "lang"])

    def to_pages(t: pa.Table) -> pa.Table:
        rows = []
        for i, x, lang in zip(t["doc_id"].to_pylist(), t["text"].to_pylist(),
                              t["lang"].to_pylist()):
            if i % 11 != 0:  # %11 == 0 pages are deleted in snapshot B
                rows.append((i, x + " [rev2]" if i % 7 == 0 else x, lang))
            if i % 13 == 0:  # additions are independent of deletions
                nid = i + _ADDED_ID_SHIFT
                rows.append((nid, f"new page {nid}", lang))
        return pa.table({
            "url": pa.array([f"{URL_PREFIX}{i}" for i, _, _ in rows],
                            pa.string()),
            "warc_ts": pa.array([EPOCH_MS + i * 1000 for i, _, _ in rows],
                                pa.timestamp("ms")),
            "html": pa.array(
                [text_to_html(x, title=f"Doc {i}") for i, x, _ in rows],
                pa.binary()),
            "text": pa.array([x for _, x, _ in rows], pa.large_string()),
            "lang": pa.array([l for _, _, l in rows], pa.string()),
        })

    return ds.map_batches(to_pages, batch_format="pyarrow")


def page_content_hashes(pages_ds):
    """(url, text, ...) -> (url, h): the 64-bit content fingerprint a
    link checkpoint should persist alongside its links — the NEXT
    incremental run then diffs against these hashes instead of
    re-reading the previous snapshot's text (pipelines/incremental.py).
    Same vectorized polars hash as the bucketing plane."""

    def mk(t: pa.Table) -> pa.Table:
        h = hash_column(t, "text").astype(np.int64)
        return pa.table({"url": t["url"], "h": pa.array(h, pa.int64())})

    return pages_ds.map_batches(mk, batch_format="pyarrow")


def snapshot_diff_keys(a_keys_ds, b_keys_ds, num_buckets: int = 64,
                       coalesce_small: bool | None = None):
    """Pre-hashed diff core: two (url, h) sides -> (url, status). Both
    sides hash in the same environment, so hash equality == text
    equality (modulo 2^-64 collisions).

    ``coalesce_small=None`` (default) decides from the MEASURED keyed
    stream: the keys are materialized (they are the shuffle's input
    either way — narrow rows), and when the average block is under 50k
    rows the stream is repartitioned before the groupby. Two unioned
    page reads leave O(read tasks) tiny blocks and the sort-shuffle's
    per-block dispatch then costs ~3x the actual exchange (measured
    14.8 s vs 4.9 s at 1.1M keyed rows in 408 blocks). At scale blocks
    arrive right-sized and the condition never fires."""

    def tag(side: int):
        def mk(t: pa.Table) -> pa.Table:
            out = pa.table({
                "url": t["url"],
                "h": t["h"],
                "side": pa.array(np.full(t.num_rows, side, dtype=np.int8),
                                 pa.int8()),
            })
            return add_bucket(out, "url", num_buckets)
        return mk

    keys = (a_keys_ds.map_batches(tag(0), batch_format="pyarrow")
            .union(b_keys_ds.map_batches(tag(1), batch_format="pyarrow")))
    if coalesce_small is None:
        keys = keys.materialize()
        n_rows, n_blocks = keys.count(), max(1, keys.num_blocks())
        coalesce_small = n_rows / n_blocks < 50_000
        num_blocks = max(num_buckets, n_rows // 250_000 + 1)
    else:
        num_blocks = num_buckets
    if coalesce_small:
        keys = keys.repartition(num_blocks)

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        # nullable Int64 so the outer merge can't demote the 64-bit
        # hashes to float64 (which collides distinct values > 2^53)
        df = df.astype({"h": "Int64"})
        a = df[df["side"] == 0][["url", "h"]]
        b = df[df["side"] == 1][["url", "h"]]
        m = a.merge(b, on="url", how="outer", suffixes=("_a", "_b"))
        changed = (m["h_a"] != m["h_b"]).fillna(False).to_numpy(dtype=bool)
        status = np.select(
            [m["h_a"].isna().to_numpy(), m["h_b"].isna().to_numpy(), changed],
            ["added", "deleted", "changed"],
            default="unchanged")
        return pd.DataFrame({"url": m["url"], "status": status})

    return (keys.groupby("__bucket")
            .map_groups(lambda df: classify(df.drop(columns="__bucket")),
                        batch_format="pandas"))


def snapshot_diff(a_ds, b_ds, num_buckets: int = 64,
                  coalesce_small: bool = False):
    """Two page snapshots (url, text) -> (url, status) with status in
    added / deleted / changed / unchanged. Keys-only: each side reduces
    to (url, hash64, side) before the single hash(url)-bucketed
    exchange; texts never move. Size the bucket count to the input
    (the CC idiom, stages/cc.py): small snapshots pay per-bucket task
    dispatch, huge ones need spread. ``coalesce_small`` additionally
    repartitions the keyed rows to ``num_buckets`` blocks before the
    groupby — two unioned reads of a small corpus leave O(cpus) tiny
    blocks each, and the sort-shuffle's per-block dispatch then costs
    ~8x the actual exchange (measured 2.5 s over 192 tiny blocks vs
    0.34 s coalesced). Only set it when the keyed rows are known-small:
    at scale the extra exchange is pure waste."""
    return snapshot_diff_keys(page_content_hashes(a_ds),
                              page_content_hashes(b_ds),
                              num_buckets=num_buckets,
                              coalesce_small=coalesce_small)


def q43_snapshot_diff(sf_dir: str) -> pd.DataFrame:
    # metadata-only row count (no scan, no Ray tasks) sizes the exchange
    import pyarrow.parquet as pq

    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    buckets = max(4, min(64, n // 25_000 + 4))
    return snapshot_diff(_snapshot_a(sf_dir), _snapshot_b(sf_dir),
                         num_buckets=buckets,
                         coalesce_small=n < 1_000_000).to_pandas()


Q43_SQL = f"""
WITH a AS (
  SELECT '{_DIFF_URL_PREFIX}' || CAST(doc_id AS VARCHAR) AS url, text
  FROM documents
), b AS (
  SELECT '{_DIFF_URL_PREFIX}' || CAST(doc_id AS VARCHAR) AS url,
         CASE WHEN doc_id % 7 = 0 THEN text || ' [rev2]' ELSE text END AS text
  FROM documents WHERE doc_id % 11 <> 0
  UNION ALL
  SELECT '{_DIFF_URL_PREFIX}' || CAST(doc_id + {_ADDED_ID_SHIFT} AS VARCHAR),
         'new page ' || CAST(doc_id + {_ADDED_ID_SHIFT} AS VARCHAR)
  FROM documents WHERE doc_id % 13 = 0
)
SELECT COALESCE(a.url, b.url) AS url,
       CASE WHEN a.url IS NULL THEN 'added'
            WHEN b.url IS NULL THEN 'deleted'
            WHEN a.text <> b.text THEN 'changed'
            ELSE 'unchanged' END AS status
FROM a FULL OUTER JOIN b ON a.url = b.url
"""
