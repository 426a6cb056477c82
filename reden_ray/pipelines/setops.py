"""Exact set-similarity join pipeline (q100) over a planted corpus.

Corpus: every document plus a junk-suffixed copy — copy(doc) =
text + " zq0 .. zq(j-1)" with j = doc_id % 8 extra distinct tokens, so
the copy's Jaccard against its base is |S|/(|S|+j): exactly 1.0 at
j=0, sliding under the 0.9 threshold as j grows against small docs.
Whether each copy qualifies therefore depends on the doc's own
distinct-token count — the threshold is exercised from both sides —
and the natural exact-duplicate texts the generator plants in
``documents`` (q7) must surface as cross-doc J=1.0 pairs too. The
oracle recomputes the corpus arithmetically and brute-forces every
pair through the SAME integer inequality, so the full pair set AND
the jac_ppm scores hash-verify.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

TAU_PPM = 900_000
_SHIFT = 100_000
_MAX_J = 8


_CORPUS_CAP = 500  # deterministic bound (see docstring)


def suffixed_pair_corpus(sf_dir: str, shift: int = _SHIFT):
    """documents ∪ junk-suffixed copies (doc_id + shift), BOUNDED to
    doc_id < 500: the synthetic documents' ~38-token vocabulary makes
    the qualifying pair set genuinely quadratic (worst case for prefix
    filtering), so an unbounded corpus at sf0.1 (5000 docs) would mint
    ~50M candidate pairs in a query that exists to verify EXACTNESS,
    not throughput. The cap is mirrored in the oracle and is a no-op
    at the driver's verification scales (doc_ids 0..499 there)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def planted(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["doc_id"], pa.scalar(_CORPUS_CAP)))
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        txt = t["text"].to_pylist()
        copies = [
            x + "".join(f" zq{k}" for k in range(int(i) % _MAX_J))
            for i, x in zip(ids, txt)
        ]
        return pa.table({
            "doc_id": pa.array(
                list(ids) + [int(i) + shift for i in ids], pa.int64()),
            "text": pa.array(txt + copies, pa.string()),
        })

    return ds.map_batches(planted, batch_format="pyarrow")


def q100_jaccard_join(sf_dir: str) -> pd.DataFrame:
    from ..stages.setjoin import jaccard_join

    corpus = suffixed_pair_corpus(sf_dir).materialize()  # read 3x inside
    # the synthetic documents use a ~38-token vocabulary, which is the
    # WORST case for prefix filtering: every doc's prefix draws from
    # the same few globally-rare tokens and ~19k of the C(1000,2)
    # pairs genuinely qualify at tau=0.9 — so the exactness gate needs
    # the bucket cap lifted out of the way (a Zipf web vocabulary is
    # the regime the default cap is sized for)
    df = jaccard_join(corpus, tau_ppm=TAU_PPM,
                      bucket_cap=2_000_000).to_pandas()
    if df.empty:  # Ray drops the schema of an all-empty Dataset
        df = pd.DataFrame({"a": pd.Series(dtype="int64"),
                           "b": pd.Series(dtype="int64"),
                           "jac_ppm": pd.Series(dtype="int64")})
    return df


_SUFFIXES = ", ".join(
    "(%d, '%s')" % (j, "".join(f" zq{k}" for k in range(j)))
    for j in range(_MAX_J))

Q100_SQL = f"""
WITH sfx(j, sfx) AS (VALUES {_SUFFIXES}),
base AS (SELECT doc_id, text FROM documents WHERE doc_id < {_CORPUS_CAP}),
u AS (
  SELECT doc_id, text FROM base
  UNION ALL
  SELECT d.doc_id + {_SHIFT}, d.text || s.sfx
  FROM base d JOIN sfx s ON s.j = d.doc_id % {_MAX_J}
),
tok AS (
  SELECT DISTINCT doc_id, word
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM u)
  WHERE word <> ''
),
sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a, b.doc_id AS b, CAST(COUNT(*) AS BIGINT) AS i
  FROM tok a JOIN tok b ON a.word = b.word AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.a, i.b,
       CAST(1000000 * i.i // (sa.n + sb.n - i.i) AS BIGINT) AS jac_ppm
FROM inter i
JOIN sz sa ON sa.doc_id = i.a
JOIN sz sb ON sb.doc_id = i.b
WHERE 1000000 * i.i >= {TAU_PPM} * (sa.n + sb.n - i.i)
"""


# ---------------------------------------------------------------------------
# Q103 — positional phrase search (exact consecutive-token match)
# ---------------------------------------------------------------------------

PHRASE = ("slow", "hash", "batch")


def phrase_hits(ds, phrase=PHRASE, id_col: str = "doc_id",
                text_col: str = "text"):
    """documents -> (doc_id, n_hits) for docs containing the exact
    consecutive token sequence; overlapping occurrences all count
    (positional semantics — matches the SQL positional self-join, and
    differs from regex counting on self-overlapping phrases).

    Zero shuffle: a document's tokens live inside its own row, so the
    whole match is a per-batch numpy scan — flatten tokens with parent
    indices, AND together shifted equality masks, guard doc boundaries
    by comparing parents. Tokens are NOT blank-filtered: DuckDB's
    string_split keeps empty strings at double spaces and position
    arithmetic must agree position-for-position on both engines.
    """
    L = len(phrase)

    def scan(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(t[text_col], " ")
        flat = pc.list_flatten(words).to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(words).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n = len(flat)
        if n < L:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "n_hits": pa.array([], pa.int64())})
        m = flat[: n - L + 1] == phrase[0]
        for j in range(1, L):
            m &= flat[j: n - L + 1 + j] == phrase[j]
            m &= par[j: n - L + 1 + j] == par[: n - L + 1]
        ids = t[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hits = np.bincount(par[: n - L + 1][m], minlength=t.num_rows)
        nz = np.nonzero(hits)[0]
        return pa.table({
            id_col: pa.array(ids[nz], pa.int64()),
            "n_hits": pa.array(hits[nz].astype(np.int64), pa.int64()),
        })

    return ds.map_batches(scan, batch_format="pyarrow")


def q103_phrase_search(sf_dir: str) -> pd.DataFrame:
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    df = phrase_hits(ds).to_pandas()
    if df.empty:  # Ray drops the schema of an all-empty Dataset
        df = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                           "n_hits": pd.Series(dtype="int64")})
    return df


_P0, _P1, _P2 = PHRASE

Q103_SQL = f"""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS idx
  FROM documents
)
SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
FROM w a
JOIN w b ON b.doc_id = a.doc_id AND b.idx = a.idx + 1
JOIN w c ON c.doc_id = a.doc_id AND c.idx = a.idx + 2
WHERE a.w = '{_P0}' AND b.w = '{_P1}' AND c.w = '{_P2}'
GROUP BY a.doc_id
"""
