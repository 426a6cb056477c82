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

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

TAU_PPM = 900_000
_SHIFT = 100_000
_MAX_J = 8


def suffixed_pair_corpus(sf_dir: str, shift: int = _SHIFT):
    """documents ∪ junk-suffixed copies (doc_id + shift)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def planted(t: pa.Table) -> pa.Table:
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
u AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT d.doc_id + {_SHIFT}, d.text || s.sfx
  FROM documents d JOIN sfx s ON s.j = d.doc_id % {_MAX_J}
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
