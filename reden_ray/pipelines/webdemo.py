"""Driver-facing pipelines over the test tables (documents/embeddings).

Builds Common-Crawl-shaped inputs deterministically FROM the test
tables (no external data):

* ``pages_from_documents`` — documents -> pages(url, warc_ts, html,
  text, lang) where html = text_to_html(text); the frozen extraction
  inverts it exactly, so `extract == documents.text` is SQL-checkable.
* ``vocab_fixture`` — a deterministic dictionary/KB/gazetteer over the
  documents' vocabulary (entity-ish words), cached under /tmp, so the
  full NEL pipeline runs against real testdata text.
* ``nel_*`` — the flagship KG-construction pipeline over those pages.
* duplicated-corpus builders for the dedup demos (union the table with
  an id-shifted copy -> known exact-duplicate clusters the oracle can
  recompute).
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from ..fixtures import KB, PRED_KNOWS, PRED_MEMBER, PRED_OCC
from ..functions.text import normalize_surface, text_to_html

URL_PREFIX = "https://docs.example/"
EPOCH_MS = 1_700_000_000_000

# Entity-ish vocabulary words (subset of the generator vocabulary).
VOCAB_ENTITIES = ["spark", "customer", "window", "table", "query", "stream",
                  "vector", "batch", "merge", "filter"]
# Ambiguous aliases: these words map to TWO entities each.
VOCAB_AMBIGUOUS = {"spark", "stream", "vector"}
GAZETTEER_WORDS = sorted(VOCAB_ENTITIES)


def pages_from_documents(sf_dir: str):
    """documents Dataset -> pages Dataset (derived, deterministic)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])

    def to_pages(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        return pa.table(
            {
                "url": pa.array([f"{URL_PREFIX}{i}" for i in ids], pa.string()),
                "warc_ts": pa.array([EPOCH_MS + int(i) * 1000 for i in ids],
                                    pa.timestamp("ms")),
                "html": pa.array(
                    [text_to_html(x, title=f"Doc {i}") for i, x in zip(ids, texts)],
                    pa.binary(),
                ),
                "text": pa.array(texts, pa.large_string()),
                "lang": t["lang"].cast(pa.string()),
            }
        )

    return ds.map_batches(to_pages, batch_format="pyarrow")


def _vocab_version() -> str:
    import hashlib

    key = "|".join([*VOCAB_ENTITIES, *sorted(VOCAB_AMBIGUOUS), "v1"])
    return hashlib.md5(key.encode()).hexdigest()[:8]


def vocab_fixture(cache_dir: str | None = None) -> str:
    """Write the deterministic vocab dictionary/KB/sameas/gazetteer
    Parquet (idempotent cache; atomic publish so concurrent callers
    never read partial files; cache dir is keyed by a hash of the vocab
    constants so stale caches from older code can't poison runs).
    Returns the directory."""
    import os
    import tempfile

    if cache_dir is None:
        cache_dir = f"/tmp/reden_vocab_fixture_{_vocab_version()}"
    final = Path(cache_dir)
    if (final / "_complete").exists():
        return str(final)
    # Build in a temp dir, then atomically rename into place.
    tmp = Path(tempfile.mkdtemp(prefix="reden_vocab_", dir=str(final.parent)))
    out = tmp
    marker = out / "_complete"
    out.mkdir(parents=True, exist_ok=True)

    dico_rows, kb_rows, sameas_rows = [], [], []
    ents: list[tuple[str, str]] = []  # (word, uri)
    for i, word in enumerate(VOCAB_ENTITIES):
        n_ent = 2 if word in VOCAB_AMBIGUOUS else 1
        for v in range(n_ent):
            uri = f"{KB}/word/{word}{'' if v == 0 else '-alt'}"
            ents.append((word, uri))
            cluster = (i + v * 3) % 4
            hub = f"{KB}/wordhub/{cluster}"
            equiv = [f"http://dbp.example/w/{word}{v}"] if (i + v) % 2 == 0 else []
            dico_rows.append({
                "surface": word,
                "surface_norm": normalize_surface(word),
                "canonical_name": word.capitalize(),
                "entity_id": uri,
                "uris": [uri, *equiv],
                "ne_type": "TERM",
            })
            kb_rows.append({"subj": uri, "pred": PRED_MEMBER, "obj": hub,
                            "obj_is_literal": False, "weight": 1.0})
            kb_rows.append({"subj": uri, "pred": PRED_OCC, "obj": f"sense {word}/{v}",
                            "obj_is_literal": True, "weight": 1.0})
            for eq in equiv:
                sameas_rows.append({"uri": uri, "equiv_uri": eq})
    for (w1, u1), (w2, u2) in zip(ents, ents[1:]):
        kb_rows.append({"subj": u1, "pred": PRED_KNOWS, "obj": u2,
                        "obj_is_literal": False, "weight": 1.0})

    pq.write_table(pa.Table.from_pylist(dico_rows, schema=pa.schema({
        "surface": pa.string(), "surface_norm": pa.string(),
        "canonical_name": pa.string(), "entity_id": pa.string(),
        "uris": pa.list_(pa.string()), "ne_type": pa.string()})),
        out / "dictionary.parquet")
    pq.write_table(pa.Table.from_pylist(kb_rows, schema=pa.schema({
        "subj": pa.string(), "pred": pa.string(), "obj": pa.string(),
        "obj_is_literal": pa.bool_(), "weight": pa.float64()})),
        out / "kb_triples.parquet")
    pq.write_table(pa.Table.from_pylist(
        sameas_rows or [{"uri": "none", "equiv_uri": "none"}],
        schema=pa.schema({"uri": pa.string(), "equiv_uri": pa.string()})),
        out / "sameas.parquet")
    pq.write_table(pa.Table.from_pylist(
        [{"surface": w, "ne_type": "TERM"} for w in GAZETTEER_WORDS],
        schema=pa.schema({"surface": pa.string(), "ne_type": pa.string()})),
        out / "gazetteer.parquet")
    marker.write_text("ok")
    try:
        os.rename(tmp, final)  # atomic publish; loser keeps its copy
    except OSError:
        import shutil

        if (final / "_complete").exists():  # another writer won the race
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            raise
    return str(final)


def nel_pipeline_over_documents(sf_dir: str):
    """Full NEL pipeline (extract -> NER -> candidates -> link) over
    pages derived from the documents table. Returns the NELPipeline and
    the pages Dataset."""
    from .nel import NELPipeline

    fx = vocab_fixture()
    p = NELPipeline(fx)
    pages = pages_from_documents(sf_dir)
    return p, pages


def duplicated_documents(sf_dir: str, shift: int = 100_000):
    """documents ∪ id-shifted copy -> known exact-duplicate clusters."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def shifted(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"doc_id": pc.add(t["doc_id"], shift), "text": t["text"]})

    return ds.union(ds.map_batches(shifted, batch_format="pyarrow"))


def planted_near_dup_documents(sf_dir: str, shift: int = 100_000, near: bool = True):
    """Deterministic PLANTED near-dup corpus derived from documents.

    Every doc's base text is B(doc) = the 24 four-hex-char tokens of
    blake2b-48(text) — injective in ``text``, token-random across
    distinct texts (pairwise shingle/ngram Jaccard 0, no accidental
    simhash collisions). The corpus is B(doc) plus an id-shifted copy:

    * ``near=True``  -> copy = B + " zq" (char-5-shingle J ≈ 0.97,
      word-3-gram J ≈ 0.96): a known NEAR-duplicate of its base.
    * ``near=False`` -> copy = B byte-identical: a known EXACT dup.

    Either way the gold clusters are exactly the groups of equal
    ORIGINAL text — SQL-recomputable (PLANTED_CLUSTERS_SQL) without
    re-deriving B, which makes threshold-based near-dup operators
    hash-verifiable against a DuckDB oracle.
    """
    import hashlib

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def planted(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        bases = []
        for txt in t["text"].to_pylist():
            h = hashlib.blake2b(txt.encode("utf-8"), digest_size=48).hexdigest()
            bases.append(" ".join(h[i : i + 4] for i in range(0, 96, 4)))
        copies = [b + " zq" for b in bases] if near else bases
        return pa.table({
            "doc_id": pa.array([*ids, *(i + shift for i in ids)], pa.int64()),
            "text": pa.array([*bases, *copies], pa.string()),
        })

    return ds.map_batches(planted, batch_format="pyarrow")


PLANTED_CLUSTERS_SQL = """
WITH o AS (SELECT doc_id, text FROM documents),
u AS (SELECT doc_id, text FROM o UNION ALL SELECT doc_id + 100000, text FROM o),
g AS (SELECT text, MIN(doc_id) AS cluster FROM u GROUP BY text)
SELECT u.doc_id, g.cluster FROM u JOIN g USING (text)
"""


def duplicated_embeddings(sf_dir: str, shift: int = 100_000):
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def shifted(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"vec_id": pc.add(t["vec_id"], shift),
                         "embedding": t["embedding"]})

    return ds.union(ds.map_batches(shifted, batch_format="pyarrow"))
