"""HTML→text extraction stage (S1/S2 analog).

The reference DOM-parses TEI files and selects XPath context windows
(src/fr/lip6/reden/MainNELApp.java:183-231). Our corpus is a Parquet
``pages`` table (url, warc_ts, html, text, lang); the context window is
the whole page (the reference's ``xpathExpresion=//body`` configuration,
config/config-places-dbpedia.properties:63).

``extract_text`` is a stateless ``map_batches`` transform over Arrow
batches producing the frozen, deterministic extraction whose output must
be byte-identical per url. The wide ``html`` binary column is DROPPED
here (select-after-extract) so every downstream exchange moves narrow
rows only.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.text import html_to_text


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """(url, warc_ts, html, lang) -> (url, warc_ts, text, lang, extract_error).

    Per-row regex extraction over the binary payload (compiled patterns
    are module-level constants — no per-batch setup); the html column is
    dropped from the output so shuffles never move page payloads.

    Poison-row quarantine (SURVEY §4.1): a row whose payload cannot be
    extracted (null, wrong type, pathological input) gets text="" and a
    non-null ``extract_error`` instead of killing the task or being
    silently swallowed (the reference printStackTrace-and-continues,
    e.g. MainNELApp.java:362-372). Split the side output with
    ``quarantine``.
    """
    texts, errors = [], []
    for h in batch.column("html").to_pylist():
        try:
            if h is None:
                raise ValueError("null html payload")
            texts.append(html_to_text(h))
            errors.append(None)
        except Exception as exc:  # noqa: BLE001 — quarantine, don't crash
            texts.append("")
            errors.append(f"{type(exc).__name__}: {exc}"[:200])
    cols, names = [], []
    for name in batch.column_names:
        if name in ("html", "text"):
            continue
        cols.append(batch.column(name))
        names.append(name)
    cols.append(pa.array(texts, pa.large_string()))
    names.append("text")
    cols.append(pa.array(errors, pa.string()))
    names.append("extract_error")
    return pa.Table.from_arrays(cols, names=names)


def latest_page_per_url(pages_ds, num_buckets: int = 64):
    """Re-crawl collapse: keep the newest (max warc_ts) row per url.

    Duplicate urls would otherwise merge two pages' mentions into one
    linking context with colliding mention_ids. Hash-bucketed on url
    (combiner per batch, vectorized per-bucket max) — run BEFORE
    extraction when the corpus may contain re-crawls.
    """
    import pandas as pd

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        # per-batch combiner: newest row per url within the batch
        i = df.groupby("url")["warc_ts"].idxmax()
        out = df.loc[i].copy()
        out["__bucket"] = (
            pd.util.hash_pandas_object(out["url"], index=False) % num_buckets
        ).astype("int64")
        return out

    def newest(df: pd.DataFrame) -> pd.DataFrame:
        i = df.groupby("url")["warc_ts"].idxmax()
        return df.loc[i].drop(columns=["__bucket"])

    bucketed = pages_ds.map_batches(combine, batch_format="pandas")
    return bucketed.groupby("__bucket").map_groups(newest, batch_format="pandas")


def quarantine(extracted_ds):
    """Split the extracted Dataset into (ok, poison) Datasets."""
    import pyarrow.compute as pc

    ok = extracted_ds.map_batches(
        lambda t: t.filter(pc.is_null(t["extract_error"])).drop_columns(["extract_error"]),
        batch_format="pyarrow",
    )
    poison = extracted_ds.map_batches(
        lambda t: t.filter(pc.is_valid(t["extract_error"])),
        batch_format="pyarrow",
    )
    return ok, poison


def extract_pages(pages_ds, batch_size: int = 256):
    """pages Dataset -> (url, warc_ts, lang, text) Dataset.

    ``batch_size`` is deliberately small: rows carry a wide binary html
    payload, so batch_size × html_size must fit a worker heap (128 MiB
    blocks ÷ ~0.5 MiB pages ≈ 256).
    """
    return pages_ds.map_batches(
        extract_text_batch, batch_format="pyarrow", batch_size=batch_size
    )
