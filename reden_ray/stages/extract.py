"""HTML→text extraction stage (S1/S2 analog).

The reference DOM-parses TEI files and selects XPath context windows
(src/fr/lip6/reden/MainNELApp.java:183-231). Our corpus is a Parquet
``pages`` table (url, warc_ts, html, text, lang); the context window
defaults to the whole page (the reference's ``xpathExpresion=//body``
configuration, config/config-places-dbpedia.properties:63), with
``split_contexts`` providing the sub-page window analog of
``//body/div`` (``NELConfig.context_words``).

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


def latest_page_per_url(pages_ds, num_buckets: int = 64,
                        broadcast_row_limit: int = 2_000_000,
                        num_partitions: int = 8):
    """Re-crawl collapse: keep the newest (max warc_ts) row per url.

    Duplicate urls would otherwise merge two pages' mentions into one
    linking context with colliding mention_ids — run BEFORE extraction
    when the corpus may contain re-crawls.

    Page rows carry the fat ``html`` payload, so this stage never moves
    them through a pandas exchange (the earlier design shuffled full
    page rows as pandas blocks — measured ~3x serialization inflation
    on the fattest rows in the system). Instead:

    1. keys-only winner reduction: project ``(url, warc_ts)`` in Arrow,
       per-batch combiner (max ts per url + row count at that max for
       tie detection), ONE narrow Arrow hash-bucket shuffle ->
       ``winners (url, warc_ts, n_at_max)``, materialized (one narrow
       row per distinct url).
    2. attach winners back, size-gated like every broadcast in this
       repo: winners under ``broadcast_row_limit`` -> ``ray.put`` one
       url->max_ts map and FILTER pages per batch (zero page-row
       movement); above it -> ``left_semi`` Dataset.join on
       ``(url, warc_ts)`` — pages cross one hash exchange as Arrow
       blocks, never pandas.
    3. urls with SEVERAL rows at the max ts (degenerate corpora) are
       collapsed exactly through a side branch: only the rows AT the
       max ts are selected (older re-crawls never enter it), bucketed
       by url hash and tie-broken per bucket with a deterministic
       column-NAME-ordered whole-row sort (independent of the table's
       physical column order). The tie set is checked, not assumed,
       and is empty on normal corpora (ts ties step 2 would otherwise
       keep twice).
    """
    import pandas as pd
    import pyarrow.compute as pc

    from ..functions.bucket import add_bucket

    def combine(t: pa.Table) -> pa.Table:
        # narrow 2-column pandas view of the Arrow batch; the OUTPUT
        # (what the shuffle moves) is Arrow
        df = t.select(["url", "warc_ts"]).to_pandas()
        mx = df.groupby("url", sort=False)["warc_ts"].max()
        at_max = df[df["warc_ts"].to_numpy() == mx.reindex(df["url"]).to_numpy()]
        cnt = at_max.groupby("url", sort=False).size()
        out = pa.table({
            "url": pa.array(mx.index.to_numpy(), pa.string()),
            "warc_ts": pa.array(mx.to_numpy(), t.schema.field("warc_ts").type),
            "n_at_max": pa.array(cnt.reindex(mx.index).to_numpy(), pa.int64()),
        })
        return add_bucket(out, "url", num_buckets)

    def reduce_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # merge partials: global max per url; tie counts sum only at it
        mx = df.groupby("url", sort=False)["warc_ts"].transform("max")
        at = df[df["warc_ts"].to_numpy() == mx.to_numpy()]
        return at.groupby("url", as_index=False).agg(
            warc_ts=("warc_ts", "first"), n_at_max=("n_at_max", "sum"))

    winners = (
        pages_ds.map_batches(combine, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
        .materialize()
    )
    n_tied = winners.map_batches(
        lambda t: t.filter(pc.greater(t["n_at_max"], 1)),
        batch_format="pyarrow").count()

    def collapse_tiny(df: pd.DataFrame) -> pd.DataFrame:
        # deterministic tie-break among rows sharing (url, max ts):
        # sort by NAME-ordered columns (never the table's physical
        # column order — a pages file laid out (url, html, warc_ts)
        # must collapse identically to (url, warc_ts, html)), keep the
        # last row per url. Input rows are already max-ts only.
        if df.empty:
            return df
        df = df.drop(columns="__bucket", errors="ignore")
        cols = ["url", "warc_ts"] + sorted(
            c for c in df.columns if c not in ("url", "warc_ts"))
        df = df.sort_values(cols, kind="stable")
        return df.drop_duplicates("url", keep="last")

    def collapse_tied(tied_pages_ds):
        # distribute the content tie-break: url-hash bucket shuffle of
        # the (already max-ts-only) tied rows, collapse per bucket —
        # never a repartition(1) funnel of fat page rows to one worker
        return (tied_pages_ds.map_batches(
            lambda t: add_bucket(t, "url", num_buckets),
            batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(collapse_tiny, batch_format="pandas"))

    if winners.count() <= broadcast_row_limit:
        import ray

        w = winners.to_pandas()
        tied_urls = frozenset(w.loc[w["n_at_max"] > 1, "url"])
        # pandas Series keyed by url (ALL urls — tied urls' max ts is
        # needed to exclude their older re-crawls from the tie branch)
        ref = ray.put((pd.Series(w["warc_ts"].to_numpy(), index=w["url"]),
                       tied_urls))

        def make_filter(keep_tied: bool):
            def filt(t: pa.Table) -> pa.Table:
                from ..state.broadcast import get_broadcast

                ts_of, tied = get_broadcast(ref)
                urls = pd.Series(t.column("url").to_numpy(zero_copy_only=False))
                want = ts_of.reindex(urls).to_numpy()
                ts = t.column("warc_ts").to_pandas().to_numpy()
                at_max = pd.notna(want) & (want == ts)
                is_tied = urls.isin(tied).to_numpy()
                mask = (at_max & is_tied) if keep_tied else (at_max & ~is_tied)
                return t.filter(pa.array(mask))

            return filt

        out = pages_ds.map_batches(make_filter(False), batch_format="pyarrow")
        if n_tied:
            tied_pages = pages_ds.map_batches(make_filter(True),
                                              batch_format="pyarrow")
            out = out.union(collapse_tied(tied_pages))
        return out

    # scale path: winners too big to broadcast — semi-join them back
    def _winner_rows(tied: bool):
        def f(t: pa.Table) -> pa.Table:
            m = (pc.greater(t["n_at_max"], 1) if tied
                 else pc.equal(t["n_at_max"], 1))
            return t.filter(m).select(["url", "warc_ts"])

        return f

    from ..functions.blocks import pin_nonempty

    untied = pin_nonempty(winners.map_batches(
        _winner_rows(False), batch_format="pyarrow"
    ).repartition(num_partitions))
    # Ray joins can't take a fully-empty side; untied is empty iff
    # EVERY url is tied (or the corpus is empty — then n_tied is 0 and
    # the empty pages_ds itself is the right answer)
    out = (pages_ds.join(untied, join_type="left_semi",
                         num_partitions=num_partitions, on=("url", "warc_ts"))
           if untied.count() else None)
    if n_tied:
        tied = pin_nonempty(winners.map_batches(
            _winner_rows(True), batch_format="pyarrow"
        ).repartition(num_partitions))
        # semi-join on (url, warc_ts): only the rows AT a tied url's
        # max ts enter the tie branch — older re-crawls never move
        tied_pages = pages_ds.join(tied, join_type="left_semi",
                                   num_partitions=num_partitions,
                                   on=("url", "warc_ts"))
        fixed = collapse_tied(tied_pages)
        out = fixed if out is None else out.union(fixed)
    return pages_ds if out is None else out


# Context-key separator: U+001F (unit separator) is not a valid URL
# character, so minted context keys can never collide with page urls.
CTX_SEP = "\x1f"


def split_contexts(texts_ds, context_words: int, sep: str = CTX_SEP):
    """S2 sub-page context windows (reference ``xpathExpresion`` knob,
    MainNELApp.java:222-231 — ``//body/div`` yields per-division linking
    contexts instead of whole documents; config-authors-bnf.properties:62-66).

    Our pages are flat extracted text, so the deterministic analog is a
    window of ``context_words`` whitespace-separated words:
    ``text.split(" ")`` chunked to K words, re-joined with single
    spaces. ``K >= len(words)`` degenerates to EXACTLY the whole-page
    context (split/join round-trips the text), which is the ``//body``
    configuration.

    Emits one row per (url, ctx): the ``url`` column carries the minted
    context key ``url + CTX_SEP + ctx_id`` so the ENTIRE downstream
    NER -> candidates -> fusion-graph -> argmax machinery becomes
    context-granular untouched (it keys everything on ``url``); other
    columns are replicated. Split the key back with
    ``split_context_key`` after linking.

    Caveat (shared with any structural split): a multi-token mention
    straddling a window boundary is not matched — same as a mention
    crossing two divs in the reference's DOM split.
    """

    def split(t: pa.Table) -> pa.Table:
        other_names = [n for n in t.column_names if n not in ("url", "text")]
        urls_in = t.column("url").to_pylist()
        texts_in = t.column("text").to_pylist()
        keys, texts_out, idx = [], [], []
        for i, (url, text) in enumerate(zip(urls_in, texts_in)):
            words = text.split(" ")
            n_ctx = max(1, -(-len(words) // context_words))
            for c in range(n_ctx):
                keys.append(f"{url}{sep}{c}")
                texts_out.append(
                    " ".join(words[c * context_words:(c + 1) * context_words]))
                idx.append(i)
        cols = {
            "url": pa.array(keys, pa.string()),
            "text": pa.array(texts_out, pa.large_string()),
        }
        take = pa.array(idx, pa.int64())
        for name in other_names:
            cols[name] = t.column(name).take(take)
        return pa.table(cols)

    return texts_ds.map_batches(split, batch_format="pyarrow")


def split_context_key(ds, sep: str = CTX_SEP, key_col: str = "url"):
    """Replace the minted context key column with the page url and an
    int64 ``ctx_id`` column (vectorized Arrow split)."""
    import pyarrow.compute as pc

    def unmap(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t.column(key_col), sep, max_splits=1)
        url = pc.list_element(parts, 0)
        ctx = pc.cast(pc.list_element(parts, 1), pa.int64())
        i = t.column_names.index(key_col)
        t = t.set_column(i, key_col, url)
        return t.append_column("ctx_id", ctx)

    return ds.map_batches(unmap, batch_format="pyarrow")


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
