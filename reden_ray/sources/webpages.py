"""Web-native page sources: JSONL dumps and WARC/WET crawl archives.

The pipeline's canonical page schema is the fixture contract
``(url string, warc_ts timestamp[ms], html binary, text large_string,
lang string)`` (reden_ray/fixtures.py). A Common-Crawl-style user holds
pages as JSONL (one object per line) or WARC/WET archives instead of
Parquet; these readers normalize both onto that schema so every
downstream stage (extract -> NER -> link) runs unchanged.

Scale notes:
* JSONL rides ``ray.data.read_json`` — streaming, file-parallel, the
  normalize step is a stateless Arrow map.
* WARC rides ``ray.data.read_binary_files`` (one task per archive —
  the Common Crawl layout of many ~1 GiB files parallelizes naturally)
  with a pure-Python WARC/1.0 record walker per file; gzip archives are
  detected by magic bytes. Record payloads never leave the task as
  anything wider than the page rows themselves.
* Text-only inputs (WET conversion records, JSONL with a ``text``
  field but no html) are wrapped with the repo's frozen
  ``text_to_html`` so extraction stays byte-identical end-to-end
  (extract(html_to_text(text_to_html(t))) == t — the round-trip
  invariant pinned by tests/test_properties.py).

Reference: the corpus reader surface S1 (SURVEY §2; the reference reads
TEI XML — sources/tei.py — this module is the web-corpus analog).
"""

from __future__ import annotations

import gzip
from datetime import datetime, timezone

import pyarrow as pa

import ray.data as rd

from ..functions.text import text_to_html

PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("ms")),
    ("html", pa.binary()),
    ("text", pa.large_string()),
    ("lang", pa.string()),
])

_EPOCH_MS0 = datetime(1970, 1, 1, tzinfo=timezone.utc)


def _iso_to_ms(s: str | None) -> int:
    """WARC-Date (ISO-8601, e.g. 2017-03-06T04:02:06Z) -> epoch ms."""
    if not s:
        return 0
    try:
        dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return int((dt - _EPOCH_MS0).total_seconds() * 1000)
    except ValueError:
        return 0


def _rows_table(rows: list[dict]) -> pa.Table:
    return pa.table({
        "url": pa.array([r["url"] for r in rows], pa.string()),
        "warc_ts": pa.array([r["warc_ts"] for r in rows],
                            pa.timestamp("ms")),
        "html": pa.array([r["html"] for r in rows], pa.binary()),
        "text": pa.array([r["text"] for r in rows], pa.large_string()),
        "lang": pa.array([r.get("lang", "") for r in rows], pa.string()),
    })


# ---------------------------------------------------------------------------
# JSONL
# ---------------------------------------------------------------------------


def pages_from_jsonl(path: str, column_map: dict[str, str] | None = None):
    """JSONL corpus -> pages Dataset on the canonical schema.

    ``column_map`` renames source fields to the canonical ones, e.g.
    ``{"uri": "url", "content": "html", "timestamp": "warc_ts"}``.
    Rules per record: ``url`` required (rows without one are dropped);
    ``html`` taken as utf-8 bytes when present, else synthesized from
    ``text`` via the frozen ``text_to_html`` (so extraction reproduces
    the text byte-identically); ``warc_ts`` accepts ISO-8601 strings or
    epoch milliseconds, defaulting to 0; ``lang`` defaults to ''.
    """
    colmap = column_map or {}

    def normalize(t: pa.Table) -> pa.Table:
        names = {colmap.get(n, n): n for n in t.column_names}

        def col(name):
            src = names.get(name)
            return t.column(src).to_pylist() if src else [None] * t.num_rows

        urls, tss = col("url"), col("warc_ts")
        htmls, texts, langs = col("html"), col("text"), col("lang")
        rows = []
        for u, ts, h, x, lg in zip(urls, tss, htmls, texts, langs):
            if not u:
                continue
            if isinstance(ts, str):
                ts_ms = _iso_to_ms(ts)
            elif isinstance(ts, datetime):
                # Arrow's JSON reader eagerly types ISO-8601 strings as
                # timestamps; to_pylist then yields datetimes
                tz = ts if ts.tzinfo else ts.replace(tzinfo=timezone.utc)
                ts_ms = int((tz - _EPOCH_MS0).total_seconds() * 1000)
            elif isinstance(ts, (int, float)):
                ts_ms = int(ts)
            else:
                ts_ms = 0
            if h is not None:
                hb = h if isinstance(h, (bytes, bytearray)) else str(h).encode("utf-8")
                tx = ""
            else:
                hb = text_to_html(x or "")
                tx = x or ""
            rows.append({"url": str(u), "warc_ts": ts_ms, "html": bytes(hb),
                         "text": tx, "lang": lg or ""})
        return _rows_table(rows)

    return rd.read_json(path).map_batches(normalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# WARC / WET
# ---------------------------------------------------------------------------


def _warc_records(data: bytes):
    """Walk WARC/1.0 records: yields (headers dict lowercased, payload
    bytes). Handles exact Content-Length framing and the \\r\\n\\r\\n
    record separators; tolerant of a missing trailing separator."""
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            return
        head = data[pos:head_end].decode("utf-8", errors="replace")
        lines = head.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            return
        hdrs: dict[str, str] = {}
        for line in lines[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                hdrs[k.strip().lower()] = v.strip()
        try:
            length = int(hdrs.get("content-length", "0"))
        except ValueError:
            length = 0
        body_start = head_end + 4
        payload = data[body_start:body_start + length]
        yield hdrs, payload
        pos = body_start + length


def _strip_http_headers(payload: bytes) -> bytes:
    """WARC response payloads embed the HTTP response; the html body
    starts after the header block."""
    if payload[:5] in (b"HTTP/", b"http/"):
        sep = payload.find(b"\r\n\r\n")
        if sep >= 0:
            return payload[sep + 4:]
    return payload


def pages_from_warc(path: str):
    """WARC / WET archive(s) -> pages Dataset on the canonical schema.

    ``response`` records contribute their HTML body (HTTP headers
    stripped) as ``html``; ``conversion`` records (WET extracted text)
    contribute their utf-8 payload wrapped via the frozen
    ``text_to_html``. Gzip archives are detected by magic bytes. Other
    record types (warcinfo, request, metadata) are skipped.
    """

    def parse_file(t: pa.Table) -> pa.Table:
        rows = []
        for raw in t.column("bytes").to_pylist():
            data = gzip.decompress(raw) if raw[:2] == b"\x1f\x8b" else raw
            for hdrs, payload in _warc_records(data):
                rtype = hdrs.get("warc-type", "")
                url = hdrs.get("warc-target-uri", "")
                if not url or rtype not in ("response", "conversion"):
                    continue
                ts_ms = _iso_to_ms(hdrs.get("warc-date"))
                if rtype == "response":
                    hb = _strip_http_headers(payload)
                    tx = ""
                else:
                    tx = payload.decode("utf-8", errors="replace")
                    hb = text_to_html(tx)
                rows.append({"url": url, "warc_ts": ts_ms, "html": hb,
                             "text": tx, "lang": ""})
        return _rows_table(rows)

    return rd.read_binary_files(path).map_batches(
        parse_file, batch_format="pyarrow")
