"""JSONL + WARC/WET page sources (sources/webpages.py)."""

import gzip
import json

import pytest

from reden_ray.sources.webpages import pages_from_jsonl, pages_from_warc
from reden_ray.stages.extract import extract_pages


def _jsonl(path, rows):
    with open(path, "w", encoding="utf-8") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


class TestJsonl:
    def test_text_only_corpus_round_trips(self, tmp_path):
        p = tmp_path / "docs.jsonl"
        _jsonl(p, [
            {"url": "https://a.example/1", "text": "alpha beta gamma",
             "warc_ts": "2017-03-06T04:02:06Z", "lang": "en"},
            {"url": "https://a.example/2", "text": "delta epsilon"},
            {"text": "no url: dropped"},
        ])
        ds = pages_from_jsonl(str(p))
        out = extract_pages(ds).to_pandas().sort_values("url")
        assert list(out["url"]) == ["https://a.example/1", "https://a.example/2"]
        # frozen text_to_html wrap -> extraction is byte-identical
        assert list(out["text"]) == ["alpha beta gamma", "delta epsilon"]
        assert out["extract_error"].isna().all()
        ts = ds.to_pandas().set_index("url")["warc_ts"]
        assert ts["https://a.example/1"].isoformat().startswith("2017-03-06T04:02:06")

    def test_column_map_and_html_field(self, tmp_path):
        from reden_ray.functions.text import text_to_html

        p = tmp_path / "dump.jsonl"
        _jsonl(p, [
            {"uri": "https://b.example/x", "content": text_to_html("hello world").decode("utf-8"),
             "timestamp": 1488772926000},
        ])
        ds = pages_from_jsonl(str(p), column_map={
            "uri": "url", "content": "html", "timestamp": "warc_ts"})
        out = extract_pages(ds).to_pandas()
        assert list(out["url"]) == ["https://b.example/x"]
        assert list(out["text"]) == ["hello world"]


def _warc_record(rtype, url, date, payload: bytes) -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rtype}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\n"
        f"Content-Length: {len(payload)}\r\n"
    ).encode()
    return head + b"\r\n" + payload + b"\r\n\r\n"


def _tiny_warc() -> bytes:
    from reden_ray.functions.text import text_to_html

    html1 = text_to_html("first page words")
    http1 = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html1
    info = b"software: test\r\n"
    recs = [
        # warcinfo: skipped (and has no target URI)
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: "
        + str(len(info)).encode() + b"\r\n\r\n" + info + b"\r\n\r\n",
        _warc_record("response", "https://w.example/1",
                     "2017-03-06T04:02:06Z", http1),
        _warc_record("request", "https://w.example/1",
                     "2017-03-06T04:02:06Z", b"GET / HTTP/1.1\r\n"),
        _warc_record("conversion", "https://w.example/2",
                     "2018-01-02T03:04:05Z", "wet text body".encode()),
    ]
    return b"".join(recs)


class TestWarc:
    @pytest.mark.parametrize("gz", [False, True])
    def test_response_and_conversion_records(self, tmp_path, gz):
        data = _tiny_warc()
        f = tmp_path / ("crawl.warc" + (".gz" if gz else ""))
        f.write_bytes(gzip.compress(data) if gz else data)
        out = (extract_pages(pages_from_warc(str(f)))
               .to_pandas().sort_values("url"))
        assert list(out["url"]) == ["https://w.example/1", "https://w.example/2"]
        assert list(out["text"]) == ["first page words", "wet text body"]
        assert out["extract_error"].isna().all()

    def test_pipeline_consumes_warc_pages(self, tmp_path):
        """WARC-derived pages flow the real NEL pipeline unchanged."""
        from reden_ray.pipelines.nel import NELPipeline
        from reden_ray.pipelines.webdemo import vocab_fixture

        recs = _tiny_warc() + _warc_record(
            "conversion", "https://w.example/3", "2018-01-02T03:04:06Z",
            b"spark joins the table after a window")
        f = tmp_path / "crawl.warc"
        f.write_bytes(recs)
        p = NELPipeline(vocab_fixture())
        links = p.links(mentions_ds=p.mentions(
            p.texts(pages_from_warc(str(f))))).to_pandas()
        hit = links[links["url"] == "https://w.example/3"]
        assert len(hit) > 0  # vocab words in the WARC page got linked
        assert {"url", "mention_id", "surface", "uri"} <= set(links.columns)
