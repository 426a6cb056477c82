"""TEI-XML / N3 ingestion: the reference's native input formats.

The reference DOM-parses annotated TEI corpora and selects XPath
context windows (src/fr/lip6/reden/MainNELApp.java:183-231), and loads
RDF models from cached N3 files (GraphHandlerNEL.java:351-384). The
north rule retargets this engine's input to Parquet web pages, so these
converters are thin adapters: they turn a TEI file into the standard
``pages`` table (one page per ``//body/div`` context — the reference's
default linking granularity) and an N3 file into the ``kb_triples``
table, letting the engine run against the reference's own committed
corpora (e.g. input/thibaudet_reflexions-mini.xml) for qualitative
parity.

TEI gold annotations (``persName``/``placeName`` elements carrying
``ref`` URIs) also convert to (a) a gold-links table and (b) a derived
dictionary/gazetteer fixture, so a pre-annotated corpus is end-to-end
linkable without external KB downloads (the container has no network).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from pathlib import Path

import pyarrow as pa

from ..functions.text import html_to_text, normalize_surface

_EPOCH_MS = 1_700_000_000_000

_MENTION_TAGS = ("persName", "placeName")
_NE_OF_TAG = {"persName": "PER", "placeName": "LOC"}


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _body_divs(root: ET.Element) -> list[ET.Element]:
    """//body/div — the reference's default context windows; a body
    without divs yields the body itself (the //body configuration)."""
    body = next((el for el in root.iter() if _localname(el.tag) == "body"), None)
    if body is None:
        return []
    divs = [el for el in body if _localname(el.tag) == "div"]
    return divs or [body]


def _doc_url(root: ET.Element, path: str) -> str:
    for el in root.iter():
        if _localname(el.tag) == "idno" and (el.text or "").startswith("http"):
            return el.text.strip()
    return f"file://{Path(path).resolve()}"


def tei_to_pages(path: str, lang: str = "fr") -> pa.Table:
    """TEI file -> pages table (url, warc_ts, html, text, lang): one
    page per //body/div context, url = <doc idno>#div<i>. ``html``
    carries the div's serialized XML; ``text`` is the frozen
    ``html_to_text`` extraction of it, so the byte-identity invariant
    (extract(html) == text) holds by construction."""
    root = ET.parse(path).getroot()
    base = _doc_url(root, path)
    urls, tss, htmls, texts = [], [], [], []
    for i, div in enumerate(_body_divs(root)):
        xml = ET.tostring(div, encoding="unicode")
        urls.append(f"{base}#div{i}")
        tss.append(_EPOCH_MS + i)
        htmls.append(xml.encode("utf-8"))
        texts.append(html_to_text(xml))
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("ms")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.large_string()),
        "lang": pa.array([lang] * len(urls), pa.string()),
    })


def tei_mentions(path: str, tags: tuple[str, ...] = ("persName",),
                 exclude_character: bool = True) -> pa.Table:
    """Tag-driven mention extraction from an annotated TEI file — the
    reference's S3 on its native input (MainNELApp.java:233-258 selects
    ``.//persName[not(@type='character')]`` per context window). Returns
    the standard mentions table (url, mention_id, surface, surface_norm,
    ne_type) with one url per //body/div (same urls as
    ``tei_to_pages``), mention_id = document order within the div, and
    surface = whitespace-collapsed text content of the annotation
    element. ``ref``/``ref_auto`` attributes, when present, ride along
    as nullable columns (gold / system URI) so the same reader serves
    input, gold, and -outV3 files."""
    root = ET.parse(path).getroot()
    base = _doc_url(root, path)
    urls, mids, surfs, norms, nes, refs, autos = [], [], [], [], [], [], []
    for i, div in enumerate(_body_divs(root)):
        mid = 0
        for el in div.iter():
            name = _localname(el.tag)
            if name not in tags:
                continue
            if exclude_character and el.get("type") == "character":
                continue
            surface = " ".join("".join(el.itertext()).split())
            urls.append(f"{base}#div{i}")
            mids.append(mid)
            surfs.append(surface)
            norms.append(normalize_surface(surface))
            nes.append(_NE_OF_TAG.get(name, "PER"))
            refs.append(el.get("ref"))
            autos.append(el.get("ref_auto"))
            mid += 1
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "mention_id": pa.array(mids, pa.int64()),
        "surface": pa.array(surfs, pa.string()),
        "surface_norm": pa.array(norms, pa.string()),
        "ne_type": pa.array(nes, pa.string()),
        "ref": pa.array(refs, pa.string()),
        "ref_auto": pa.array(autos, pa.string()),
    })


def tei_gold_links(path: str) -> pa.Table:
    """TEI gold annotations -> (url, surface, ne_type, ref) rows in
    document order: every persName/placeName with a ref URI, keyed by
    the same per-div page urls ``tei_to_pages`` mints."""
    root = ET.parse(path).getroot()
    base = _doc_url(root, path)
    urls, surfs, nes, refs = [], [], [], []
    for i, div in enumerate(_body_divs(root)):
        for el in div.iter():
            name = _localname(el.tag)
            if name in _MENTION_TAGS and el.get("ref"):
                surface = " ".join("".join(el.itertext()).split())
                if not surface:
                    continue
                urls.append(f"{base}#div{i}")
                surfs.append(surface)
                nes.append(_NE_OF_TAG[name])
                refs.append(el.get("ref"))
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "surface": pa.array(surfs, pa.string()),
        "ne_type": pa.array(nes, pa.string()),
        "ref": pa.array(refs, pa.string()),
    })


def tei_fixture_from_gold(tei_path: str, out_dir: str,
                          kb_triples: pa.Table | None = None) -> str:
    """Derive a linkable fixture (dictionary/gazetteer/kb_triples/
    sameas parquet) from a TEI file's own gold annotations: one
    dictionary row per distinct (surface, ref), a minimal KB
    neighborhood per ref unless ``kb_triples`` (e.g. from
    ``n3_to_kb_triples``) provides the real one. Returns ``out_dir``."""
    import pyarrow.parquet as pq

    gold = tei_gold_links(tei_path)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    pairs = sorted({(s, n, r) for s, n, r in zip(
        gold["surface"].to_pylist(), gold["ne_type"].to_pylist(),
        gold["ref"].to_pylist())})
    dico = [{
        "surface": s,
        "surface_norm": normalize_surface(s),
        "canonical_name": s,
        "entity_id": r,
        "uris": [r],
        "ne_type": n,
    } for s, n, r in pairs]
    pq.write_table(pa.Table.from_pylist(dico, schema=pa.schema({
        "surface": pa.string(), "surface_norm": pa.string(),
        "canonical_name": pa.string(), "entity_id": pa.string(),
        "uris": pa.list_(pa.string()), "ne_type": pa.string()})),
        out / "dictionary.parquet")
    gaz = sorted({(s, n) for s, n, _ in pairs})
    pq.write_table(pa.Table.from_pylist(
        [{"surface": s, "ne_type": n} for s, n in gaz],
        schema=pa.schema({"surface": pa.string(), "ne_type": pa.string()})),
        out / "gazetteer.parquet")
    if kb_triples is None:
        refs = sorted({r for _s, _n, r in pairs})
        kb_triples = pa.Table.from_pylist([
            {"subj": r, "pred": "http://example.org/kb/member",
             "obj": "http://example.org/kb/hub", "obj_is_literal": False,
             "weight": 1.0}
            for r in refs
        ], schema=pa.schema({
            "subj": pa.string(), "pred": pa.string(), "obj": pa.string(),
            "obj_is_literal": pa.bool_(), "weight": pa.float64()}))
    pq.write_table(kb_triples, out / "kb_triples.parquet")
    pq.write_table(pa.Table.from_pylist(
        [{"uri": "none", "equiv_uri": "none"}],
        schema=pa.schema({"uri": pa.string(), "equiv_uri": pa.string()})),
        out / "sameas.parquet")
    return str(out)


# ---------------------------------------------------------------------------
# N3 / Turtle subset -> kb_triples
# ---------------------------------------------------------------------------

_N3_PREFIX_RE = re.compile(r"^@prefix\s+(\w*):\s*<([^>]*)>\s*\.\s*$")
_N3_TERM_RE = re.compile(
    r"""<(?P<iri>[^>]*)>            # <iri>
      | "(?P<lit>(?:[^"\\]|\\.)*)"(?:@[\w-]+|\^\^\S+)?   # "literal"
      | (?P<qn>\w*:[\w.-]*)         # prefix:local
      | (?P<rdfa>\ba\b)             # rdf:type shorthand (predicate)
    """,
    re.X,
)

_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
# N3/Turtle string escapes (\uXXXX, \UXXXXXXXX, and the named ECHAR
# set). NOT str.encode().decode('unicode_escape'): that round-trips the
# utf-8 bytes through latin-1 and mojibakes every non-ASCII literal.
_N3_ESCAPE_RE = re.compile(r"\\(u[0-9a-fA-F]{4}|U[0-9a-fA-F]{8}|.)")
_N3_ECHAR = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
             '"': '"', "'": "'", "\\": "\\"}


def _unescape_n3(s: str) -> str:
    def rep(m: re.Match) -> str:
        g = m.group(1)
        if g[0] in "uU" and len(g) > 1:
            return chr(int(g[1:], 16))
        return _N3_ECHAR.get(g, g)

    return _N3_ESCAPE_RE.sub(rep, s)


def n3_to_kb_triples(source: str, on_dropped: str = "warn") -> pa.Table:
    """Minimal N3/Turtle triple reader -> kb_triples table (subj, pred,
    obj, obj_is_literal, weight=1.0). Supports the subset the
    reference's cached KB dumps use: @prefix declarations, one
    ``s p o .`` statement per line, IRI / prefixed-name / plain or
    typed string literal terms, and the ``a`` rdf:type shorthand.
    ``source`` is a path or raw text.

    A statement that cannot be parsed (undeclared prefix, malformed
    term, wrong arity) is dropped as a WHOLE — a bad term never shifts
    later tokens into its position — and counted: ``on_dropped`` is
    "warn" (default: one warnings.warn with the count and first
    offender), "raise", or "ignore"."""
    text = (Path(source).read_text(encoding="utf-8")
            if "\n" not in source and Path(source).exists() else source)
    prefixes: dict[str, str] = {}
    rows = []
    dropped: list[str] = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        m = _N3_PREFIX_RE.match(line)
        if m:
            prefixes[m.group(1)] = m.group(2)
            continue
        if not line.endswith("."):
            if line:
                dropped.append(line)
            continue
        terms, lits, bad = [], [], False
        for t in _N3_TERM_RE.finditer(line[:-1]):
            if t.group("iri") is not None:
                terms.append(t.group("iri"))
                lits.append(False)
            elif t.group("lit") is not None:
                terms.append(_unescape_n3(t.group("lit")))
                lits.append(True)
            elif t.group("rdfa") is not None:
                if len(terms) != 1:  # 'a' is only valid as predicate
                    bad = True
                    break
                terms.append(_RDF_TYPE)
                lits.append(False)
            else:
                pfx, _, local = t.group("qn").partition(":")
                if pfx not in prefixes:
                    bad = True
                    break
                terms.append(prefixes[pfx] + local)
                lits.append(False)
            if len(terms) == 3:
                break
        if bad or len(terms) != 3:
            dropped.append(line)
            continue
        rows.append({"subj": terms[0], "pred": terms[1], "obj": terms[2],
                     "obj_is_literal": lits[2], "weight": 1.0})
    if dropped and on_dropped != "ignore":
        msg = (f"n3_to_kb_triples: dropped {len(dropped)} unparseable "
               f"statement(s); first: {dropped[0][:120]!r}")
        if on_dropped == "raise":
            raise ValueError(msg)
        import warnings

        warnings.warn(msg, stacklevel=2)
    return pa.Table.from_pylist(rows, schema=pa.schema({
        "subj": pa.string(), "pred": pa.string(), "obj": pa.string(),
        "obj_is_literal": pa.bool_(), "weight": pa.float64()}))
