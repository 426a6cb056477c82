"""TEI / N3 ingestion adapters, including a qualitative end-to-end run
against the reference's own committed thibaudet-mini corpus (skipped
when the reference checkout is absent)."""

import os

import pyarrow as pa
import pytest

import ray.data as rd

from reden_ray.sources.tei import (
    n3_to_kb_triples,
    tei_fixture_from_gold,
    tei_gold_links,
    tei_to_pages,
)

THIBAUDET = "/root/reference/input/thibaudet/thibaudet_reflexions-mini.xml"


class TestN3:
    def test_minimal_turtle_subset(self):
        src = """
@prefix dbo: <http://dbpedia.org/ontology/> .
# a comment
<http://kb/x> dbo:knows <http://kb/y> .
<http://kb/x> <http://www.w3.org/2000/01/rdf-schema#label> "X \\"quoted\\""@fr .
<http://kb/y> dbo:birthYear "1821"^^<http://www.w3.org/2001/XMLSchema#int> .
"""
        t = n3_to_kb_triples(src)
        rows = t.to_pylist()
        assert rows[0] == {"subj": "http://kb/x",
                           "pred": "http://dbpedia.org/ontology/knows",
                           "obj": "http://kb/y", "obj_is_literal": False,
                           "weight": 1.0}
        assert rows[1]["obj"] == 'X "quoted"' and rows[1]["obj_is_literal"]
        assert rows[2]["obj"] == "1821" and rows[2]["obj_is_literal"]

    def test_non_ascii_literals_not_mojibaked(self):
        """Accented text (the norm for this French-NEL engine's KB) must
        survive; \\uXXXX escapes must decode; no utf-8->latin-1 round
        trip."""
        t = n3_to_kb_triples(
            '<http://s> <http://p> "Émile café" .\n'
            '<http://s> <http://p> "caf\\u00e9 \\tx" .\n')
        objs = t.column("obj").to_pylist()
        assert objs == ["Émile café", "café \tx"]

    def test_rdf_type_shorthand(self):
        t = n3_to_kb_triples(
            "@prefix ex: <http://ex/> .\nex:s a ex:Person .\n")
        assert t.to_pylist() == [{
            "subj": "http://ex/s",
            "pred": "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            "obj": "http://ex/Person", "obj_is_literal": False,
            "weight": 1.0}]

    def test_undeclared_prefix_drops_whole_statement_with_warning(self):
        """A bad term must never shift later tokens into its position,
        and dropped statements must be surfaced, not silent."""
        src = ("@prefix ex: <http://ex/> .\n"
               'ex:s foaf:name "Jean" .\n'
               "ex:s ex:knows ex:o .\n")
        with pytest.warns(UserWarning, match="dropped 1"):
            t = n3_to_kb_triples(src)
        assert t.to_pylist() == [{
            "subj": "http://ex/s", "pred": "http://ex/knows",
            "obj": "http://ex/o", "obj_is_literal": False, "weight": 1.0}]
        with pytest.raises(ValueError, match="dropped 1"):
            n3_to_kb_triples(src, on_dropped="raise")
        t2 = n3_to_kb_triples(src, on_dropped="ignore")
        assert t2.num_rows == 1


@pytest.mark.skipif(not os.path.exists(THIBAUDET),
                    reason="reference checkout not present")
class TestThibaudetMini:
    def test_pages_extract_invariant(self):
        pages = tei_to_pages(THIBAUDET)
        assert pages.num_rows >= 1
        # byte-identity: re-extracting the html must give the stored text
        from reden_ray.functions.text import html_to_text

        for h, t in zip(pages["html"].to_pylist(), pages["text"].to_pylist()):
            assert html_to_text(h) == t

    def test_gold_mentions_parsed(self):
        gold = tei_gold_links(THIBAUDET)
        assert gold.num_rows >= 5
        assert all(r.startswith("http") for r in gold["ref"].to_pylist())

    def test_links_thibaudet_mini_end_to_end(self, tmp_path):
        """The reference's own committed corpus through the full Ray
        pipeline: TEI -> pages -> extract -> NER -> candidates -> link.
        The fixture dictionary derives from the gold refs, so every
        gold (url, surface, ref) must come back as a link."""
        from reden_ray.pipelines.nel import NELPipeline

        fx = tei_fixture_from_gold(THIBAUDET, str(tmp_path / "fx"))
        pages = rd.from_arrow(tei_to_pages(THIBAUDET))
        p = NELPipeline(fx)
        links = p.links(mentions_ds=p.mentions(p.texts(pages))).to_pandas()
        got = {(u, s.lower(), r) for u, s, r in
               zip(links["url"], links["surface"], links["uri"])}
        gold = tei_gold_links(THIBAUDET)
        want = {(u, s.lower(), r) for u, s, r in
                zip(gold["url"].to_pylist(), gold["surface"].to_pylist(),
                    gold["ref"].to_pylist())}
        missing = want - got
        assert not missing, missing
        # and the triple stage runs over it
        triples = p.triples(p.links(mentions_ds=p.mentions(p.texts(pages))))
        t = triples.to_pandas()
        assert len(t) and not t.duplicated(["subj", "pred", "obj"]).any()
