"""Tests for dictionary build (Mode 2), annotation writer, visu (Mode 3)."""

import json

import pyarrow as pa

import ray
import ray.data as rd

from reden_ray.sources.dictionary_build import build_dictionary, read_tsv_dictionary
from reden_ray.stages.annotate import annotate_pages, produce_visu_data


class TestDictionaryBuild:
    def test_alias_explosion(self):
        ents = rd.from_arrow(pa.Table.from_pylist([
            {"entity_id": "http://kb/d", "first": "Alexandre", "last": "Dumas",
             "gender": "M", "particle": "", "birth": "1802-07-24", "death": "1870",
             "uris": ["http://eq/d"], "ne_type": "PER"},
        ]))
        out = build_dictionary(ents).to_pandas()
        assert "Dumas" in set(out["surface"])
        assert "Alexandre Dumas" in set(out["surface"])
        row = out[out["surface"] == "Dumas"].iloc[0]
        assert row["canonical_name"] == "Dumas, Alexandre (1802-1870)"
        assert list(row["uris"]) == ["http://kb/d", "http://eq/d"]
        assert row["surface_norm"] == "dumas"

    def test_temporal_extent_bounds(self):
        """Date-bounded build (TemporalExtent.java:9-34; strict birth
        FILTERs QueryAuthorBNF.java:69-85): keep iff
        greater_than < birth < lesser_than; unparseable birth under a
        bound -> dropped (SPARQL unbound-FILTER semantics)."""
        ents = rd.from_arrow(pa.Table.from_pylist([
            {"entity_id": "e1", "first": "A", "last": "Early", "gender": "M",
             "particle": "", "birth": "1700", "death": "1760", "uris": [],
             "ne_type": "PER"},
            {"entity_id": "e2", "first": "B", "last": "Mid", "gender": "M",
             "particle": "", "birth": "1802-07-24", "death": "1870", "uris": [],
             "ne_type": "PER"},
            {"entity_id": "e3", "first": "C", "last": "Late", "gender": "F",
             "particle": "", "birth": "1900", "death": "1950", "uris": [],
             "ne_type": "PER"},
            {"entity_id": "e4", "first": "D", "last": "Unknown", "gender": "M",
             "particle": "", "birth": "no date", "death": None, "uris": [],
             "ne_type": "PER"},
        ]))
        out = build_dictionary(ents, greater_than=1750, lesser_than=1880).to_pandas()
        assert set(out["entity_id"]) == {"e2"}
        # boundary strictness: birth == bound is excluded
        strict = build_dictionary(ents, greater_than=1802).to_pandas()
        assert set(strict["entity_id"]) == {"e3"}
        # no bounds: everything (incl. unparseable birth) survives
        assert set(build_dictionary(ents).to_pandas()["entity_id"]) == {
            "e1", "e2", "e3", "e4"}

    def test_tsv_reader_ragged_rows(self, tmp_path):
        p = tmp_path / "dico.tsv"
        p.write_text(
            "Dumas\tDumas, Alexandre (1802-1870)\thttp://kb/d\thttp://eq/d\n"
            "Vigny\tVigny, Alfred de (1797-1863)\thttp://kb/v\n"
            "bad-row\n",
            encoding="utf-8",
        )
        out = read_tsv_dictionary(str(p)).to_pandas()
        assert len(out) == 2
        d = out[out["surface"] == "Dumas"].iloc[0]
        assert list(d["uris"]) == ["http://kb/d", "http://eq/d"]
        assert d["entity_id"] == "http://kb/d"


class TestMergeEntityRows:
    def test_a10_merge(self):
        from reden_ray.sources.dictionary_build import merge_entity_rows

        raw = rd.from_arrow(pa.Table.from_pylist([
            {"entity_id": "e1", "first": "A", "last": "B", "gender": "M",
             "particle": "", "birth": "1800", "death": "1870",
             "uri": "http://eq/1", "rejected_form": "B, A (pseud.)"},
            {"entity_id": "e1", "first": "A", "last": "B", "gender": "M",
             "particle": "", "birth": "1800", "death": "1870",
             "uri": "http://eq/2", "rejected_form": "B, A (pseud.)"},
            {"entity_id": "e2", "first": "C", "last": "D", "gender": "F",
             "particle": "de", "birth": "1810", "death": "1880",
             "uri": "", "rejected_form": ""},
        ]))
        out = merge_entity_rows(raw).to_pandas().set_index("entity_id")
        assert list(out.loc["e1", "uris"]) == ["e1", "http://eq/1", "http://eq/2"]
        assert list(out.loc["e1", "rejected_forms"]) == ["B, A"]  # M8 + dedup
        assert list(out.loc["e2", "uris"]) == ["e2"]


class TestCleanRejectedForm:
    def test_m8(self):
        from reden_ray.functions.alias import clean_rejected_form, clean_rejected_forms

        assert clean_rejected_form("Dumas, A. (père)") == "Dumas, A."
        assert clean_rejected_form("  plain  ") == "plain"
        assert clean_rejected_forms(["X (1)", "X (2)", "", "Y"]) == ["X", "Y"]


class TestAnnotate:
    def test_annotations_json_per_page(self):
        texts = rd.from_arrow(pa.Table.from_pylist([
            {"url": "u1", "text": "alpha Dumas beta"},
            {"url": "u2", "text": "no mentions here"},
        ]))
        links = rd.from_arrow(pa.Table.from_pylist([
            {"url": "u1", "mention_id": 0, "surface": "Dumas", "uri": "http://kb/d"},
        ]))
        out = annotate_pages(texts, links).to_pandas().set_index("url")
        ann1 = json.loads(out.loc["u1", "annotations"])
        assert ann1 == [{"mention_id": 0, "surface": "Dumas", "uri": "http://kb/d"}]
        assert json.loads(out.loc["u2", "annotations"]) == []

    def test_add_scores_option(self):
        """Reference addScores config: annotations carry the winning
        score; NoAmbiguity links (NaN score) serialize as null."""
        texts = rd.from_arrow(pa.Table.from_pylist([
            {"url": "u1", "text": "alpha Dumas beta Vigny"},
        ]))
        links = rd.from_arrow(pa.Table.from_pylist([
            {"url": "u1", "mention_id": 0, "surface": "Dumas",
             "uri": "http://kb/d", "score": 3.0},
            {"url": "u1", "mention_id": 1, "surface": "Vigny",
             "uri": "http://kb/v", "score": float("nan")},
        ]))
        out = annotate_pages(texts, links, add_scores=True).to_pandas().set_index("url")
        ann = json.loads(out.loc["u1", "annotations"])
        assert ann[0]["score"] == 3.0
        assert ann[1]["score"] is None

    def test_add_scores_all_null_score_column(self):
        """An all-NoAmbiguity batch arrives with an Arrow null-typed /
        object score column (every value None); annotation must
        serialize null, not raise on float(None)."""
        texts = rd.from_arrow(pa.Table.from_pylist([
            {"url": "u1", "text": "alpha Dumas beta"},
        ]))
        links = rd.from_arrow(pa.table({
            "url": pa.array(["u1"], pa.string()),
            "mention_id": pa.array([0], pa.int64()),
            "surface": pa.array(["Dumas"], pa.string()),
            "uri": pa.array(["http://kb/d"], pa.string()),
            "score": pa.nulls(1, pa.float64()),
        }))
        out = annotate_pages(texts, links, add_scores=True).to_pandas().set_index("url")
        ann = json.loads(out.loc["u1", "annotations"])
        assert ann[0]["score"] is None


class TestVisu:
    def test_feature_collection(self):
        kb = {
            "http://kb/place": [("geo:lat", "48.85", True, 1.0),
                                ("geo:lon", "2.35", True, 1.0)],
        }
        ref = ray.put(kb)
        links = rd.from_arrow(pa.Table.from_pylist([
            {"url": "u1", "uri": "http://kb/place"},
            {"url": "u2", "uri": "http://kb/place"},
            {"url": "u3", "uri": "http://kb/nowhere"},
        ]))
        fc = produce_visu_data(links, ref, {"lat": ["geo:lat"], "lon": ["geo:lon"]})
        assert fc["type"] == "FeatureCollection"
        by_uri = {f["properties"]["uri"]: f for f in fc["features"]}
        place = by_uri["http://kb/place"]
        assert place["properties"]["occurrences"] == 2
        assert place["geometry"] == {"type": "Point", "coordinates": [2.35, 48.85]}
        assert by_uri["http://kb/nowhere"]["geometry"] is None

    def test_write_visu_data_sink_matches_dict(self, tmp_path):
        """The Dataset JSON sink must write exactly the features the
        driver-side dict assembles (Mode 3, scale-safe variant)."""
        from reden_ray.stages.annotate import write_visu_data

        kb = {
            "http://kb/place": [("geo:lat", "48.85", True, 1.0),
                                ("geo:lon", "2.35", True, 1.0)],
        }
        ref = ray.put(kb)

        def links():
            return rd.from_arrow(pa.Table.from_pylist([
                {"url": "u1", "uri": "http://kb/place"},
                {"url": "u2", "uri": "http://kb/place"},
                {"url": "u3", "uri": "http://kb/nowhere"},
            ]))

        props = {"lat": ["geo:lat"], "lon": ["geo:lon"]}
        out = tmp_path / "visu"
        n = write_visu_data(links(), ref, props, str(out))
        assert n == 2
        written = []
        for f in sorted(out.glob("*.json")):
            for line in f.read_text().splitlines():
                if line.strip():
                    written.append(json.loads(line)["feature"])
        fc = produce_visu_data(links(), ref, props)
        expected = [json.dumps(x, sort_keys=True) for x in fc["features"]]
        assert sorted(written) == sorted(expected)
