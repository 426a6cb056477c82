"""Tests for report pipelines, enrichment join, and text analytics."""

import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from reden_ray.stages.reports import (
    ambiguity_report,
    correct_mention_counts,
    enrich_links,
    predicate_frequency,
    text_stats,
    token_count_totals,
    uri_occurrences,
)


def _cand_ds():
    rows = [
        {"url": "u1", "mention_id": 0, "cand_rank": 0},
        {"url": "u1", "mention_id": 0, "cand_rank": 1},
        {"url": "u1", "mention_id": 1, "cand_rank": 0},
        {"url": "u2", "mention_id": 0, "cand_rank": 0},
    ]
    return rd.from_arrow(pa.Table.from_pylist(rows))


class TestReports:
    def test_ambiguity(self):
        out = ambiguity_report(_cand_ds()).to_pandas()
        m = {(r.url, r.mention_id): r.n_candidates for r in out.itertuples()}
        assert m == {("u1", 0): 2, ("u1", 1): 1, ("u2", 0): 1}

    def test_predicate_frequency_sorted(self):
        rows = [{"pred": "p1"}, {"pred": "p2"}, {"pred": "p1"}, {"pred": "p1"}]
        out = predicate_frequency(rd.from_arrow(pa.Table.from_pylist(rows))).to_pandas()
        assert out.iloc[0]["pred"] == "p1" and out.iloc[0]["freq"] == 3

    def test_uri_occurrences(self):
        rows = [{"uri": "a"}, {"uri": "a"}, {"uri": "b"}]
        out = uri_occurrences(rd.from_arrow(pa.Table.from_pylist(rows))).to_pandas()
        assert dict(zip(out.uri, out.occurrences)) == {"a": 2, "b": 1}

    def test_cooccurrence_edges(self):
        from reden_ray.stages.reports import cooccurrence_edges

        rows = [
            # u1: entities a, b (b mentioned TWICE -> collapses), c
            {"url": "u1", "uri": "a"}, {"url": "u1", "uri": "b"},
            {"url": "u1", "uri": "b"}, {"url": "u1", "uri": "c"},
            # u2: a, b again -> (a,b) weight 2
            {"url": "u2", "uri": "b"}, {"url": "u2", "uri": "a"},
            # u3: single entity -> no pairs
            {"url": "u3", "uri": "a"},
        ]
        # 1-row blocks: per-url rows span blocks, so the in-bucket
        # drop_duplicates + pair mint must reassemble them correctly
        ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(7)
        out = cooccurrence_edges(ds).to_pandas()
        got = {(r.uri_a, r.uri_b): r.n_urls for r in out.itertuples()}
        assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}

    def test_cooccurrence_lift(self):
        from reden_ray.stages.reports import cooccurrence_lift

        rows = [
            {"url": "u1", "uri": "a"}, {"url": "u1", "uri": "b"},
            {"url": "u2", "uri": "a"}, {"url": "u2", "uri": "b"},
            {"url": "u3", "uri": "b"},
            {"url": "u4", "uri": "a"}, {"url": "u4", "uri": "c"},
        ]
        # n_a=3, n_b=3, n_c=1, N=4
        ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(5)
        out = cooccurrence_lift(ds).to_pandas()
        got = {(r.uri_a, r.uri_b): (r.n_urls, r.lift_e6)
               for r in out.itertuples()}
        assert got == {("a", "b"): (2, 2 * 4 * 1_000_000 // 9),
                       ("a", "c"): (1, 1 * 4 * 1_000_000 // 3)}

    def test_entity_temporal_extent(self):
        import pyarrow as pa

        from reden_ray.stages.reports import entity_temporal_extent

        links = rd.from_arrow(pa.Table.from_pylist([
            {"url": "u1", "uri": "a"}, {"url": "u1", "uri": "a"},  # dup mention
            {"url": "u3", "uri": "a"},
            {"url": "u2", "uri": "b"},
        ])).repartition(4)
        pages = rd.from_arrow(pa.table({
            "url": pa.array(["u1", "u2", "u3", "u9"]),   # u9: no links
            "warc_ts": pa.array([1000, 2000, 3000, 9000],
                                pa.timestamp("ms")),
        })).repartition(2)
        out = entity_temporal_extent(links, pages).to_pandas().set_index("uri")
        assert out.loc["a", "first_seen_ms"] == 1000
        assert out.loc["a", "last_seen_ms"] == 3000
        assert out.loc["a", "n_urls"] == 2
        assert out.loc["b", "first_seen_ms"] == 2000
        assert out.loc["b", "n_urls"] == 1
        assert sorted(out.index) == ["a", "b"]

    def test_correct_mention_counts(self):
        links = rd.from_arrow(pa.Table.from_pylist([
            {"url": "u1", "mention_id": 0, "surface": "X", "all_uris": ["http://kb/x"]},
            {"url": "u1", "mention_id": 1, "surface": "Y", "all_uris": ["http://kb/wrong"]},
        ]))
        gold = pd.DataFrame({
            "url": ["u1", "u1"], "mention_id": [0, 1],
            "surface": ["X", "Y"], "gold_uri": ["http://kb/x", "http://kb/y"],
        })
        out = correct_mention_counts(links, gold)
        assert out.to_dict("records") == [{"surface": "X", "n_correct": 1}]


class TestEnrichment:
    def test_first_matching_property_wins(self):
        kb = {
            "http://kb/e1": [("geo:lat", "48.85", True, 1.0), ("alt:lat", "0", True, 1.0)],
            "http://kb/e2": [("alt:lat", "51.5", True, 1.0)],
        }
        ref = ray.put(kb)
        links = rd.from_arrow(pa.Table.from_pylist([
            {"url": "u1", "uri": "http://kb/e1"},
            {"url": "u2", "uri": "http://kb/e2"},
            {"url": "u3", "uri": "http://kb/none"},
        ]))
        out = enrich_links(links, ref, {"lat": ["geo:lat", "alt:lat"]}).to_pandas()
        m = dict(zip(out.uri, out.lat))
        assert m["http://kb/e1"] == "48.85"  # preferred property
        assert m["http://kb/e2"] == "51.5"   # fallback property
        assert m["http://kb/none"] is None


class TestTextAnalytics:
    def test_stats_columns_and_values(self):
        docs = rd.from_arrow(pa.Table.from_pylist([
            {"doc_id": 0, "text": "The cat sat, happily."},
            {"doc_id": 1, "text": ""},
        ]))
        out = text_stats(docs).to_pandas().set_index("doc_id")
        assert out.loc[0, "n_tokens"] == 4
        assert out.loc[0, "n_words"] == 4
        assert out.loc[1, "n_chars"] == 0
        assert len(out.loc[0, "fingerprint"]) == 32

    def test_salted_counts(self):
        import pyarrow as pa

        import ray.data as rd

        from reden_ray.stages.canonicalize import salted_counts

        rows = [{"k": "head"}] * 50 + [{"k": "tail1"}] * 3 + [{"k": "tail2"}]
        ds = rd.from_arrow(pa.Table.from_pylist(rows))
        out = salted_counts(ds, "k").to_pandas()
        m = dict(zip(out["k"], out["cnt"]))
        assert m == {"head": 50, "tail1": 3, "tail2": 1}

    def test_token_totals(self):
        docs = rd.from_arrow(pa.Table.from_pylist([
            {"doc_id": 0, "text": "one two three"},
            {"doc_id": 1, "text": "four five"},
        ]))
        row = token_count_totals(docs)
        assert row["ws_tokens"] == 5 and row["docs"] == 2
