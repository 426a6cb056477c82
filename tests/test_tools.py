"""Tests for comparison/completeness tooling (D4/J6)."""

import pandas as pd

from reden_ray.tools import compare_runs, paired_scores, population_completeness

GOLD = pd.DataFrame({
    "url": ["u1", "u1", "u2", "u2"],
    "mention_id": [0, 1, 0, 1],
    "surface": ["A", "B", "C", "D"],
    "gold_uri": ["http://kb/a", "http://kb/b", "http://kb/c", None],
})


def _links(correct_for):
    rows = []
    for url, mid, gold_uri in zip(GOLD["url"], GOLD["mention_id"], GOLD["gold_uri"]):
        if gold_uri is None:
            continue
        uri = gold_uri if (url, mid) in correct_for else "http://kb/wrong"
        rows.append({"url": url, "mention_id": mid, "all_uris": [uri]})
    return pd.DataFrame(rows)


class TestCompareRuns:
    def test_set_arithmetic(self):
        a = _links({("u1", 0), ("u1", 1)})
        b = _links({("u1", 1), ("u2", 0)})
        out = compare_runs(a, b, GOLD)
        assert out == {"correct_a": 2, "correct_b": 2, "both": 1,
                       "only_a": 1, "only_b": 1, "jaccard": 1 / 3}

    def test_paired_scores(self):
        a = _links({("u1", 0)})
        b = _links(set())
        df = paired_scores(a, b, GOLD)
        assert len(df) == 3  # NIL gold rows excluded
        assert df[(df.url == "u1") & (df.mention_id == 0)].iloc[0]["run_a"] == 1
        assert df["run_b"].sum() == 0


class TestScanDictionary:
    def test_regexp_scan(self):
        import pyarrow as pa

        import ray.data as rd

        from reden_ray.tools import scan_dictionary

        dico = rd.from_arrow(pa.Table.from_pylist([
            {"surface": "Dumas", "entity_id": "e1"},
            {"surface": "Vigny", "entity_id": "e2"},
            {"surface": "Dumont", "entity_id": "e3"},
        ]))
        out = scan_dictionary(dico, "^Dum").to_pandas()
        assert sorted(out["surface"]) == ["Dumas", "Dumont"]


class TestPopulationCompleteness:
    def test_coverage(self):
        dico = pd.DataFrame({
            "entity_id": ["http://kb/a", "http://kb/x"],
            "uris": [["http://kb/a", "http://eq/a"], ["http://kb/x"]],
        })
        out = population_completeness(GOLD, dico)
        assert out["gold_uris"] == 3
        assert out["covered"] == 1
        assert abs(out["completeness"] - 1 / 3) < 1e-12
