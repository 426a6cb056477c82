"""Analysis tooling: run comparison (D4), population completeness (J6),
significance-test prep.

* ``compare_runs`` — intersection/difference of correctly-linked
  mention sets between two runs (reference:
  src/fr/lip6/reden/extra/CompareResults.java:16-102).
* ``population_completeness`` — gold URIs ∩ dictionary URIs coverage
  (reference: extra/CalculatePopulationCompletenessLDUsingDico.java:43-110,
  the Lucene regexp scan replaced by a column scan).
* ``paired_scores`` — per-mention paired correctness scores for two
  runs, the input the reference prepares for Friedman/t-tests in R
  (extra/SignificanceTesting.java:23-113).
"""

from __future__ import annotations

import pandas as pd


def _correct_set(links: pd.DataFrame, gold: pd.DataFrame) -> set[tuple]:
    links = links.copy()
    links["emitted"] = links["all_uris"].map(
        lambda us: " ".join(us) if not isinstance(us, str) else us
    )
    m = gold.merge(links[["url", "mention_id", "emitted"]], on=["url", "mention_id"],
                   how="inner")
    m = m[m["gold_uri"].notna()]
    ok = m.apply(lambda r: isinstance(r["emitted"], str) and r["gold_uri"] in r["emitted"],
                 axis=1)
    return set(zip(m[ok]["url"], m[ok]["mention_id"]))


def compare_runs(links_a: pd.DataFrame, links_b: pd.DataFrame,
                 gold: pd.DataFrame) -> dict:
    """D4: set comparison of correct mentions between two runs."""
    a, b = _correct_set(links_a, gold), _correct_set(links_b, gold)
    return {
        "correct_a": len(a),
        "correct_b": len(b),
        "both": len(a & b),
        "only_a": len(a - b),
        "only_b": len(b - a),
        "jaccard": len(a & b) / len(a | b) if (a | b) else 1.0,
    }


def population_completeness(gold: pd.DataFrame, dictionary: pd.DataFrame) -> dict:
    """J6: fraction of gold URIs present anywhere in the dictionary's
    equivalence lists (the reference's regexp index scan, done as a
    vectorized column scan)."""
    dico_uris: set[str] = set()
    for us in dictionary["uris"]:
        dico_uris.update(us)
    dico_uris.update(dictionary["entity_id"])
    gold_uris = set(gold[gold["gold_uri"].notna()]["gold_uri"])
    covered = {u for u in gold_uris if u in dico_uris}
    return {
        "gold_uris": len(gold_uris),
        "covered": len(covered),
        "completeness": len(covered) / len(gold_uris) if gold_uris else 1.0,
    }


def scan_dictionary(dictionary_ds, pattern: str):
    """K3: regexp scan over the dictionary (the reference's Lucene
    regexp query with its effectively-unbounded 20M cap,
    src/fr/lip6/reden/nelinker/DicoProcessingNEL.java:349-378) — here a
    vectorized Arrow filter over the alias column."""
    import pyarrow.compute as pc

    def flt(t):
        mask = pc.match_substring_regex(t["surface"], pattern)
        return t.filter(mask)

    return dictionary_ds.map_batches(flt, batch_format="pyarrow")


def paired_scores(links_a: pd.DataFrame, links_b: pd.DataFrame,
                  gold: pd.DataFrame) -> pd.DataFrame:
    """Per-mention 0/1 correctness pairs for significance testing."""
    a, b = _correct_set(links_a, gold), _correct_set(links_b, gold)
    g = gold[gold["gold_uri"].notna()]
    rows = [
        {"url": u, "mention_id": m,
         "run_a": int((u, m) in a), "run_b": int((u, m) in b)}
        for u, m in zip(g["url"], g["mention_id"])
    ]
    return pd.DataFrame(rows, columns=["url", "mention_id", "run_a", "run_b"])
