"""Exact prefix-filter Jaccard join (stages/setjoin) tests."""

from __future__ import annotations

import itertools

import numpy as np
import pyarrow as pa

import ray.data as rd

from reden_ray.stages.setjoin import jaccard_join, token_df


def _docs(rows):
    return rd.from_arrow(pa.Table.from_pylist(rows))


def _brute(rows, tau_ppm):
    sets = {r["doc_id"]: set(r["text"].split(" ")) - {""} for r in rows}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        i = len(sa & sb)
        u = len(sa) + len(sb) - i
        if u and 1_000_000 * i >= tau_ppm * u:
            out[(a, b)] = 1_000_000 * i // u
    return out


def _got(ds):
    df = ds.to_pandas()
    if df.empty:
        return {}
    return {(a, b): j for a, b, j in
            zip(df["a"], df["b"], df["jac_ppm"])}


class TestJaccardJoin:
    def test_exact_dup_and_threshold_edges(self):
        rows = [
            {"doc_id": 1, "text": "aa bb cc dd ee ff gg hh ii jj"},
            {"doc_id": 2, "text": "aa bb cc dd ee ff gg hh ii jj"},   # J=1.0
            {"doc_id": 3, "text": "aa bb cc dd ee ff gg hh ii xx"},   # J=9/11
            {"doc_id": 4, "text": "zz yy ww vv uu"},                  # J=0
        ]
        got = _got(jaccard_join(_docs(rows), tau_ppm=900_000))
        assert got == {(1, 2): 1_000_000}
        got8 = _got(jaccard_join(_docs(rows), tau_ppm=800_000))
        # 9/11 = 0.818... qualifies at 0.8
        assert got8 == {(1, 2): 1_000_000, (1, 3): 818_181, (2, 3): 818_181}

    def test_matches_bruteforce_random_zipf(self):
        rng = np.random.RandomState(17)
        vocab = np.array([f"w{i}" for i in range(60)], dtype=object)
        pz = 1.0 / np.arange(1, 61)
        pz /= pz.sum()
        rows = [{"doc_id": i,
                 "text": " ".join(rng.choice(vocab, 25, p=pz))}
                for i in range(80)]
        for tau in (700_000, 850_000):
            got = _got(jaccard_join(_docs(rows), tau_ppm=tau))
            assert got == _brute(rows, tau)

    def test_duplicate_tokens_use_set_semantics(self):
        rows = [
            {"doc_id": 1, "text": "aa aa aa bb"},
            {"doc_id": 2, "text": "aa bb bb bb"},
        ]
        got = _got(jaccard_join(_docs(rows), tau_ppm=900_000))
        assert got == {(1, 2): 1_000_000}

    def test_empty_and_blank_docs(self):
        rows = [
            {"doc_id": 1, "text": ""},
            {"doc_id": 2, "text": "  "},
            {"doc_id": 3, "text": "aa bb"},
            {"doc_id": 4, "text": "aa bb"},
        ]
        got = _got(jaccard_join(_docs(rows), tau_ppm=900_000))
        assert got == {(3, 4): 1_000_000}

    def test_cap_truncation_yields_subset(self):
        rows = [{"doc_id": i, "text": "aa bb cc dd"} for i in range(30)]
        full = _got(jaccard_join(_docs(rows), tau_ppm=900_000))
        assert len(full) == 30 * 29 // 2
        capped = _got(jaccard_join(_docs(rows), tau_ppm=900_000,
                                   bucket_cap=10))
        assert set(capped) < set(full)
        assert all(full[k] == v for k, v in capped.items())

    def test_block_split_invariant(self):
        rows = [{"doc_id": i, "text": f"t{i % 4} t{i % 5} t{i % 6} common"}
                for i in range(40)]
        one = _got(jaccard_join(_docs(rows), tau_ppm=600_000))
        many = _got(jaccard_join(_docs(rows).repartition(9),
                                 tau_ppm=600_000))
        assert one == many

    def test_token_df_counts_documents_not_occurrences(self):
        rows = [{"doc_id": 1, "text": "aa aa aa"},
                {"doc_id": 2, "text": "aa bb"}]
        df = token_df(_docs(rows)).to_pandas().set_index("w")["df"]
        assert df.to_dict() == {"aa": 2, "bb": 1}


from reden_ray.pipelines.setops import phrase_hits


def _hits(rows, phrase):
    df = phrase_hits(_docs(rows), phrase=phrase).to_pandas()
    if df.empty:
        return {}
    return dict(zip(df["doc_id"], df["n_hits"]))


class TestPhraseSearch:
    def test_exact_and_overlapping_hits(self):
        rows = [
            {"doc_id": 1, "text": "x a b c y a b c"},      # 2 hits
            {"doc_id": 2, "text": "a b x b c"},            # 0
            {"doc_id": 3, "text": "a a a a"},              # self-overlap
        ]
        assert _hits(rows, ("a", "b", "c")) == {1: 2}
        # positional semantics: 'a a a a' has 2 occurrences of (a,a,a)
        assert _hits(rows, ("a", "a", "a")) == {3: 2}

    def test_no_cross_document_match(self):
        rows = [
            {"doc_id": 1, "text": "x y a b"},
            {"doc_id": 2, "text": "c z"},   # 'a b' + 'c' spans docs: no hit
        ]
        assert _hits(rows, ("a", "b", "c")) == {}

    def test_short_and_empty_docs(self):
        rows = [
            {"doc_id": 1, "text": ""},
            {"doc_id": 2, "text": "a b"},
            {"doc_id": 3, "text": "a b c"},
        ]
        assert _hits(rows, ("a", "b", "c")) == {3: 1}

    def test_block_split_invariant(self):
        rows = [{"doc_id": i,
                 "text": ("p q r " * (i % 3 + 1)).strip()}
                for i in range(30)]
        one = _hits(rows, ("p", "q", "r"))
        df = phrase_hits(_docs(rows).repartition(9),
                         phrase=("p", "q", "r")).to_pandas()
        many = dict(zip(df["doc_id"], df["n_hits"]))
        assert one == many
