"""Property-based tests (hypothesis) for the frozen scalar functions."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from reden_ray.functions.text import (
    char_shingles,
    hamming64,
    html_to_text,
    jaccard,
    minhash_params,
    minhash_signature,
    normalize_surface,
    simhash64,
    text_to_html,
)
from reden_ray.stages.ner import build_trie, find_mentions

# words of plain ascii letters — the line-discipline alphabet
_word = st.text(alphabet=string.ascii_letters, min_size=1, max_size=10)
_line = st.lists(_word, min_size=1, max_size=12).map(" ".join)
_doc = st.lists(_line, min_size=1, max_size=5).map("\n".join)


class TestNormalizerProperties:
    @given(st.text(max_size=100))
    @settings(max_examples=200, deadline=None)
    def test_idempotent(self, s):
        once = normalize_surface(s)
        assert normalize_surface(once) == once

    @given(st.text(max_size=100))
    @settings(max_examples=200, deadline=None)
    def test_no_stripped_chars_remain(self, s):
        out = normalize_surface(s)
        assert not any(c in out for c in " \t\n'’-")
        assert out == out.lower()


class TestHtmlRoundTrip:
    @given(_doc)
    @settings(max_examples=100, deadline=None)
    def test_roundtrip_on_disciplined_text(self, text):
        assert html_to_text(text_to_html(text, title="t")) == text

    @given(st.binary(max_size=300))
    @settings(max_examples=100, deadline=None)
    def test_total_on_arbitrary_bytes(self, payload):
        out = html_to_text(payload)  # never raises; output is disciplined
        for line in out.split("\n"):
            assert line == line.strip() and "  " not in line


class TestSketchProperties:
    @given(_doc)
    @settings(max_examples=50, deadline=None)
    def test_identical_docs_identical_signatures(self, text):
        a, b = minhash_params(32)
        s = char_shingles(text)
        assert (minhash_signature(s, a, b) == minhash_signature(s, a, b)).all()
        assert hamming64(simhash64(text), simhash64(text)) == 0

    @given(_doc, _doc)
    @settings(max_examples=50, deadline=None)
    def test_jaccard_bounds_and_symmetry(self, t1, t2):
        a, b = char_shingles(t1), char_shingles(t2)
        j = jaccard(a, b)
        assert 0.0 <= j <= 1.0
        assert j == jaccard(b, a)
        assert jaccard(a, a) == 1.0


class TestNerProperties:
    @given(st.lists(_word, min_size=1, max_size=6, unique=True))
    @settings(max_examples=50, deadline=None)
    def test_every_gazetteer_word_found(self, words):
        trie = build_trie([(w, "PER") for w in words])
        text = " xx ".join(words)  # separated by non-gazetteer filler
        found = {m[2].lower() for m in find_mentions(text, trie)}
        expect = {w.lower() for w in words if w.lower() != "xx"}
        assert expect <= found | {"xx"}

    @given(_doc)
    @settings(max_examples=50, deadline=None)
    def test_mentions_sorted_and_disjoint(self, text):
        trie = build_trie([(w, "PER") for w in text.split()[:5]])
        ms = find_mentions(text, trie)
        for (b1, e1, *_), (b2, e2, *_) in zip(ms, ms[1:]):
            assert e1 <= b2  # non-overlapping, left to right


class TestSimhashBatchProperties:
    @given(st.lists(st.text(max_size=80), min_size=0, max_size=12))
    @settings(max_examples=150, deadline=None)
    def test_batch_matches_per_doc_on_arbitrary_text(self, texts):
        from reden_ray.functions.text import simhash64_batch

        got = simhash64_batch(texts)
        assert len(got) == len(texts)
        assert [int(v) for v in got] == [simhash64(t) for t in texts]
