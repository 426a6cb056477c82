"""Unit tests for the gazetteer NER trie matcher (S3/ST6 analog)."""

from reden_ray.stages.ner import build_trie, find_mentions


def _trie(*surfaces):
    return build_trie([(s, "PER") for s in surfaces])


class TestTrieMatching:
    def test_single_token(self):
        t = _trie("Dumas")
        assert [(m[2]) for m in find_mentions("I read Dumas today", t)] == ["Dumas"]

    def test_longest_match_wins(self):
        t = _trie("Dumas", "Alexandre Dumas")
        ms = find_mentions("by Alexandre Dumas indeed", t)
        assert [m[2] for m in ms] == ["Alexandre Dumas"]

    def test_case_insensitive(self):
        t = _trie("Dumas")
        assert [m[2] for m in find_mentions("DUMAS wrote", t)] == ["DUMAS"]

    def test_offsets(self):
        t = _trie("Dumas")
        (b, e, s, ne) = find_mentions("xx Dumas yy", t)[0]
        assert (b, e, s, ne) == (3, 8, "Dumas", "PER")

    def test_adjacent_mentions_do_not_straddle(self):
        t = _trie("Dumas", "Vigny")
        ms = find_mentions("Dumas Vigny", t)
        assert [m[2] for m in ms] == ["Dumas", "Vigny"]

    def test_title_with_punctuation(self):
        t = _trie("M. Dumas")
        ms = find_mentions("sir M. Dumas arrived", t)
        assert [m[2] for m in ms] == ["M. Dumas"]

    def test_backtrack_to_shorter_terminal(self):
        # "Alexandre Dumas Fils" partially matches but only the
        # 2-token prefix is a terminal.
        t = _trie("Alexandre Dumas", "Alexandre Dumas Fils")
        ms = find_mentions("Alexandre Dumas wrote", t)
        assert [m[2] for m in ms] == ["Alexandre Dumas"]

    def test_no_match_inside_words(self):
        t = _trie("art")
        assert find_mentions("the artist departs", t) == []
        assert [m[2] for m in find_mentions("state of the art today", t)] == ["art"]

    def test_empty(self):
        assert find_mentions("", _trie("X")) == []
        assert find_mentions("anything", build_trie([])) == []


class TestMatcherEquivalence:
    def test_single_token_fast_path_equals_trie(self):
        """build_matcher's whole-word regex path must emit EXACTLY the
        trie walk's mentions on random corpora (offsets, case, order)."""
        import random

        from reden_ray.stages.ner import build_matcher, build_trie, find_mentions

        rng = random.Random(17)
        words = ["spark", "stream", "vector", "sparkle", "s", "Émile"]
        surfaces = [(w, "TERM") for w in words]
        trie = build_trie(surfaces)
        match = build_matcher(surfaces)
        vocab = words + ["the", "sparks", "xspark", "e-spark", "SPARK1",
                         "émile", "stream,", "a", "1spark"]
        for _ in range(300):
            text = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30)))
            assert match(text) == find_mentions(text, trie), text

    def test_fast_path_unicode_casefold_mismatch(self):
        """re.I matches chars whose .lower() differs from the pattern key
        (Turkish dotted İ, long-s ſ). The fast path must neither crash
        nor diverge from the trie, which keys on .lower() and skips them."""
        from reden_ray.stages.ner import build_matcher, build_trie, find_mentions

        surfaces = [("istanbul", "LOC"), ("s", "TERM")]
        trie = build_trie(surfaces)
        match = build_matcher(surfaces)
        for text in [
            "Travel to İSTANBUL next",   # 'İSTANBUL'.lower() == 'i̇stanbul'
            "the long ſ glyph",           # 'ſ'.lower() == 'ſ' but casefolds to 's'
            "plain istanbul and S here",  # sanity: normal matches still work
        ]:
            assert match(text) == find_mentions(text, trie), text

    def test_multi_token_surfaces_use_trie_semantics(self):
        from reden_ray.stages.ner import build_matcher

        surfaces = [("Alexandre Dumas", "PER"), ("Dumas", "PER")]
        match = build_matcher(surfaces)
        ms = match("by Alexandre Dumas indeed")
        assert [m[2] for m in ms] == ["Alexandre Dumas"]  # greedy longest
