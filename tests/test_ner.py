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
