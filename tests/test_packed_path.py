"""Equivalence: all three linking paths produce identical links.

* row path — row-form candidates through the url-bucket sort groupby;
* fused path (default) — candidate gen inside the link batch fn, NO
  shuffle (exact via whole-block url contiguity);
* packed+sort path — one compressed binary row per url through the
  sort (for fragmented inputs).
"""

import numpy as np
import pytest

from reden_ray.pipelines.nel import NELConfig, NELPipeline


@pytest.fixture(scope="module")
def all_paths(unit_fixture):
    p = NELPipeline(unit_fixture)
    row = p.links(p.candidates()).to_pandas()
    fused = p.links(mentions_ds=p.mentions()).to_pandas()
    p_sort = NELPipeline(unit_fixture, NELConfig(link_shuffle="sort"))
    packed_sort = p_sort.links(mentions_ds=p_sort.mentions()).to_pandas()
    return row, fused, packed_sort


def _assert_same_links(a, b):
    key = ["url", "mention_id"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b)
    assert (a["uri"].values == b["uri"].values).all()
    assert (a["surface"].values == b["surface"].values).all()
    an, bn = a["score"].isna(), b["score"].isna()
    assert (an.values == bn.values).all()
    assert np.allclose(a["score"][~an], b["score"][~bn.values])
    assert all(list(x) == list(y) for x, y in zip(a["all_uris"], b["all_uris"]))


class TestLinkPathEquivalence:
    def test_fused_equals_row_path(self, all_paths):
        row, fused, _ = all_paths
        _assert_same_links(row, fused)

    def test_packed_sort_equals_row_path(self, all_paths):
        row, _, packed_sort = all_paths
        _assert_same_links(row, packed_sort)

    def test_fused_repairs_block_split_mid_page(self, unit_fixture):
        """Force the hazard the fused path guards against: a url's
        mention rows cut across two blocks (what Ray's dynamic block
        splitting would do to an oversized NER output block). The
        self-verifying fused path must detect the straddle and still
        emit links identical to the row-path gold."""
        import ray.data as rd

        from reden_ray.stages.linker import link_documents_from_mentions

        p = NELPipeline(unit_fixture)
        m = p.mentions().to_pandas()
        counts = m.groupby("url", sort=False).size()
        url = counts[counts >= 2].index[0]
        run = m.index[m["url"] == url]
        cut = run[0] + 1  # split that url's run after its first row
        frag = rd.from_pandas([m.iloc[:cut], m.iloc[cut:]])
        stats = {}
        linked = link_documents_from_mentions(
            frag, p.dico_ref, p.kb_ref, p.sameas_ref, stats=stats
        ).to_pandas()
        assert stats["straddled_urls"] >= 1
        gold = p.links(p.candidates(p.mentions())).to_pandas()
        _assert_same_links(gold, linked)

    def test_fused_reports_zero_straddles_on_contiguous_input(self, unit_fixture):
        from reden_ray.stages.linker import link_documents_from_mentions

        p = NELPipeline(unit_fixture)
        stats = {}
        linked = link_documents_from_mentions(
            p.mentions(), p.dico_ref, p.kb_ref, p.sameas_ref, stats=stats
        ).to_pandas()
        assert stats["straddled_urls"] == 0
        assert stats["boundary_pairs"] >= 1
        gold = p.links(p.candidates(p.mentions())).to_pandas()
        _assert_same_links(gold, linked)

    def test_fused_chunked_yields_match_gold(self, unit_fixture):
        """chunk_bytes=1 forces a flush after EVERY page — the most
        aggressive chunking the generator can produce. Links must be
        identical to the row-path gold (chunking must never cut or
        reorder a page's rows)."""
        from reden_ray.stages.linker import link_documents_from_mentions

        p = NELPipeline(unit_fixture)
        stats = {}
        linked = link_documents_from_mentions(
            p.mentions(), p.dico_ref, p.kb_ref, p.sameas_ref, stats=stats,
            chunk_bytes=1,
        ).to_pandas()
        assert stats["url_aligned_blocks"] is True
        assert stats["straddled_urls"] == 0
        gold = p.links(p.candidates(p.mentions())).to_pandas()
        _assert_same_links(gold, linked)

    def test_fused_oversized_page_fails_loudly(self, unit_fixture):
        """A page whose link rows alone would void the url-alignment
        bound must raise (never silently risk a mid-url block slice)."""
        import ray.exceptions

        from reden_ray.stages.linker import link_documents_from_mentions

        p = NELPipeline(unit_fixture)
        with pytest.raises((RuntimeError, ray.exceptions.RayTaskError),
                           match="too[ -]large|link_shuffle"):
            link_documents_from_mentions(
                p.mentions(), p.dico_ref, p.kb_ref, p.sameas_ref,
                page_bytes_hard=1,
            ).to_pandas()

    def test_triples_fast_path_without_pair_dedup_matches_dedup_path(
            self, unit_fixture):
        """Clean fused runs skip the (url, uri) pair-dedup shuffle
        because link blocks are url-aligned by construction; the
        emitted triples must equal the conservative dedup path's."""
        from reden_ray.stages.canonicalize import canonical_labels, emit_triples

        p = NELPipeline(unit_fixture)
        links = p.links(mentions_ds=p.mentions())
        fast = p.triples(links).to_pandas()
        assert p.last_link_stats.get("fused_clean")
        labels = canonical_labels(links).materialize()
        slow = emit_triples(links, labels, p.kb_ref, p.sameas_ref,
                            global_dedup=False,
                            mention_pair_dedup=True).to_pandas()
        key = ["subj", "pred", "obj"]
        fast = fast.sort_values(key).reset_index(drop=True)
        slow = slow.sort_values(key).reset_index(drop=True)
        assert len(fast) == len(slow)
        assert (fast[key].values == slow[key].values).all()

    def test_fused_memo_hits_match_row_path_on_duplicate_pages(self, unit_fixture):
        """The fused path memoizes per-page link results keyed on the
        mention signature; duplicated pages (same text, new url) take
        the memo-hit path and must still match the memo-free row-path
        gold exactly, with the url column rewritten per page."""
        import pandas as pd
        import ray.data as rd

        from reden_ray.stages.candidates import generate_candidates
        from reden_ray.stages.linker import link_documents, link_documents_from_mentions
        from reden_ray.stages.ner import stable_url_hash

        p = NELPipeline(unit_fixture)
        m = p.mentions().to_pandas()
        copies = []
        for r in range(3):  # replicate every page under 3 new urls
            c = m.copy()
            c["url"] = c["url"] + f"?copy={r}"
            c["url_hash"] = [stable_url_hash(u) for u in c["url"]]
            copies.append(c)
        dup = pd.concat([m] + copies, ignore_index=True)
        dup_ds = rd.from_arrow(
            __import__("pyarrow").Table.from_pandas(dup, preserve_index=False))
        fused = link_documents_from_mentions(
            dup_ds, p.dico_ref, p.kb_ref, p.sameas_ref).to_pandas()
        gold = link_documents(
            generate_candidates(dup_ds, p.dico_ref), p.kb_ref, p.sameas_ref
        ).to_pandas()
        _assert_same_links(gold, fused)

    def test_packed_sort_merges_fragmented_urls(self, unit_fixture):
        """The sort path's reason to exist: url payload fragments in
        DIFFERENT blocks must merge into one context before linking."""
        import pyarrow as pa

        import ray.data as rd

        from reden_ray.stages.candidates import generate_candidates_packed
        from reden_ray.stages.linker import link_documents_packed
        from reden_ray.stages.ner import stable_url_hash

        p = NELPipeline(unit_fixture)
        mentions = p.mentions().to_pandas()
        # take one url with >= 2 mentions; split its mentions across two
        # single-block datasets, pack each separately, union -> the
        # url's packed payload is fragmented across blocks
        counts = mentions.groupby("url").size()
        url = counts[counts >= 2].index[0]
        m = mentions[mentions["url"] == url].reset_index(drop=True)
        half = len(m) // 2
        parts = []
        for piece in (m.iloc[:half], m.iloc[half:]):
            t = pa.Table.from_pandas(piece, preserve_index=False)
            parts.append(generate_candidates_packed(
                rd.from_arrow(t), p.dico_ref, batch_size=8192))
        fragmented = parts[0].union(parts[1])
        linked = link_documents_packed(
            fragmented, p.kb_ref, p.sameas_ref, shuffle="sort",
            num_buckets=4).to_pandas()
        whole = p.links(p.candidates(p.mentions())).to_pandas()
        expect = whole[whole["url"] == url].sort_values("mention_id")
        got = linked.sort_values("mention_id")
        assert list(got["uri"]) == list(expect["uri"])
