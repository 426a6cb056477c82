"""Unit tests for scalar functions (M1-M10 parity + text analysis)."""

import numpy as np
import pyarrow as pa

from reden_ray.functions.alias import make_aliases, normalized_display_name
from reden_ray.functions.dates import clean_year, date_overlap, parse_year
from reden_ray.functions.text import (
    char_shingles,
    count_tokens_bpe,
    count_tokens_ws,
    detect_language,
    fingerprint_md5,
    hamming64,
    html_to_text,
    jaccard,
    minhash_params,
    minhash_signature,
    normalize_surface,
    normalize_surface_array,
    quality_features,
    rolling_fingerprints,
    sanitize_filename,
    simhash64,
    text_to_html,
    word_ngrams,
)
from reden_ray.functions.uri import decompose, normalize_uri


class TestNormalizer:
    """M1 — DicoProcessingNEL.java:410-415 byte cases."""

    def test_strips_ws_apostrophe_hyphen_lowercases(self):
        assert normalize_surface("Jean-Paul d'Arc") == "jeanpauldarc"
        assert normalize_surface("  A  B  ") == "ab"
        assert normalize_surface("O’Neil") == "oneil"
        assert normalize_surface("Dumas") == "dumas"
        assert normalize_surface("") == ""

    def test_vectorized_matches_scalar(self):
        vals = ["Jean-Paul d'Arc", "  A  B ", "O’Neil", "M. X", ""]
        arr = normalize_surface_array(pa.array(vals))
        assert arr.to_pylist() == [normalize_surface(v) for v in vals]

    def test_sanitize_distinct_from_normalize(self):
        # M2 — Util.java:75-80: also '/'->'-' and drop ':'
        assert sanitize_filename("http://a b/c:d") == "http--ab-cd"


class TestUri:
    def test_decompose_decodes_http_only(self):
        assert decompose("http://x/a%20b") == "http://x/a b"
        assert decompose("not-a-uri%20x") == "not-a-uri%20x"
        assert normalize_uri(" http://x/a%C3%A9 ") == "http://x/aé"


class TestDates:
    def test_parse_year(self):
        assert parse_year("1802-07-24") == 1802
        assert parse_year("1850") == 1850
        assert parse_year("noyear") is None
        assert parse_year(None) is None

    def test_overlap(self):
        assert date_overlap(1800, 1870, 1850, 1900) == 20
        assert date_overlap(1800, 1820, 1850, 1900) == 0

    def test_clean_year(self):
        assert clean_year("1802-07-24") == "1802"
        assert clean_year("1844") == "1844"
        assert clean_year("18..") == "18"
        assert clean_year("junk") == "-"
        assert clean_year(None) == "-"


class TestAliases:
    """M9 — AuthorBNF.makeAliases semantics, table-driven."""

    def test_patterns(self):
        a = set(make_aliases("Alexandre", "Dumas", gender="M"))
        assert {"Dumas", "Alexandre Dumas", "Dumas, Alexandre",
                "A. Dumas", "A Dumas", "M. Dumas", "M Dumas"} <= a

    def test_particle(self):
        a = set(make_aliases("Alfred", "Vigny", gender="M", particle="de"))
        assert "de Vigny" in a and "Alfred de Vigny" in a
        b = set(make_aliases("Jeanne", "Arc", gender="F", particle="d'"))
        assert "d'Arc" in b

    def test_deterministic_sorted(self):
        assert make_aliases("A", "B") == sorted(make_aliases("A", "B"))

    def test_display_name(self):
        assert normalized_display_name("Alexandre", "Dumas", "1802", "1870") == \
            "Dumas, Alexandre (1802-1870)"


class TestHtmlToText:
    def test_roundtrip(self):
        text = "line one here\nsecond line"
        assert html_to_text(text_to_html(text, title="T")) == text

    def test_drops_head_script_style(self):
        html = b"<html><head><title>NO</title></head><body><style>x</style>" \
               b"<script>var a=1;</script><p>keep me</p></body></html>"
        assert html_to_text(html) == "keep me"

    def test_entities_and_whitespace(self):
        assert html_to_text(b"<p>a &amp; b</p><p>  c   d </p>") == "a & b\nc d"

    def test_block_vs_inline(self):
        assert html_to_text(b"<div>a</div><div>b</div>") == "a\nb"
        assert html_to_text(b"x <b>y</b> z") == "x y z"

    def test_deterministic_bytes(self):
        h = text_to_html("alpha beta\ngamma")
        assert h == text_to_html("alpha beta\ngamma")


class TestTextAnalysis:
    def test_langid(self):
        assert detect_language("the cat and the hat is on the mat") == "en"
        assert detect_language("le chat est dans la maison et il dort") == "fr"
        assert detect_language("") == "und"

    def test_quality(self):
        f = quality_features("Hello world, this is a test.")
        assert f["n_tokens"] == 6.0
        assert f["n_words"] == 6.0
        assert 0 < f["alpha_ratio"] < 1
        assert f["punct_ratio"] > 0

    def test_token_counts(self):
        assert count_tokens_ws("a b  c") == 3
        assert count_tokens_bpe("don't stop") == 4  # don / ' / t / stop

    def test_fingerprints(self):
        assert fingerprint_md5("Ab, c!") == fingerprint_md5("ab c")
        fp = rolling_fingerprints("one two three four five six seven eight nine ten")
        assert fp == rolling_fingerprints("one two three four five six seven eight nine ten")
        assert all(isinstance(x, int) for x in fp)

    def test_shingles_jaccard(self):
        a, b = char_shingles("abcdef", 3), char_shingles("abcdeg", 3)
        assert 0 < jaccard(a, b) < 1
        assert jaccard(set(), set()) == 1.0
        assert word_ngrams("a b c d", 3) == {("a", "b", "c"), ("b", "c", "d")}


class TestSketches:
    def test_minhash_similarity(self):
        a, b = minhash_params(128)
        s1 = char_shingles("the quick brown fox jumps over the lazy dog " * 3)
        s2 = char_shingles("the quick brown fox jumps over the lazy cat " * 3)
        s3 = char_shingles("completely different text about other things " * 3)
        m1 = minhash_signature(s1, a, b)
        m2 = minhash_signature(s2, a, b)
        m3 = minhash_signature(s3, a, b)
        sim12 = float(np.mean(m1 == m2))
        sim13 = float(np.mean(m1 == m3))
        assert sim12 > 0.5 > sim13

    def test_shingle_hashes64_vectorized_front_end(self):
        """The vectorized byte-shingle hasher must (a) be deterministic,
        (b) count distinct windows like char_shingles on ASCII text,
        (c) keep minhash similarity estimates in line with the string
        path, (d) handle the degenerate empty/short inputs."""
        from reden_ray.functions.text import shingle_hashes64

        t = "the quick brown fox jumps over the lazy dog " * 3
        h = shingle_hashes64(t, 5)
        assert (h == shingle_hashes64(t, 5)).all()
        assert len(h) == len(char_shingles(t, 5))  # ASCII: bytes == chars
        assert h.dtype == np.uint64

        assert shingle_hashes64("", 5).size == 0
        assert shingle_hashes64("   ", 5).size == 0
        assert len(shingle_hashes64("ab", 5)) == 1  # whole short text

        a, b = minhash_params(128)
        m1 = minhash_signature(shingle_hashes64(t, 5), a, b)
        m2 = minhash_signature(
            shingle_hashes64("the quick brown fox jumps over the lazy cat " * 3, 5),
            a, b)
        m3 = minhash_signature(
            shingle_hashes64("completely different text about other things " * 3, 5),
            a, b)
        assert float(np.mean(m1 == m2)) > 0.5 > float(np.mean(m1 == m3))
        # empty-array input -> the all-max sentinel signature, matching
        # the empty-set string path
        empty = minhash_signature(shingle_hashes64("", 5), a, b)
        assert (empty == minhash_signature(set(), a, b)).all()

    def test_simhash(self):
        h1 = simhash64("the quick brown fox jumps over the lazy dog")
        h2 = simhash64("the quick brown fox jumps over the lazy cat")
        h3 = simhash64("entirely unrelated words appear here instead now")
        assert hamming64(h1, h2) < hamming64(h1, h3)
        assert simhash64("") == 0


class TestPiiScrub:
    def test_masks_emails_then_phones(self):
        import pyarrow as pa

        from reden_ray.functions.text import scrub_pii_batch

        col = pa.array([
            "mail john.doe+x@sub.example.co.uk or call +1 555-010-9999",
            "no pii. v1.2.3 released",
            "a@b.cc and edge@x.io.",
        ])
        clean, n_emails, n_phones = scrub_pii_batch(col)
        assert clean.to_pylist() == [
            "mail <EMAIL> or call <PHONE>",
            "no pii. v1.2.3 released",
            "<EMAIL> and <EMAIL>.",
        ]
        assert n_emails.to_pylist() == [1, 0, 2]
        assert n_phones.to_pylist() == [1, 0, 0]

    def test_matches_duckdb_re2_semantics(self):
        """The oracle relies on Arrow and DuckDB sharing RE2: the same
        pattern strings must produce byte-identical masks."""
        import duckdb
        import pyarrow as pa

        from reden_ray.functions.text import (
            PII_EMAIL_PATTERN,
            PII_PHONE_PATTERN,
            scrub_pii_batch,
        )

        texts = [
            "call (555) 123 4567 x89 or +33 1 42 86 82 00",
            "unicode café user_名@example.org",  # non-ASCII local part: no match
            "dates 2020-01-02 and 1234567 run",
        ]
        clean, _ne, _np = scrub_pii_batch(pa.array(texts))
        con = duckdb.connect()
        for t, got in zip(texts, clean.to_pylist()):
            want = con.execute(
                "SELECT regexp_replace(regexp_replace(?, ?, '<EMAIL>', 'g'),"
                " ?, '<PHONE>', 'g')",
                [t, PII_EMAIL_PATTERN, PII_PHONE_PATTERN]).fetchone()[0]
            assert got == want


class TestHostStats:
    def test_blocklist_and_grouping(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from reden_ray.pipelines.relational import q33_host_stats

        n = 170  # 10 docs per host over the 17-host spread
        pq.write_table(pa.table({
            "doc_id": pa.array(range(n), pa.int64()),
            "n_chars": pa.array([7] * n, pa.int64()),
            "text": pa.array(["x"] * n, pa.string()),
        }), tmp_path / "documents.parquet")
        out = q33_host_stats(str(tmp_path)).sort_values("host")
        assert len(out) == 15  # 17 hosts minus the 2 blocked
        assert set(out["n_pages"]) == {10}
        assert set(out["n_chars"]) == {70}
        assert not any(h in ("cdn3.example.org", "cdn7.example.org")
                       for h in out["host"])


class TestHostCap:
    def test_cap_keeps_k_lowest_ids_per_host(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from reden_ray.pipelines.relational import _HOST_CAP_K, q34_host_cap

        n = 17 * (_HOST_CAP_K + 5)  # every host over the cap
        pq.write_table(pa.table({
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["x"] * n, pa.string()),
        }), tmp_path / "documents.parquet")
        out = q34_host_cap(str(tmp_path))
        assert len(out) == 17 * _HOST_CAP_K
        by_host = out.groupby("host")["doc_id"]
        assert (by_host.count() == _HOST_CAP_K).all()
        # the kept ids are the K LOWEST of each host's arithmetic spread
        for host, ids in by_host.apply(sorted).items():
            h = int(host.removeprefix("https://cdn").split(".")[0])
            assert ids == [h + 17 * i for i in range(_HOST_CAP_K)]

    def test_under_cap_passes_through(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from reden_ray.pipelines.relational import q34_host_cap

        pq.write_table(pa.table({
            "doc_id": pa.array(range(17), pa.int64()),  # 1 doc per host
            "text": pa.array(["x"] * 17, pa.string()),
        }), tmp_path / "documents.parquet")
        out = q34_host_cap(str(tmp_path))
        assert sorted(out["doc_id"]) == list(range(17))


class TestDecontaminate:
    def test_probe_hits_source_and_contaminated_docs(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from reden_ray.pipelines.relational import q35_decontaminate

        probe_text = "alpha beta gamma delta epsilon zeta eta theta tail0"
        rows = {
            0: probe_text,                        # probe source (0 % 97 == 0)
            1: "clean words only here",
            2: f"prefix then {probe_text} suffix",  # contaminated
            3: "alpha beta gamma delta",          # partial ngram: no hit
            97: "another probe source words one two three four five",
        }
        ids = sorted(rows)
        pq.write_table(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([rows[i] for i in ids], pa.string()),
        }), tmp_path / "documents.parquet")
        out = q35_decontaminate(str(tmp_path)).set_index("doc_id")
        assert sorted(out.index) == [0, 2, 97]
        assert out.loc[0, "n_probes_hit"] == 1
        assert out.loc[2, "n_probes_hit"] == 1
        assert out.loc[97, "n_probes_hit"] == 1


class TestSimhashBatch:
    def test_batch_equals_per_doc(self):
        from reden_ray.functions.text import simhash64, simhash64_batch

        texts = ["", "one", "Hello world hello WORLD", "a b c d e f g",
                 "répété répété unicode çà", "the quick brown fox",
                 "  ", "123 456 123", "tie tie", "x"]
        got = simhash64_batch(texts)
        assert [int(v) for v in got] == [simhash64(t) for t in texts]

    def test_empty_edges(self):
        import numpy as np

        from reden_ray.functions.text import simhash64_batch

        assert simhash64_batch([]).shape == (0,)
        assert (simhash64_batch(["", "", ""]) == np.uint64(0)).all()


class TestLineDedup:
    def test_c4_rule_keeps_one_occurrence_in_min_doc(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from reden_ray.pipelines.relational import q36_line_dedup

        shared = " ".join(f"w{i}" for i in range(10))       # one full line
        uniq = lambda tag: " ".join(f"{tag}{i}" for i in range(10))
        rows = {
            3: f"{shared} {uniq('a')}",   # min doc containing `shared`
            5: f"{uniq('b')} {shared}",   # loses its copy of `shared`
            9: shared,                    # all lines dup'd away: vanishes
            11: "short tail words",       # partial line, unique: kept
        }
        ids = sorted(rows)
        pq.write_table(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([rows[i] for i in ids], pa.string()),
        }), tmp_path / "documents.parquet")
        out = q36_line_dedup(str(tmp_path)).set_index("doc_id")
        assert sorted(out.index) == [3, 5, 11]
        assert out.loc[3, "clean_text"] == rows[3]
        assert out.loc[5, "clean_text"] == uniq("b")
        assert out.loc[11, "clean_text"] == "short tail words"


class TestBoilerplateRemoval:
    def test_host_scoped_removal(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from reden_ray.pipelines.relational import q74_boilerplate_removal

        nav = " ".join(f"nav{i}" for i in range(10))     # one full line
        uniq = lambda tag: " ".join(f"{tag}{i}" for i in range(10))
        rows = {
            # host 0 (doc_id % 17): nav recurs in docs 0 and 17 -> chrome
            0: f"{nav} {uniq('a')}",      # loses nav, keeps a-line
            17: nav,                      # loses everything -> clean ''
            34: uniq("b"),                # host 0 but untouched: absent
            # host 1: the SAME nav line, but only one doc -> kept (the
            # rule is host-scoped), absent from output
            1: nav,
            # host 0: a line repeated within ONE doc is not chrome
            # (distinct-doc count is 1), absent from output
            51: f"{uniq('r')} {uniq('r')}",
        }
        ids = sorted(rows)
        pq.write_table(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([rows[i] for i in ids], pa.string()),
        }), tmp_path / "documents.parquet")
        out = q74_boilerplate_removal(str(tmp_path)).set_index("doc_id")
        assert sorted(out.index) == [0, 17]
        assert out.loc[0, "n_removed"] == 1
        assert out.loc[0, "clean_text"] == uniq("a")
        assert out.loc[17, "n_removed"] == 1
        assert out.loc[17, "clean_text"] == ""


class TestRepetitionStats:
    def test_dup_2gram_fraction(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from reden_ray.pipelines.relational import q37_repetition_stats

        rows = {
            1: "a b a b a",        # grams: ab ba ab ba -> 4 grams, 2 distinct
            2: "x y z w",          # all distinct -> 0.0
            3: "solo",             # no 2-grams: absent from output
            4: "r r r r",          # rr rr rr -> 3 grams, 1 distinct
        }
        ids = sorted(rows)
        pq.write_table(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([rows[i] for i in ids], pa.string()),
        }), tmp_path / "documents.parquet")
        out = q37_repetition_stats(str(tmp_path)).set_index("doc_id")
        assert sorted(out.index) == [1, 2, 4]
        assert out.loc[1, "n_grams"] == 4 and out.loc[1, "dup2gram_frac"] == 0.5
        assert out.loc[2, "dup2gram_frac"] == 0.0
        assert out.loc[4, "n_grams"] == 3
        assert abs(out.loc[4, "dup2gram_frac"] - round(1 - 1 / 3, 6)) < 1e-12


class TestTopTerms:
    def test_rank_and_tiebreak(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from reden_ray.pipelines.relational import q38_top_terms

        # all doc_ids ≡ 0 (mod 17): one host, controlled counts
        pq.write_table(pa.table({
            "doc_id": pa.array([0, 17, 34], pa.int64()),
            "text": pa.array([
                "apple apple banana cherry",
                "apple banana banana date",
                "cherry apple zebra zebra",   # zebra ties banana at 2? no: zebra 2, banana 3
            ], pa.string()),
        }), tmp_path / "documents.parquet")
        out = q38_top_terms(str(tmp_path)).sort_values("rank")
        assert list(out["host"].unique()) == ["https://cdn0.example.org"]
        # counts: apple 4, banana 3, cherry 2, zebra 2, date 1
        assert list(out["word"]) == ["apple", "banana", "cherry"]
        assert list(out["cnt"]) == [4, 3, 2]  # cherry beats zebra lexicographically
        assert list(out["rank"]) == [1, 2, 3]


class TestTokenShards:
    def test_exclusive_prefix_sharding(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from reden_ray.pipelines.relational import (
            _SHARD_RANGE_WIDTH,
            _SHARD_TOKEN_BUDGET,
            q39_token_shards,
        )

        # docs of 600 tokens each; budget 2000 -> shard boundary inside
        # doc 3 (exclusive prefix 1800 < 2000) then doc 4 starts shard 1
        n = 8
        text = " ".join(["w"] * 600)
        # ids straddle a range-bucket boundary to exercise the offsets
        ids = [0, 1, 2, _SHARD_RANGE_WIDTH - 1, _SHARD_RANGE_WIDTH,
               _SHARD_RANGE_WIDTH + 1, 3 * _SHARD_RANGE_WIDTH, 10**6]
        pq.write_table(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([text] * n, pa.string()),
        }), tmp_path / "documents.parquet")
        out = (q39_token_shards(str(tmp_path))
               .sort_values("doc_id").reset_index(drop=True))
        assert list(out["doc_id"]) == sorted(ids)
        want = [(600 * i) // _SHARD_TOKEN_BUDGET for i in range(n)]
        assert list(out["shard"]) == want
        assert set(out["n_tokens"]) == {600}
