"""Curation-operator tests (q45-q48): exact quantiles, stratified
mixture sampling, distributed k-means, bigram-LM coverage scoring."""

import math
import random

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from reden_ray.pipelines.curation import (
    _KMEANS_K,
    _bigrams_flat,
    _mix_rate_permille,
    _quantize,
    exact_quantiles,
    kmeans_assign,
)

SF = "/root/testdata/sf0.001"


class TestQuantileFormula:
    def test_position_matches_percentile_disc(self):
        """ceil(q*n) 1-indexed reproduces DuckDB percentile_disc across
        randomized sizes and duplicate-heavy data."""
        con = duckdb.connect()
        rng = random.Random(11)
        for _ in range(25):
            n = rng.randint(1, 400)
            vals = [rng.randint(0, 30) for _ in range(n)]
            s = sorted(vals)
            con.sql("DROP TABLE IF EXISTS t")
            con.sql("CREATE TABLE t(x INT)")
            con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
            for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
                duck = con.sql(
                    f"SELECT percentile_disc({q}) WITHIN GROUP (ORDER BY x) FROM t"
                ).fetchone()[0]
                pos = max(math.ceil(q * n), 1)
                assert s[pos - 1] == duck, (n, q)

    def test_distributed_histogram_path(self):
        rng = random.Random(5)
        vals = [rng.randint(0, 50) for _ in range(997)]
        ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.int64())}))
        out = exact_quantiles(ds, "x")
        s = sorted(vals)
        for r in out.itertuples():
            pos = max(math.ceil((r.q_permille / 1000.0) * len(vals)), 1)
            assert r.value == s[pos - 1]

    def test_empty_input(self):
        ds = rd.from_arrow(pa.table({"x": pa.array([], pa.int64())}))
        assert len(exact_quantiles(ds, "x")) == 0

    def test_approx_histogram_error_bound_and_split_invariance(self):
        """The fixed-grid sketch's estimate is the upper edge of the
        bin containing the exact percentile_disc value: exact <= est
        <= exact + W-1, for every quantile, regardless of block
        splits."""
        from reden_ray.pipelines.curation import (HIST_BIN_WIDTH,
                                                  approx_quantiles_histogram)

        rng = random.Random(17)
        vals = [rng.randint(0, 5000) for _ in range(1231)]
        t = pa.table({"x": pa.array(vals, pa.int64())})
        exact = exact_quantiles(rd.from_arrow(t), "x").set_index("q_permille")
        for parts in (1, 13):
            ds = rd.from_arrow(t).repartition(parts)
            out = approx_quantiles_histogram(ds, "x").set_index("q_permille")
            for pm in out.index:
                e, a = int(exact.loc[pm, "value"]), int(out.loc[pm, "est_value"])
                assert e <= a <= e + HIST_BIN_WIDTH - 1, (pm, e, a)

    def test_approx_histogram_clamps_overflow_bin(self):
        from reden_ray.pipelines.curation import (HIST_BIN_WIDTH, HIST_N_BINS,
                                                  approx_quantiles_histogram)

        top = HIST_BIN_WIDTH * HIST_N_BINS
        ds = rd.from_arrow(pa.table({"x": pa.array(
            [1, 2, top * 3, top * 9], pa.int64())}))
        out = approx_quantiles_histogram(ds, "x").set_index("q_permille")
        # overflow values land in (and report) the LAST bin's upper edge
        assert int(out.loc[990, "est_value"]) == top - 1

    def test_grouped_matches_per_key_ungrouped(self):
        """The vectorized in-bucket solve equals running the plain q75
        sketch on each key's rows separately, on every key, regardless
        of block splits (incl. a 1-row key)."""
        from reden_ray.pipelines.curation import (
            approx_quantiles_histogram, grouped_approx_quantiles)

        rng = random.Random(23)
        keys, vals = [], []
        for k, size in (("a", 811), ("b", 97), ("c", 1)):
            keys += [k] * size
            vals += [rng.randint(0, 3000) for _ in range(size)]
        t = pa.table({"k": pa.array(keys), "x": pa.array(vals, pa.int64())})
        for parts in (1, 11):
            got = grouped_approx_quantiles(
                rd.from_arrow(t).repartition(parts), "k", "x")
            for k in ("a", "b", "c"):
                mask = [kk == k for kk in keys]
                sub = pa.table({"x": pa.array(
                    [v for v, m in zip(vals, mask) if m], pa.int64())})
                want = approx_quantiles_histogram(rd.from_arrow(sub), "x")
                sel = (got[got["k"] == k]
                       .drop(columns="k").reset_index(drop=True))
                pd.testing.assert_frame_equal(sel, want)


class TestRankTransform:
    def test_matches_strict_smaller_count(self):
        """n_smaller equals the count of strictly-smaller values, with
        ties sharing a rank, regardless of block splits."""
        from reden_ray.pipelines.curation import rank_transform

        rng = random.Random(29)
        vals = [rng.randint(0, 40) for _ in range(503)]
        t = pa.table({"doc_id": pa.array(range(len(vals)), pa.int64()),
                      "x": pa.array(vals, pa.int64())})
        s = sorted(vals)
        for parts in (1, 9):
            out = (rank_transform(rd.from_arrow(t).repartition(parts), "x")
                   .to_pandas().sort_values("doc_id"))
            for v, r in zip(out["x"], out["n_smaller"]):
                import bisect
                assert r == bisect.bisect_left(s, v)

    def test_rank_is_sort_free_normalizer(self):
        """Equal values share ranks; max rank + its multiplicity = n."""
        from reden_ray.pipelines.curation import rank_transform

        t = pa.table({"doc_id": pa.array(range(6), pa.int64()),
                      "x": pa.array([5, 5, 1, 9, 9, 9], pa.int64())})
        out = rank_transform(rd.from_arrow(t), "x").to_pandas()
        by_v = out.groupby("x")["n_smaller"].agg(["min", "max", "size"])
        assert (by_v["min"] == by_v["max"]).all()
        assert by_v.loc[1, "min"] == 0
        assert by_v.loc[5, "min"] == 1
        assert by_v.loc[9, "min"] == 3


class TestMixtureSample:
    def test_rate_and_determinism(self):
        from reden_ray.pipelines.curation import q46_domain_mixture_sample

        a = q46_domain_mixture_sample(SF)
        b = q46_domain_mixture_sample(SF)
        pd.testing.assert_frame_equal(
            a.sort_values("doc_id").reset_index(drop=True),
            b.sort_values("doc_id").reset_index(drop=True))
        # achieved per-host rate tracks the target (multiplicative hash
        # is near-uniform; wide tolerance for small strata)
        n_total = duckdb.sql(
            f"SELECT COUNT(*) FROM read_parquet('{SF}/documents.parquet')"
        ).fetchone()[0]
        per_host_total = n_total / 17
        got = a.groupby("rate_permille").size()
        for rate, n_kept in got.items():
            assert n_kept <= per_host_total * 2
            assert abs(n_kept / per_host_total - rate / 1000.0) < 0.45


class TestKMeans:
    def test_quantize_matches_duckdb_round(self):
        xs = np.array([0.5, -0.5, 1.5, -1.5, 2.5, 0.4999, -0.0, 3.123],
                      np.float32) / 1048576.0
        q = _quantize(xs.reshape(-1, 1)).ravel()
        duck = [duckdb.sql(
            f"SELECT CAST(ROUND(CAST({float(v)!r} AS DOUBLE) * 1048576.0, 0)"
            " AS BIGINT)").fetchone()[0] for v in xs]
        assert q.tolist() == duck

    def test_assignment_properties(self):
        ds = rd.read_parquet(f"{SF}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        out = kmeans_assign(ds).to_pandas()
        n = duckdb.sql(
            f"SELECT COUNT(*) FROM read_parquet('{SF}/embeddings.parquet')"
        ).fetchone()[0]
        assert len(out) == n
        assert out["cluster"].between(0, _KMEANS_K - 1).all()
        assert out["cluster"].nunique() >= 2  # non-degenerate
        # deterministic across runs (integer partial sums are
        # order-independent, so block arrival order cannot leak in)
        out2 = kmeans_assign(ds).to_pandas()
        pd.testing.assert_frame_equal(
            out.sort_values("vec_id").reset_index(drop=True),
            out2.sort_values("vec_id").reset_index(drop=True))

    def test_seeds_assign_to_themselves_round1(self):
        """With rounds=1 (pure seeded assignment), every seed point is
        distance-0 from its own centroid."""
        ds = rd.read_parquet(f"{SF}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        out = kmeans_assign(ds, rounds=1).to_pandas()
        seeds = out[out["vec_id"] < _KMEANS_K].sort_values("vec_id")
        assert seeds["cluster"].tolist() == list(range(_KMEANS_K))


class TestSemanticDedup:
    def test_planted_pairs_recovered_exactly(self):
        """Every planted (original, perturbed-copy) pair is recovered,
        nothing else qualifies, and distances stay within the plant's
        64*9 bound — the math is all-int64 so this is exact."""
        from reden_ray.pipelines.curation import (_SEMDEDUP_COPY_OFFSET,
                                                  q49_semantic_dedup)

        out = q49_semantic_dedup(SF)
        n = duckdb.sql(
            f"SELECT COUNT(*) FROM read_parquet('{SF}/embeddings.parquet')"
        ).fetchone()[0]
        assert len(out) == n
        assert (out["id_b"] - out["id_a"] == _SEMDEDUP_COPY_OFFSET).all()
        assert (out["d2"] <= 64 * 9).all()
        assert out["id_a"].is_unique


class TestBPE:
    def _wf(self, rows):
        return pd.DataFrame({"word": [w for w, _ in rows],
                             "f": pd.array([f for _, f in rows],
                                           dtype="int64")})

    def test_greedy_left_overlap(self):
        """'aaa' holds TWO overlapping (a,a) positions for counting but
        only ONE greedy-left merge applies — the wrapped-string replace
        reproduces symbol-list semantics."""
        from reden_ray.pipelines.curation import bpe_train

        out = bpe_train(self._wf([("aaa", 1)]), n_merges=2)
        assert out.iloc[0][["l", "r", "cnt"]].tolist() == ["a", "a", 2]
        # after merging -> [aa, a]; the next pair is (aa, a) counted once
        assert out.iloc[1][["l", "r", "cnt"]].tolist() == ["aa", "a", 1]

    def test_no_cross_symbol_false_match(self):
        """Symbols 'a'+'ab' must NOT be corrupted by an (a,a) merge:
        the wrapper encoding prevents substring false positives."""
        from reden_ray.pipelines.curation import bpe_train

        # 'aab' -> [a,a,b] merges (a,a); 'ab' -> [a,b] must stay intact
        out = bpe_train(self._wf([("aab", 3), ("ab", 5)]), n_merges=2)
        assert out.iloc[0][["l", "r"]].tolist() == ["a", "b"]  # cnt 5+3? no:
        # pairs: (a,a)x3 from aab, (a,b)x3 (aab) + x5 (ab) = 8 -> (a,b) wins
        assert out.iloc[0]["cnt"] == 8

    def test_tiebreak_lexicographic(self):
        from reden_ray.pipelines.curation import bpe_train

        # (a,b) and (c,d) both count 2 -> smallest (l, r) wins
        out = bpe_train(self._wf([("ab", 2), ("cd", 2)]), n_merges=1)
        assert out.iloc[0][["l", "r", "cnt"]].tolist() == ["a", "b", 2]

    def test_tokenize_applies_merges_and_falls_back(self):
        """q70 plumbing: trained merges shrink token counts; words
        outside the training vocabulary fall back to char count."""
        import ray.data as rd

        from reden_ray.pipelines.curation import (bpe_apply,
                                                  bpe_token_counts,
                                                  bpe_train)

        wf = self._wf([("abab", 4), ("ab", 2)])
        merges = bpe_train(wf, n_merges=2)  # (a,b) -> ab; (ab,ab) -> abab
        seqs = bpe_apply(wf, merges)
        assert seqs["abab"].count(" ") + 1 == 1
        assert seqs["ab"].count(" ") + 1 == 1
        docs = pd.DataFrame({"doc_id": [1, 2, 3],
                             "text": ["abab ab", "ab", "zzz"]})
        out = bpe_token_counts(rd.from_pandas(docs).repartition(2),
                               "doc_id", "text", wf, merges) \
            .to_pandas().set_index("doc_id")["n_bpe"]
        assert out[1] == 2 and out[2] == 1
        assert out[3] == 3  # unseen word: char-count fallback

    def test_q70_matches_oracle(self):
        from reden_ray.pipelines.curation import Q70_SQL, q70_bpe_tokenize

        got = q70_bpe_tokenize(SF).sort_values("doc_id").reset_index(drop=True)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
        want = con.sql(Q70_SQL).df().sort_values("doc_id") \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_distributed_word_freq_matches_duckdb(self):
        from reden_ray.pipelines.curation import q50_bpe_merges

        got = q50_bpe_merges(SF)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
        from reden_ray.pipelines.curation import Q50_SQL

        want = con.sql(Q50_SQL).df()
        pd.testing.assert_frame_equal(
            got.sort_values("step").reset_index(drop=True),
            want.sort_values("step").reset_index(drop=True)
            .astype({"step": "int64", "cnt": "int64"}))


class TestHLL:
    def test_estimate_tracks_exact_distinct(self):
        """The register table is exact (hash-verified); here the
        derived estimator must land near the true distinct count
        (~1.04/sqrt(64) ≈ 13% relative error for HLL at P=6)."""
        import numpy as np

        from reden_ray.pipelines.curation import (_HLL_P,
                                                  hll_estimate,
                                                  q51_hll_registers)

        regs = q51_hll_registers(SF)
        exact = duckdb.sql(
            f"SELECT event_type, COUNT(DISTINCT user_id) AS d "
            f"FROM read_parquet('{SF}/events.parquet') GROUP BY event_type"
        ).df().set_index("event_type")["d"]
        for et, g in regs.groupby("event_type"):
            full = np.zeros(1 << _HLL_P, dtype=np.int64)
            full[g["bucket"].to_numpy()] = g["max_rank"].to_numpy()
            est = hll_estimate(full)
            assert abs(est / exact[et] - 1.0) < 0.35, (et, est, exact[et])

    def test_rank_extraction_exact(self):
        import numpy as np

        from reden_ray.pipelines.curation import (_HLL_P, _HLL_WBITS,
                                                  hll_ranks)

        # boundary values: w = 0, 1, powers of two, max
        uid = np.arange(0, 5000, dtype=np.int64)
        bucket, rank = hll_ranks(uid)
        assert bucket.min() >= 0 and bucket.max() < (1 << _HLL_P)
        assert rank.min() >= 1 and rank.max() <= _HLL_WBITS + 1
        # cross-check a few against pure-python bit_length
        h = (uid * 2654435761) % 4294967296
        w = h >> _HLL_P
        for i in range(0, 5000, 371):
            expect = (_HLL_WBITS + 1 if w[i] == 0
                      else _HLL_WBITS + 1 - int(w[i]).bit_length())
            assert rank[i] == expect


class TestInvertedIndex:
    def test_postings_sorted_and_consistent(self):
        from reden_ray.pipelines.curation import q52_inverted_index

        out = q52_inverted_index(SF)
        assert len(out) > 0
        for r in out.itertuples():
            ids = [int(x) for x in r.postings.split(",")]
            assert ids == sorted(ids)
            assert len(ids) == len(set(ids)) == r.df_count


class TestMomentMatrix:
    def test_ridge_recovers_separation(self):
        """The driver-side ridge solve over the exact distributed
        moments must separate the label (perfectly encoded in f1 here;
        real pipelines feed human/LLM labels through this plumbing)."""
        import numpy as np

        from reden_ray.pipelines.curation import (_q53_features,
                                                  q53_moment_matrix,
                                                  ridge_from_moments)
        import pyarrow.parquet as pq

        moments = q53_moment_matrix(SF)
        w = ridge_from_moments(moments, lam=1e-6)
        t = pq.read_table(f"{SF}/documents.parquet",
                          columns=["text", "n_chars"])
        x = _q53_features(t)
        pred = (x[:, :-1].astype(np.float64) @ w) >= 0.5
        acc = (pred == (x[:, -1] == 1)).mean()
        assert acc >= 0.95, acc

    def test_moments_symmetric_consistent(self):
        from reden_ray.pipelines.curation import q53_moment_matrix

        m = q53_moment_matrix(SF)
        assert len(m) == 15
        n = int(m[(m["i"] == 0) & (m["j"] == 0)]["value"].iloc[0])
        # SUM(y*y) == SUM(y) <= n for a 0/1 label
        syy = int(m[(m["i"] == 4) & (m["j"] == 4)]["value"].iloc[0])
        assert 0 < syy < n


class TestAsofJoin:
    def test_backward_inclusive_and_tie_semantics(self):
        import pyarrow as _pa

        from reden_ray.pipelines.curation import asof_join

        def mk(rows, idc):
            return rd.from_arrow(_pa.table({
                "user_id": _pa.array([r[0] for r in rows], _pa.int64()),
                "ts": _pa.array([pd.Timestamp(r[1]) for r in rows],
                                _pa.timestamp("us")),
                idc: _pa.array([r[2] for r in rows], _pa.int64()),
            }))

        left = mk([(1, "2024-01-01 10:00", 100),
                   (1, "2024-01-01 09:00", 101),
                   (2, "2024-01-01 10:00", 102)], "event_id")
        right = mk([(1, "2024-01-01 10:00", 200),   # exact match wins
                    (1, "2024-01-01 10:00", 201),   # tie -> max id
                    (1, "2024-01-01 08:00", 202),
                    (2, "2024-01-01 11:00", 203)], "event_id")  # future
        out = (asof_join(left, right, "user_id", "ts",
                         "event_id", "event_id")
               .to_pandas().sort_values("left_id").reset_index(drop=True))
        assert out["left_id"].tolist() == [100, 101]
        assert out["right_id"].tolist() == [201, 202]  # tie broke to 201
        assert out["lag_us"].tolist() == [0, 3600_000_000]
        # user 2 has only a FUTURE right row -> no match emitted

    def test_matches_are_prior_clicks(self):
        from reden_ray.pipelines.curation import q54_asof_join

        out = q54_asof_join(SF)
        assert (out["lag_us"] >= 0).all()
        assert out["view_id"].is_unique


class TestRangeJoin:
    def test_every_pair_satisfies_predicate(self):
        from reden_ray.pipelines.curation import (_BAND_W, _RANGE_BIN,
                                                  q55_range_join)

        out = q55_range_join(SF)
        ev = duckdb.sql(
            f"SELECT event_id, value FROM "
            f"read_parquet('{SF}/events.parquet')").df().set_index(
            "event_id")["value"]
        v = ev.loc[out["event_id"]].to_numpy()
        lo = out["band_id"].to_numpy() * _RANGE_BIN
        assert ((v >= lo) & (v < lo + _BAND_W)).all()
        # completeness: per-event match count == analytic band count
        import numpy as np

        ks = np.arange(0, 102)
        expect = sum(int(((vv >= ks * _RANGE_BIN)
                          & (vv < ks * _RANGE_BIN + _BAND_W)).sum())
                     for vv in ev.to_numpy())
        assert len(out) == expect


class TestBigramLM:
    def test_bigram_mint_matches_reference(self):
        t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                      "text": pa.array(["a b c", "x", "p q"], pa.string())})
        grams, par = _bigrams_flat(t)
        assert grams.to_pylist() == ["a b", "b c", "p q"]
        assert par.tolist() == [0, 0, 2]

    def test_subset_docs_fully_known(self):
        """Every bigram of a model-subset doc is by construction in the
        model, so its coverage is total."""
        from reden_ray.pipelines.curation import (_LM_SUBSET_MOD,
                                                  q48_bigram_lm_score)

        out = q48_bigram_lm_score(SF)
        sub = out[out["doc_id"] % _LM_SUBSET_MOD == 0]
        assert len(sub) > 0
        assert (sub["n_known"] == sub["n_bigrams"]).all()
        assert (out["known_mass"] >= out["n_known"]).all()
        assert (out["n_known"] <= out["n_bigrams"]).all()


class TestDepthBins:
    def test_matches_oracle(self):
        import duckdb
        import pandas as pd

        from reden_ray.pipelines.curation import Q93_SQL, q93_depth_bins

        sf = "/root/testdata/sf0.001"
        got = q93_depth_bins(sf)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf}/documents.parquet'")
        want = con.sql(Q93_SQL).df()
        cols = sorted(got.columns)
        assert cols == sorted(want.columns)
        g = got[cols].sort_values(cols).reset_index(drop=True)
        w = want[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(g, w, check_dtype=False)
        # deciles are near-balanced on a continuous-ish metric
        sizes = got.groupby("depth_bin").size()
        assert len(sizes) == 10
        assert sizes.max() <= 2 * sizes.min()


class TestSkipgramPairs:
    def test_matches_oracle(self):
        import duckdb
        import pandas as pd

        from reden_ray.pipelines.curation import (Q94_SQL,
                                                  q94_skipgram_pairs)

        sf = "/root/testdata/sf0.001"
        got = q94_skipgram_pairs(sf)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf}/documents.parquet'")
        want = con.sql(Q94_SQL).df()
        cols = sorted(got.columns)
        assert cols == sorted(want.columns)
        g = got[cols].sort_values(cols).reset_index(drop=True)
        w = want[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(g, w, check_dtype=False)

    def test_planted_window(self):
        import pandas as pd
        import ray.data as rd

        from reden_ray.pipelines.curation import skipgram_pairs

        df = pd.DataFrame({"text": ["a b c a b c a b c"]})
        out = skipgram_pairs(rd.from_pandas(df), min_count=1)
        out = out.set_index(["w1", "w2"])["cnt"]
        assert out.loc[("a", "b")] == 3   # d=1: positions (1,2),(4,5),(7,8)
        assert out.loc[("a", "c")] == 3   # d=2
        assert out.loc[("c", "a")] == 2   # d=1 across the repeats
        assert out.loc[("b", "a")] == 2   # d=2 across the repeats
        assert ("a", "a") not in out.index  # same-word gap is 3 > window


class TestLexicalDiversity:
    def test_matches_oracle(self):
        import duckdb
        import pandas as pd

        from reden_ray.pipelines.curation import (Q95_SQL,
                                                  q95_lexical_diversity)

        sf = "/root/testdata/sf0.001"
        got = q95_lexical_diversity(sf)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf}/documents.parquet'")
        want = con.sql(Q95_SQL).df()
        cols = sorted(got.columns)
        assert cols == sorted(want.columns)
        g = got[cols].sort_values(cols).reset_index(drop=True)
        w = want[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(g, w, check_dtype=False)
