"""q66-q69: skew join, ranked retrieval, Count-Min sketch, split."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from reden_ray.pipelines import scaleops as S

SF = "/root/testdata/sf0.001"


def _con(sf=SF):
    con = duckdb.connect()
    for t in ("events", "customer", "documents"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


class TestSkewJoin:
    def _frames(self, n_rows=4000, hot_frac=0.5, n_keys=64, seed=7):
        rng = np.random.default_rng(seed)
        cold = rng.integers(1, n_keys, size=n_rows)
        hot_mask = rng.random(n_rows) < hot_frac
        key = np.where(hot_mask, 0, cold)          # key 0 is the head entity
        big = pd.DataFrame({"k": key.astype("int64"),
                            "v": np.arange(n_rows, dtype="int64")})
        dim = pd.DataFrame({"k": np.arange(n_keys, dtype="int64"),
                            "label": [f"e{i}" for i in range(n_keys)]})
        return big, dim

    def _run(self, big, dim, **kw):
        out = S.skew_join(
            rd.from_pandas(big).repartition(8),
            rd.from_pandas(dim).repartition(2), "k", **kw).to_pandas()
        return _norm(out)

    def test_routes_agree_and_match_pandas(self):
        big, dim = self._frames()
        gold = _norm(big.merge(dim, on="k"))
        auto = self._run(big, dim)                       # MG detects key 0
        all_cold = self._run(big, dim, force_hot=[])
        all_hot = self._run(big, dim, force_hot=list(range(64)))
        mixed = self._run(big, dim, force_hot=[0, 1, 2])
        # gate forced to 0: the distributed hash join route
        dist = self._run(big, dim, force_hot=[0, 1], cold_broadcast_limit=0)
        for got in (auto, all_cold, all_hot, mixed, dist):
            pd.testing.assert_frame_equal(got, gold)

    def test_detector_finds_planted_head(self):
        from reden_ray.pipelines.selection import heavy_hitters
        big, _ = self._frames()
        hh = heavy_hitters(rd.from_pandas(big[["k"]]).repartition(8), "k",
                           capacity=S._HOT_CAPACITY)
        n = len(big)
        hot = hh.loc[hh["mg_count"] >= S._HOT_MIN_FRAC * n, "k"].tolist()
        assert 0 in hot  # the 50% head key must be routed around the shuffle

    def test_non_overlapping_keys_drop(self):
        big = pd.DataFrame({"k": [1, 2, 3, 99], "v": [10, 20, 30, 40]})
        dim = pd.DataFrame({"k": [2, 3, 4], "label": ["b", "c", "d"]})
        got = self._run(big, dim, force_hot=[2])
        gold = _norm(big.merge(dim, on="k"))
        pd.testing.assert_frame_equal(got, gold)

    def test_q66_matches_oracle(self):
        got = _norm(S.q66_skew_join_revenue(SF))
        gold = _norm(_con().execute(S.Q66_SQL).df())
        pd.testing.assert_frame_equal(got, gold, check_dtype=False)


class TestRankedRetrieval:
    def test_q67_matches_oracle(self):
        got = S.q67_ranked_retrieval(SF)
        gold = _con().execute(S._q67_sql()).df()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), gold, check_dtype=False)

    def test_rare_term_outranks_common(self):
        # a doc holding the corpus-unique term must beat tf of common terms
        docs = pd.DataFrame({
            "doc_id": np.arange(50, dtype="int64"),
            "text": ["common common common"] * 49 + ["common uniqword"],
        })
        out = S.quantized_idf_topk(
            rd.from_pandas(docs).repartition(4), "doc_id", "text",
            ["common", "uniqword"], k=3)
        assert out.iloc[0]["doc_id"] == 49

    def test_no_matches_empty(self):
        docs = pd.DataFrame({"doc_id": [1, 2], "text": ["a b", "c d"]})
        out = S.quantized_idf_topk(
            rd.from_pandas(docs), "doc_id", "text", ["zzz"], k=5)
        assert len(out) == 0


class TestCMS:
    def test_q68_matches_oracle(self):
        got = _norm(S.q68_cms_frequency(SF))
        gold = _norm(_con().execute(S._q68_sql()).df())
        pd.testing.assert_frame_equal(got, gold, check_dtype=False)

    def test_overestimate_only_and_block_invariance(self):
        rng = np.random.default_rng(11)
        keys = rng.zipf(1.5, size=5000).astype("int64") % 4096
        df = pd.DataFrame({"user_id": keys})
        true = df["user_id"].value_counts()
        regs = {}
        for parts in (1, 7):
            r = S.cms_registers(rd.from_pandas(df).repartition(parts),
                                "user_id")
            regs[parts] = _norm(r)
        # sums commute: the sketch is block-split invariant
        pd.testing.assert_frame_equal(regs[1], regs[7])
        probe = np.array(sorted(true.index), dtype="int64")
        est = S.cms_estimate(regs[1], probe)
        t = true.loc[probe].to_numpy()
        assert (est >= t).all()
        # CMS guarantee: err <= e*N/W w.h.p. — use a loose 5x slack
        assert (est - t).max() <= 5 * np.e * len(df) / S._CMS_W

    def test_absent_keys_estimate_zero_or_collision(self):
        df = pd.DataFrame({"user_id": np.arange(10, dtype="int64")})
        regs = S.cms_registers(rd.from_pandas(df), "user_id")
        est = S.cms_estimate(regs, np.array([100000], dtype="int64"))
        assert est[0] >= 0


class TestPivot:
    def test_q72_matches_oracle(self):
        got = _norm(S.q72_event_pivot(SF))
        gold = _norm(_con().execute(S._q72_sql()).df())
        pd.testing.assert_frame_equal(got, gold, check_dtype=False)

    def test_missing_categories_fill_zero_and_extras_drop(self):
        df = pd.DataFrame({"u": [1, 1, 2], "t": ["a", "a", "zzz"]})
        out = S.pivot_counts(rd.from_pandas(df).repartition(2),
                             "u", "t", ["a", "b"])
        out = out.set_index("u")
        assert out.loc[1, "n_a"] == 2 and out.loc[1, "n_b"] == 0
        # user 2's only event type is unlisted -> row absent entirely
        assert 2 not in out.index

    def test_block_split_invariance(self):
        rng = np.random.default_rng(5)
        df = pd.DataFrame({"u": rng.integers(0, 50, 3000),
                           "t": rng.choice(list("abc"), 3000)})
        a = S.pivot_counts(rd.from_pandas(df).repartition(1), "u", "t", "abc")
        b = S.pivot_counts(rd.from_pandas(df).repartition(9), "u", "t", "abc")
        pd.testing.assert_frame_equal(_norm(a), _norm(b))


class TestAnchorText:
    def test_q71_matches_oracle(self):
        from reden_ray.pipelines.webops import Q71_SQL, q71_anchor_text

        got = _norm(q71_anchor_text(SF))
        gold = _norm(_con().execute(Q71_SQL).df())
        pd.testing.assert_frame_equal(got, gold, check_dtype=False)

    def test_parses_text_not_just_href(self):
        from reden_ray.pipelines.webops import anchor_text_counts

        pages = pd.DataFrame({
            "url": ["https://a.example/p/1"],
            "html": [(b'<html><body>'
                      b'<a href="https://b.example/x" class="z">hello</a>'
                      b'<a href="https://b.example/y">hello</a>'
                      b'<a href="https://c.example/">bye</a>'
                      b'</body></html>')],
        })
        out = anchor_text_counts(rd.from_pandas(pages)).to_pandas()
        out = out.set_index(["dst_host", "anchor_text"])["n_refs"]
        assert out[("b.example", "hello")] == 2
        assert out[("c.example", "bye")] == 1


class TestResample:
    def test_q73_matches_oracle(self):
        got = _norm(S.q73_activity_resample(SF))
        gold = _norm(_con().execute(S.Q73_SQL).df())
        pd.testing.assert_frame_equal(got, gold, check_dtype=False)

    def test_gap_fill_carries_cumulative(self):
        ts = pd.to_datetime(["2024-01-01 00:10", "2024-01-01 00:50",
                             "2024-01-01 03:05"])
        df = pd.DataFrame({"k": [7, 7, 7], "ts": ts})
        out = S.resample_cumulative(rd.from_pandas(df).repartition(2),
                                    "k", "ts")
        out = out.sort_values("bucket_ts").reset_index(drop=True)
        # hours 00,01,02,03 — gap hours 01/02 carry the running total 2
        assert list(out["n_cum"]) == [2, 2, 2, 3]
        assert len(out) == 4

    def test_block_split_invariance(self):
        rng = np.random.default_rng(3)
        ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 86400 * 5, 2000), unit="s")
        df = pd.DataFrame({"k": rng.integers(0, 20, 2000), "ts": ts})
        a = S.resample_cumulative(rd.from_pandas(df).repartition(1), "k", "ts")
        b = S.resample_cumulative(rd.from_pandas(df).repartition(7), "k", "ts")
        pd.testing.assert_frame_equal(_norm(a), _norm(b))


class TestSplit:
    def test_q69_matches_oracle(self):
        got = _norm(S.q69_dataset_split(SF))
        gold = _norm(_con().execute(S.Q69_SQL).df())
        pd.testing.assert_frame_equal(got, gold, check_dtype=False)

    def test_exhaustive_disjoint_reproducible(self):
        ids = pd.DataFrame({"doc_id": np.arange(5000, dtype="int64")})
        a = S.hash_split(rd.from_pandas(ids).repartition(4), "doc_id").to_pandas()
        b = S.hash_split(rd.from_pandas(ids).repartition(9), "doc_id").to_pandas()
        assert len(a) == 5000
        pd.testing.assert_frame_equal(_norm(a), _norm(b))
        frac = (a["split"] == "train").mean()
        assert 0.85 < frac < 0.95  # 900 permille target
