"""Ranking & freshness operator tests (q87-q89): grouped top-N,
reciprocal-rank fusion, dyadic time-decay."""

import duckdb
import numpy as np
import pandas as pd

import ray.data as rd

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ("orders", "documents", "events"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _assert_matches_oracle(got: pd.DataFrame, sql: str):
    con = _con()
    want = con.sql(sql).df()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


class TestGroupedTopN:
    def test_matches_oracle(self):
        from reden_ray.pipelines.rankops import Q87_SQL, q87_latest_orders

        _assert_matches_oracle(q87_latest_orders(SF), Q87_SQL)

    def test_mergeable_and_block_invariant(self):
        """top-n of a union == top-n of per-block top-n's; identical
        under any repartitioning."""
        from reden_ray.pipelines.rankops import top_n_per_group

        rng = np.random.default_rng(21)
        df = pd.DataFrame({
            "k": rng.integers(0, 8, 500),
            "v": rng.integers(0, 50, 500),
            "i": np.arange(500),
        }).astype("int64")
        key = ["k", "rk", "v", "i"]
        a = top_n_per_group(rd.from_pandas(df).repartition(2),
                            "k", "v", "i").to_pandas()
        b = top_n_per_group(rd.from_pandas(df).repartition(17),
                            "k", "v", "i").to_pandas()
        pd.testing.assert_frame_equal(
            a[key].sort_values(key).reset_index(drop=True),
            b[key].sort_values(key).reset_index(drop=True))
        # values are the true per-key maxima in order
        top = a[a["rk"] == 1].set_index("k")["v"]
        want = df.groupby("k")["v"].max()
        for k in want.index:
            assert top.loc[k] == want.loc[k]


class TestRankFusion:
    def test_matches_oracle(self):
        from reden_ray.pipelines.rankops import Q88_SQL, q88_rank_fusion

        _assert_matches_oracle(q88_rank_fusion(SF), Q88_SQL)

    def test_planted_fusion(self):
        """A doc ranked 1st by metric A and last by metric B lands
        between consistent winners and consistent losers."""
        from reden_ray.pipelines.rankops import (_RRF_K, _RRF_SCALE,
                                                 rrf_fuse)

        df = pd.DataFrame({
            "g": ["x"] * 3,
            "i": [1, 2, 3],
            "a": [30, 20, 10],   # ranks: 1, 2, 3
            "b": [5, 20, 10],    # ranks: 3, 1, 2
        })
        out = rrf_fuse(rd.from_pandas(df), "g", "i", "a", "b").to_pandas()
        out = out.set_index("i")
        assert out.loc[1, "rra"] == 1 and out.loc[1, "rrb"] == 3
        s = _RRF_SCALE
        assert (out.loc[1, "rrf_score"]
                == s // (_RRF_K + 1) + s // (_RRF_K + 3))


class TestDecayedActivity:
    def test_matches_oracle(self):
        from reden_ray.pipelines.rankops import (Q89_SQL,
                                                 q89_decayed_activity)

        _assert_matches_oracle(q89_decayed_activity(SF), Q89_SQL)

    def test_planted_decay(self):
        """Known ages produce exact dyadic weights; >40-day ages clamp."""
        from reden_ray.pipelines.rankops import (_DECAY_SCALE,
                                                 decayed_activity)

        base = pd.Timestamp("2024-03-01")
        df = pd.DataFrame({
            "user_id": [1, 1, 2, 3],
            "ts": [base, base - pd.Timedelta(days=2),
                   base - pd.Timedelta(days=1),
                   base - pd.Timedelta(days=100)],
        })
        out = decayed_activity(rd.from_pandas(df)).set_index("user_id")
        assert out.loc[1, "decay_score"] == _DECAY_SCALE + (_DECAY_SCALE >> 2)
        assert out.loc[2, "decay_score"] == _DECAY_SCALE >> 1
        assert out.loc[3, "decay_score"] == _DECAY_SCALE >> 40
        assert out["n_events"].tolist() == [2, 1, 1]
