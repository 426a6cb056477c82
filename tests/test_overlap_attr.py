"""Tests for q90 (line containment), q91 (session attribution),
q92 (grouped OLS trend)."""

import duckdb
import numpy as np
import pandas as pd

import ray.data as rd

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ("documents", "events"):
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


class TestLineContainment:
    def test_matches_oracle(self):
        from reden_ray.pipelines.relational import (Q90_SQL,
                                                    q90_line_containment)

        got = q90_line_containment(SF)
        assert len(got) > 0  # exact twins anchor the output
        _assert_matches_oracle(got, Q90_SQL)

    def test_planted_quote(self):
        """A short doc fully quoted inside a long one reaches
        containment 1000 in the short direction only."""
        from reden_ray.pipelines.relational import line_containment_pairs

        short = " ".join(f"w{i}" for i in range(20))          # 2 lines
        longer = short + " " + " ".join(f"x{i}" for i in range(80))
        other = " ".join(f"y{i}" for i in range(100))
        df = pd.DataFrame({"doc_id": [1, 2, 3],
                           "text": [short, longer, other]})
        out = line_containment_pairs(rd.from_pandas(df), min_pm=900)
        assert len(out) == 1
        r = out.iloc[0]
        assert (r["a"], r["b"]) == (1, 2)
        assert r["c_a_pm"] == 1000 and r["c_b_pm"] < 300


class TestAttribution:
    def test_matches_oracle(self):
        from reden_ray.pipelines.streamops import Q91_SQL, q91_attribution

        got = q91_attribution(SF)
        assert len(got) > 0
        _assert_matches_oracle(got, Q91_SQL)

    def test_planted_sessions(self):
        from reden_ray.pipelines.streamops import session_attribution

        t0 = pd.Timestamp("2024-01-01")
        mins = pd.Timedelta(minutes=1)
        df = pd.DataFrame({
            "user_id": [1, 1, 1, 1, 1],
            "ts": [t0, t0 + 5 * mins, t0 + 10 * mins,
                   t0 + 100 * mins,        # new session (gap 90 min)
                   t0 + 101 * mins],
            "event_type": ["view", "click", "purchase",
                           "purchase", "click"],
            "event_id": [0, 1, 2, 3, 4],
        })
        out = (session_attribution(rd.from_pandas(df))
               .to_pandas().set_index("event_id"))
        assert out.loc[2, "first_touch"] == "view"
        assert out.loc[2, "last_touch"] == "click"
        # a purchase that OPENS a session attributes to itself
        assert out.loc[3, "first_touch"] == "purchase"
        assert out.loc[3, "last_touch"] == "purchase"


class TestTrend:
    def test_matches_oracle(self):
        from reden_ray.pipelines.streamops import Q92_SQL, q92_value_trend

        _assert_matches_oracle(q92_value_trend(SF), Q92_SQL)

    def test_planted_slope(self):
        """y = 2.5·x hours exactly → slope_q = 2.5·100·10^4 / 1."""
        from reden_ray.pipelines.streamops import trend_per_key

        t0 = pd.Timestamp("2024-01-01")
        hours = pd.Timedelta(hours=1)
        df = pd.DataFrame({
            "user_id": [7] * 4,
            "ts": [t0 + k * hours for k in range(4)],
            "value": [0.0, 2.5, 5.0, 7.5],
        })
        out = trend_per_key(rd.from_pandas(df)).set_index("user_id")
        assert out.loc[7, "slope_q"] == 250 * 10_000
        assert out.loc[7, "n"] == 4
