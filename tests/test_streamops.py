"""Event-stream modelling tests (q85-q86): Markov transition model,
watermark late-event quarantine."""

import duckdb
import numpy as np
import pandas as pd

import ray.data as rd

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    return con


def _assert_matches_oracle(got: pd.DataFrame, sql: str):
    con = _con()
    want = con.sql(sql).df()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


class TestTransitionModel:
    def test_matches_oracle(self):
        from reden_ray.pipelines.streamops import (Q85_SQL,
                                                   q85_transition_model)

        _assert_matches_oracle(q85_transition_model(SF), Q85_SQL)

    def test_planted_chain(self):
        """A known a→b→a→c chain yields exact counts and quantized
        probabilities; transitions never cross keys."""
        from reden_ray.pipelines.streamops import (_PROB_SCALE,
                                                   transition_counts)

        df = pd.DataFrame({
            "user_id": [1, 1, 1, 1, 2, 2],
            "ts": pd.to_datetime([
                "2024-01-01 00:00:00", "2024-01-01 00:01:00",
                "2024-01-01 00:02:00", "2024-01-01 00:03:00",
                "2024-01-01 00:00:00", "2024-01-01 00:01:00"]),
            "event_type": ["a", "b", "a", "c", "c", "a"],
            "event_id": [0, 1, 2, 3, 4, 5],
        })
        out = transition_counts(rd.from_pandas(df).repartition(3))
        out = out.set_index(["state", "next_state"])
        assert out.loc[("a", "b"), "cnt"] == 1
        assert out.loc[("a", "c"), "cnt"] == 1
        assert out.loc[("b", "a"), "cnt"] == 1
        assert out.loc[("c", "a"), "cnt"] == 1
        # user 2's c->a must not merge with a cross-user transition
        assert len(out) == 4
        assert out.loc[("a", "b"), "p_q20"] == _PROB_SCALE // 2

    def test_partition_invariance(self):
        from reden_ray.pipelines.streamops import transition_counts

        ds = rd.read_parquet(f"{SF}/events.parquet",
                             columns=["user_id", "ts", "event_type",
                                      "event_id"])
        key = ["state", "next_state"]
        a = transition_counts(ds.repartition(2)).sort_values(key)
        b = transition_counts(ds.repartition(9)).sort_values(key)
        pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                      b.reset_index(drop=True))


class TestLateEvents:
    def test_matches_oracle(self):
        from reden_ray.pipelines.streamops import Q86_SQL, q86_late_events

        got = q86_late_events(SF)
        assert len(got) > 0  # the permuted arrival makes real work
        _assert_matches_oracle(got, Q86_SQL)

    def test_planted_late_row(self):
        from reden_ray.pipelines.streamops import late_events

        df = pd.DataFrame({
            "user_id": [1, 1, 1, 2],
            "ts": pd.to_datetime([
                "2024-01-01 00:10:00",   # arrives first, wm for later
                "2024-01-01 00:05:00",   # LATE by 5 min
                "2024-01-01 00:20:00",   # on time
                "2024-01-01 00:00:00"]), # other key, first arrival
            "event_id": [0, 1, 2, 3],
        })
        out = late_events(rd.from_pandas(df)).to_pandas()
        assert out["event_id"].tolist() == [1]
        assert out["lateness_us"].tolist() == [300_000_000]
        # a 10-minute allowance clears it
        out2 = late_events(rd.from_pandas(df),
                           allowed_lateness_us=600_000_000).to_pandas()
        assert len(out2) == 0
