"""Entity-fusion operator tests (q79-q82): majority-vote truth
discovery, SCD2 change intervals, deterministic negative sampling,
blocked-Levenshtein fuzzy linkage."""

import random

import duckdb
import numpy as np
import pandas as pd

import ray.data as rd

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ("orders", "events", "customer"):
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


class TestMajorityVote:
    def test_matches_oracle(self):
        from reden_ray.pipelines.fusion import Q79_SQL, q79_attribute_fusion

        _assert_matches_oracle(q79_attribute_fusion(SF), Q79_SQL)

    def test_planted_tie_break(self):
        """Equal support → lexicographically smallest value wins;
        support and n_distinct are exact."""
        from reden_ray.pipelines.fusion import majority_vote

        df = pd.DataFrame({
            "k": [1, 1, 1, 1, 2, 2, 2],
            "v": ["b", "b", "a", "a", "z", "z", "y"],
        })
        out = majority_vote(rd.from_pandas(df).repartition(3), "k", "v")
        out = out.sort_values("k").reset_index(drop=True)
        assert out["canon_value"].tolist() == ["a", "z"]
        assert out["support"].tolist() == [2, 2]
        assert out["n_distinct"].tolist() == [2, 2]


class TestChangeIntervals:
    def test_matches_oracle(self):
        from reden_ray.pipelines.fusion import Q80_SQL, q80_change_intervals

        _assert_matches_oracle(q80_change_intervals(SF), Q80_SQL)

    def test_block_invariant(self):
        """Interval reconstruction is identical under any input
        partitioning (the bucket shuffle co-locates each key)."""
        from reden_ray.pipelines.fusion import change_intervals

        rng = random.Random(11)
        rows = []
        for i in range(300):
            rows.append({
                "user_id": rng.randint(1, 6),
                "ts": pd.Timestamp("2024-01-01")
                + pd.Timedelta(seconds=rng.randint(0, 5000)),
                "event_type": rng.choice(["a", "b"]),
                "event_id": i,
            })
        df = pd.DataFrame(rows)
        a = change_intervals(rd.from_pandas(df).repartition(2)).to_pandas()
        b = change_intervals(rd.from_pandas(df).repartition(13)).to_pandas()
        key = ["user_id", "valid_from_us"]
        pd.testing.assert_frame_equal(
            a.sort_values(key).reset_index(drop=True),
            b.sort_values(key).reset_index(drop=True))
        # intervals per key are disjoint, ordered, and values alternate
        for _, grp in a.sort_values(key).groupby("user_id"):
            assert (grp["valid_to_us"].iloc[:-1].to_numpy()
                    == grp["valid_from_us"].iloc[1:].to_numpy()).all()
            assert (grp["event_type"].iloc[:-1].to_numpy()
                    != grp["event_type"].iloc[1:].to_numpy()).all()
            assert grp["valid_to_us"].iloc[-1] == np.iinfo(np.int64).max


class TestNegativeSamples:
    def test_matches_oracle(self):
        from reden_ray.pipelines.fusion import Q81_SQL, q81_negative_samples

        _assert_matches_oracle(q81_negative_samples(SF), Q81_SQL)

    def test_no_false_negatives_and_deterministic(self):
        from reden_ray.pipelines.fusion import negative_samples

        ds = rd.read_parquet(f"{SF}/events.parquet",
                             columns=["user_id", "props"])
        out = negative_samples(ds, "user_id", "props").to_pandas()
        assert len(out) > 0
        true_edges = set(map(tuple, duckdb.sql(
            f"SELECT DISTINCT user_id, props FROM "
            f"'{SF}/events.parquet'").fetchall()))
        assert not any((r.user_id, r.neg_props) in true_edges
                       for r in out.itertuples())
        out2 = negative_samples(
            ds.repartition(7), "user_id", "props").to_pandas()
        key = sorted(out.columns)
        pd.testing.assert_frame_equal(
            out[key].sort_values(key).reset_index(drop=True),
            out2[key].sort_values(key).reset_index(drop=True))


class TestFuzzyLinkage:
    def test_matches_oracle(self):
        from reden_ray.pipelines.fusion import Q82_SQL, q82_fuzzy_name_links

        _assert_matches_oracle(q82_fuzzy_name_links(SF), Q82_SQL)

    def test_levenshtein_kernel_vs_reference_dp(self):
        from reden_ray.pipelines.fusion import levenshtein_batch

        def ref(a, b):
            a, b = a.encode(), b.encode()
            prev = list(range(len(b) + 1))
            for i in range(1, len(a) + 1):
                cur = [i] + [0] * len(b)
                for j in range(1, len(b) + 1):
                    cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                                 prev[j - 1] + (a[i - 1] != b[j - 1]))
                prev = cur
            return prev[len(b)]

        rng = random.Random(5)
        pairs = [("kitten", "sitting"), ("", ""), ("", "xyz"),
                 ("xyz", ""), ("same", "same"), ("é", "e")]
        for _ in range(300):
            la, lb = rng.randint(0, 15), rng.randint(0, 15)
            pairs.append(
                ("".join(rng.choice("abcd") for _ in range(la)),
                 "".join(rng.choice("abcd") for _ in range(lb))))
        got = levenshtein_batch([p[0] for p in pairs],
                                [p[1] for p in pairs])
        want = [ref(*p) for p in pairs]
        assert got.tolist() == want
