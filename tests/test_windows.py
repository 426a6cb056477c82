"""Window-operator tests: tumbling, sliding (RANGE peer semantics),
sessionization, and the hash-bucket per-key pattern."""

import duckdb
import pandas as pd
import pyarrow as pa

import ray.data as rd

from reden_ray.stages.windows import sliding_window_per_key, tumbling_window


def _events(rows):
    return rd.from_arrow(pa.Table.from_pylist(rows))


class TestTumbling:
    def test_hour_buckets(self):
        rows = [
            {"ts": pd.Timestamp("2024-01-01 10:05"), "value": 1.0},
            {"ts": pd.Timestamp("2024-01-01 10:55"), "value": 2.0},
            {"ts": pd.Timestamp("2024-01-01 11:05"), "value": 4.0},
        ]
        out = tumbling_window(_events(rows), size_minutes=60).to_pandas()
        m = {str(r.window_start): (r.n_events, r.sum_value) for r in out.itertuples()}
        assert m["2024-01-01 10:00:00"] == (2, 3.0)
        assert m["2024-01-01 11:00:00"] == (1, 4.0)


class TestSlidingRangePeers:
    def test_duplicate_ts_peers_included(self):
        """SQL RANGE ... CURRENT ROW includes ALL rows at the current
        timestamp — peer rows sorted after the current one too. Verify
        against DuckDB on a corpus WITH duplicate timestamps (the case
        the old rolling(closed='both') diverged on)."""
        t0 = pd.Timestamp("2024-01-01 10:00")
        rows = [
            {"event_id": 1, "user_id": 7, "ts": t0, "value": 1.0},
            {"event_id": 2, "user_id": 7, "ts": t0, "value": 2.0},  # ts peer
            {"event_id": 3, "user_id": 7, "ts": t0 + pd.Timedelta(minutes=30), "value": 4.0},
            {"event_id": 4, "user_id": 7, "ts": t0 + pd.Timedelta(minutes=90), "value": 8.0},
            {"event_id": 5, "user_id": 9, "ts": t0, "value": 16.0},
        ]
        out = sliding_window_per_key(_events(rows), window_minutes=60).to_pandas()
        got = dict(zip(out["event_id"], out["trailing_sum"]))
        df = pd.DataFrame(rows)
        sql = duckdb.sql(
            """
            SELECT event_id, ROUND(SUM(value) OVER (
                PARTITION BY user_id ORDER BY ts
                RANGE BETWEEN INTERVAL 60 MINUTE PRECEDING AND CURRENT ROW
            ), 6) AS trailing_sum FROM df
            """
        ).df()
        expect = dict(zip(sql["event_id"], sql["trailing_sum"]))
        assert got == expect
        assert got[1] == 3.0 and got[2] == 3.0  # both peers see both rows

    def test_matches_duckdb_on_random_events(self):
        rng = pd.Series(range(200))
        df = pd.DataFrame({
            "event_id": rng,
            "user_id": (rng * 7919) % 13,
            "ts": pd.Timestamp("2024-01-01") + pd.to_timedelta((rng * 3571) % 600, unit="m"),
            "value": ((rng * 31) % 97).astype(float),
        })
        out = sliding_window_per_key(
            rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)),
            window_minutes=60).to_pandas()
        sql = duckdb.sql(
            """
            SELECT event_id, ROUND(SUM(value) OVER (
                PARTITION BY user_id ORDER BY ts
                RANGE BETWEEN INTERVAL 60 MINUTE PRECEDING AND CURRENT ROW
            ), 6) AS trailing_sum FROM df
            """
        ).df()
        got = dict(zip(out["event_id"], out["trailing_sum"]))
        expect = dict(zip(sql["event_id"], sql["trailing_sum"]))
        assert got == expect


class TestIntervalCoverage:
    def _run(self, rows, length_us=300 * 1_000_000):
        import pyarrow as pa

        import ray.data as rd

        from reden_ray.pipelines.streamops import interval_coverage

        ds = rd.from_arrow(pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        }))
        df = interval_coverage(ds, length_us=length_us).to_pandas()
        return {int(r["user_id"]): (int(r["n_islands"]), int(r["covered_s"]))
                for _, r in df.iterrows()}

    def test_disjoint_and_merged_islands(self):
        m = 60 * 1_000_000
        rows = [
            (1, 0), (1, 2 * m),          # overlap (5-min intervals) -> 1 island, 7 min
            (1, 20 * m),                 # separate island, 5 min
            (2, 0),                      # single event
        ]
        got = self._run(rows)
        assert got[1] == (2, 7 * 60 + 5 * 60)
        assert got[2] == (1, 300)

    def test_duplicate_events_lossless(self):
        rows = [(1, 0), (1, 0), (1, 0)]
        assert self._run(rows)[1] == (1, 300)

    def test_exact_touch_merges(self):
        # interval [0, L) and an event exactly at L: t > prev_end is
        # FALSE at equality, so touching intervals merge (both engines)
        L = 300 * 1_000_000
        rows = [(1, 0), (1, L)]
        assert self._run(rows)[1] == (1, 600)

    def test_key_boundary_no_leak(self):
        # user 1's late interval must not suppress user 2's early break
        m = 60 * 1_000_000
        rows = [(1, 100 * m), (2, 0), (2, 50 * m)]
        got = self._run(rows)
        assert got[1] == (1, 300)
        assert got[2] == (2, 600)

    def test_block_split_invariant(self):
        import pyarrow as pa

        import ray.data as rd

        from reden_ray.pipelines.streamops import interval_coverage

        m = 60 * 1_000_000
        rows = [(i % 5, (i * 37 % 200) * m) for i in range(200)]
        ds = rd.from_arrow(pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        }))
        one = interval_coverage(ds).to_pandas()
        many = interval_coverage(ds.repartition(9)).to_pandas()
        key = ["user_id", "n_islands", "covered_s"]
        assert one[key].sort_values(key).reset_index(drop=True).equals(
            many[key].sort_values(key).reset_index(drop=True))


class TestRollingActiveUsers:
    def _run(self, rows, window_days=7):
        import pyarrow as pa

        import ray.data as rd

        from reden_ray.pipelines.streamops import rolling_active_users

        day = 86_400_000_000
        ds = rd.from_arrow(pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] * day for r in rows], pa.timestamp("us")),
        }))
        df = rolling_active_users(ds, window_days=window_days).to_pandas()
        return {int(r["day"]): int(r["active_7d"]) for _, r in df.iterrows()}

    def test_trailing_window_counts_distinct(self):
        rows = [(1, 0), (2, 0), (1, 3), (3, 10)]
        got = self._run(rows)
        # day 0: users {1,2}; day 3: {1,2} (day-0 events still in
        # window) -- user 1 counted ONCE; day 10: {3} only
        assert got == {0: 2, 3: 2, 10: 1}

    def test_window_expiry(self):
        rows = [(1, 0), (2, 7)]
        got = self._run(rows)
        assert got == {0: 1, 7: 1}  # day 0 is out of day 7's window
        got3 = self._run([(1, 0), (2, 2)], window_days=3)
        assert got3 == {0: 1, 2: 2}

    def test_duplicate_events_one_user(self):
        rows = [(1, 0)] * 5 + [(1, 2)] * 3
        assert self._run(rows) == {0: 1, 2: 1}

    def test_block_split_invariant(self):
        import pyarrow as pa

        import ray.data as rd

        from reden_ray.pipelines.streamops import rolling_active_users

        day = 86_400_000_000
        rows = [(i % 9, (i * 5 % 23) * day) for i in range(300)]
        ds = rd.from_arrow(pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        }))
        one = rolling_active_users(ds).to_pandas()
        many = rolling_active_users(ds.repartition(11)).to_pandas()
        key = ["day", "active_7d"]
        assert one[key].sort_values(key).reset_index(drop=True).equals(
            many[key].sort_values(key).reset_index(drop=True))


class TestActivityGini:
    def _run(self, user_ids):
        import pyarrow as pa

        import ray.data as rd

        from reden_ray.pipelines.streamops import activity_gini

        ds = rd.from_arrow(pa.table({
            "user_id": pa.array(user_ids, pa.int64())}))
        return activity_gini(ds).iloc[0].to_dict()

    def test_perfect_equality_zero(self):
        got = self._run([1, 2, 3, 4] * 5)  # every user exactly 5 events
        assert got == {"n_users": 4, "total_events": 20, "gini_ppm": 0}

    def test_extreme_inequality(self):
        # 9 users with 1 event, 1 user with 991: Gini near (n-1)/n
        ids = list(range(9)) + [99] * 991
        got = self._run(ids)
        assert got["n_users"] == 10 and got["total_events"] == 1000
        assert got["gini_ppm"] > 850_000

    def test_matches_bruteforce_rank_formula(self):
        import numpy as np

        rng = np.random.RandomState(73)
        ids = rng.randint(0, 20, size=500).tolist()
        got = self._run(ids)
        from collections import Counter
        c = sorted(Counter(ids).values())
        n = len(c)
        tot = sum(c)
        num = sum((2 * (i + 1) - n - 1) * v for i, v in enumerate(c))
        assert got["gini_ppm"] == 1_000_000 * num // (n * tot)

    def test_block_split_invariant(self):
        import pyarrow as pa

        import ray.data as rd

        from reden_ray.pipelines.streamops import activity_gini

        ids = [i % 13 for i in range(400)]
        ds = rd.from_arrow(pa.table({"user_id": pa.array(ids, pa.int64())}))
        assert activity_gini(ds).iloc[0].to_dict() == \
            activity_gini(ds.repartition(7)).iloc[0].to_dict()
