"""Window aggregates over an ordered event log (stream-shaped batch ops).

The reference is strictly batch with no temporal semantics (SURVEY.md
§2.9), but a web-scale events pipeline needs windowing; Ray Data has no
event-time windows, so these follow the guide pattern: treat the input
as a partitioned log, assign window ids in a vectorized ``map_batches``
(tumbling) or per-key ``map_groups`` over ts-sorted groups (sliding /
session — see q16 sessionize in pipelines/relational.py).

Determinism: window boundaries are pure functions of the timestamp;
ordering inside groups is fixed by (ts, event_id).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Mean, Sum


def tumbling_window(events_ds, size_minutes: int = 60,
                    value_col: str = "value", key_col: str | None = None):
    """Tumbling event-time windows: floor(ts / size) buckets, grouped
    aggregate (count, sum, mean). Vectorized window assignment; the
    groupby shuffles pre-combined rows only (Ray pre-aggregates per
    block)."""
    size_us = size_minutes * 60 * 1_000_000

    def assign(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(t["ts"], pa.int64())
        win = pc.multiply(pc.divide(ts_us, size_us), size_us)
        out = t.append_column("window_start", pc.cast(win, pa.timestamp("us")))
        return out

    keys = ["window_start"] if key_col is None else [key_col, "window_start"]
    return (
        events_ds.map_batches(assign, batch_format="pyarrow")
        .groupby(keys)
        .aggregate(
            Count(alias_name="n_events"),
            Sum(value_col, alias_name="sum_value"),
            Mean(value_col, alias_name="avg_value"),
        )
    )


DEFAULT_KEY_BUCKETS = 64


def grouped_by_key_buckets(ds, key_col: str, fn, num_buckets: int = DEFAULT_KEY_BUCKETS):
    """Shuffle ONCE on hash(key) % num_buckets and run ``fn`` on each
    bucket's frame (all rows of a key co-located). One dispatch per
    BUCKET instead of per key — the per-tiny-group map_groups dispatch
    is pathological at millions of keys (same pattern as the linker's
    url buckets)."""

    from ..functions.bucket import add_bucket

    def run(df: pd.DataFrame) -> pd.DataFrame:
        return fn(df.drop(columns=["__bucket"]))

    return (
        ds.map_batches(lambda t: add_bucket(t, key_col, num_buckets),
                       batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(run, batch_format="pandas")
    )


def sliding_window_per_key(events_ds, key_col: str = "user_id",
                           window_minutes: int = 60, value_col: str = "value",
                           num_buckets: int = DEFAULT_KEY_BUCKETS):
    """Per-key trailing-window aggregate: for every event, the sum of
    ``value`` over the preceding ``window_minutes`` (inclusive) for the
    same key. One hash-bucket shuffle; vectorized pandas inside each
    bucket (groupby.rolling over the per-(key, ts) totals).

    RANGE semantics: all ts-PEERS of the current row are included
    (matching SQL ``RANGE ... CURRENT ROW``) — the trailing sum is
    computed per distinct (key, ts) and broadcast back to peer rows,
    not per row position.
    """
    win = pd.Timedelta(minutes=window_minutes)

    def roll_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(columns=["event_id", key_col, "trailing_sum"])
        per_ts = df.groupby([key_col, "ts"], as_index=False)[value_col].sum()
        r = (
            per_ts.set_index("ts")
            .groupby(key_col)[value_col]
            .rolling(win, closed="both")
            .sum()
            .reset_index()
            .rename(columns={value_col: "trailing_sum"})
        )
        out = df[["event_id", key_col, "ts"]].merge(r, on=[key_col, "ts"])
        out["trailing_sum"] = out["trailing_sum"].round(6)
        return out[["event_id", key_col, "trailing_sum"]]

    return grouped_by_key_buckets(events_ds, key_col, roll_bucket, num_buckets)


TUMBLING_SQL = """
WITH x AS (
  SELECT ts, CAST(ROUND(value * 100, 0) AS BIGINT) AS value_e2 FROM events
)
SELECT CAST(to_timestamp((epoch_us(ts) // {size_us}) * {size_us} / 1000000) AS TIMESTAMP)
         AS window_start,
       COUNT(*) AS n_events,
       CAST(SUM(value_e2) AS BIGINT) AS sum_value_e2,
       CAST(SUM(value_e2) * 10000 // COUNT(*) AS BIGINT) AS avg_value_e6
FROM x GROUP BY 1
"""

SLIDING_SQL = """
SELECT event_id, user_id,
       ROUND(SUM(value) OVER (
           PARTITION BY user_id ORDER BY ts
           RANGE BETWEEN INTERVAL {m} MINUTE PRECEDING AND CURRENT ROW
       ), 6) AS trailing_sum
FROM events
"""
