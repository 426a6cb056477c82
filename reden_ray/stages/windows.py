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


def sliding_window_per_key(events_ds, key_col: str = "user_id",
                           window_minutes: int = 60, value_col: str = "value"):
    """Per-key trailing-window aggregate: for every event, the sum of
    ``value`` over the preceding ``window_minutes`` (inclusive) for the
    same key. One shuffle on the key; pandas rolling inside groups."""
    win = pd.Timedelta(minutes=window_minutes)

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        s = g.set_index("ts")[value_col].rolling(win, closed="both").sum()
        out = g[["event_id", key_col]].copy()
        out["trailing_sum"] = s.values.round(6)
        return out

    return events_ds.groupby(key_col).map_groups(roll, batch_format="pandas")


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
