"""Event-stream modelling operators (q85-q86).

Two stream-shaped passes a behavioural / training-data pipeline runs
over event logs, both expressed with the windows-family machinery
(ONE hash-bucket exchange per key family, vectorized inside buckets)
and hash-verified:

* q85 — Markov transition model (the n-gram-over-actions analogue of
  q48's bigram LM): per-user event sequences ordered by (ts,
  event_id) yield (state → next-state) transition counts across the
  corpus, plus an integer-quantized transition probability
  (cnt·2^20 // row_total — the q42b/q48 float-free discipline so the
  model itself hash-verifies). The bucket stage emits per-bucket
  PARTIAL transition counts (≤ |states|² rows per bucket, not per
  event), so the second exchange moves a vocabulary-sized table.
* q86 — watermark late-event quarantine (the streaming
  out-of-order-data rule made deterministic): events arrive in
  event_id order; an event is LATE if its timestamp precedes the
  running max timestamp of earlier arrivals for the same key by more
  than ``allowed_lateness``. Per-key cummax + shift inside the one
  bucket exchange; emits the quarantined rows with their lateness.
  This is the data-quality gate in front of the q27/q28 event-time
  windows — at 100 TB the same pass runs as the window family does,
  ONE keyed exchange of narrow columns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Sum

from ..stages.windows import grouped_by_key_buckets

_PROB_SCALE = 1 << 20


def _read_events(sf_dir: str, columns):
    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def transition_counts(events_ds, key_col: str = "user_id",
                      state_col: str = "event_type",
                      ts_col: str = "ts",
                      order_col: str = "event_id") -> pd.DataFrame:
    """(state, next_state, cnt, p_q20) over per-key sequences.
    p_q20 = cnt * 2^20 // total outgoing transitions of ``state``."""

    def narrow(t: pa.Table) -> pa.Table:
        return pa.table({
            key_col: t[key_col],
            "__ts_us": pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                               pa.int64()),
            state_col: t[state_col],
            order_col: t[order_col],
        })

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, "__ts_us", order_col],
                            kind="stable")
        nxt = df[state_col].shift(-1)
        same = df[key_col].eq(df[key_col].shift(-1))
        out = pd.DataFrame({"state": df[state_col], "next_state": nxt})[same]
        return (out.groupby(["state", "next_state"], as_index=False)
                .size().rename(columns={"size": "cnt"}))

    pre = events_ds.map_batches(narrow, batch_format="pyarrow")
    counts = (grouped_by_key_buckets(pre, key_col, pairs)
              .groupby(["state", "next_state"])
              .aggregate(Sum("cnt", alias_name="cnt")).to_pandas())
    totals = counts.groupby("state")["cnt"].transform("sum")
    counts["p_q20"] = (counts["cnt"] * _PROB_SCALE // totals).astype("int64")
    counts["cnt"] = counts["cnt"].astype("int64")
    return counts[["state", "next_state", "cnt", "p_q20"]]


def q85_transition_model(sf_dir: str) -> pd.DataFrame:
    ds = _read_events(sf_dir, ["user_id", "ts", "event_type", "event_id"])
    return transition_counts(ds)


Q85_SQL = f"""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
  FROM events
), s AS (
  SELECT event_type AS state,
         LEAD(event_type) OVER (
             PARTITION BY user_id ORDER BY ts_us, event_id) AS next_state
  FROM e
), c AS (
  SELECT state, next_state, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM s WHERE next_state IS NOT NULL GROUP BY state, next_state
)
SELECT state, next_state, cnt,
       CAST(cnt * {_PROB_SCALE} // SUM(cnt) OVER (PARTITION BY state)
            AS BIGINT) AS p_q20
FROM c
"""


def late_events(events_ds, key_col: str = "user_id",
                ts_col: str = "ts", order_col: str = "event_id",
                allowed_lateness_us: int = 0) -> "rd.Dataset":
    """Quarantine out-of-order events: row i (in ``order_col`` arrival
    order) is LATE when prior-arrival running-max ts for its key
    exceeds its own ts by more than ``allowed_lateness_us``. Emits
    (key, order, ts_us, lateness_us)."""

    def narrow(t: pa.Table) -> pa.Table:
        return pa.table({
            key_col: t[key_col],
            "__ts_us": pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                               pa.int64()),
            order_col: t[order_col],
        })

    def quarantine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, order_col], kind="stable")
        # prior-arrival running max per key, fully vectorized: shift
        # the per-key cummax by one row and blank each key's first row
        wm = df.groupby(key_col, sort=False)["__ts_us"].cummax().shift()
        wm[df[key_col].ne(df[key_col].shift())] = np.nan
        lateness = wm - df["__ts_us"]
        late = lateness > allowed_lateness_us
        out = df[late]
        return pd.DataFrame({
            key_col: out[key_col].astype("int64"),
            order_col: out[order_col].astype("int64"),
            "ts_us": out["__ts_us"].astype("int64"),
            "lateness_us": lateness[late].astype("int64"),
        })

    pre = events_ds.map_batches(narrow, batch_format="pyarrow")
    return grouped_by_key_buckets(pre, key_col, quarantine)


# The synthetic events are already time-ordered per key, which makes
# the watermark rule vacuous; the driver query derives a DETERMINISTIC
# arrival permutation (multiplicative hash of event_id — the q41
# messy-mint discipline) so the quarantine has real work to find, and
# the oracle mirrors the same arithmetic.
_ARR_MULT = 2_654_435_761
_ARR_MOD = 999_983


def q86_late_events(sf_dir: str) -> pd.DataFrame:
    ds = _read_events(sf_dir, ["user_id", "ts", "event_id"])

    def with_arrival(t: pa.Table) -> pa.Table:
        arr = pc.add(
            pc.multiply(
                pc.subtract(
                    pc.multiply(t["event_id"], pa.scalar(_ARR_MULT,
                                                         pa.int64())),
                    pc.multiply(
                        pc.divide(pc.multiply(t["event_id"],
                                              pa.scalar(_ARR_MULT,
                                                        pa.int64())),
                                  pa.scalar(_ARR_MOD, pa.int64())),
                        pa.scalar(_ARR_MOD, pa.int64()))),
                pa.scalar(10_000_000, pa.int64())),
            t["event_id"])
        return t.append_column("arr_id", arr)

    out = late_events(ds.map_batches(with_arrival,
                                     batch_format="pyarrow"),
                      order_col="arr_id").to_pandas()
    return out


Q86_SQL = f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         ((event_id * {_ARR_MULT}) % {_ARR_MOD}) * 10000000 + event_id
             AS arr_id
  FROM events
), w AS (
  SELECT user_id, arr_id, ts_us,
         MAX(ts_us) OVER (
             PARTITION BY user_id ORDER BY arr_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
  FROM e
)
SELECT user_id, arr_id, ts_us, CAST(wm - ts_us AS BIGINT) AS lateness_us
FROM w WHERE wm - ts_us > 0
"""


# ---------------------------------------------------------------------------
# Q91 — session-based conversion attribution (first/last-touch)
# ---------------------------------------------------------------------------

# Marketing-attribution shape over the event log: sessions split on
# >30-minute inactivity gaps per user (the q16 session-window rule);
# every 'purchase' is attributed to its session's FIRST event type
# (first touch) and to the type of the event immediately BEFORE it in
# the session (last touch; the purchase itself if it opens a session).
# One keyed exchange; session ids, first/last touch all vectorized
# (cumsum of gap flags + groupby transforms) inside the bucket.
_SESSION_GAP_US = 30 * 60 * 1_000_000


def session_attribution(events_ds, key_col: str = "user_id",
                        ts_col: str = "ts", type_col: str = "event_type",
                        order_col: str = "event_id",
                        convert_type: str = "purchase") -> "rd.Dataset":
    def narrow(t: pa.Table) -> pa.Table:
        return pa.table({
            key_col: t[key_col],
            "__ts_us": pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                               pa.int64()),
            type_col: t[type_col],
            order_col: t[order_col],
        })

    def attribute(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, "__ts_us", order_col],
                            kind="stable")
        new_sess = (df[key_col].ne(df[key_col].shift())
                    | (df["__ts_us"] - df["__ts_us"].shift()
                       > _SESSION_GAP_US))
        sess = new_sess.cumsum()
        first_touch = df.groupby(sess, sort=False)[type_col].transform(
            "first")
        sess_start = df.groupby(sess, sort=False)["__ts_us"].transform(
            "first")
        prev_type = df[type_col].shift()
        last_touch = prev_type.where(~new_sess, df[type_col])
        conv = df[type_col] == convert_type
        out = pd.DataFrame({
            key_col: df[key_col].astype("int64"),
            order_col: df[order_col].astype("int64"),
            "session_start_us": sess_start.astype("int64"),
            "first_touch": first_touch,
            "last_touch": last_touch,
        })[conv]
        return out

    pre = events_ds.map_batches(narrow, batch_format="pyarrow")
    return grouped_by_key_buckets(pre, key_col, attribute)


def q91_attribution(sf_dir: str) -> pd.DataFrame:
    ds = _read_events(sf_dir, ["user_id", "ts", "event_type", "event_id"])
    return session_attribution(ds).to_pandas()


Q91_SQL = f"""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
  FROM events
), g AS (
  SELECT *, CASE WHEN ts_us - LAG(ts_us) OVER w > {_SESSION_GAP_US}
                 OR LAG(ts_us) OVER w IS NULL
            THEN 1 ELSE 0 END AS new_sess,
         LAG(event_type) OVER w AS prev_type
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), s AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
                                ORDER BY ts_us, event_id
                                ROWS UNBOUNDED PRECEDING) AS sess
  FROM g
), a AS (
  SELECT user_id, event_id, event_type,
         FIRST_VALUE(event_type) OVER sw AS first_touch,
         FIRST_VALUE(ts_us) OVER sw AS session_start_us,
         CASE WHEN new_sess = 1 THEN event_type ELSE prev_type END
             AS last_touch
  FROM s WINDOW sw AS (PARTITION BY user_id, sess
                       ORDER BY ts_us, event_id
                       ROWS UNBOUNDED PRECEDING)
)
SELECT user_id, event_id, CAST(session_start_us AS BIGINT)
           AS session_start_us, first_touch, last_touch
FROM a WHERE event_type = 'purchase'
"""


# ---------------------------------------------------------------------------
# Q92 — per-key OLS trend (grouped linear regression via moment sums)
# ---------------------------------------------------------------------------

# The per-group form of q53's normal-equations pass: slope of value vs
# time per user from five INTEGER moment sums (n, Sx, Sy, Sxx, Sxy) —
# per-batch combiners ship ≤5 numbers per (user, block); the slope is
# the quantized integer ((n·Sxy − Sx·Sy) · 10^4) // (n·Sxx − Sx²), so
# the trend itself hash-verifies. x = hours since the corpus min
# timestamp (one scalar pre-pass), y = floor(value·100).
_TREND_SCALE = 10_000


def trend_per_key(events_ds, key_col: str = "user_id",
                  ts_col: str = "ts", val_col: str = "value"
                  ) -> pd.DataFrame:
    from ray.data.aggregate import Min

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table({
            key_col: t[key_col],
            "__ts_us": pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                               pa.int64()),
            val_col: t[val_col],
        })

    narrow = events_ds.map_batches(to_us, batch_format="pyarrow")
    min_ts = narrow.aggregate(Min("__ts_us"))["min(__ts_us)"]

    def moments(t: pa.Table) -> pa.Table:
        x = ((t["__ts_us"].to_numpy(zero_copy_only=False) - min_ts)
             // 3_600_000_000).astype(np.int64)
        y = np.floor(t[val_col].to_numpy(zero_copy_only=False)
                     * 100).astype(np.int64)
        tt = pa.table({
            key_col: t[key_col],
            "n": pa.array(np.ones(len(x), np.int64)),
            "sx": pa.array(x), "sy": pa.array(y),
            "sxx": pa.array(x * x), "sxy": pa.array(x * y),
        })
        g = tt.group_by([key_col]).aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxx", "sum"), ("sxy", "sum")])
        return g.rename_columns([key_col, "n", "sx", "sy", "sxx", "sxy"])

    agg = (narrow.map_batches(moments, batch_format="pyarrow")
           .groupby(key_col)
           .aggregate(Sum("n", alias_name="n"),
                      Sum("sx", alias_name="sx"),
                      Sum("sy", alias_name="sy"),
                      Sum("sxx", alias_name="sxx"),
                      Sum("sxy", alias_name="sxy"))
           .to_pandas())
    num = agg["n"] * agg["sxy"] - agg["sx"] * agg["sy"]
    den = agg["n"] * agg["sxx"] - agg["sx"] * agg["sx"]
    keep = den > 0
    out = agg[keep].copy()
    # DuckDB's // TRUNCATES toward zero on negatives (Python/numpy
    # floor); mirror trunc-division explicitly so negative slopes
    # hash-match: sign * (|num·S| // den), den > 0 by the keep filter
    nk = (num[keep] * _TREND_SCALE).astype("int64")
    out["slope_q"] = (np.sign(nk) * (nk.abs() // den[keep])).astype(
        "int64")
    out["n"] = out["n"].astype("int64")
    return out[[key_col, "n", "slope_q"]]


def q92_value_trend(sf_dir: str) -> pd.DataFrame:
    ds = _read_events(sf_dir, ["user_id", "ts", "value"])
    return trend_per_key(ds)


Q92_SQL = f"""
WITH e AS (
  SELECT user_id,
         (epoch_us(ts) - (SELECT MIN(epoch_us(ts)) FROM events))
             // 3600000000 AS x,
         CAST(FLOOR(value * 100) AS BIGINT) AS y
  FROM events
), m AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy
  FROM e GROUP BY user_id
)
SELECT user_id, n,
       CAST(((n * sxy - sx * sy) * {_TREND_SCALE})
            // (n * sxx - sx * sx) AS BIGINT) AS slope_q
FROM m WHERE n * sxx - sx * sx > 0
"""


# ---------------------------------------------------------------------------
# Q106 — interval-union coverage per user (island detection)
# ---------------------------------------------------------------------------

# Each event opens a fixed-length activity interval [ts, ts + 5 min);
# the operator reports, per user, the UNION of those intervals: how
# many disjoint activity islands and how many seconds they cover. The
# crawl-side use is coverage accounting (fetch windows per host, gap
# maps per snapshot); the algebra — merge overlapping intervals via
# sort + running-max-of-ends — is the classic islands problem.
_ISLAND_US = 300 * 1_000_000


def interval_coverage(events_ds, key_col: str = "user_id",
                      ts_col: str = "ts", length_us: int = _ISLAND_US):
    """-> (user_id, n_islands, covered_s). Per-block DISTINCT
    (key, ts) partials first — duplicate events are lossless to drop
    under a union — then ONE keyed bucket exchange; island detection
    is vectorized inside each bucket (sort, per-key shifted cummax of
    interval ends, break flags, cumsum island ids). covered_s is the
    SUM of island spans floor-divided once, mirroring the oracle."""

    def distinct_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": t.column(key_col).to_numpy(zero_copy_only=False),
            "t": pc.cast(t[ts_col], pa.int64()).to_numpy(
                zero_copy_only=False),
        }).drop_duplicates()
        return pa.table({
            "k": pa.array(df["k"].to_numpy(), pa.int64()),
            "t": pa.array(df["t"].to_numpy(), pa.int64()),
        })

    def islands(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["k", "t"]).sort_values(
            ["k", "t"], kind="stable")
        t = df["t"].to_numpy()
        k = df["k"].to_numpy()
        end = pd.Series(t + length_us)
        # per-KEY running max of interval ends (a global cummax would
        # leak a previous user's end into the next user's break test)
        prev_end = end.groupby(k).cummax().groupby(k).shift(1)
        brk = prev_end.isna().to_numpy() | (t > prev_end.fillna(
            np.iinfo(np.int64).min).to_numpy())
        isl = np.cumsum(brk)
        g = pd.DataFrame({"k": k, "isl": isl, "s": t, "e": end}) \
            .groupby(["k", "isl"], as_index=False) \
            .agg(s=("s", "min"), e=("e", "max"))
        out = g.assign(span=g["e"] - g["s"]) \
            .groupby("k", as_index=False) \
            .agg(n_islands=("isl", "count"), covered_us=("span", "sum"))
        return pd.DataFrame({
            "user_id": out["k"],
            "n_islands": out["n_islands"].astype("int64"),
            "covered_s": (out["covered_us"] // 1_000_000).astype("int64"),
        })

    dedup = events_ds.map_batches(distinct_partial, batch_format="pyarrow")
    return grouped_by_key_buckets(dedup, "k", islands)


def q106_interval_coverage(sf_dir: str) -> pd.DataFrame:
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    return interval_coverage(ds).to_pandas()


Q106_SQL = f"""
WITH ev AS (
  SELECT DISTINCT user_id, epoch_us(ts) AS t FROM events
), w AS (
  SELECT user_id, t,
         CASE WHEN t > COALESCE(MAX(t + {_ISLAND_US}) OVER (
                PARTITION BY user_id ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              {-(1 << 62)})
              OR ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY t) = 1
         THEN 1 ELSE 0 END AS brk
  FROM ev
), isl AS (
  SELECT user_id, t,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY t
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM w
), g AS (
  SELECT user_id, island, MIN(t) AS s, MAX(t) + {_ISLAND_US} AS e
  FROM isl GROUP BY user_id, island
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(SUM(e - s) // 1000000 AS BIGINT) AS covered_s
FROM g GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Q107 — rolling 7-day distinct active users (sliding COUNT DISTINCT)
# ---------------------------------------------------------------------------

_ROLL_DAYS = 7
_DAY_US = 86_400_000_000


def rolling_active_users(events_ds, key_col: str = "user_id",
                         ts_col: str = "ts", window_days: int = _ROLL_DAYS):
    """-> (day, active_7d): for every OBSERVED event day d, the number
    of distinct users with >= 1 event in [d - 6, d]. Sliding distinct
    counts do NOT decompose into per-day partial sums (distinct is not
    additive across days), so the exact operator is two dedup
    exchanges of narrow int rows:

    1. per-block DISTINCT (user, day) partials -> global pair dedup;
    2. each (user, day) replicates to the <= 7 trailing windows it
       feeds (bounded blowup, the q55 bin-replication idiom), filtered
       against the broadcast observed-day set;
    3. second (user, window-day) dedup collapses multi-active users;
    4. vocabulary-sized per-day count of pre-deduped rows.

    At 100 TB the replication factor stays `window_days` and every
    shuffled row is two int64s; the approximate path (q51 HLL
    registers per day, merged over the window) trades exactness for
    one exchange — both shapes are in the repo.
    """
    from ..stages.canonicalize import exact_dedup

    def day_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "u": t.column(key_col).to_numpy(zero_copy_only=False),
            "d": pc.cast(t[ts_col], pa.int64()).to_numpy(
                zero_copy_only=False) // _DAY_US,
        }).drop_duplicates()
        return pa.table({
            "u": pa.array(df["u"].to_numpy(), pa.int64()),
            "d": pa.array(df["d"].to_numpy(), pa.int64()),
        })

    pairs = exact_dedup(
        events_ds.map_batches(day_partial, batch_format="pyarrow"),
        ["u", "d"]).materialize()

    # observed-day set: vocabulary-sized, broadcast in-closure
    import ray

    from ..state.broadcast import get_broadcast

    days = np.sort(pairs.map_batches(
        lambda t: pa.table({"d": pc.unique(t["d"])}),
        batch_format="pyarrow").to_pandas()["d"].unique())
    days_ref = ray.put(days)

    def replicate(t: pa.Table) -> pa.Table:
        obs = get_broadcast(days_ref)
        u = t.column("u").to_numpy(zero_copy_only=False)
        d = t.column("d").to_numpy(zero_copy_only=False)
        ru = np.repeat(u, window_days)
        rd_ = np.repeat(d, window_days) + np.tile(
            np.arange(window_days, dtype=np.int64), len(d))
        keep = np.isin(rd_, obs)
        return pa.table({
            "u": pa.array(ru[keep], pa.int64()),
            "d": pa.array(rd_[keep], pa.int64()),
        })

    covered = exact_dedup(
        pairs.map_batches(replicate, batch_format="pyarrow"), ["u", "d"])

    from ray.data.aggregate import Count

    def emit(t: pa.Table) -> pa.Table:
        return pa.table({"day": t["d"],
                         "active_7d": pc.cast(t["count()"], pa.int64())})

    return (covered.groupby("d").aggregate(Count())
            .map_batches(emit, batch_format="pyarrow"))


def q107_rolling_active_users(sf_dir: str) -> pd.DataFrame:
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    return rolling_active_users(ds).to_pandas()


Q107_SQL = f"""
WITH p AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_DAY_US} AS d FROM events
), days AS (
  SELECT DISTINCT d FROM p
), cover AS (
  SELECT DISTINCT p.user_id, dd.d
  FROM p JOIN days dd ON dd.d BETWEEN p.d AND p.d + {_ROLL_DAYS - 1}
)
SELECT d AS day, CAST(COUNT(*) AS BIGINT) AS active_7d
FROM cover GROUP BY d
"""


# ---------------------------------------------------------------------------
# Q110 — Gini coefficient of per-user activity (inequality profile)
# ---------------------------------------------------------------------------

def activity_gini(events_ds, key_col: str = "user_id") -> pd.DataFrame:
    """-> ONE row (n_users, total_events, gini_ppm): the Gini
    coefficient of the per-user event-count distribution, exact and
    SORT-FREE. With the counts histogram (value -> how many users have
    that count) the rank-sum numerator Σ(2i − n − 1)·c_(i) reduces to
    per-VALUE closed forms: a block of m users at value v occupying
    ranks p+1..p+m contributes v·m·(2p + m − n). Ties make any
    within-value order irrelevant, so no global sort exists anywhere —
    per-user counts reduce combiner-first, the histogram is
    distinct-value-sized, and the final pass is driver arithmetic over
    it (the q45/q78 histogram discipline). gini_ppm is an integer
    floor-div, so the statistic itself hash-verifies."""
    from ray.data.aggregate import Count

    def count_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "u": t.column(key_col).to_numpy(zero_copy_only=False)})
        g = df.groupby("u", as_index=False).size()
        return pa.table({
            "u": pa.array(g["u"].to_numpy(), pa.int64()),
            "c_p": pa.array(g["size"].to_numpy(), pa.int64()),
        })

    from ray.data.aggregate import Sum as _Sum

    per_user = (events_ds.map_batches(count_partial, batch_format="pyarrow")
                .groupby("u").aggregate(_Sum("c_p", alias_name="c")))
    hist = (per_user.groupby("c").aggregate(Count(alias_name="m"))
            .to_pandas().sort_values("c").reset_index(drop=True))
    n = int(hist["m"].sum())
    tot = int((hist["c"].astype(object) * hist["m"]).sum())
    if n == 0 or tot == 0:
        return pd.DataFrame([{"n_users": n, "total_events": tot,
                              "gini_ppm": 0}])
    num = 0
    p = 0
    for _, r in hist.iterrows():
        v, m = int(r["c"]), int(r["m"])
        num += v * m * (2 * p + m - n)
        p += m
    return pd.DataFrame([{
        "n_users": n,
        "total_events": tot,
        "gini_ppm": 1_000_000 * num // (n * tot),
    }])


def q110_activity_gini(sf_dir: str) -> pd.DataFrame:
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    return activity_gini(ds)


Q110_SQL = """
WITH c AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c FROM events
  GROUP BY user_id
), r AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS i,
         (SELECT COUNT(*) FROM c) AS n,
         (SELECT SUM(c) FROM c) AS tot
  FROM c
)
SELECT CAST(MIN(n) AS BIGINT) AS n_users,
       CAST(MIN(tot) AS BIGINT) AS total_events,
       CAST(1000000 * SUM((2 * i - n - 1) * c) // (MIN(n) * MIN(tot))
            AS BIGINT) AS gini_ppm
FROM r
"""
