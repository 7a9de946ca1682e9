"""Session-window aggregation over an event stream (LLM-pipeline extension).

Sessionization = gaps-and-islands per key: consecutive events of one user
belong to the same session while the inter-event gap stays under
``gap_s``.  Ray-Data-first shape: ONE hash-partitioned shuffle on the key
(every user's events co-locate), then a fully vectorized per-partition pass —
sort by (user, ts), session boundaries from a diff, per-session aggregates
via reduceat.  No per-row loops, no driver materialization; partitions scale
with the key space, hot users stay within one task but cost only O(n log n).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.hashing import bucket_of


def sessionize_events(
    events: "ray.data.Dataset",
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = "value",
    gap_s: float = 1800.0,
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """{user_id, session_idx (0-based per user, time-ordered), n_events,
    start_us, end_us, duration_s [, sum_cents]} — one row per session."""

    def add_pb(t: pa.Table) -> pa.Table:
        k = np.asarray(t.column(key_col), dtype=np.int64)
        return t.append_column("pb", pa.array(bucket_of(k, num_partitions), pa.int32()))

    gap_us = np.int64(round(gap_s * 1e6))

    def agg(t: pa.Table) -> pa.Table:
        k = np.asarray(t.column(key_col), dtype=np.int64)
        ts = np.asarray(t.column(ts_col).cast(pa.int64()), dtype=np.int64)  # us
        order = np.lexsort((ts, k))
        k, ts = k[order], ts[order]
        new_user = np.ones(k.size, bool)
        new_user[1:] = k[1:] != k[:-1]
        new_sess = new_user.copy()
        new_sess[1:] |= (ts[1:] - ts[:-1]) > gap_us
        starts = np.flatnonzero(new_sess)
        n_events = np.diff(np.concatenate((starts, [k.size])))
        start_us = ts[starts]
        end_us = ts[starts + n_events - 1]
        # 0-based session index per user (sessions are time-ordered)
        user_first = np.flatnonzero(new_user[starts])  # session idx where a user begins
        sess_no = np.arange(starts.size)
        base = np.zeros(starts.size, np.int64)
        base[user_first] = sess_no[user_first]
        session_idx = sess_no - np.maximum.accumulate(base)
        cols = {
            key_col: pa.array(k[starts], pa.int64()),
            "session_idx": pa.array(session_idx, pa.int64()),
            "n_events": pa.array(n_events.astype(np.int64), pa.int64()),
            "start_us": pa.array(start_us, pa.int64()),
            "end_us": pa.array(end_us, pa.int64()),
            "duration_s": pa.array((end_us - start_us) / 1e6, pa.float64()),
        }
        if value_col is not None and value_col in t.column_names:
            # integer cents so float summation order can't flip value hashes;
            # half-AWAY-from-zero to match DuckDB round() (np.round is
            # banker's half-to-even — diverges on exact half-cents)
            v100 = np.asarray(t.column(value_col), dtype=np.float64)[order] * 100.0
            cents = np.where(v100 >= 0, np.floor(v100 + 0.5), np.ceil(v100 - 0.5))
            sums = np.add.reduceat(cents.astype(np.int64), starts) if starts.size else np.empty(0, np.int64)
            cols["sum_cents"] = pa.array(sums, pa.int64())
        return pa.table(cols)

    return (
        events.map_batches(add_pb, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(agg, batch_format="pyarrow")
    )
