"""Windowed aggregation over the events stream table.

Ray Data has no event-time windows (ray_guide.md "Streaming-shaped
workloads"); tumbling windows are a key column (floor of the epoch) and
the usual partial-aggregate -> groupby combine. Ordering inside windows
is restored by sorting within groups when an operator needs sequences.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

WINDOW_S = 3600


def tumbling_partials(batch: pa.Table, window_s=WINDOW_S) -> pa.Table:
    """Per-batch partials keyed by (event_type, window_start_epoch)."""
    ts = np.asarray(batch["ts"].cast(pa.int64()))  # microseconds
    win = ts // (window_s * 1_000_000) * window_s  # window start, seconds
    etype = np.asarray(batch["event_type"].to_pandas(), dtype=object)
    value = np.asarray(batch["value"], dtype=np.float64)
    cents = np.floor(value * 100.0).astype(np.int64)  # int cents: oracle-stable sums

    key = np.char.add(np.char.add(etype.astype(str), "|"), win.astype(str))
    uniq, first, inv = np.unique(key, return_index=True, return_inverse=True)
    n = np.bincount(inv).astype(np.int64)
    s = np.bincount(inv, weights=cents).astype(np.int64)
    mn = np.full(len(uniq), np.iinfo(np.int64).max)
    mx = np.full(len(uniq), np.iinfo(np.int64).min)
    np.minimum.at(mn, inv, cents)
    np.maximum.at(mx, inv, cents)
    return pa.table(
        {
            "event_type": pa.array(etype[first], type=pa.string()),
            "window_start": pa.array(win[first], type=pa.int64()),
            "n_events": pa.array(n, type=pa.int64()),
            "sum_cents": pa.array(s, type=pa.int64()),
            "min_cents": pa.array(mn, type=pa.int64()),
            "max_cents": pa.array(mx, type=pa.int64()),
        }
    )


SESSION_GAP_S = 1800


def sessionize(events_ds, gap_s=SESSION_GAP_S):
    """Session windows per user: a session breaks when the gap between
    consecutive events (ordered by ts, then event_id for determinism)
    exceeds ``gap_s``. Output one row per session:
    (user_id, session_id 1-based, n_events, start_us, end_us).

    groupby(user).map_groups with an in-group sort — the Ray Data
    answer to stateful sessionization (ray_guide.md streaming section);
    per-group state never crosses group boundaries so no actor needed.
    """
    import pandas as pd

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts_us", "event_id"], kind="mergesort")
        ts = g["ts_us"].to_numpy()
        brk = np.zeros(len(ts), dtype=np.int64)
        brk[1:] = (np.diff(ts) > gap_s * 1_000_000).astype(np.int64)
        sid = brk.cumsum() + 1
        out = (
            pd.DataFrame({"session_id": sid, "ts_us": ts})
            .groupby("session_id")
            .agg(n_events=("ts_us", "size"), start_us=("ts_us", "min"), end_us=("ts_us", "max"))
            .reset_index()
        )
        out.insert(0, "user_id", g["user_id"].iloc[0])
        return out

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "ts_us": batch["ts"].cast(pa.int64()),
            }
        )

    return events_ds.map_batches(prep, batch_format="pyarrow").groupby("user_id").map_groups(
        per_user, batch_format="pandas"
    )


def tumbling_window(events_ds, window_s=WINDOW_S):
    """Tumbling window per event_type: count/sum/min/max of int cents."""
    from ray.data.aggregate import Max, Min, Sum

    partials = events_ds.map_batches(
        lambda t: tumbling_partials(t, window_s), batch_format="pyarrow"
    )
    return partials.groupby(["event_type", "window_start"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_cents", alias_name="sum_cents"),
        Min("min_cents", alias_name="min_cents"),
        Max("max_cents", alias_name="max_cents"),
    )
