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
