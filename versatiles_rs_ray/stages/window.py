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
    etype_arr = batch["event_type"]
    if isinstance(etype_arr, pa.ChunkedArray):
        etype_arr = etype_arr.combine_chunks()
    value = np.asarray(batch["value"], dtype=np.float64)
    cents = np.floor(value * 100.0).astype(np.int64)  # int cents: oracle-stable sums
    return _window_partial_kernel(win, etype_arr, cents)


def _window_partial_kernel(win: np.ndarray, etype_arr: pa.Array,
                           cents: np.ndarray) -> pa.Table:
    # pack (event-type code, window) into one int64 so the per-batch
    # dedup is integer np.unique, not per-row string building: Arrow
    # dictionary-encode stays in string space once (no object arrays in
    # the hot kernel), then ARITHMETIC keys win*2^16+code — correct for
    # negative windows too (pre-1970 ts), where a bitwise OR would
    # merge all types
    enc = etype_arr.dictionary_encode()
    # null event types form their own group (code -1 shifted to 0 so a
    # window's null group can never collide with the previous window's
    # last dictionary code); the output take() restores them to null
    codes = np.asarray(enc.indices.fill_null(-1), dtype=np.int64)
    if len(enc.dictionary) + 1 >= (1 << 16):
        raise ValueError("more than 2^16 distinct event types in one batch")
    key = win * np.int64(1 << 16) + (codes + 1)
    uniq, first, inv = np.unique(key, return_index=True, return_inverse=True)
    n = np.bincount(inv).astype(np.int64)
    # integer-exact sums (float bincount weights would round above
    # 2^53 cents, defeating the int-cents design): reduceat over the
    # group-sorted cents
    order = np.argsort(inv, kind="stable")
    starts = np.flatnonzero(np.r_[True, inv[order][1:] != inv[order][:-1]])
    s = np.add.reduceat(cents[order], starts)
    mn = np.full(len(uniq), np.iinfo(np.int64).max)
    mx = np.full(len(uniq), np.iinfo(np.int64).min)
    np.minimum.at(mn, inv, cents)
    np.maximum.at(mx, inv, cents)
    return pa.table(
        {
            "event_type": enc.dictionary.take(
                pa.array(codes[first], mask=codes[first] < 0)
            ).cast(pa.string()),
            "window_start": pa.array(win[first], type=pa.int64()),
            "n_events": pa.array(n, type=pa.int64()),
            "sum_cents": pa.array(s, type=pa.int64()),
            "min_cents": pa.array(mn, type=pa.int64()),
            "max_cents": pa.array(mx, type=pa.int64()),
        }
    )


SESSION_GAP_S = 1800


def _sessionize_block(table: pa.Table, gap_us: int) -> pa.Table:
    """One partition's events (ALL events of its users, guaranteed by
    the hash exchange) -> one row per session. Fully vectorized: one
    lexsort, run-boundary masks, reduceat-style slicing — no per-user
    Python, so partition cost is O(rows log rows) regardless of how
    many users it holds."""
    n = table.num_rows
    if n == 0:
        return pa.table(
            {
                "user_id": pa.array([], type=pa.int64()),
                "session_id": pa.array([], type=pa.int64()),
                "n_events": pa.array([], type=pa.int64()),
                "start_us": pa.array([], type=pa.int64()),
                "end_us": pa.array([], type=pa.int64()),
            }
        )
    uid = np.asarray(table["user_id"], dtype=np.int64)
    eid = np.asarray(table["event_id"], dtype=np.int64)
    ts = np.asarray(table["ts_us"], dtype=np.int64)
    order = np.lexsort((eid, ts, uid))  # by user, then ts, then event_id
    u, t = uid[order], ts[order]
    new_user = np.empty(n, dtype=bool)
    new_user[0] = True
    new_user[1:] = u[1:] != u[:-1]
    brk = new_user.copy()
    brk[1:] |= (t[1:] - t[:-1]) > gap_us
    starts = np.flatnonzero(brk)  # first event index of each session
    ends = np.append(starts[1:], n) - 1  # last event index
    s_user = u[starts]
    # 1-based session number within each user: position inside the
    # session-run of that user
    user_first = np.flatnonzero(np.r_[True, s_user[1:] != s_user[:-1]])
    runs = np.diff(np.append(user_first, len(starts)))
    session_id = np.arange(len(starts)) - np.repeat(user_first, runs) + 1
    return pa.table(
        {
            "user_id": pa.array(s_user, type=pa.int64()),
            "session_id": pa.array(session_id, type=pa.int64()),
            "n_events": pa.array(ends - starts + 1, type=pa.int64()),
            "start_us": pa.array(t[starts], type=pa.int64()),
            "end_us": pa.array(t[ends], type=pa.int64()),
        }
    )


def sessionize(events_ds, gap_s=SESSION_GAP_S, num_partitions: int = 16):
    """Session windows per user: a session breaks when the gap between
    consecutive events (ordered by ts, then event_id for determinism)
    exceeds ``gap_s``. Output one row per session:
    (user_id, session_id 1-based, n_events, start_us, end_us).

    Hash exchange on user_id co-locates each user's events, then ONE
    vectorized kernel per partition builds every session — replacing
    the earlier groupby(user).map_groups per-group pandas path, which
    pays per-group Python at millions of users (the engine's measured
    10-20x-slower groupby regime; NOTES.md lesson 2)."""
    import functools

    from .exchange import hash_exchange

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "ts_us": batch["ts"].cast(pa.int64()),
            }
        )

    prepped = events_ds.map_batches(prep, batch_format="pyarrow")
    return hash_exchange(
        prepped,
        "user_id",
        functools.partial(_sessionize_block, gap_us=gap_s * 1_000_000),
        num_partitions=num_partitions,
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


def hopping_partials(batch: pa.Table, window_s: int,
                     hop_s: int) -> pa.Table:
    """Per-batch partials for OVERLAPPING (hopping/sliding) windows of
    length ``window_s`` advancing every ``hop_s``: an event at ``ts``
    belongs to the k = window_s/hop_s windows starting at
    ``(ts // hop - j) * hop`` for j in 0..k-1 (each start satisfies
    start <= ts < start + window). The event replicates into each of
    its k windows BEFORE the combine, so the partial stays the usual
    bounded (type, window) table — k is a small constant, not a data
    blowup."""
    ts = np.asarray(batch["ts"].cast(pa.int64()))  # microseconds
    etype_arr = batch["event_type"]
    if isinstance(etype_arr, pa.ChunkedArray):
        etype_arr = etype_arr.combine_chunks()
    value = np.asarray(batch["value"], dtype=np.float64)
    cents = np.floor(value * 100.0).astype(np.int64)
    k = window_s // hop_s
    hop = ts // (hop_s * 1_000_000)
    parts = [
        _window_partial_kernel((hop - j) * hop_s, etype_arr, cents)
        for j in range(k)
    ]
    return pa.concat_tables(parts)


def hopping_window(events_ds, window_s=WINDOW_S, hop_s=None):
    """Hopping (overlapping) windows per event_type: count/sum/min/max
    of int cents over windows of ``window_s`` seconds every ``hop_s``
    seconds (``window_s`` must be a multiple of ``hop_s``; hop ==
    window degenerates to the tumbling window). Same shuffle shape as
    :func:`tumbling_window` — replication happens inside the map-side
    partial, so the groupby still moves one row per (type, window) per
    block."""
    from ray.data.aggregate import Max, Min, Sum

    if hop_s is None:
        hop_s = window_s
    if hop_s < 1 or window_s < 1:
        raise ValueError(
            f"hopping_window: window_s/hop_s must be >= 1, got "
            f"{window_s}/{hop_s}")
    if window_s % hop_s:
        raise ValueError(
            f"hopping_window: window_s ({window_s}) must be a multiple "
            f"of hop_s ({hop_s})")
    partials = events_ds.map_batches(
        lambda t: hopping_partials(t, window_s, hop_s),
        batch_format="pyarrow")
    return partials.groupby(["event_type", "window_start"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_cents", alias_name="sum_cents"),
        Min("min_cents", alias_name="min_cents"),
        Max("max_cents", alias_name="max_cents"),
    )


# ---- JSON props extraction (event-payload field stats) -------------------


def _props_partial(batch: pa.Table, field: str) -> pa.Table:
    """Per-batch combiner: extract an integer field from the JSON
    `props` column with a VECTORIZED Arrow regex (no per-row
    json.loads in the hot path — the fields the pipeline needs are
    named up front, so a targeted extract beats a full parse), then
    pre-aggregate per event_type."""
    import pyarrow.compute as pc

    empty = pa.table({
        "event_type": pa.array([], type=pa.string()),
        "n": pa.array([], type=pa.int64()),
        "sum_v": pa.array([], type=pa.int64()),
        "max_v": pa.array([], type=pa.int64()),
    })
    import re

    ex = pc.extract_regex(batch["props"],
                          f'"{re.escape(field)}":\\s*(?P<v>-?\\d+)')
    valid = ex.is_valid()
    v = pc.cast(pc.struct_field(ex.combine_chunks() if isinstance(ex, pa.ChunkedArray) else ex, "v"), pa.int64())
    t = pa.table({"event_type": batch["event_type"], "v": v}).filter(valid)
    if t.num_rows == 0:  # no row carries the field: empty partial
        return empty
    et = t["event_type"].combine_chunks().dictionary_encode()
    codes = np.asarray(et.indices, dtype=np.int64)
    vals = np.asarray(t["v"], dtype=np.int64)
    order = np.argsort(codes, kind="stable")
    cs = codes[order]
    starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
    sums = np.add.reduceat(vals[order], starts)
    maxs = np.maximum.reduceat(vals[order], starts)
    counts = np.diff(np.append(starts, len(cs)))
    names = et.dictionary.take(pa.array(cs[starts], type=pa.int64()))
    return pa.table({
        "event_type": names,
        "n": pa.array(counts, type=pa.int64()),
        "sum_v": pa.array(sums, type=pa.int64()),
        "max_v": pa.array(maxs, type=pa.int64()),
    })


def props_field_stats(events_ds, field: str = "k") -> pa.Table:
    """Per-event_type stats over an integer field inside the JSON
    `props` payload: vectorized extract + per-batch partials + tiny
    driver merge (event types are few). Integer sums — exact.

    CONTRACT: the extraction is a targeted regex (first `"field": int`
    occurrence), correct for flat JSON objects with primitive values —
    the shape event-payload columns have. It is NOT a JSON parser: a
    string VALUE containing the quoted pattern, or nested objects
    reusing the key, would be misread; route such payloads through a
    real parse stage instead. The oracle uses the same regex so the
    contract is what's verified."""
    import functools

    parts = events_ds.map_batches(
        functools.partial(_props_partial, field=field), batch_format="pyarrow"
    ).to_pandas()
    agg = parts.groupby("event_type", sort=True).agg(
        n=("n", "sum"), sum_v=("sum_v", "sum"), max_v=("max_v", "max")
    ).reset_index()
    return pa.Table.from_pandas(agg, preserve_index=False)


# ---- funnel analysis (ordered conversion counting) ------------------------

def _funnel_block(table: pa.Table, stages: tuple) -> pa.Table:
    """One partition's events (ALL events of its users, via the hash
    exchange) -> per-stage reached-user count partials. Vectorized:
    per stage k, a user's reach time is the MIN ts of a stage-k event
    STRICTLY AFTER their stage-(k-1) reach time — four np.minimum.at
    reductions, no per-user Python."""
    out_stage = np.arange(1, len(stages) + 1, dtype=np.int64)
    if table.num_rows == 0:
        return pa.table({
            "stage": pa.array(out_stage, type=pa.int64()),
            "event_type": pa.array(list(stages), type=pa.string()),
            "n_users": pa.array(np.zeros(len(stages), np.int64),
                                type=pa.int64()),
        })
    uid = np.asarray(table["user_id"], dtype=np.int64)
    ts = np.asarray(table["ts_us"], dtype=np.int64)
    etype = table["event_type"]
    if isinstance(etype, pa.ChunkedArray):
        etype = etype.combine_chunks()
    uniq, uidx = np.unique(uid, return_inverse=True)
    big = np.iinfo(np.int64).max
    prev = np.full(len(uniq), np.iinfo(np.int64).min)
    counts = []
    for stage in stages:
        import pyarrow.compute as pc

        m = np.asarray(pc.equal(etype, stage).fill_null(False))
        m &= ts > prev[uidx]
        t_k = np.full(len(uniq), big)
        if m.any():
            np.minimum.at(t_k, uidx[m], ts[m])
        counts.append(int((t_k < big).sum()))
        prev = t_k
    return pa.table({
        "stage": pa.array(out_stage, type=pa.int64()),
        "event_type": pa.array(list(stages), type=pa.string()),
        "n_users": pa.array(np.asarray(counts, np.int64), type=pa.int64()),
    })


def funnel(events_ds, stages, num_partitions: int = 16):
    """Ordered-funnel conversion counts: for each prefix of ``stages``
    (event types), the number of users with a strictly-increasing
    timestamp chain through it (stage k's time = min ts of a stage-k
    event strictly after the user's stage-(k-1) time — the standard
    first-touch funnel). One hash exchange on user_id co-locates each
    user's events; per-partition counting is four vectorized
    reductions; the final combine sums len(stages) x partitions tiny
    rows. Output: (stage 1-based, event_type, n_users)."""
    import functools

    from ray.data.aggregate import Sum

    from .exchange import hash_exchange

    if len(stages) < 1:
        raise ValueError("funnel: need at least one stage")

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "ts_us": batch["ts"].cast(pa.int64()),
            "event_type": batch["event_type"],
        })

    prepped = events_ds.map_batches(prep, batch_format="pyarrow")
    parts = hash_exchange(
        prepped, "user_id",
        functools.partial(_funnel_block, stages=tuple(stages)),
        num_partitions=num_partitions)
    return parts.groupby(["stage", "event_type"]).aggregate(
        Sum("n_users", alias_name="n_users"))


def _rolling_block(table: pa.Table, k: int) -> pa.Table:
    """Per user-partition: rolling sum/count of the last k values in
    (ts, event_id) order within each user. Vectorized: one lexsort,
    per-segment clamped prefix-sum differences — no per-user Python."""
    empty = pa.table({
        "event_id": pa.array([], type=pa.int64()),
        "roll_sum_micro": pa.array([], type=pa.int64()),
        "roll_n": pa.array([], type=pa.int64()),
    })
    if table.num_rows == 0:
        return empty
    u = np.asarray(table["user_id"], dtype=np.int64)
    ts = np.asarray(table["ts_us"], dtype=np.int64)
    eid = np.asarray(table["event_id"], dtype=np.int64)
    v = np.asarray(table["v_micro"], dtype=np.int64)
    order = np.lexsort((eid, ts, u))
    u, ts, eid, v = u[order], ts[order], eid[order], v[order]
    n = len(u)
    idx = np.arange(n, dtype=np.int64)
    new_seg = np.r_[True, u[1:] != u[:-1]]
    seg_start = np.maximum.accumulate(np.where(new_seg, idx, 0))
    lo = np.maximum(idx - k + 1, seg_start)
    cs = np.cumsum(v)
    rsum = cs - np.where(lo > 0, cs[np.maximum(lo - 1, 0)], 0)
    return pa.table({
        "event_id": pa.array(eid, type=pa.int64()),
        "roll_sum_micro": pa.array(rsum, type=pa.int64()),
        "roll_n": pa.array(idx - lo + 1, type=pa.int64()),
    })


def rolling_window(events_ds, k: int = 3, num_partitions: int = 16):
    """Per-key ordered rolling aggregate — the SQL window function
    SUM/COUNT OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS
    k-1 PRECEDING) as one hash exchange: each user's events co-locate,
    the per-partition kernel is a lexsort + clamped prefix-sum
    difference (no per-user loop). Values quantize to integer
    micro-units BEFORE summing, so every rolling sum is an exact int64
    no matter how blocks arrived — the oracle matches bit-for-bit.
    (ts, event_id) is a total order (event_id unique), so the window
    contents are deterministic under timestamp ties. Output one row
    per event: (event_id, roll_sum_micro, roll_n)."""
    import functools

    from .exchange import hash_exchange

    if k < 1:
        raise ValueError(f"rolling_window: k must be >= 1, got {k}")

    def prep(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch["value"], dtype=np.float64)
        return pa.table({
            "user_id": batch["user_id"].cast(pa.int64()),
            "ts_us": batch["ts"].cast(pa.int64()),
            "event_id": batch["event_id"].cast(pa.int64()),
            "v_micro": pa.array(np.floor(v * 1e6).astype(np.int64),
                                type=pa.int64()),
        })

    prepped = events_ds.map_batches(prep, batch_format="pyarrow")
    return hash_exchange(prepped, "user_id",
                         functools.partial(_rolling_block, k=k),
                         num_partitions=num_partitions)


def _cohort_block(table: pa.Table, week_us: int) -> pa.Table:
    """Per user-partition: each user's events are all here, so the
    cohort (first-seen week) and the distinct active weeks are local —
    emit (cohort_week, week_offset, n) partials, weeks^2-bounded."""
    empty = pa.table({
        "cohort_week": pa.array([], type=pa.int64()),
        "week_offset": pa.array([], type=pa.int64()),
        "n_users": pa.array([], type=pa.int64()),
    })
    if table.num_rows == 0:
        return empty
    u = np.asarray(table["user_id"], dtype=np.int64)
    w = np.asarray(table["ts_us"], dtype=np.int64) // week_us
    uw = np.unique(np.stack([u, w], axis=1), axis=0)  # distinct (user, week)
    uu, start = np.unique(uw[:, 0], return_index=True)
    # rows are sorted by (user, week): each user's first row IS the
    # min week = the cohort
    cohort = np.repeat(uw[start, 1], np.diff(np.r_[start, len(uw)]))
    key = np.stack([cohort, uw[:, 1] - cohort], axis=1)
    pairs, cnt = np.unique(key, axis=0, return_counts=True)
    return pa.table({
        "cohort_week": pa.array(pairs[:, 0], type=pa.int64()),
        "week_offset": pa.array(pairs[:, 1], type=pa.int64()),
        "n_users": pa.array(cnt.astype(np.int64), type=pa.int64()),
    })


def retention_cohorts(events_ds, week_s: int = 7 * 86400,
                      num_partitions: int = 16):
    """Cohort retention over the event stream: users cohorted by their
    first-seen week; for every (cohort_week, week_offset) the number
    of cohort users active in that week — the standard retention
    triangle. One hash exchange on user_id co-locates each user's
    events (cohort and distinct-week dedup are then local and exact);
    the combine sums weeks^2-bounded partial rows. Weeks are epoch
    microseconds // week; exact integers end to end."""
    import functools

    from ray.data.aggregate import Sum

    from .exchange import hash_exchange

    if week_s < 1:
        raise ValueError(f"retention_cohorts: week_s must be >= 1, got {week_s}")

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"].cast(pa.int64()),
            "ts_us": batch["ts"].cast(pa.int64()),
        })

    prepped = events_ds.map_batches(prep, batch_format="pyarrow")
    parts = hash_exchange(
        prepped, "user_id",
        functools.partial(_cohort_block, week_us=week_s * 1_000_000),
        num_partitions=num_partitions)
    return parts.groupby(["cohort_week", "week_offset"]).aggregate(
        Sum("n_users", alias_name="n_users"))


def _transition_block(table: pa.Table) -> pa.Table:
    """Per user-partition: (from_type, to_type) adjacent-transition
    count partials over each user's (ts, event_id)-ordered stream —
    one lexsort + shifted compare, no per-user Python."""
    empty = pa.table({"from_type": pa.array([], type=pa.string()),
                      "to_type": pa.array([], type=pa.string()),
                      "n": pa.array([], type=pa.int64())})
    if table.num_rows == 0:
        return empty
    import pyarrow.compute as pc

    u = np.asarray(table["user_id"], dtype=np.int64)
    ts = np.asarray(table["ts_us"], dtype=np.int64)
    eid = np.asarray(table["event_id"], dtype=np.int64)
    et = table["event_type"].combine_chunks()
    enc = et.dictionary_encode()
    # null-safe code extraction (the window.py convention): a null
    # index converts to INT64_MIN silently otherwise, corrupting the
    # packed pair arithmetic below
    codes = np.asarray(pc.fill_null(enc.indices, -1), dtype=np.int64)
    order = np.lexsort((eid, ts, u))
    u, codes = u[order], codes[order]
    same_user = u[1:] == u[:-1]
    # oracle parity (lead() + WHERE nxt IS NOT NULL): a null FROM type
    # keeps its transition row (grouped under null), a null TO drops it
    keep = same_user & (codes[1:] >= 0)
    frm = codes[:-1][keep]
    to = codes[1:][keep]
    if len(frm) == 0:
        return empty
    k = len(enc.dictionary)
    pair, cnt = np.unique((frm + 1) * (k + 1) + to, return_counts=True)
    f = pair // (k + 1) - 1
    t = pair % (k + 1)
    taken_f = enc.dictionary.take(pa.array(np.maximum(f, 0),
                                           type=pa.int64()))
    from_types = pc.if_else(pa.array(f >= 0), taken_f,
                            pa.scalar(None, type=pa.string()))
    return pa.table({
        "from_type": from_types,
        "to_type": enc.dictionary.take(pa.array(t, type=pa.int64())),
        "n": pa.array(cnt.astype(np.int64), type=pa.int64()),
    })


def event_transitions(events_ds, num_partitions: int = 16):
    """First-order Markov transition counts over the event stream:
    for every user, each adjacent (ts, event_id)-ordered pair of
    events contributes one (from_type, to_type) transition; output is
    the corpus-wide count per ordered type pair — the funnel/session
    analytics building block. One hash exchange on user_id (each
    user's ordering is then local and exact); the combine sums
    |types|^2-bounded partials. (ts, event_id) is a total order, so
    transition counts are deterministic under timestamp ties."""
    from ray.data.aggregate import Sum

    from .exchange import hash_exchange

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"].cast(pa.int64()),
            "ts_us": batch["ts"].cast(pa.int64()),
            "event_id": batch["event_id"].cast(pa.int64()),
            "event_type": batch["event_type"],
        })

    prepped = events_ds.map_batches(prep, batch_format="pyarrow")
    parts = hash_exchange(prepped, "user_id", _transition_block,
                          num_partitions=num_partitions)
    return parts.groupby(["from_type", "to_type"]).aggregate(
        Sum("n", alias_name="n"))
