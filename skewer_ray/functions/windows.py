"""Windowed / session operators over event streams — custom operators the
reference lacks (SURVEY.md §2.7), expressed as Ray Data compositions:

- tumbling window = derived window-start key + map-side-combine groupby
  (no shuffle beyond tiny partials);
- gap sessionization = groupby(entity).map_groups over the sorted group
  (the one genuinely order-dependent aggregate; partition key = entity,
  which is the documented co-location assumption).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.agg import grouped_stats

HOUR_US = 3_600_000_000
SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


def tumbling_counts(events_ds, window_us: int = HOUR_US):
    """(window_start, event_type, n, sum_value): tumbling-window counts.
    The window start is a derived column, so this is an ordinary
    combiner groupby — the streaming-window shuffle collapses to
    partial rows."""

    def pre(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch["ts"], pa.int64())
        win = pc.multiply(pc.divide(ts, window_us), window_us)
        return pa.table({
            "window_start": pc.cast(win, pa.timestamp("us")),
            "event_type": batch["event_type"],
            "value": batch["value"],
        })

    # window-count cardinality is bounded (time-range / window size), so
    # the final combine happens driver-side — no Ray Aggregate operator
    out = grouped_stats(events_ds, ["window_start", "event_type"],
                        [("value", "count"), ("value", "sum")], pre=pre,
                        combine="driver")
    return pa.table({
        "window_start": out["window_start"],
        "event_type": out["event_type"],
        "n": out["n"],
        "sum_value": pc.round(out["sum_value"], 6),
    })


def hopping_counts(events_ds, window_us: int = HOUR_US,
                   hop_us: int = HOUR_US // 2):
    """(window_start, event_type, n, sum_value): HOPPING (sliding)
    windows — each event lands in ``window_us / hop_us`` overlapping
    windows. The flat_map-style replication happens inside the same
    combiner pre-transform (rows × overlap factor, then immediate
    partial aggregation), so the shuffle still only carries partial
    rows. Window starts are hop-aligned."""
    overlap = window_us // hop_us

    def pre(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        # first hop-aligned window containing ts: floor(ts/hop)*hop -
        # (overlap-1) hops ... floor(ts/hop)*hop
        base = (ts // hop_us) * hop_us
        n = len(ts)
        k = np.arange(overlap, dtype=np.int64)
        starts = (base[:, None] - (overlap - 1 - k)[None, :] * hop_us)
        starts = starts.reshape(-1)
        take = pa.array(np.repeat(np.arange(n, dtype=np.int64), overlap))
        return pa.table({
            "window_start": pa.array(starts).cast(pa.timestamp("us")),
            "event_type": pc.take(batch["event_type"], take),
            "value": pc.take(batch["value"], take),
        })

    out = grouped_stats(events_ds, ["window_start", "event_type"],
                        [("value", "count"), ("value", "sum")], pre=pre,
                        combine="driver")
    return pa.table({
        "window_start": out["window_start"],
        "event_type": out["event_type"],
        "n": out["n"],
        "sum_value": pc.round(out["sum_value"], 6),
    })


SESSION_BUCKET_US = 24 * 3_600_000_000  # segment width for the two-phase form


def gap_sessions(events_ds, gap_us: int = SESSION_GAP_US,
                 bucket_us: int = SESSION_BUCKET_US):
    """(user_id, n_sessions, n_events): gap-based sessionization, WHALE-
    SAFE two-phase form (segmented scan):

    phase 1 — groupby (user_id, time-bucket): per segment, sort the
    segment's events and compute (session count, min ts, max ts,
    n events). A user owning half the corpus now splits across many
    segments, so no single group must hold the whole user.

    phase 2 — groupby user_id over the per-segment SUMMARIES (tiny:
    one row per user per active segment): walk segments in time order
    and subtract one session per adjacent pair whose boundary gap is
    ≤ gap_us (sessions are additive across segments except at merged
    boundaries — exact, because events never cross segment boundaries
    out of order).

    Requires bucket_us ≥ gap_us so a session can only span ADJACENT
    segments."""
    assert bucket_us >= gap_us

    def segment_summary(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = pc.cast(batch["event_id"], pa.int64()).to_numpy(
            zero_copy_only=False)
        order = np.lexsort((eid, ts))
        st = ts[order]
        n_sessions = 1 + int((np.diff(st) > gap_us).sum()) if len(st) else 0
        return pa.table({
            "user_id": batch["user_id"].slice(0, 1),
            "bucket": batch["bucket"].slice(0, 1),
            "n_sessions": pa.array([n_sessions], pa.int64()),
            "first_ts": pa.array([int(st[0]) if len(st) else 0], pa.int64()),
            "last_ts": pa.array([int(st[-1]) if len(st) else 0], pa.int64()),
            "n_events": pa.array([len(st)], pa.int64()),
        })

    def add_bucket(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch["ts"], pa.int64())
        return batch.append_column(
            "bucket", pc.cast(pc.divide(ts, bucket_us), pa.int64()))

    summaries = (events_ds
                 .map_batches(add_bucket, batch_format="pyarrow")
                 .groupby(["user_id", "bucket"])
                 .map_groups(segment_summary, batch_format="pyarrow"))

    def merge_user(batch: pa.Table) -> pa.Table:
        order = pc.sort_indices(batch, sort_keys=[("bucket", "ascending")])
        b = batch.take(order)
        ns = np.asarray(b["n_sessions"].to_pylist(), dtype=np.int64)
        first = np.asarray(b["first_ts"].to_pylist(), dtype=np.int64)
        last = np.asarray(b["last_ts"].to_pylist(), dtype=np.int64)
        total = int(ns.sum())
        if len(ns) > 1:
            # merge sessions spanning adjacent segment boundaries
            total -= int((first[1:] - last[:-1] <= gap_us).sum())
        return pa.table({
            "user_id": b["user_id"].slice(0, 1),
            "n_sessions": pa.array([total], pa.int64()),
            "n_events": pa.array(
                [int(np.asarray(b["n_events"].to_pylist()).sum())],
                pa.int64()),
        })

    return summaries.groupby("user_id").map_groups(
        merge_user, batch_format="pyarrow")


def asof_join_events(events_ds, left_type: str = "purchase",
                     right_type: str = "click"):
    """As-of join (an operator Ray Data lacks natively): for every
    ``left_type`` event, the most recent ``right_type`` event of the
    SAME user with ``r.ts <= l.ts`` — ties on ts broken by the larger
    event_id. Inner semantics: lefts with no prior right are dropped.

    Shape: pre-filter both sides to the two types (column- and
    row-pruned), shuffle ONCE keyed by user_id, then a linear two-
    pointer sweep inside each user group (sort by (ts, kind, id): at
    equal ts the right side is processed first, so it is visible to the
    left row). Partitioning assumption: one user's filtered events fit
    a group — the same premise as the pre-segmented sessionizer; a
    whale user would need the gap_sessions-style two-phase split.

    Output: (p_event, user_id, p_ts, c_event, c_ts).
    """

    def pre(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch["event_type"],
                        value_set=pa.array([left_type, right_type]))
        b = batch.filter(keep)
        return pa.table({
            "user_id": b["user_id"],
            "event_id": b["event_id"],
            "ts": b["ts"],
            "is_left": pc.equal(b["event_type"], left_type),
        })

    def sweep(tbl: pa.Table) -> pa.Table:
        ts = pc.cast(tbl["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = tbl["event_id"].to_numpy(zero_copy_only=False)
        is_l = tbl["is_left"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, is_l, ts))  # ts, then rights first, id
        uid = tbl["user_id"][0].as_py()
        p_ev, p_ts, c_ev, c_ts = [], [], [], []
        last_ev = last_ts = None
        for i in order:
            if is_l[i]:
                if last_ev is not None:
                    p_ev.append(int(eid[i]))
                    p_ts.append(int(ts[i]))
                    c_ev.append(last_ev)
                    c_ts.append(last_ts)
            else:
                last_ev, last_ts = int(eid[i]), int(ts[i])
        n = len(p_ev)
        return pa.table({
            "p_event": pa.array(p_ev, pa.int64()),
            "user_id": pa.array([uid] * n, pa.int64()),
            "p_ts": pa.array(p_ts, pa.int64()).cast(pa.timestamp("us")),
            "c_event": pa.array(c_ev, pa.int64()),
            "c_ts": pa.array(c_ts, pa.int64()).cast(pa.timestamp("us")),
        })

    pruned = events_ds.map_batches(pre, batch_format="pyarrow")
    return pruned.groupby("user_id").map_groups(sweep,
                                                batch_format="pyarrow")


def range_join_counts(events_ds, lookback_us: int = 30 * 60 * 1_000_000):
    """Range self-join (the second temporal operator Ray Data lacks):
    for every event, how many events of the SAME user fall in the
    half-open window [ts - lookback, ts) — the per-event velocity /
    burst feature of fraud and abuse pipelines.

    Shape: ONE user-keyed shuffle, then a linear two-pointer sweep per
    group over the (ts, event_id)-sorted events — O(n log n) per user
    vs the O(n²) naive range join. Same whale-user caveat as
    asof_join_events.

    Output: (event_id, user_id, n_prior) — n_prior counts STRICTLY
    earlier events in the window; simultaneous-ts events (and the event
    itself) are excluded.
    """

    def sweep(tbl: pa.Table) -> pa.Table:
        ts = pc.cast(tbl["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = tbl["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        ts_s, eid_s = ts[order], eid[order]
        n = len(ts_s)
        # left edge of the window per event (two-pointer)
        lo = np.searchsorted(ts_s, ts_s - lookback_us, side="left")
        # strictly-earlier bound: first index with the same ts
        hi = np.searchsorted(ts_s, ts_s, side="left")
        uid = tbl["user_id"][0].as_py()
        return pa.table({
            "event_id": pa.array(eid_s, pa.int64()),
            "user_id": pa.array([uid] * n, pa.int64()),
            "n_prior": pa.array(hi - lo, pa.int64()),
        })

    pruned = events_ds.map_batches(
        lambda b: b.select(["event_id", "ts", "user_id"]),
        batch_format="pyarrow")
    return pruned.groupby("user_id").map_groups(sweep,
                                                batch_format="pyarrow")
