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


def gap_sessions(events_ds, gap_us: int = SESSION_GAP_US):
    """(user_id, n_sessions, n_events): gap-based sessionization. A new
    session starts when the inter-event gap within a user exceeds
    ``gap_us``. Requires all of a user's events in one group — the
    groupby(user_id) shuffle provides exactly that co-location."""

    def sessions(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = pc.cast(batch["event_id"], pa.int64()).to_numpy(
            zero_copy_only=False)
        order = np.lexsort((eid, ts))
        st = ts[order]
        n_sessions = 1 + int((np.diff(st) > gap_us).sum()) if len(st) else 0
        return pa.table({
            "user_id": batch["user_id"].slice(0, 1),
            "n_sessions": pa.array([n_sessions], pa.int64()),
            "n_events": pa.array([len(st)], pa.int64()),
        })

    return events_ds.groupby("user_id").map_groups(
        sessions, batch_format="pyarrow")
