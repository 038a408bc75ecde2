"""Partial (combiner) aggregation helpers.

Ray Data's ``groupby(...).count()`` sort-shuffles EVERY row; at 10^12-turn
scale (and already at sf0.1) that all-to-all exchange dominates the job.
Counters in the reference are cheap in-process increments
(services/base/metrics.go:16-47, store/store.go:77-123) — the Ray-native
equivalent is a per-batch pyarrow ``group_by`` combine inside
``map_batches`` (thousands of rows → a handful of partial-count rows)
followed by a tiny global ``groupby().sum()``. Only partials shuffle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def partial_count_fn(keys: list[str], pre=None):
    """Per-batch combiner: (optional row-level pre-transform) → group_by
    count over ``keys`` → tiny table (keys..., n)."""

    def fn(batch: pa.Table) -> pa.Table:
        if pre is not None:
            batch = pre(batch)
        if batch.num_rows == 0:
            return pa.table(
                {**{k: pa.array([], batch.schema.field(k).type) for k in keys},
                 "n": pa.array([], pa.int64())})
        g = batch.select(keys).group_by(keys).aggregate([([], "count_all")])
        return pa.table({**{k: g[k] for k in keys},
                         "n": pc.cast(g["count_all"], pa.int64())})

    return fn


def grouped_count(ds, keys: list[str], pre=None):
    """Distributed COUNT(*) GROUP BY ``keys`` with map-side combine.

    Returns a Dataset with columns (*keys, n:int64). ``pre`` is an
    optional per-batch pyarrow transform applied before counting (filter
    / projection / derived key columns).
    """
    partials = ds.map_batches(partial_count_fn(keys, pre),
                              batch_format="pyarrow")
    agg = partials.groupby(keys).sum("n")

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({**{k: b[k] for k in keys},
                         "n": pc.cast(b["sum(n)"], pa.int64())})

    return agg.map_batches(rename, batch_format="pyarrow")
