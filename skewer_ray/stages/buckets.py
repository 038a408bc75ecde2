"""Hash-bucket grouping for per-conversation operators.

``groupby(conv_id).map_groups(fn)`` is the natural Ray Data shape for
"co-locate a conversation, process it whole", but it invokes the UDF
once per GROUP — at 30k conversations per sf0.1 that is 30k Python
calls and dominates wall time (measured 16–36 s vs 3.8 s for the
whole flagship). Grouping by a stable hash bucket of the key keeps the
exact same co-location guarantee (bucket ⊇ conversation) while letting
one UDF call process ~``convs/n_buckets`` conversations with fully
vectorized numpy/pandas segmented kernels — measured 5–10× faster on
the same exchange.

Bucket assignment must be identical across worker processes (the same
conversation hashes in many map tasks), so it uses crc32, not
Python's per-process-salted ``hash``. The bucket column is internal —
it never reaches an output schema, so no oracle depends on it.

Sizing: ``n_buckets`` should scale roughly with #groups/50 and stay
≥ 4× the CPU count so the groupby's reduce stage parallelizes; the
default suits 10³–10⁶ conversations. A whale conversation costs the
same here as under groupby(conv): its rows land in one bucket — the
per-key combiner ops (stages/agg) remain the answer for adversarial
skew.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

N_BUCKETS = 512


def _str_per_distinct(col) -> pa.Array:
    """Python ``str()`` of every value, computed once per DISTINCT value
    (dictionary-encode + take). Nulls render as "None" to match
    ``str(None)``; the null-bearing path falls back to a plain loop."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        return pa.array([str(v) for v in col.to_pylist()], pa.string())
    d = pc.dictionary_encode(col)
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    mapped = pa.array([str(v) for v in d.dictionary.to_pylist()], pa.string())
    return mapped.take(d.indices)


def _bucket_of(joined: pa.Array, n_buckets: int) -> pa.Array:
    """crc32 % n_buckets per DISTINCT joined key, broadcast by take."""
    d = pc.dictionary_encode(joined)
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    uniq = np.array(
        [zlib.crc32(s.encode()) % n_buckets for s in d.dictionary.to_pylist()],
        dtype=np.int32)
    idx = d.indices.to_numpy(zero_copy_only=False)
    return pa.array(uniq[idx], pa.int32())


def with_bucket(ds, key="conv_id", n_buckets: int = N_BUCKETS):
    """Append an internal crc32-mod bucket column for ``key`` (one
    column name or a list — composite keys hash their joined repr).

    Vectorized: crc32 runs once per distinct key (dictionary-encode +
    take — the functions/anonymize.py pattern), not once per row; the
    bucket values are bit-identical to the historical per-row form
    ``crc32("\\x1f".join(map(str, key_tuple)))``."""
    keys = [key] if isinstance(key, str) else list(key)

    def f(b: pa.Table) -> pa.Table:
        strs = [_str_per_distinct(b[k]) for k in keys]
        joined = strs[0] if len(strs) == 1 else \
            pc.binary_join_element_wise(*strs, "\x1f")
        if isinstance(joined, pa.ChunkedArray):
            joined = joined.combine_chunks()
        return b.append_column("bucket", _bucket_of(joined, n_buckets))

    return ds.map_batches(f, batch_format="pyarrow")


def grouped_by_bucket(ds, fn, key="conv_id",
                      n_buckets: int = N_BUCKETS, coalesce: bool = True):
    """groupby(bucket).map_groups with the bucket column stripped
    before ``fn`` — drop-in for groupby(key).map_groups when ``fn``
    handles multiple key-groups per call (sorted/segmented kernels).

    ``coalesce`` merges the input to ~one block per core before the
    sort-based groupby: at the read path's fine block granularity (~8
    blocks/CPU for the wide fused path) the all-to-all is
    SCHEDULING-bound, not data-bound — measured 19 s → 8 s at sf0.1.
    Pass ``coalesce=False`` when the input is already coarse (e.g. the
    summary output of a previous grouped stage) to skip the extra
    barrier."""

    def wrapped(batch: pa.Table) -> pa.Table:
        return fn(batch.drop_columns(["bucket"]))

    out = with_bucket(ds, key, n_buckets)
    if coalesce:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
        out = out.repartition(max(8, cpus))
    return (out.groupby("bucket")
            .map_groups(wrapped, batch_format="pyarrow"))


def run_starts(sorted_keys: np.ndarray) -> np.ndarray:
    """Boolean mask marking the first row of each key run in an array
    already sorted by key."""
    starts = np.ones(len(sorted_keys), dtype=bool)
    if len(sorted_keys) > 1:
        starts[1:] = sorted_keys[1:] != sorted_keys[:-1]
    return starts


def segmented_cumsum(values: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Per-run inclusive cumsum over run-contiguous rows: a plain
    cumsum minus each run's base, fully vectorized. Requires
    ``values ≥ 0`` (the forward-propagation of run bases relies on the
    global cumsum being nondecreasing)."""
    cs = np.cumsum(values)
    base = np.where(starts, cs - values, 0)
    return cs - np.maximum.accumulate(base)
