"""Corpus-curation operators a large-scale training-data pipeline needs:
deterministic sampling, per-group quota capping, and document chunking.

All three are built for the 100-TB regime:

- ``sample_docs``: embarrassingly parallel map — membership is a pure
  function of the row key (md5 prefix), so the sample is reproducible
  across runs/engines/partitionings and needs no coordination or RNG
  state. md5 keeps the DuckDB oracle bit-exact (same convention as the
  dedup family).
- ``cap_per_group``: two-phase top-K — per-batch partial top-K first,
  so the shuffle carries at most (groups × K) rows per batch, never the
  corpus; a whale group costs K rows per batch it appears in, not its
  full size (same skew shape as stages/agg.grouped_stats).
- ``chunk_docs``: 1→N sliding-window chunking, fully vectorized — one
  Arrow utf8_slice per chunk index over the whole batch rather than a
  Python loop per row.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SAMPLE_PREFIX = 0x1A  # keep rows whose md5(key) first byte < 0x1a (26/256)


def sample_docs(docs_ds, key_col: str = "doc_id",
                keep_below: int = SAMPLE_PREFIX,
                cols: tuple[str, ...] = ("doc_id", "lang", "source")):
    """Deterministic ~(keep_below/256) sample: keep rows where
    md5(str(key))[0] < keep_below. Oracle: substr(md5(..),1,2) <
    hex(keep_below) — lexicographic hex compare equals the byte
    compare."""

    def fn(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        keep = np.fromiter(
            (hashlib.md5(str(k).encode()).digest()[0] < keep_below
             for k in keys), dtype=bool, count=len(keys))
        return batch.select(list(cols)).filter(pa.array(keep))

    return docs_ds.map_batches(fn, batch_format="pyarrow")


def local_topk_table(batch: pa.Table, group_col: str, order_col: str,
                     k: int, cols: tuple[str, ...]) -> pa.Table:
    """Per-batch top-K per group (the partial kernel of
    ``cap_per_group``; exposed so the skew test can assert its output
    bound directly): ≤ distinct-groups-in-batch × K rows out."""
    t = batch.select(list(cols)).sort_by(
        [(group_col, "ascending"), (order_col, "ascending")])
    g = t[group_col].to_numpy(zero_copy_only=False)
    # rank within consecutive group runs (input sorted by group)
    starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
    rank = np.arange(len(g)) - np.repeat(
        starts, np.diff(np.r_[starts, len(g)]))
    return t.filter(pa.array(rank < k))


def cap_per_group(docs_ds, group_col: str = "source",
                  order_col: str = "doc_id", k: int = 50,
                  cols: tuple[str, ...] = ("doc_id", "source", "lang")):
    """Keep the K smallest ``order_col`` rows per ``group_col`` (quota
    capping, e.g. max N documents per domain).

    Phase 1 (map): per-batch top-K per group — output ≤ groups×K rows
    per batch. Phase 2 (shuffle): groupby(group) over partials, final
    top-K per group. Associative, so two-phase is exact."""

    def local_topk(batch: pa.Table) -> pa.Table:
        return local_topk_table(batch, group_col, order_col, k, cols)

    partials = docs_ds.map_batches(local_topk, batch_format="pyarrow")
    return partials.groupby(group_col).map_groups(
        local_topk, batch_format="pyarrow")


def chunk_table(batch: pa.Table, size: int, stride: int,
                id_col: str = "doc_id",
                text_col: str = "text") -> pa.Table:
    """One batch of 1→N sliding-window chunks (the per-batch kernel of
    ``chunk_docs``; exposed for direct/property testing): one Arrow
    utf8_slice_codeunits call per chunk index covers the whole batch;
    rows too short for that index are filtered by a length mask."""
    n = pc.utf8_length(batch[text_col])
    max_len = pc.max(n).as_py() or 0
    ids, idxs, chunks = [], [], []
    i = 0
    while i * stride < max_len:
        off = i * stride
        alive = pc.greater(n, off)
        sub_ids = batch[id_col].filter(alive)
        sub_txt = pc.utf8_slice_codeunits(
            batch[text_col].filter(alive), off, off + size)
        ids.append(sub_ids)
        idxs.append(pa.array(
            np.full(len(sub_ids), i, dtype=np.int64), pa.int64()))
        chunks.append(sub_txt)
        i += 1
    if not ids:
        return pa.table({id_col: pa.array([], batch[id_col].type),
                         "chunk_idx": pa.array([], pa.int64()),
                         "chunk": pa.array([], pa.string())})
    cat = lambda xs: pa.concat_arrays(  # noqa: E731
        [x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x
         for x in xs])
    return pa.table({id_col: cat(ids),
                     "chunk_idx": cat(idxs),
                     "chunk": cat(chunks)})


def chunk_docs(docs_ds, size: int = 200, stride: int = 150,
               id_col: str = "doc_id", text_col: str = "text"):
    """1→N sliding-window chunks: (doc_id, chunk_idx, chunk) with
    ``chunk = text[chunk_idx*stride : chunk_idx*stride + size]``, for
    every chunk_idx with chunk_idx*stride < len(text). Chunk count per
    batch is bounded by the longest document, not the row count."""

    def fn(batch: pa.Table) -> pa.Table:
        return chunk_table(batch, size, stride, id_col, text_col)

    return docs_ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow")


# per-language stratified sampling rates, as first-md5-byte bounds
# (256ths): en is downsampled hard, tail languages kept aggressively —
# the standard corpus-rebalancing move
STRATA_BOUNDS = {"en": 0x20, "zh": 0x80, "es": 0x80, "de": 0xc0,
                 "fr": 0xc0}
STRATA_DEFAULT = 0x40


def stratified_sample(docs_ds, strata_col: str = "lang",
                      key_col: str = "doc_id",
                      bounds: dict[str, int] | None = None,
                      default: int = STRATA_DEFAULT,
                      cols: tuple[str, ...] = ("doc_id", "lang", "source")):
    """Deterministic per-stratum sampling: keep a row iff
    md5(str(key))[0] < bounds[stratum]. Same pure-function membership
    as ``sample_docs`` (reproducible across engines/partitionings, no
    RNG state, map-only — nothing shuffles), but the keep-rate is a
    per-group knob, which is how corpus language/source rebalancing is
    actually run at scale."""
    bounds = STRATA_BOUNDS if bounds is None else bounds

    def fn(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        strata = batch[strata_col].to_pylist()
        keep = np.fromiter(
            (hashlib.md5(str(k).encode()).digest()[0]
             < bounds.get(s, default)
             for k, s in zip(keys, strata)),
            dtype=bool, count=len(keys))
        return batch.select(list(cols)).filter(pa.array(keep))

    return docs_ds.map_batches(fn, batch_format="pyarrow")
