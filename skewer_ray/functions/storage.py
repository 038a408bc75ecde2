"""Storage-layout profiler — the lake-ops audit behind small-file
detection and compression health (companion to state/compact.py, which
FIXES what this op measures; the reference's closest surface is the
badger store size accounting, store/store.go:77-123).

Footer-only: per input file, row/row-group/column-chunk counts and
compressed/uncompressed byte totals come from the parquet FOOTER — no
data pages are read, so profiling a 100-TB lake costs one metadata
round-trip per file. Distribution shape: the FILE LIST is the dataset
(one row per path), footers are read inside ``map_batches`` — a
map-only scan that parallelizes across the cluster and ships back a
handful of scalars per file.
"""

from __future__ import annotations

import os

import pyarrow as pa


def _profile_paths(paths: list[str]) -> pa.Table:
    import pyarrow.parquet as pq
    rows = []
    for p in sorted(paths):
        md = pq.ParquetFile(p).metadata
        comp = uncomp = 0
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for c in range(g.num_columns):
                col = g.column(c)
                comp += col.total_compressed_size
                uncomp += col.total_uncompressed_size
        rows.append({
            "fname": os.path.basename(p),
            "n_rows": md.num_rows,
            "n_row_groups": md.num_row_groups,
            "n_chunks": md.num_row_groups * md.num_columns,
            "compressed_bytes": comp,
            "uncompressed_bytes": uncomp,
        })
    return pa.table({
        "fname": pa.array([r["fname"] for r in rows], pa.string()),
        "n_rows": pa.array([r["n_rows"] for r in rows], pa.int64()),
        "n_row_groups": pa.array([r["n_row_groups"] for r in rows],
                                 pa.int64()),
        "n_chunks": pa.array([r["n_chunks"] for r in rows], pa.int64()),
        "compressed_bytes": pa.array([r["compressed_bytes"]
                                      for r in rows], pa.int64()),
        "uncompressed_bytes": pa.array([r["uncompressed_bytes"]
                                        for r in rows], pa.int64()),
    })


def storage_profile(paths: list[str]) -> pa.Table:
    """Per-file footer profile, distributed over the path list."""
    import ray.data as rd

    if not paths:
        return _profile_paths([])

    ds = rd.from_items([{"path": p} for p in sorted(paths)])

    def prof(batch: pa.Table) -> pa.Table:
        return _profile_paths(batch["path"].to_pylist())

    tables = [b for b in ds.map_batches(prof, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")]
    out = pa.concat_tables(tables)
    return out.take(pa.compute.sort_indices(out["fname"]))
