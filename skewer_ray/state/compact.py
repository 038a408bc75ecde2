"""Small-file compaction for partitioned Parquet output.

Long-running resumable jobs (state/manifest.run_partitioned, the
hive-partitioned fan-out sinks) accumulate many small files: one per
write task per restart. At 100 TB the file COUNT becomes its own
bottleneck — listing, footer reads and downstream `read_parquet`
task-per-fragment scheduling all scale with it. Compaction rewrites a
leaf directory's fragments into ~``target_rows``-row files.

Safety: the rewrite goes to a sibling temp directory first and swaps
in with two atomic renames, so a crash mid-compaction leaves either
the old layout or the new one, never a mix; content (row multiset and
schema) is unchanged, so lineage manifests that count rows stay valid.
Row-group-sized batches stream through — the partition is never fully
in memory.
"""

from __future__ import annotations

import os
import shutil
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

TARGET_ROWS = 1_000_000


def leaf_dirs(root: str) -> list[str]:
    """Directories under ``root`` that directly contain parquet files
    (hive partition leaves)."""
    out = []
    for dirpath, _dirnames, filenames in os.walk(root):
        if any(f.endswith(".parquet") for f in filenames):
            out.append(dirpath)
    return sorted(out)


def compact_dir(leaf: str, target_rows: int = TARGET_ROWS,
                min_files: int = 2) -> dict:
    """Compact one leaf directory. Returns a report dict
    (files_before, files_after, rows). No-op (files_after ==
    files_before) when the leaf already has < ``min_files`` fragments.
    """
    files = sorted(f for f in os.listdir(leaf) if f.endswith(".parquet"))
    rows = sum(pq.ParquetFile(os.path.join(leaf, f)).metadata.num_rows
               for f in files)
    if len(files) < min_files:
        return {"leaf": leaf, "files_before": len(files),
                "files_after": len(files), "rows": rows}

    tmp = leaf + f".compact-{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp)
    writer = None
    out_idx = 0
    out_rows = 0
    try:
        for f in files:
            pf = pq.ParquetFile(os.path.join(leaf, f))
            for batch in pf.iter_batches():
                if writer is None:
                    writer = pq.ParquetWriter(
                        os.path.join(tmp, f"compact-{out_idx:05d}.parquet"),
                        pf.schema_arrow)
                writer.write_table(pa.Table.from_batches([batch]))
                out_rows += batch.num_rows
                if out_rows >= target_rows:
                    writer.close()
                    writer = None
                    out_idx += 1
                    out_rows = 0
        if writer is not None:
            writer.close()
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise

    old = leaf + f".old-{uuid.uuid4().hex[:8]}"
    os.rename(leaf, old)
    os.rename(tmp, leaf)
    shutil.rmtree(old)
    return {"leaf": leaf, "files_before": len(files),
            "files_after": out_idx + (1 if out_rows else 0),
            "rows": rows}


def compact_output(root: str, target_rows: int = TARGET_ROWS) -> list[dict]:
    """Compact every hive leaf under ``root`` (driver-side loop over
    leaves; each leaf rewrite is independent, so at real scale the
    leaves fan out as Ray tasks — the per-leaf function is pure)."""
    return [compact_dir(d, target_rows) for d in leaf_dirs(root)]
