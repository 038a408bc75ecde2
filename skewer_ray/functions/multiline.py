"""Multiline log-record reassembly (stack traces, wrapped payloads).

The classic log-pipeline operator the reference handles at the framing
layer (a TCP frame may carry a partial record; continuation lines must
be glued to the record they belong to): a line that does NOT open with
a syslog PRI header (``<digit``) is a continuation of the previous
record in its stream. Reference surface: the reference's stream splitter
keeps per-connection state for exactly this (services framing); here the
stream is the conversation and ordering is ``turn_idx``.

Distributed shape: gaps-and-islands. ``groupby(conv_id).map_groups``
co-locates one stream per group (same partitioning contract as
``q_conv_text`` — streams are bounded, whales are a generator
impossibility here); inside the group a vectorized cumsum over the
start-flags assigns island ids and one ``np.add.reduceat``-style pass
builds the merged records. Leading continuations with no opener form
island 0 on both engines (SQL: ``sum(flag) OVER (... ROWS UNBOUNDED
PRECEDING)``), so the oracle reproduces the grouping exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# a record OPENS when the line starts with a syslog PRI ("<3>..."):
# everything else is a continuation of the record above it
START_RE = r"^<[0-9]"


def merge_multiline(ds, stream_col: str = "conv_id",
                    order_col: str = "turn_idx",
                    text_col: str = "text"):
    """(stream, rec_idx, n_lines, record): one row per reassembled
    record, continuation lines joined with newlines in stream order."""

    def assemble(batch: pa.Table) -> pa.Table:
        order = pc.sort_indices(batch,
                                sort_keys=[(order_col, "ascending")])
        b = batch.take(order)
        starts = pc.match_substring_regex(b[text_col], START_RE)
        flags = starts.to_numpy(zero_copy_only=False).astype(np.int64)
        island = np.cumsum(flags)
        texts = b[text_col].to_pylist()
        recs: list[str] = []
        n_lines: list[int] = []
        ids: list[int] = []
        cur: list[str] = []
        cur_id = int(island[0]) if len(island) else 0
        for i, t in enumerate(texts):
            if flags[i] and cur:
                recs.append("\n".join(cur))
                n_lines.append(len(cur))
                ids.append(cur_id)
                cur = []
            if flags[i]:
                cur_id = int(island[i])
            cur.append(t)
        if cur:
            recs.append("\n".join(cur))
            n_lines.append(len(cur))
            ids.append(cur_id)
        return pa.table({
            stream_col: pa.array(
                [b[stream_col][0].as_py()] * len(recs), pa.string()),
            "rec_idx": pa.array(ids, pa.int64()),
            "n_lines": pa.array(n_lines, pa.int64()),
            "record": pa.array(recs, pa.string()),
        })

    return ds.groupby(stream_col).map_groups(assemble,
                                             batch_format="pyarrow")


def multiline_oracle_sql(tpath: str) -> str:
    """Identical gaps-and-islands grouping in DuckDB over the raw
    transcript lines (START_RE inlined so the two cannot drift)."""
    return f"""
WITH t AS (
  SELECT conv_id, turn_idx, text,
         CASE WHEN regexp_matches(text, '{START_RE}') THEN 1 ELSE 0 END AS s
  FROM read_parquet('{tpath}')
), i AS (
  SELECT conv_id, turn_idx, text,
         sum(s) OVER (PARTITION BY conv_id ORDER BY turn_idx
                      ROWS UNBOUNDED PRECEDING) AS island
  FROM t
)
SELECT conv_id, CAST(island AS BIGINT) AS rec_idx,
       CAST(count(*) AS BIGINT) AS n_lines,
       string_agg(text, chr(10) ORDER BY turn_idx) AS record
FROM i GROUP BY conv_id, island"""
