"""One PageRank power-iteration step over the conversation→tool graph.

Iterative graph analytics on a Ray Data engine: nodes are conversations
(sources) and tools (sinks), with a directed edge conv→tool for every
tool the conversation invoked at least once. Starting from the uniform
distribution, one damped PageRank step moves mass

    in_mass(tool) = Σ_{conv → tool}  pr₀(conv) / outdeg(conv)

All arithmetic is EXACT integer: with outdeg ≤ 15 in this graph, every
1/outdeg is represented as ``MASS_UNIT // outdeg`` with
``MASS_UNIT = lcm(1..15) = 360360`` — no float summation order can
diverge between the engine and the SQL oracle. The reported
``in_mass`` is therefore in units of pr₀/360360 (the caller applies the
damping factor and 1/N normalization outside, where N is a scalar).

Distributed shape (100-TB-safe):
  1. narrow projection (conv_id, tool), tool-less turns dropped at the
     read batch;
  2. ONE conv-keyed bucket exchange (stages/buckets — conversations
     co-located, hundreds per vectorized UDF call);
  3. inside a bucket: pandas drop_duplicates → per-conv outdeg →
     per-(tool) partial sums of MASS_UNIT // outdeg — output rows are
     bounded by |tools| per bucket, not by turns;
  4. tiny driver merge over the |tools|-sized domain.

A full multi-round PageRank repeats step 2-4 with pr fed back through
``ray.put`` (mass vector is |nodes|-bounded); one round is the
oracle-gated unit because fixed-point iteration counts are a job
parameter, not an operator semantics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MASS_UNIT = 360360  # lcm(1..15); exact 1/outdeg for outdeg ≤ 15
MAX_OUTDEG = 15


def prune_tool_edges(b: pa.Table) -> pa.Table:
    """THE conv→tool edge rule (shared by PageRank and the
    co-occurrence operator so their oracles can never drift apart):
    project (conv_id, tool), keeping rows with a non-null, non-empty
    tool."""
    keep = pa.compute.and_(
        pa.compute.is_valid(b["tool"]),
        pa.compute.not_equal(b["tool"], ""))
    b = b.filter(keep)
    return pa.table({"conv_id": b["conv_id"], "tool": b["tool"]})


def pagerank_tool_mass(ds):
    """in-mass per tool after one uniform-start PageRank step.

    ``ds`` must carry (conv_id, tool) columns. Returns a pyarrow Table
    (node, in_mass, n_sources) sorted by node."""
    from ..stages.buckets import grouped_by_bucket

    def per_bucket(batch: pa.Table) -> pa.Table:
        # pure Arrow/numpy: distinct (conv, tool) edges, per-conv outdeg
        # via a grouped count joined back positionally (rows sorted by
        # conv so each conv's edges form one run)
        d = batch.group_by(["conv_id", "tool"]).aggregate([])
        d = d.take(pa.compute.sort_indices(
            d, sort_keys=[("conv_id", "ascending"), ("tool", "ascending")]))
        n = d.num_rows
        if n == 0:
            return pa.table({"node": pa.array([], pa.string()),
                             "in_mass": pa.array([], pa.int64()),
                             "n_sources": pa.array([], pa.int64())})
        from ..stages.buckets import run_starts
        conv = d["conv_id"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(run_starts(conv))
        cnt = np.diff(np.append(starts, n))
        deg = np.repeat(cnt, cnt)
        if int(deg.max()) > MAX_OUTDEG:
            raise ValueError(
                f"outdeg {int(deg.max())} > {MAX_OUTDEG}: raise MASS_UNIT "
                "to the lcm of the new degree bound")
        share = MASS_UNIT // deg
        t = pa.table({"node": d["tool"],
                      "in_mass": pa.array(share, pa.int64()),
                      "n_sources": pa.array(np.ones(n, np.int64))})
        g = t.group_by(["node"]).aggregate(
            [("in_mass", "sum"), ("n_sources", "sum")])
        return pa.table({"node": g["node"],
                         "in_mass": g["in_mass_sum"],
                         "n_sources": g["n_sources_sum"]})

    partials = grouped_by_bucket(
        ds.map_batches(prune_tool_edges, batch_format="pyarrow"),
        per_bucket)
    acc: dict[str, list[int]] = {}
    for b in partials.iter_batches(batch_format="pyarrow"):
        for r in b.to_pylist():
            a = acc.setdefault(r["node"], [0, 0])
            a[0] += r["in_mass"]
            a[1] += r["n_sources"]
    nodes = sorted(acc)
    return pa.table({
        "node": pa.array(nodes, pa.string()),
        "in_mass": pa.array([acc[n][0] for n in nodes], pa.int64()),
        "n_sources": pa.array([acc[n][1] for n in nodes], pa.int64()),
    })
