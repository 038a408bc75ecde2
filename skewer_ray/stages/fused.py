"""Stage fusion: chain several per-batch stages inside ONE actor pool.

Running parse → enrich → route → fanout as four separate
ActorPoolMapOperators costs an object-store hop per boundary and
reserves one CPU per pool even when idle (with P pools ≥ the node's
CPUs the read task starves and the pipeline deadlocks). Fusing them into
a single callable keeps the whole per-record path a single map_batches:
one pool, one pass, zero intermediate materialization — the same shape
as skewer's per-connection goroutine chain (frame → parse → stash →
forward) which never re-queues between steps.

The individual stage classes stay available for composition and tests;
the flagship builders use the fused form.
"""

from __future__ import annotations


class FusedStage:
    def __init__(self, specs):
        """specs: list of (callable_class, kwargs) built once per actor."""
        self.stages = [cls(**kwargs) for cls, kwargs in specs]

    def __call__(self, batch):
        for s in self.stages:
            batch = s(batch)
        return batch
