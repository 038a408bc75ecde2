"""Log template mining: Drain-style constant/variable masking over raw
log text, then counting occurrences per template.

The classic telemetry-pipeline reduction (log clustering / template
extraction a la Drain/Spell): timestamps, quoted values, long hex ids
and digit runs are replaced with typed placeholders, collapsing the
unbounded raw-line space into a small set of message skeletons whose
frequencies drive alerting, sampling, and anomaly baselines. The
reference's closest surface is its per-topic metrics counters
(store/store.go:77-123); template mining is the LLM-era generalization
that also feeds training-data curation (dedup by template, balance by
template frequency).

Scale shape: masking is a pure vectorized per-batch map (Arrow RE2
kernels, zero Python per row); counting reuses the map-side-combine
aggregate (stages/agg.grouped_count), so only (template, n) partials —
bounded by template cardinality, which is the op's premise — cross the
exchange.

The mask rules are RE2-compatible and applied in a fixed order so the
DuckDB oracle (chained regexp_replace(..., 'g')) reproduces templates
byte-for-byte.
"""

from __future__ import annotations

import pyarrow as pa

from .regex_chain import apply_chain, chain_sql

# Hex run of ≥8 chars that contains AT LEAST ONE letter — a pure digit
# run must stay a digit run (<N>), or '1234567890' and '123456789'
# would land in different templates. RE2 has no lookahead, so the
# ≥1-letter ∧ ≥8-total constraint is an alternation on the position f
# of the first letter: exactly f digits, a letter, then ≥max(0, 7-f)
# more hex chars.
_HEX_RUN = "|".join(
    ["[0-9]{%d}[a-f][0-9a-f]{%d,}" % (f, 7 - f) for f in range(7)]
    + ["[0-9]{7,}[a-f][0-9a-f]*"])

# (pattern, replacement), applied strictly in order. RE2 syntax only —
# both pyarrow.compute and DuckDB regexp_replace run RE2.
MASK_RULES: list[tuple[str, str]] = [
    # RFC3339 / ISO timestamps (with optional fraction and zone)
    (r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?"
     r"(?:Z|[+-]\d{2}:?\d{2})?", "<TS>"),
    # BSD syslog timestamps ("Jan  2 15:04:05")
    (r"(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)"
     r" [ 0-9]\d \d{2}:\d{2}:\d{2}", "<TS>"),
    # quoted values
    (r'"[^"]*"', "<STR>"),
    # long hex runs with a letter (ids, digests)
    (rf"\b(?:{_HEX_RUN})\b", "<HEX>"),
    # digit runs
    (r"\d+", "<N>"),
]


def mask_templates(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Apply the mask chain to a string column (vectorized RE2)."""
    return apply_chain(col, MASK_RULES)


def _mask_pre(batch: pa.Table) -> pa.Table:
    return pa.table({"template": mask_templates(batch["text"])})


def log_templates(ds):
    """(template, n) counts over ``ds.text`` — map-side combine, tiny
    driver merge (template cardinality is bounded by construction)."""
    from ..stages.agg import grouped_count
    return grouped_count(ds, ["template"], pre=_mask_pre)


def mask_rules_sql(col_expr: str) -> str:
    """The identical mask chain as a DuckDB expression over col_expr."""
    return chain_sql(col_expr, MASK_RULES)


DAY_US = 86_400_000_000


def template_novelty(ds):
    """New-template alarm: per calendar day, how many DISTINCT
    templates appear, and how many of them are appearing for the FIRST
    time ever — the drift monitor ops teams run on template-mined logs
    (a burst of first-seen templates = new code path / new failure
    mode / format regression upstream).

    Scale shape: mask per batch (vectorized RE2), reduce to DISTINCT
    (template, day) pairs map-side, then ONE bounded exchange — the
    pair domain is templates × days, bounded by the mining premise —
    to fold min-day per template and per-day distinct counts on the
    driver. Output: (d, n_templates, n_new) sorted by day, where
    d = epoch_us // 86_400_000_000 (calendar day index)."""
    import numpy as np
    import pyarrow.compute as pc

    from ..stages.agg import grouped_count

    def pre(batch: pa.Table) -> pa.Table:
        return pa.table({
            "template": mask_templates(batch["text"]),
            "d": pc.cast(pc.divide(pc.cast(
                pc.cast(batch["ts"], pa.timestamp("us")), pa.int64()),
                DAY_US), pa.int64()),
        })

    pairs = grouped_count(ds, ["template", "d"], pre=pre)
    tpl = np.asarray(pairs["template"].to_pylist(), dtype=object)
    day = np.asarray(pairs["d"].to_pylist(), dtype=np.int64)
    first_day: dict = {}
    for t, d in zip(tpl, day):
        if t not in first_day or d < first_day[t]:
            first_day[t] = d
    days = np.unique(day)
    n_tpl = {int(d): 0 for d in days}
    n_new = {int(d): 0 for d in days}
    for t, d in zip(tpl, day):
        n_tpl[int(d)] += 1
        if first_day[t] == d:
            n_new[int(d)] += 1
    return pa.table({
        "d": pa.array([int(d) for d in days], pa.int64()),
        "n_templates": pa.array([n_tpl[int(d)] for d in days],
                                pa.int64()),
        "n_new": pa.array([n_new[int(d)] for d in days], pa.int64()),
    })
