"""Shared helpers for ordered RE2 mask/scrub chains (templates.py,
anonymize.py): one Arrow apply loop and one DuckDB SQL builder, so the
engine and its oracle can never drift on escaping or flag details."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

Rules = list[tuple[str, str]]


def apply_chain(col: pa.ChunkedArray | pa.Array, rules: Rules):
    """Apply (pattern, replacement) pairs strictly in order (vectorized
    RE2 — both pyarrow.compute and DuckDB regexp_replace run RE2)."""
    for pat, repl in rules:
        col = pc.replace_substring_regex(col, pat, repl)
    return col


def chain_sql(col_expr: str, rules: Rules) -> str:
    """The identical chain as a DuckDB expression over ``col_expr``."""
    expr = col_expr
    for pat, repl in rules:
        p = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{repl}', 'g')"
    return expr
