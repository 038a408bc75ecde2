"""BPE-style merge-candidate counting (the tokenizer-training inner step).

Byte-pair-encoding training repeatedly (a) counts adjacent symbol
pairs across the corpus and (b) merges the most frequent pair. Step (a)
is the data-parallel heavy phase and the one that belongs on the
engine; the merge loop is a driver-side fold over its tiny result. This
module implements round 0 exactly (symbols = single characters of the
canonical lowercase word stream, pair counts weighted by word
occurrences, NOT distinct words) and emits the top-K merge candidates.

Vectorized kernel: every word in the batch is joined with a NEWLINE
separator and re-encoded as UTF-32, giving one uint32 codepoint array
for the whole batch; adjacent pairs are the stride-1 zip of that array
with itself, packed into uint64 keys (left<<32 | right) and counted
with one ``np.unique`` — no Python loop over words or characters.
Newline is safe as the separator BY CONSTRUCTION: the word stream is
``norm_words`` output (split on ``\\s+``), so no word can contain any
whitespace — unlike NUL, which is not whitespace and could legally
appear inside a word (review finding: a NUL separator silently dropped
such pairs while the SQL oracle counted them).

Scale shape: per-batch partial counts are bounded by the distinct-pair
domain (≈ charset², a few hundred for ASCII text), so the exchange is
tiny regardless of corpus size; the final combine is a driver merge
over that bounded domain (stages/agg.grouped_count semantics).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

TOP_PAIRS = 20


_SEP = 0x0A  # '\n' — cannot occur inside a norm_words word (whitespace)


def pair_counts_kernel(words: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(packed uint64 pair keys, counts) for adjacent in-word char
    pairs. ``words`` must be whitespace-free (norm_words output)."""
    if not words:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    blob = "\n".join(words)
    cp = np.frombuffer(blob.encode("utf-32-le"), dtype=np.uint32)
    if cp.size < 2:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    left, right = cp[:-1], cp[1:]
    ok = (left != _SEP) & (right != _SEP)  # pairs never straddle a separator
    keys = (left[ok].astype(np.uint64) << np.uint64(32)) \
        | right[ok].astype(np.uint64)
    uniq, counts = np.unique(keys, return_counts=True)
    return uniq, counts.astype(np.int64)


def bpe_merge_candidates(docs_ds, top_k: int = TOP_PAIRS) -> pa.Table:
    """Top-K adjacent character pairs over the corpus word stream.

    Returns (left_sym, right_sym, n) with the deterministic tie-break
    (n DESC, left ASC, right ASC), truncated to ``top_k`` rows."""
    from .textstats import norm_words

    def partial(batch: pa.Table) -> pa.Table:
        words: list[str] = []
        for t in batch["text"].to_pylist():
            words.extend(norm_words(t))
        keys, counts = pair_counts_kernel(words)
        return pa.table({"k": pa.array(keys, pa.uint64()),
                         "n": pa.array(counts, pa.int64())})

    acc: dict[int, int] = {}
    for b in docs_ds.map_batches(partial, batch_format="pyarrow") \
                    .iter_batches(batch_format="pyarrow"):
        for k, n in zip(b["k"].to_pylist(), b["n"].to_pylist()):
            acc[k] = acc.get(k, 0) + n
    pairs = [(chr(k >> 32), chr(k & 0xFFFFFFFF), n) for k, n in acc.items()]
    pairs.sort(key=lambda p: (-p[2], p[0], p[1]))
    pairs = pairs[:top_k]
    return pa.table({
        "left_sym": pa.array([p[0] for p in pairs], pa.string()),
        "right_sym": pa.array([p[1] for p in pairs], pa.string()),
        "n": pa.array([p[2] for p in pairs], pa.int64()),
    })
