"""Text analysis over the ``documents`` table: token counting (BPE-ish
regex), quality scoring, n-gram-heuristic language ID, document
fingerprinting (winnowed k-gram min-hash).

All per-batch functions are pyarrow-Table → pyarrow-Table and run under
``map_batches(batch_format="pyarrow")``; the regexes are compiled once
at module import (once per worker process).
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

# BPE-ish tokenizer: alpha runs, digit runs, single punctuation marks.
# Kept RE2-compatible so the DuckDB oracle's regexp_extract_all agrees.
TOKEN_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
_PUNCT_RE = re.compile(r"[^A-Za-z0-9\s]")
_WS_RE = re.compile(r"\s+")

EN_STOP = ("the", "a", "of", "and", "to", "in", "is", "it")
# tiny per-language stopword lists for the n-gram/stopword heuristic;
# checked in priority order (deterministic tie-break)
LANG_WORDLISTS = [
    ("en", EN_STOP),
    ("de", ("der", "die", "das", "und", "ist", "nicht", "ein")),
    ("fr", ("le", "la", "et", "est", "les", "des", "une")),
    ("es", ("el", "los", "y", "es", "las", "una", "que")),
]


def norm_words(text: str) -> list[str]:
    """lower + whitespace split — the canonical word stream."""
    return _WS_RE.split(text.lower().strip()) if text.strip() else []


def tokens_of(text: str) -> list[str]:
    return TOKEN_RE.findall(text)


def text_stats_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_chars, n_tokens, n_words, punct_ratio, stop_ratio,
    quality) — the quality-scoring stage."""
    texts = batch["text"].to_pylist()
    n_chars, n_tokens, n_words, pr, sr, q = [], [], [], [], [], []
    stop = set(EN_STOP)
    for t in texts:
        words = norm_words(t)
        toks = tokens_of(t)
        npunct = len(_PUNCT_RE.findall(t))
        nw = len(words)
        nt = len(toks)
        hits = sum(1 for w in words if w in stop)
        punct_ratio = npunct / nt if nt else 0.0
        stop_ratio = hits / nw if nw else 0.0
        score = (0.4 * min(nw, 100) / 100
                 + 0.3 * (1.0 - punct_ratio)
                 + 0.3 * min(1.0, 5.0 * stop_ratio))
        n_chars.append(len(t))
        n_tokens.append(nt)
        n_words.append(nw)
        pr.append(punct_ratio)
        sr.append(stop_ratio)
        q.append(score)
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_chars": pa.array(n_chars, pa.int64()),
        "n_tokens": pa.array(n_tokens, pa.int64()),
        "n_words": pa.array(n_words, pa.int64()),
        "punct_ratio": pa.array(pr, pa.float64()),
        "stop_ratio": pa.array(sr, pa.float64()),
        "quality": pa.array(q, pa.float64()),
    })


def langid_batch(batch: pa.Table) -> pa.Table:
    """Stopword-hit language heuristic: the language with the most word
    hits wins; zero hits or a tie between leaders → "und". Priority
    order of LANG_WORDLISTS breaks residual ordering questions."""
    texts = batch["text"].to_pylist()
    sets = [(lang, frozenset(ws)) for lang, ws in LANG_WORDLISTS]
    out = []
    for t in texts:
        words = norm_words(t)
        scores = [(sum(1 for w in words if w in ws), lang)
                  for lang, ws in sets]
        best = max(s for s, _l in scores)
        if best == 0:
            out.append("und")
            continue
        leaders = [lang for s, lang in scores if s == best]
        out.append(leaders[0] if len(leaders) == 1 else "und")
    return pa.table({"doc_id": batch["doc_id"],
                     "lang_pred": pa.array(out, pa.string())})


def fingerprint_batch(batch: pa.Table, k: int = 5) -> pa.Table:
    """Document fingerprints: exact content hash (md5 over the
    whitespace-normalized text) + a winnowed rolling fingerprint (the
    lexicographic MIN of md5 over every k-word window — the document-
    level winnowing fingerprint; docs sharing it share a k-gram)."""
    texts = batch["text"].to_pylist()
    exact, winnow = [], []
    for t in texts:
        words = norm_words(t)
        norm = " ".join(words)
        exact.append(hashlib.md5(norm.encode()).hexdigest())
        if len(words) >= k:
            grams = (" ".join(words[i:i + k])
                     for i in range(len(words) - k + 1))
            winnow.append(min(hashlib.md5(g.encode()).hexdigest()
                              for g in grams))
        else:
            winnow.append(hashlib.md5(norm.encode()).hexdigest())
    return pa.table({"doc_id": batch["doc_id"],
                     "exact_md5": pa.array(exact, pa.string()),
                     "winnow_fp": pa.array(winnow, pa.string())})


def repetition_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style within-document repetition signals (map-only):

    - ``dup_3gram_frac``: fraction of 3-word-shingle occurrences that
      are repeats of an earlier shingle in the SAME doc — the classic
      boilerplate/spam signal (Rae et al. 2021 §A1.1).
    - ``top_word_frac``: occurrence share of the single most frequent
      word — catches degenerate "word word word ..." docs.

    Docs with <3 words have no shingles → dup_3gram_frac 0; empty docs
    score 0 on both. Ratios of exact integer counts rounded to 6 dp on
    both sides keep the DuckDB oracle bit-identical."""
    from collections import Counter
    ids, dup_f, top_f = [], [], []
    for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        words = norm_words(t)
        total = max(0, len(words) - 2)
        if total:
            sh = Counter(" ".join(words[i:i + 3]) for i in range(total))
            dup = (total - len(sh)) / total
        else:
            dup = 0.0
        if words:
            top = Counter(words).most_common(1)[0][1] / len(words)
        else:
            top = 0.0
        ids.append(d)
        dup_f.append(round(dup, 6))
        top_f.append(round(top, 6))
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "dup_3gram_frac": pa.array(dup_f, pa.float64()),
                     "top_word_frac": pa.array(top_f, pa.float64())})
