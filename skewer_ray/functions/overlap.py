"""Pairwise cross-source shingle overlap (corpus contamination matrix).

For every pair of `source` values, the Jaccard similarity of their
distinct 3-word-shingle sets — the corpus-level diagnostic behind
"is subcorpus A contaminated with subcorpus B" checks (the
source-granular cousin of per-doc decontamination in
functions/decontam.py).

Distributed shape (100-TB-safe, bounded by |sources|² not |docs|²):
  1. map pass: per-batch distinct (shingle_hash64, source) rows — the
     compact int64 identity hash from functions/dedup._shingle_hash64,
     so the exchange ships 8-byte keys, never shingle strings (the r03
     MinHash lesson);
  2. ONE bucket-keyed exchange on the shingle hash
     (stages/buckets.grouped_by_bucket) co-locates every copy of a
     shingle; within a bucket a sorted segmented sweep dedupes
     (hash, source) and accumulates a |S|×|S| pair-count matrix plus
     per-source distinct counts — per-bucket OUTPUT is O(|S|²) rows,
     independent of bucket size;
  3. driver merge of the bounded partials (n_buckets · |S|² ints) and
     one exact division per emitted pair.

Work inside a bucket is linear in the bucket's rows; the per-shingle
inner loop is bounded by the source cardinality |S| (20 in the test
tables; config-scale, not data-scale, in any real corpus).

Only pairs with n_common > 0 are emitted (absent pairs carry no
information and would make the output |S|² regardless of overlap).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _shingle_hash64, shingles_of

OVERLAP_BUCKETS = 64


def source_overlap(docs_ds, n_buckets: int = OVERLAP_BUCKETS):
    """Dataset of (source_a, source_b, n_a, n_b, n_common, jaccard)
    rows, source_a < source_b lexicographically, jaccard rounded to
    6 dp with the identical expression tree as the SQL mirror."""
    from ..stages.buckets import grouped_by_bucket, run_starts

    def explode(b: pa.Table) -> pa.Table:
        hs: list[int] = []
        srcs: list[str] = []
        seen: set[tuple[int, str]] = set()
        for t, src in zip(b["text"].to_pylist(),
                          b["source"].to_pylist()):
            for s in shingles_of(t):
                key = (_shingle_hash64(s), src)
                if key not in seen:
                    seen.add(key)
                    hs.append(key[0])
                    srcs.append(src)
        return pa.table({"h": pa.array(hs, pa.int64()),
                         "source": pa.array(srcs, pa.string())})

    def bucket_partials(b: pa.Table) -> pa.Table:
        h = b["h"].combine_chunks().to_numpy(zero_copy_only=False)
        src = b["source"].combine_chunks()
        codes = src.dictionary_encode()
        names = codes.dictionary.to_pylist()
        idx = codes.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # global dedupe of (h, source) then segment by shingle hash
        order = np.lexsort((idx, h))
        h, idx = h[order], idx[order]
        keep = np.ones(len(h), dtype=bool)
        keep[1:] = (h[1:] != h[:-1]) | (idx[1:] != idx[:-1])
        h, idx = h[keep], idx[keep]
        ns = len(names)
        per_source = np.bincount(idx, minlength=ns).astype(np.int64)
        pair = np.zeros((ns, ns), dtype=np.int64)
        starts = np.flatnonzero(run_starts(h))
        ends = np.append(starts[1:], len(h))
        for s, e in zip(starts, ends):
            if e - s > 1:
                members = idx[s:e]          # distinct by construction
                pair[np.ix_(members, members)] += 1
        ii, jj = np.nonzero(np.triu(pair, k=1))
        a = [names[i] for i in ii]
        bcol = [names[j] for j in jj]
        # per-source sizes ride along as (source, source, n) diagonal
        # rows so everything is one bounded table
        return pa.table({
            "source_a": pa.array(a + names, pa.string()),
            "source_b": pa.array(bcol + names, pa.string()),
            "n": pa.array(np.concatenate(
                [pair[ii, jj], per_source]), pa.int64())})

    parts = grouped_by_bucket(docs_ds.map_batches(
        explode, batch_format="pyarrow"), bucket_partials,
        key="h", n_buckets=n_buckets)

    pairs: dict[tuple[str, str], int] = {}
    sizes: dict[str, int] = {}
    for blk in parts.iter_batches(batch_format="pyarrow"):
        for sa, sb, n in zip(blk["source_a"].to_pylist(),
                             blk["source_b"].to_pylist(),
                             blk["n"].to_pylist()):
            if sa == sb:
                sizes[sa] = sizes.get(sa, 0) + n
            else:
                k = (sa, sb) if sa < sb else (sb, sa)
                pairs[k] = pairs.get(k, 0) + n

    rows = sorted(pairs.items())
    out = pa.table({
        "source_a": pa.array([k[0] for k, _ in rows], pa.string()),
        "source_b": pa.array([k[1] for k, _ in rows], pa.string()),
        "n_a": pa.array([sizes[k[0]] for k, _ in rows], pa.int64()),
        "n_b": pa.array([sizes[k[1]] for k, _ in rows], pa.int64()),
        "n_common": pa.array([v for _, v in rows], pa.int64()),
        "jaccard": pa.array(
            [round(float(v) / float(sizes[k[0]] + sizes[k[1]] - v), 6)
             for k, v in rows], pa.float64())})
    import ray.data as rd
    return rd.from_arrow(out)
