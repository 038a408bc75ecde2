"""Deduplication operators over the ``documents`` / ``embeddings``
tables: exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine.

Scale shapes (what survives 100 TB):
- exact / simhash / fingerprints: pure per-batch map + ONE small-key
  groupby (hash-partitioned; key cardinality ≈ distinct contents).
- MinHash+LSH: per-batch signature map → shuffle keyed by (band,
  band_key) — each bucket is tiny, pairs are emitted per bucket, and a
  final pair-key groupby dedups across bands. No all-pairs anywhere.
- n-gram Jaccard (brute-force) and embedding all-pairs: O(N²) VALIDATION
  paths over a broadcast small side (ray.put once, read per task);
  at scale use minhash_lsh_pairs / lsh_topk instead.

md5 is the hash everywhere so the DuckDB oracles replicate bit-for-bit
(see functions/__init__ docstring).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .textstats import norm_words

N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS
SHINGLE_K = 3


def shingles_of(text: str, k: int = SHINGLE_K) -> set[str]:
    words = norm_words(text)
    if len(words) < k:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i:i + k]) for i in range(len(words) - k + 1)}


def minhash_sigs(shingles: set[str]) -> list[str]:
    """sig[i] = lexicographic min of md5(f"{i}:{shingle}")."""
    sigs = []
    for i in range(N_HASHES):
        pre = f"{i}:"
        sigs.append(min(hashlib.md5((pre + s).encode()).hexdigest()
                        for s in shingles))
    return sigs


def band_keys(sigs: list[str]) -> list[str]:
    return [hashlib.md5("|".join(
        sigs[b * ROWS_PER_BAND:(b + 1) * ROWS_PER_BAND]).encode()).hexdigest()
        for b in range(N_BANDS)]


def simhash60(text: str) -> int:
    """60-bit SimHash over the word stream (md5[:15] per word, counts as
    weights). 60 bits so the value fits a signed int64 for the oracle's
    xor/bit_count arithmetic."""
    weights = [0] * 60
    for w in norm_words(text):
        h = int(hashlib.md5(w.encode()).hexdigest()[:15], 16)
        for b in range(60):
            weights[b] += 1 if (h >> b) & 1 else -1
    v = 0
    for b in range(60):
        if weights[b] > 0:
            v |= 1 << b
    return v


# ---------------------------------------------------------------------------
# dataset-level operators
# ---------------------------------------------------------------------------


def exact_dedup(docs_ds):
    """Exact dedup by content hash: one row per distinct normalized text
    with the kept (minimum) doc_id and the copy count. Hash-partitioned
    groupby on the digest — the classic first-per-group pattern."""
    def digest(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        hs = [hashlib.md5(" ".join(norm_words(t)).encode()).hexdigest()
              for t in texts]
        return pa.table({"text_hash": pa.array(hs, pa.string()),
                         "doc_id": pc.cast(batch["doc_id"], pa.int64())})

    hashed = docs_ds.map_batches(digest, batch_format="pyarrow")

    def combine(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["text_hash"]).aggregate(
            [("doc_id", "min"), ("doc_id", "count")])
        return pa.table({"text_hash": g["text_hash"],
                         "keep_id": g["doc_id_min"],
                         "n": pc.cast(g["doc_id_count"], pa.int64())})

    partial = hashed.map_batches(combine, batch_format="pyarrow")

    # final combine of the partials in map_groups (min of keep_id, sum
    # of counts per distinct content hash)
    def final(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["text_hash"]).aggregate(
            [("keep_id", "min"), ("n", "sum")])
        return pa.table({"text_hash": g["text_hash"],
                         "keep_id": g["keep_id_min"],
                         "n_copies": pc.cast(g["n_sum"], pa.int64())})

    return partial.groupby("text_hash").map_groups(final,
                                                   batch_format="pyarrow")


def _doc_shingle_rows(batch: pa.Table) -> pa.Table:
    """One row per (band, band_key, doc_id) with the doc's distinct
    shingle list carried along for in-bucket verification."""
    ids = pc.cast(batch["doc_id"], pa.int64()).to_pylist()
    texts = batch["text"].to_pylist()
    o_band, o_key, o_id, o_sh = [], [], [], []
    for d, t in zip(ids, texts):
        sh = shingles_of(t)
        if not sh:
            continue
        keys = band_keys(minhash_sigs(sh))
        sh_list = sorted(sh)
        for b, k in enumerate(keys):
            o_band.append(b)
            o_key.append(k)
            o_id.append(d)
            o_sh.append(sh_list)
    return pa.table({
        "band": pa.array(o_band, pa.int32()),
        "band_key": pa.array(o_key, pa.string()),
        "doc_id": pa.array(o_id, pa.int64()),
        "shingles": pa.array(o_sh, pa.large_list(pa.string())),
    })


def minhash_lsh_pairs(docs_ds, threshold: float = 0.5):
    """MinHash+LSH near-duplicate pairs with in-bucket Jaccard
    verification: (doc_a, doc_b, jaccard) for candidates sharing any
    band whose true shingle Jaccard ≥ threshold.

    Shuffle key = (band, band_key): buckets are small by construction
    (collisions ≈ near-dup clusters), so per-bucket pairing is cheap and
    the final pair-dedup groupby only sees candidate pairs."""

    rows = docs_ds.map_batches(_doc_shingle_rows, batch_format="pyarrow")

    def bucket_pairs(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        shs = batch["shingles"].to_pylist()
        a_out, b_out, j_out = [], [], []
        order = sorted(range(len(ids)), key=lambda i: ids[i])
        for x in range(len(order)):
            i = order[x]
            si = set(shs[i])
            for y in range(x + 1, len(order)):
                jj = order[y]
                sj = set(shs[jj])
                inter = len(si & sj)
                if not inter:
                    continue
                jac = inter / (len(si) + len(sj) - inter)
                if jac >= threshold:
                    a_out.append(ids[i])
                    b_out.append(ids[jj])
                    j_out.append(round(jac, 6))
        return pa.table({"doc_a": pa.array(a_out, pa.int64()),
                         "doc_b": pa.array(b_out, pa.int64()),
                         "jaccard": pa.array(j_out, pa.float64())})

    pairs = rows.groupby(["band", "band_key"]).map_groups(
        bucket_pairs, batch_format="pyarrow")

    # a pair can match in up to N_BANDS bands — keep one
    def first(batch: pa.Table) -> pa.Table:
        return batch.slice(0, 1)

    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        first, batch_format="pyarrow")


def ngram_jaccard_pairs(docs_ds, threshold: float = 0.5):
    """Brute-force n-gram Jaccard near-dup pairs (validation path for
    minhash_lsh_pairs): every block is compared against a broadcast of
    the full (doc_id → shingles) table. O(N²) similarity work but O(N)
    memory per task; at 100 TB use the LSH form instead."""
    import ray

    shingle_tbl = docs_ds.map_batches(
        lambda b: pa.table({
            "doc_id": pc.cast(b["doc_id"], pa.int64()),
            "shingles": pa.array(
                [sorted(shingles_of(t)) for t in b["text"].to_pylist()],
                pa.large_list(pa.string()))}),
        batch_format="pyarrow")
    all_rows = shingle_tbl.take_all()  # small side: one list per doc
    broadcast = ray.put([(r["doc_id"], frozenset(r["shingles"]))
                         for r in all_rows])

    def pairs_of_block(batch: pa.Table) -> pa.Table:
        other = ray.get(broadcast)
        ids = pc.cast(batch["doc_id"], pa.int64()).to_pylist()
        texts = batch["text"].to_pylist()
        a_out, b_out, j_out = [], [], []
        for d, t in zip(ids, texts):
            sd = shingles_of(t)
            if not sd:
                continue
            for od, os_ in other:
                if od <= d:
                    continue  # emit each unordered pair once (a < b)
                inter = len(sd & os_)
                if not inter:
                    continue
                jac = inter / (len(sd) + len(os_) - inter)
                if jac >= threshold:
                    a_out.append(d)
                    b_out.append(od)
                    j_out.append(round(jac, 6))
        return pa.table({"doc_a": pa.array(a_out, pa.int64()),
                         "doc_b": pa.array(b_out, pa.int64()),
                         "jaccard": pa.array(j_out, pa.float64())})

    return docs_ds.map_batches(pairs_of_block, batch_format="pyarrow")


def simhash_signatures(docs_ds):
    """(doc_id, simhash) per document — near-dup candidates are rows
    within small Hamming distance (pairing tested via bit_count(xor)
    in tests/oracle; bucketing by signature prefix gives the scale
    path)."""
    def fn(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "simhash": pa.array([simhash60(t)
                                 for t in batch["text"].to_pylist()],
                                pa.int64())})
    return docs_ds.map_batches(fn, batch_format="pyarrow")


def simhash_pairs(docs_ds, max_hamming: int = 3):
    """SimHash near-dup pairs: (doc_a, doc_b, hamming ≤ max_hamming).
    Signatures are computed per batch; pairing compares each block
    against a broadcast of all signatures (validation scale — at 100 TB
    bucket by signature prefix bands and pair within buckets, the
    SimHash analogue of the MinHash band shuffle)."""
    import ray

    sigs_ds = simhash_signatures(docs_ds)
    rows = sigs_ds.take_all()
    all_ids = np.array([r["doc_id"] for r in rows], dtype=np.int64)
    all_sigs = np.array([r["simhash"] for r in rows], dtype=np.int64)
    order = np.argsort(all_ids)
    broadcast = ray.put((all_ids[order], all_sigs[order]))

    def block_pairs(batch: pa.Table) -> pa.Table:
        ids_o, sigs_o = ray.get(broadcast)
        bid = np.asarray(batch["doc_id"].to_pylist(), dtype=np.int64)
        bsig = np.asarray(batch["simhash"].to_pylist(), dtype=np.int64)
        a_out, b_out, h_out = [], [], []
        for r in range(len(bid)):
            x = np.bitwise_xor(sigs_o, bsig[r])
            # vectorized popcount over int64 (no leading-bit issues: 60-bit)
            ham = np.zeros(len(x), dtype=np.int64)
            v = x.copy()
            while v.any():
                ham += v & 1
                v >>= 1
            mask = (ids_o > bid[r]) & (ham <= max_hamming)
            for j in np.nonzero(mask)[0]:
                a_out.append(int(bid[r]))
                b_out.append(int(ids_o[j]))
                h_out.append(int(ham[j]))
        return pa.table({"doc_a": pa.array(a_out, pa.int64()),
                         "doc_b": pa.array(b_out, pa.int64()),
                         "hamming": pa.array(h_out, pa.int64())})

    return sigs_ds.map_batches(block_pairs, batch_format="pyarrow")


def embedding_dup_pairs(emb_ds, threshold: float = 0.45):
    """Embedding-cosine near-dup pairs (vec_a < vec_b, cosine ≥
    threshold): per-block float64 matmul against a broadcast of the full
    normalized matrix. Validation-scale all-pairs; LSH/IVF
    (similarity.lsh_topk) is the scale path."""
    import ray

    rows = emb_ds.select_columns(["vec_id", "embedding"]).take_all()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    order = np.argsort(ids)
    broadcast = ray.put((ids[order], mat[order]))

    def block_pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(broadcast)
        bid = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        bm = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        bm /= np.linalg.norm(bm, axis=1, keepdims=True)
        sims = bm @ all_mat.T
        a_out, b_out, s_out = [], [], []
        for r in range(len(bid)):
            mask = (all_ids > bid[r]) & (np.round(sims[r], 6) >= threshold)
            for j in np.nonzero(mask)[0]:
                a_out.append(int(bid[r]))
                b_out.append(int(all_ids[j]))
                s_out.append(round(float(sims[r, j]), 6))
        return pa.table({"vec_a": pa.array(a_out, pa.int64()),
                         "vec_b": pa.array(b_out, pa.int64()),
                         "cosine": pa.array(s_out, pa.float64())})

    return emb_ds.map_batches(block_pairs, batch_format="pyarrow")
