"""Deduplication operators over the ``documents`` / ``embeddings``
tables: exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine.

Scale shapes (what survives 100 TB):
- exact / simhash / fingerprints: pure per-batch map + ONE small-key
  groupby (hash-partitioned; key cardinality ≈ distinct contents).
- MinHash+LSH: per-batch signature map → ONE crc32-bucketed exchange
  keyed by (band, band_key); pairs are emitted inside buckets with
  FIRST-colliding-band ownership (each row carries the digests of its
  earlier bands), so no cross-band pair-dedup barrier exists. Per-task
  memory is O(rows / n_buckets) — size ``n_buckets`` with the corpus
  (see minhash_lsh_pairs). No all-pairs anywhere.
- SimHash pairs: EXACT banded shuffle — pigeonhole over max_hamming+1
  signature bit-bands, same single-exchange first-band-ownership shape
  (the full signature each row already ships decides ownership, so the
  band path adds zero payload).
- n-gram Jaccard and embedding-cosine pairs: EXACT all-pairs via
  triangle (block-nested) partitioning — every unordered pair meets in
  exactly one of B(B+1)/2 buckets; O(N·B) shuffle, no broadcast, no
  driver materialization. The O(N²) similarity work is inherent to the
  exact semantics; minhash_lsh_pairs / lsh_topk are the subquadratic
  approximate paths.

md5 is the hash everywhere so the DuckDB oracles replicate bit-for-bit
(see functions/__init__ docstring).
"""

from __future__ import annotations

import hashlib
from collections import OrderedDict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .textstats import norm_words

N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS

# worker-process-level shingle→(component hex digests, int64 id) memo
# (Ray reuses workers across map tasks, so this persists between
# batches); bounded so a worker's heap stays flat on huge corpora
_SHINGLE_LRU_MAX = 1 << 15
_SHINGLE_LRU: OrderedDict = OrderedDict()
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
        # md5 once per DISTINCT raw text (dictionary-encode + take —
        # the anonymize.py idiom): on a dup-heavy corpus the hashing
        # cost tracks distinct docs, not rows
        col = batch["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        d = pc.dictionary_encode(col)
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        uniq = pa.array(
            [hashlib.md5(" ".join(norm_words(t)).encode()).hexdigest()
             for t in d.dictionary.to_pylist()], pa.string())
        return pa.table({"text_hash": uniq.take(d.indices),
                         "doc_id": pc.cast(batch["doc_id"], pa.int64())})

    hashed = docs_ds.map_batches(digest, batch_format="pyarrow")

    def combine(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["text_hash"]).aggregate(
            [("doc_id", "min"), ("doc_id", "count")])
        return pa.table({"text_hash": g["text_hash"],
                         "keep_id": g["doc_id_min"],
                         "n": pc.cast(g["doc_id_count"], pa.int64())})

    partial = hashed.map_batches(combine, batch_format="pyarrow")

    # final combine keyed by a crc BUCKET of the hash (stages/buckets):
    # the digest domain ≈ corpus size, so per-distinct-hash map_groups
    # would cost one Python dispatch per distinct document — the body
    # already folds many hashes per call via Arrow group_by
    def final(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["text_hash"]).aggregate(
            [("keep_id", "min"), ("n", "sum")])
        return pa.table({"text_hash": g["text_hash"],
                         "keep_id": g["keep_id_min"],
                         "n_copies": pc.cast(g["n_sum"], pa.int64())})

    from ..stages.buckets import grouped_by_bucket
    return grouped_by_bucket(partial, final, key="text_hash")


def _shingle_hash64(s: str) -> int:
    """64-bit shingle identity hash (md5[:16] reinterpreted as signed
    int64). Used ONLY as a compact stand-in for the shingle string in
    the verify exchange: |A∩B| over the hash sets equals the string-set
    intersection barring a ~2^-65 in-doc collision, so the Jaccard the
    verifier computes is the exact string-shingle Jaccard the oracle
    computes."""
    u = int(hashlib.md5(s.encode()).hexdigest()[:16], 16)
    return u - (1 << 64) if u >= (1 << 63) else u


def _doc_shingle_rows(batch: pa.Table) -> pa.Table:
    """One row per (band, band_key, doc_id) with the doc's distinct
    shingles carried as a SORTED int64 hash array for in-bucket
    verification — ~8 bytes per shingle through the shuffle instead of
    the full 3-word string (VERDICT r02 #3: the string form shipped
    ~4× the corpus text volume over the exchange).

    Each band-b row also carries ``keys``: the digests of its EARLIER
    bands only (b·16 bytes, avg 24 B/row — band 0 ships none). Both
    members of a colliding run share the same band, so the bucket
    worker can check whether any earlier band already collided and
    emit a pair only from its FIRST colliding band — every qualifying
    pair is produced exactly once globally, and the old
    groupby(doc_a, doc_b) dedup barrier disappears.

    The md5(f"{i}:{shingle}") component hashes are computed once per
    DISTINCT shingle per WORKER, not per batch: Ray reuses worker
    processes across map tasks, so ``_SHINGLE_LRU`` (a module-global
    bounded LRU — ~45 MB at the 32k cap with 16 hex digests per entry)
    persists between batches and the hashing cost becomes ∝ distinct
    shingles per worker (near-dup docs share almost all their
    shingles; VERDICT r04 #8 measured the per-batch form as the
    remaining constant factor). Values are identical to the per-doc
    form — the cache only memoizes."""
    ids = pc.cast(batch["doc_id"], pa.int64()).to_pylist()
    texts = batch["text"].to_pylist()
    doc_sh = [shingles_of(t) for t in texts]
    hcache: dict[str, list[str]] = {}
    idcache: dict[str, int] = {}
    lru = _SHINGLE_LRU
    for sh in doc_sh:
        for s in sh:
            if s in hcache:
                continue
            hit = lru.get(s)
            if hit is None:
                b = s.encode()
                hit = ([hashlib.md5(f"{i}:".encode() + b).hexdigest()
                        for i in range(N_HASHES)], _shingle_hash64(s))
                lru[s] = hit
                if len(lru) > _SHINGLE_LRU_MAX:
                    lru.popitem(last=False)      # evict least-recent
            else:
                lru.move_to_end(s)
            hcache[s], idcache[s] = hit
    o_band, o_key, o_id, o_sh, o_keys = [], [], [], [], []
    for d, sh in zip(ids, doc_sh):
        if not sh:
            continue
        rows = [hcache[s] for s in sh]
        sigs = [min(r[i] for r in rows) for i in range(N_HASHES)]
        keys = band_keys(sigs)
        keys_raw = [bytes.fromhex(k) for k in keys]
        sh_arr = np.sort(np.array([idcache[s] for s in sh], np.int64))
        for b, k in enumerate(keys):
            o_band.append(b)
            o_key.append(k)
            o_id.append(d)
            o_sh.append(sh_arr)
            o_keys.append(b"".join(keys_raw[:b]))
    return pa.table({
        "band": pa.array(o_band, pa.int32()),
        "band_key": pa.array(o_key, pa.string()),
        "doc_id": pa.array(o_id, pa.int64()),
        "shingles": pa.array(o_sh, pa.large_list(pa.int64())),
        "keys": pa.array(o_keys, pa.binary()),
    })


def minhash_lsh_pairs(docs_ds, threshold: float = 0.5,
                      n_buckets: int | None = None):
    """MinHash+LSH near-duplicate pairs with in-bucket Jaccard
    verification: (doc_a, doc_b, jaccard) for candidates sharing any
    band whose true shingle Jaccard ≥ threshold.

    ONE exchange end to end: rows keyed by (band, band_key) go through
    ``grouped_by_bucket`` (crc32-bucketed co-grouping — one UDF call
    per 1/n_buckets of the keyspace instead of one per LSH bucket, and
    no per-group Python dispatch). Inside a bucket, runs of equal
    (band, band_key) are found vectorized; ~all runs are singletons and
    are skipped without materializing their shingle payloads. A pair is
    emitted only from its FIRST colliding band (each band-b row carries
    its earlier bands' digests), so no downstream pair-dedup groupby is
    needed — r03's version spent a second sort barrier on that.

    Per-UDF-call memory is O(N_BANDS·N_docs·row_bytes / n_buckets), so
    at large corpus size pass ``n_buckets`` ≈ N_BANDS·N_docs·row_bytes
    / target_partition_bytes (row_bytes is dominated by the 8-byte
    shingle hashes, ~8·shingles_per_doc); the default suits corpora up
    to ~10⁷ docs at the 512-bucket default of grouped_by_bucket."""
    from ..stages.buckets import N_BUCKETS, grouped_by_bucket, run_starts

    rows = docs_ds.map_batches(_doc_shingle_rows, batch_format="pyarrow")

    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})

    def bucket_pairs(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return empty
        idx = pc.sort_indices(batch, sort_keys=[
            ("band", "ascending"), ("band_key", "ascending"),
            ("doc_id", "ascending")])
        t = batch.take(idx)
        bands = t["band"].to_numpy(zero_copy_only=False)
        kd = pc.dictionary_encode(t["band_key"].combine_chunks())
        if isinstance(kd, pa.ChunkedArray):
            kd = kd.combine_chunks()
        kcodes = kd.indices.to_numpy(zero_copy_only=False)
        starts = run_starts(bands) | run_starts(kcodes)
        run_id = np.cumsum(starts) - 1
        counts = np.bincount(run_id)
        multi = counts[run_id] >= 2
        if not multi.any():
            return empty
        # materialize payloads ONLY for rows in multi-member runs
        rows_idx = np.nonzero(multi)[0]
        sub = t.take(pa.array(rows_idx, pa.int64()))
        m = len(sub)
        sub_bands = bands[rows_idx]
        sub_runs = run_id[rows_idx]
        ids = sub["doc_id"].to_numpy(zero_copy_only=False)
        sh_col = sub["shingles"].combine_chunks()
        offs = sh_col.offsets.to_numpy(zero_copy_only=False)
        vals = sh_col.values.to_numpy(zero_copy_only=False)
        keys_bin = sub["keys"].to_pylist()
        a_out, b_out, j_out = [], [], []
        r_starts = np.nonzero(run_starts(sub_runs))[0]
        r_ends = np.append(r_starts[1:], m)
        for lo, hi in zip(r_starts, r_ends):
            b = int(sub_bands[lo])
            # split each row's earlier-band digests once per row, not
            # once per pair inside the O(k²) loop
            digs = [tuple(keys_bin[i][16 * bb:16 * bb + 16]
                          for bb in range(b)) for i in range(lo, hi)]
            for x in range(lo, hi):
                si = vals[offs[x]:offs[x + 1]]
                dx = digs[x - lo]
                for y in range(x + 1, hi):
                    # first-band ownership: skip if an earlier band
                    # already collided for this pair
                    if any(a == c for a, c in zip(dx, digs[y - lo])):
                        continue
                    sj = vals[offs[y]:offs[y + 1]]
                    inter = len(np.intersect1d(si, sj, assume_unique=True))
                    if not inter:
                        continue
                    jac = inter / (len(si) + len(sj) - inter)
                    if jac >= threshold:
                        a_out.append(int(ids[x]))
                        b_out.append(int(ids[y]))
                        j_out.append(round(jac, 6))
        return pa.table({"doc_a": pa.array(a_out, pa.int64()),
                         "doc_b": pa.array(b_out, pa.int64()),
                         "jaccard": pa.array(j_out, pa.float64())})

    return grouped_by_bucket(rows, bucket_pairs, key=["band", "band_key"],
                             n_buckets=n_buckets or N_BUCKETS)


N_TRI_CHUNKS = 8


def _triangle_expand(ids: np.ndarray, n_chunks: int):
    """Triangle (block-nested) partitioning for EXACT all-pairs joins.

    Row with chunk ``c = id % B`` is replicated to every bucket
    ``(min(c,j), max(c,j))`` for j in 0..B-1, so each unordered pair of
    rows meets in EXACTLY one bucket (the one named by their chunk
    pair) — no broadcast of the full table, no driver materialization,
    no pair dedup needed. Shuffle volume is B × input; per-bucket
    memory is 2N/B rows. At scale pick B ≈ sqrt(N·row_bytes /
    target_partition_bytes). Returns (bucket_ids, chunk_ids,
    take_indices) as int64/int32 numpy arrays."""
    n = len(ids)
    c = (ids % n_chunks).astype(np.int64)
    j = np.tile(np.arange(n_chunks, dtype=np.int64), n)
    cc = np.repeat(c, n_chunks)
    lo = np.minimum(cc, j)
    hi = np.maximum(cc, j)
    bucket = lo * n_chunks + hi
    take = np.repeat(np.arange(n, dtype=np.int64), n_chunks)
    return bucket, cc, take


def _triangle_sides(batch: pa.Table, n_chunks: int):
    """Split one triangle bucket into its (left, right) member index
    arrays; right is None for the diagonal bucket (pair within)."""
    bucket = int(batch["bucket"][0].as_py())
    i, j = divmod(bucket, n_chunks)
    ch = np.asarray(batch["chunk"].to_pylist(), dtype=np.int64)
    if i == j:
        return np.arange(len(ch)), None
    return np.nonzero(ch == i)[0], np.nonzero(ch == j)[0]


def ngram_jaccard_pairs(docs_ds, threshold: float = 0.5,
                        n_chunks: int = N_TRI_CHUNKS):
    """Exact n-gram Jaccard near-dup pairs via triangle-partitioned
    all-pairs (see _triangle_expand): the O(N²) set-intersection work is
    inherent to the exact semantics, but it is spread over B(B+1)/2
    independent buckets of 2N/B rows each — nothing materializes the
    whole table. minhash_lsh_pairs is the subquadratic path when LSH
    candidate recall is acceptable."""

    def expand(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch["doc_id"], pa.int64()).to_numpy(
            zero_copy_only=False)
        sh = [sorted(shingles_of(t)) for t in batch["text"].to_pylist()]
        bucket, chunk, take = _triangle_expand(ids, n_chunks)
        return pa.table({
            "bucket": pa.array(bucket, pa.int32()),
            "chunk": pa.array(chunk, pa.int32()),
            "doc_id": pa.array(ids[take], pa.int64()),
            "shingles": pa.array([sh[i] for i in take],
                                 pa.large_list(pa.string())),
        })

    def bucket_pairs(batch: pa.Table) -> pa.Table:
        left, right = _triangle_sides(batch, n_chunks)
        ids = np.asarray(batch["doc_id"].to_pylist(), dtype=np.int64)
        shs = batch["shingles"].to_pylist()
        sets = [frozenset(s) for s in shs]
        a_out, b_out, j_out = [], [], []

        def emit(x, y):
            sx, sy = sets[x], sets[y]
            if not sx or not sy:
                return
            inter = len(sx & sy)
            if not inter:
                return
            jac = inter / (len(sx) + len(sy) - inter)
            if jac >= threshold:
                a, b = (ids[x], ids[y]) if ids[x] < ids[y] else (ids[y], ids[x])
                a_out.append(int(a))
                b_out.append(int(b))
                j_out.append(round(jac, 6))

        if right is None:
            for xi in range(len(left)):
                for yi in range(xi + 1, len(left)):
                    emit(left[xi], left[yi])
        else:
            for x in left:
                for y in right:
                    emit(x, y)
        return pa.table({"doc_a": pa.array(a_out, pa.int64()),
                         "doc_b": pa.array(b_out, pa.int64()),
                         "jaccard": pa.array(j_out, pa.float64())})

    rows = docs_ds.map_batches(expand, batch_format="pyarrow")
    return rows.groupby("bucket").map_groups(bucket_pairs,
                                             batch_format="pyarrow")


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


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a non-negative int64 array."""
    ham = np.zeros(len(x), dtype=np.int64)
    v = x.copy()
    while v.any():
        ham += v & 1
        v >>= 1
    return ham


def simhash_pairs(docs_ds, max_hamming: int = 3):
    """SimHash near-dup pairs: (doc_a, doc_b, hamming ≤ max_hamming).

    EXACT banded shuffle (the SimHash analogue of the MinHash band
    path): the 60-bit signature is split into ``max_hamming + 1``
    bit-bands; by pigeonhole any pair within max_hamming flips agrees
    on at least one whole band. ONE crc32-bucketed exchange keyed by
    (band, band_val): inside a bucket, runs of equal (band, band_val)
    are segmented vectorized, and a pair is emitted only from its
    FIRST agreeing band — ownership is decided from the full signatures
    the rows already carry (``(xor >> offset) & mask == 0`` per earlier
    band, ≤ max_hamming vector ops), so removing the old
    (doc_a, doc_b) dedup groupby costs zero extra exchange bytes.
    Nothing broadcasts or materializes the signature table."""
    from ..stages.buckets import grouped_by_bucket, run_starts

    n_bands = max_hamming + 1
    width = 60 // n_bands
    widths = [width + (1 if b < 60 % n_bands else 0) for b in range(n_bands)]
    offsets = [sum(widths[:b]) for b in range(n_bands)]

    sigs_ds = simhash_signatures(docs_ds)

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"].to_pylist(), dtype=np.int64)
        sigs = np.asarray(batch["simhash"].to_pylist(), dtype=np.int64)
        n = len(ids)
        o_band = np.repeat(np.arange(n_bands, dtype=np.int32), n)
        o_val = np.concatenate(
            [(sigs >> offsets[b]) & ((1 << widths[b]) - 1)
             for b in range(n_bands)]) if n else np.empty(0, np.int64)
        return pa.table({"band": pa.array(o_band),
                         "band_val": pa.array(o_val, pa.int64()),
                         "doc_id": pa.array(np.tile(ids, n_bands)),
                         "simhash": pa.array(np.tile(sigs, n_bands))})

    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64()),
                      "hamming": pa.array([], pa.int64())})

    def bucket_pairs(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return empty
        idx = pc.sort_indices(batch, sort_keys=[
            ("band", "ascending"), ("band_val", "ascending"),
            ("doc_id", "ascending")])
        t = batch.take(idx)
        bands = t["band"].to_numpy(zero_copy_only=False)
        bvals = t["band_val"].to_numpy(zero_copy_only=False)
        starts = run_starts(bands) | run_starts(bvals)
        run_id = np.cumsum(starts) - 1
        counts = np.bincount(run_id)
        multi = counts[run_id] >= 2
        if not multi.any():
            return empty
        rows_idx = np.nonzero(multi)[0]
        ids = t["doc_id"].to_numpy(zero_copy_only=False)[rows_idx]
        sigs = t["simhash"].to_numpy(zero_copy_only=False)[rows_idx]
        sub_bands = bands[rows_idx]
        sub_runs = run_id[rows_idx]
        a_out, b_out, h_out = [], [], []
        r_starts = np.nonzero(run_starts(sub_runs))[0]
        r_ends = np.append(r_starts[1:], len(rows_idx))
        for lo, hi in zip(r_starts, r_ends):
            b = int(sub_bands[lo])
            for x in range(lo, hi):
                xors = np.bitwise_xor(sigs[x + 1:hi], sigs[x])
                # first-band ownership: drop pairs that already agreed
                # on an earlier band
                own = np.ones(len(xors), dtype=bool)
                for bb in range(b):
                    own &= ((xors >> offsets[bb])
                            & ((1 << widths[bb]) - 1)) != 0
                ham = _popcount64(xors)
                for d in np.nonzero(own & (ham <= max_hamming))[0]:
                    a_out.append(int(ids[x]))
                    b_out.append(int(ids[x + 1 + d]))
                    h_out.append(int(ham[d]))
        return pa.table({"doc_a": pa.array(a_out, pa.int64()),
                         "doc_b": pa.array(b_out, pa.int64()),
                         "hamming": pa.array(h_out, pa.int64())})

    rows = sigs_ds.map_batches(band_rows, batch_format="pyarrow")
    return grouped_by_bucket(rows, bucket_pairs, key=["band", "band_val"])


def embedding_dup_pairs(emb_ds, threshold: float = 0.45,
                        n_chunks: int = N_TRI_CHUNKS):
    """Exact embedding-cosine near-dup pairs (vec_a < vec_b, cosine ≥
    threshold) via triangle-partitioned block matmul (_triangle_expand):
    each bucket holds two id-chunks and does one float64 matmul between
    them — O(N²) similarity work spread over B(B+1)/2 buckets, O(N·B)
    shuffle, no broadcast of the full matrix. lsh_topk's hyperplane
    buckets are the subquadratic path when approximate recall is
    acceptable."""

    def expand(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch["vec_id"], pa.int64()).to_numpy(
            zero_copy_only=False)
        bucket, chunk, take = _triangle_expand(ids, n_chunks)
        take_arr = pa.array(take, pa.int64())
        return pa.table({
            "bucket": pa.array(bucket, pa.int32()),
            "chunk": pa.array(chunk, pa.int32()),
            "vec_id": pa.array(ids[take], pa.int64()),
            "embedding": pc.take(batch["embedding"], take_arr),
        })

    def bucket_pairs(batch: pa.Table) -> pa.Table:
        left, right = _triangle_sides(batch, n_chunks)
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        mat = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        a_out, b_out, s_out = [], [], []
        if right is None:
            sims = np.round(mat @ mat.T, 6)
            xs, ys = np.nonzero(np.triu(sims >= threshold, k=1))
            for x, y in zip(xs, ys):
                a, b = (ids[x], ids[y]) if ids[x] < ids[y] else (ids[y], ids[x])
                a_out.append(int(a))
                b_out.append(int(b))
                s_out.append(float(sims[x, y]))
        else:
            sims = np.round(mat[left] @ mat[right].T, 6)
            xs, ys = np.nonzero(sims >= threshold)
            for x, y in zip(xs, ys):
                ia, ib = ids[left[x]], ids[right[y]]
                a, b = (ia, ib) if ia < ib else (ib, ia)
                a_out.append(int(a))
                b_out.append(int(b))
                s_out.append(float(sims[x, y]))
        return pa.table({"vec_a": pa.array(a_out, pa.int64()),
                         "vec_b": pa.array(b_out, pa.int64()),
                         "cosine": pa.array(s_out, pa.float64())})

    rows = (emb_ds.select_columns(["vec_id", "embedding"])
            .map_batches(expand, batch_format="pyarrow"))
    return rows.groupby("bucket").map_groups(bucket_pairs,
                                             batch_format="pyarrow")


def embedding_lsh_pairs(emb_ds, threshold: float = 0.45,
                        n_planes: int | None = None):
    """Subquadratic embedding near-dup pairs: random-hyperplane LSH
    buckets as the shuffle key (the scale path next to the exact
    triangle join above).

    Each vector lands in exactly ONE bucket (the sign pattern of its
    dots with ``n_planes`` fixed Gaussian hyperplanes — deterministic in
    LSH_SEED, so the DuckDB oracle replicates the buckets with a literal
    plane matrix). Pairs are scored only within a bucket: candidate work
    is sum over buckets of |bucket|² ≈ N²/2^planes, shuffle volume is
    exactly N rows, and no dedup pass is needed since a pair can meet in
    at most one bucket. Near-dups split by a plane are the recall cost —
    the standard LSH trade, quantified in tests against the exact
    triangle output."""
    from .similarity import LSH_PLANES, LSH_SEED, _bucket_of

    if n_planes is None:
        n_planes = LSH_PLANES
    planes = np.random.default_rng(LSH_SEED).standard_normal((n_planes, 64))

    def bucketize(batch: pa.Table) -> pa.Table:
        mat = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        buckets = _bucket_of(mat, planes) if len(mat) else \
            np.array([], dtype=np.int64)
        return pa.table({
            "bucket": pa.array(buckets.astype(np.int64), pa.int64()),
            "vec_id": pc.cast(batch["vec_id"], pa.int64()),
            "embedding": batch["embedding"],
        })

    def bucket_pairs(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        mat = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        order = np.argsort(ids)
        ids, mat = ids[order], mat[order]
        sims = np.round(mat @ mat.T, 6)
        xs, ys = np.nonzero(np.triu(sims >= threshold, k=1))
        return pa.table({
            "vec_a": pa.array(ids[xs].astype(np.int64), pa.int64()),
            "vec_b": pa.array(ids[ys].astype(np.int64), pa.int64()),
            "cosine": pa.array([float(sims[x, y]) for x, y in zip(xs, ys)],
                               pa.float64())})

    rows = (emb_ds.select_columns(["vec_id", "embedding"])
            .map_batches(bucketize, batch_format="pyarrow"))
    return rows.groupby("bucket").map_groups(bucket_pairs,
                                             batch_format="pyarrow")


def semdedup(emb_ds, threshold: float = 0.45):
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): semantic dedup of an
    embedding table by in-CLUSTER cosine similarity. The ``label``
    column is the cluster assignment (here the table's label; at scale
    a trained k-means cell, exactly the coarse quantizer ivf_topk
    uses) — the clustering is what makes the op subquadratic: pairwise
    similarity is only ever computed within a cluster, so the work is
    Σ|cluster|² and nothing all-pairs touches the full table.

    Keep rule (deterministic; the paper keeps one exemplar per
    semantic-duplicate set): a vector is REMOVED iff some vector with a
    SMALLER vec_id in the same cluster has round(cosine, 6) ≥
    threshold. Output one row per vector: (vec_id, label, kept 0/1).

    Shape: ONE label-keyed crc32-bucketed exchange; inside a bucket,
    label runs are segmented vectorized and each run does one float64
    matmul (O(|cluster|²) — size clusters via the k of the upstream
    k-means, |cluster| ≈ N/k). No broadcast, no driver
    materialization."""
    from ..stages.buckets import grouped_by_bucket, run_starts

    empty = pa.table({"vec_id": pa.array([], pa.int64()),
                      "label": pa.array([], pa.int64()),
                      "kept": pa.array([], pa.int64())})

    def cluster_keep(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty
        idx = pc.sort_indices(batch, sort_keys=[
            ("label", "ascending"), ("vec_id", "ascending")])
        t = batch.take(idx)
        labels = t["label"].to_numpy(zero_copy_only=False)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        mat = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        kept = np.ones(len(ids), dtype=np.int64)
        r_starts = np.nonzero(run_starts(labels))[0]
        r_ends = np.append(r_starts[1:], len(ids))
        for lo, hi in zip(r_starts, r_ends):
            if hi - lo < 2:
                continue
            sims = np.round(mat[lo:hi] @ mat[lo:hi].T, 6)
            dup = (np.triu(sims >= threshold, k=1)).any(axis=0)
            kept[lo:hi][dup] = 0
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "label": pa.array(labels, pa.int64()),
                         "kept": pa.array(kept, pa.int64())})

    rows = emb_ds.select_columns(["vec_id", "label", "embedding"])
    return grouped_by_bucket(rows, cluster_keep, key="label")


CC_SMALL_GRAPH_MAX = 100_000  # edges; below → driver union-find


def connected_components(pairs_ds, a_col: str = "doc_a",
                         b_col: str = "doc_b", max_iters: int = 64,
                         small_graph_max: int = CC_SMALL_GRAPH_MAX):
    """Distributed connected components over a pair (edge) table.

    Returns a Dataset ``(doc_id, cluster_rep)`` covering every node that
    appears in at least one pair, with ``cluster_rep`` = min doc_id of
    the node's component — byte-identical to driver union-find output.

    Shape (what survives 100 TB): min-label propagation. ``label(v)``
    starts at ``min(v, neighbors(v))``; each round joins current labels
    onto the symmetric edge list (one hash exchange over O(edges) rows)
    and takes a per-node min (one keyed groupby). Labels are monotone
    non-increasing, so the global label sum is a convergence witness;
    rounds needed = component diameter (near-dup clusters are shallow
    stars/chains, so typically 2-4). Nothing here is O(corpus): only
    the pair graph — already sparse by LSH construction — is shuffled,
    and the per-round state (one label row per distinct node) is
    materialized in the object store, not on the driver. This is the
    scale path for ``q_dedup_clusters``'s driver union-find, which
    stops being viable once the pair set outgrows one machine.
    """
    import ray
    import ray.data as rd

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "cluster_rep": pa.array([], pa.int64())})

    def symmetrize(b: pa.Table) -> pa.Table:
        a = pc.cast(b[a_col], pa.int64())
        bb = pc.cast(b[b_col], pa.int64())
        return pa.table({
            "src": pa.concat_arrays([a.combine_chunks(),
                                     bb.combine_chunks()]),
            "dst": pa.concat_arrays([bb.combine_chunks(),
                                     a.combine_chunks()])})

    edges = (pairs_ds.select_columns([a_col, b_col])
             .map_batches(symmetrize, batch_format="pyarrow")
             .materialize())                      # O(edges), reused per round
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(empty)

    if n_edges <= small_graph_max:
        # threshold planner rule (same spirit as the broadcast-join
        # threshold): a pair graph that fits comfortably on the driver
        # skips the iterative rounds — byte-identical output, pinned by
        # tests/test_corpus.py which forces both paths
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in edges.take_all():
            a, b2 = r["src"], r["dst"]
            ra, rb = find(a), find(b2)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        members = sorted(parent)
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(members, pa.int64()),
            "cluster_rep": pa.array([find(m) for m in members],
                                    pa.int64())}))

    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    nparts = max(2, min(16, cpus // 4))

    def init_label(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": b["src"],
            "label": pc.min_element_wise(b["src"], b["min(dst)"])})

    labels = (edges.groupby("src").min("dst")
              .map_batches(init_label, batch_format="pyarrow")
              .materialize())
    prev_sum = None

    def to_msgs(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["dst"], "label": b["label"]})

    def rename_min(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"], "label": b["min(label)"]})

    converged = False
    for _ in range(max_iters):
        cur = labels.sum("label")
        if cur == prev_sum:
            converged = True
            break
        prev_sum = cur
        msgs = (edges.join(labels, "inner", nparts,
                           on=("src",), right_on=("node",))
                .map_batches(to_msgs, batch_format="pyarrow"))
        labels = (labels.union(msgs)
                  .groupby("node").min("label")
                  .map_batches(rename_min, batch_format="pyarrow")
                  .materialize())
    if not converged and labels.sum("label") != prev_sum:
        # fail LOUDLY: returning un-converged labels would silently
        # split components (wrong cluster_rep) downstream
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} "
            "rounds — component diameter exceeds max_iters; raise it")

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b["node"], "cluster_rep": b["label"]})

    return labels.map_batches(finalize, batch_format="pyarrow")


def prefix_filter_pairs(docs_ds, threshold: float = 0.5):
    """Exact Jaccard near-dup pairs via PPJoin/AllPairs-style PREFIX
    FILTERING — the sub-quadratic EXACT path (the triangle path pays
    O(N²) verification; MinHash-LSH is sub-quadratic but approximate).

    Theorem (AllPairs): under any global token order, if
    J(x, y) ≥ τ then x and y share a token within each one's first
    |S| − ceil(τ·|S|) + 1 tokens — so emitting only PREFIX tokens as
    join keys finds every qualifying pair. Order = (document frequency
    ASC, token ASC): rare tokens land in prefixes, so bucket sizes stay
    tiny and hot (stop-)shingles never generate candidates.

    Distributed shape: (1) shingle DF via per-batch partial counts,
    driver-merged and broadcast once — the same bounded-vocabulary
    assumption as decontam.tfidf_top_terms (its docstring carries the
    scale discussion); (2) each doc emits ~(1−τ)·|S| prefix rows
    (token, doc, full shingle set for verification); (3) ONE
    token-keyed bucket exchange; in-bucket exact-Jaccard verification
    of same-token candidates; (4) candidate pairs (found once per
    shared prefix token) dedup on the driver — bounded by the near-dup
    pair count, the standing assumption of the near-dup family.

    Output (doc_a, doc_b, jaccard) — identical to ngram_jaccard_pairs,
    and gated by the SAME exact-pairs SQL oracle."""
    import math

    import ray

    from ..stages.buckets import grouped_by_bucket

    # shingle ONCE into a narrow materialized projection — both the DF
    # pass and the prefix-expand pass consume it, so the text is read
    # and tokenized a single time (shingling dominates the near-dup
    # family's CPU), and the second pass can never see a shingle the
    # DF dict missed (review finding: re-executing docs_ds lineage
    # twice re-shingled everything and assumed deterministic input)
    def to_shingles(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch["doc_id"], pa.int64())
        sh = [sorted(shingles_of(t)) for t in batch["text"].to_pylist()]
        return pa.table({
            "doc_id": ids,
            "shingles": pa.array(sh, pa.large_list(pa.string()))})

    shingled = docs_ds.map_batches(
        to_shingles, batch_format="pyarrow").materialize()

    def df_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter
        c = Counter()
        for sh in batch["shingles"].to_pylist():
            c.update(sh)  # per-doc distinct already
        return pa.table({"s": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    df: dict[str, int] = {}
    for b in shingled.map_batches(df_partial, batch_format="pyarrow") \
                     .iter_batches(batch_format="pyarrow"):
        for s, n in zip(b["s"].to_pylist(), b["n"].to_pylist()):
            df[s] = df.get(s, 0) + n
    df_ref = ray.put(df)

    def expand_prefix(batch: pa.Table) -> pa.Table:
        from .decontam import _cached_get
        order = _cached_get(df_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        tok_out, id_out, set_out = [], [], []
        for i, sh in enumerate(batch["shingles"].to_pylist()):
            if not sh:
                continue
            sh = sorted(sh, key=lambda s: (order[s], s))
            p = len(sh) - math.ceil(threshold * len(sh)) + 1
            for tok in sh[:p]:
                tok_out.append(tok)
                id_out.append(int(ids[i]))
                set_out.append(sh)
        return pa.table({
            "token": pa.array(tok_out, pa.string()),
            "doc_id": pa.array(id_out, pa.int64()),
            "shingles": pa.array(set_out, pa.large_list(pa.string())),
        })

    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "j": pa.array([], pa.float64())})

    def bucket_verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        toks = batch["token"].to_pylist()
        ids = batch["doc_id"].to_pylist()
        shs = batch["shingles"].to_pylist()
        by_tok: dict[str, list[int]] = {}
        for r, tok in enumerate(toks):
            by_tok.setdefault(tok, []).append(r)
        a_out, b_out, j_out = [], [], []
        for rows in by_tok.values():
            for xi in range(len(rows)):
                for yi in range(xi + 1, len(rows)):
                    x, y = rows[xi], rows[yi]
                    if ids[x] == ids[y]:
                        continue
                    sx, sy = frozenset(shs[x]), frozenset(shs[y])
                    inter = len(sx & sy)
                    if not inter:
                        continue
                    jac = inter / (len(sx) + len(sy) - inter)
                    if jac >= threshold:
                        a, b = sorted((ids[x], ids[y]))
                        a_out.append(a)
                        b_out.append(b)
                        j_out.append(round(jac, 6))
        return pa.table({"a": pa.array(a_out, pa.int64()),
                         "b": pa.array(b_out, pa.int64()),
                         "j": pa.array(j_out, pa.float64())})

    prefix_rows = shingled.map_batches(expand_prefix,
                                       batch_format="pyarrow")
    cands = grouped_by_bucket(prefix_rows, bucket_verify, key="token")
    seen: dict[tuple[int, int], float] = {}
    for b in cands.iter_batches(batch_format="pyarrow"):
        for r in b.to_pylist():
            seen[(r["a"], r["b"])] = r["j"]
    ks = sorted(seen)
    return pa.table({
        "doc_a": pa.array([k[0] for k in ks], pa.int64()),
        "doc_b": pa.array([k[1] for k in ks], pa.int64()),
        "jaccard": pa.array([seen[k] for k in ks], pa.float64()),
    })


def _levenshtein(a: str, b: str) -> int:
    """Exact unit-cost edit distance, vectorized over the inner row:
    substitution/deletion from the previous row, then the sequential
    insertion dependency resolved by the cummin identity
    cur[j] = j + min_{k<=j}(cur0[k] - k). Bit-identical to DuckDB's
    ``levenshtein`` (fuzz-checked 300 random pairs in tests)."""
    la, lb = len(a), len(b)
    if not la:
        return lb
    if not lb:
        return la
    bb = np.frombuffer(b.encode("utf-32-le"),
                       dtype=np.uint32).astype(np.int64)
    prev = np.arange(lb + 1, dtype=np.int64)
    ar = np.arange(lb + 1, dtype=np.int64)
    for i in range(1, la + 1):
        ca = ord(a[i - 1])
        cur = np.empty(lb + 1, np.int64)
        cur[0] = i
        cur[1:] = np.minimum(prev[1:] + 1, prev[:-1] + (bb != ca))
        cur = ar + np.minimum.accumulate(cur - ar)
        prev = cur
    return int(prev[-1])


EDIT_FRAC = 0.2


def _doc_band_text_rows(batch: pa.Table) -> pa.Table:
    """One row per (band, band_key, doc_id) carrying the doc's
    whitespace-NORMALIZED text (the levenshtein verify payload) and
    the earlier-band digests for exactly-once pair emission — the
    _doc_shingle_rows layout with the payload swapped from shingle
    hashes to the normalized string (edit distance needs the full
    sequence; there is no sketchable substitute)."""
    from .textstats import norm_words
    ids = pc.cast(batch["doc_id"], pa.int64()).to_pylist()
    texts = batch["text"].to_pylist()
    doc_sh = [shingles_of(t) for t in texts]
    hcache: dict[str, list[str]] = {}
    for sh in doc_sh:
        for s in sh:
            if s not in hcache:
                b = s.encode()
                hcache[s] = [hashlib.md5(f"{i}:".encode() + b).hexdigest()
                             for i in range(N_HASHES)]
    o_band, o_key, o_id, o_txt, o_keys = [], [], [], [], []
    for d, t, sh in zip(ids, texts, doc_sh):
        if not sh:
            continue
        rows = [hcache[s] for s in sh]
        sigs = [min(r[i] for r in rows) for i in range(N_HASHES)]
        keys = band_keys(sigs)
        keys_raw = [bytes.fromhex(k) for k in keys]
        norm = " ".join(norm_words(t))
        for b, k in enumerate(keys):
            o_band.append(b)
            o_key.append(k)
            o_id.append(d)
            o_txt.append(norm)
            o_keys.append(b"".join(keys_raw[:b]))
    return pa.table({
        "band": pa.array(o_band, pa.int32()),
        "band_key": pa.array(o_key, pa.string()),
        "doc_id": pa.array(o_id, pa.int64()),
        "norm": pa.array(o_txt, pa.string()),
        "keys": pa.array(o_keys, pa.binary()),
    })


def edit_distance_pairs(docs_ds, frac: float = EDIT_FRAC,
                        n_buckets: int | None = None):
    """Edit-distance near-duplicate pairs — the dedup modality for
    SMALL local corruptions (typos, OCR noise, single-token swaps)
    that set-based Jaccard treats the same as big rewrites: candidates
    are the MinHash band collisions (identical banding to
    minhash_lsh_pairs, so the candidate set is sub-quadratic and the
    blocking rule is part of the operator's DEFINITION), verified by
    exact levenshtein over the whitespace-normalized text; a pair
    qualifies when dist <= floor(frac * max(len_a, len_b)). Emitted
    exactly once from its first colliding band. Output
    (doc_a, doc_b, edit_dist). Exact SQL mirror: "dedup_edit"
    (DuckDB ``levenshtein`` — the engine kernel is fuzz-matched to
    it). Scale shape: ONE (band, band_key)-bucket exchange; the
    payload is the normalized text (~doc-size × N_BANDS), so pass
    n_buckets up per minhash_lsh_pairs' sizing note at large SF."""
    from ..stages.buckets import N_BUCKETS, grouped_by_bucket, run_starts

    rows = docs_ds.map_batches(_doc_band_text_rows,
                               batch_format="pyarrow")

    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64()),
                      "edit_dist": pa.array([], pa.int64())})

    def bucket_pairs(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return empty
        idx = pc.sort_indices(batch, sort_keys=[
            ("band", "ascending"), ("band_key", "ascending"),
            ("doc_id", "ascending")])
        t = batch.take(idx)
        bands = t["band"].to_numpy(zero_copy_only=False)
        kd = pc.dictionary_encode(t["band_key"].combine_chunks())
        if isinstance(kd, pa.ChunkedArray):
            kd = kd.combine_chunks()
        kcodes = kd.indices.to_numpy(zero_copy_only=False)
        starts = run_starts(bands) | run_starts(kcodes)
        run_id = np.cumsum(starts) - 1
        counts = np.bincount(run_id)
        multi = counts[run_id] >= 2
        if not multi.any():
            return empty
        rows_idx = np.nonzero(multi)[0]
        sub = t.take(pa.array(rows_idx, pa.int64()))
        m = len(sub)
        sub_bands = bands[rows_idx]
        sub_runs = run_id[rows_idx]
        ids = sub["doc_id"].to_numpy(zero_copy_only=False)
        norms = sub["norm"].to_pylist()
        keys_bin = sub["keys"].to_pylist()
        a_out, b_out, d_out = [], [], []
        r_starts = np.nonzero(run_starts(sub_runs))[0]
        r_ends = np.append(r_starts[1:], m)
        for lo, hi in zip(r_starts, r_ends):
            b = int(sub_bands[lo])
            digs = [tuple(keys_bin[i][16 * bb:16 * bb + 16]
                          for bb in range(b)) for i in range(lo, hi)]
            for x in range(lo, hi):
                dx = digs[x - lo]
                tx = norms[x]
                for y in range(x + 1, hi):
                    if any(a == c for a, c in zip(dx, digs[y - lo])):
                        continue
                    ty = norms[y]
                    dmax = int(frac * max(len(tx), len(ty)))
                    dist = _levenshtein(tx, ty)
                    if dist <= dmax:
                        a_out.append(int(ids[x]))
                        b_out.append(int(ids[y]))
                        d_out.append(dist)
        return pa.table({"doc_a": pa.array(a_out, pa.int64()),
                         "doc_b": pa.array(b_out, pa.int64()),
                         "edit_dist": pa.array(d_out, pa.int64())})

    return grouped_by_bucket(rows, bucket_pairs,
                             key=["band", "band_key"],
                             n_buckets=n_buckets or N_BUCKETS)


def dup_rate_by_source(docs_ds):
    """Per-source exact-duplicate exposure: the share of each source's
    docs whose normalized-text hash appears ≥ 2 times ANYWHERE in the
    corpus — the shard-health metric that tells you which ingest feed
    is re-crawling content. Reuses exact_dedup's content-hash rule
    (md5 over the normalized word stream, dedup_exact's oracle
    contract).

    Scale: every doc lands in exactly ONE hash bucket, so a single
    hash-keyed exchange (stages/buckets.grouped_by_bucket) yields both
    the per-source doc totals and the per-source duplicate-involved
    counts as ≤|sources| partial rows per bucket; the driver folds
    bounded cells. Output: (source, n_docs, n_dup, rate6). Exact SQL
    mirror "dup_rate_by_source"."""
    from ..stages.buckets import grouped_by_bucket

    def digest(batch: pa.Table) -> pa.Table:
        hs = [hashlib.md5(" ".join(norm_words(t)).encode()).hexdigest()
              for t in batch["text"].to_pylist()]
        return pa.table({"text_hash": pa.array(hs, pa.string()),
                         "source": batch["source"]})

    def per_bucket(tbl: pa.Table) -> pa.Table:
        import pandas as pd
        df = pd.DataFrame({"th": tbl["text_hash"].to_pylist(),
                           "source": tbl["source"].to_pylist()})
        cnt = df.groupby("th")["th"].transform("size")
        df["is_dup"] = (cnt >= 2).astype(np.int64)
        g = df.groupby("source").agg(n_docs=("th", "size"),
                                     n_dup=("is_dup", "sum"))
        return pa.table({
            "source": pa.array(g.index.tolist(), pa.string()),
            "n_docs": pa.array(g["n_docs"].to_numpy(np.int64)),
            "n_dup": pa.array(g["n_dup"].to_numpy(np.int64)),
        })

    cells = grouped_by_bucket(
        docs_ds.map_batches(digest, batch_format="pyarrow"),
        per_bucket, key="text_hash")
    acc: dict[str, list[int]] = {}
    for b in cells.iter_batches(batch_format="pyarrow"):
        for r in b.to_pylist():
            a = acc.setdefault(r["source"], [0, 0])
            a[0] += r["n_docs"]
            a[1] += r["n_dup"]
    ks = sorted(acc)
    return pa.table({
        "source": pa.array(ks, pa.string()),
        "n_docs": pa.array([acc[k][0] for k in ks], pa.int64()),
        "n_dup": pa.array([acc[k][1] for k in ks], pa.int64()),
        "rate6": pa.array(
            [float(np.round(acc[k][1] / acc[k][0], 6)) for k in ks],
            pa.float64()),
    })
