"""Decontamination, TF-IDF, and anonymization operators."""

from __future__ import annotations

import pyarrow as pa

from skewer_ray.functions.anonymize import (host_pseudonym,
                                            pseudonymize_hosts, scrub_pii)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# anonymize: pure units
# ---------------------------------------------------------------------------

def test_scrub_pii_masks_all_rule_kinds():
    col = pa.array([
        "contact alice.smith+x@example.co.uk or call +14155550123 now",
        "peer at 10.0.12.7 refused, retry 192.168.0.1",
        "nothing sensitive here",
    ])
    out = scrub_pii(col).to_pylist()
    assert out[0] == "contact <EMAIL> or call <PHONE> now"
    assert out[1] == "peer at <IP> refused, retry <IP>"
    assert out[2] == "nothing sensitive here"


def test_pseudonyms_are_consistent_and_nonreversible_shape():
    col = pa.array(["host01", "host02", "host01", ""])
    out = pseudonymize_hosts(col).to_pylist()
    assert out[0] == out[2] == host_pseudonym("host01")
    assert out[0] != out[1]
    assert out[0].startswith("h-") and len(out[0]) == 18
    assert out[3] == ""  # nil hostname stays nil, not pseudonymized


def test_anonymize_preserves_host_cardinality(ray_session):
    """Referential integrity: distinct hosts in == distinct pseudonyms out."""
    from skewer_ray.pipelines.flagship import build_parsed, read_transcripts
    from skewer_ray.functions.anonymize import anonymize_hosts
    parsed = build_parsed(read_transcripts(SF))
    out = anonymize_hosts(parsed).take_all()
    hosts_out = {r["hostname"] for r in out if r["hostname"]}
    import numpy as np
    from skewer_ray.stages.parse import family_array
    raw = build_parsed(read_transcripts(SF)).take_all()
    hosts_in = {r["hostname"] for r in raw
                if r["hostname"]
                and family_array(pa.array([r["conv_id"]]))[0] in (0, 1, 2, 3)}
    assert len(hosts_out) == len(hosts_in) > 0
    # no raw hostname survives in the output column
    assert not (hosts_out & hosts_in)


# ---------------------------------------------------------------------------
# decontaminate / tfidf: dataset level
# ---------------------------------------------------------------------------

def test_decontaminate_flags_overlap_with_benchmark(ray_session):
    import ray.data as rd

    from skewer_ray.functions.decontam import decontaminate
    from skewer_ray.functions.dedup import shingles_of
    ds = rd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])
    rows = {r["doc_id"]: r for r in decontaminate(ds, mod=97).take_all()}
    docs = {r["doc_id"]: r["text"] for r in ds.take_all()}
    bench = set()
    for d, t in docs.items():
        if d % 97 == 0:
            bench |= shingles_of(t)
    # benchmark docs excluded from output; overlaps match brute force
    assert all(d % 97 != 0 for d in rows)
    for d, t in docs.items():
        if d % 97 == 0:
            continue
        assert rows[d]["n_overlap"] == len(shingles_of(t) & bench)
        assert rows[d]["contaminated"] == (rows[d]["n_overlap"] > 0)
    assert any(r["contaminated"] for r in rows.values())


def test_tfidf_rare_term_outranks_common(ray_session):
    """A term unique to one doc must outscore corpus-wide terms there."""
    import math
    from collections import Counter

    import ray.data as rd

    from skewer_ray.functions.decontam import tfidf_top_terms
    from skewer_ray.functions.textstats import norm_words
    ds = rd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])
    out = tfidf_top_terms(ds, k=3).take_all()
    docs = {r["doc_id"]: r["text"] for r in ds.take_all()}
    n = len(docs)
    df = Counter()
    for t in docs.values():
        df.update(set(norm_words(t)))
    # verify top-1 for a handful of docs against brute force
    top1 = {r["doc_id"]: (r["term"], r["tfidf"]) for r in out if r["rank"] == 1}
    for d in list(top1)[:20]:
        tf = Counter(norm_words(docs[d]))
        best = min((-c * math.log(n / df[w]), w) for w, c in tf.items())
        assert top1[d][0] == best[1]
        assert abs(top1[d][1] - (-best[0])) < 1e-6


def test_bloom_no_false_negatives_and_rule_parity(ray_session):
    """Every exact overlap is a bloom hit (no false negatives); hit
    counts match a direct bloom recomputation shingle-by-shingle."""
    import pyarrow.parquet as pq
    from skewer_ray.functions.decontam import (BENCH_MOD,
                                               _bloom_positions,
                                               bloom_decontaminate)
    from skewer_ray.functions.dedup import shingles_of
    import ray.data as rd

    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    got = {r["doc_id"]: (r["n_shingles"], r["n_hits"])
           for r in bloom_decontaminate(docs).take_all()}

    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])
    bits: set[int] = set()
    shing = {}
    for d, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        sh = shingles_of(txt)
        shing[d] = sh
        if d % BENCH_MOD == 0:
            for s in sh:
                bits.update(_bloom_positions(s))
    bench_sh = set().union(*(shing[d] for d in shing
                             if d % BENCH_MOD == 0))
    for d, sh in shing.items():
        if d % BENCH_MOD == 0 or not sh:
            assert d not in got
            continue
        n_hits = sum(all(p in bits for p in _bloom_positions(s))
                     for s in sh)
        assert got[d] == (len(sh), n_hits)
        # no false negatives vs the exact set
        assert n_hits >= len(sh & bench_sh)
