"""Count-Min sketch, stratified sampling, and multiline reassembly."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

from skewer_ray.functions.curation import (STRATA_BOUNDS, STRATA_DEFAULT,
                                           stratified_sample)
from skewer_ray.functions.multiline import merge_multiline
from skewer_ray.functions.sketches import (CMS_DEPTH, _cms_cell,
                                           cms_term_counts)
from skewer_ray.functions.textstats import norm_words

SF = "/root/testdata/sf0.001"


def test_cms_upper_bounds_true_counts(ray_session):
    """CMS estimates are ≥ the exact counts (the one-sided guarantee),
    and within the ε·N Markov bound with room to spare."""
    import pyarrow.parquet as pq
    texts = pq.read_table(f"{SF}/documents.parquet",
                          columns=["text"])["text"].to_pylist()
    exact: dict[str, int] = {}
    total = 0
    for t in texts:
        for w in norm_words(t):
            exact[w] = exact.get(w, 0) + 1
            total += 1
    probes = ("table", "value", "key", "row")
    ds = rd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])
    got = {r["term"]: r["estimate"]
           for r in cms_term_counts(ds, probes).to_pylist()}
    for t in probes:
        assert got[t] >= exact.get(t, 0)
        # e/width ≈ 0.0053 → slack 2·ε·N is a generous CI
        assert got[t] - exact.get(t, 0) <= 2 * np.e / 512 * total


def test_cms_cell_depth_rows_differ():
    """Hash rows are independent: the same term lands in different
    cells across rows (holds for these probes; md5 collisions across 4
    rows would defeat the min)."""
    cells = [_cms_cell(d, "table") for d in range(CMS_DEPTH)]
    assert len(set(cells)) > 1


def test_stratified_rates(ray_session):
    """Per-stratum keep decision matches the pure-function rule and
    realized rates are within binomial noise of bounds/256."""
    import pyarrow.parquet as pq
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "lang", "source"])
    ds = rd.read_parquet(f"{SF}/documents.parquet")
    kept = {r["doc_id"] for r in stratified_sample(ds).take_all()}
    for doc_id, lang in zip(t["doc_id"].to_pylist(),
                            t["lang"].to_pylist()):
        expect = (hashlib.md5(str(doc_id).encode()).digest()[0]
                  < STRATA_BOUNDS.get(lang, STRATA_DEFAULT))
        assert (doc_id in kept) == expect


def test_merge_multiline_glues_continuations(ray_session):
    """Hand case: continuations (incl. a leading orphan) merge into
    their opener; record count = number of openers + leading island."""
    rows = pa.table({
        "conv_id": pa.array(["c1"] * 5 + ["c2"] * 2),
        "turn_idx": pa.array([0, 1, 2, 3, 4, 0, 1], pa.int32()),
        "text": pa.array([
            "orphan continuation",          # island 0 (no opener yet)
            "<3>1 first record",            # island 1
            "  at Foo.java:12",             # cont
            "  at Bar.java:7",              # cont
            "<4>2 second record",           # island 2
            "<5>1 c2 record",               # c2 island 1
            "tail line",                    # cont
        ]),
    })
    ds = rd.from_arrow(rows)
    out = {(r["conv_id"], r["rec_idx"]): r
           for r in merge_multiline(ds).take_all()}
    assert len(out) == 4
    assert out[("c1", 0)]["record"] == "orphan continuation"
    assert out[("c1", 1)]["record"] == \
        "<3>1 first record\n  at Foo.java:12\n  at Bar.java:7"
    assert out[("c1", 1)]["n_lines"] == 3
    assert out[("c1", 2)]["record"] == "<4>2 second record"
    assert out[("c2", 1)]["record"] == "<5>1 c2 record\ntail line"


def test_merge_multiline_roundtrip_lines(ray_session):
    """Splitting the merged records back on newlines restores every
    input line exactly once (conservation)."""
    from skewer_ray.pipelines.flagship import read_transcripts
    ds = read_transcripts(SF)
    n_in = ds.count()
    recs = merge_multiline(ds).take_all()
    n_out = sum(len(r["record"].split("\n")) for r in recs)
    assert n_out == n_in
    assert all(r["n_lines"] == len(r["record"].split("\n"))
               for r in recs)
