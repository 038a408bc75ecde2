"""Grok expansion + vectorized extraction (functions/grok.py)."""

from __future__ import annotations

import re

import pytest

from skewer_ray.functions.grok import GROK_PATTERNS, expand_grok, grok_extract

LINES = [
    "<13>1 2026-01-15T00:00:02Z host02 app2 1002 id02 [x k=\"v\"] body",
    "plain text, no match",
    "<0>1 2026-01-15T09:08:07.123+02:00 h a 1 - [s] tail words",
]
EXPR = ("^<%{INT:pri}>%{INT:ver} %{TIMESTAMP_ISO8601:ts} %{NOTSPACE:host} "
        "%{NOTSPACE:app} %{NOTSPACE:procid} %{NOTSPACE:msgid} "
        "\\[%{DATA:sd}\\] %{GREEDYDATA:msg}$")


def test_expand_named_and_indexed_agree():
    named, f1 = expand_grok(EXPR, named=True)
    plain, f2 = expand_grok(EXPR, named=False)
    assert f1 == f2 == ["pri", "ver", "ts", "host", "app", "procid",
                       "msgid", "sd", "msg"]
    for line in LINES:
        m1, m2 = re.match(named, line), re.match(plain, line)
        assert (m1 is None) == (m2 is None)
        if m1:
            assert list(m1.groups()) == list(m2.groups())


def test_expand_rejects_bad_input():
    with pytest.raises(KeyError):
        expand_grok("%{NOSUCHPATTERN:x}")
    with pytest.raises(ValueError):
        expand_grok("%{INT:a} %{INT:a}")


def test_unnamed_refs_do_not_capture():
    rx, fields = expand_grok("%{INT} %{WORD:w}")
    assert fields == ["w"]
    m = re.match(rx, "42 hello")
    assert m and m.groups() == ("hello",)


def test_every_builtin_pattern_compiles_and_selfmatches():
    samples = {
        "INT": "-42", "NUMBER": "3.14", "WORD": "abc", "NOTSPACE": "a/b:c",
        "DATA": "", "GREEDYDATA": "x y z", "HOSTNAME": "node-1.example.com",
        "IPV4": "10.0.0.255", "UUID": "0f8fad5b-d9cb-469f-a165-70867728950e",
        "LOGLEVEL": "WARNING", "TIMESTAMP_ISO8601": "2026-01-15T00:00:02Z",
        "SYSLOGTIMESTAMP": "Jan  5 04:05:06",
    }
    assert set(samples) == set(GROK_PATTERNS)
    for name, sample in samples.items():
        assert re.fullmatch(GROK_PATTERNS[name], sample), name


def test_grok_extract_matches_python_re(ray_session):
    import pyarrow as pa
    import ray.data as rd
    ds = rd.from_arrow(pa.table({"id": list(range(len(LINES))),
                                 "text": LINES}))
    out = grok_extract(ds, EXPR, keep=["id"],
                       types={"pri": "int64", "ver": "int64"}).take_all()
    rx, fields = expand_grok(EXPR)
    want = []
    for i, line in enumerate(LINES):
        m = re.match(rx, line)
        if m:
            want.append((i,) + m.groups())
    got = [(r["id"], str(r["pri"]), str(r["ver"]), r["ts"], r["host"],
            r["app"], r["procid"], r["msgid"], r["sd"], r["msg"])
           for r in sorted(out, key=lambda r: r["id"])]
    assert got == want
    # unmatched-row retention path
    kept = grok_extract(ds, EXPR, keep=["id"],
                        drop_unmatched=False).take_all()
    assert len(kept) == len(LINES)
    assert sorted(r["grok_match"] for r in kept) == [False, True, True]
