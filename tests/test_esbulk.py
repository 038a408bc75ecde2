"""Elasticsearch destination bulk-ack model
(store/dests/elasticsearch.go:169-268 re-expression)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from skewer_ray.stages.esbulk import (ES_BATCH_SIZE, after, bulk_ack_statuses,
                                      bulk_responses, valid_index_name)


def test_valid_index_name_rules():
    assert valid_index_name("logs-2024.01.01")
    assert valid_index_name("skewer")
    assert not valid_index_name("Logs")            # uppercase
    assert not valid_index_name("-logs")           # bad leading char
    assert not valid_index_name("_logs")
    assert not valid_index_name("+logs")
    assert not valid_index_name(".")
    assert not valid_index_name("..")
    assert not valid_index_name("")
    assert not valid_index_name("a b")             # space
    assert not valid_index_name("a/b")
    assert not valid_index_name("a:b")
    assert not valid_index_name("a#b")
    assert not valid_index_name("x" * 256)         # > 255 bytes
    assert valid_index_name("x" * 255)


def test_bulk_batching_and_after_callback():
    """Items group into ≤ ES_BATCH_SIZE bulk requests; the after
    callback splits each response into per-item ACK/NACK exactly like
    the reference (success→ACK uid, failure→NACK uid)."""
    n = ES_BATCH_SIZE + 7
    names = ["ok-index" if i % 3 else "BAD INDEX" for i in range(n)]
    uids = [f"u{i}" for i in range(n)]
    resps = list(bulk_responses(names, uids))
    assert [len(r["items"]) for r in resps] == [ES_BATCH_SIZE, 7]
    assert all(r["errors"] for r in resps)   # every batch has a bad item
    acked, nacked = set(), set()
    for r in resps:
        a, k = after(r)
        acked.update(a)
        nacked.update(k)
    assert acked == {f"u{i}" for i in range(n) if i % 3}
    assert nacked == {f"u{i}" for i in range(n) if i % 3 == 0}
    # error items carry the real ES error shape
    bad = resps[0]["items"][0]["index"]
    assert bad["status"] == 400
    assert bad["error"]["type"] == "invalid_index_name_exception"


def test_fanout_es_statuses_equal_bulk_fold(ray_session):
    """The vectorized es-sink path in the fan-out stage must produce
    exactly the statuses of folding bulk_responses()+after() row by
    row over (rendered index name, uid)."""
    import dataclasses

    from skewer_ray.config import SinkConfig, default_config
    from skewer_ray.pipelines.flagship import build_fanout, read_transcripts

    cfg = dataclasses.replace(default_config(), sinks=(
        SinkConfig(name="es", kind="es", encoder="json",
                   filename_tmpl="logs-{msgid}-{hostname}"),))
    routed = build_fanout(read_transcripts("/root/testdata/sf0.001"),
                          config=cfg)
    tbl = pa.concat_tables(
        b for b in routed.iter_batches(batch_format="pyarrow"))
    es = tbl.filter(pc.and_(
        pc.equal(tbl["sink"], "es"),
        pc.is_in(tbl["status"],
                 value_set=pa.array(["passing", "nack"]))))
    assert es.num_rows > 0
    got = dict(zip(es["uid"].to_pylist(),
                   (s == "passing" for s in es["status"].to_pylist())))

    # independent fold: re-render the index names from the routed stream
    from skewer_ray.pipelines.flagship import build_routed
    rt = pa.concat_tables(
        b for b in build_routed(read_transcripts("/root/testdata/sf0.001"),
                                config=cfg)
        .iter_batches(batch_format="pyarrow"))
    rt = rt.filter(pc.equal(rt["filter_status"], "passing"))
    names = [f"logs-{m}-{h}" for m, h in zip(rt["msgid"].to_pylist(),
                                             rt["hostname"].to_pylist())]
    want = bulk_ack_statuses(names, rt["uid"].to_pylist())
    assert got == want
    assert True in got.values() and False in got.values()  # a real mix
