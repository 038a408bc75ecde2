"""HTTP pull-sink semantics over stored partitions
(store/dests/httpserver.go:36-140 re-expression)."""

from __future__ import annotations

import json
import shutil

import pytest

from skewer_ray.sinks_pull import (NDJSON_MIME, OCTET_MIME, PLAIN_MIME,
                                   negotiate, page_content_type,
                                   pull_pages)

OUT = "/tmp/skewer_pull_test"


@pytest.fixture(scope="module")
def written_out(ray_session):
    """Flagship run whose config includes a STORE sink (protobuf wire in
    the encoded column — the reference's badger-store encoding)."""
    import dataclasses
    from skewer_ray.config import SinkConfig, default_config
    from skewer_ray.pipelines.flagship import run_flagship
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, sinks=cfg.sinks + (SinkConfig(name="store", kind="stderr",
                                           encoder="protobuf"),))
    shutil.rmtree(OUT, ignore_errors=True)
    run_flagship("/root/testdata/sf0.001", OUT, config=cfg)
    return OUT


def test_negotiation():
    assert negotiate("") == NDJSON_MIME
    assert negotiate("text/plain") in (PLAIN_MIME, "text/plain")
    assert negotiate("application/json;q=0.9, text/html") == \
        "application/json"
    assert negotiate("text/html") == NDJSON_MIME  # default


def test_content_type_rules():
    # httpserver.go:58-88
    assert page_content_type("json", 100, True, "\n") == (NDJSON_MIME, True)
    assert page_content_type("json", 100, True, "|") == (PLAIN_MIME, True)
    assert page_content_type("json", 100, False, "\n") == (PLAIN_MIME, False)
    # protobuf is not self-delimiting → octet-stream + octet framing
    assert page_content_type("protobuf", 100, True, "\n") == \
        (OCTET_MIME, False)
    assert page_content_type("rfc5424", 100, True, "\n") == \
        (PLAIN_MIME, True)


def test_pull_ndjson_pages(written_out):
    pages = list(pull_pages(written_out, sink="store",
                            accept="application/x-ndjson",
                            n_messages=1000))
    assert pages
    total = 0
    for ctype, body in pages:
        assert ctype == NDJSON_MIME
        lines = body.decode("utf-8").splitlines()
        assert len(lines) <= 1000
        d = json.loads(lines[0])
        assert "severity" in d and "timereported" in d
        total += len(lines)
    assert total == 5417  # every passing row served exactly once


def test_pull_rfc5424_plain(written_out):
    ctype, body = next(iter(pull_pages(written_out, sink="store",
                                       fmt="rfc5424", n_messages=50)))
    assert ctype == PLAIN_MIME
    first = body.decode("utf-8").splitlines()[0]
    assert first.startswith("<") and ">1 " in first


def test_pull_protobuf_octet_frames(written_out):
    from skewer_ray.protowire import decode_syslog_message
    ctype, body = next(iter(pull_pages(written_out, sink="store",
                                       fmt="protobuf", n_messages=20)))
    assert ctype == OCTET_MIME
    # parse octet-counted frames: "<len> <payload>"
    n = 0
    pos = 0
    while pos < len(body) and n < 20:
        sp = body.index(b" ", pos)
        ln = int(body[pos:sp])
        payload = body[sp + 1:sp + 1 + ln]
        rec = decode_syslog_message(payload)
        assert rec["appname"] != "" or rec["message"] != ""
        pos = sp + 1 + ln
        n += 1
    assert n == 20


def test_http_pull_server_live(written_out):
    """Real GETs against the pull server: Accept-negotiated NDJSON
    pages until 204; content equals the direct pull_pages output."""
    import urllib.request

    from skewer_ray.sinks_pull import HttpPullServer

    direct = list(pull_pages(written_out, sink="store",
                             accept="application/x-ndjson",
                             n_messages=2000))
    srv = HttpPullServer(written_out, sink="store", n_messages=2000)
    host, port = srv.address
    url = f"http://{host}:{port}/pull"
    got = []
    while True:
        req = urllib.request.Request(
            url, headers={"Accept": "application/x-ndjson"})
        with urllib.request.urlopen(req) as resp:
            if resp.status == 204:
                break
            got.append((resp.headers["Content-Type"], resp.read()))
    srv.close()
    assert got == direct and len(got) >= 2
    # every body line is valid JSON (NDJSON contract)
    for _ct, body in got:
        for line in body.decode().splitlines():
            json.loads(line)


def test_http_pull_server_per_stream_cursors(written_out):
    """Two consumers with distinct X-Stream-Id headers (same Accept)
    each receive the FULL page sequence — cursors are per stream, not
    per Accept value (ADVICE r03: concurrent clients previously shared
    one iterator and saw interleaved subsets)."""
    import urllib.request

    from skewer_ray.sinks_pull import HttpPullServer

    direct = list(pull_pages(written_out, sink="store",
                             accept="application/x-ndjson",
                             n_messages=2000))
    srv = HttpPullServer(written_out, sink="store", n_messages=2000)
    host, port = srv.address
    url = f"http://{host}:{port}/pull"

    # interleave the two consumers page by page
    got = {"a": [], "b": []}
    done = {"a": False, "b": False}
    while not all(done.values()):
        for stream_id in ("a", "b"):
            if done[stream_id]:
                continue
            req = urllib.request.Request(
                url, headers={"Accept": "application/x-ndjson",
                              "X-Stream-Id": stream_id})
            with urllib.request.urlopen(req) as resp:
                if resp.status == 204:
                    done[stream_id] = True
                else:
                    got[stream_id].append((resp.headers["Content-Type"],
                                           resp.read()))
    srv.close()
    assert got["a"] == direct
    assert got["b"] == direct


def test_websocket_pull_live(written_out):
    """Websocket pull variant (store/dests/websocketserver.go): RFC6455
    upgrade on the same listener, one ws TEXT message per stored record,
    then a normal-closure close frame with 'bye!'."""
    import base64
    import hashlib
    import os
    import socket

    from skewer_ray.sinks_pull import (WS_CLOSE, WS_GUID, WS_TEXT,
                                       HttpPullServer, pull_messages)

    direct = [p for _bin, p in pull_messages(
        written_out, sink="store", accept="application/x-ndjson")]
    assert len(direct) > 100

    srv = HttpPullServer(written_out, sink="store")
    host, port = srv.address
    key = base64.b64encode(os.urandom(16)).decode()
    sock = socket.create_connection((host, port))
    sock.sendall((
        f"GET /logs HTTP/1.1\r\nHost: {host}:{port}\r\n"
        "Upgrade: websocket\r\nConnection: Upgrade\r\n"
        f"Sec-WebSocket-Key: {key}\r\nSec-WebSocket-Version: 13\r\n"
        "Accept: application/x-ndjson\r\n\r\n").encode())
    rfile = sock.makefile("rb")
    status = rfile.readline()
    assert b"101" in status
    headers = {}
    while True:
        line = rfile.readline().strip()
        if not line:
            break
        k, _, v = line.partition(b": ")
        headers[k.decode().lower()] = v.decode()
    want_accept = base64.b64encode(hashlib.sha1(
        (key + WS_GUID).encode()).digest()).decode()
    assert headers["sec-websocket-accept"] == want_accept

    def read_frame():
        hdr = rfile.read(2)
        opcode = hdr[0] & 0x0F
        n = hdr[1] & 0x7F
        if n == 126:
            n = int.from_bytes(rfile.read(2), "big")
        elif n == 127:
            n = int.from_bytes(rfile.read(8), "big")
        return opcode, rfile.read(n)

    got = []
    while True:
        opcode, payload = read_frame()
        if opcode == WS_CLOSE:
            assert payload[:2] == (1000).to_bytes(2, "big")
            assert payload[2:] == b"bye!"
            break
        assert opcode == WS_TEXT
        got.append(payload)
    # close echo (client frames are masked; empty payload needs no mask
    # bytes applied but the mask bit must be set)
    sock.sendall(bytes([0x88, 0x80]) + os.urandom(4))
    sock.close()
    srv.close()
    assert got == direct
