"""RELP ordered-ack path over a REAL socket (VERDICT r02 #8): frames →
parse → per-connection acks written strictly in txnr order even when
downstream parse completion is out of order — mirroring the reference's
handleResponses re-ordering loop (services/network/relp.go:405-476) and
RelpSplit framing (utils/split.go:249)."""

from __future__ import annotations

import random
import socket
import threading

import pytest

from skewer_ray.sources.relp import (RelpAckWindow, RelpParseError,
                                     RelpStreamParser, serve_relp_connection)


def _frame(txnr: int, command: str, data: bytes) -> bytes:
    if data:
        return b"%d %s %d %s\n" % (txnr, command.encode(), len(data), data)
    return b"%d %s 0\n" % (txnr, command.encode())


def test_stream_parser_partial_feeds():
    """Frames split at arbitrary byte boundaries reassemble exactly."""
    payloads = [b"<13>Jun  1 10:00:00 host app: msg %d" % i
                for i in range(5)]
    wire = _frame(1, "open", b"relp_version=0\ncommands=syslog")
    for i, p in enumerate(payloads):
        wire += _frame(i + 2, "syslog", p)
    wire += _frame(len(payloads) + 2, "close", b"")
    for chunk in (1, 3, 7, len(wire)):
        parser = RelpStreamParser()
        got = []
        for off in range(0, len(wire), chunk):
            got.extend(parser.feed(wire[off:off + chunk]))
        assert [f.command for f in got] == \
            ["open"] + ["syslog"] * 5 + ["close"]
        assert [f.txnr for f in got] == list(range(1, 8))
        assert [f.data for f in got][1:-1] == payloads


def test_stream_parser_rejects_garbage():
    with pytest.raises(RelpParseError):
        RelpStreamParser().feed(b"x" * 100)
    with pytest.raises(RelpParseError):
        RelpStreamParser().feed(b"abc syslog 3 foo\n")  # non-numeric txnr


def test_ack_window_reorders():
    """Completions in any order release acks in commit (arrival) order,
    and a missing txnr blocks everything behind it."""
    w = RelpAckWindow()
    for t in range(1, 8):
        w.received(t)
    order = [4, 2, 6, 1, 3, 7, 5]
    released = []
    for t in order:
        released.extend(w.complete(t, t % 2 == 0))
    assert [t for t, _ in released] == list(range(1, 8))
    assert [ok for t, ok in released] == [t % 2 == 0 for t in range(1, 8)]
    assert w.pending == 0
    # blocking: 2 never completes -> 3..4 stay queued
    w2 = RelpAckWindow()
    for t in (1, 2, 3, 4):
        w2.received(t)
    out = w2.complete(1, True)
    out += w2.complete(3, True)
    out += w2.complete(4, True)
    assert [t for t, _ in out] == [1]
    assert w2.pending == 3


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_relp_end_to_end_socket_ordered_acks(seed):
    """Real socketpair: client sends open + 20 syslog frames (4 of them
    malformed → 500) + close; server completes parses in a SHUFFLED
    order; client must still receive rsp frames in strictly increasing
    txnr order with the right 200/500 statuses (relp.go:405-476)."""
    from skewer_ray.decoders.base import RecordBuilder
    from skewer_ray.decoders.rfc3164 import decode_block

    rng = random.Random(seed)
    n = 20
    bad = {5, 9, 14, 18}  # simulated downstream ForwardFail (store NACK)
    payloads = {}
    for i in range(n):
        txnr = i + 2
        if txnr in bad:
            payloads[txnr] = b"FAIL this one \xff\xfe"
        else:
            payloads[txnr] = (b"<13>Jun  1 10:00:%02d host app[7]: m%d"
                              % (i % 60, i))

    def process(frame) -> bool:
        # the real parse runs (the decoder ladder accepts ANY line, as
        # the reference's does — 500s come from the store, not parsing)
        out = RecordBuilder()
        decode_block([frame.data.decode("utf-8", "replace")], [0], out)
        assert bool(out.parse_ok)
        return not frame.data.startswith(b"FAIL")

    server_sock, client_sock = socket.socketpair()
    accepted = []

    def run_server():
        accepted.extend(serve_relp_connection(
            server_sock, process,
            completion_order=lambda fr: rng.sample(fr, len(fr))))
        server_sock.close()

    th = threading.Thread(target=run_server)
    th.start()
    wire = _frame(1, "open", b"relp_version=0\ncommands=syslog")
    for txnr in sorted(payloads):
        wire += _frame(txnr, "syslog", payloads[txnr])
    wire += _frame(n + 2, "close", b"")
    client_sock.sendall(wire)

    resp = b""
    while b"serverclose" not in resp:
        chunk = client_sock.recv(4096)
        if not chunk:
            break
        resp += chunk
    th.join(timeout=10)
    client_sock.close()

    # every accepted frame reached the row surface, in wire order
    assert [f.txnr for f in accepted] == sorted(payloads)

    lines = resp.split(b"\n")
    acks = []  # (txnr, status) for rsp frames with a numeric status
    for ln in lines:
        parts = ln.split(b" ")
        if len(parts) >= 4 and parts[1] == b"rsp" and \
                parts[3] in (b"200", b"500"):
            acks.append((int(parts[0]), int(parts[3])))
    # open ack (txnr 1) + one ack per syslog frame
    assert acks[0][0] == 1 and acks[0][1] == 200
    sys_acks = acks[1:]
    assert [t for t, _ in sys_acks] == sorted(payloads)  # MONOTONIC txnr
    for txnr, status in sys_acks:
        assert status == (500 if txnr in bad else 200), txnr
    assert resp.endswith(b"0 serverclose 0\n")


def test_stream_parser_bad_datalen_raises_not_stalls():
    """A non-digit DATALEN must raise immediately — the old behavior
    returned None ('need more bytes') and permanently stalled the
    connection with an unbounded buffer (code-review r03 finding)."""
    p = RelpStreamParser()
    with pytest.raises(RelpParseError):
        p.feed(b"1 syslog x hello\n2 syslog 3 abc\n")
    # a fresh parser still handles the valid follow-on frame fine
    p2 = RelpStreamParser()
    frames = p2.feed(b"2 syslog 3 abc\n")
    assert [(f.txnr, f.data) for f in frames] == [(2, b"abc")]


def test_stream_parser_bad_command_is_parse_error():
    """Non-ASCII / non-lowercase command bytes must surface as
    RelpParseError, never UnicodeDecodeError (ADVICE r03), and a
    malformed header with one space buffers boundedly instead of
    forever."""
    with pytest.raises(RelpParseError):
        RelpStreamParser().feed(b"1 \xffsyslog 3 abc\n")
    with pytest.raises(RelpParseError):
        RelpStreamParser().feed(b"1 SYSLOG 3 abc\n")   # uppercase
    with pytest.raises(RelpParseError):
        RelpStreamParser().feed(b"1 " + b"z" * 100)    # one-space garbage
    # an incomplete but WELL-FORMED header keeps buffering quietly
    p = RelpStreamParser()
    assert p.feed(b"12 syslog") == []
    assert [(f.txnr, f.command, f.data) for f in p.feed(b" 3 abc\n")] \
        == [(12, "syslog", b"abc")]
