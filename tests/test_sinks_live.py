"""Live client destinations (sinks_live) against the live sources —
the engine's own wire bytes travel a real socket and come back
losslessly, with the reference's ack semantics.

TCP lazy-ack ratchet: store/dests/tcpdest.go:83-107. RELP windowed
per-txnr acks: store/dests/relpdest.go."""

from __future__ import annotations

import socket

from skewer_ray.sinks_live import (ACK, NACK, PENDING, PERMERROR,
                                   RelpClientSink, TcpClientSink)

TS = 1768435200 * 10**9


def rec(uid: str, **kw) -> dict:
    base = dict(priority=34, facility=4, severity=2, version=1,
                time_reported=TS, time_generated=TS, hostname="host01",
                appname="app01", procid="4321", msgid="ID47",
                structured="", message=f"body {uid}", properties="{}",
                uid=uid)
    base.update(kw)
    return base


def test_tcp_client_sink_loopback_and_lazy_ack():
    from skewer_ray.encoders import encode_rfc5424
    from skewer_ray.sources.sockets import TcpLineSource, serve_in_thread

    listener = TcpLineSource()
    th, out = serve_in_thread(listener.collect, 1)

    rows = [rec("u1"), rec("u2"), rec("u3", hostname="bad\nhost"),
            rec("u4")]
    sink = TcpClientSink(listener.address, encoder="rfc5424",
                         ack_on_close=True)
    status = sink.send_rows(rows)
    status.update(sink.flush())
    th.join(timeout=10)
    listener.close()

    # lazy ratchet: u1/u2 acked by the NEXT successful write; u3 is a
    # PermError (invalid hostname) and never hits the wire; u4 acked at
    # graceful flush only because ack_on_close was opted into
    assert status == {"u1": ACK, "u2": ACK, "u3": PERMERROR, "u4": ACK}

    got = [r["text"] for r in out[0].to_pylist()]
    assert got == [encode_rfc5424(rows[0]), encode_rfc5424(rows[1]),
                   encode_rfc5424(rows[3])]


def test_tcp_client_sink_pending_until_next_write():
    from skewer_ray.sources.sockets import TcpLineSource, serve_in_thread
    listener = TcpLineSource()
    th, out = serve_in_thread(listener.collect, 1)
    sink = TcpClientSink(listener.address)
    s1 = sink.send_rows([rec("a")])
    assert s1 == {"a": PENDING}          # no app-level ack from TCP yet
    s2 = sink.send_rows([rec("b")])
    assert s2 == {"a": ACK, "b": PENDING}
    # default flush leaves the ratchet PENDING: a clean half-close is
    # not proof of delivery (reference leave-pending semantics)
    assert sink.flush() == {"b": PENDING}
    th.join(timeout=10)
    listener.close()


def test_relp_client_window_bounds_inflight_frames():
    """A batch far larger than both socket buffers completes because
    the client drains one rsp per send past the window — without the
    bound this deadlocks (server blocked writing acks, client blocked
    in sendall)."""
    import threading

    from skewer_ray.sources.relp import serve_relp_connection

    srv_sock, clt_sock = socket.socketpair()
    accepted = []

    def run_server():
        accepted.extend(serve_relp_connection(srv_sock, lambda fr: True))
        srv_sock.close()

    th = threading.Thread(target=run_server)
    th.start()

    sink = RelpClientSink(clt_sock, window=8)
    n = 4000
    rows = [rec(f"w{i}", message="x" * 512) for i in range(n)]
    status = sink.send_rows(rows)
    sink.close()
    th.join(timeout=30)

    assert len(accepted) == n
    assert all(status[f"w{i}"] == ACK for i in range(n))


def test_relp_client_against_own_server():
    """Full RELP loopback: our client dest talks to our server source
    over a socketpair; server-side failures surface as per-uid NACKs
    regardless of completion order."""
    import threading

    from skewer_ray.sources.relp import serve_relp_connection

    srv_sock, clt_sock = socket.socketpair()
    accepted = []

    def process(frame) -> bool:
        return b"REJECTME" not in frame.data

    def run_server():
        accepted.extend(serve_relp_connection(
            srv_sock, process,
            completion_order=lambda fr: list(reversed(fr))))
        srv_sock.close()

    th = threading.Thread(target=run_server)
    th.start()

    sink = RelpClientSink(clt_sock)
    rows = [rec("r1"), rec("r2", message="REJECTME"), rec("r3")]
    status = sink.send_rows(rows)
    sink.close()
    th.join(timeout=10)

    assert status == {"r1": ACK, "r2": NACK, "r3": ACK}
    assert len(accepted) == 3            # all frames reached the server
