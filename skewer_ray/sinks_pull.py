"""HTTP/WS pull-sink semantics over stored sink partitions
(store/dests/httpserver.go:36-140, websocketserver.go).

The reference serves queued messages over HTTP: each GET returns up to
``n_messages`` messages encoded in the configured-or-negotiated format,
line-framed (delimiter) or octet-counted, with the content-type derived
from (format, framing) — httpserver.go:53-88. The socket listener is a
serving concern; the batch re-expression is an iterator of response
pages over a written sink partition, re-encoding stored records on
demand. A real deployment wraps :func:`pull_pages` in any HTTP/WS
framework; everything the reference computes (negotiation, framing,
content types, page sizing) lives here and is tested.

Mimetype tables mirror encoders/encoder.go:17-53.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

JSON_MIME = "application/json"
NDJSON_MIME = "application/x-ndjson"
AVRO_MIME = "application/x-avro-binary"
PROTOBUF_MIME = "application/vnd.google.protobuf"
OCTET_MIME = "application/octet-stream"
PLAIN_MIME = 'text/plain; charset="utf-8"'

# accepted mimetype → encoder name (encoders/encoder.go:33-41)
R_MIMETYPES = {
    JSON_MIME: "json",
    NDJSON_MIME: "json",
    AVRO_MIME: "avro",
    PROTOBUF_MIME: "protobuf",
    OCTET_MIME: "protobuf",
    PLAIN_MIME: "rfc5424",
    "text/plain": "rfc5424",
}
ACCEPTED = [JSON_MIME, NDJSON_MIME, AVRO_MIME, PROTOBUF_MIME,
            OCTET_MIME, PLAIN_MIME, "text/plain"]

# format → base content-type for single-message responses
# (encoders/encoder.go:43-53)
MIMETYPES = {
    "rfc5424": PLAIN_MIME,
    "rfc3164": PLAIN_MIME,
    "json": JSON_MIME,
    "fulljson": JSON_MIME,
    "avro": AVRO_MIME,
    "file": PLAIN_MIME,
    "gelf": JSON_MIME,
    "protobuf": PROTOBUF_MIME,
}


def negotiate(accept: str) -> str:
    """Minimal content negotiation (the reference uses goautoneg):
    first Accept entry present in ACCEPTED wins, default NDJSON."""
    for part in (accept or "").split(","):
        mime = part.split(";")[0].strip().lower()
        for a in ACCEPTED:
            if a.split(";")[0] == mime:
                return a
    return NDJSON_MIME


def page_content_type(fmt: str, n_messages: int, line_framing: bool,
                      delimiter: str) -> tuple[str, bool]:
    """(content_type, effective_line_framing) for a multi/single-message
    page — httpserver.go:58-88 rules."""
    if n_messages == 1:
        return MIMETYPES[fmt], line_framing
    if fmt in ("json", "gelf", "fulljson"):
        if line_framing:
            return (NDJSON_MIME if delimiter == "\n" else PLAIN_MIME), True
        return PLAIN_MIME, False
    if fmt == "protobuf":
        # not self-delimiting → forced octet-counting framing
        return OCTET_MIME, False
    if fmt in ("rfc5424", "rfc3164", "file"):
        return PLAIN_MIME, line_framing
    return PLAIN_MIME, line_framing


_BINARY_FMTS = {"avro", "protobuf"}  # encoded column carries latin-1 bytes


def _frame(encoded: list[str], line_framing: bool, delimiter: str,
           binary: bool) -> bytes:
    from .encoders import frame_octet_bytes
    to_bytes = (lambda s: s.encode("latin-1")) if binary \
        else (lambda s: s.encode("utf-8"))
    if line_framing:
        d = delimiter.encode("utf-8")
        return b"".join(to_bytes(e) + d for e in encoded)
    return b"".join(frame_octet_bytes(to_bytes(e)) for e in encoded)


def _encoded_stream(out_dir: str, sink: str, fmt: str,
                    n_messages: int) -> Iterator[list[str]]:
    """Scan one sink partition's stored passing rows and yield lists of
    up to ``n_messages`` records re-encoded in ``fmt`` (the store holds
    the protobuf wire encoding; each page decodes + re-encodes at
    request time, like httpserver.go getContentType → RMimeTypes)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.dataset as pds

    from .encoders import get_encoder
    from .encoders.vectorized import encode_batch
    from .protowire import decode_syslog_message

    data = pds.dataset(os.path.join(out_dir, "data"), partitioning="hive")
    scanner = data.scanner(
        columns=["encoded"],
        filter=(pc.field("sink") == sink)
        & (pc.field("status") == "passing"),
        batch_size=n_messages)
    per_row = get_encoder(fmt)
    for rb in scanner.to_batches():
        if rb.num_rows == 0:
            continue
        recs = [decode_syslog_message(w.encode("latin-1"))
                for w in rb.column("encoded").to_pylist()]
        tbl = pa.table({k: [r[k] for r in recs] for k in recs[0]})
        arr = encode_batch(fmt, tbl)
        if arr is not None:
            encoded = [e for e in arr.to_pylist() if e is not None]
        else:
            encoded = [e for e in (per_row(r) for r in recs)
                       if e is not None]
        if encoded:
            yield encoded


def pull_pages(out_dir: str, sink: str = "store", accept: str = "",
               fmt: str = "", n_messages: int = 8192,
               line_framing: bool = True,
               delimiter: str = "\n") -> Iterator[tuple[str, bytes]]:
    """Yield (content_type, body) response pages of up to ``n_messages``
    stored passing rows of one sink partition, re-encoded on demand in
    the fixed ``fmt`` or the Accept-negotiated format.

    Like the reference, the served partition holds the STORE encoding —
    a sink configured with ``encoder="protobuf"`` whose ``encoded``
    column carries SyslogMessage wire bytes (the reference's badger
    store holds exactly that; store/store.go:141-192) — and each page
    decodes + re-encodes at request time (httpserver.go getContentType
    → RMimeTypes encoder)."""
    if not fmt:
        fmt = R_MIMETYPES[negotiate(accept)]
    ctype, eff_line = page_content_type(fmt, n_messages, line_framing,
                                        delimiter)
    for encoded in _encoded_stream(out_dir, sink, fmt, n_messages):
        yield ctype, _frame(encoded, eff_line, delimiter,
                            fmt in _BINARY_FMTS)


def pull_messages(out_dir: str, sink: str = "store", accept: str = "",
                  fmt: str = "", n_messages: int = 8192) \
        -> Iterator[tuple[bool, bytes]]:
    """Per-MESSAGE stream for the websocket pull sink
    (store/dests/websocketserver.go:130-213 — one ws message per stored
    record): yields (is_binary, payload) pairs; is_binary selects the
    ws BinaryMessage opcode exactly when the format is protobuf/avro
    (websocketserver.go:54-59)."""
    if not fmt:
        fmt = R_MIMETYPES[negotiate(accept)]
    binary = fmt in _BINARY_FMTS
    for encoded in _encoded_stream(out_dir, sink, fmt, n_messages):
        for e in encoded:
            yield binary, e.encode("latin-1" if binary else "utf-8")


# ---------------------------------------------------------------------------
# RFC 6455 (websocket) server-side minimals — dependency-free, enough
# for the reference's streaming pull dest (websocketserver.go)
# ---------------------------------------------------------------------------

WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"
WS_TEXT, WS_BINARY, WS_CLOSE, WS_PING, WS_PONG = 0x1, 0x2, 0x8, 0x9, 0xA


def ws_accept_key(client_key: str) -> str:
    import base64
    import hashlib
    return base64.b64encode(hashlib.sha1(
        (client_key + WS_GUID).encode()).digest()).decode()


def ws_frame(payload: bytes, opcode: int) -> bytes:
    """One FIN server→client frame (servers never mask)."""
    hdr = bytearray([0x80 | opcode])
    n = len(payload)
    if n < 126:
        hdr.append(n)
    elif n < (1 << 16):
        hdr.append(126)
        hdr += n.to_bytes(2, "big")
    else:
        hdr.append(127)
        hdr += n.to_bytes(8, "big")
    return bytes(hdr) + payload


def ws_read_frame(rfile) -> tuple[int, bytes]:
    """Read one (client→server, masked) frame; returns (opcode,
    unmasked payload). Raises ConnectionError on EOF."""
    hdr = rfile.read(2)
    if len(hdr) < 2:
        raise ConnectionError("websocket peer closed")
    opcode = hdr[0] & 0x0F
    masked = hdr[1] & 0x80
    n = hdr[1] & 0x7F
    if n == 126:
        n = int.from_bytes(rfile.read(2), "big")
    elif n == 127:
        n = int.from_bytes(rfile.read(8), "big")
    mask = rfile.read(4) if masked else b""
    payload = rfile.read(n)
    if masked:
        payload = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
    return opcode, payload


class HttpPullServer:
    """Real-socket HTTP surface over ``pull_pages`` — the listener the
    reference's HTTP pull sink runs (store/dests/httpserver.go:36-140):
    a GET returns the NEXT page of stored messages in the
    Accept-negotiated (or fixed) format with the reference's
    content-type rules; an exhausted stream answers 204 No Content.

    Cursor identity (the reference keys its stream per client
    connection): a client-supplied ``X-Stream-Id`` header names the
    cursor explicitly (concurrent consumers MUST send distinct ids);
    without it the cursor keys on (client ip, Accept), so two hosts
    never share a stream and a keep-alive-less pager still resumes its
    own. Two id-less consumers on one ip with the same Accept share a
    cursor — send ``X-Stream-Id`` to isolate.

    Tap/test scale — bulk consumers read the parquet store directly.
    """

    def __init__(self, out_dir: str, sink: str = "store",
                 n_messages: int = 8192, host: str = "127.0.0.1",
                 port: int = 0, fmt: str = "", line_framing: bool = True,
                 delimiter: str = "\n"):
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        self._iters: dict = {}
        lock = threading.Lock()
        srv_self = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                if self.headers.get("Upgrade", "").lower() == "websocket":
                    self._serve_websocket()
                    return
                accept = self.headers.get("Accept", "")
                stream_id = self.headers.get("X-Stream-Id")
                key = stream_id if stream_id is not None \
                    else (self.client_address[0], accept)
                with lock:
                    it = srv_self._iters.get(key)
                    if it is None:
                        it = pull_pages(out_dir, sink=sink, accept=accept,
                                        fmt=fmt, n_messages=n_messages,
                                        line_framing=line_framing,
                                        delimiter=delimiter)
                        srv_self._iters[key] = it
                    try:
                        ctype, body = next(it)
                    except StopIteration:
                        self.send_response(204)
                        self.end_headers()
                        return
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _serve_websocket(self):
                """The websocket pull variant
                (store/dests/websocketserver.go): RFC6455 upgrade, then
                ONE ws message per stored record (TextMessage, or
                BinaryMessage for protobuf/avro —
                websocketserver.go:54-59), a normal-closure close frame
                with "bye!" when drained (writeLogs deferred close),
                and a bounded wait for the client's close echo."""
                key = self.headers.get("Sec-WebSocket-Key", "")
                if not key:
                    self.send_response(400)
                    self.end_headers()
                    return
                self.wfile.write(
                    b"HTTP/1.1 101 Switching Protocols\r\n"
                    b"Upgrade: websocket\r\nConnection: Upgrade\r\n"
                    b"Sec-WebSocket-Accept: "
                    + ws_accept_key(key).encode() + b"\r\n\r\n")
                accept = self.headers.get("Accept", "")
                for binary, payload in pull_messages(
                        out_dir, sink=sink, accept=accept, fmt=fmt,
                        n_messages=n_messages):
                    self.wfile.write(ws_frame(
                        payload, WS_BINARY if binary else WS_TEXT))
                # normal closure, status 1000 (websocketserver.go:135)
                self.wfile.write(ws_frame(
                    (1000).to_bytes(2, "big") + b"bye!", WS_CLOSE))
                self.wfile.flush()
                try:
                    self.connection.settimeout(2)
                    while True:
                        opcode, body = ws_read_frame(self.rfile)
                        if opcode == WS_CLOSE:
                            break
                        if opcode == WS_PING:
                            self.wfile.write(ws_frame(body, WS_PONG))
                except (OSError, ConnectionError):
                    pass
                self.close_connection = True

            def do_POST(self):  # pull sink is read-only
                self.send_response(405)
                self.end_headers()

        self._srv = ThreadingHTTPServer((host, port), Handler)
        self.address = self._srv.server_address
        self._thread = threading.Thread(target=self._srv.serve_forever,
                                        daemon=True)
        self._thread.start()

    def close(self) -> None:
        self._srv.shutdown()
        self._srv.server_close()
        self._thread.join(timeout=5)
