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
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.dataset as pds

    from .encoders import get_encoder
    from .encoders.vectorized import encode_batch
    from .protowire import decode_syslog_message

    if not fmt:
        fmt = R_MIMETYPES[negotiate(accept)]
    ctype, eff_line = page_content_type(fmt, n_messages, line_framing,
                                        delimiter)
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
            yield ctype, _frame(encoded, eff_line, delimiter,
                                fmt in _BINARY_FMTS)


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
