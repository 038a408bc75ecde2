"""HTTP server source — POST bodies → framed messages → rows.

Mirrors the reference's HTTP source handler
(services/network/httpserver.go:314-410): POST only (anything else →
400); ``disable_multiple`` mode treats the whole trimmed body as ONE
message (400 when empty or over ``max_message_size``); multi mode
splits the body on ``frame_delimiter`` (whitespace delimiters →
TrimSpace per frame; custom delimiters → trim the delimiter then
spaces), rejects empty / too-many / too-large payloads with 400, and
answers **201 Created only after every message of the request is
accepted** (the tracker.wait() ack barrier — here acceptance is
synchronous row production).

Rows come out transcript-shaped (one conv per request) so the batch
pipeline ingests them via ``ray.data.from_arrow`` exactly like the
file/socket sources.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa

from .sockets import _rows_table


class HttpLogSource:
    """Minimal live HTTP ingest surface (test/tap scale — the batch
    contract for bulk data remains parquet)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 frame_delimiter: str = "\n",
                 disable_multiple: bool = False,
                 max_body: int = 1 << 20,
                 max_messages: int = 0,
                 max_message_size: int = 65536):
        self._tables: list[pa.Table] = []
        self._lock = threading.Lock()
        self._req_no = 0
        src = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet test output
                pass

            def do_GET(self):  # non-POST → 400 (httpserver.go:325-329)
                self.send_response(400)
                self.end_headers()

            do_PUT = do_DELETE = do_HEAD = do_GET

            def do_POST(self):
                try:
                    length = int(self.headers.get("Content-Length", "0"))
                except ValueError:
                    length = -1
                # negative Content-Length would make read(-1) block
                # until client EOF with no size bound — reject it too
                if not 0 <= length <= max_body:
                    self.send_response(400)
                    self.end_headers()
                    return
                body = self.rfile.read(length)
                frames = src._frames(body)
                if frames is None:
                    self.send_response(400)
                    self.end_headers()
                    return
                with src._lock:
                    conv = f"http-{src._req_no}"
                    src._req_no += 1
                    src._tables.append(_rows_table(conv, frames))
                # ack AFTER all messages are accepted (tracker barrier)
                self.send_response(201)
                self.end_headers()

        self._delim = frame_delimiter
        self._single = disable_multiple
        self._max_messages = max_messages
        self._max_message_size = max_message_size
        self._srv = ThreadingHTTPServer((host, port), Handler)
        self.address = self._srv.server_address
        self._thread = threading.Thread(target=self._srv.serve_forever,
                                        daemon=True)
        self._thread.start()

    def _frames(self, body: bytes) -> list[bytes] | None:
        """None → reject with 400 (reference's error ladder)."""
        if self._single:
            msg = body.strip()
            if not msg or (self._max_message_size and
                           len(msg) > self._max_message_size):
                return None
            return [msg]
        delim = self._delim.encode()
        if self._delim in (" ", "\n", "\r", "\r\n"):
            def trim(b: bytes) -> bytes:
                return b.strip()
        else:
            def trim(b: bytes) -> bytes:
                return b.strip(delim).strip()
        frames = []
        for part in body.split(delim):
            part = trim(part)
            if self._max_message_size and len(part) > self._max_message_size:
                return None
            if part:
                frames.append(part)
        if not frames:
            return None
        if self._max_messages and len(frames) > self._max_messages:
            return None
        return frames

    def rows(self) -> pa.Table:
        """All accepted messages so far as one transcript-shaped table."""
        with self._lock:
            if not self._tables:
                return _rows_table("http-empty", [])
            return pa.concat_tables(self._tables)

    def close(self) -> None:
        self._srv.shutdown()
        self._srv.server_close()
        self._thread.join(timeout=5)
