"""RELP server source: real-socket framing + the ordered-ack window.

The reference accepts RELP connections, parses frames
(`utils/split.go:249` RelpSplit: ``TXNR SP COMMAND SP DATALEN[ SP
DATA]\\n``), forwards syslog payloads into the parse/store path, and
answers ``TXNR rsp 6 200 OK`` / ``TXNR rsp 6 500 KO`` — with the hard
requirement that acks go out **strictly monotonically by txnr** even
though downstream processing completes out of order
(`services/network/relp.go:405-476`, the "Cooking" re-ordering loop).

Batch mapping: the engine's per-partition lineage manifest plays the
durable-ack role (state/manifest.py); THIS module supplies the live
socket surface — an incremental frame parser, the ack re-ordering
window, and a minimal per-connection server loop — so the ordered-ack
semantics are testable end to end over a real socket
(tests/test_relp.py). Frames that survive the protocol layer feed the
same transcript row shape as sources/rawlog.py.
"""

from __future__ import annotations

import socket
from dataclasses import dataclass


@dataclass
class RelpFrame:
    txnr: int
    command: str
    data: bytes


class RelpParseError(ValueError):
    pass


class RelpStreamParser:
    """Incremental RELP frame parser: feed() arbitrary byte chunks,
    collect complete frames (the streaming equivalent of RelpSplit —
    partial frames stay buffered until the rest arrives)."""

    def __init__(self, max_data: int = 132_000):
        self._buf = b""
        self.max_data = max_data

    def feed(self, chunk: bytes) -> list[RelpFrame]:
        self._buf += chunk
        frames: list[RelpFrame] = []
        while True:
            fr = self._try_parse_one()
            if fr is None:
                return frames
            frames.append(fr)

    # a complete header is TXNR(≤10 digits) SP COMMAND(≤32) SP
    # DATALEN(≤10 digits) — anything longer without its two spaces is
    # garbage, bounded so a malformed stream can't buffer unboundedly
    MAX_HEADER = 64

    def _try_parse_one(self) -> RelpFrame | None:
        buf = self._buf
        # header: TXNR SP COMMAND SP DATALEN
        parts = buf.split(b" ", 2)
        if len(parts) < 3:
            if len(buf) > self.MAX_HEADER:
                raise RelpParseError("unframed garbage")
            return None
        txnr_b, command_b, rest = parts
        if not txnr_b.isdigit():
            raise RelpParseError(f"bad txnr {txnr_b!r}")
        if not command_b or len(command_b) > 32 or \
                not all(0x61 <= c <= 0x7a for c in command_b):
            # commands are lowercase ASCII words (open/syslog/close/
            # rsp/serverclose/abort); anything else must surface as a
            # protocol error, never a UnicodeDecodeError
            raise RelpParseError(f"bad command {command_b[:32]!r}")
        # DATALEN terminates at SP (data follows) or LF (datalen 0)
        dl_end = 0
        while dl_end < len(rest) and rest[dl_end:dl_end + 1].isdigit():
            dl_end += 1
        if dl_end == 0:
            if rest:  # first byte present and not a digit → malformed,
                # raise instead of waiting forever for "more" bytes
                raise RelpParseError(f"bad datalen start {rest[:1]!r}")
            return None
        if dl_end == len(rest):
            if dl_end > 10:
                raise RelpParseError("bad datalen")
            return None  # digits may continue in the next chunk
        datalen = int(rest[:dl_end])
        if datalen > self.max_data:
            raise RelpParseError(f"frame too large: {datalen}")
        sep = rest[dl_end:dl_end + 1]
        if datalen == 0:
            if sep != b"\n":
                raise RelpParseError("datalen 0 must end with LF")
            consumed = len(txnr_b) + 1 + len(command_b) + 1 + dl_end + 1
            self._buf = buf[consumed:]
            return RelpFrame(int(txnr_b), command_b.decode("ascii"), b"")
        if sep != b" ":
            raise RelpParseError("missing SP before data")
        need = dl_end + 1 + datalen + 1  # DATALEN SP DATA LF
        if len(rest) < need:
            return None
        data = rest[dl_end + 1:dl_end + 1 + datalen]
        if rest[need - 1:need] != b"\n":
            raise RelpParseError("missing frame trailer")
        consumed = len(txnr_b) + 1 + len(command_b) + 1 + need
        self._buf = buf[consumed:]
        return RelpFrame(int(txnr_b), command_b.decode("ascii"), data)


class RelpAckWindow:
    """The relp.go:405-476 "Cooking" loop as a data structure: results
    arrive per-txnr in ANY order; release() returns the acks that may
    be written now — the maximal run of consecutive received txnrs
    starting at the lowest un-acked one. rsyslog requires this
    monotonic order; a missing txnr blocks everything behind it."""

    def __init__(self):
        self._done: dict[int, bool] = {}
        self._received: list[int] = []   # txnr arrival order = commit order
        self._next_pos = 0

    def received(self, txnr: int) -> None:
        """Frame accepted from the wire (forwarder.Received)."""
        self._received.append(txnr)

    def complete(self, txnr: int, ok: bool) -> list[tuple[int, bool]]:
        """Processing finished for txnr (ForwardSucc/ForwardFail);
        returns [(txnr, ok)] acks now releasable, in commit order."""
        self._done[txnr] = ok
        out: list[tuple[int, bool]] = []
        while self._next_pos < len(self._received):
            nxt = self._received[self._next_pos]
            if nxt not in self._done:
                break
            out.append((nxt, self._done.pop(nxt)))
            self._next_pos += 1
        return out

    @property
    def pending(self) -> int:
        return len(self._received) - self._next_pos


RSP_OK = b"%d rsp 6 200 OK\n"          # relp.go:396
RSP_KO = b"%d rsp 6 500 KO\n"          # relp.go:401
RSP_SERVERCLOSE = b"%d rsp 0\n0 serverclose 0\n"  # relp.go:625


def serve_relp_connection(conn: socket.socket, process,
                          completion_order=None) -> list[RelpFrame]:
    """Minimal per-connection RELP server loop over a REAL socket:
    open → offers echo, syslog → process() with ordered acks, close →
    serverclose. Returns the accepted syslog frames (the rows a
    Datasource stage would emit).

    ``process(frame) -> bool`` decides 200 vs 500 per payload.
    ``completion_order`` (a permutation fn over a frame list) simulates
    out-of-order downstream completion — results still reach the
    client in txnr order through RelpAckWindow, which is the property
    under test."""
    parser = RelpStreamParser()
    window = RelpAckWindow()
    accepted: list[RelpFrame] = []
    open_seen = False
    batch: list[RelpFrame] = []

    def flush_batch() -> None:
        frames = batch[:]
        batch.clear()
        if completion_order is not None:
            frames = completion_order(frames)
        for fr in frames:
            for txnr, ok in window.complete(fr.txnr, process(fr)):
                conn.sendall((RSP_OK if ok else RSP_KO) % txnr)

    while True:
        chunk = conn.recv(4096)
        if not chunk:
            return accepted
        for fr in parser.feed(chunk):
            if fr.command == "open":
                open_seen = True
                # echo the client's offers back (relp.go:632)
                conn.sendall(b"%d rsp %d 200 OK\n%s\n"
                             % (fr.txnr, len(fr.data) + 7, fr.data))
            elif fr.command == "syslog":
                if not open_seen:
                    raise RelpParseError("syslog before open")
                window.received(fr.txnr)
                accepted.append(fr)
                batch.append(fr)
            elif fr.command == "close":
                flush_batch()
                try:
                    conn.sendall(RSP_SERVERCLOSE % fr.txnr)
                except OSError:
                    pass  # client already gone = EOF (relp.go HasFileClosed)
                return accepted
            else:
                raise RelpParseError(f"unknown command {fr.command}")
        flush_batch()
