"""Live TCP/RELP client destinations — real sockets behind the batch
fan-out's per-sink semantics.

TCP (store/dests/tcpdest.go:83-107): TCP has no application-level ack,
so the reference ACKs message N-1 only when the write of message N
succeeds (the ``previousUid`` ratchet); an encoding failure is a
PermError for that uid, a write failure NACKs BOTH the current and the
pending previous uid (either may sit in a lost kernel buffer). The
last message stays PENDING even across a clean ``flush()`` close (a
half-close doesn't prove receipt) — at-least-once, never
at-most-once; ``ack_on_close=True`` opts in to the looser rule.

RELP (store/dests/relpdest.go): windowed sends tagged with txnr; the
server's ``rsp`` answers ack (200→ACK) or reject (500→NACK) each txnr
individually, possibly out of order.

These are tap/test-scale surfaces (the bulk batch contract stays
parquet); statuses come back as a uid→status dict the lineage layer
can fold into its manifest exactly like the parquet sinks' counts.
"""

from __future__ import annotations

import socket

from .encoders import BINARY_ENCODERS, frame_octet, frame_relp, get_encoder

ACK, NACK, PERMERROR, PENDING = "ack", "nack", "permerror", "pending"


class TcpClientSink:
    """Connect-once TCP client with the reference's lazy-ack ratchet.

    ``ack_on_close=True`` opts in to converting the last pending uid to
    ACK on a clean shutdown — OFF by default because a successful
    half-close does not prove the peer received the bytes (the message
    can sit in a lost kernel buffer); the reference leaves it PENDING
    for redelivery (store/dests/tcpdest.go:83-107)."""

    def __init__(self, address, encoder: str = "rfc5424",
                 line_framing: bool = True, delimiter: str = "\n",
                 ack_on_close: bool = False):
        self._encode = get_encoder(encoder)
        self._binary = encoder in BINARY_ENCODERS
        self._line = line_framing
        self._delim = delimiter
        self._ack_on_close = ack_on_close
        self._sock = socket.create_connection(address)
        self._pending_uid = None

    def send_rows(self, rows: list[dict]) -> dict:
        """Encode+frame+write each record; returns uid→status."""
        status: dict = {}
        for rec in rows:
            uid = rec["uid"]
            payload = self._encode(rec)
            if payload is None:          # encoding error → PermError
                status[uid] = PERMERROR
                continue
            if self._line:
                wire = payload + self._delim
            else:
                wire = frame_octet(payload, binary=self._binary)
            try:
                self._sock.sendall(wire.encode(
                    "latin-1" if self._binary else "utf-8"))
            except OSError:
                status[uid] = NACK
                if self._pending_uid is not None:
                    status[self._pending_uid] = NACK
                    self._pending_uid = None
                return status
            # the write that SUCCEEDS acks the previous message
            if self._pending_uid is not None:
                status[self._pending_uid] = ACK
            self._pending_uid = uid
            status[uid] = PENDING
        return status

    def flush(self) -> dict:
        """Graceful close. The ratchet's last uid stays PENDING (the
        reference's leave-pending-for-redelivery rule: a clean
        half-close does not prove delivery), unless the sink was built
        with ``ack_on_close=True``; a failed shutdown NACKs it."""
        out = {}
        try:
            self._sock.shutdown(socket.SHUT_WR)
            if self._pending_uid is not None:
                out[self._pending_uid] = ACK if self._ack_on_close \
                    else PENDING
                self._pending_uid = None
        except OSError:
            if self._pending_uid is not None:
                out[self._pending_uid] = NACK
                self._pending_uid = None
        finally:
            self._sock.close()
        return out


class RelpClientSink:
    """RELP client: open handshake, windowed syslog frames, per-txnr
    acks read back from the server (200→ACK, 500→NACK).

    ``window`` bounds the frames in flight: after ``window`` unacked
    sends the client drains one rsp before sending more. Without the
    bound, a large batch deadlocks — the server blocks writing acks the
    client isn't reading while the client blocks in sendall (both
    socket buffers full)."""

    def __init__(self, sock: socket.socket, encoder: str = "rfc5424",
                 window: int = 128):
        from .sources.relp import RelpStreamParser
        self._encode = get_encoder(encoder)
        self._binary = encoder in BINARY_ENCODERS
        self._sock = sock
        self._window = max(1, window)
        self._txnr = 1
        self._sock.sendall(
            frame_relp(self._txnr, "open",
                       "relp_version=0\ncommands=syslog").encode())
        # answers share the request frame grammar (TXNR CMD LEN [DATA]
        # LF; the open ack's DATA embeds newlines) — reuse the server's
        # incremental parser instead of line splitting
        self._parser = RelpStreamParser()
        self._frames: list = []
        self._read_rsp()  # the open ack

    def _read_rsp(self):
        """Read one ``TXNR rsp LEN DATA`` answer; returns (txnr, code)."""
        while not self._frames:
            chunk = self._sock.recv(4096)
            if not chunk:
                raise ConnectionError("RELP server closed")
            self._frames.extend(self._parser.feed(chunk))
        fr = self._frames.pop(0)
        code = int(fr.data[:3]) if fr.data[:3].isdigit() else 200
        return fr.txnr, code

    def send_rows(self, rows: list[dict]) -> dict:
        status: dict = {}
        txnr_to_uid: dict[int, str] = {}
        outstanding = 0
        for rec in rows:
            uid = rec["uid"]
            payload = self._encode(rec)
            if payload is None:
                status[uid] = PERMERROR
                continue
            # real send window: drain one rsp per send past the bound
            # so neither side's socket buffer can fill up
            if outstanding >= self._window:
                txnr, code = self._read_rsp()
                status[txnr_to_uid[txnr]] = ACK if code == 200 else NACK
                outstanding -= 1
            self._txnr += 1
            txnr_to_uid[self._txnr] = uid
            self._sock.sendall(
                frame_relp(self._txnr, "syslog", payload,
                           binary=self._binary)
                .encode("latin-1" if self._binary else "utf-8"))
            outstanding += 1
        # drain the tail: one rsp per in-flight frame, any order
        for _ in range(outstanding):
            txnr, code = self._read_rsp()
            status[txnr_to_uid[txnr]] = ACK if code == 200 else NACK
        return status

    def close(self):
        self._txnr += 1
        try:
            self._sock.sendall(frame_relp(self._txnr, "close", "").encode())
            self._read_rsp()  # wait for serverclose before tearing down
        except (OSError, ConnectionError):
            pass
        finally:
            self._sock.close()
