"""Dependency-free Avro binary encoding of the SyslogMessage record
(avro/syslogmessage.avsc; conversion semantics model/types.go:262-301).

No Avro library exists in this environment, so the binary encoding
(zigzag-varint lengths, length-prefixed UTF-8 strings, block-encoded
maps) is implemented directly against the reference's fixed schema —
ten string fields in .avsc order plus the two-level Properties map.
Maps are written as a single block in sorted key order (canonical; Avro
readers accept any block split, writers may choose one).

``decode_avro`` is the matching reader, used by the tests to prove the
bytes are self-consistent and by any consumer without an Avro runtime.
"""

from __future__ import annotations

from ..constants import FACILITIES, SEVERITIES
from ..schema import props_loads
from . import rfc3339nano_from_ns

FIELD_ORDER = ("Facility", "Severity", "TimeReported", "TimeGenerated",
               "Hostname", "Appname", "Procid", "Msgid", "Message")


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _varint(n: int) -> bytes:
    n = _zigzag(n)
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _string(s: str) -> bytes:
    b = s.encode("utf-8")
    return _varint(len(b)) + b


def _map(d: dict, value_enc) -> bytes:
    if not d:
        return _varint(0)
    out = bytearray(_varint(len(d)))
    for k in sorted(d):
        out += _string(k)
        out += value_enc(d[k])
    out += _varint(0)  # end-of-blocks marker
    return bytes(out)


def avro_fields(rec: dict) -> dict:
    """The all-string projection (model/types.go:262-284)."""
    fac, sev = rec["facility"], rec["severity"]
    return {
        "Facility": FACILITIES[fac] if 0 <= fac < len(FACILITIES) else "info",
        "Severity": SEVERITIES[sev] if 0 <= sev < len(SEVERITIES) else "info",
        "TimeReported": rfc3339nano_from_ns(rec["time_reported"]),
        "TimeGenerated": rfc3339nano_from_ns(rec["time_generated"]),
        "Hostname": rec["hostname"],
        "Appname": rec["appname"],
        "Procid": rec["procid"],
        "Msgid": rec["msgid"],
        "Message": rec["message"],
    }


def encode_avro(rec: dict) -> bytes | None:
    f = avro_fields(rec)
    out = bytearray()
    for name in FIELD_ORDER:
        out += _string(f[name])
    props = props_loads(rec["properties"])
    out += _map(props, lambda inner: _map(inner, _string))
    return bytes(out)


# --- matching reader (tests / avro-less consumers) -------------------------


def _read_varint(buf: bytes, pos: int):
    shift = n = 0
    while True:
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (n >> 1) ^ -(n & 1), pos


def _read_string(buf: bytes, pos: int):
    ln, pos = _read_varint(buf, pos)
    return buf[pos:pos + ln].decode("utf-8"), pos + ln


def _read_map(buf: bytes, pos: int, value_dec):
    out = {}
    while True:
        cnt, pos = _read_varint(buf, pos)
        if cnt == 0:
            return out, pos
        if cnt < 0:  # negative count: block byte size follows (spec)
            _sz, pos = _read_varint(buf, pos)
            cnt = -cnt
        for _ in range(cnt):
            k, pos = _read_string(buf, pos)
            v, pos = value_dec(buf, pos)
            out[k] = v


def decode_avro(buf: bytes) -> dict:
    rec = {}
    pos = 0
    for name in FIELD_ORDER:
        rec[name], pos = _read_string(buf, pos)
    def inner(b, p):
        return _read_map(b, p, _read_string)
    rec["Properties"], pos = _read_map(buf, pos, inner)
    assert pos == len(buf), "trailing bytes"
    return rec
