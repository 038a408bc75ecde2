"""LTSV decoders.

The reference's LTSV decoder is an explicit stub returning no messages
(decoders/ltsv.go:5-7) — ``ltsv_stub`` keeps that parity. ``ltsv`` is our
real implementation (labeled tab-separated ``key:value`` pairs): ``time``
(RFC3339) → TimeReported, ``host`` → HostName, ``app`` → AppName,
``msg`` → Message, every other key → properties domain "ltsv";
facility=user(1), severity=info(6) since LTSV carries no PRI.
"""

from __future__ import annotations

from .base import RecordBuilder
from .rfc3164 import _parse_rfc3339_ns
from ..schema import props_dumps


def decode_stub_block(texts, ts_ns, out: RecordBuilder, cfg=None):
    """Reference parity: every line decodes to zero messages, no error."""
    return


def decode_one(line: str, ts_ns: int, out: RecordBuilder, row: int):
    host = app = msg = ""
    tr = ts_ns
    extra = {}
    for part in line.split("\t"):
        if not part:
            continue
        k, sep, v = part.partition(":")
        if not sep:
            return out.add_error(row, line, ts_ns)
        if k == "time":
            t = _parse_rfc3339_ns(v)
            if t is None:
                return out.add_error(row, line, ts_ns)
            tr = t
        elif k == "host":
            host = v
        elif k == "app":
            app = v
        elif k == "msg":
            msg = v
        else:
            extra[k] = v
    out.add(row, pri=14, fac=1, sev=6, tr=tr, tg=ts_ns, host=host, app=app,
            msg=msg, props=props_dumps({"ltsv": extra} if extra else {}))


def decode_block(texts, ts_ns, out: RecordBuilder, cfg=None):
    for row, (line, n) in enumerate(zip(texts, ts_ns)):
        if not line:
            continue
        decode_one(line, n, out, row)
