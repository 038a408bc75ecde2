"""Direct SyslogMessage deserialization (decoders/protobuf.go:8-16).

The reference unmarshals a protobuf-encoded ``SyslogMessage`` as-is (no
field mapping). The wire codec is a dependency-free hand-rolled
implementation of the exact gogo layout (skewer_ray/protowire.py,
mirroring model/types.pb.go:598-678) — binary payloads are carried
latin-1 in the transcript ``text`` column. Lines starting with ``{``
are accepted as the legacy JSON stand-in (proto field names) for
back-compat with v0 fixtures.
"""

from __future__ import annotations

import json

from .base import RecordBuilder
from ..protowire import decode_syslog_message


def _decode_json_standin(line: str, n: int, out: RecordBuilder, row: int):
    from ..schema import props_dumps
    try:
        d = json.loads(line)
        if not isinstance(d, dict):
            raise ValueError("not an object")
    except Exception:
        out.add_error(row, line, n)
        return
    props = d.get("Properties") or {}
    out.add(
        row,
        pri=int(d.get("Priority", 0)),
        fac=int(d.get("Facility", 0)),
        sev=int(d.get("Severity", 0)),
        ver=int(d.get("Version", 0)),
        tr=int(d.get("TimeReportedNum", n)),
        tg=int(d.get("TimeGeneratedNum", n)),
        host=d.get("HostName", ""),
        app=d.get("AppName", ""),
        proc=d.get("ProcId", ""),
        msgid=d.get("MsgId", ""),
        structured=d.get("Structured", ""),
        msg=d.get("Message", ""),
        props=props_dumps(props) if props else "{}",
    )


def decode_block(texts, ts_ns, out: RecordBuilder, cfg=None):
    for row, (line, n) in enumerate(zip(texts, ts_ns)):
        if not line:
            # empty input still accounts for its turn exactly once
            out.add_error(row, line, n)
            continue
        if isinstance(line, str) and line.lstrip().startswith("{"):
            _decode_json_standin(line, n, out, row)
            continue
        data = line if isinstance(line, (bytes, bytearray)) \
            else line.encode("latin-1", errors="replace")
        try:
            rec = decode_syslog_message(data)
        except Exception:
            out.add_error(row, str(line)[:200], n)
            continue
        out.add(
            row,
            pri=rec["priority"], fac=rec["facility"], sev=rec["severity"],
            ver=rec["version"],
            tr=rec["time_reported"] or n, tg=rec["time_generated"] or n,
            host=rec["hostname"], app=rec["appname"], proc=rec["procid"],
            msgid=rec["msgid"], structured=rec["structured"],
            msg=rec["message"], props=rec["properties"],
        )
