"""Direct SyslogMessage deserialization (decoders/protobuf.go:8-16).

The reference unmarshals a protobuf-encoded ``SyslogMessage`` as-is (no
field mapping). This container has no protobuf runtime / generated
schema, so the v0 wire stand-in is the canonical JSON projection of the
same message type — the *proto field names* (model/types.pb.go:72-86):
``Priority Facility Severity Version TimeReportedNum TimeGeneratedNum
HostName AppName ProcId MsgId Structured Message Properties`` — which is
lossless against the record schema. Swapping in real protobuf later only
changes the ``loads`` call.
"""

from __future__ import annotations

import json

from .base import RecordBuilder


def decode_block(texts, ts_ns, out: RecordBuilder, cfg=None):
    from ..schema import props_dumps
    for row, (line, n) in enumerate(zip(texts, ts_ns)):
        if not line:
            # empty input still accounts for its turn exactly once
            out.add_error(row, line, n)
            continue
        try:
            d = json.loads(line)
            if not isinstance(d, dict):
                raise ValueError("not an object")
        except Exception:
            out.add_error(row, line, n)
            continue
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
