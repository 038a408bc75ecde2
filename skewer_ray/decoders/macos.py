"""macOS unified-log (``log stream --style json``) decoder
(services/macos/macoslogs.go:135-195).

The reference spawns ``log stream`` and decodes its JSON event array;
here the process plumbing is replaced by any line source feeding one
JSON event per row (NDJSON — the array framing is a socket/exec
concern). Field mapping is macoslogs.go parity:

- message = eventMessage, appname = processImagePath,
  procid = str(processID), facility user(1), severity info(6),
  version 1, msgid/structured empty
- hostname: the reference uses os.Hostname(); we use the constant
  "localhost" (same determinism deviation as encode_rfc3164)
- timeReported parses ``2006-01-02 15:04:05.000000-0700``; on failure
  falls back to timeGenerated (the ``ts`` column)
- properties domain "macos": category / processImageUUID / messageType
  / timezoneName / subsystem / senderImageUUID / senderImagePath when
  non-empty, plus processUniqueID / threadID / traceID / activityID /
  machTimestamp / senderProgramCounter always (stringified).
"""

from __future__ import annotations

import calendar
import json
from datetime import datetime, timezone

from .base import RecordBuilder

_OPTIONAL = ("category", "processImageUUID", "messageType",
             "timezoneName", "subsystem", "senderImageUUID",
             "senderImagePath")
_NUMERIC = ("processUniqueID", "threadID", "traceID", "activityID",
            "machTimestamp", "senderProgramCounter")
_TS_FMT = "%Y-%m-%d %H:%M:%S.%f%z"


def decode_block(texts, ts_ns, out: RecordBuilder, cfg=None):
    from ..schema import props_dumps
    for row, (line, n) in enumerate(zip(texts, ts_ns)):
        if not line:
            out.add_error(row, line, n)
            continue
        try:
            d = json.loads(line)
            if not isinstance(d, dict):
                raise ValueError("not an object")
        except Exception:
            out.add_error(row, line, n)
            continue
        try:
            dt = datetime.strptime(d.get("timestamp", ""), _TS_FMT)
            sec = calendar.timegm(dt.astimezone(timezone.utc).timetuple())
            tr = sec * 1_000_000_000 + dt.microsecond * 1000
        except ValueError:
            tr = n
        macos = {}
        for k in _OPTIONAL:
            v = d.get(k)
            if v:
                macos[k] = str(v)
        for k in _NUMERIC:
            macos[k] = str(int(d.get(k, 0)))
        out.add(
            row, pri=1 * 8 + 6, fac=1, sev=6, ver=1, tr=tr, tg=n,
            host="localhost",
            app=str(d.get("processImagePath", "")),
            proc=str(int(d.get("processID", 0))),
            msg=str(d.get("eventMessage", "")),
            props=props_dumps({"macos": macos}))
