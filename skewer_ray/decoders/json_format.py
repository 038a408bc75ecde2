"""JSON-family decoders: RegularSyslog JSON and rsyslog JSON export.

Semantics: decoders/json_format.go:13-98 + model/types.go:210-242
(RegularSyslog.Internal). Unknown facility name → user(1)
(model/types.go:189-194); unknown severity name → info(6)
(model/types.go:199-206); Version forced to 1; priority recomputed.
"""

from __future__ import annotations

import json

from .base import RecordBuilder
from .rfc3164 import _parse_rfc3339_ns
from ..constants import facility_from_string, severity_from_string
from ..schema import props_dumps


def _fmt_value(v) -> str:
    """Go fmt %v for the JSON scalar types we can receive."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    if v is None:
        return "<nil>"
    return str(v)


def decode_json_one(line: str, ts_ns: int, out: RecordBuilder, row: int):
    try:
        d = json.loads(line)
        if not isinstance(d, dict):
            raise ValueError("not an object")
    except ValueError:
        return out.add_error(row, line, ts_ns)
    fac = facility_from_string(str(d.get("facility", "")))
    sev = severity_from_string(str(d.get("severity", "")))
    tr = _parse_rfc3339_ns(d["timereported"]) if d.get("timereported") else 0
    tg = _parse_rfc3339_ns(d["timegenerated"]) if d.get("timegenerated") else 0
    if tr is None or tg is None:
        return out.add_error(row, line, ts_ns)
    props = d.get("properties") or {}
    cleaned = {}
    for dom, kv in props.items():
        if isinstance(kv, dict):
            cleaned[str(dom)] = {str(k): str(v) for k, v in kv.items()}
    out.add(row, pri=fac * 8 + sev, fac=fac, sev=sev, ver=1, tr=tr, tg=tg,
            host=str(d.get("hostname", "")), app=str(d.get("appname", "")),
            proc=str(d.get("procid", "")), msgid=str(d.get("msgid", "")),
            msg=str(d.get("message", "")), props=props_dumps(cleaned))


def decode_rsyslog_one(line: str, ts_ns: int, out: RecordBuilder, row: int):
    """decoders/json_format.go:22-98: '-' ⇒ empty, pri string → fac/sev,
    '$!' bag → properties domain 'rsyslog' with %v-formatted values."""
    try:
        d = json.loads(line)
        if not isinstance(d, dict):
            raise ValueError("not an object")
    except ValueError:
        return out.add_error(row, line, ts_ns)
    try:
        pri = int(str(d.get("pri", "")))
    except ValueError:
        return out.add_error(row, line, ts_ns)

    tr = tg = ts_ns
    v = d.get("timereported", "")
    if v and v != "-":
        tr = _parse_rfc3339_ns(v)
        if tr is None:
            return out.add_error(row, line, ts_ns)
    v = d.get("timegenerated", "")
    if v and v != "-":
        tg = _parse_rfc3339_ns(v)
        if tg is None:
            return out.add_error(row, line, ts_ns)

    def nil_trim(key):
        x = str(d.get(key, ""))
        return "" if x == "-" else x.strip()

    props = d.get("$!") or {}
    rsys = {str(k).strip(): _fmt_value(v).strip() for k, v in props.items()} \
        if isinstance(props, dict) else {}
    out.add(row, pri=pri, fac=pri // 8, sev=pri % 8, ver=1, tr=tr, tg=tg,
            host=nil_trim("hostname"), app=nil_trim("app-name"),
            proc=nil_trim("procid"), msgid=nil_trim("msgid"),
            structured=nil_trim("structured-data"),
            msg=str(d.get("msg", "")).strip(),
            props=props_dumps({"rsyslog": rsys} if rsys else {}))


def decode_json_block(texts, ts_ns, out: RecordBuilder, cfg=None):
    for row, (line, n) in enumerate(zip(texts, ts_ns)):
        if not line:
            continue
        decode_json_one(line, n, out, row)


def decode_rsyslog_block(texts, ts_ns, out: RecordBuilder, cfg=None):
    for row, (line, n) in enumerate(zip(texts, ts_ns)):
        if not line:
            continue
        decode_rsyslog_one(line, n, out, row)
