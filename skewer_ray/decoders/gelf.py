"""GELF decoder.

Semantics: decoders/gelf.go:11-90 over go-gelf's UnmarshalJSON
(vendor .../gelf/message.go:75-114). Faithful quirks:

- go-gelf stores extras WITH their ``_`` prefix, so the reference's
  ``Extra["appname"]``/``["procid"]``/``["msgid"]``/``["facility"]``
  lookups (gelf.go:58-72) can never match a spec-conforming ``_``-key —
  AppName/ProcId/MsgId stay empty and every ``_*`` extra lands in the
  properties domain "gelf" (with the underscore).
- facility comes only from a top-level ``facility`` string; absent → 1
  (gelf.go:50-56). severity = level. Version = 1. TimeReported =
  timestamp (float seconds) × 1e9.
- a non-string typed known field is an unmarshal error (message.go:109-111).
"""

from __future__ import annotations

import json

from .base import RecordBuilder
from ..constants import facility_from_string
from ..schema import props_dumps

_STR_FIELDS = ("version", "host", "short_message", "full_message", "facility")


def decode_one(line: str, ts_ns: int, out: RecordBuilder, row: int):
    try:
        d = json.loads(line)
        if not isinstance(d, dict):
            raise ValueError("not an object")
    except ValueError:
        return out.add_error(row, line, ts_ns)

    for k in _STR_FIELDS:
        if k in d and not isinstance(d[k], str):
            return out.add_error(row, line, ts_ns)
    for k in ("timestamp", "level"):
        if k in d and not isinstance(d[k], (int, float)) or isinstance(d.get(k), bool):
            return out.add_error(row, line, ts_ns)

    extras = {k: v for k, v in d.items() if k.startswith("_")}
    sev = int(d.get("level", 0))
    fac_s = d.get("facility", "")
    fac = facility_from_string(fac_s) if fac_s else 1
    tr = int(float(d.get("timestamp", 0.0)) * 1_000_000_000)

    gelf_props = {}
    if d.get("full_message"):
        gelf_props["full"] = d["full_message"]
    for k, v in extras.items():
        if isinstance(v, str):
            gelf_props[k] = v
        else:
            gelf_props[k] = str(v)  # fmt %v-ish for scalars
    out.add(row, pri=fac * 8 + sev, fac=fac, sev=sev, ver=1, tr=tr, tg=ts_ns,
            host=d.get("host", ""), msg=d.get("short_message", ""),
            props=props_dumps({"gelf": gelf_props} if gelf_props else {}))


def decode_block(texts, ts_ns, out: RecordBuilder, cfg=None):
    for row, (line, n) in enumerate(zip(texts, ts_ns)):
        if not line:
            continue
        decode_one(line, n, out, row)
