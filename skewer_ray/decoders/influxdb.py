r"""InfluxDB line-protocol decoder (1 message per point).

Semantics: decoders/influxdb.go:13-95 — appname="influxdb", Message =
measurement, facility 16 / severity 6 / version 1, tags → properties
domain "influxdb_tags" (tag ``host`` also sets HostName), typed fields →
"influxdb_fields" with ``_integer/_float/_boolean/_string`` key suffixes
and Go-style value formatting (FormatFloat 'f' -1).

Deviation (documented): the reference sets ProcId to influx's
``point.HashID()`` — an influxdb-internal series hash; we leave ProcId
empty instead of reimplementing that hash.

Escapes (``\,`` ``\ `` ``\=`` in identifiers, ``\"`` in strings) are
handled; a malformed line is a decode error (InfluxDecodingError).
"""

from __future__ import annotations

from .base import RecordBuilder
from ..schema import props_dumps


def _split_unescaped(s: str, sep: str):
    if "\\" not in s:  # fast path: no escapes (the overwhelming case)
        return s.split(sep)
    parts, buf, i, n = [], [], 0, len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            buf.append(c)
            buf.append(s[i + 1])
            i += 2
            continue
        if c == sep:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(c)
        i += 1
    parts.append("".join(buf))
    return parts


def _split_top(s: str):
    """Top-level split on unescaped spaces OUTSIDE double-quoted string
    field values (influx allows spaces inside ``f="a b"``)."""
    if '"' not in s:
        return _split_unescaped(s, " ")
    parts, buf, in_q, i, n = [], [], False, 0, len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            buf.append(c)
            buf.append(s[i + 1])
            i += 2
            continue
        if c == '"':
            in_q = not in_q
            buf.append(c)
        elif c == " " and not in_q:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(c)
        i += 1
    parts.append("".join(buf))
    return parts


def _split_fields(s: str):
    """Field-part split on unescaped commas outside quoted values."""
    if '"' not in s:
        return _split_unescaped(s, ",")
    parts, buf, in_q, i, n = [], [], False, 0, len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            buf.append(c)
            buf.append(s[i + 1])
            i += 2
            continue
        if c == '"':
            in_q = not in_q
            buf.append(c)
        elif c == "," and not in_q:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(c)
        i += 1
    parts.append("".join(buf))
    return parts


def _unescape(s: str) -> str:
    return s.replace("\\,", ",").replace("\\ ", " ").replace("\\=", "=")


def _fmt_float(v: float) -> str:
    """Go strconv.FormatFloat(v, 'f', -1, 64): shortest decimal, no exponent."""
    s = repr(v)
    if "e" in s or "E" in s:
        s = format(v, ".17f").rstrip("0").rstrip(".")
    if s.endswith(".0"):
        s = s[:-2]
    return s


def decode_one(line: str, ts_ns: int, out: RecordBuilder, row: int):
    try:
        # measurement[,tag=v...] fields [timestamp]
        top = _split_top(line.strip())
        top = [t for t in top if t != ""]
        if len(top) < 2 or len(top) > 3:
            raise ValueError("bad segment count")
        key_part, field_part = top[0], top[1]
        tr = int(top[2]) if len(top) == 3 else ts_ns

        key_items = _split_unescaped(key_part, ",")
        measurement = _unescape(key_items[0])
        if not measurement:
            raise ValueError("empty measurement")
        tags, host = {}, ""
        for kv in key_items[1:]:
            k, _, v = kv.partition("=")
            if not k or not v:
                raise ValueError("bad tag")
            k, v = _unescape(k), _unescape(v)
            tags[k] = v
            if k == "host":
                host = v

        fields = {}
        for kv in _split_fields(field_part):
            k, eq, v = kv.partition("=")
            if not k or not eq:
                raise ValueError("bad field")
            k = _unescape(k)
            if v.startswith('"') and v.endswith('"') and len(v) >= 2:
                fields[k + "_string"] = v[1:-1].replace('\\"', '"')
            elif v.endswith(("i", "u")) and v[:-1].lstrip("+-").isdigit():
                fields[k + "_integer"] = str(int(v[:-1]))
            elif v in ("t", "T", "true", "True", "TRUE"):
                fields[k + "_boolean"] = "true"
            elif v in ("f", "F", "false", "False", "FALSE"):
                fields[k + "_boolean"] = "false"
            else:
                fields[k + "_float"] = _fmt_float(float(v))
    except (ValueError, IndexError):
        return out.add_error(row, line, ts_ns)

    props = {}
    if tags:
        props["influxdb_tags"] = tags
    if fields:
        props["influxdb_fields"] = fields
    out.add(row, pri=16 * 8 + 6, fac=16, sev=6, ver=1, tr=tr, tg=ts_ns,
            host=host, app="influxdb", msg=measurement,
            props=props_dumps(props))


def decode_block(texts, ts_ns, out: RecordBuilder, cfg=None):
    for row, (line, n) in enumerate(zip(texts, ts_ns)):
        if not line:
            continue
        decode_one(line, n, out, row)
