r"""RFC5424 decoder.

Semantics: the reference parses with a generated ANTLR grammar
(grammars/rfc5424/RFC5424.g4:1-43, listener at
decoders/rfc5424_format.go:25-240). Here: a hand-written header split +
structured-data state machine (NOT a port of the generated parser), same
observable behavior:

- ``-`` header fields → empty strings (rfc5424_format.go:136-192)
- timestamp ``-`` → TimeReported = now() (our ``ts`` column)
- SD ``[sid k="v" ...]`` with ``\\`` ``\"`` ``\]`` escapes → properties
  [sid][k] (G4 escape rules at :25,:41); repeated sid clears the domain
  first (ClearDomain, rfc5424_format.go:196-203)
- any malformed input → decode error (parse_ok=False record).
"""

from __future__ import annotations

import re

from .base import RecordBuilder
from .rfc3164 import _parse_rfc3339_ns
from ..schema import props_dumps

_HEAD_RE = re.compile(
    r"^<(\d{1,5})>(\d{1,2}) (\S+) (\S+) (\S+) (\S+) (\S+)"
)
_SD_NAME_RE = re.compile(r"[^ =\]\"]+")


def _parse_sd(s: str, pos: int):
    """Parse one-or-more [sid param="value"...] groups starting at pos.

    Returns (props dict, end pos) or None on malformed input.
    """
    props: dict[str, dict[str, str]] = {}
    n = len(s)
    while pos < n and s[pos] == "[":
        pos += 1
        m = _SD_NAME_RE.match(s, pos)
        if not m:
            return None
        sid = m.group(0)
        pos = m.end()
        props[sid] = {}  # ClearDomain on sid (re)entry
        while pos < n and s[pos] == " ":
            pos += 1
            m = _SD_NAME_RE.match(s, pos)
            if not m:
                return None
            name = m.group(0)
            pos = m.end()
            if pos >= n or s[pos] != "=":
                return None
            pos += 1
            if pos >= n or s[pos] != '"':
                return None
            pos += 1
            buf = []
            while pos < n:
                c = s[pos]
                if c == "\\" and pos + 1 < n and s[pos + 1] in ('\\', '"', ']'):
                    buf.append(s[pos + 1])
                    pos += 2
                elif c == '"':
                    break
                else:
                    buf.append(c)
                    pos += 1
            if pos >= n or s[pos] != '"':
                return None
            pos += 1
            props[sid][name] = "".join(buf)
        if pos >= n or s[pos] != "]":
            return None
        pos += 1
    return props, pos


def decode_one(line: str, ts_ns: int, out: RecordBuilder, row: int):
    m = _HEAD_RE.match(line)
    if not m:
        return out.add_error(row, line, ts_ns)
    pri = int(m.group(1))
    ver = int(m.group(2))
    ts_s, host, app, proc, msgid = m.group(3), m.group(4), m.group(5), m.group(6), m.group(7)

    if ts_s == "-":
        tr = ts_ns
    else:
        tr = _parse_rfc3339_ns(ts_s)
        if tr is None:
            return out.add_error(row, line, ts_ns)

    pos = m.end()
    # structured data: "-" or one-or-more [..] groups
    if pos < len(line) and line[pos] == " ":
        pos += 1
    else:
        return out.add_error(row, line, ts_ns)
    props = {}
    if line.startswith("-", pos):
        pos += 1
    elif pos < len(line) and line[pos] == "[":
        r = _parse_sd(line, pos)
        if r is None:
            return out.add_error(row, line, ts_ns)
        props, pos = r
    else:
        return out.add_error(row, line, ts_ns)

    msg = ""
    if pos < len(line):
        if line[pos] != " ":
            return out.add_error(row, line, ts_ns)
        msg = line[pos + 1:]

    def nil(x):
        return "" if x == "-" else x

    out.add(row, pri=pri, fac=pri // 8, sev=pri % 8, ver=ver, tr=tr, tg=ts_ns,
            host=nil(host), app=nil(app), proc=nil(proc), msgid=nil(msgid),
            msg=msg, props=props_dumps(props))


def decode_block(texts, ts_ns, out: RecordBuilder, cfg=None):
    for row, (line, n) in enumerate(zip(texts, ts_ns)):
        if not line:
            continue
        decode_one(line, n, out, row)
