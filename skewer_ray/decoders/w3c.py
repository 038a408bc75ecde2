"""W3C Extended Log Format decoder.

Semantics: decoders/w3c.go:14-43 — a decoder parameterized by configured
field names; every parsed field value lands in properties domain "w3c";
all other SyslogMessage fields stay at their zero values (the reference
builds the message with ``model.Factory()`` only). 1→N shape: a payload
may hold several lines; ``#`` directive lines are skipped; ``-`` values
are nil (omitted).
"""

from __future__ import annotations

import shlex

from .base import RecordBuilder
from ..schema import props_dumps


def decode_block(texts, ts_ns, out: RecordBuilder, cfg=None):
    fields = (cfg.w3c_fields if cfg and cfg.w3c_fields else "").split(" ")
    for row, (payload, n) in enumerate(zip(texts, ts_ns)):
        if not payload:
            continue
        sub = 0
        ok_any = False
        err = False
        for line in payload.splitlines():
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            try:
                vals = shlex.split(line) if '"' in line else line.split()
            except ValueError:
                err = True
                break
            props = {}
            for name, val in zip(fields, vals):
                if val != "-":
                    props[name] = val
            out.add(row, sub=sub, tr=0, tg=n,
                    props=props_dumps({"w3c": props} if props else {}))
            sub += 1
            ok_any = True
        if err:
            out.add_error(row, payload, n)
        elif not ok_any:
            pass  # empty payload → no messages, like parser.Next() EOF
