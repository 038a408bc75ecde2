"""Adversarial RFC5424 / RFC3164 edge corpus with a HAND-WRITTEN oracle.

Each case is (input line, expected record), the expectation derived by
hand from the reference grammar (grammars/rfc5424/RFC5424.g4:1-43) and
the rfc3164 fallback ladder (decoders/rfc3164_format.go:40-165) —
multiple SD elements, SD escapes, nil-everything, IPv6-ish hostnames,
repeated SD-ids (ClearDomain), fractional/offset timestamps, degenerate
priorities, the ladder's tag-from-s[0] quirk, invalid dates. The engine
side runs the REAL decoders over the lines; the DuckDB oracle is the
literal expectation table — so the decoders are pinned against ground
truth, not against themselves.

``tr=None`` means the decoder falls back to the transcript ``ts``
(NOW_NS); parse errors carry the raw line in ``message``.
"""

from __future__ import annotations

NOW_S = 1769904000          # 2026-02-01T00:00:00Z — the "now" ts column
NOW_NS = NOW_S * 10**9
T = "2026-01-15T05:10:02Z"
T_NS = 1768453802 * 10**9


def _ok(line, pri, ver, tr, host="", app="", proc="", msgid="", msg="",
        props="{}"):
    return (line, dict(ok=True, pri=pri, fac=pri // 8, sev=pri % 8,
                       ver=ver, tr=tr, host=host, app=app, proc=proc,
                       msgid=msgid, msg=msg, props=props))


def _err(line):
    return (line, dict(ok=False, pri=0, fac=0, sev=0, ver=0, tr=NOW_NS,
                       host="", app="", proc="", msgid="", msg=line,
                       props="{}"))


# --- RFC5424 (grammar-derived) --------------------------------------------

EDGE_5424 = [
    # multiple SD elements, params in order
    _ok(f'<34>1 {T} host app 123 ID [a@1 k="v"][b@2 x="y" z="w"] msg body',
        34, 1, T_NS, "host", "app", "123", "ID", "msg body",
        '{"a@1":{"k":"v"},"b@2":{"x":"y","z":"w"}}'),
    # the three SD escapes \" \\ \] (G4 :25,:41)
    _ok(r'<34>1 ' + T + r' host app - - [ex@1 k="a\"b\\c\]d"]',
        34, 1, T_NS, "host", "app", "", "",
        props='{"ex@1":{"k":"a\\"b\\\\c]d"}}'),
    # nil everything, no msg
    _ok("<0>1 - - - - - -", 0, 1, None),
    # trailing space → empty (present) msg
    _ok(f"<191>1 {T} - app - - - ", 191, 1, T_NS, "", "app", "", "", ""),
    # bracketed IPv6 hostname is PRINTUSASCII
    _ok(f"<34>1 {T} [2001:db8::1] app - - - msg",
        34, 1, T_NS, "[2001:db8::1]", "app", "", "", "msg"),
    # fractional seconds + numeric offset
    _ok("<34>1 2026-01-15T05:10:02.123456+02:00 host app - - - msg",
        34, 1, 1768446602123456000, "host", "app", "", "", "msg"),
    # version 2 (grammar: NONZERODIGIT DIGIT*)
    _ok(f"<34>2 {T} host app - - - future version",
        34, 2, T_NS, "host", "app", "", "", "future version"),
    # UTF-8 message body
    _ok(f"<34>1 {T} host app - - - héllo 世界",
        34, 1, T_NS, "host", "app", "", "", "héllo 世界"),
    # repeated SD-ID clears the domain (rfc5424_format.go:196-203)
    _ok(f'<34>1 {T} h a - - [x@1 k="1"][x@1 j="2"] m',
        34, 1, T_NS, "h", "a", "", "", "m", '{"x@1":{"j":"2"}}'),
    # unquoted param value → malformed SD → decode error
    _err(f"<34>1 {T} h a - - [x@1 k=v] m"),
    # missing SD field entirely → decode error (SD is mandatory)
    _err(f"<34>1 {T} h a - -"),
    # internal double spaces preserved in MSG
    _ok(f"<34>1 {T} host app proc msgid - m1 m2  m3",
        34, 1, T_NS, "host", "app", "proc", "msgid", "m1 m2  m3"),
    # PRI is not range-checked (matches the reference's Atoi)
    _ok(f"<999>1 {T} - - - - -", 999, 1, T_NS),
    # nil hostname with non-nil SD
    _ok(f'<5>1 {T} - app - - [o@9 a="b"] x',
        5, 1, T_NS, "", "app", "", "", "x", '{"o@9":{"a":"b"}}'),
    # empty param value
    _ok(f'<34>1 {T} h a - - [e@1 v=""] m',
        34, 1, T_NS, "h", "a", "", "", "m", '{"e@1":{"v":""}}'),
    # version 0 and 3-digit version: grammar is DIGIT+ → Atoi, no
    # NONZERODIGIT / 2-digit cap (RFC5424.g4:13, rfc5424_format.go:124-134)
    _ok(f"<34>0 {T} h a - - - m", 34, 0, T_NS, "h", "a", "", "", "m"),
    _ok(f"<34>123 {T} h a - - - m", 34, 123, T_NS, "h", "a", "", "", "m"),
    # leading zeros in PRI: Atoi("001") = 1
    _ok(f"<001>1 {T} h a - - - m", 1, 1, T_NS, "h", "a", "", "", "m"),
    # SP+ separators between every header field (grammar headr :4)
    _ok(f"<34>1  {T}   h  a  -  -  -   msg",
        34, 1, T_NS, "h", "a", "", "", "msg"),
    # (SP+ msg)? absorbs every leading space before MSG
    _ok(f"<34>1 {T} h a - - -  x", 34, 1, T_NS, "h", "a", "", "", "x"),
    # lowercase 't' separator: grammar would lex it, but the listener's
    # time.Parse(RFC3339) rejects it (rfc5424_format.go:146) → error
    _err("<34>1 2026-01-15t05:10:02Z h a - - - m"),
    # comma fraction: RFC3339 requires '.', Go Parse rejects ','
    _err("<34>1 2026-01-15T05:10:02,123Z h a - - - m"),
    # offset without colon: Go RFC3339 layout requires ±HH:MM
    _err("<34>1 2026-01-15T05:10:02+0200 h a - - - m"),
    # unescaped brackets are fine inside MSG (msg: .*?)
    _ok(f'<34>1 {T} h a - - [x@1 k="v"] arr[3]=y ]',
        34, 1, T_NS, "h", "a", "", "", "arr[3]=y ]",
        '{"x@1":{"k":"v"}}'),
    # '=' and '"' are legal hostname chars (grammar hostname :15)
    _ok(f'<34>1 {T} h="q a - - - m', 34, 1, T_NS, 'h="q', "a", "", "", "m"),
    # 10-digit zero-padded PRI: Atoi strips zeros, value fits int32
    _ok(f"<0000000034>1 {T} h a - - - m", 34, 1, T_NS, "h", "a", "", "", "m"),
    # PRI above int32: rejected (documented deviation — Go would
    # silently wrap the int→int32 conversion)
    _err(f"<4294967296>1 {T} h a - - - m"),
    # SD present, no MSG at all → (SP+ msg)? absent, empty message
    _ok(f'<34>1 {T} h a - - [x@1 k="v"]',
        34, 1, T_NS, "h", "a", "", "", "", '{"x@1":{"k":"v"}}'),
    # duplicate param name inside one element: last wins (Go map
    # assignment in SetProperty)
    _ok(f'<34>1 {T} h a - - [x@1 k="1" k="2"] m',
        34, 1, T_NS, "h", "a", "", "", "m", '{"x@1":{"k":"2"}}'),
    # SD-ID with no params is a valid (empty) element
    _ok(f'<34>1 {T} h a - - [x@1] m',
        34, 1, T_NS, "h", "a", "", "", "m", '{"x@1":{}}'),
    # mixed parameterized + empty elements
    _ok(f'<34>1 {T} h a - - [x@1 k="v"][y@2] m',
        34, 1, T_NS, "h", "a", "", "", "m",
        '{"x@1":{"k":"v"},"y@2":{}}'),
    # procid without hostname/appname
    _ok(f"<34>1 {T} - - 99 - - m", 34, 1, T_NS, "", "", "99", "", "m"),
    # TAB is not a separator (grammar SP = 0x20): preserved inside MSG
    _ok(f"<34>1 {T} h a - - - a\tb",
        34, 1, T_NS, "h", "a", "", "", "a\tb"),
    # leap second: Go's time package has none — Parse rejects :60
    _err("<34>1 2026-01-15T05:10:60Z h a - - - m"),
    # >9 fractional digits: parsed, truncated to nanoseconds
    _ok("<34>1 2026-01-15T05:10:02.123456789012Z h a - - - m",
        34, 1, 1768453802123456789, "h", "a", "", "", "m"),
]

# --- RFC3164 fallback ladder ----------------------------------------------


def _lad(line, pri, tr, host="", app="", proc="", msg=""):
    return (line, dict(ok=True, pri=pri, fac=pri // 8, sev=pri % 8,
                       ver=0, tr=tr, host=host, app=app, proc=proc,
                       msgid="", msg=msg, props="{}"))


_J4_NS = 1767503402 * 10**9      # 2026-01-04T05:10:02Z (year from NOW)
_J15_NS = T_NS                   # 2026-01-15T05:10:02Z

EDGE_3164 = [
    # classic with Go's space-padded "Jan _2" day
    _lad("<34>Jan  4 05:10:02 host app[42]: body here",
         34, _J4_NS, "host", "app", "42", "body here"),
    # stamp then tag-only (no hostname)
    _lad("<34>Jan 15 05:10:02 app[42]: body",
         34, _J15_NS, "", "app", "42", "body"),
    # no PRI at all → message-only record stamped now
    _lad("plain message no pri", 0, NOW_NS, msg="plain message no pri"),
    # bare PRI, nothing else → zero time
    _lad("<34>", 34, 0),
    # non-numeric PRI → message-only
    _lad("<999x>oops", 0, NOW_NS, msg="<999x>oops"),
    # RFC3339 timestamp variant
    _lad(f"<34>{T} host app: msg", 34, T_NS, "host", "app", "", "msg"),
    # IPv4 hostname + tag + msg
    _lad(f"<34>{T} 10.1.2.3 app: msg", 34, T_NS, "10.1.2.3", "app", "",
         "msg"),
    # two tokens, first contains ':' → parsed as TAG (ladder quirk,
    # rfc3164_format.go:147-165 / parseTag strip(':'))
    _lad(f"<34>{T} ::1 msg", 34, T_NS, "", "1", "", "msg"),
    # >32-char tag is NOT truncated by the ladder
    _lad("<34>Jan 15 05:10:02 host "
         "averyveryverylongtagnamethatexceedsthirtytwo: msg",
         34, _J15_NS, "host",
         "averyveryverylongtagnamethatexceedsthirtytwo", "", "msg"),
    # invalid calendar date → whole rest becomes the message, now-stamped
    _lad("<13>Feb 30 12:00:00 host app: msg", 13, NOW_NS,
         msg="Feb 30 12:00:00 host app: msg"),
    # leading digit that is not a timestamp → message, now-stamped
    _lad("<34>1 h a: m", 34, NOW_NS, msg="1 h a: m"),
    # tag without procid, 3+ tokens
    _lad("<34>Jan 15 05:10:02 host app: one two three",
         34, _J15_NS, "host", "app", "", "one two three"),
    # procid with no closing bracket (parseTag strips ':' first, then
    # the j<0 branch takes everything after '[')
    _lad("<34>Jan 15 05:10:02 host app[77: m",
         34, _J15_NS, "host", "app", "77", "m"),
    # stamp only → time, nothing else
    _lad("<34>Jan 15 05:10:02", 34, _J15_NS),
    # priority 0 boundary
    _lad("<0>Jan 15 05:10:02 host app: m", 0, _J15_NS, "host", "app",
         "", "m"),
    # empty procid brackets: parseTag j>i with nothing between
    _lad("<34>Jan 15 05:10:02 host app[]: m",
         34, _J15_NS, "host", "app", "", "m"),
    # two tokens, neither tag-like: fallthrough treats s[0] as TAG (not
    # hostname) and s[1] as the message (rfc3164_format.go:160-163)
    _lad("<34>Jan 15 05:10:02 host justaword",
         34, _J15_NS, "", "host", "", "justaword"),
    # two tokens where only s[1] is tag-like: the kept reference BUG
    # parses the tag from s[0] while s[0] also stays the hostname, and
    # s[1] is dropped (rfc3164_format.go:147-152)
    _lad("<34>Jan 15 05:10:02 host app: ",
         34, _J15_NS, "host", "host", "", ""),
    # space inside the PRI digits → Atoi fails → message-only
    _lad("<3 4>oops", 0, NOW_NS, msg="<3 4>oops"),
]


def q_parse_edge_syslog(sf_dir: str):
    """Run the real rfc5424/rfc3164 decoders over the edge corpus; one
    output row per case. ``sf_dir`` is unused (the corpus is fixed) but
    kept for the uniform query signature."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from ..decoders import DecoderConfig
    from ..stages.parse import ParseStage

    def make_ds(cases, fmt, base):
        tbl = pa.table({
            "conv_id": pa.array([f"edge-{fmt}"] * len(cases)),
            "turn_idx": pa.array(range(base, base + len(cases)),
                                 pa.int32()),
            "role": pa.array([""] * len(cases)),
            "text": pa.array([c[0] for c in cases]),
            "tool": pa.array([""] * len(cases)),
            "ts": pa.array([NOW_S * 10**6] * len(cases),
                           pa.timestamp("us")),
        })
        stage = ParseStage(single=DecoderConfig(format=fmt))

        def proj(batch: pa.Table) -> pa.Table:
            b = stage(batch)
            return pa.table({
                "case_idx": pc.cast(b["turn_idx"], pa.int64()),
                "parse_ok": b["parse_ok"],
                "priority": b["priority"],
                "facility": b["facility"],
                "severity": b["severity"],
                "version": b["version"],
                "hostname": b["hostname"],
                "appname": b["appname"],
                "procid": b["procid"],
                "msgid": b["msgid"],
                "message": b["message"],
                "properties": b["properties"],
                "time_reported": pc.cast(
                    pc.divide(b["time_reported"], 1000),
                    pa.timestamp("us")),
            })

        return rd.from_arrow(tbl).map_batches(proj, batch_format="pyarrow")

    return make_ds(EDGE_5424, "rfc5424", 0).union(
        make_ds(EDGE_3164, "rfc3164", 100))


def _sql_lit(v) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"


def edge_oracle_sql() -> str:
    """The hand-written expectation table as literal SQL."""
    rows = []
    for base, cases in ((0, EDGE_5424), (100, EDGE_3164)):
        for k, (_line, e) in enumerate(cases):
            tr = e["tr"] if e["tr"] is not None else NOW_NS
            rows.append(
                "(" + ", ".join([
                    str(base + k), _sql_lit(e["ok"]), str(e["pri"]),
                    str(e["fac"]), str(e["sev"]), str(e["ver"]),
                    _sql_lit(e["host"]), _sql_lit(e["app"]),
                    _sql_lit(e["proc"]), _sql_lit(e["msgid"]),
                    _sql_lit(e["msg"]), _sql_lit(e["props"]),
                    f"make_timestamp({tr // 1000})",
                ]) + ")")
    return ("SELECT * FROM (VALUES\n" + ",\n".join(rows)
            + ") AS t(case_idx, parse_ok, priority, facility, severity, "
              "version, hostname, appname, procid, msgid, message, "
              "properties, time_reported)")
