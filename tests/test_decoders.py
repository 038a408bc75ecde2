"""Table-driven decoder unit tests mirroring the reference fallback
ladders (decoders/rfc3164_format.go:28-194, rfc5424_format.go, etc.)."""

import json

import pytest

from skewer_ray.decoders import DecoderConfig, RecordBuilder, get_decoder
from skewer_ray.decoders import register_custom_parser

TS = 1768435200 * 1_000_000_000  # 2026-01-15T00:00:00Z


def decode(fmt: str, line: str, **cfg):
    out = RecordBuilder()
    dec = get_decoder(DecoderConfig(format=fmt, **cfg))
    dec([line], [TS], out, DecoderConfig(format=fmt, **cfg))
    recs = []
    for i in range(len(out)):
        recs.append({k: getattr(out, k)[i] for k in out.__slots__})
    return recs


def one(fmt, line, **cfg):
    recs = decode(fmt, line, **cfg)
    assert len(recs) == 1, recs
    return recs[0]


# --- rfc3164 ladder (rfc3164_format.go) -----------------------------------

def test_3164_full_old_stamp():
    r = one("rfc3164", "<34>Jan 15 05:10:02 host01 app[4321]: body words")
    assert (r["priority"], r["facility"], r["severity"]) == (34, 4, 2)
    assert r["hostname"] == "host01"
    assert r["appname"] == "app" and r["procid"] == "4321"
    assert r["message"] == "body words"
    assert r["time_reported"] == TS + (5 * 3600 + 10 * 60 + 2) * 10**9


def test_3164_rfc3339():
    r = one("rfc3164", "<34>2026-01-15T05:10:02+00:00 host01 app: body")
    assert r["hostname"] == "host01" and r["appname"] == "app"
    assert r["time_reported"] == TS + (5 * 3600 + 10 * 60 + 2) * 10**9


def test_rfc3339_go_parity():
    """_parse_rfc3339_ns mirrors Go time.Parse(RFC3339Nano): full ns
    precision kept, loose ISO forms fromisoformat accepts rejected."""
    from skewer_ray.decoders.rfc3164 import _parse_rfc3339_ns as p
    base = 1768453802  # 2026-01-15T05:10:02Z
    assert p("2026-01-15T05:10:02Z") == base * 10**9
    assert p("2026-01-15T05:10:02.123456789Z") == base * 10**9 + 123456789
    assert p("2026-01-15T05:10:02.5Z") == base * 10**9 + 500000000
    # >9 fraction digits: extra digits dropped (Go keeps ns)
    assert p("2026-01-15T05:10:02.1234567891Z") == base * 10**9 + 123456789
    assert p("2026-01-15T05:10:02+02:00") == (base - 7200) * 10**9
    for bad in ("2026-01-15t05:10:02Z",      # lowercase t
                "2026-01-15 05:10:02Z",      # space separator
                "2026-01-15T05:10:02z",      # lowercase z
                "2026-01-15T05:10:02,123Z",  # comma fraction
                "2026-01-15T05:10:02+0200",  # offset without colon
                "2026-01-15T05:10:02",       # no offset
                "2026-02-30T05:10:02Z"):     # invalid calendar date
        assert p(bad) is None, bad


def test_3164_no_pri():
    r = one("rfc3164", "plain message no pri")
    assert r["priority"] == 0 and r["message"] == "plain message no pri"
    assert r["time_reported"] == TS and r["time_generated"] == TS


def test_3164_pri_only():
    r = one("rfc3164", "<34>")
    assert (r["priority"], r["facility"], r["severity"]) == (34, 4, 2)
    assert r["message"] == "" and r["time_reported"] == 0


def test_3164_bad_pri():
    r = one("rfc3164", "<999x>oops 1")
    assert r["priority"] == 0 and r["message"] == "<999x>oops 1"


def test_3164_unchecked_pri_range():
    # strconv.Atoi accepts any int; no range check (rfc3164_format.go:50-56)
    r = one("rfc3164", "<999>Jan 15 05:10:02 h app: m")
    assert r["priority"] == 999 and r["facility"] == 124 and r["severity"] == 7


def test_3164_ipv4_hostname_sniff():
    r = one("rfc3164", "<34>Jan 15 05:10:02 10.0.0.1 app[1]:")
    assert r["hostname"] == "10.0.0.1"
    assert r["appname"] == "app" and r["procid"] == "1"


def test_3164_tag_no_hostname():
    r = one("rfc3164", "<34>Jan 15 05:10:02 app[7]: msg here now")
    # s[0] contains "[]:" ⇒ hostname omitted
    assert r["hostname"] == "" and r["appname"] == "app" and r["procid"] == "7"
    assert r["message"] == "msg here now"


def test_3164_single_token_message():
    r = one("rfc3164", "<34>Jan 15 05:10:02 lonely")
    assert r["message"] == "lonely" and r["hostname"] == ""


def test_3164_two_plain_tokens():
    r = one("rfc3164", "<34>Jan 15 05:10:02 first second")
    # no tag chars anywhere → appname/message branch
    assert r["appname"] == "first" and r["message"] == "second"


# --- rfc5424 ----------------------------------------------------------------

def test_5424_full_sd():
    r = one("rfc5424",
            '<165>1 2026-01-15T05:10:02Z host01 app01 4321 ID47 '
            '[ex@32473 k="v" q="a\\]b"] turn body')
    assert (r["priority"], r["facility"], r["severity"], r["version"]) == (165, 20, 5, 1)
    assert r["hostname"] == "host01" and r["appname"] == "app01"
    assert r["procid"] == "4321" and r["msgid"] == "ID47"
    assert r["message"] == "turn body"
    props = json.loads(r["properties"])
    assert props == {"ex@32473": {"k": "v", "q": "a]b"}}


def test_5424_all_nil():
    r = one("rfc5424", "<34>1 - - - - - - body")
    assert r["hostname"] == "" and r["appname"] == "" and r["msgid"] == ""
    assert r["time_reported"] == TS  # '-' timestamp → now() (our ts)
    assert r["message"] == "body"


def test_5424_no_message():
    r = one("rfc5424", "<34>1 2026-01-15T05:10:02Z h a p m -")
    assert r["message"] == "" and r["parse_ok"]


def test_5424_sd_escapes():
    r = one("rfc5424", '<34>1 - h a p m [s x="a\\\\b\\"c"]')
    assert json.loads(r["properties"]) == {"s": {"x": 'a\\b"c'}}


def test_5424_malformed():
    r = one("rfc5424", "<34>not valid at all")
    assert not r["parse_ok"]
    r = one("rfc5424", "<34>1 BADTIME h a p m - msg")
    assert not r["parse_ok"]


def test_5424_repeated_sid_cleared():
    # ClearDomain on sid re-entry (rfc5424_format.go:196-203)
    r = one("rfc5424", '<34>1 - h a p m [s a="1"][s b="2"]')
    assert json.loads(r["properties"]) == {"s": {"b": "2"}}


# --- JSON family ------------------------------------------------------------

def test_json_regular():
    line = json.dumps({"facility": "auth", "severity": "crit",
                       "timereported": "2026-01-15T05:10:02Z",
                       "timegenerated": "2026-01-15T05:10:02Z",
                       "hostname": "h", "appname": "a", "procid": "p",
                       "msgid": "m", "message": "hello",
                       "properties": {"d": {"k": "v"}}})
    r = one("json", line)
    assert (r["facility"], r["severity"], r["priority"], r["version"]) == (4, 2, 34, 1)
    assert json.loads(r["properties"]) == {"d": {"k": "v"}}


def test_json_unknown_names_default():
    # unknown facility → user(1); unknown severity → info(6)
    r = one("json", '{"facility":"nope","severity":"nope"}')
    assert r["facility"] == 1 and r["severity"] == 6


def test_json_invalid():
    r = one("json", "{nope")
    assert not r["parse_ok"] and r["message"] == "{nope"


def test_rsyslog():
    line = ('{"msg":" padded ","pri":"22","hostname":"vm","app-name":"spamd",'
            '"procid":"6948","msgid":"-","structured-data":"-",'
            '"timereported":"2026-01-15T05:10:02Z","$!":{"pid":6948,"b":true}}')
    r = one("rsyslogjson", line)
    assert (r["priority"], r["facility"], r["severity"]) == (22, 2, 6)
    assert r["message"] == "padded" and r["msgid"] == ""
    assert json.loads(r["properties"]) == {"rsyslog": {"pid": "6948", "b": "true"}}


def test_rsyslog_bad_pri():
    r = one("rsyslogjson", '{"msg":"x","pri":"abc"}')
    assert not r["parse_ok"]


# --- GELF -------------------------------------------------------------------

def test_gelf_underscore_quirk():
    line = ('{"version":"1.1","host":"h","short_message":"s","timestamp":100,'
            '"level":6,"_appname":"x","_other":"y"}')
    r = one("gelf", line)
    # reference quirk: _-extras never populate AppName (gelf.go:58-72 vs
    # go-gelf message.go:80-87) — they land in properties with the underscore
    assert r["appname"] == ""
    assert json.loads(r["properties"])["gelf"] == {"_appname": "x", "_other": "y"}
    assert r["severity"] == 6 and r["facility"] == 1 and r["version"] == 1
    assert r["time_reported"] == 100 * 10**9


def test_gelf_facility_string():
    r = one("gelf", '{"host":"h","short_message":"s","facility":"cron"}')
    assert r["facility"] == 15


def test_gelf_bad_type():
    r = one("gelf", '{"host":5,"short_message":"s"}')
    assert not r["parse_ok"]


# --- influx -----------------------------------------------------------------

def test_influx_typed_fields():
    r = one("influxdb", "cpu,host=h01,region=eu usage_idle=92.5,count=4i,"
                        'name="x",up=true 1767244202000000000')
    assert r["appname"] == "influxdb" and r["message"] == "cpu"
    assert r["hostname"] == "h01"
    assert (r["facility"], r["severity"], r["version"]) == (16, 6, 1)
    assert r["time_reported"] == 1767244202000000000
    p = json.loads(r["properties"])
    assert p["influxdb_tags"] == {"host": "h01", "region": "eu"}
    assert p["influxdb_fields"] == {"usage_idle_float": "92.5",
                                    "count_integer": "4",
                                    "name_string": "x", "up_boolean": "true"}


def test_influx_no_timestamp():
    r = one("influxdb", "cpu value=1.5")
    assert r["time_reported"] == TS


def test_influx_malformed():
    r = one("influxdb", "cpu")
    assert not r["parse_ok"]


# --- w3c / ltsv / custom ----------------------------------------------------

def test_w3c():
    recs = decode("w3c", "2026-01-15 05:10:02 GET /x 200\n#comment\n"
                         "2026-01-15 05:10:03 POST /y -",
                  w3c_fields="date time cs-method cs-uri sc-status")
    assert len(recs) == 2
    p0 = json.loads(recs[0]["properties"])["w3c"]
    assert p0 == {"date": "2026-01-15", "time": "05:10:02",
                  "cs-method": "GET", "cs-uri": "/x", "sc-status": "200"}
    p1 = json.loads(recs[1]["properties"])["w3c"]
    assert "sc-status" not in p1  # '-' ⇒ nil field omitted
    assert recs[1]["sub_idx"] == 1


def test_ltsv_stub_parity():
    # decoders/ltsv.go:5-7 returns no messages
    assert decode("ltsv_stub", "a:b\tc:d") == []


def test_ltsv_real():
    r = one("ltsv", "time:2026-01-15T00:00:00Z\thost:h\tapp:a\tmsg:m\textra:e")
    assert r["hostname"] == "h" and r["appname"] == "a" and r["message"] == "m"
    assert json.loads(r["properties"]) == {"ltsv": {"extra": "e"}}


def test_custom_parser():
    register_custom_parser("zog_t", lambda line, ts: (
        {"app": line.split("|")[1], "msg": line.split("|")[2]}
        if line.startswith("ZOG|") else None))
    r = one("custom", "ZOG|a|b", custom_parser="zog_t")
    assert r["appname"] == "a" and r["message"] == "b"
    r = one("custom", "nope", custom_parser="zog_t")
    assert not r["parse_ok"]


def test_charset_wrapper():
    raw = "<34>Jan 15 05:10:02 hôte app: café".encode("latin-1")
    out = RecordBuilder()
    dec = get_decoder(DecoderConfig(format="rfc3164", charset="latin-1"))
    dec([raw], [TS], out, None)
    assert out.message[0] == "café" and out.hostname[0] == "hôte"


# ---------------------------------------------------------------------------
# collectd binary protocol (decoders/collectd.go:19-95)
# ---------------------------------------------------------------------------

def test_collectd_packet_roundtrip():
    import json
    from skewer_ray.decoders import RecordBuilder, get_decoder, DecoderConfig
    from skewer_ray.decoders.collectd import encode_packet
    pkt = encode_packet("db01", 1_700_000_000, [
        ("cpu", "percent", [("gauge", 42.5)]),
        ("interface", "eth0", "if_octets", "", [("derive", -3),
                                                ("counter", 9)]),
    ], interval_s=10)
    b = RecordBuilder()
    dec = get_decoder(DecoderConfig(format="collectd"))
    dec([pkt.decode("latin-1")], [0], b, DecoderConfig(format="collectd"))
    assert len(b) == 2  # one record per values part
    assert b.hostname == ["db01", "db01"]
    assert b.appname == ["collectd", "collectd"]
    # reference parity: procid = plugin, facility user(1), severity info
    assert b.procid == ["cpu", "interface"]
    assert b.facility == [1, 1] and b.severity == [6, 6]
    assert b.time_reported[0] == 1_700_000_000 * 1_000_000_000
    # message = canonical value-list JSON
    m0 = json.loads(b.message[0])
    assert m0["values"] == [42.5] and m0["dsnames"] == ["value"]
    assert m0["interval"] == 10.0 and m0["plugin"] == "cpu"
    m1 = json.loads(b.message[1])
    # if_octets resolves DS names through the embedded types.db
    assert m1["dsnames"] == ["rx", "tx"]
    assert m1["dstypes"] == ["derive", "counter"]
    assert m1["plugin_instance"] == "eth0"
    # properties: gauge/derive domains named via types.db; counter skipped
    p0 = json.loads(b.properties[0])
    assert p0["gauge"] == {"value": "42.500"}
    assert p0["collectd"] == {"type": "percent"}
    p1 = json.loads(b.properties[1])
    assert p1["derive"] == {"rx": "-3"}
    assert "counter" not in p1
    assert p1["collectd"] == {"plugin_instance": "eth0",
                              "type": "if_octets"}
    assert b.sub_idx == [0, 1]


def test_collectd_truncated_packet_single_error_row():
    """A packet failing mid-parse yields ONE error row, no partial
    records (every turn accounted exactly once)."""
    from skewer_ray.decoders import RecordBuilder, get_decoder, DecoderConfig
    from skewer_ray.decoders.collectd import encode_packet
    import struct
    pkt = encode_packet("h", 1, [("cpu", "cpu", [("gauge", 1.0)])])
    # append a values part claiming 2 values but carrying bytes for one
    payload = struct.pack(">H", 2) + b"\x01\x01" + b"\x00" * 8
    bad = pkt + struct.pack(">HH", 0x0006, 4 + len(payload)) + payload
    b = RecordBuilder()
    cfg = DecoderConfig(format="collectd")
    get_decoder(cfg)([bad.decode("latin-1")], [7], b, cfg)
    assert len(b) == 1
    assert b.parse_ok == [False]


def test_collectd_garbage_is_error():
    from skewer_ray.decoders import RecordBuilder, get_decoder, DecoderConfig
    b = RecordBuilder()
    cfg = DecoderConfig(format="collectd")
    get_decoder(cfg)(["not a packet"], [5], b, cfg)
    assert b.parse_ok == [False]


# ---------------------------------------------------------------------------
# protobuf slot (decoders/protobuf.go:8-16; JSON stand-in wire)
# ---------------------------------------------------------------------------

def test_protobuf_decoder_direct_fields():
    import json as _json
    from skewer_ray.decoders import RecordBuilder, get_decoder, DecoderConfig
    msg = _json.dumps({
        "Priority": 165, "Facility": 20, "Severity": 5, "Version": 1,
        "TimeReportedNum": 123, "TimeGeneratedNum": 456,
        "HostName": "h", "AppName": "a", "ProcId": "9", "MsgId": "m",
        "Message": "payload", "Properties": {"d": {"k": "v"}},
    })
    b = RecordBuilder()
    cfg = DecoderConfig(format="protobuf")
    get_decoder(cfg)([msg, "{bad"], [0, 0], b, cfg)
    assert b.parse_ok == [True, False]
    assert (b.priority[0], b.facility[0], b.severity[0]) == (165, 20, 5)
    assert b.time_reported[0] == 123 and b.hostname[0] == "h"
    assert _json.loads(b.properties[0]) == {"d": {"k": "v"}}


def test_rfc5424_vec_parity_with_per_row():
    """decode_block_vec + fallback == pure decode_block over generated
    lines AND the adversarial edge corpus (field-for-field)."""
    import numpy as np
    import pyarrow as pa
    from skewer_ray.decoders import RecordBuilder
    from skewer_ray.decoders.rfc5424 import decode_block, decode_block_vec
    from skewer_ray.gen import generate_table, family_of_conv, conv_index
    from skewer_ray.pipelines.edge_corpus import EDGE_5424, NOW_S

    tbl = generate_table(3000)
    fams = [family_of_conv(conv_index(c))
            for c in tbl["conv_id"].to_pylist()]
    lines = [t for t, f in zip(tbl["text"].to_pylist(), fams)
             if f in (0, 1)]
    lines += [c[0] for c in EDGE_5424]
    ns = np.array([NOW_S * 10**9] * len(lines), dtype=np.int64)

    ref = RecordBuilder()
    decode_block(lines, ns.tolist(), ref)

    cols, fb = decode_block_vec(pa.array(lines, pa.string()), ns)
    got = {}
    fields = ("parse_ok", "priority", "facility", "severity", "version",
              "time_reported", "time_generated", "hostname", "appname",
              "procid", "msgid", "structured", "message", "properties")
    if cols is not None:
        ridx = cols.pop("row_idx")
        for k, r in enumerate(ridx):
            got[int(r)] = tuple(
                cols[f][k].as_py() for f in fields)
    fbb = RecordBuilder()
    decode_block([lines[i] for i in fb],
                 [int(ns[i]) for i in fb], fbb)
    for k, local in enumerate(fbb.row_idx):
        got[fb[local]] = tuple(getattr(fbb, f)[k] for f in fields)

    want = {ref.row_idx[k]: tuple(getattr(ref, f)[k] for f in fields)
            for k in range(len(ref))}
    assert got == want
    assert len(want) == len(lines)  # nothing silently dropped


def test_rfc3164_vec_parity_with_per_row():
    """3164 vec fast path + fallback == pure ladder over generated
    (families 2,3,4) and edge-corpus lines."""
    import numpy as np
    import pyarrow as pa
    from skewer_ray.decoders.rfc3164 import decode_block, decode_block_vec
    from skewer_ray.gen import generate_table, family_of_conv, conv_index
    from skewer_ray.pipelines.edge_corpus import EDGE_3164, NOW_S

    tbl = generate_table(6000)
    fams = [family_of_conv(conv_index(c))
            for c in tbl["conv_id"].to_pylist()]
    lines = [t for t, f in zip(tbl["text"].to_pylist(), fams)
             if f in (2, 3, 4)]
    lines += [c[0] for c in EDGE_3164]
    lines += ["<34>Jan 15 05:10:02 host app msg",       # tagless 3-token
              "<34>Feb 30 12:00:00 host app[1]: m",     # bad date
              "<34>Jan 15 05:10:02 host app[1]:",       # 2-token quirk
              "<34>Jan  4 05:10:02 host a.b-c[x7]: m1  m2",
              "  <13>Jan 15 05:10:02 h t[1]: padded  "]
    ns = np.array([NOW_S * 10**9] * len(lines), dtype=np.int64)

    ref = RecordBuilder()
    decode_block(lines, ns.tolist(), ref)

    cols, fb = decode_block_vec(pa.array(lines, pa.string()), ns)
    got = {}
    fields = ("parse_ok", "priority", "facility", "severity", "version",
              "time_reported", "time_generated", "hostname", "appname",
              "procid", "msgid", "structured", "message", "properties")
    if cols is not None:
        ridx = cols.pop("row_idx")
        for k, r in enumerate(ridx):
            got[int(r)] = tuple(cols[f][k].as_py() for f in fields)
    fbb = RecordBuilder()
    decode_block([lines[i] for i in fb], [int(ns[i]) for i in fb], fbb)
    for k, local in enumerate(fbb.row_idx):
        got[fb[local]] = tuple(getattr(fbb, f)[k] for f in fields)

    want = {ref.row_idx[k]: tuple(getattr(ref, f)[k] for f in fields)
            for k in range(len(ref))}
    assert got == want
    assert len(want) == len(lines)
    assert cols is not None and len(got) - len(fb) > 0  # fast path used


def test_macos_log_stream_decode():
    """macOS unified-log JSON mapping (macoslogs.go:135-195 parity)."""
    line = ('{"timestamp":"2026-01-15 05:10:02.123456+0100",'
            '"eventMessage":"hello","processImagePath":"/usr/bin/x",'
            '"processID":42,"messageType":"Error","subsystem":"com.a.b",'
            '"category":"net","threadID":7,"traceID":21,"activityID":3,'
            '"machTimestamp":99,"processUniqueID":1234,'
            '"senderProgramCounter":5}')
    r = one("macos", line)
    assert (r["priority"], r["facility"], r["severity"], r["version"]) == \
        (14, 1, 6, 1)
    assert r["hostname"] == "localhost"
    assert r["appname"] == "/usr/bin/x" and r["procid"] == "42"
    assert r["message"] == "hello"
    # +0100 → UTC 04:10:02.123456
    assert r["time_reported"] == \
        (1768435200 + 4 * 3600 + 600 + 2) * 10**9 + 123456000
    p = json.loads(r["properties"])["macos"]
    assert p["subsystem"] == "com.a.b" and p["category"] == "net"
    assert p["threadID"] == "7" and p["machTimestamp"] == "99"
    # bad timestamp → falls back to ts; bad JSON → error row
    r2 = one("macos", '{"timestamp":"nope","eventMessage":"m"}')
    assert r2["time_reported"] == TS and r2["parse_ok"]
    r3 = one("macos", "not json")
    assert not r3["parse_ok"]
