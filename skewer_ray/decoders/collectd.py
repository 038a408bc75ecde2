"""collectd binary network-protocol decoder (decoders/collectd.go:19-95).

Parses the part-based packet format (collectd network.h): each part is
``type:u16be len:u16be payload``. String parts carry NUL-terminated
text; the values part carries ``n:u16be | n type bytes | n 8-byte
values`` with counter(0)/absolute(3) as u64be, derive(2) as i64be,
gauge(1) as f64le.

Record mapping mirrors pCollectd exactly (decoders/collectd.go:52-92):
- facility user(1), severity info(6) → priority 14
- hostname = identifier host, appname "collectd", procid = plugin
- message = the value list's canonical JSON (collectd's JSON export
  shape; deviation: the reference marshals via collectd.org/api whose
  float formatting is Go-specific — we define gauge/time/interval as
  %.3f and derive/counter as integers so the DuckDB oracle replicates
  byte-for-byte)
- properties: domain "collectd" {plugin_instance, type, type_instance}
  when non-empty; domains "gauge"/"derive" carry DSName→formatted value
  (gauge %.3f, derive int). Counter/absolute values appear in the JSON
  message but — like the reference property loop — not in properties.

DSNames resolve through an embedded subset of collectd's types.db
(decoders/collectd.go:19-50 loads the full file from statik); unknown
types fall back to api.ValueList.DSName semantics: "value" for
single-value lists, else the stringified index.

A packet that fails mid-parse yields ONE error row and no partial
records (decode error → count + drop, services/base/metrics.go:16-47).
"""

from __future__ import annotations

import struct

from .base import RecordBuilder

PART_HOST = 0x0000
PART_TIME = 0x0001
PART_TIME_HR = 0x0008
PART_PLUGIN = 0x0002
PART_PLUGIN_INST = 0x0003
PART_TYPE = 0x0004
PART_TYPE_INST = 0x0005
PART_VALUES = 0x0006
PART_INTERVAL = 0x0007
PART_INTERVAL_HR = 0x0009

_STRING_PARTS = {PART_HOST: "host", PART_PLUGIN: "plugin",
                 PART_PLUGIN_INST: "plugin_instance", PART_TYPE: "type",
                 PART_TYPE_INST: "type_instance"}

# embedded subset of collectd's types.db (dataset name → DS field names);
# the reference embeds the whole file via statik (decoders/collectd.go:19-50)
TYPES_DB: dict[str, tuple[str, ...]] = {
    "cpu": ("value",),
    "memory": ("value",),
    "df_complex": ("value",),
    "load": ("shortterm", "midterm", "longterm"),
    "if_octets": ("rx", "tx"),
    "if_packets": ("rx", "tx"),
    "if_errors": ("rx", "tx"),
    "disk_octets": ("read", "write"),
    "disk_ops": ("read", "write"),
    "swap": ("value",),
    "uptime": ("value",),
    "users": ("value",),
    "processes": ("value",),
    "entropy": ("value",),
    "gauge": ("value",),
    "counter": ("value",),
    "derive": ("value",),
}


def ds_name(vtype: str, n_values: int, index: int) -> str:
    """collectd.org/api ValueList.DSName semantics."""
    names = TYPES_DB.get(vtype)
    if names is not None and index < len(names):
        return names[index]
    if n_values != 1:
        return str(index)
    return "value"


def _parse_values(payload: bytes) -> list[tuple[str, float]]:
    (n,) = struct.unpack_from(">H", payload, 0)
    types = payload[2:2 + n]
    need = 2 + n + 8 * n
    if len(payload) < need:
        raise ValueError("truncated values part")
    vals = []
    off = 2 + n
    for i in range(n):
        raw = payload[off + 8 * i: off + 8 * i + 8]
        t = types[i]
        if t == 1:  # gauge: little-endian double
            (v,) = struct.unpack("<d", raw)
            vals.append(("gauge", float(v)))
        elif t == 2:  # derive: big-endian signed
            (v,) = struct.unpack(">q", raw)
            vals.append(("derive", float(v)))
        else:  # counter/absolute: big-endian unsigned
            (v,) = struct.unpack(">Q", raw)
            vals.append(("counter" if t == 0 else "absolute", float(v)))
    return vals


def parse_packet(data: bytes):
    """Yield (state, t_ns, interval_s, values) per values part."""
    state: dict[str, str] = {}
    t_ns = 0
    interval = 0
    off = 0
    while off + 4 <= len(data):
        ptype, plen = struct.unpack_from(">HH", data, off)
        if plen < 4 or off + plen > len(data):
            break
        payload = data[off + 4: off + plen]
        off += plen
        if ptype in _STRING_PARTS:
            # string parts persist until overwritten (collectd network
            # protocol state machine — senders resend parts that change)
            state[_STRING_PARTS[ptype]] = payload.rstrip(b"\x00").decode(
                "utf-8", errors="replace")
        elif ptype == PART_TIME:
            (sec,) = struct.unpack(">Q", payload)
            t_ns = sec * 1_000_000_000
        elif ptype == PART_TIME_HR:
            (hr,) = struct.unpack(">Q", payload)
            t_ns = (hr * 1_000_000_000) >> 30  # 2^-30 s resolution
        elif ptype == PART_INTERVAL:
            (interval,) = struct.unpack(">Q", payload)
        elif ptype == PART_INTERVAL_HR:
            (hr,) = struct.unpack(">Q", payload)
            interval = hr >> 30
        elif ptype == PART_VALUES:
            yield dict(state), t_ns, interval, _parse_values(payload)


def _fmt(kind: str, v: float) -> str:
    """gauge → FormatFloat(f,3) (decoders/collectd.go:86); else int."""
    if kind == "gauge":
        return f"{v:.3f}"
    return str(int(v))


def value_list_json(state: dict, t_ns: int, interval_s: int, vals) -> str:
    """Canonical JSON of one value list (collectd JSON-export shape,
    deterministic number formatting — see module docstring)."""
    n = len(vals)
    vtype = state.get("type", "")
    values = ",".join(_fmt(k, v) for k, v in vals)
    dstypes = ",".join(f'"{k}"' for k, _v in vals)
    dsnames = ",".join(f'"{ds_name(vtype, n, i)}"' for i in range(n))
    return (
        '{"values":[' + values + '],"dstypes":[' + dstypes
        + '],"dsnames":[' + dsnames
        + f'],"time":{t_ns / 1_000_000_000:.3f},"interval":{interval_s:.3f}'
        + f',"host":"{state.get("host", "")}"'
        + f',"plugin":"{state.get("plugin", "")}"'
        + f',"plugin_instance":"{state.get("plugin_instance", "")}"'
        + f',"type":"{vtype}"'
        + f',"type_instance":"{state.get("type_instance", "")}"' + "}")


def encode_packet(host: str, time_s: int, metrics, interval_s: int = 0) -> bytes:
    """Fixture builder: metrics = [(plugin, plugin_instance, type,
    type_instance, [(kind, value)...])] (legacy 3-tuples accepted)."""
    out = bytearray()

    def spart(ptype, text):
        b = text.encode() + b"\x00"
        out.extend(struct.pack(">HH", ptype, 4 + len(b)))
        out.extend(b)

    spart(PART_HOST, host)
    out.extend(struct.pack(">HHQ", PART_TIME, 12, time_s))
    if interval_s:
        out.extend(struct.pack(">HHQ", PART_INTERVAL, 12, interval_s))
    for m in metrics:
        if len(m) == 3:
            plugin, vtype, values = m
            spart(PART_PLUGIN, plugin)
            spart(PART_TYPE, vtype)
        else:
            # 5-tuple form sends every identifier part explicitly (state
            # persists across value lists in the protocol)
            plugin, pinst, vtype, tinst, values = m
            spart(PART_PLUGIN, plugin)
            spart(PART_PLUGIN_INST, pinst)
            spart(PART_TYPE, vtype)
            spart(PART_TYPE_INST, tinst)
        pv = bytearray(struct.pack(">H", len(values)))
        kinds = {"counter": 0, "gauge": 1, "derive": 2, "absolute": 3}
        pv.extend(bytes(kinds[k] for k, _v in values))
        for k, v in values:
            if k == "gauge":
                pv.extend(struct.pack("<d", float(v)))
            elif k == "derive":
                pv.extend(struct.pack(">q", int(v)))
            else:
                pv.extend(struct.pack(">Q", int(v)))
        out.extend(struct.pack(">HH", PART_VALUES, 4 + len(pv)))
        out.extend(pv)
    return bytes(out)


def decode_block(texts, ts_ns, out: RecordBuilder, cfg=None):
    """1→N: each packet (latin-1-carried bytes or bytes) may yield many
    records. Records are buffered per packet and flushed only after the
    whole packet parses — a mid-packet failure yields exactly one error
    row, never partial records beside it."""
    from ..schema import props_dumps
    for row, (line, n) in enumerate(zip(texts, ts_ns)):
        data = line if isinstance(line, (bytes, bytearray)) \
            else line.encode("latin-1", errors="replace")
        recs = []
        try:
            for state, t_ns, interval, vals in parse_packet(data):
                vtype = state.get("type", "")
                props: dict[str, dict[str, str]] = {}
                dom = {k: state[k] for k in
                       ("plugin_instance", "type", "type_instance")
                       if state.get(k)}
                if dom:
                    props["collectd"] = dom
                for i, (kind, v) in enumerate(vals):
                    # counter/absolute skipped (decoders/collectd.go:83-90)
                    if kind in ("gauge", "derive"):
                        props.setdefault(kind, {})[
                            ds_name(vtype, len(vals), i)] = _fmt(kind, v)
                recs.append(dict(
                    pri=1 * 8 + 6, fac=1, sev=6,
                    tr=t_ns or n, tg=n,
                    host=state.get("host", ""), app="collectd",
                    proc=state.get("plugin", ""),
                    msg=value_list_json(state, t_ns or n, interval, vals),
                    props=props_dumps(props)))
        except Exception:
            out.add_error(row, str(line)[:200], n)
            continue
        if not recs:
            out.add_error(row, str(line)[:200], n)
            continue
        for sub, kw in enumerate(recs):
            out.add(row, sub=sub, **kw)
