"""collectd binary network-protocol decoder (decoders/collectd.go:19-95).

Parses the part-based packet format (RFC-less, see collectd's
network.h): each part is ``type:u16be len:u16be payload``. String parts
carry NUL-terminated text; the values part carries
``n:u16be | n type bytes | n 8-byte values`` with counter(0)/absolute(3)
as u64be, derive(2) as i64be, gauge(1) as f64le.

Deviation from the reference: no embedded types.db, so value names are
positional (``value_<i>``) instead of dataset field names; each values
part yields ONE record (the reference emits one per value list too) with
numbers in the "collectd" property domain. Facility 16 (local0),
severity 6 — the influx decoder's convention (decoders/influxdb.go).
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

_STRING_PARTS = {PART_HOST: "host", PART_PLUGIN: "plugin",
                 PART_PLUGIN_INST: "plugin_instance", PART_TYPE: "type",
                 PART_TYPE_INST: "type_instance"}


def _parse_values(payload: bytes) -> list[tuple[str, float]]:
    (n,) = struct.unpack_from(">H", payload, 0)
    types = payload[2:2 + n]
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
    """Yield one state-dict per values part."""
    state: dict[str, str] = {}
    t_ns = 0
    off = 0
    while off + 4 <= len(data):
        ptype, plen = struct.unpack_from(">HH", data, off)
        if plen < 4 or off + plen > len(data):
            break
        payload = data[off + 4: off + plen]
        off += plen
        if ptype in _STRING_PARTS:
            state[_STRING_PARTS[ptype]] = payload.rstrip(b"\x00").decode(
                "utf-8", errors="replace")
        elif ptype == PART_TIME:
            (sec,) = struct.unpack(">Q", payload)
            t_ns = sec * 1_000_000_000
        elif ptype == PART_TIME_HR:
            (hr,) = struct.unpack(">Q", payload)
            t_ns = (hr * 1_000_000_000) >> 30  # 2^-30 s resolution
        elif ptype == PART_VALUES:
            yield dict(state), t_ns, _parse_values(payload)


def encode_packet(host: str, time_s: int, metrics) -> bytes:
    """Fixture builder: metrics = [(plugin, type, [(kind, value)...])]."""
    out = bytearray()

    def spart(ptype, text):
        b = text.encode() + b"\x00"
        out.extend(struct.pack(">HH", ptype, 4 + len(b)))
        out.extend(b)

    spart(PART_HOST, host)
    out.extend(struct.pack(">HHQ", PART_TIME, 12, time_s))
    for plugin, vtype, values in metrics:
        spart(PART_PLUGIN, plugin)
        spart(PART_TYPE, vtype)
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
    records."""
    from ..schema import props_dumps
    for row, (line, n) in enumerate(zip(texts, ts_ns)):
        data = line if isinstance(line, (bytes, bytearray)) \
            else line.encode("latin-1", errors="replace")
        sub = 0
        try:
            for state, t_ns, vals in parse_packet(data):
                props = dict(state)
                for i, (kind, v) in enumerate(vals):
                    props[f"value_{i}_{kind}"] = repr(v)
                name = state.get("plugin", "")
                if state.get("type"):
                    name = f"{name}.{state['type']}" if name else state["type"]
                out.add(row, sub=sub, pri=16 * 8 + 6, fac=16, sev=6,
                        tr=t_ns or n, tg=n,
                        host=state.get("host", ""), app="collectd",
                        msg=name,
                        props=props_dumps({"collectd": props}))
                sub += 1
        except Exception:
            out.add_error(row, str(line)[:200], n)
            continue
        if sub == 0:
            out.add_error(row, str(line)[:200], n)
