"""Fan-out + encode stage: one row per (message × destination).

Mirrors the store's multi-destination ingest, where each message is
marked ready once per enabled destination (store/store.go:1163-1178,
dest bitmask conf/destinations.go:94-112), and per-destination encoding
(store/dests/base.go:207-265 — encoding errors become PermError).

Output columns: sink, status, route, plus the routing decision and keys,
plus ``encoded`` (the destination wire bytes as text; null unless
passing). Routes: kafka-like sinks use the topic column; file-like sinks
render the filename template (store/dests/filedest.go:218-235);
catch-all sinks use "all". Parse errors appear once under sink="_parse".

Downstream this single stream is written with
``partition_cols=["sink", "status", "route"]`` — the Ray-native
equivalent of topic-partitioned Kafka output + template-named files.
"""

from __future__ import annotations

import pyarrow as pa

from ..config import SinkConfig, render_template
from ..encoders import get_encoder, rfc3339_from_ns

_KEEP = ["uid", "conv_id", "turn_idx", "sub_idx", "topic",
         "partition_key", "partition_number"]
_REC_COLS = [
    "priority", "facility", "severity", "version", "time_reported",
    "time_generated", "hostname", "appname", "procid", "msgid",
    "structured", "message", "properties",
]


def _sanitize_route(r: str) -> str:
    out = "".join(c if (c.isalnum() or c in "._-") else "-" for c in r)
    return out or "unknown"


class FanoutEncodeStage:
    def __init__(self, sinks: tuple[SinkConfig, ...] | list[SinkConfig]):
        self.sinks = [(s, get_encoder(s.encoder)) for s in sinks]

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        fstatus = batch["filter_status"].to_pylist()
        topics = batch["topic"].to_pylist()
        recs_cols = {c: batch[c].to_pylist() for c in _REC_COLS}
        keep_cols = {c: batch[c].to_pylist() for c in _KEEP}

        o_sink, o_status, o_route, o_enc = [], [], [], []
        o_keep = {c: [] for c in _KEEP}

        def emit(i, sink, status, route, enc):
            o_sink.append(sink)
            o_status.append(status)
            o_route.append(route)
            o_enc.append(enc)
            for c in _KEEP:
                o_keep[c].append(keep_cols[c][i])

        rec_names = list(recs_cols.keys())
        rec_lists = [recs_cols[c] for c in rec_names]
        for i in range(n):
            st = fstatus[i]
            if st == "parse_error":
                emit(i, "_parse", "error", "-", None)
                continue
            if st != "passing":
                # dropped → ACK, rejected → NACK, per destination
                # (store/forwarder.go:192-208)
                for s, _enc in self.sinks:
                    emit(i, s.name, st, "-", None)
                continue
            rec = {name: col[i] for name, col in zip(rec_names, rec_lists)}
            for s, encode in self.sinks:
                if s.kind == "kafka":
                    route = topics[i]
                elif s.kind == "file":
                    rec.setdefault("date", rfc3339_from_ns(rec["time_reported"])[:10])
                    route = _sanitize_route(render_template(s.filename_tmpl, rec))
                else:
                    route = "all"
                enc = encode(rec)
                if enc is None:
                    emit(i, s.name, "permerror", "-", None)
                else:
                    emit(i, s.name, "passing", route, enc)

        cols = {
            "sink": pa.array(o_sink, pa.string()),
            "status": pa.array(o_status, pa.string()),
            "route": pa.array(o_route, pa.string()),
        }
        for c in _KEEP:
            field = batch.schema.field(c)
            cols[c] = pa.array(o_keep[c], field.type)
        cols["encoded"] = pa.array(o_enc, pa.string())
        return pa.table(cols)
