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

Hot-path layout: status masks and column selection are vectorized Arrow
ops; only the actual per-record encoding (string build over a python
dict, like the reference's per-message Encoder call) loops, and it loops
once over the passing rows with the record dicts shared across sinks.

Downstream this single stream is written with
``partition_cols=["sink", "status", "route"]`` — the Ray-native
equivalent of topic-partitioned Kafka output + template-named files.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import SinkConfig, render_template
from ..encoders import get_encoder, rfc3339_from_ns

_KEEP = ["uid", "conv_id", "turn_idx", "sub_idx", "topic",
         "partition_key", "partition_number"]
_REC_COLS = [
    "priority", "facility", "severity", "version", "time_reported",
    "time_generated", "hostname", "appname", "procid", "msgid",
    "structured", "message", "properties",
]
# columns consumed by the routed stream itself; anything else is an
# extra passthrough (e.g. part_id lineage) and is kept in the output
_CONSUMED = set(_KEEP) | set(_REC_COLS) | {
    "role", "tool", "ts", "parse_ok", "role_class", "tool_category",
    "filter_result", "filter_status"}


from functools import lru_cache


@lru_cache(maxsize=1 << 16)
def _sanitize_route(r: str) -> str:
    out = "".join(c if (c.isalnum() or c in "._-") else "-" for c in r)
    return out or "unknown"


def _tmpl_fields(tmpl: str) -> tuple[str, ...]:
    from string import Formatter
    return tuple(f for _lit, f, _sp, _cv in Formatter().parse(tmpl) if f)


class FanoutEncodeStage:
    def __init__(self, sinks: tuple[SinkConfig, ...] | list[SinkConfig]):
        self.sinks = [(s, get_encoder(s.encoder),
                       _tmpl_fields(s.filename_tmpl) if s.kind == "file"
                       else ()) for s in sinks]

    @staticmethod
    def _with_consts(sub: pa.Table, sink, status, route, encoded) -> pa.Table:
        """keep-columns of ``sub`` + constant-or-array sink/status/route/
        encoded columns, in the output column order."""
        n = sub.num_rows

        def col(v, typ):
            if isinstance(v, (pa.Array, pa.ChunkedArray)):
                return v
            if v is None:
                return pa.nulls(n, typ)
            return pa.array([v] * n, typ)

        cols = {
            "sink": col(sink, pa.string()),
            "status": col(status, pa.string()),
            "route": col(route, pa.string()),
        }
        for c in _KEEP:
            cols[c] = sub[c]
        cols["encoded"] = col(encoded, pa.string())
        for c in sub.column_names:  # extra passthrough columns
            if c not in _CONSUMED:
                cols[c] = sub[c]
        return pa.table(cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        status_np = np.asarray(batch["filter_status"].to_pylist(), dtype=object)
        m_err = status_np == "parse_error"
        m_pass = status_np == "passing"
        m_other = ~(m_err | m_pass)

        parts: list[pa.Table] = []
        if m_err.any():
            sub = batch.filter(pa.array(m_err))
            parts.append(self._with_consts(sub, "_parse", "error", "-", None))

        if m_other.any():
            arr = pa.array(m_other)
            sub = batch.filter(arr)
            st = sub["filter_status"]
            # dropped → ACK, rejected → NACK, once per destination
            # (store/forwarder.go:192-208)
            for s, _enc, _tf in self.sinks:
                parts.append(self._with_consts(sub, s.name, st, "-", None))

        if m_pass.any():
            from .route import Row
            sub = batch.filter(pa.array(m_pass))
            n = sub.num_rows
            colmap = {c: sub[c].to_pylist()
                      for c in _REC_COLS + ["uid", "conv_id", "turn_idx",
                                            "role"]}
            # lazy views: encoders read 5-10 of these fields per call
            recs = [Row(colmap, i) for i in range(n)]
            topics = sub["topic"]
            dates = None
            for s, encode, tmpl_fields in self.sinks:
                enc = [encode(r) for r in recs]
                ok = np.fromiter((e is not None for e in enc), dtype=bool, count=n)
                if s.kind == "kafka":
                    route_vals = topics
                elif s.kind == "file":
                    # filename template over msg fields
                    # (store/dests/filedest.go:218-235); only the fields
                    # the template names are materialized per row
                    if dates is None and "date" in tmpl_fields:
                        dates = [rfc3339_from_ns(t)[:10]
                                 for t in colmap["time_reported"]]
                        colmap = {**colmap, "date": dates}
                        recs = [Row(colmap, i) for i in range(n)]
                    tmpl = s.filename_tmpl
                    routes = [_sanitize_route(render_template(tmpl, r))
                              for r in recs]
                    route_vals = pa.array(routes, pa.string())
                else:
                    route_vals = "all"
                if ok.all():
                    parts.append(self._with_consts(
                        sub, s.name, "passing", route_vals,
                        pa.array(enc, pa.string())))
                else:
                    # encoding errors → PermError rows with no route/bytes
                    okarr = pa.array(ok)
                    good = sub.filter(okarr)
                    rv = (route_vals if isinstance(route_vals, str)
                          else pc.filter(route_vals, okarr))
                    parts.append(self._with_consts(
                        good, s.name, "passing", rv,
                        pa.array([e for e in enc if e is not None], pa.string())))
                    bad = sub.filter(pa.array(~ok))
                    parts.append(self._with_consts(
                        bad, s.name, "permerror", "-", None))

        if not parts:
            return self._with_consts(batch.slice(0, 0), "_", "_", "-", None)
        return pa.concat_tables(parts)
