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

Hot-path layout: status masks, column selection, encoding AND file-route
template rendering are vectorized Arrow ops (encoders/vectorized.py —
byte-identical to the per-row encoders); the per-row loop survives only
for formats without a vectorized form (gelf/avro/protobuf/fulljson) and
for templates with format specs.

Downstream this single stream is written with
``partition_cols=["sink", "status", "route"]`` — the Ray-native
equivalent of topic-partitioned Kafka output + template-named files.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import SinkConfig, render_template
from ..encoders import BINARY_ENCODERS, get_encoder, rfc3339_from_ns
from ..encoders.vectorized import encode_batch, ts_date

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


def _tmpl_pieces(tmpl: str):
    """(literal, field) pieces for plain substitution templates, or None
    when the template uses format specs/conversions (per-row fallback)."""
    from string import Formatter
    pieces = []
    for lit, f, spec, conv in Formatter().parse(tmpl):
        if conv or (spec not in (None, "")):
            return None
        pieces.append((lit, f))
    return pieces


_TMPL_KINDS = ("file", "es")   # kinds whose route renders a template


class FanoutEncodeStage:
    def __init__(self, sinks: tuple[SinkConfig, ...] | list[SinkConfig]):
        self.sinks = [(s, get_encoder(s.encoder),
                       _tmpl_fields(s.filename_tmpl)
                       if s.kind in _TMPL_KINDS else (),
                       _tmpl_pieces(s.filename_tmpl)
                       if s.kind in _TMPL_KINDS else None) for s in sinks]

    @staticmethod
    def _routes_vec(pieces, sub: pa.Table, sanitize: bool = True):
        """Vectorized template render: Arrow string join over literal
        scalars and field columns; with ``sanitize`` the filename
        sanitizer runs once per DISTINCT rendered route; without it the
        raw render is returned (the es index name must be validated
        unsanitized)."""
        from ..encoders.vectorized import _render_unique
        parts = []
        has_array = False
        for lit, field in pieces:
            if lit:
                parts.append(lit)
            if field is None:
                continue
            if field == "date":
                parts.append(ts_date(sub["time_reported"]))
                has_array = True
            elif field in sub.column_names:
                col = sub[field]
                if not pa.types.is_string(col.type):
                    col = pc.cast(col, pa.string())
                parts.append(col)
                has_array = True
            # missing fields render empty (config._SafeView semantics)
        if not has_array:
            joined = "".join(p for p in parts)
            return _sanitize_route(joined) if sanitize else joined
        if len(parts) == 1:
            out = parts[0]
        else:
            out = pc.binary_join_element_wise(*parts, "")
        if isinstance(out, pa.ChunkedArray):
            out = out.combine_chunks()
        return _render_unique(out, _sanitize_route) if sanitize else out

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

    @staticmethod
    def _frame(framing: str, enc_arr, sub: pa.Table,
               encoder: str = "rfc5424"):
        """Vectorized wire framing of the encoded payload (nulls =
        PermError propagate). Octet: '<len> <data>'; RELP:
        '<txnr> syslog <len> <data>\\n' with deterministic
        txnr = turn_idx (the per-connection counter has no meaning in a
        batch re-run; ordering lineage lives in uid/manifests).

        Wire length: text encoders store real UTF-8, so byte length =
        binary_length; binary encoders (protobuf/avro) carry raw bytes
        latin-1-mapped — one CODEPOINT per byte — so their wire length
        is utf8_length (ADVICE r02: binary_length would double-count
        chars ≥ 0x80 and emit invalid octet counts)."""
        if encoder in BINARY_ENCODERS:
            nbytes = pc.cast(pc.utf8_length(enc_arr), pa.string())
        else:
            nbytes = pc.cast(pc.binary_length(enc_arr), pa.string())
        empty = pc.equal(enc_arr, "")
        if framing == "octet":
            # empty payload frames to nothing (encoder.go:148-151)
            return pc.if_else(
                empty, "",
                pc.binary_join_element_wise(nbytes, " ", enc_arr, ""))
        if framing == "relp":
            txnr = pc.cast(pc.cast(sub["turn_idx"], pa.int64()),
                           pa.string())
            framed = pc.binary_join_element_wise(
                txnr, " syslog ", nbytes, " ", enc_arr, "\n", "")
            return pc.if_else(
                empty,
                pc.binary_join_element_wise(txnr, " syslog 0\n", ""),
                framed)
        raise ValueError(f"unknown framing: {framing}")

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
            for s, _enc, _tf, _tp in self.sinks:
                parts.append(self._with_consts(sub, s.name, st, "-", None))

        if m_pass.any():
            sub = batch.filter(pa.array(m_pass))
            n = sub.num_rows
            topics = sub["topic"]
            colmap = recs = None
            for s, encode, tmpl_fields, pieces in self.sinks:
                enc_arr = encode_batch(s.encoder, sub)
                if enc_arr is None:
                    # no vectorized form for this format: per-row loop
                    # over lazy column views (built once, shared across
                    # all fallback sinks in the batch)
                    if recs is None:
                        from .route import Row
                        colmap = {c: sub[c].to_pylist()
                                  for c in _REC_COLS + ["uid", "conv_id",
                                                        "turn_idx", "role"]}
                        recs = [Row(colmap, i) for i in range(n)]
                    enc_arr = pa.array([encode(r) for r in recs],
                                       pa.string())
                if s.framing:
                    enc_arr = self._frame(s.framing, enc_arr, sub, s.encoder)
                if s.kind == "es":
                    # per-item bulk ack model (stages/esbulk.py): the
                    # simulated bulk response fails exactly the items
                    # whose rendered index name is invalid; validity is
                    # evaluated once per DISTINCT name — identical to
                    # folding bulk_responses()+after() row by row
                    # (pinned by tests/test_esbulk.py)
                    from .esbulk import valid_index_name
                    if pieces is not None:
                        names = self._routes_vec(pieces, sub,
                                                 sanitize=False)
                    else:
                        if recs is None:
                            from .route import Row
                            colmap = {c: sub[c].to_pylist()
                                      for c in _REC_COLS + ["uid", "conv_id",
                                                            "turn_idx",
                                                            "role"]}
                            recs = [Row(colmap, i) for i in range(n)]
                        names = pa.array(
                            [render_template(s.filename_tmpl, r)
                             for r in recs], pa.string())
                    ok = pc.is_valid(enc_arr)
                    if isinstance(names, str):
                        acked = pa.nulls(n, pa.bool_()).fill_null(
                            valid_index_name(names))
                        names = pa.array([names] * n, pa.string())
                    else:
                        d = pc.dictionary_encode(names)
                        if isinstance(d, pa.ChunkedArray):
                            d = d.combine_chunks()
                        vmap = pa.array(
                            [valid_index_name(v)
                             for v in d.dictionary.to_pylist()],
                            pa.bool_())
                        acked = vmap.take(d.indices)
                    m_ack = pc.and_(ok, acked)
                    m_nack = pc.and_(ok, pc.invert(acked))
                    parts.append(self._with_consts(
                        sub.filter(m_ack), s.name, "passing",
                        names.filter(m_ack), enc_arr.filter(m_ack)))
                    parts.append(self._with_consts(
                        sub.filter(m_nack), s.name, "nack", "-", None))
                    if not pc.all(ok).as_py():
                        parts.append(self._with_consts(
                            sub.filter(pc.invert(ok)), s.name,
                            "permerror", "-", None))
                    continue
                if s.kind == "kafka":
                    route_vals = topics
                elif s.kind == "file":
                    # filename template over msg fields
                    # (store/dests/filedest.go:218-235)
                    if pieces is not None:
                        route_vals = self._routes_vec(pieces, sub)
                    else:
                        if recs is None or ("date" in tmpl_fields
                                            and "date" not in colmap):
                            from .route import Row
                            colmap = {c: sub[c].to_pylist()
                                      for c in _REC_COLS + ["uid", "conv_id",
                                                            "turn_idx",
                                                            "role"]}
                            if "date" in tmpl_fields:
                                colmap["date"] = [
                                    rfc3339_from_ns(t)[:10]
                                    for t in colmap["time_reported"]]
                            recs = [Row(colmap, i) for i in range(n)]
                        route_vals = pa.array(
                            [_sanitize_route(
                                render_template(s.filename_tmpl, r))
                             for r in recs], pa.string())
                else:
                    route_vals = "all"
                ok = pc.is_valid(enc_arr)
                if pc.all(ok).as_py():
                    parts.append(self._with_consts(
                        sub, s.name, "passing", route_vals, enc_arr))
                else:
                    # encoding errors → PermError rows with no route/bytes
                    good = sub.filter(ok)
                    rv = (route_vals if isinstance(route_vals, str)
                          else pc.filter(route_vals, ok))
                    parts.append(self._with_consts(
                        good, s.name, "passing", rv,
                        enc_arr.filter(ok)))
                    bad = sub.filter(pc.invert(ok))
                    parts.append(self._with_consts(
                        bad, s.name, "permerror", "-", None))

        if not parts:
            return self._with_consts(batch.slice(0, 0), "_", "_", "-", None)
        return pa.concat_tables(parts)
