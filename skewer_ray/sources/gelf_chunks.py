"""Chunked-GELF reassembly (services/network/graylog.go:214-310).

The reference buffers UDP chunks per 8-byte message id (seq/total
header, 5 s timeout) and zlib/gzip-inflates the reassembled payload. In
batch form the "session" is a groupby: datagrams → (msg_id, seq, total,
payload) rows → groupby(msg_id).map_groups concat-in-seq-order →
inflate → GELF JSON text. Incomplete groups (missing chunks — the
timeout analogue) are dropped with a counted status row.

Chunk wire format: magic 0x1e 0x0f | msg_id[8] | seq u8 | total u8 |
payload. Non-chunked datagrams pass through whole (zlib 0x78 / gzip
0x1f8b magic detected on the payload either way).
"""

from __future__ import annotations

import gzip
import zlib

import pyarrow as pa

CHUNK_MAGIC = b"\x1e\x0f"


def split_datagram(data: bytes):
    """→ (msg_id_hex, seq, total, payload); whole datagrams get
    msg_id="" seq=0 total=1."""
    if data[:2] == CHUNK_MAGIC and len(data) > 12:
        return data[2:10].hex(), data[10], data[11], data[12:]
    return "", 0, 1, data


def inflate(payload: bytes) -> bytes:
    if payload[:2] == b"\x1f\x8b":
        return gzip.decompress(payload)
    if payload[:1] == b"\x78":
        return zlib.decompress(payload)
    return payload


def datagrams_to_rows(datagrams, source: str = "gelf") -> pa.Table:
    ids, seqs, totals, payloads = [], [], [], []
    for d in datagrams:
        mid, seq, total, payload = split_datagram(d)
        ids.append(mid)
        seqs.append(seq)
        totals.append(total)
        payloads.append(payload)
    return pa.table({
        "msg_id": pa.array(ids, pa.string()),
        "seq": pa.array(seqs, pa.int32()),
        "total": pa.array(totals, pa.int32()),
        "payload": pa.array(payloads, pa.large_binary()),
        "source": pa.array([source] * len(ids), pa.string()),
    })


def _group_to_text(batch: pa.Table) -> pa.Table:
    """One msg_id group → one reassembled text row (or an incomplete
    marker)."""
    mid = batch["msg_id"][0].as_py()
    out_text, out_status = [], []
    if mid == "":
        # whole datagrams: one message each
        for p in batch["payload"].to_pylist():
            try:
                out_text.append(inflate(p).decode("utf-8", errors="replace"))
                out_status.append("ok")
            except Exception:
                out_text.append("")
                out_status.append("corrupt")
    else:
        seqs = batch["seq"].to_pylist()
        total = batch["total"][0].as_py()
        if sorted(seqs) != list(range(total)):
            out_text.append("")
            out_status.append("incomplete")  # timeout-drop analogue
        else:
            payloads = batch["payload"].to_pylist()
            joined = b"".join(p for _s, p in
                              sorted(zip(seqs, payloads), key=lambda x: x[0]))
            try:
                out_text.append(inflate(joined).decode("utf-8",
                                                       errors="replace"))
                out_status.append("ok")
            except Exception:
                out_text.append("")
                out_status.append("corrupt")
    n = len(out_text)
    return pa.table({
        "msg_id": pa.array([mid] * n, pa.string()),
        "text": pa.array(out_text, pa.string()),
        "status": pa.array(out_status, pa.string()),
    })


def reassemble(ds):
    """Dataset of chunk rows → Dataset of (msg_id, text, status); feed
    the ok rows to the gelf decoder."""
    return ds.groupby("msg_id").map_groups(_group_to_text,
                                           batch_format="pyarrow")
