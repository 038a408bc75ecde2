"""journald export-format source (the batch fixture for skewer's
sdjournal reader, journald/reader.go:36-111).

Input is `journalctl -o export` text: one ``FIELD=value`` per line,
records separated by a blank line (binary-value frames are not needed
for the fixture). Field mapping mirrors the reference:

- ``PRIORITY`` → severity, ``SYSLOG_FACILITY`` → facility
- ``_COMM`` (else ``SYSLOG_IDENTIFIER``) → appname
- ``_PID``/``SYSLOG_PID`` → procid, ``_HOSTNAME`` → hostname
- ``MESSAGE`` → message
- ``__REALTIME_TIMESTAMP`` (µs) → time_reported (ns)
- every other ``_*`` field (lowercased, underscore stripped) → the
  ``journald`` properties domain (journald/reader.go:85-87)
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from ..schema import RECORD_SCHEMA


def _records_of(text: str):
    rec: dict[str, str] = {}
    for line in text.splitlines():
        if not line.strip():
            if rec:
                yield rec
                rec = {}
            continue
        if "=" in line:
            k, v = line.split("=", 1)
            rec[k] = v
    if rec:
        yield rec


def parse_journald_export(text: str, conv_id: str = "journald") -> pa.Table:
    """Export text → RECORD_SCHEMA table (journald/reader.go mapping)."""
    from ..schema import props_dumps
    rows = []
    for t_idx, r in enumerate(_records_of(text)):
        sev = int(r.get("PRIORITY", "6") or 6)
        fac = int(r.get("SYSLOG_FACILITY", "3") or 3)
        us = int(r.get("__REALTIME_TIMESTAMP", "0") or 0)
        props = {k[1:].lower(): v for k, v in r.items()
                 if k.startswith("_") and not k.startswith("__")
                 and k not in ("_COMM", "_PID", "_HOSTNAME")}
        rows.append({
            "conv_id": conv_id,
            "turn_idx": t_idx,
            "sub_idx": 0,
            "uid": f"{conv_id}:{t_idx}:0",
            "role": "",
            "tool": "",
            "ts": us,
            "parse_ok": True,
            "priority": fac * 8 + sev,
            "facility": fac,
            "severity": sev,
            "version": 1,
            "time_reported": us * 1000,
            "time_generated": us * 1000,
            "hostname": r.get("_HOSTNAME", ""),
            "appname": r.get("_COMM", r.get("SYSLOG_IDENTIFIER", "")),
            "procid": r.get("_PID", r.get("SYSLOG_PID", "")),
            "msgid": "",
            "structured": "",
            "message": r.get("MESSAGE", ""),
            "properties": props_dumps({"journald": props} if props else None),
        })
    if not rows:
        return RECORD_SCHEMA.empty_table()
    cols = {f.name: [row[f.name] for row in rows] for f in RECORD_SCHEMA}
    return pa.table(
        {k: pa.array(v, RECORD_SCHEMA.field(k).type) for k, v in cols.items()},
        schema=RECORD_SCHEMA)


def read_journald_export(paths):
    """Dataset of parsed records from journald export files (one file =
    one stream)."""
    import os
    nf = len(paths) if isinstance(paths, (list, tuple)) else 1
    # one block per file: Ray otherwise over-splits tiny reads into
    # empty schema-less blocks that pollute downstream RefBundles
    ds = rd.read_binary_files(paths, include_paths=True,
                              override_num_blocks=nf)

    def parse(batch: pa.Table) -> pa.Table:
        parts = []
        for path, data in zip(batch["path"].to_pylist(),
                              batch["bytes"].to_pylist()):
            stem = os.path.splitext(os.path.basename(path))[0]
            parts.append(parse_journald_export(
                data.decode("utf-8", errors="replace"), conv_id=stem))
        if not parts:
            return RECORD_SCHEMA.empty_table()
        return pa.concat_tables(parts)

    return ds.map_batches(parse, batch_format="pyarrow")
