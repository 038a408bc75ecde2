"""Raw log-file source: byte streams → framed lines → transcript-shaped
rows, the batch stand-in for skewer's TCP/UDP/file sources.

Framing reproduces the reference's per-connection auto-detection
(services/network/tcp.go:273-334): if the first non-space byte of the
stream is ``<`` the stream is LF-framed syslog, otherwise RFC6587
octet-counting frames (``LEN SP DATA``) are attempted, falling back to
LF framing. Each file is independent (one file = one "connection" =
one conv_id), so files parallelize as read tasks.
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data as rd

_MAX_FRAME = 65536  # main.max_input_message_size (conf/defaults.go:235)


def split_frames(data: bytes) -> list[bytes]:
    """Split one stream per the reference's auto-detected framing."""
    stripped = data.lstrip(b" \t\r\n")
    if not stripped:
        return []
    if stripped[:1] == b"<":  # LF framing (tcp.go:276-285)
        return [ln for ln in data.split(b"\n") if ln.strip()]
    # try octet-counting: "LEN SP DATA" repeated (tcp.go:287-334)
    frames = []
    i = 0
    n = len(data)
    while i < n:
        j = i
        while j < n and data[j:j + 1].isdigit():
            j += 1
        if j == i or j >= n or data[j:j + 1] != b" ":
            # not octet-counted after all → LF fallback for the rest
            frames.extend(ln for ln in data[i:].split(b"\n") if ln.strip())
            break
        ln = int(data[i:j])
        if ln > _MAX_FRAME:
            frames.extend(l2 for l2 in data[i:].split(b"\n") if l2.strip())
            break
        frames.append(data[j + 1:j + 1 + ln])
        i = j + 1 + ln
    return frames


def read_raw_log_lines(paths, base_ts_us: int = 0):
    """Dataset of transcript-shaped rows from raw ``.log``/``.txt`` files:
    (conv_id=file stem, turn_idx=frame index, role="", text, tool="",
    ts). One read task per file; framing is a per-file flat_map."""
    nf = len(paths) if isinstance(paths, (list, tuple)) else 1
    # one block per file: Ray otherwise over-splits tiny reads into
    # empty schema-less blocks that pollute downstream RefBundles
    ds = rd.read_binary_files(paths, include_paths=True,
                              override_num_blocks=nf)

    def frame(batch: pa.Table) -> pa.Table:
        convs, idxs, texts, tss = [], [], [], []
        for path, data in zip(batch["path"].to_pylist(),
                              batch["bytes"].to_pylist()):
            stem = os.path.splitext(os.path.basename(path))[0]
            for k, fr in enumerate(split_frames(data)):
                convs.append(stem)
                idxs.append(k)
                texts.append(fr.decode("utf-8", errors="replace"))
                tss.append(base_ts_us + k * 1_000_000)
        n = len(convs)
        return pa.table({
            "conv_id": pa.array(convs, pa.string()),
            "turn_idx": pa.array(idxs, pa.int32()),
            "role": pa.array([""] * n, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array([""] * n, pa.string()),
            "ts": pa.array(tss, pa.timestamp("us")),
        })

    return ds.map_batches(frame, batch_format="pyarrow")
