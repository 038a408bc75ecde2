"""macOS unified-log exec source (services/macos/macoslogs.go:79-130).

The reference spawns ``log stream --color=none --style=json
--level=<l> [--predicate=<p>] [--process=<n>]``, logs stderr lines,
and incrementally decodes the JSON event ARRAY from stdout
(``json.NewDecoder`` + ``Token()`` + ``More()`` —
macoslogs.go:130-137), mapping each event through the field rules now
in ``decoders/macos.py``.

This module supplies the real process plumbing: argument construction
is macoslogs.go parity, stdout is parsed incrementally (one event at a
time off a growing buffer — never the whole array in memory), and each
event re-emits as one compact NDJSON line, the row shape the macos
decoder consumes. The ``log`` binary only exists on macOS, so the
command is configurable (``Conf.Command`` in the reference too) and the
tests drive the source with a stand-in process emitting the same array
framing.
"""

from __future__ import annotations

import json
import subprocess
from collections.abc import Iterator


class MacLogStreamSource:
    def __init__(self, command: str = "log", level: str = "default",
                 predicate: str = "", process: str = "",
                 stderr_log=None):
        self.command = command
        self.level = level or "default"
        self.predicate = predicate
        self.process = process
        self._stderr_log = stderr_log or (lambda line: None)
        self._proc: subprocess.Popen | None = None

    def build_args(self) -> list[str]:
        """Exact reference argument construction (macoslogs.go:80-96)."""
        args = [self.command, "stream", "--color=none", "--style=json",
                f"--level={self.level}"]
        if self.predicate:
            args.append(f"--predicate={self.predicate}")
        if self.process:
            args.append(f"--process={self.process}")
        return args

    def stream_lines(self) -> Iterator[str]:
        """Spawn the command and yield one compact JSON line per event
        of the stdout JSON array (incremental — json.NewDecoder
        semantics: skip the opening token, decode object by object)."""
        self._proc = subprocess.Popen(
            self.build_args(), stdin=subprocess.DEVNULL,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        import threading

        def drain_stderr():
            for raw in self._proc.stderr:
                self._stderr_log(raw.decode("utf-8", "replace").rstrip())

        t = threading.Thread(target=drain_stderr, daemon=True)
        t.start()
        dec = json.JSONDecoder()
        buf = ""
        started = False
        while True:
            chunk = self._proc.stdout.read(8192)
            if not chunk:
                break
            buf += chunk.decode("utf-8", "replace")
            while True:
                buf = buf.lstrip()
                if not started:
                    if not buf:
                        break
                    if buf[0] != "[":
                        raise ValueError("expected JSON array from log stream")
                    buf = buf[1:]
                    started = True
                    continue
                buf = buf.lstrip().lstrip(",").lstrip()
                if not buf or buf[0] == "]":
                    break
                try:
                    obj, end = dec.raw_decode(buf)
                except json.JSONDecodeError:
                    break          # partial object: wait for more bytes
                buf = buf[end:]
                yield json.dumps(obj, separators=(",", ":"),
                                 ensure_ascii=False)
        self._proc.wait()
        t.join(timeout=5)

    def close(self):
        if self._proc and self._proc.poll() is None:
            self._proc.terminate()
            self._proc.wait()
