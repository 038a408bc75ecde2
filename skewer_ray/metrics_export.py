"""Prometheus text-format export of the run metrics artifacts.

The reference serves live counters over HTTP ``/metrics``
(metrics/metrics.go:38-75; counter families skw_incoming_messages_total
at services/base/metrics.go:19, skw_store_acks_total /
skw_message_filtering_total at store/store.go:71-85). A batch run's
equivalent is a point-in-time scrape artifact: this module renders
``<out_dir>/metrics/sink_counts.json`` + ``summary.json`` into the
Prometheus text exposition format (text/plain; version=0.0.4 — a
public, stable format), so the same dashboards/alerts can consume a
batch run's results via e.g. node_exporter's textfile collector.

CLI: ``python -m skewer_ray metrics --out <dir> [--write]`` prints the
exposition (or writes ``metrics/skewer_ray.prom``).
"""

from __future__ import annotations

import json
import os


def _esc(v: str) -> str:
    return v.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


def render_prometheus(out_dir: str) -> str:
    """Render the metrics artifacts of one run as Prometheus text."""
    mdir = os.path.join(out_dir, "metrics")
    with open(os.path.join(mdir, "sink_counts.json")) as fh:
        rows = json.load(fh)

    lines = [
        "# HELP skw_routed_messages_total Routed rows per "
        "(sink, status, route) — the batch analogue of "
        "skw_store_acks_total / skw_message_filtering_total.",
        "# TYPE skw_routed_messages_total counter",
    ]
    for r in rows:
        # the resumable-run path (state/manifest.py) writes
        # (sink, status, n) without a route column — default it
        lines.append(
            'skw_routed_messages_total{sink="%s",status="%s",route="%s"} %d'
            % (_esc(r["sink"]), _esc(r["status"]),
               _esc(str(r.get("route", "-"))), int(r["n"])))

    # per-status rollup mirrors skw_message_filtering_total's result label
    by_status: dict[str, int] = {}
    for r in rows:
        by_status[r["status"]] = by_status.get(r["status"], 0) + int(r["n"])
    lines += [
        "# HELP skw_message_filtering_total Rows per filter result "
        "(store/store.go:79-85).",
        "# TYPE skw_message_filtering_total counter",
    ]
    for st in sorted(by_status):
        lines.append('skw_message_filtering_total{result="%s"} %d'
                     % (_esc(st), by_status[st]))

    summary_path = os.path.join(mdir, "summary.json")
    if os.path.exists(summary_path):
        with open(summary_path) as fh:
            summary = json.load(fh)
        lines += [
            "# HELP skw_incoming_messages_total Total rows written by "
            "the run (services/base/metrics.go:19).",
            "# TYPE skw_incoming_messages_total counter",
            "skw_incoming_messages_total %d" % int(summary["total_rows"]),
        ]
    return "\n".join(lines) + "\n"


def write_prometheus(out_dir: str) -> str:
    """Write ``metrics/skewer_ray.prom``; returns the path."""
    path = os.path.join(out_dir, "metrics", "skewer_ray.prom")
    with open(path, "w") as fh:
        fh.write(render_prometheus(out_dir))
    return path
