"""Interleaved A/B timing of named queries between two repo checkouts
(VERDICT r02 #5: attribute bench deltas to noise or a commit).

Each round runs every (repo, query) cell once, repo order alternating
per round so both builds sample the same machine-load windows. Prints
per-cell times and the median per (repo, query).

Usage:
    python tools/ab_bench.py --repos /root/repo /tmp/r02_repo \
        --queries ann_topk dedup_minhash text_quality parse_rfc3164 \
        --sf-dir /root/testdata/sf0.1 --cpus 32 --rounds 3
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys

_CHILD = r"""
import json, sys, time
repo, sf_dir, cpus, names = sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4].split(",")
sys.path.insert(0, repo)
import ray
ray.init(address="local", num_cpus=cpus, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import importlib
entry = importlib.import_module("__ray_entry__")
qs = entry.queries()
out = {}
def consume(res):
    if hasattr(res, "iter_batches"):  # Datasets are lazy — must drain
        for b in res.iter_batches(batch_format="pyarrow", batch_size=32768):
            pass
for name in names:
    fn = qs[name]
    consume(fn(sf_dir))  # warm pass (spawn workers, touch inputs)
    t0 = time.perf_counter()
    res = fn(sf_dir)
    if hasattr(res, "iter_batches"):
        n = 0
        for b in res.iter_batches(batch_format="pyarrow", batch_size=32768):
            n += b.num_rows
    out[name] = round(time.perf_counter() - t0, 3)
ray.shutdown()
print("AB_RESULT " + json.dumps(out))
"""


def run_cell(repo: str, sf_dir: str, cpus: int, names: list[str]) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD, repo, sf_dir, str(cpus),
         ",".join(names)],
        capture_output=True, text=True, cwd=repo, timeout=1200)
    for line in proc.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])
    raise RuntimeError(f"A/B child failed in {repo}:\n{proc.stdout}\n"
                       f"{proc.stderr[-2000:]}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repos", nargs=2, required=True,
                    help="two repo roots (A B)")
    ap.add_argument("--queries", nargs="+", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    acc: dict[tuple[str, str], list[float]] = {}
    for rnd in range(args.rounds):
        order = args.repos if rnd % 2 == 0 else list(reversed(args.repos))
        for repo in order:
            cell = run_cell(repo, args.sf_dir, args.cpus, args.queries)
            for q, t in cell.items():
                acc.setdefault((repo, q), []).append(t)
            print(f"round {rnd} {repo}: {json.dumps(cell)}", flush=True)
    summary = {f"{repo}:{q}": round(statistics.median(v), 3)
               for (repo, q), v in acc.items()}
    print(json.dumps({"medians": summary,
                      "rounds": args.rounds,
                      "cpus": args.cpus,
                      "sf_dir": args.sf_dir}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
