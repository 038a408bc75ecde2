"""Quiet-epoch scaling artifact collector.

The sandbox host shows co-tenant CPU steal with >10x minute-to-minute
throughput swings, so a scaling measurement is only meaningful when the
box is quiet. This probe:

1. times a fixed single-thread workload (md5 over 32 MiB) and compares
   it to the best time seen so far (stored next to the artifact);
2. if the box is within QUIET_FACTOR of best, runs ONE interleaved
   round of ``bench.py --single-run`` at N and 4N CPUs and appends the
   result (with the probe reading) to BENCH_scaling_r02.jsonl.

Run repeatedly across a session; the committed artifact keeps every
round, quiet or not, plus the probe value that qualifies it — the
scaling claim cites the quiet-epoch rounds.

Usage: python tools/scaling_probe.py [--base 4] [--force]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(ROOT, "BENCH_scaling_r05.jsonl")
STATE = "/tmp/skewer_ray_probe_best.json"
QUIET_FACTOR = 1.15


def probe_seconds() -> float:
    """Fixed single-thread workload; wall time tracks host CPU steal."""
    blob = b"x" * (1 << 25)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        h = hashlib.md5(blob)
        for _ in range(7):
            h = hashlib.md5(h.digest() + blob)
        best = min(best, time.perf_counter() - t0)
    return best


def one_bench(cpus: int, sf_dir: str | None = None,
              passes: int | None = None) -> dict:
    cmd = [sys.executable, os.path.join(ROOT, "bench.py"), "--single-run",
           "--cpus", str(cpus)]
    if sf_dir:
        cmd += ["--sf-dir", sf_dir]
    if passes:
        cmd += ["--passes", str(passes)]
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=ROOT)
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(proc.stderr[-1500:])
    return json.loads(lines[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", type=int, default=4)
    ap.add_argument("--sf-dir", default=None,
                    help="larger input (e.g. a synthetic sf0.5) so each "
                    "pass runs long enough to be ramp-free steady state")
    ap.add_argument("--force", action="store_true",
                    help="record a round even on a noisy box")
    ap.add_argument("--alternate", type=int, default=0, metavar="K",
                    help="protocol v4: K adjacent (N, 4N) single-pass "
                         "subprocess pairs; per-pair efficiency, median "
                         "reported. Pass-level alternation shrinks the "
                         "window the box must stay stationary over from "
                         "minutes (whole arm) to ~1 min (one pair).")
    args = ap.parse_args()

    p = probe_seconds()
    best = p
    if os.path.exists(STATE):
        with open(STATE) as fh:
            best = min(p, json.load(fh)["best"])
    with open(STATE, "w") as fh:
        json.dump({"best": best}, fh)
    quiet = p <= best * QUIET_FACTOR
    print(f"probe {p:.3f}s (best {best:.3f}s) -> "
          f"{'QUIET' if quiet else 'noisy'}")
    if not quiet and not args.force:
        return

    if args.alternate:
        import statistics
        pairs = []
        for _ in range(args.alternate):
            lo = one_bench(args.base, args.sf_dir, passes=1)
            hi = one_bench(args.base * 4, args.sf_dir, passes=1)
            pairs.append((lo["turns_per_sec"], hi["turns_per_sec"]))
        p2 = probe_seconds()
        effs = [(h / l) / 4.0 for l, h in pairs]
        # the round's efficiency IS one concrete pair's efficiency (the
        # lower-middle by rank), so the recorded turns_per_sec fields
        # always satisfy efficiency == (hi/lo)/4 — the same invariant
        # v1-v3 rows carry. (statistics.median would average the two
        # middle pairs at even K, detaching the number from any fields.)
        k = sorted(range(len(effs)),
                   key=lambda i: effs[i])[(len(effs) - 1) // 2]
        med = effs[k]
        row = {
            "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "protocol": "v4",
            "sf": os.path.basename(os.path.normpath(args.sf_dir))
                  if args.sf_dir else "sf0.1",
            "base": args.base,
            "probe_before_s": round(p, 3),
            "probe_after_s": round(p2, 3),
            "probe_best_s": round(best, 3),
            "quiet": quiet and p2 <= best * QUIET_FACTOR,
            "pairs": [[round(l, 1), round(h, 1)] for l, h in pairs],
            "pair_efficiencies": [round(e, 3) for e in effs],
            f"turns_per_sec_{args.base}cpu": pairs[k][0],
            f"turns_per_sec_{args.base * 4}cpu": pairs[k][1],
            "efficiency": round(med, 3),
        }
        with open(ARTIFACT, "a") as fh:
            fh.write(json.dumps(row) + "\n")
        print(json.dumps(row))
        return

    lo = one_bench(args.base, args.sf_dir)
    hi = one_bench(args.base * 4, args.sf_dir)
    p2 = probe_seconds()
    eff = (hi["turns_per_sec"] / lo["turns_per_sec"]) / 4.0
    row = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        # v2 = steady-state protocol (untimed warm pass + median of 3)
        # + row-group-parallel input layout; earlier rows are v1 (cold
        # single pass, 3-file read bottleneck). v3 = v2 on a 5x larger
        # input (sf0.5, 3M turns) so each timed pass is tens of seconds
        # of steady state rather than 1-3s of mostly ramp.
        "protocol": "v3" if args.sf_dir else "v2",
        "sf": os.path.basename(os.path.normpath(args.sf_dir))
              if args.sf_dir else "sf0.1",
        "base": args.base,
        "probe_before_s": round(p, 3),
        "probe_after_s": round(p2, 3),
        "probe_best_s": round(best, 3),
        "quiet": quiet and p2 <= best * QUIET_FACTOR,
        f"turns_per_sec_{args.base}cpu": lo["turns_per_sec"],
        f"turns_per_sec_{args.base * 4}cpu": hi["turns_per_sec"],
        "efficiency": round(eff, 3),
    }
    with open(ARTIFACT, "a") as fh:
        fh.write(json.dumps(row) + "\n")
    print(json.dumps(row))


if __name__ == "__main__":
    main()
