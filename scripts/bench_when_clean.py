"""Retry `bench.py` until a run lands in a clean host window.

The VM's hypervisor neighbor fluctuates on minute timescales, so an 8 s
pre-flight probe (scripts/hostwindow.py) cannot guarantee a multi-minute
run: round-5 measurement saw a CLEAN probe followed by 10.5% mean steal
during the bench it green-lit. This harness closes the loop: probe → run →
check the steal the run itself recorded → accept or retry. Results are only
written when the RUN was clean, so committed records never carry hidden
host noise.

Usage: python scripts/bench_when_clean.py [--scaling] [max_attempts]
Env:   CLEAN_MAX_STEAL (default 3.0, percent, applies to probe and run)
       CLEAN_WAIT_S    (default 120, sleep between attempts)

Writes the accepted JSON line to stdout and (for the default mode) leaves
BENCH_QUERIES.json as written by the accepted run; a rejected run's
BENCH_QUERIES.json is restored from git HEAD.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MAX_STEAL = float(os.environ.get("CLEAN_MAX_STEAL", "3.0"))
WAIT_S = float(os.environ.get("CLEAN_WAIT_S", "120"))


def probe() -> bool:
    p = subprocess.run([sys.executable,
                        os.path.join(REPO, "scripts", "hostwindow.py"),
                        "8", str(MAX_STEAL)], capture_output=True, text=True)
    print(f"probe: {p.stdout.strip()}", file=sys.stderr, flush=True)
    return p.returncode == 0


def restore_queries_file() -> None:
    subprocess.run(["git", "-C", REPO, "checkout", "--", "BENCH_QUERIES.json"],
                   capture_output=True)


def run_steal(rec: dict, scaling: bool) -> float:
    """Max steal across the run's levels; inf when any level is UNMEASURED
    (a null means the monitor lost the window — unknown noise must never be
    accepted as clean nor preferred over a measured run)."""
    if scaling:
        vals = [v for k, v in rec.items()
                if k.startswith("host_steal_pct_")]
        if not vals or any(v is None for v in vals):
            return float("inf")
        return max(vals)
    v = rec.get("host_steal_pct")
    return float("inf") if v is None else v


def main() -> int:
    scaling = "--scaling" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--scaling"]
    max_attempts = int(args[0]) if args else 10
    cmd = [sys.executable, os.path.join(REPO, "bench.py")]
    if scaling:
        cmd.append("--scaling")
    best: tuple[float, str] | None = None  # (steal, stdout line)
    qfile = os.path.join(REPO, "BENCH_QUERIES.json")
    best_qfile = "/tmp/bwc_best_queries.json"
    for attempt in range(1, max_attempts + 1):
        if not probe():
            time.sleep(WAIT_S)
            continue
        p = subprocess.run(cmd, capture_output=True, text=True)
        if p.returncode != 0:
            print(f"attempt {attempt}: bench rc={p.returncode}",
                  file=sys.stderr, flush=True)
            print(p.stderr[-2000:], file=sys.stderr, flush=True)
            return p.returncode  # a crash is a bug, not a window problem
        line = p.stdout.strip().splitlines()[-1]
        rec = json.loads(line)
        steal = run_steal(rec, scaling)
        if steal < MAX_STEAL:
            print(line, flush=True)
            return 0
        if best is None or steal < best[0]:
            best = (steal, line)
            if not scaling and os.path.exists(qfile):
                import shutil
                shutil.copy(qfile, best_qfile)
        print(f"attempt {attempt}: run steal {steal}% >= {MAX_STEAL}% — "
              f"discarding", file=sys.stderr, flush=True)
        if not scaling:
            restore_queries_file()
        time.sleep(WAIT_S)
    # no window met the bar: emit the least-contaminated run, clearly marked
    # (its record self-documents via host_steal_pct); rc=2 so callers can
    # tell an accepted-degraded record from a clean one
    if best is not None:
        print(f"BEST-EFFORT (steal {best[0]}%): {best[1]}", flush=True)
        if not scaling and os.path.exists(best_qfile):
            import shutil
            shutil.copy(best_qfile, qfile)
        return 2
    print("no clean window found", file=sys.stderr)
    return 3


if __name__ == "__main__":
    sys.exit(main())
