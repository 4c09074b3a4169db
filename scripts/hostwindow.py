"""Host-window probe: is the box clean enough to record a benchmark?

The sandbox VM shares a hypervisor with invisible tenants. `uptime` load
averages only reflect OUR runnable tasks; the real confound is CPU STEAL —
cycles the hypervisor gives to someone else. Measured in round 5: steal
averaged 13.7% and spiked to 51% across one full bench run, inflating
individual query timings 3-16x while interleaved idle-window runs of the
same queries matched the committed record. Every recorded number in
BASELINE.md / BENCH_QUERIES.json should come from a window this probe
calls CLEAN.

Steal only materializes UNDER LOAD: an idle VM is never shorted, so an
idle probe reads ~0% even when the physical host is overcommitted. The
probe therefore spins one busy worker per CPU for the sample window and
measures steal while demanding the full width — that is what a bench run
will actually experience.

Usage: python scripts/hostwindow.py [seconds] [max_steal_pct]
Exits 0 (CLEAN) when loaded-mean steal < max_steal_pct (default 3.0) and
prints the measured breakdown either way.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time


def sample(seconds: float = 10.0, interval: float = 1.0) -> dict[str, float]:
    """Mean /proc/stat CPU shares (percent) over ``seconds``."""
    names = ["user", "nice", "system", "idle", "iowait", "irq",
             "softirq", "steal"]

    def snap() -> list[int]:
        with open("/proc/stat") as f:
            return [int(x) for x in f.readline().split()[1:9]]

    start = snap()
    deadline = time.time() + seconds
    peak_steal = 0.0
    prev = start
    while time.time() < deadline:
        time.sleep(interval)
        cur = snap()
        d = [y - x for x, y in zip(prev, cur)]
        tot = sum(d) or 1
        peak_steal = max(peak_steal, 100.0 * d[7] / tot)
        prev = cur
    d = [y - x for x, y in zip(start, prev)]
    tot = sum(d) or 1
    out = {n: round(100.0 * v / tot, 2) for n, v in zip(names, d)}
    out["peak_steal"] = round(peak_steal, 2)
    return out


def _spin(deadline: float) -> None:
    x = 0
    while time.time() < deadline:
        x += 1


def sample_loaded(seconds: float = 8.0) -> dict[str, float]:
    """Steal measured while one busy worker per CPU demands the full width."""
    ncpu = os.cpu_count() or 1
    deadline = time.time() + seconds
    procs = [mp.Process(target=_spin, args=(deadline,)) for _ in range(ncpu)]
    for p in procs:
        p.start()
    time.sleep(0.5)  # let the spinners saturate before sampling
    s = sample(max(seconds - 1.0, 1.0), interval=1.0)
    for p in procs:
        p.join()
    return s


def main() -> int:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    max_steal = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0
    s = sample_loaded(seconds)
    clean = s["steal"] < max_steal
    print(f"{'CLEAN' if clean else 'NOISY'} loaded_steal={s['steal']}% "
          f"peak={s['peak_steal']}% user={s['user']}% idle={s['idle']}% "
          f"({seconds:.0f}s loaded window)")
    return 0 if clean else 1


if __name__ == "__main__":
    sys.exit(main())
