"""Pre-commit tier smoke: EXECUTE every ``__ray_entry__.queries()`` entry at
sf0.1 (the bench tier) and exit nonzero on any exception.

Round 4 shipped a crash that was invisible to the correctness harness
(``scripts/check_correctness.py`` runs at sf0.01; the uint64→i64 polars
inference crash in audio_dup_groups only trips on sf0.1 row order) and killed
the driver bench (BENCH_r04.json rc=1). This script is the gate that would
have caught it: single warm Ray session, one run per query, no timing claims
— pure does-it-execute. Wire into the round checklist next to pytest and
check_correctness.

Usage: python scripts/smoke_sf01.py [only these query names...]
Env:   SMOKE_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

SF_DIR = os.environ.get("SMOKE_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False)
    import __ray_entry__ as entrymod

    only = set(sys.argv[1:])
    failed = []
    t_all = time.time()
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = fn(SF_DIR)
            n = getattr(res, "num_rows", None)
            if n is None:  # .count() forces lazy Datasets exactly once
                n = res.count() if hasattr(res, "count") else len(res)
            print(f"ok   {name}: rows={n} [{time.time() - t0:.1f}s]",
                  flush=True)
        except Exception:
            failed.append(name)
            print(f"FAIL {name} [{time.time() - t0:.1f}s]", flush=True)
            traceback.print_exc()
    print(f"-- smoke {SF_DIR}: {len(failed)} failed "
          f"[{time.time() - t_all:.0f}s total]")
    if failed:
        print("failed:", ", ".join(failed))
    ray.shutdown()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
