"""Ray-FREE multiprocessing control for the 2->8 scaling pair.

Runs the flagship's dominant phase-A kernels (G.711/PCM16 LUT decode + stats
+ the heuristic text rules' vectorized text pass) over the SAME 600k-clip
scaling table that `bench.py --scaling` uses, under plain
`multiprocessing.Pool` at 2 and 8 workers. No Ray, no object store, no
scheduler — whatever efficiency THIS loses from 2 to 8 workers is the box's
memory subsystem, not the engine. Round-2/3 measured the box cap at ~0.88
for 2->8; this script makes that control re-runnable instead of ad-hoc.

    python scripts/scaling_control.py          # levels 2 and 8
    CONTROL_LEVELS="8,32" python scripts/scaling_control.py

Prints one JSON line: per-level seconds + clips/s and the efficiency ratio.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("POLARS_MAX_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")

SCALING_DIR = "/tmp/dqfr_clips_scaling"


def work_fragment(path: str) -> int:
    import pyarrow.parquet as pq

    from data_quality_framework_ray.functions import textstats as T
    from data_quality_framework_ray.functions.audio import decode_stats

    n = 0
    f = pq.ParquetFile(path)
    for batch in f.iter_batches(batch_size=2048,
                                columns=["bytes", "codec", "transcript"]):
        import pyarrow as pa

        t = pa.Table.from_batches([batch])
        decode_stats(t, spectral=False)
        T.text_stats(t["transcript"])
        n += t.num_rows
    return n


def run_level(paths: list[str], workers: int) -> tuple[float, int]:
    t0 = time.time()
    with mp.Pool(workers) as pool:
        counts = pool.map(work_fragment, paths, chunksize=1)
    return time.time() - t0, sum(counts)


def main() -> None:
    from data_quality_framework_ray.datagen.clips import fragment_paths

    if not os.path.exists(os.path.join(SCALING_DIR, "manifest.json")):
        raise SystemExit("run `python bench.py --scaling` once first "
                         "(generates the 600k-clip table)")
    paths = fragment_paths(SCALING_DIR)
    lo, hi = (int(x) for x in
              os.environ.get("CONTROL_LEVELS", "2,8").split(","))
    out = {}
    reps = int(os.environ.get("CONTROL_REPEATS", "2"))
    for _ in range(reps):  # interleaved; min per level (host windows swing)
        for w in (lo, hi):
            sec, clips = run_level(paths, w)
            if w not in out or sec < out[w][0]:
                out[w] = (sec, clips)
    eff = (out[lo][0] / out[hi][0]) / (hi / lo)
    print(json.dumps({
        "metric": f"ray-free multiprocessing control {lo}->{hi} workers",
        f"sec_{lo}": round(out[lo][0], 2), f"sec_{hi}": round(out[hi][0], 2),
        f"clips_per_sec_{lo}": round(out[lo][1] / out[lo][0], 1),
        f"clips_per_sec_{hi}": round(out[hi][1] / out[hi][0], 1),
        "clips": out[hi][1],
        "box_efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
