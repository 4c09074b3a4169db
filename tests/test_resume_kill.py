"""Crash-resume: SIGKILL a run mid-flight (real process group kill, not a
simulated deletion), resume, and require output identical to an uninterrupted
run (north rule: 'resumes mid-table after failure')."""

from __future__ import annotations

import glob
import os
import signal
import subprocess
import sys
import time

import pandas as pd
import pyarrow.parquet as pq

from tests.conftest import MODELS_DIR

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_SCRIPT = """
import os, sys
sys.path.insert(0, {repo!r})
os.environ.setdefault("POLARS_MAX_THREADS", "1")
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from data_quality_framework_ray.pipelines import quality_filter as qf
qf.run({clips!r}, {out!r}, models_dir={models!r})
ray.shutdown()
"""


def _final_df(out_dir):
    files = glob.glob(os.path.join(out_dir, "final", "frag-*", "*.parquet"))
    df = pd.concat([pq.read_table(f).to_pandas() for f in files], ignore_index=True)
    df["drop_reasons"] = df["drop_reasons"].map(tuple)
    return df.sort_values("clip_id").reset_index(drop=True)


def _spawn(clips_dir, out):
    code = RUN_SCRIPT.format(repo=REPO, clips=clips_dir, out=out, models=MODELS_DIR)
    return subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                            start_new_session=True)  # own pgid → killable tree


def test_kill_and_resume_identical_output(clips_dir, pipeline_out, tmp_path):
    out = str(tmp_path / "killed")
    p = _spawn(clips_dir, out)
    lineage_glob = os.path.join(out, "lineage", "*.json")
    killed_midway = False
    deadline = time.time() + 180
    while time.time() < deadline:
        if p.poll() is not None:
            break  # finished before we could kill — still a valid (weaker) case
        if len(glob.glob(lineage_glob)) >= 1:
            os.killpg(p.pid, signal.SIGKILL)
            killed_midway = True
            break
        time.sleep(0.05)
    p.wait(timeout=60)

    done_before_resume = len(glob.glob(lineage_glob))
    # resume in a fresh process to completion
    p2 = _spawn(clips_dir, out)
    assert p2.wait(timeout=300) == 0

    assert len(glob.glob(lineage_glob)) == 6  # all fragments DONE
    resumed = _final_df(out)
    baseline = _final_df(pipeline_out)
    pd.testing.assert_frame_equal(
        resumed.drop(columns=["drop_reasons"]).reset_index(drop=True),
        baseline.drop(columns=["drop_reasons"]).reset_index(drop=True),
        check_like=True)
    assert (resumed["drop_reasons"] == baseline["drop_reasons"]).all()
    # record what actually happened so a silent always-finishes regression
    # in the kill window is visible in the test output
    print(f"killed_midway={killed_midway} frags_done_at_kill={done_before_resume}")
