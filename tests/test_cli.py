"""CLI entry point (the reference's `python main.py` analogue)."""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_run_and_suite_and_report(tmp_path):
    """End-to-end in a subprocess (the CLI owns its own Ray session)."""
    from data_quality_framework_ray.datagen.clips import generate_clips

    clips = str(tmp_path / "clips")
    generate_clips(clips, n_clips=120, n_fragments=2, seed=5)
    out = str(tmp_path / "out")
    env = dict(os.environ, RAY_ADDRESS="local")
    r = subprocess.run(
        [sys.executable, "-m", "data_quality_framework_ray", "--num-cpus", "4",
         "run", "--input", clips, "--output", out,
         "--models", os.path.join(REPO, "models")],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["frags_processed"] == 2
    assert glob.glob(os.path.join(out, "final", "frag-*", "*.parquet"))

    # suite over one of the decision parquet files (has nulls/kept cols)
    table = glob.glob(os.path.join(out, "final", "frag-*", "*.parquet"))[0]
    suite_out = str(tmp_path / "suite")
    r2 = subprocess.run(
        [sys.executable, "-m", "data_quality_framework_ray", "--num-cpus", "4",
         "suite", "--table", table, "--name", "final",
         "--output", suite_out, "--email-outbox", str(tmp_path / "outbox")],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=420)
    assert r2.returncode in (0, 1), r2.stderr[-2000:]  # checks may fail; CLI must not crash
    run_json = glob.glob(os.path.join(suite_out, "quality_report_*.json"))
    assert run_json
    assert glob.glob(os.path.join(suite_out, "report_*.md"))
    assert glob.glob(os.path.join(str(tmp_path / "outbox"), "*.eml"))

    # report re-render from the JSON
    rep_out = str(tmp_path / "rerender")
    r3 = subprocess.run(
        [sys.executable, "-m", "data_quality_framework_ray", "report",
         "--run-json", run_json[0], "--output", rep_out],
        capture_output=True, text=True, cwd=REPO, timeout=120)
    assert r3.returncode == 0, r3.stderr[-2000:]
    assert os.path.exists(r3.stdout.strip())
