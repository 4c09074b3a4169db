"""Resume semantics: a restart reprocesses ONLY not-DONE fragments and
produces identical final output (SURVEY.md §5.2 item 4)."""

from __future__ import annotations

import glob
import os
import shutil

import pandas as pd
import pyarrow.parquet as pq

from tests.conftest import MODELS_DIR


def _final_df(out_dir):
    files = glob.glob(os.path.join(out_dir, "final", "**", "*.parquet"), recursive=True)
    df = pd.concat([pq.read_table(f).to_pandas() for f in files], ignore_index=True)
    df["drop_reasons"] = df["drop_reasons"].map(list)
    return df.sort_values("clip_id").reset_index(drop=True)


def test_resume_skips_done_fragments(ray_session, clips_dir, tmp_path):
    from data_quality_framework_ray.pipelines import quality_filter as qf

    out = str(tmp_path / "out")
    s1 = qf.run(clips_dir, out, models_dir=MODELS_DIR)
    assert s1["frags_processed"] == s1["frags_total"]
    baseline = _final_df(out)

    # simulate a crash that lost fragments 1 and 3 mid-write
    for fid in (1, 3):
        os.remove(os.path.join(out, "lineage", f"frag_{fid:05d}.json"))
        shutil.rmtree(os.path.join(out, "decisions", f"frag-{fid:05d}"),
                      ignore_errors=True)

    s2 = qf.run(clips_dir, out, models_dir=MODELS_DIR)
    assert s2["frags_processed"] == 2  # only the lost fragments
    resumed = _final_df(out)
    pd.testing.assert_frame_equal(
        baseline.drop(columns=["drop_reasons"]),
        resumed.drop(columns=["drop_reasons"]),
        check_like=True)
    assert (baseline["drop_reasons"].map(tuple) == resumed["drop_reasons"].map(tuple)).all()


def test_noop_resume(ray_session, clips_dir, tmp_path):
    from data_quality_framework_ray.pipelines import quality_filter as qf

    out = str(tmp_path / "out2")
    qf.run(clips_dir, out, models_dir=MODELS_DIR)
    s2 = qf.run(clips_dir, out, models_dir=MODELS_DIR)
    assert s2["frags_processed"] == 0
