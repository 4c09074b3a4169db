"""Phase-B distributed dedup fallback: forcing the winner map over the
broadcast limit must switch to the Dataset.join path and produce IDENTICAL
final decisions (VERDICT.md item 2, quality_filter site)."""

from __future__ import annotations

import glob
import os

import pandas as pd
import pyarrow.parquet as pq

from data_quality_framework_ray import config
from tests.conftest import MODELS_DIR


def _final_df(out_dir):
    files = glob.glob(os.path.join(out_dir, "final", "**", "*.parquet"), recursive=True)
    df = pd.concat([pq.read_table(f).to_pandas() for f in files], ignore_index=True)
    df["drop_reasons"] = df["drop_reasons"].map(tuple)
    return (df.sort_values("clip_id").reset_index(drop=True)
            .sort_index(axis=1))


def test_join_path_matches_broadcast(ray_session, clips_dir, tmp_path, monkeypatch):
    from data_quality_framework_ray.pipelines import quality_filter as qf

    out_b = str(tmp_path / "out_broadcast")
    qf.run(clips_dir, out_b, models_dir=MODELS_DIR)
    broadcast = _final_df(out_b)
    assert (~broadcast["keep"]).any()
    assert broadcast["drop_reasons"].map(lambda r: "duplicate" in r).any()

    monkeypatch.setattr(config, "BROADCAST_DUP_LIMIT", 0)
    out_j = str(tmp_path / "out_join")
    qf.run(clips_dir, out_j, models_dir=MODELS_DIR)
    joined = _final_df(out_j)

    pd.testing.assert_frame_equal(broadcast, joined, check_like=True)
