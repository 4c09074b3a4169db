"""Phase-B distributed dedup fallback: forcing the winner map over the
broadcast limit must switch to the Dataset.join path and produce IDENTICAL
final decisions (VERDICT.md item 2, quality_filter site)."""

from __future__ import annotations

import glob
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from data_quality_framework_ray import config
from tests.conftest import MODELS_DIR


def _final_df(out_dir):
    files = glob.glob(os.path.join(out_dir, "final", "frag-*", "*.parquet"))
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


def test_pack_unpack_reasons_injective():
    """Count-prefixed encoding round-trips [] vs [''] distinctly... ['']
    and separator-bearing elements are rejected loudly instead of being
    silently aliased (round-2 advice finding)."""
    import pytest

    from data_quality_framework_ray.pipelines.quality_filter import (
        _pack_reasons, _unpack_reasons)

    good = pa.table({"drop_reasons": pa.array(
        [[], ["a"], ["a", "b"], ["duplicate"], []],
        type=pa.list_(pa.string()))})
    rt = _unpack_reasons(_pack_reasons(good))
    assert rt["drop_reasons"].to_pylist() == good["drop_reasons"].to_pylist()

    for bad_val in ([[""]], [["a\x1fb"]]):
        bad = pa.table({"drop_reasons": pa.array(
            bad_val, type=pa.list_(pa.string()))})
        with pytest.raises(ValueError):
            _pack_reasons(bad)


def test_apply_dup_mask_touched_rows_only():
    """Offset-surgery rebuild == reference pylist rebuild, duplicate reason
    inserted in sorted position, untouched rows byte-identical."""
    import bisect

    import numpy as np

    from data_quality_framework_ray.pipelines.quality_filter import (
        _apply_dup_mask)

    reasons = [["alpha"], [], ["beta", "zeta"], ["a", "z"], []]
    batch = pa.table({
        "clip_id": pa.array([f"c{i}" for i in range(5)]),
        "keep": pa.array([True, True, False, True, True]),
        "drop_reasons": pa.array(reasons, type=pa.list_(pa.string()))})
    is_dup = np.array([True, False, True, True, False])
    out = _apply_dup_mask(batch, is_dup)
    want = [list(r) for r in reasons]
    for i in np.nonzero(is_dup)[0]:
        bisect.insort(want[i], "duplicate")
    assert out["drop_reasons"].to_pylist() == want
    assert out["keep"].to_pylist() == [False, True, False, False, True]
    assert out["clip_id"].to_pylist() == batch["clip_id"].to_pylist()

    none_out = _apply_dup_mask(batch, np.zeros(5, dtype=bool))
    assert none_out is batch


def test_finalize_waves_one_matches_default(ray_session, clips_dir, tmp_path,
                                            monkeypatch):
    """config.FINALIZE_WAVES only re-shapes the finalize task batching;
    forcing a single wave (one task block per CPU) must produce final
    decisions identical to the default wave count."""
    from data_quality_framework_ray.pipelines import quality_filter as qf

    out_d = str(tmp_path / "out_default")
    qf.run(clips_dir, out_d, models_dir=MODELS_DIR)
    default = _final_df(out_d)

    monkeypatch.setattr(config, "FINALIZE_WAVES", 1)
    out_1 = str(tmp_path / "out_one_wave")
    qf.run(clips_dir, out_1, models_dir=MODELS_DIR)
    one_wave = _final_df(out_1)

    pd.testing.assert_frame_equal(default, one_wave, check_like=True)
