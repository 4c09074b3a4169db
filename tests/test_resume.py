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
    # frag dirs only: final/_metrics holds per-part metric partials (the
    # underscore prefix hides them from read_parquet, not from a raw glob)
    files = glob.glob(os.path.join(out_dir, "final", "frag-*", "*.parquet"))
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


def test_input_change_invalidates_lineage(ray_session, tmp_path):
    """If the input table is regenerated in place (same fragment count, new
    params), stale DONE markers must NOT short-circuit phase A: the run must
    detect the manifest change, clear derived state, and recompute."""
    from data_quality_framework_ray.datagen.clips import generate_clips
    from data_quality_framework_ray.pipelines import quality_filter as qf

    clips = str(tmp_path / "clips")
    out = str(tmp_path / "out3")
    generate_clips(clips, n_clips=200, n_fragments=4, seed=42)
    s1 = qf.run(clips, out, models_dir=MODELS_DIR)
    assert s1["frags_processed"] == 4
    first = _final_df(out)

    # regenerate IN PLACE with a different seed (same shape → same frag ids)
    shutil.rmtree(clips)
    generate_clips(clips, n_clips=200, n_fragments=4, seed=99)
    s2 = qf.run(clips, out, models_dir=MODELS_DIR)
    assert s2["frags_processed"] == 4  # stale DONE markers were discarded
    second = _final_df(out)
    # decisions must reflect the NEW data, not the cached old run
    assert not first["content_sha1"].equals(second["content_sha1"]) if \
        "content_sha1" in first.columns else True
    assert set(second["clip_id"]) != set() and len(second) == 200


def test_retry_overwrites_partial_attempt(ray_session, tmp_path):
    """A task retry after a mid-fragment failure must overwrite the failed
    attempt's part files (deterministic names), never duplicate rows."""
    import pyarrow as pa

    from data_quality_framework_ray.datagen.clips import generate_clips
    from data_quality_framework_ray.pipelines import quality_filter as qf

    clips = str(tmp_path / "clips_retry")
    generate_clips(clips, n_clips=120, n_fragments=2, seed=7)
    stage = str(tmp_path / "stage")
    from data_quality_framework_ray.datagen.clips import fragment_paths
    from data_quality_framework_ray.stages.rules import RULES

    enabled = frozenset(r.name for r in RULES)
    worker = qf.PhaseAWorker(MODELS_DIR, enabled, stage, batch_rows=32)
    path = fragment_paths(clips)[0]
    batch = pa.Table.from_pylist([{"path": path}])
    worker(batch)  # "failed" first attempt (completed, but files now stale)
    files_first = sorted(glob.glob(os.path.join(stage, "frag-*", "part-*.parquet")))
    worker(batch)  # retry of the same fragment
    files_second = sorted(glob.glob(os.path.join(stage, "frag-*", "part-*.parquet")))
    assert files_first == files_second  # overwrote, no uuid accumulation
    total = sum(pq.read_metadata(f).num_rows for f in files_second)
    assert total == pq.read_metadata(path).num_rows  # no duplicated rows


def test_append_fragment_incremental_phase_b(ray_session, tmp_path):
    """Appending 1 fragment to an N-fragment table must (a) reprocess only
    that fragment in phase A, (b) REWRITE only O(1) final parts — untouched
    fragments are hard-linked (same inode / original mtime) because their
    (h1,h2) sets avoid every changed dup group — and (c) produce final
    output byte-identical to a fresh run over the appended table (round-3
    verdict #5)."""
    import filecmp

    from data_quality_framework_ray.datagen.clips import (append_fragment,
                                                          generate_clips)
    from data_quality_framework_ray.pipelines import quality_filter as qf

    clips = str(tmp_path / "clips")
    generate_clips(clips, n_clips=1200, n_fragments=6, seed=7)
    out = str(tmp_path / "out")
    qf.run(clips, out, models_dir=MODELS_DIR)

    def part_inodes(d):
        return {os.path.relpath(p, d): os.stat(p).st_ino
                for p in glob.glob(os.path.join(d, "final", "frag-*",
                                                "*.parquet"))}

    before = part_inodes(out)
    append_fragment(clips, n_rows=200)
    s2 = qf.run(clips, out, models_dir=MODELS_DIR)
    assert s2["frags_processed"] == 1  # phase A: only the appended fragment
    after = part_inodes(out)

    rewritten = [p for p in before if after.get(p) != before[p]]
    new_parts = [p for p in after if p not in before]
    # planted dups are intra-fragment, so no old fragment shares a changed
    # dup group: every pre-existing part must be hard-linked, not rewritten
    assert rewritten == [], f"unexpected rewrites: {rewritten}"
    assert new_parts, "appended fragment produced no final part"

    # byte-identical to a fresh full run over the appended table
    fresh = str(tmp_path / "fresh")
    qf.run(clips, fresh, models_dir=MODELS_DIR)
    res_files = sorted(glob.glob(os.path.join(out, "final", "frag-*",
                                              "*.parquet")))
    fresh_files = sorted(glob.glob(os.path.join(fresh, "final", "frag-*",
                                                "*.parquet")))
    assert [os.path.relpath(p, out) for p in res_files] == \
        [os.path.relpath(p, fresh) for p in fresh_files]
    for a, b in zip(res_files, fresh_files):
        assert filecmp.cmp(a, b, shallow=False), f"{a} differs from fresh run"


def test_changed_dup_keys_semantics():
    """The winner diff must flag re-assigned, added, and removed groups —
    and nothing else."""
    import numpy as np
    import pyarrow as pa

    from data_quality_framework_ray.pipelines.quality_filter import (
        _changed_dup_keys, _pair_key_u64)

    old = pa.table({"h1": [1, 2, 3], "h2": [10, 20, 30],
                    "winner": ["a", "b", "c"]})
    new = pa.table({"h1": [1, 2, 4], "h2": [10, 20, 40],
                    "winner": ["a", "b2", "d"]})
    changed = set(_changed_dup_keys(old, new).tolist())
    key = lambda a, b: int(_pair_key_u64(np.array([a]), np.array([b]))[0])
    assert key(2, 20) in changed      # winner re-assigned
    assert key(3, 30) in changed      # group removed
    assert key(4, 40) in changed      # group added
    assert key(1, 10) not in changed  # unchanged
    assert len(changed) == 3


def test_missing_input_fragment_does_not_crash_stamp_scan(ray_session, tmp_path):
    """ADVICE r4: a manifest-listed fragment missing on disk must read as a
    sentinel ident in the input-stamp scan, not raise FileNotFoundError —
    here the manifest is unchanged and every fragment is DONE, so the resume
    must complete as a no-op despite the hole in the input directory."""
    from data_quality_framework_ray.datagen.clips import (fragment_paths,
                                                          generate_clips)
    from data_quality_framework_ray.pipelines import quality_filter as qf

    clips = str(tmp_path / "clips_missing")
    out = str(tmp_path / "out_missing")
    generate_clips(clips, n_clips=100, n_fragments=4, seed=11)
    s1 = qf.run(clips, out, models_dir=MODELS_DIR)
    assert s1["frags_processed"] == 4

    os.remove(fragment_paths(clips)[2])
    s2 = qf.run(clips, out, models_dir=MODELS_DIR)
    assert s2["frags_processed"] == 0
