"""Flagship pipeline vs the independent oracle labeler: keep/drop F1 ≥ 0.99,
scrubbed-transcript equality, reason-list equality, transcript passthrough
(BASELINE.json decision-fidelity gate)."""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq


def _final_df(pipeline_out) -> pd.DataFrame:
    files = glob.glob(os.path.join(pipeline_out, "final", "frag-*", "*.parquet"))
    df = pd.concat([pq.read_table(f).to_pandas() for f in files], ignore_index=True)
    return df.sort_values("clip_id").reset_index(drop=True)


def test_keep_f1_vs_oracle(pipeline_out, oracle_labels):
    got = _final_df(pipeline_out)
    want = oracle_labels.sort_values("clip_id").reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["clip_id"].values == want["clip_id"].values).all()
    g = got["keep"].to_numpy(dtype=bool)
    w = want["keep"].to_numpy(dtype=bool)
    tp = int((g & w).sum())
    fp = int((g & ~w).sum())
    fn = int((~g & w).sum())
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    f1 = 2 * precision * recall / max(precision + recall, 1e-12)
    mism = np.nonzero(g != w)[0]
    assert f1 >= 0.99, (f1, got.iloc[mism[:5]][["clip_id", "drop_reasons"]],
                        want.iloc[mism[:5]][["clip_id", "drop_reasons"]])


def test_drop_reasons_exact_match(pipeline_out, oracle_labels):
    got = _final_df(pipeline_out)
    want = oracle_labels.sort_values("clip_id").reset_index(drop=True)
    for i in range(len(got)):
        g = list(got["drop_reasons"].iloc[i])
        w = list(want["drop_reasons"].iloc[i])
        assert g == w, (got["clip_id"].iloc[i], g, w)


def test_scrubbed_transcript_equality(pipeline_out, oracle_labels):
    got = _final_df(pipeline_out)
    want = oracle_labels.sort_values("clip_id").reset_index(drop=True)
    for i in range(len(got)):
        g, w = got["scrubbed_transcript"].iloc[i], want["scrubbed_transcript"].iloc[i]
        assert (g is None and w is None) or g == w, (got["clip_id"].iloc[i], g, w)
    assert (got["n_pii"].to_numpy() == want["n_pii"].to_numpy()).all()


def test_lang_and_ppl_match(pipeline_out, oracle_labels):
    got = _final_df(pipeline_out)
    want = oracle_labels.sort_values("clip_id").reset_index(drop=True)
    for i in range(len(got)):
        assert (got["lang"].iloc[i] or None) == (want["lang"].iloc[i] or None)
    g, w = got["ppl"].to_numpy(), want["ppl"].to_numpy()
    ok = np.isnan(g) == np.isnan(w)
    assert ok.all()
    m = ~np.isnan(g)
    assert np.allclose(g[m], w[m], rtol=1e-6)


def test_transcript_passthrough_byte_equal(pipeline_out, clips_dir):
    from data_quality_framework_ray.datagen.clips import fragment_paths

    src = pd.concat([pq.read_table(p, columns=["clip_id", "transcript"]).to_pandas()
                     for p in fragment_paths(clips_dir)], ignore_index=True)
    got = _final_df(pipeline_out)[["clip_id", "transcript"]]
    m = src.merge(got, on="clip_id", suffixes=("_src", "_out"))
    assert len(m) == len(src)
    for a, b in zip(m["transcript_src"], m["transcript_out"]):
        assert (a is None and b is None) or a == b


def test_metrics_consistency(pipeline_out):
    got = _final_df(pipeline_out)
    mdir = sorted(glob.glob(os.path.join(pipeline_out, "metrics", "run_*")))[-1]
    per_frag = pq.read_table(os.path.join(mdir, "per_fragment.parquet")).to_pandas()
    assert per_frag["rows"].sum() == len(got)
    assert per_frag["kept"].sum() == int(got["keep"].sum())
    reasons = pq.read_table(os.path.join(mdir, "reasons.parquet")).to_pandas()
    exploded = got["drop_reasons"].explode().dropna().value_counts()
    for _, r in reasons.iterrows():
        assert exploded[r["reason"]] == r["cnt"]


def test_lineage_complete(pipeline_out, clips_dir):
    from data_quality_framework_ray.sources.fragments import FragmentStore
    from data_quality_framework_ray.state.checkpoint import LineageLog

    store = FragmentStore(clips_dir)
    lin = LineageLog(pipeline_out)
    assert lin.done_frag_ids() == set(store.frag_ids())
    for fid in store.frag_ids():
        rec = lin.read(fid)
        assert rec["rows_in"] == store.num_rows(fid) == rec["rows_out"]
