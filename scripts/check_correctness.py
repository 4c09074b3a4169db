"""Local replica of the driver's queries-vs-oracle compare (run before every
commit that touches __ray_entry__): executes each queries() entry at sf0.01,
runs the matching oracle_sql() in DuckDB over the same parquet views, and
compares row count + column names + order-insensitive values."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import duckdb
import numpy as np
import pandas as pd

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def _recall_gate(name, got, con, oracles, canon, threshold, el):
    """Shared gate for lossy ANN paths: recall@k of (id, query_id) pairs vs
    the independent DuckDB exact top-k oracle. Returns True on failure."""
    exact = canon(con.execute(oracles["ann_topk"]).df())
    want_pairs = set(map(tuple, exact[["id", "query_id"]].values))
    got_pairs = set(map(tuple, got[["id", "query_id"]].values))
    recall = len(got_pairs & want_pairs) / max(len(want_pairs), 1)
    if recall < threshold:
        print(f"FAIL {name}: recall {recall:.2f} < {threshold} vs "
              "DuckDB exact top-k oracle")
        return True
    print(f"ok   {name}: rows={len(got)} recall={recall:.2f} "
          f"vs DuckDB exact top-k oracle [{el:.1f}s]")
    return False


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda x: str(x))
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = sys.argv[1:] or list(qs)
    n_fail = 0
    for name in only:
        t0 = time.time()
        try:
            got = canon(to_pandas(qs[name](SF_DIR)))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        el = time.time() - t0
        if name in ("ann_pq", "ann_ivf"):
            # lossy-by-design paths: PQ gated at 0.8 (ADC + exact refine;
            # measured 1.00 here), IVF at 0.9 (nprobe fixed by the query)
            if _recall_gate(name, got, con, oracles, canon,
                            0.8 if name == "ann_pq" else 0.9, el):
                n_fail += 1
            continue
        if name == "fingerprints":
            # property gate (no SQL oracle — the rolling hash is engine-
            # defined): deterministic across runs; full-fingerprint collision
            # rate < 5 %; every colliding pair is a textual NEAR-DUPLICATE
            # (word-3-gram Jaccard >= 0.5) — the sketch's defining property.
            again = canon(to_pandas(qs[name](SF_DIR)))
            det = got.equals(again)
            n_rows = len(got)
            rate = (n_rows - got["fingerprint"].nunique()) / max(n_rows, 1)
            texts = dict(con.execute(
                "SELECT doc_id, text FROM documents").fetchall())

            def sh(t):
                w = t.split()
                return set(zip(*[w[j:] for j in range(3)])) or {tuple(w)}

            bad_pairs = 0
            for _, grp in got.groupby("fingerprint"):
                ids = [int(x) for x in grp["doc_id"]]
                for i in range(1, len(ids)):
                    a, b = sh(texts[ids[0]]), sh(texts[ids[i]])
                    if len(a & b) / max(len(a | b), 1) < 0.5:
                        bad_pairs += 1
            if not det or rate > 0.05 or bad_pairs:
                print(f"FAIL {name}: deterministic={det} "
                      f"collision_rate={rate:.4f} non_neardup_collisions={bad_pairs}")
                n_fail += 1
            else:
                print(f"ok   {name}: rows={n_rows} deterministic, "
                      f"collisions only between near-dups "
                      f"(rate={rate:.4f}) [{el:.1f}s]")
            continue
        if name == "langid_documents":
            # property gate: the documents table's text is monolingual
            # technical English regardless of its `lang` METADATA label
            # (verified by inspection — the label is not reflected in the
            # content), so a correct model identifies >=95 % of rows as 'en';
            # per-language discrimination is proven by the clip pipeline's
            # F1=1.0 against per-language transcripts (tests/test_pipeline).
            en_rate = (got["pred_lang"] == "en").mean()
            again = canon(to_pandas(qs[name](SF_DIR)))
            det = got.equals(again)
            if en_rate < 0.95 or not det:
                print(f"FAIL {name}: en_rate={en_rate:.3f} deterministic={det}")
                n_fail += 1
            else:
                print(f"ok   {name}: rows={len(got)} en_rate={en_rate:.3f} "
                      f"deterministic [{el:.1f}s]")
            continue
        if name == "langid_multilingual":
            # HARD gate (round-3 verdict #7): per-row agreement with the
            # datagen-stored truth label >= 99%, plus determinism — not an
            # aggregate en-rate proxy
            agree = (got["pred_lang"] == got["truth_lang"]).mean()
            per_lang = (got.assign(__ok=got["pred_lang"] == got["truth_lang"])
                        .groupby("truth_lang")["__ok"].mean())
            again = canon(to_pandas(qs[name](SF_DIR)))
            det = got.equals(again)
            n_langs = got["truth_lang"].nunique()
            if agree < 0.99 or not det or n_langs < 6:
                print(f"FAIL {name}: per-row agreement={agree:.4f} "
                      f"deterministic={det} langs={n_langs} "
                      f"(per-lang: {per_lang.round(3).to_dict()})")
                n_fail += 1
            else:
                print(f"ok   {name}: rows={len(got)} per-row truth agreement "
                      f"{agree:.4f} over {n_langs} languages, deterministic "
                      f"[{el:.1f}s]")
            continue
        if name == "audio_dup_groups":
            # gate: every planted (dup, source) pair from the datagen truth
            # must share a cluster (recall 1.0 — planted dups are bit-exact
            # copies, so the codec-invariant fingerprint MUST catch them);
            # determinism across runs
            import glob as _glob

            import pyarrow.parquet as _pq

            import __ray_entry__ as _em

            clips_dir = _em._clips_dir_for(SF_DIR)
            truth_files = sorted(_glob.glob(os.path.join(clips_dir,
                                                         "_truth_*.parquet")))
            pairs = []
            for tf in truth_files:
                tt = _pq.read_table(tf, columns=["clip_id", "dup_of"])
                for cid, src in zip(tt["clip_id"].to_pylist(),
                                    tt["dup_of"].to_pylist()):
                    if src is not None:
                        pairs.append((cid, src))
            rep = dict(zip(got["clip_id"], got["cluster_rep"]))
            missed = sum(1 for a, b in pairs
                         if rep.get(a) is None or rep.get(a) != rep.get(b))
            again = canon(to_pandas(qs[name](SF_DIR)))
            det = got.equals(again)
            if missed or not det or not pairs:
                print(f"FAIL {name}: {missed}/{len(pairs)} planted dup pairs "
                      f"not co-clustered (deterministic={det})")
                n_fail += 1
            else:
                print(f"ok   {name}: rows={len(got)} all {len(pairs)} planted "
                      f"dup pairs co-clustered, deterministic [{el:.1f}s]")
            continue
        if name == "audio_normalize":
            # gate: sampled independent recomputation — audioop decode, pure
            # float gain math; engine gain_db within 1e-6 dB and output byte
            # length == 2×samples (pcm16 standardization)
            import audioop as _audioop

            import numpy as _np
            import pyarrow.parquet as _pq

            import __ray_entry__ as _em
            from data_quality_framework_ray.datagen.clips import fragment_paths

            clips_dir = _em._clips_dir_for(SF_DIR)
            t0_tbl = _pq.read_table(fragment_paths(clips_dir)[0],
                                    columns=["clip_id", "bytes", "codec"])
            by_id = {c: (g, o) for c, g, o in
                     zip(got["clip_id"], got["gain_db"], got["out_bytes"])}
            checked = bad = 0
            for i in range(0, t0_tbl.num_rows, max(t0_tbl.num_rows // 20, 1)):
                cid = t0_tbl["clip_id"][i].as_py()
                bts = t0_tbl["bytes"][i].as_py()
                codec = t0_tbl["codec"][i].as_py()
                if bts is None or codec not in ("pcm16", "ulaw", "alaw"):
                    continue
                if codec == "ulaw":
                    pcm_b = _audioop.ulaw2lin(bts, 2)
                elif codec == "alaw":
                    pcm_b = _audioop.alaw2lin(bts, 2)
                else:
                    pcm_b = bts[: len(bts) - len(bts) % 2]
                x = _np.frombuffer(pcm_b, dtype="<i2").astype(_np.float64) / 32768.0
                g_got, o_got = by_id[cid]
                checked += 1
                if len(x) == 0:
                    if o_got != 0:
                        bad += 1
                    continue
                rms = float(_np.sqrt(_np.mean(x ** 2)))
                if rms <= 0:
                    want_g, want_o = None, 2 * len(x)
                else:
                    want_g = 20.0 * _np.log10(min(0.1 / rms, 100.0))
                    want_o = 2 * len(x)
                ok_g = (g_got is None or (isinstance(g_got, float)
                                          and g_got != g_got)) \
                    if want_g is None else (g_got is not None
                                            and abs(g_got - want_g) < 1e-5)
                if not ok_g or o_got != want_o:
                    bad += 1
            if checked < 10 or bad:
                print(f"FAIL {name}: {bad}/{checked} sampled clips diverge "
                      "from independent gain recomputation")
                n_fail += 1
            else:
                print(f"ok   {name}: rows={len(got)} sampled gain/length ≡ "
                      f"audioop recomputation ({checked} clips) [{el:.1f}s]")
            continue
        if name == "audio_spectral":
            # gate: sampled independent float64 recomputation of the
            # centroid/flatness formulas (audioop decode, fresh rfft with
            # the same zero-pad rule); engine kernel is float32 so the
            # comparison carries a quantization tolerance
            import audioop as _audioop

            import numpy as _np
            import pyarrow.parquet as _pq

            import __ray_entry__ as _em
            from data_quality_framework_ray.datagen.clips import fragment_paths
            from data_quality_framework_ray.functions.audio import FFT_CAP

            clips_dir = _em._clips_dir_for(SF_DIR)
            t0_tbl = _pq.read_table(fragment_paths(clips_dir)[0],
                                    columns=["clip_id", "bytes", "codec"])
            by_id = {c: (ce, fl) for c, ce, fl in
                     zip(got["clip_id"], got["spectral_centroid"],
                         got["spectral_flatness"])}
            checked = bad = 0
            for i in range(0, t0_tbl.num_rows, max(t0_tbl.num_rows // 20, 1)):
                cid = t0_tbl["clip_id"][i].as_py()
                bts = t0_tbl["bytes"][i].as_py()
                codec = t0_tbl["codec"][i].as_py()
                if bts is None or codec not in ("pcm16", "ulaw", "alaw"):
                    continue
                if codec == "ulaw":
                    pcm_b = _audioop.ulaw2lin(bts, 2)
                elif codec == "alaw":
                    pcm_b = _audioop.alaw2lin(bts, 2)
                else:
                    pcm_b = bts[: len(bts) - len(bts) % 2]
                x = (_np.frombuffer(pcm_b, dtype="<i2")
                     .astype(_np.float64) / 32768.0)
                ce_got, fl_got = by_id[cid]
                checked += 1
                if len(x) == 0:
                    if ce_got == ce_got or fl_got == fl_got:  # want NaN
                        bad += 1
                    continue
                n_in = min(len(x), FFT_CAP)
                n_fft = 1 << (n_in - 1).bit_length()
                spec = _np.abs(_np.fft.rfft(x[:n_in], n=n_fft))
                power = spec * spec + 1e-12
                freqs = _np.arange(len(power), dtype=_np.float64)
                ce = float((freqs @ power)
                           / (power.sum() * max(len(power) - 1, 1)))
                fl = float(_np.exp(_np.mean(_np.log(power)))
                           / _np.mean(power))
                # float32 kernel vs float64 oracle: power sums agree to
                # ~1e-4 relative; flatness's log-mean amplifies low-power
                # quantization so it gets a looser bound
                if abs(ce_got - ce) > 5e-3 * max(abs(ce), 1e-3) + 1e-5 \
                        or abs(fl_got - fl) > 0.05 * max(fl, 1e-6) + 1e-5:
                    bad += 1
            if checked < 10 or bad:
                print(f"FAIL {name}: {bad}/{checked} sampled clips diverge "
                      "from independent spectral recomputation")
                n_fail += 1
            else:
                print(f"ok   {name}: rows={len(got)} sampled centroid/"
                      f"flatness ≡ float64 rfft recomputation "
                      f"({checked} clips) [{el:.1f}s]")
            continue
        if name == "audio_chunks":
            # gate: sampled independent re-slice of the first fragment —
            # chunk count = ceil(n/step), per-chunk sample/byte lengths,
            # AND byte-level round-trip (concat of engine-shaped slices ==
            # original payload trimmed to whole samples)
            import math as _math

            import pyarrow.parquet as _pq

            import __ray_entry__ as _em
            from data_quality_framework_ray.datagen.clips import fragment_paths

            clips_dir = _em._clips_dir_for(SF_DIR)
            t0_tbl = _pq.read_table(
                fragment_paths(clips_dir)[0],
                columns=["clip_id", "bytes", "codec", "sr_hz"])
            by_clip: dict = {}
            for c, ci, ns, nb in zip(got["clip_id"], got["chunk_idx"],
                                     got["n_samples"], got["n_bytes"]):
                by_clip.setdefault(c, []).append((ci, ns, nb))
            bps_map = {"pcm16": 2, "ulaw": 1, "alaw": 1}
            checked = bad = 0
            for i in range(0, t0_tbl.num_rows, max(t0_tbl.num_rows // 20, 1)):
                cid = t0_tbl["clip_id"][i].as_py()
                bts = t0_tbl["bytes"][i].as_py()
                codec = t0_tbl["codec"][i].as_py()
                sr = t0_tbl["sr_hz"][i].as_py()
                if bts is None or codec not in bps_map or not sr:
                    if cid in by_clip:
                        bad += 1  # rejects must emit nothing
                    checked += 1
                    continue
                bps = bps_map[codec]
                n = len(bts) // bps
                step = max(int(10.0 * int(sr)), 1)
                want = [(ci, min(s + step, n) - s,
                         (min(s + step, n) - s) * bps)
                        for ci, s in enumerate(range(0, n, step))]
                checked += 1
                if sorted(by_clip.get(cid, [])) != want:
                    bad += 1
                    continue
                # byte round-trip on the engine's slicing rule
                recon = b"".join(bts[s * bps:min(s + step, n) * bps]
                                 for s in range(0, n, step))
                if recon != bts[: n * bps]:
                    bad += 1
            if checked < 10 or bad:
                print(f"FAIL {name}: {bad}/{checked} sampled clips diverge "
                      "from independent re-slice")
                n_fail += 1
            else:
                print(f"ok   {name}: rows={len(got)} sampled chunk "
                      f"plans + byte round-trip ≡ ({checked} clips) "
                      f"[{el:.1f}s]")
            continue
        if name == "audio_resample":
            # gate: sampled independent recomputation — audioop decode, a
            # fresh np.interp over the target grid; out_samples must equal
            # round(n·16000/sr), RMS within 1e-9, bytes == 2×out_samples
            import audioop as _audioop

            import numpy as _np
            import pyarrow.parquet as _pq

            import __ray_entry__ as _em
            from data_quality_framework_ray.datagen.clips import fragment_paths

            clips_dir = _em._clips_dir_for(SF_DIR)
            t0_tbl = _pq.read_table(
                fragment_paths(clips_dir)[0],
                columns=["clip_id", "bytes", "codec", "sr_hz"])
            by_id = {c: (i_n, o_n, r, ob) for c, i_n, o_n, r, ob in
                     zip(got["clip_id"], got["in_samples"],
                         got["out_samples"], got["out_rms"],
                         got["out_bytes"])}
            checked = bad = 0
            for i in range(0, t0_tbl.num_rows, max(t0_tbl.num_rows // 20, 1)):
                cid = t0_tbl["clip_id"][i].as_py()
                bts = t0_tbl["bytes"][i].as_py()
                codec = t0_tbl["codec"][i].as_py()
                sr = t0_tbl["sr_hz"][i].as_py()
                if bts is None or codec not in ("pcm16", "ulaw", "alaw") \
                        or not sr:
                    continue
                if codec == "ulaw":
                    pcm_b = _audioop.ulaw2lin(bts, 2)
                elif codec == "alaw":
                    pcm_b = _audioop.alaw2lin(bts, 2)
                else:
                    pcm_b = bts[: len(bts) - len(bts) % 2]
                x = (_np.frombuffer(pcm_b, dtype="<i2")
                     .astype(_np.float64) / 32768.0)
                i_got, o_got, r_got, b_got = by_id[cid]
                checked += 1
                if len(x) == 0:
                    if not (i_got == 0 and o_got == 0 and b_got == 0):
                        bad += 1
                    continue
                if sr == 16000:
                    y = x  # identity path: no interpolation
                else:
                    n_out = int(round(len(x) * 16000 / sr))
                    y = _np.interp(
                        _np.arange(n_out, dtype=_np.float64) * (sr / 16000.0),
                        _np.arange(len(x), dtype=_np.float64), x)
                want_rms = float(_np.sqrt(_np.mean(y ** 2))) if len(y) else None
                ok = (i_got == len(x) and o_got == len(y)
                      and b_got == 2 * len(y))
                if want_rms is not None:
                    # engine RMS is over float32-rounded samples; the fresh
                    # float64 recompute differs by the quantization, bounded
                    ok = ok and r_got is not None \
                        and abs(r_got - want_rms) < 1e-6
                if not ok:
                    bad += 1
            if checked < 10 or bad:
                print(f"FAIL {name}: {bad}/{checked} sampled clips diverge "
                      "from independent resample recomputation")
                n_fail += 1
            else:
                print(f"ok   {name}: rows={len(got)} sampled counts/RMS ≡ "
                      f"np.interp recomputation ({checked} clips) [{el:.1f}s]")
            continue
        if name == "audio_trim":
            # gate: sampled independent recomputation of the VAD bounds via
            # the engine-independent frame loop (same as speech_ratio's gate)
            import audioop as _audioop

            import numpy as _np
            import pyarrow.parquet as _pq

            import __ray_entry__ as _em
            from data_quality_framework_ray.datagen.clips import fragment_paths

            clips_dir = _em._clips_dir_for(SF_DIR)
            t0_tbl = _pq.read_table(
                fragment_paths(clips_dir)[0],
                columns=["clip_id", "bytes", "codec", "sr_hz"])
            by_id = {c: (s, e, o) for c, s, e, o in
                     zip(got["clip_id"], got["trim_start_ms"],
                         got["trim_end_ms"], got["out_bytes"])}
            checked = bad = 0
            for i in range(0, t0_tbl.num_rows, max(t0_tbl.num_rows // 20, 1)):
                cid = t0_tbl["clip_id"][i].as_py()
                bts = t0_tbl["bytes"][i].as_py()
                codec = t0_tbl["codec"][i].as_py()
                sr = t0_tbl["sr_hz"][i].as_py()
                if bts is None or codec not in ("pcm16", "ulaw", "alaw") \
                        or not sr:
                    continue
                if codec == "ulaw":
                    pcm_b = _audioop.ulaw2lin(bts, 2)
                elif codec == "alaw":
                    pcm_b = _audioop.alaw2lin(bts, 2)
                else:
                    pcm_b = bts[: len(bts) - len(bts) % 2]
                x = _np.frombuffer(pcm_b, dtype="<i2").astype(_np.float64) / 32768.0
                frame = max(int(sr * 25 / 1000), 1)
                hop = max(int(sr * 10 / 1000), 1)
                s_got, e_got, o_got = by_id[cid]
                dur_ms = len(x) * 1000.0 / sr
                if len(x) < frame + hop:
                    # engine passes too-short clips through untrimmed
                    checked += 1
                    if not (o_got == 2 * len(x) and s_got == 0.0
                            and e_got == 0.0):
                        bad += 1
                    continue
                gate_amp = 10.0 ** (-35.0 / 20.0)
                e = [float(_np.sqrt(_np.mean(x[s:s + frame] ** 2)))
                     for s in range(0, len(x) - frame + 1, hop)]
                active = [v > gate_amp for v in e]
                checked += 1
                if not any(active):
                    if not (o_got == 0 and abs(s_got - dur_ms) < 1e-6
                            and e_got == 0.0):
                        bad += 1
                    continue
                # independent run-merge (mirror of the documented semantics)
                segs, cur = [], None
                for fi, a in enumerate(active):
                    if a and cur is None:
                        cur = [fi, fi + 1]
                    elif a:
                        cur[1] = fi + 1
                    # engine splits at gap >= min_gap_frames = 3: at inactive
                    # frame fi the gap length so far is fi - cur[1] + 1
                    elif cur is not None and fi - cur[1] + 1 >= 3:
                        segs.append(cur)
                        cur = None
                if cur is not None:
                    segs.append(cur)
                segs = [sg for sg in segs if sg[1] - sg[0] >= 2]
                if not segs:
                    if o_got != 0:
                        bad += 1
                    continue
                want_s = int(segs[0][0] * hop * 1000 / sr)
                want_e_ms = int(((segs[-1][1] - 1) * hop + frame) * 1000 / sr)
                ws = int(want_s * sr / 1000.0)
                we = min(int(_np.ceil(want_e_ms * sr / 1000.0)), len(x))
                if (abs(s_got - want_s) > 1e-6
                        or abs(e_got - max(dur_ms - want_e_ms, 0.0)) > 1e-6
                        or o_got != 2 * (we - ws)):
                    bad += 1
            if checked < 10 or bad:
                print(f"FAIL {name}: {bad}/{checked} sampled clips diverge "
                      "from independent VAD-bound recomputation")
                n_fail += 1
            else:
                print(f"ok   {name}: rows={len(got)} sampled trim bounds ≡ "
                      f"independent recomputation ({checked} clips) [{el:.1f}s]")
            continue
        if name == "speech_ratio":
            # gate: sampled independent recomputation — stdlib audioop decode
            # + naive frame-RMS loop must match the engine's value
            import numpy as _np
            import pyarrow.parquet as _pq

            import __ray_entry__ as _em
            from data_quality_framework_ray.datagen.clips import fragment_paths

            clips_dir = _em._clips_dir_for(SF_DIR)
            t0_tbl = _pq.read_table(fragment_paths(clips_dir)[0],
                                    columns=["clip_id", "bytes", "codec", "sr_hz"])
            by_id = dict(zip(got["clip_id"], got["speech_ratio"]))
            import audioop as _audioop
            checked = bad = 0
            for i in range(0, t0_tbl.num_rows, max(t0_tbl.num_rows // 20, 1)):
                cid = t0_tbl["clip_id"][i].as_py()
                bts = t0_tbl["bytes"][i].as_py()
                codec = t0_tbl["codec"][i].as_py()
                sr = t0_tbl["sr_hz"][i].as_py()
                if bts is None or codec not in ("pcm16", "ulaw", "alaw") or not sr:
                    continue
                if codec == "ulaw":
                    pcm_b = _audioop.ulaw2lin(bts, 2)
                elif codec == "alaw":
                    pcm_b = _audioop.alaw2lin(bts, 2)
                else:
                    pcm_b = bts[: len(bts) - len(bts) % 2]
                x = _np.frombuffer(pcm_b, dtype="<i2").astype(_np.float64) / 32768.0
                frame = max(int(sr * 25 / 1000), 1)
                hop = max(int(sr * 10 / 1000), 1)
                if len(x) < frame:
                    continue
                gate_amp = 10.0 ** (-35.0 / 20.0)
                e = [(_np.sqrt(_np.mean(x[s:s + frame] ** 2)))
                     for s in range(0, len(x) - frame + 1, hop)]
                want_r = round(sum(v > gate_amp for v in e) / len(e), 4)
                v = by_id.get(cid)
                # None / NaN / missing rows must COUNT AS FAILURES (NaN
                # comparisons are always False, which would silently pass)
                if v is None or v != v or abs(v - want_r) > 1e-3:
                    bad += 1
                checked += 1
            if bad or checked < 10:
                print(f"FAIL {name}: {bad} mismatches vs audioop oracle "
                      f"({checked} checked)")
                n_fail += 1
            else:
                print(f"ok   {name}: rows={len(got)} sampled oracle match "
                      f"({checked} clips) [{el:.1f}s]")
            continue
        if name == "speech_segments":
            # gate: sampled clips' segments must equal an independent
            # audioop-decode + the same documented VAD definition
            import numpy as _np
            import pyarrow.parquet as _pq

            import __ray_entry__ as _em
            from data_quality_framework_ray.datagen.clips import fragment_paths
            from data_quality_framework_ray.functions import audio as _A

            clips_dir = _em._clips_dir_for(SF_DIR)
            tbl = _pq.read_table(fragment_paths(clips_dir)[0],
                                 columns=["clip_id", "bytes", "codec", "sr_hz"])
            segs_by_clip: dict = {}
            for _, r in got.iterrows():
                segs_by_clip.setdefault(r["clip_id"], []).append(
                    (int(r["start_ms"]), int(r["end_ms"])))
            import audioop as _audioop
            checked = bad = 0
            for i in range(0, tbl.num_rows, max(tbl.num_rows // 20, 1)):
                cid = tbl["clip_id"][i].as_py()
                bts = tbl["bytes"][i].as_py()
                codec = tbl["codec"][i].as_py()
                sr = tbl["sr_hz"][i].as_py()
                if bts is None or codec not in ("pcm16", "ulaw", "alaw") or not sr:
                    continue
                if codec == "ulaw":
                    pcm_b = _audioop.ulaw2lin(bts, 2)
                elif codec == "alaw":
                    pcm_b = _audioop.alaw2lin(bts, 2)
                else:
                    pcm_b = bts[: len(bts) - len(bts) % 2]
                x = _np.frombuffer(pcm_b, dtype="<i2").astype(_np.float64) / 32768.0
                want = _A.vad_segments(x.astype(_np.float32), int(sr))
                have = segs_by_clip.get(cid, [])
                if list(map(tuple, have)) != list(map(tuple, want)):
                    bad += 1
                checked += 1
            if bad or checked < 10:
                print(f"FAIL {name}: {bad} segment mismatches vs audioop "
                      f"recomputation ({checked} checked)")
                n_fail += 1
            else:
                print(f"ok   {name}: rows={len(got)} sampled segments ≡ "
                      f"audioop recomputation ({checked} clips) [{el:.1f}s]")
            continue
        if name == "clips_decisions":
            # gate: keep/drop decisions vs the INDEPENDENT oracle labeler
            # (tests/oracle.py — audioop decode, its own rule/model impl)
            import pandas as _pd
            import pyarrow.parquet as _pq

            import __ray_entry__ as _em
            from data_quality_framework_ray.datagen.clips import fragment_paths
            from tests import oracle as _oracle

            clips_dir = _em._clips_dir_for(SF_DIR)
            raw = _pd.concat([_pq.read_table(p).to_pandas()
                              for p in fragment_paths(clips_dir)],
                             ignore_index=True)
            labels = _oracle.label_clips(raw, _em.MODELS_DIR)
            want_keep = dict(zip(labels["clip_id"], labels["keep"]))
            got_keep = dict(zip(got["clip_id"], got["keep"]))
            mism = sum(1 for k, v in got_keep.items() if want_keep.get(k) != v)
            if mism or len(got_keep) != len(want_keep):
                print(f"FAIL {name}: {mism} keep/drop mismatches vs oracle "
                      f"labeler ({len(got_keep)}/{len(want_keep)} rows)")
                n_fail += 1
            else:
                print(f"ok   {name}: rows={len(got)} keep/drop ≡ oracle "
                      f"labeler (F1=1.0) [{el:.1f}s]")
            continue
        if name == "approx_distinct":
            exact = con.execute(
                "SELECT count(DISTINCT l_orderkey) FROM lineitem").fetchone()[0]
            approx = float(got["approx"].iloc[0])
            rel = abs(approx - exact) / max(exact, 1)
            if rel > 0.05:
                print(f"FAIL {name}: HLL rel error {rel:.3f} > 0.05 "
                      f"(approx={approx:.0f}, exact={exact})")
                n_fail += 1
            else:
                print(f"ok   {name}: approx={approx:.0f} exact={exact} "
                      f"rel_err={rel:.3f} [{el:.1f}s]")
            continue
        if name == "kmeans_clusters":
            # gate: a plain-numpy Lloyd's replay (same RNG-free init, same
            # argmin tie-break, whole-table float64) must agree on exact
            # per-cluster counts; inertia within float tolerance (the
            # engine folds partial sums in a different order); plus
            # run-twice determinism
            import numpy as _np

            emb = con.execute(
                "SELECT vec_id, embedding FROM embeddings"
                " ORDER BY vec_id").fetchall()
            x = _np.stack([_np.asarray(e, dtype=_np.float64)
                           for _, e in emb])
            cent = x[:8].copy()
            for _ in range(5):
                sc = x @ cent.T - 0.5 * _np.einsum("ij,ij->i", cent, cent)
                a = _np.argmax(sc, axis=1)
                for ci in range(8):
                    m = a == ci
                    if m.any():
                        cent[ci] = x[m].mean(axis=0)
            sc = x @ cent.T - 0.5 * _np.einsum("ij,ij->i", cent, cent)
            a = _np.argmax(sc, axis=1)
            diff = x - cent[a]
            per = _np.einsum("ij,ij->i", diff, diff)
            want = {ci: (int((a == ci).sum()), float(per[a == ci].sum()))
                    for ci in range(8) if (a == ci).any()}
            again = canon(to_pandas(qs[name](SF_DIR)))
            det = got.equals(again)
            got_m = {int(r["cluster"]): (int(r["n"]), float(r["inertia"]))
                     for _, r in got.iterrows()}
            ok = det and set(got_m) == set(want)
            worst = 0.0
            if ok:
                for ci, (n, inr) in want.items():
                    gn, gi = got_m[ci]
                    rel = abs(gi - inr) / max(inr, 1e-12)
                    worst = max(worst, rel)
                    if gn != n or rel > 1e-6:
                        ok = False
            if not ok:
                print(f"FAIL {name}: det={det} clusters "
                      f"engine={sorted(got_m)} oracle={sorted(want)} "
                      f"worst inertia rel {worst:.2e}")
                n_fail += 1
            else:
                print(f"ok   {name}: {len(got_m)} clusters, exact counts, "
                      f"inertia rel ≤ {worst:.1e}, deterministic [{el:.1f}s]")
            continue
        if name == "image_features":
            # gate: per-row replay through the same PUBLIC kernel
            # (synth_image_array -> encode -> images.image_features) must
            # agree exactly; plus run-twice determinism. This checks the
            # distributed actor-pool path end-to-end against a serial
            # recomputation, not the engine against itself: the replay
            # goes straight to functions/images.py with no Ray, no stage,
            # no batch framing.
            import numpy as _np

            from data_quality_framework_ray.functions.images import (
                encode_bmp, encode_ppm, image_features as _feat)

            again = canon(to_pandas(qs[name](SF_DIR)))
            det = got.equals(again)
            ok, worst = det, 0.0
            for _, r in got.iterrows():
                i = int(r["item_id"].split("_")[1])
                img = entrymod.synth_image_array(i)
                enc = encode_bmp if i % 2 == 0 else encode_ppm
                f = _feat(enc(img), 16).astype(_np.float64)
                for gv, wv in ((r["f_mean"], f.mean()), (r["f0"], f[0])):
                    d = abs(float(gv) - round(float(wv), 6))
                    worst = max(worst, d)
                    if d > 1e-9:
                        ok = False
            n_img = len(got)
            if not ok or n_img == 0:
                print(f"FAIL {name}: det={det} rows={n_img} "
                      f"worst |diff| {worst:.2e} vs serial kernel replay")
                n_fail += 1
            else:
                print(f"ok   {name}: rows={n_img} features == serial "
                      f"decode replay (both codecs), deterministic "
                      f"[{el:.1f}s]")
            continue
        if name == "logreg_train":
            # gate: serial numpy replay of the identical RNG-free
            # full-batch GD (features via the shared kernel — itself
            # pinned against plain Python in test_text_analysis); the
            # distributed trainer must agree at rel <= 1e-9 on weights
            # and exactly on accuracy. Raw second run (canon rounds 6dp).
            import numpy as _np
            import pyarrow as _pa

            from data_quality_framework_ray.pipelines.training import (
                FEATURE_NAMES, doc_features)

            rows = con.execute("SELECT text, lang FROM documents"
                               " ORDER BY doc_id").fetchall()
            x, y = doc_features(_pa.array([r[0] for r in rows]),
                                [r[1] for r in rows])
            w = _np.zeros(len(FEATURE_NAMES))
            for _ in range(30):
                p = 1.0 / (1.0 + _np.exp(-(x @ w)))
                w = w - 0.5 * (x.T @ (p - y)) / len(y)
            p = 1.0 / (1.0 + _np.exp(-(x @ w)))
            want_acc = float(((p >= 0.5) == (y >= 0.5)).mean())
            again_raw = to_pandas(qs[name](SF_DIR))
            det = got.equals(canon(again_raw))
            gm = dict(zip(again_raw["feature"], again_raw["value"]))
            worst = max(abs(gm[f] - wv) / max(abs(wv), 1e-12)
                        for f, wv in zip(FEATURE_NAMES, w))
            ok = (det and worst <= 1e-9
                  and abs(gm["train_accuracy"] - want_acc) < 1e-12)
            if not ok:
                print(f"FAIL {name}: det={det} worst weight rel "
                      f"{worst:.2e} acc {gm.get('train_accuracy')} vs "
                      f"{want_acc}")
                n_fail += 1
            else:
                print(f"ok   {name}: weights rel <= {worst:.1e} vs serial "
                      f"GD replay, acc={want_acc:.3f}, deterministic "
                      f"[{el:.1f}s]")
            continue
        if name == "bpe_train":
            # gate: DuckDB recomputes the word counts independently; the
            # shared driver merge loop reruns serially; the merge
            # SEQUENCE (ranks, pairs, counts) must match exactly, plus
            # run-twice determinism
            from data_quality_framework_ray.pipelines.training import \
                bpe_merges_from_vocab

            vocab = dict(con.execute(
                "SELECT w, count(*) FROM (SELECT unnest("
                "regexp_extract_all(lower(text), '\\S+')) AS w"
                " FROM documents) GROUP BY w").fetchall())
            want = bpe_merges_from_vocab(vocab, 20)
            again = canon(to_pandas(qs[name](SF_DIR)))
            det = got.equals(again)
            gm = sorted(
                (int(r["rank"]), r["left"], r["right"], int(r["pair_count"]))
                for _, r in got.iterrows())
            wm = [(i, a, b, c) for i, (a, b, c) in enumerate(want)]
            if not det or gm != wm:
                print(f"FAIL {name}: det={det} merges differ "
                      f"(got {gm[:3]}... want {wm[:3]}...)")
                n_fail += 1
            else:
                print(f"ok   {name}: {len(gm)} merges == independent "
                      f"DuckDB-counts + serial replay, deterministic "
                      f"[{el:.1f}s]")
            continue
        if name == "pca_power":
            # gate: serial numpy replay of the identical centered power
            # iteration (e0 init, same normalization points) at rel <=
            # 1e-9 on components and the Rayleigh quotient; raw second
            # run for precision (canon rounds 6dp)
            import numpy as _np

            emb = con.execute("SELECT embedding FROM embeddings"
                              " ORDER BY vec_id").fetchall()
            x = _np.stack([_np.asarray(e[0], dtype=_np.float64)
                           for e in emb])
            mu = x.mean(axis=0)
            xc = x - mu
            v = _np.zeros(x.shape[1])
            v[0] = 1.0
            rq = 0.0
            for _ in range(8):
                s = xc.T @ (xc @ v)
                rq = float(v @ s) / len(x)
                v = s / _np.linalg.norm(s)
            again_raw = to_pandas(qs[name](SF_DIR))
            det = got.equals(canon(again_raw))
            gm = dict(zip(again_raw["component"].astype(int),
                          again_raw["value"]))
            worst = max(
                [abs(gm[i] - v[i]) / max(abs(v[i]), 1e-12)
                 for i in range(len(v))]
                + [abs(gm[-1] - rq) / max(abs(rq), 1e-12)])
            if not det or worst > 1e-9:
                print(f"FAIL {name}: det={det} worst rel {worst:.2e} "
                      f"vs serial power-iteration replay")
                n_fail += 1
            else:
                print(f"ok   {name}: {len(v)} components rel <= "
                      f"{worst:.1e} vs serial replay, eig={rq:.4f}, "
                      f"deterministic [{el:.1f}s]")
            continue
        if name == "pagerank":
            # gate: plain-numpy whole-graph replay of the identical
            # fixed-iteration formula (3 iters, d=0.85, both edge
            # directions, dangling redistribution); node set must match
            # exactly, ranks at rel <= 1e-9, ranks sum to 1, plus
            # run-twice determinism
            import numpy as _np

            pk, sk = zip(*con.execute(
                "SELECT l_partkey, l_suppkey FROM lineitem").fetchall())
            p = _np.asarray(pk, dtype=_np.int64) * 2
            s = _np.asarray(sk, dtype=_np.int64) * 2 + 1
            src = _np.concatenate([p, s])
            dst = _np.concatenate([s, p])
            nodes = _np.unique(_np.concatenate([src, dst]))
            si = _np.searchsorted(nodes, src)
            di = _np.searchsorted(nodes, dst)
            odeg = _np.bincount(si, minlength=len(nodes))
            dang = odeg == 0
            nn = len(nodes)
            rr = _np.full(nn, 1.0 / nn)
            for _ in range(3):
                w = _np.where(dang, 0.0, 0.85 * rr / _np.maximum(odeg, 1))
                acc = _np.zeros(nn)
                _np.add.at(acc, di, w[si])
                rr = 0.15 / nn + acc + 0.85 * float(rr[dang].sum()) / nn
            # canon() rounds floats to 6dp — fine for the determinism
            # compare, fatal for rel<=1e-9 on ~1e-4 ranks, so the
            # precision compare uses the RAW second run
            again_raw = to_pandas(qs[name](SF_DIR))
            det = got.equals(canon(again_raw))
            gnodes = again_raw.sort_values("node")
            ok = det and gnodes["node"].to_numpy().tolist() == nodes.tolist()
            worst = 1.0
            if ok:
                gr = gnodes["rank"].to_numpy()
                worst = float(_np.max(_np.abs(gr - rr)
                                      / _np.maximum(rr, 1e-300)))
                ok = worst <= 1e-9 and abs(float(gr.sum()) - 1.0) < 1e-9
            if not ok:
                print(f"FAIL {name}: det={det} nodes={len(got)} "
                      f"(oracle {nn}) worst rank rel {worst:.2e}")
                n_fail += 1
            else:
                print(f"ok   {name}: {nn} nodes, rank rel <= {worst:.1e} "
                      f"vs numpy replay, sum=1, deterministic [{el:.1f}s]")
            continue
        if name == "ewma":
            # gate: whole-table pandas ewm replay (same alpha/adjust, same
            # (ts, event_id) order) at rel <= 1e-9 on the RAW second run
            # (canon rounds to 6dp), plus run-twice determinism
            import numpy as _np

            ev = con.execute(
                "SELECT user_id, event_id, ts, value FROM events").df()
            ev = ev.sort_values(["user_id", "ts", "event_id"])
            ev["want"] = (ev.groupby("user_id")["value"]
                          .transform(lambda s: s.ewm(alpha=0.3,
                                                     adjust=False).mean()))
            again_raw = to_pandas(qs[name](SF_DIR))
            det = got.equals(canon(again_raw))
            m = again_raw.merge(ev[["event_id", "want"]], on="event_id")
            rel = (_np.abs(m["ewma"] - m["want"])
                   / _np.maximum(_np.abs(m["want"]), 1e-300))
            worst = float(rel.max())
            if not det or len(m) != len(ev) or worst > 1e-9:
                print(f"FAIL {name}: det={det} rows={len(m)}/{len(ev)} "
                      f"worst rel {worst:.2e}")
                n_fail += 1
            else:
                print(f"ok   {name}: rows={len(m)} ewma rel <= {worst:.1e} "
                      f"vs pandas replay, deterministic [{el:.1f}s]")
            continue
        if name == "approx_distinct_grouped":
            exact = dict(con.execute(
                "SELECT o_orderstatus, count(DISTINCT o_custkey)"
                " FROM orders GROUP BY 1").fetchall())
            again = canon(to_pandas(qs[name](SF_DIR)))
            det = got.equals(again)
            keys = set(got["o_orderstatus"])
            worst = 0.0
            for _, r in got.iterrows():
                ex = exact[r["o_orderstatus"]]
                worst = max(worst, abs(float(r["approx"]) - ex) / max(ex, 1))
            if keys != set(exact) or worst > 0.05 or not det:
                print(f"FAIL {name}: keys={keys == set(exact)} worst rel "
                      f"err {worst:.3f} det={det}")
                n_fail += 1
            else:
                print(f"ok   {name}: {len(keys)} groups, worst rel_err "
                      f"{worst:.3f}, deterministic [{el:.1f}s]")
            continue
        if name == "approx_quantiles":
            # gate: rank error of each estimate vs the exact DuckDB CDF
            # ≤ 2% (sketch bound ~0.6% at k=8192), plus determinism
            n_total = con.execute("SELECT count(*) FROM lineitem").fetchone()[0]
            again = canon(to_pandas(qs[name](SF_DIR)))
            det = got.equals(again)
            worst = 0.0
            for _, r in got.iterrows():
                rank = con.execute(
                    "SELECT count(*) FROM lineitem WHERE l_extendedprice <= ?",
                    [float(r["est"])]).fetchone()[0] / n_total
                worst = max(worst, abs(rank - float(r["p"])))
            if worst > 0.02 or not det:
                print(f"FAIL {name}: worst rank error {worst:.4f} > 0.02 "
                      f"or nondeterministic (det={det})")
                n_fail += 1
            else:
                print(f"ok   {name}: rows={len(got)} worst rank error "
                      f"{worst:.4f} vs exact CDF, deterministic [{el:.1f}s]")
            continue
        if name == "video_frames":
            # gate: sampled clips' per-frame stats vs an INDEPENDENT naive
            # decode (struct header parse + per-frame Python loops, no
            # functions/video.decode_rawv reuse)
            import struct as _struct

            import numpy as _np

            import __ray_entry__ as _em
            from data_quality_framework_ray.functions.video import synth_video

            by_key = {(r["item_id"], int(r["frame_index"])): r
                      for _, r in got.iterrows()}
            checked = bad = 0
            # sample ids from the tier's actual video count — hardcoding
            # range(0,200,23) FAILed spuriously at sf0.001 (50 videos;
            # round-3 ADVICE.md)
            _n_vids = _em._VIDEO_SCALE.get(
                os.path.basename(os.path.normpath(SF_DIR)), 50)
            vids = {f"vid_{i:06d}": i
                    for i in range(0, _n_vids, max(_n_vids // 9, 1))}
            for item_id, seed in vids.items():
                nf = 20 + (seed % 5) * 10
                b = synth_video(seed, n_frames=nf)
                magic, w, h, fps, n = _struct.unpack_from("<4sHHHI", b)
                assert magic == b"RAWV"
                frames = [
                    _np.frombuffer(b, _np.uint8, count=w * h,
                                   offset=14 + k * w * h).reshape(h, w)
                    for k in range(n)]
                step = max(int(round(fps * 500 / 1000.0)), 1)
                prev = None
                for j, k in enumerate(range(0, n, step)):
                    f = frames[k].astype(float)
                    want_luma = f.mean() / 255.0
                    want_motion = (abs(f - prev).mean() / 255.0
                                   if prev is not None else 0.0)
                    prev = f
                    r = by_key.get((item_id, k))
                    # canon() rounds floats to 6 decimals before compare
                    if (r is None or abs(r["mean_luma"] - want_luma) > 2e-6
                            or abs(r["motion"] - want_motion) > 2e-6
                            or int(r["frame_ts_ms"]) != k * 1000 // fps):
                        bad += 1
                    checked += 1
            if bad or checked < 20:
                print(f"FAIL {name}: {bad} frame-stat mismatches vs naive "
                      f"decode ({checked} checked)")
                n_fail += 1
            else:
                print(f"ok   {name}: rows={len(got)} sampled frames ≡ naive "
                      f"independent decode ({checked} frames) [{el:.1f}s]")
            continue
        if name == "audio_dropouts":
            # gate: sampled independent zero-run recomputation — stdlib
            # audioop decode, float64 threshold mask, plain-Python run
            # scan (no numpy diff trick, so the oracle is structurally
            # independent of the engine kernel)
            import audioop as _audioop

            import numpy as _np
            import pyarrow.parquet as _pq

            import __ray_entry__ as _em
            from data_quality_framework_ray.datagen.clips import fragment_paths

            clips_dir = _em._clips_dir_for(SF_DIR)
            tbl = _pq.read_table(fragment_paths(clips_dir)[0],
                                 columns=["clip_id", "bytes", "codec",
                                          "sr_hz"])
            by_id = {r["clip_id"]: r for _, r in got.iterrows()}
            # sample 20 evenly PLUS every planted clip in the fragment —
            # even sampling alone could miss all ~3% planted rows
            import zlib as _zlib

            idxs = list(range(0, tbl.num_rows, max(tbl.num_rows // 20, 1)))
            idxs += [i for i in range(tbl.num_rows)
                     if _zlib.crc32(tbl["clip_id"][i].as_py().encode())
                     % 29 == 0]
            checked = bad = planted_flagged = planted_n = 0
            for i in sorted(set(idxs)):
                cid = tbl["clip_id"][i].as_py()
                bts = tbl["bytes"][i].as_py()
                codec = tbl["codec"][i].as_py()
                sr = tbl["sr_hz"][i].as_py()
                if bts is None or sr is None or sr <= 0 \
                        or codec not in ("pcm16", "ulaw", "alaw"):
                    continue
                bts = entrymod.plant_dropout(bts, codec, sr, cid)
                if codec == "ulaw":
                    pcm_b = _audioop.ulaw2lin(bts, 2)
                elif codec == "alaw":
                    pcm_b = _audioop.alaw2lin(bts, 2)
                else:
                    pcm_b = bts[: len(bts) - len(bts) % 2]
                x = _np.frombuffer(pcm_b, dtype="<i2").astype(
                    _np.float64) / 32768.0
                min_run = max(1, int(sr * 20 / 1000.0))
                runs, cur = [], 0
                for v in _np.abs(x) < 1e-3:
                    if v:
                        cur += 1
                    elif cur:
                        runs.append(cur)
                        cur = 0
                if cur:
                    runs.append(cur)
                q = [rl for rl in runs if rl >= min_run]
                want_n = len(q)
                want_max = max(runs) * 1000.0 / sr if runs else 0.0
                want_frac = sum(q) / len(x) if len(x) else float("nan")
                r = by_id.get(cid)
                if r is None or int(r["n_dropouts"]) != want_n or \
                        abs(float(r["max_run_ms"]) - want_max) > 1e-3 or \
                        (len(x) and abs(float(r["dropout_frac"])
                                        - want_frac) > 1e-6):
                    bad += 1
                if _zlib.crc32(cid.encode()) % 29 == 0:
                    planted_n += 1
                    planted_flagged += int(want_n > 0
                                           and int(r["n_dropouts"]) > 0)
                checked += 1
            again = canon(to_pandas(qs[name](SF_DIR)))
            det = got.equals(again)
            flagged = int((got["n_dropouts"] > 0).sum())
            if bad or not checked or not det or not planted_n \
                    or planted_flagged != planted_n:
                print(f"FAIL {name}: det={det} {bad}/{checked} sampled "
                      "clips disagree with audioop zero-run recomputation; "
                      f"planted flagged {planted_flagged}/{planted_n}")
                n_fail += 1
            else:
                print(f"ok   {name}: rows={len(got)} ({flagged} flagged; "
                      f"all {planted_n} planted in sample) sampled runs ≡ "
                      f"audioop recomputation ({checked} clips), "
                      f"deterministic [{el:.1f}s]")
            continue
        if name == "audio_snr":
            # gate: sampled independent recomputation — audioop decode +
            # cumsum-free per-frame RMS + direct numpy quantiles
            import audioop as _audioop

            import numpy as _np
            import pyarrow.parquet as _pq

            import __ray_entry__ as _em
            from data_quality_framework_ray.datagen.clips import fragment_paths

            clips_dir = _em._clips_dir_for(SF_DIR)
            tbl = _pq.read_table(fragment_paths(clips_dir)[0],
                                 columns=["clip_id", "bytes", "codec",
                                          "sr_hz"])
            by_id = {r["clip_id"]: r for _, r in got.iterrows()}
            checked = bad = 0
            for i in range(0, tbl.num_rows, max(tbl.num_rows // 20, 1)):
                cid = tbl["clip_id"][i].as_py()
                bts = tbl["bytes"][i].as_py()
                codec = tbl["codec"][i].as_py()
                sr = tbl["sr_hz"][i].as_py()
                if bts is None or sr is None or sr <= 0 \
                        or codec not in ("pcm16", "ulaw", "alaw"):
                    continue
                if codec == "ulaw":
                    pcm_b = _audioop.ulaw2lin(bts, 2)
                elif codec == "alaw":
                    pcm_b = _audioop.alaw2lin(bts, 2)
                else:
                    pcm_b = bts[: len(bts) - len(bts) % 2]
                x = _np.frombuffer(pcm_b, dtype="<i2").astype(
                    _np.float64) / 32768.0
                fr, hp = int(sr * 25 / 1000), int(sr * 10 / 1000)
                if len(x) < fr:
                    es = ([_np.sqrt(_np.mean(x * x))] if len(x) else [])
                else:
                    es = [float(_np.sqrt(_np.mean(
                        x[s:s + fr] ** 2)))
                        for s in range(0, len(x) - fr + 1, hp)]
                if es:
                    hi = float(_np.quantile(es, 0.95))
                    lo = float(_np.quantile(es, 0.10))
                    want = (20.0 * _np.log10(hi / lo) if lo > 0
                            else float("nan"))
                else:
                    want = float("nan")
                r = by_id.get(cid)
                gv = None if r is None else float(r["snr_db"])
                if r is None or (
                        (want != want) != (gv != gv)) or \
                        (want == want and abs(gv - want) > 1e-3):
                    bad += 1
                checked += 1
            finite = int(got["snr_db"].notna().sum())
            if bad or not checked or not finite:
                print(f"FAIL {name}: {bad}/{checked} sampled clips "
                      f"disagree with audioop+quantile recomputation "
                      f"(finite={finite})")
                n_fail += 1
            else:
                print(f"ok   {name}: rows={len(got)} ({finite} finite) "
                      f"sampled SNR ≡ independent recomputation "
                      f"({checked} clips) [{el:.1f}s]")
            continue
        if name == "audio_stats":
            # gate: sampled independent recomputation — stdlib audioop decode
            # in float64 must reproduce n_samples exactly and rms/clip_frac/
            # silence_frac within float32-accumulation tolerance
            import numpy as _np
            import pyarrow.parquet as _pq

            import __ray_entry__ as _em
            from data_quality_framework_ray.datagen.clips import fragment_paths

            clips_dir = _em._clips_dir_for(SF_DIR)
            tbl = _pq.read_table(fragment_paths(clips_dir)[0],
                                 columns=["clip_id", "bytes", "codec"])
            by_id = {r["clip_id"]: r for _, r in got.iterrows()}
            import audioop as _audioop
            checked = bad = 0
            for i in range(0, tbl.num_rows, max(tbl.num_rows // 20, 1)):
                cid = tbl["clip_id"][i].as_py()
                bts = tbl["bytes"][i].as_py()
                codec = tbl["codec"][i].as_py()
                if bts is None or codec not in ("pcm16", "ulaw", "alaw"):
                    continue
                if codec == "ulaw":
                    pcm_b = _audioop.ulaw2lin(bts, 2)
                elif codec == "alaw":
                    pcm_b = _audioop.alaw2lin(bts, 2)
                else:
                    pcm_b = bts[: len(bts) - len(bts) % 2]
                x = _np.frombuffer(pcm_b, dtype="<i2").astype(_np.float64) / 32768.0
                a = _np.abs(x)
                k = len(x)
                # clip level is per-codec (99.9% of that codec's decoded
                # full scale) — same DEFINITION as functions/audio.CLIP_LEVEL,
                # restated literally so the oracle stays independent
                _clip_lvl = {"pcm16": 0.999 * (32767.0 / 32768.0),
                             "ulaw": 0.999 * (32124.0 / 32768.0),
                             "alaw": 0.999 * (32256.0 / 32768.0)}[codec]
                want = {
                    "n_samples": k,
                    "rms": float(_np.sqrt(_np.mean(x * x))) if k else float("nan"),
                    "clip_frac": float((a >= _clip_lvl).sum()) / k if k else float("nan"),
                    "silence_frac": float((a < 1e-3).sum()) / k if k else float("nan"),
                }
                r = by_id.get(cid)
                # missing / None / NaN rows must COUNT AS FAILURES
                if r is None or int(r["n_samples"]) != k:
                    bad += 1
                elif k and any(
                        r[c] is None or r[c] != r[c]
                        or abs(float(r[c]) - want[c]) > 1e-4
                        for c in ("rms", "clip_frac", "silence_frac")):
                    bad += 1
                checked += 1
            if bad or checked < 10:
                print(f"FAIL {name}: {bad} mismatches vs audioop oracle "
                      f"({checked} checked)")
                n_fail += 1
            else:
                print(f"ok   {name}: rows={len(got)} sampled stats ≡ audioop "
                      f"recomputation ({checked} clips) [{el:.1f}s]")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={len(got)} (rows-only, no oracle) [{el:.1f}s]")
            continue
        want = canon(con.execute(oracles[name]).fetchdf())
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        eq = got.astype(str).values == want.astype(str).values
        if not eq.all():
            bad = np.nonzero(~eq.all(axis=1))[0][:3]
            print(f"FAIL {name}: {int((~eq.all(axis=1)).sum())} mismatched rows; "
                  f"e.g.\n{got.iloc[bad]}\nvs\n{want.iloc[bad]}")
            n_fail += 1
            continue
        print(f"ok   {name}: rows={len(got)} MATCH [{el:.1f}s]")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
