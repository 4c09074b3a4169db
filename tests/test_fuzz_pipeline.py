"""Property fuzz: the engine's phase-A kernel chain must agree with the
independent oracle on ARBITRARY clip rows (not just datagen's planted
defects) — nulls, wrong codecs, truncated bytes, unicode soup, PII-ish
fragments. Runs the pure function chain (decode → rules → scorers → combine)
without Ray; Ray only changes scheduling, not these kernels."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from data_quality_framework_ray.datagen.clips import SCHEMA
from data_quality_framework_ray.functions import audio as A
from data_quality_framework_ray.pipelines.quality_filter import combine_decisions
from data_quality_framework_ray.stages.decode import decode_stats_stage
from data_quality_framework_ray.stages.rules import rules_and_scrub
from data_quality_framework_ray.stages.scorers import QualityScorer
from tests import oracle
from tests.conftest import MODELS_DIR

_SCORER = None


def engine_label(rows: list[dict]):
    global _SCORER
    if _SCORER is None:
        _SCORER = QualityScorer(MODELS_DIR)
    t = pa.Table.from_pylist(rows, schema=SCHEMA)
    t = decode_stats_stage(t)
    t = rules_and_scrub(t)
    t = _SCORER(t)
    return combine_decisions(t)


texts = st.one_of(
    st.none(),
    # BMP only: astral codepoints hit Unicode-VERSION skew between CPython's
    # unicodedata (15.0) and Rust regex's tables (newer) — e.g. U+13460 is
    # Cn in one and Lo in the other. A data-version disagreement, not an
    # engine bug; real corpora are unaffected.
    st.text(alphabet=st.characters(max_codepoint=0xFFFF,
                                   blacklist_categories=("Cs",)),
            max_size=120),
    st.sampled_from([
        "", "   ", "ab", "la la la la la la", "the cat sat on the mat today",
        "mail me x@y.com or +1 234 567 8901", "123-45-6789",
        "#$%@!&*#$%@!&*", "über die brücke, naïve café",
        "frak this gorram data", "a" * 6000,
        "\x1f", "0\x1f0", "\x1c\x1d\x1e\x1f", "\x85", " ok",
    ]),
)
codecs = st.sampled_from(["pcm16", "ulaw", "alaw", "mp3", "opus", None])
srs = st.sampled_from([8000, 16000, 22050, 44100, 12345, 0, None])
durs = st.sampled_from([-5, 0, 40, 500, 2000, None])


@st.composite
def clip_rows(draw):
    n = draw(st.integers(1, 6))
    rows = []
    for i in range(n):
        codec = draw(codecs)
        sr = draw(srs)
        dur = draw(durs)
        mode = draw(st.integers(0, 3))
        if mode == 0 or codec not in A.CODEC_BPS or not sr or not dur or dur <= 0:
            b = draw(st.one_of(st.none(), st.binary(max_size=64)))
        else:
            nsamp = round(dur * sr / 1000)
            x = 0.3 * np.sin(np.arange(nsamp) * 0.05)
            b = A.encode(x, codec)
            if mode == 2:
                b = b[: max(len(b) - 7, 0)]   # truncation
        rows.append({"clip_id": f"c{i:03d}", "bytes": b, "sr_hz": sr,
                     "dur_ms": dur, "codec": codec,
                     "transcript": draw(texts), "frag_id": 0})
    if n >= 2 and draw(st.booleans()):  # planted duplicate pair
        rows[-1] = {**rows[0], "clip_id": rows[-1]["clip_id"]}
    return rows


@settings(max_examples=40, deadline=None)
@given(clip_rows())
def test_engine_matches_oracle_on_arbitrary_rows(rows):
    got = engine_label(rows)
    import pandas as pd

    df = pa.Table.from_pylist(rows, schema=SCHEMA).to_pandas()
    want = oracle.label_clips(df, MODELS_DIR).set_index("clip_id")

    # phase-A comparison: oracle computes 'duplicate' globally; engine adds it
    # in phase B — strip it from the oracle side for this kernel-level check
    got_keep = dict(zip(got["clip_id"].to_pylist(), got["keep"].to_pylist()))
    got_reasons = dict(zip(got["clip_id"].to_pylist(),
                           (list(x) for x in got["drop_reasons"].to_pylist())))
    got_scrub = dict(zip(got["clip_id"].to_pylist(),
                         got["scrubbed_transcript"].to_pylist()))
    for cid, w in want.iterrows():
        w_reasons = [r for r in w["drop_reasons"] if r != "duplicate"]
        assert got_reasons[cid] == w_reasons, (cid, got_reasons[cid], w_reasons)
        assert got_keep[cid] == (len(w_reasons) == 0), cid
        ws = w["scrubbed_transcript"]
        gs = got_scrub[cid]
        assert (gs is None and ws is None) or gs == ws, (cid, gs, ws)
