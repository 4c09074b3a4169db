"""Engine (vectorized) vs oracle (naive) model scoring on identical npz data."""

from __future__ import annotations

import numpy as np

from data_quality_framework_ray.datagen import corpora
from data_quality_framework_ray.stages import models
from tests import oracle
from tests.conftest import MODELS_DIR


def _sample_texts():
    rng = np.random.default_rng(555)
    texts = []
    for lang in ("en", "fr", "de", "es", "it", "xx"):
        texts += [corpora.sentence(lang, rng) for _ in range(30)]
    texts += ["", "a", "ab", "123 456", "…—…"]
    return texts


def test_langid_engine_equals_oracle():
    m = models.load_langid(MODELS_DIR)
    texts = _sample_texts()
    pred, conf = models.langid_scores(texts, m)
    logp = m["logp"].astype(np.float64)
    for i, t in enumerate(texts):
        p_ref, c_ref = oracle.langid_score_one(t, logp)
        assert pred[i] == p_ref, t
        if p_ref >= 0:
            assert abs(conf[i] - c_ref) < 1e-9, t


def test_ppl_engine_equals_oracle():
    m = models.load_charlm(MODELS_DIR)
    texts = _sample_texts()
    got = models.perplexities(texts, m)
    for i, t in enumerate(texts):
        want = oracle.ppl_one(t, m["alphabet"], m["logp3"].astype(np.float64))
        if np.isnan(want):
            assert np.isnan(got[i])
        else:
            assert abs(got[i] - want) / want < 1e-9, t


def test_heldout_accuracy_and_separation():
    lm = models.load_charlm(MODELS_DIR)
    li = models.load_langid(MODELS_DIR)
    rng = np.random.default_rng(777)
    for ci, lang in enumerate(("en", "fr", "de", "es", "it", "xx")):
        held = [corpora.sentence(lang, rng) for _ in range(100)]
        pred, conf = models.langid_scores(held, li)
        assert float(np.mean(pred == ci)) >= 0.98, lang
        ppl = models.perplexities(held, lm)
        if lang == "xx":
            assert np.nanmedian(ppl) > 50
        else:
            assert np.nanpercentile(ppl, 95) < 25
