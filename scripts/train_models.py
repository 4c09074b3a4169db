"""Train and serialize the langid + char-LM models (deterministic; SPEC.md).

Run once at build time: ``python scripts/train_models.py``. Prints held-out
diagnostics so the SPEC thresholds (LANG_CONF_MIN, PPL_MAX) can be sanity-
checked against the actual score distributions.
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

from data_quality_framework_ray import config
from data_quality_framework_ray.datagen import corpora
from data_quality_framework_ray.stages import models


def main() -> None:
    corpus = corpora.training_corpus()
    langid = models.train_langid(corpus)
    train_text = [s for lang in config.LANG_ALLOWLIST for s in corpus[lang]]
    charlm = models.train_charlm(train_text)
    models.save_models(langid, charlm)
    print(f"saved models to {models.models_dir()}")

    # held-out diagnostics (different seed stream than training)
    for ci, lang in enumerate(config.LANGID_CLASSES):
        rng = np.random.default_rng(99000 + ci)
        held = [corpora.sentence(lang, rng) for _ in range(300)]
        pred, conf = models.langid_scores(held, langid)
        acc = float(np.mean(pred == ci))
        ppl = models.perplexities(held, charlm)
        print(f"{lang}: acc={acc:.3f} conf_med={np.nanmedian(conf):.3f} "
              f"ppl p5={np.nanpercentile(ppl, 5):.2f} p50={np.nanmedian(ppl):.2f} "
              f"p95={np.nanpercentile(ppl, 95):.2f}")


if __name__ == "__main__":
    main()
