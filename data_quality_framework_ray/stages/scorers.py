"""Stateful model stages: actor-pool ``map_batches`` callables.

North-rule mandate (BASELINE.json): fastText-style language ID and KenLM-style
perplexity run as callable CLASSES — model deserialized ONCE per actor in
``__init__``, scored per batch in ``__call__`` over zero-copy Arrow. Pool
sizing comes from the pipeline (``concurrency=(min,max)``, ``batch_size``).

The reference has no model stages (SURVEY.md §2.3); its closest analogue is
the per-check GX validator rebuilt per call
(/root/reference/core/quality_checks.py:69-111) — exactly the anti-pattern the
actor pool replaces.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from data_quality_framework_ray.stages import models


class LangIdScorer:
    def __init__(self, models_dir: str | None = None):
        self.model = models.load_langid(models_dir)
        self.langs = np.array([str(x) for x in self.model["langs"]], dtype=object)

    def __call__(self, batch: pa.Table) -> pa.Table:
        pred, conf = models.langid_scores(batch["transcript"], self.model)
        lang = np.where(pred >= 0, self.langs[np.maximum(pred, 0)], None)
        return (batch
                .append_column("lang", pa.array(lang, type=pa.string()))
                .append_column("lang_conf", pa.array(conf, type=pa.float64())))


class PerplexityScorer:
    def __init__(self, models_dir: str | None = None):
        self.model = models.load_charlm(models_dir)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ppl = models.perplexities(batch["transcript"], self.model)
        return batch.append_column("ppl", pa.array(ppl, type=pa.float64()))


class QualityScorer:
    """Fused langid + perplexity stage: ONE actor pool, both models loaded in
    ``__init__``. A second pool buys nothing here (both kernels are CPU-light
    vs the batch handoff + pool spin-up they'd cost; measured 2× end-to-end
    on the bench) — keep separate pools only when stages need different
    resources (e.g. one is GPU-bound)."""

    def __init__(self, models_dir: str | None = None):
        self.langid = LangIdScorer(models_dir)
        self.ppl = PerplexityScorer(models_dir)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.ppl(self.langid(batch))
