"""Text-analysis operators over a documents table (task brief): language ID,
quality scoring, token counting, document fingerprinting. All single-pass
``map_batches`` with the vectorized kernels; the langid stage is the same
actor-pool scorer the flagship pipeline uses."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from data_quality_framework_ray import config
from data_quality_framework_ray.functions import hashing as H
from data_quality_framework_ray.functions.textstats import quality_stats, token_counts
from data_quality_framework_ray.stages.scorers import LangIdScorer


def with_quality_stats(ds, text_col: str = "text"):
    def f(batch: pa.Table) -> pa.Table:
        st = quality_stats(batch[text_col])
        for name in ("n_chars", "n_tokens"):
            batch = batch.append_column(name + "_q", pa.array(st[name], type=pa.int64()))
        for name in ("distinct_ratio", "symbol_ratio", "stopword_ratio", "alpha_ratio"):
            batch = batch.append_column(name, pa.array(st[name], type=pa.float64()))
        return batch

    return ds.map_batches(f, batch_format="pyarrow", batch_size=config.TEXT_BATCH_SIZE)


def with_token_counts(ds, text_col: str = "text"):
    def f(batch: pa.Table) -> pa.Table:
        tc = token_counts(batch[text_col])
        return (batch
                .append_column("ws_tokens", pa.array(tc["ws_tokens"], type=pa.int64()))
                .append_column("bpe_ish_tokens", pa.array(tc["bpe_ish_tokens"], type=pa.int64())))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=config.TEXT_BATCH_SIZE)


def with_langid(ds, text_col: str = "text", models_dir: str | None = None,
                concurrency=None):
    if concurrency is None:
        from data_quality_framework_ray.pipelines.quality_filter import (
            default_model_concurrency)

        # document tables are modest; a full-cluster pool would spend more on
        # actor spawn than scoring — cap, callers override for big corpora
        concurrency = min(8, default_model_concurrency())
    class DocLangId(LangIdScorer):
        def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
            from data_quality_framework_ray.stages.models import langid_scores

            pred, conf = langid_scores(batch[text_col], self.model)
            lang = np.where(pred >= 0, self.langs[np.maximum(pred, 0)], None)
            return (batch
                    .append_column("pred_lang", pa.array(lang, type=pa.string()))
                    .append_column("pred_conf", pa.array(conf, type=pa.float64())))

    kw = {"models_dir": models_dir} if models_dir else {}
    return ds.map_batches(DocLangId, fn_constructor_kwargs=kw,
                          batch_format="pyarrow", batch_size=config.TEXT_BATCH_SIZE,
                          concurrency=concurrency)


def with_fingerprints(ds, text_col: str = "text", k: int = 8, ngram: int = 8):
    """Winnowing-style bottom-k char-ngram fingerprint + a single min-hash
    (rolling polynomial hashes, SPEC hashing)."""

    def f(batch: pa.Table) -> pa.Table:
        h, off = H.char_ngram_hashes(batch[text_col], ngram)
        fps = H.bottom_k_fingerprint(h, off, k=k)
        minh = [fp[0] if fp else 0 for fp in fps]
        return (batch
                .append_column("fingerprint", pa.array(fps, type=pa.list_(pa.uint64())))
                .append_column("fp_min", pa.array(minh, type=pa.uint64())))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=config.TEXT_BATCH_SIZE)
