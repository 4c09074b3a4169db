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
    """Language-ID over a text column.

    Pool design (VERDICT.md item 7): the round-1 actor pool re-paid ~4 s of
    actor spawn + per-actor model load on EVERY execution while the scoring
    kernel itself takes ~0.5 s — so the model (a ~1 MB dict of numpy arrays)
    is broadcast ONCE via ``ray.put`` and scored in plain tasks on the
    long-lived worker pool: ``ray.get`` is zero-copy from the local object
    store, tasks auto-scale to all CPUs, nothing spawns. ``concurrency``
    caps the task parallelism when given (back-compat)."""
    import ray

    from data_quality_framework_ray.stages import models as M

    model = M.load_langid(models_dir)
    langs = np.array([str(x) for x in model["langs"]], dtype=object)
    ref = ray.put(model)

    def f(batch: pa.Table) -> pa.Table:
        m = ray.get(ref) if not isinstance(ref, dict) else ref
        pred, conf = M.langid_scores(batch[text_col], m)
        lang = np.where(pred >= 0, langs[np.maximum(pred, 0)], None)
        return (batch
                .append_column("pred_lang", pa.array(lang, type=pa.string()))
                .append_column("pred_conf", pa.array(conf, type=pa.float64())))

    kw = {"concurrency": concurrency} if concurrency else {}
    return ds.map_batches(f, batch_format="pyarrow", batch_size=512, **kw)


def with_fingerprints(ds, text_col: str = "text", k: int = 8, ngram: int = 8):
    """Winnowing-style bottom-k char-ngram fingerprint + a single min-hash
    (rolling polynomial hashes, SPEC hashing)."""

    def f(batch: pa.Table) -> pa.Table:
        h, off = H.char_ngram_hashes(batch[text_col], ngram)
        vals, off2 = H.bottom_k_fingerprint(h, off, k=k)
        fp_col = pa.ListArray.from_arrays(
            pa.array(off2, type=pa.int32()),
            pa.array(vals, type=pa.uint64()))
        # fp_min = first (= smallest) element per row, 0 for empty rows
        minh = np.zeros(len(off2) - 1, dtype=np.uint64)
        nonempty = off2[:-1] < off2[1:]
        minh[nonempty] = vals[off2[:-1][nonempty]]
        return (batch
                .append_column("fingerprint", fp_col)
                .append_column("fp_min", pa.array(minh, type=pa.uint64())))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=config.TEXT_BATCH_SIZE)


def normalize_text(ds, text_col: str = "text", out_col: str = "norm"):
    """Canonical text normalization: NFC → unicode lowercase → collapse
    ASCII-whitespace runs to one space → trim. Vectorized polars string
    kernels per batch, no shuffle. The exact op order is part of the
    contract — the SQL oracle restates it verbatim (nfc_normalize, lower,
    regexp_replace, trim).

    Two parity traps pinned by tests/test_sampling_stats_ops.py:
    - pyarrow 16's ``utf8_normalize(form="NFC")`` does NOT compose
      (e + U+0301 stays decomposed) while DuckDB/CPython do — hence polars'
      ``str.normalize``, which composes correctly;
    - Rust-regex ``\\s`` is unicode-aware but RE2 (DuckDB) ``\\s`` is
      ASCII-only — the explicit ASCII class keeps both sides identical."""
    import polars as pl

    ws = "[ \\t\\n\\r\\f\\x0B]+"

    def f(batch: pa.Table) -> pa.Table:
        s = (pl.from_arrow(pa.table({"t": batch[text_col]}))["t"]
             .str.normalize("NFC")
             .str.to_lowercase()
             .str.replace_all(ws, " ")
             .str.strip_chars(" "))
        return batch.append_column(out_col, s.to_arrow().cast(
            batch[text_col].type))

    return ds.map_batches(f, batch_format="pyarrow",
                          batch_size=config.TEXT_BATCH_SIZE)


def bigram_top_counts(ds, text_col: str = "text", top_k: int = 20):
    """Corpus-wide top-K adjacent-token bigrams — the n-gram frequency
    operator (n=2) over the documents table. Tokenizer is the SAME ``\\S+``
    extractor as the word-count query so the SQL oracle
    (regexp_extract_all + list_zip + unnest) restates it exactly.

    Execution: per batch, one vectorized explode to (doc_idx, token) rows,
    then a GLOBAL shift(-1) paired with a doc-index shift — a neighbour is a
    bigram only when both rows share the doc index, so bigrams never cross
    document boundaries and no per-doc window/hash pass is needed. Partial
    (bigram, n) counts per batch → distributed groupby-sum → distributed
    sort + limit (the bigram vocabulary can exceed driver comfort at corpus
    scale, so top-k happens before collection). Returns a Ray Dataset of
    (bg, n) — callers collect the k rows."""
    import polars as pl
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        s = pl.from_arrow(pa.table({"t": batch[text_col]}))["t"].fill_null("")
        df = (pl.DataFrame({"i": np.arange(len(s), dtype=np.int64),
                            "tok": s.str.extract_all(r"\S+")})
              .explode("tok").drop_nulls("tok"))
        df = df.with_columns(nxt=pl.col("tok").shift(-1),
                             ni=pl.col("i").shift(-1))
        df = (df.filter(pl.col("ni") == pl.col("i"))
              .with_columns((pl.col("tok") + " " + pl.col("nxt")).alias("bg")))
        return (df.group_by("bg").agg(pl.len().cast(pl.Int64).alias("n"))
                .to_arrow())

    return (ds.map_batches(partials, batch_format="pyarrow",
                           batch_size=config.TEXT_BATCH_SIZE)
            .groupby("bg").aggregate(Sum("n", alias_name="n"))
            .sort(["n", "bg"], descending=[True, False]).limit(top_k))
