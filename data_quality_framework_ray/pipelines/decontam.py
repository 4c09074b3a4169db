"""Benchmark decontamination + repetition-based quality signals.

Two operators a large-scale training-data pipeline needs that the reference
(single-process pandas quality checks, /root/reference/core/quality_checks.py)
has no analogue for:

- ``flag_contaminated``: mark documents containing any benchmark snippet as
  a substring (eval-set decontamination). The snippet set is small (a
  benchmark suite is KBs, not TBs) and is broadcast ONCE via ``ray.put``;
  matching is polars ``str.contains_any`` — an Aho-Corasick multi-substring
  scan, one pass over each batch regardless of snippet count. 100 TB-safe:
  no shuffle at all, the corpus streams through map_batches.

- ``repetition_stats``: per-document word-repetition signals in the style of
  the Gopher quality rules (duplicate-word fraction, most-common-word
  fraction, most-common-bigram fraction). Vectorized per batch with polars
  split/explode/group_by — no Python loop over rows; output is one row per
  doc, computed in a single streaming pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from data_quality_framework_ray import config


def benchmark_snippets(ds, *, id_col: str = "doc_id", text_col: str = "text",
                       mod: int = 50, length: int = 40) -> list[str]:
    """Deterministic stand-in benchmark set: the first ``length`` chars of
    every ``mod``-th document. Driver-side result is bounded by the benchmark
    size (len(corpus)/mod here; a real eval suite is a fixed small file)."""
    import pyarrow.compute as pc

    def f(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        t = b.filter(pa.array(ids % mod == 0))
        return pa.table({"snip": pc.utf8_slice_codeunits(t[text_col], 0, length)})

    rows = ds.map_batches(f, batch_format="pyarrow").take_all()
    return sorted({r["snip"] for r in rows if r["snip"]})


def flag_contaminated(ds, snippets: list[str], *, text_col: str = "text"):
    """Append a ``contaminated`` bool column: does the text contain any of
    ``snippets`` as a substring? Snippets are broadcast once via ``ray.put``
    and matched with one Aho-Corasick pass per batch."""
    import ray

    snips = [s for s in snippets if s]
    ref = ray.put(snips)

    def f(batch: pa.Table) -> pa.Table:
        import polars as pl

        sn = ray.get(ref)
        if not sn:
            flag = pa.array(np.zeros(batch.num_rows, dtype=bool))
        else:
            # fill_null(False): SQL EXISTS over a NULL text is false, and a
            # tri-state flag breaks downstream boolean filters
            c = pl.from_arrow(batch.select([text_col])).with_columns(
                pl.col(text_col).str.contains_any(sn).fill_null(False)
                .alias("c"))
            flag = c["c"].to_arrow().cast(pa.bool_())
        return batch.append_column("contaminated", flag)

    return ds.map_batches(f, batch_format="pyarrow",
                          batch_size=config.TEXT_BATCH_SIZE)


def repetition_stats(ds, *, id_col: str = "doc_id", text_col: str = "text",
                     decimals: int = 6):
    """Per-document repetition signals over single-space tokenization
    (DuckDB ``string_split(text, ' ')`` semantics, empty tokens included so
    the SQL oracle is exact):

    - ``n_words``, ``n_unique_words``
    - ``dup_word_frac``   = 1 − unique/total
    - ``top_word_frac``   = count(most frequent word) / total
    - ``top_bigram_frac`` = count(most frequent adjacent pair) / (total − 1)
      (0.0 for single-word docs)

    Fractions are IEEE-identical to the SQL double arithmetic and rounded
    half-away (DuckDB ROUND semantics) to ``decimals``.
    """

    def f(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch.select([id_col, text_col]))
        ex = (df.with_columns(pl.col(text_col).str.split(" ").alias("__w"))
                .drop(text_col).explode("__w"))
        # adjacent-pair bigram inside each doc (explode preserves order)
        ex = ex.with_columns(
            (pl.col("__w") + " " + pl.col("__w").shift(-1).over(id_col))
            .alias("__bg"))
        wc = ex.group_by(id_col, "__w").len()
        wa = wc.group_by(id_col).agg(
            n_words=pl.col("len").sum(),
            n_unique_words=pl.len(),
            top_c=pl.col("len").max())
        bc = ex.drop_nulls("__bg").group_by(id_col, "__bg").len()
        ba = bc.group_by(id_col).agg(top_bc=pl.col("len").max(),
                                     n_bg=pl.col("len").sum())
        out = wa.join(ba, on=id_col, how="left").sort(id_col)

        n = out["n_words"].to_numpy().astype(np.float64)
        u = out["n_unique_words"].to_numpy().astype(np.float64)
        tc = out["top_c"].to_numpy().astype(np.float64)
        tbc = out["top_bc"].fill_null(0).to_numpy().astype(np.float64)
        nbg = out["n_bg"].fill_null(0).to_numpy().astype(np.float64)

        scale = 10.0 ** decimals

        def rnd(x: np.ndarray) -> np.ndarray:
            # vectorized _round_half_away (DuckDB ROUND(DOUBLE) semantics)
            return np.copysign(np.floor(np.abs(x) * scale + 0.5) / scale, x)

        with np.errstate(divide="ignore", invalid="ignore"):
            dup = rnd(1.0 - u / n)
            topw = rnd(tc / n)
            topb = np.where(nbg > 0, rnd(np.where(nbg > 0, tbc, 0.0)
                                         / np.where(nbg > 0, nbg, 1.0)), 0.0)
        return pa.table({
            id_col: pa.array(out[id_col].to_numpy()),
            "n_words": pa.array(out["n_words"].to_numpy().astype(np.int64)),
            "n_unique_words": pa.array(
                out["n_unique_words"].to_numpy().astype(np.int64)),
            "dup_word_frac": pa.array(dup, type=pa.float64()),
            "top_word_frac": pa.array(topw, type=pa.float64()),
            "top_bigram_frac": pa.array(topb, type=pa.float64()),
        })

    return ds.map_batches(f, batch_format="pyarrow",
                          batch_size=config.TEXT_BATCH_SIZE)


def flag_contaminated_embeddings(ds, bench: np.ndarray, *,
                                 emb_col: str = "embedding",
                                 threshold: float = 0.98):
    """Append a ``contaminated`` bool column: is any benchmark vector within
    ``threshold`` cosine of the row's embedding? The EMBEDDING analogue of
    the snippet-containment decontamination pass (semantic near-matches a
    string scan misses). The benchmark matrix is L2-normalized once on the
    driver and broadcast via ``ray.put``; each batch does ONE matmul against
    it and keeps only the row-max — no shuffle, cost O(rows·|bench|·d) per
    batch with the bench side fixed. For benchmark sets too large to
    broadcast, pre-bucket both sides with the hyperplane-LSH index
    (pipelines/incremental.py) and run this kernel per bucket."""
    import ray

    from data_quality_framework_ray.pipelines.similarity import _norm_rows

    b = _norm_rows(np.asarray(bench, dtype=np.float64))
    ref = ray.put(b)

    def f(batch: pa.Table) -> pa.Table:
        bb = ray.get(ref) if not isinstance(ref, np.ndarray) else ref
        if batch.num_rows == 0 or bb.size == 0:
            return batch.append_column(
                "contaminated", pa.array(np.zeros(batch.num_rows, bool)))
        x = _norm_rows(np.stack(
            batch[emb_col].to_pandas().to_numpy()).astype(np.float64))
        mx = (x @ bb.T).max(axis=1)
        return batch.append_column("contaminated",
                                   pa.array(mx >= threshold))

    return ds.map_batches(f, batch_format="pyarrow",
                          batch_size=config.TEXT_BATCH_SIZE)
