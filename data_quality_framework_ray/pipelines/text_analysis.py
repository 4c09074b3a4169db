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


def bigram_lm_top(ds, text_col: str = "text", top_k: int = 30) -> pa.Table:
    """Train the bigram language model the perplexity scorer consumes —
    MLE conditional probabilities P(w2|w1) = n(w1 w2) / n(w1 ·) from
    distributed corpus counts — and return the ``top_k`` most frequent
    bigrams with their counts and probabilities (ties broken by (w1, w2)
    so the cut is deterministic).

    Execution: the same vectorized explode+shift bigram kernel as
    ``bigram_top_counts`` emits per-batch (w1, w2, n) partials →
    distributed groupby-sum (the bigram vocabulary never lands on the
    driver) → the aggregated table is materialized ONCE and reused for
    (a) prefix totals (groupby w1) and (b) the distributed top-k; only
    ≤ top_k rows of each reach the driver. ``cond_p`` is computed as
    n · 1.0 / prefix_n — the identical IEEE division the SQL oracle
    states, so the doubles match bit-for-bit."""
    import polars as pl
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        s = pl.from_arrow(pa.table({"t": batch[text_col]}))["t"].fill_null("")
        df = (pl.DataFrame({"i": np.arange(len(s), dtype=np.int64),
                            "tok": s.str.extract_all(r"\S+")})
              .explode("tok").drop_nulls("tok"))
        df = df.with_columns(nxt=pl.col("tok").shift(-1),
                             ni=pl.col("i").shift(-1))
        df = df.filter(pl.col("ni") == pl.col("i"))
        return (df.group_by(["tok", "nxt"])
                .agg(pl.len().cast(pl.Int64).alias("n"))
                .rename({"tok": "w1", "nxt": "w2"}).to_arrow())

    bg = (ds.map_batches(partials, batch_format="pyarrow",
                         batch_size=config.TEXT_BATCH_SIZE)
          .groupby(["w1", "w2"]).aggregate(Sum("n", alias_name="n"))
          .materialize())
    top = bg.sort(["n", "w1", "w2"],
                  descending=[True, False, False]).limit(top_k).take_all()
    if not top:
        return pa.table({"w1": pa.array([], pa.string()),
                         "w2": pa.array([], pa.string()),
                         "bigram_n": pa.array([], pa.int64()),
                         "prefix_n": pa.array([], pa.int64()),
                         "cond_p": pa.array([], pa.float64())})
    need = sorted({r["w1"] for r in top})

    def only_needed(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["w1"], pa.array(need, pa.string())))

    pre_rows = (bg.map_batches(only_needed, batch_format="pyarrow")
                .groupby("w1").aggregate(Sum("n", alias_name="prefix_n"))
                .take_all())
    pre = {r["w1"]: int(r["prefix_n"]) for r in pre_rows}
    return pa.table({
        "w1": pa.array([r["w1"] for r in top], pa.string()),
        "w2": pa.array([r["w2"] for r in top], pa.string()),
        "bigram_n": pa.array([int(r["n"]) for r in top], pa.int64()),
        "prefix_n": pa.array([pre[r["w1"]] for r in top], pa.int64()),
        "cond_p": pa.array([float(r["n"]) / float(pre[r["w1"]])
                            for r in top], pa.float64())})


def prepare_corpus(ds, *, id_col: str = "doc_id", text_col: str = "text",
                   source_col: str = "source", token_budget: int = 20_000,
                   snippet_mod: int = 50, snippet_len: int = 40):
    """END-TO-END training-corpus preparation — the composed pipeline a
    corpus build actually runs, every stage an already-oracled operator
    chained in FIXED order so the WHOLE composition restates in one SQL
    query:

      1. quality filter   (``document_filter`` — too_short / too_long /
                           low_diversity / dup, fixed precedence)
      2. decontamination  (drop docs containing any benchmark snippet;
                           snippets broadcast once, Aho-Corasick per batch)
      3. per-source token budget (keep in id order while the running
                           ``\\S+``-token sum stays ≤ budget)

    The input streams through each stage; the only materialization is the
    3-column input reused by four passes (filter stats, snippet
    derivation, kept semi-join, contamination scan). Returns a Dataset of
    (id, source, n_tokens) for the surviving docs."""
    import polars as pl

    from data_quality_framework_ray.pipelines.decontam import (
        benchmark_snippets, flag_contaminated)
    from data_quality_framework_ray.pipelines.joins import semi_join
    from data_quality_framework_ray.pipelines.sampling import token_budget_cap

    ds = ds.materialize()
    decisions = document_filter(ds, id_col=id_col, text_col=text_col)

    def kept_only(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.equal(t["keep"], True)).select([id_col])

    kept_ids = decisions.map_batches(kept_only, batch_format="pyarrow")
    kept = semi_join(ds, kept_ids, on=id_col)
    snips = benchmark_snippets(ds, mod=snippet_mod, length=snippet_len)
    flagged = flag_contaminated(kept, snips, text_col=text_col)

    def clean_tokens(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = t.filter(pc.equal(t["contaminated"], False))
        df = pl.from_arrow(pa.table({id_col: t[id_col],
                                     source_col: t[source_col],
                                     "t": t[text_col]}))
        df = df.with_columns(
            n_tokens=pl.col("t").fill_null("").str.extract_all(r"\S+")
            .list.len().cast(pl.Int64)).drop("t")
        return df.to_arrow().cast(pa.schema([
            (id_col, pa.int64()), (source_col, pa.string()),
            ("n_tokens", pa.int64())]))

    with_tok = flagged.map_batches(clean_tokens, batch_format="pyarrow",
                                   batch_size=config.TEXT_BATCH_SIZE)
    return token_budget_cap(with_tok, source_col, id_col, "n_tokens",
                            budget=token_budget)


def langid_train_profiles(ds, text_col: str = "text",
                          lang_col: str = "lang",
                          top_k: int = 20) -> "ray.data.Dataset":
    """TRAIN the char-n-gram language-ID profiles the langid scorer
    consumes: per-language character-trigram frequency counts over a
    labeled corpus, top ``top_k`` trigrams per language (ties broken by
    trigram ascending — for ASCII, int-packed code order IS lexicographic
    order, which is what the SQL oracle's ``ORDER BY g`` states).

    Kernel: zero-copy over the Arrow string layout — the column's data
    buffer is ALL documents' chars concatenated, so ONE vectorized
    shift-and-or over the whole buffer yields every trigram as an int32
    code (b0<<16|b1<<8|b2); per-doc window starts come from the offsets
    buffer (``expand_ranges``), so windows never cross documents and no
    per-row Python runs. Partial (lang, code, n) counts per batch →
    distributed groupby-sum → per-language top-k inside map_groups; only
    languages × top_k rows reach the caller. ASCII corpus assumption
    (byte == char) is asserted per batch."""
    import polars as pl
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from data_quality_framework_ray.functions.hashing import expand_ranges

    def partials(batch: pa.Table) -> pa.Table:
        empty = pa.table({"lang": pa.array([], pa.string()),
                          "code": pa.array([], pa.int32()),
                          "n": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        arr = pc.fill_null(batch[text_col], "").combine_chunks()
        if pa.types.is_large_string(arr.type):
            arr = arr.cast(pa.string())
        off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
            arr.offset:arr.offset + len(arr) + 1].astype(np.int64)
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        assert data.size == 0 or int(data.max()) < 128, \
            "char-trigram kernel requires an ASCII corpus (byte == char)"
        lens = np.diff(off)
        nwin = np.maximum(lens - 2, 0)
        if int(nwin.sum()) == 0:
            return empty
        d = data.astype(np.int32)
        codes = (d[:-2] << 16) | (d[1:-1] << 8) | d[2:]
        starts = expand_ranges(off[:-1], nwin)
        langs = np.asarray(pc.fill_null(batch[lang_col], "").to_pylist(),
                           dtype=object)
        df = pl.DataFrame({
            "lang": pl.Series(np.repeat(langs, nwin).tolist(),
                              dtype=pl.Utf8),
            "code": codes[starts]})
        return (df.group_by(["lang", "code"])
                .agg(pl.len().cast(pl.Int64).alias("n")).to_arrow()
                .cast(empty.schema))

    def per_lang_top(g: pa.Table) -> pa.Table:
        df = (pl.from_arrow(g)
              .sort(["n", "code"], descending=[True, False])
              .head(top_k))
        code = df["code"].to_numpy()
        tri = ["".join(map(chr, ((c >> 16) & 0xFF, (c >> 8) & 0xFF,
                                 c & 0xFF))) for c in code]
        return pa.table({"lang": df["lang"].to_arrow(),
                         "g": pa.array(tri, pa.string()),
                         "n": df["n"].to_arrow()})

    return (ds.map_batches(partials, batch_format="pyarrow",
                           batch_size=config.TEXT_BATCH_SIZE)
            .groupby(["lang", "code"]).aggregate(Sum("n", alias_name="n"))
            .groupby("lang").map_groups(per_lang_top,
                                        batch_format="pyarrow"))


def bm25_topk(ds, text_col: str = "text", id_col: str = "doc_id",
              terms: list[str] | None = None, k1: float = 1.2,
              b: float = 0.75, top_k: int = 10):
    """BM25 relevance top-k for a fixed query-term set (the doc-length-
    normalized upgrade of the TF-IDF query; Lucene idf form
    ln((N−df+0.5)/(df+0.5)+1) — always positive).

    Execution: ONE tokenize pass emits a per-doc int stats row
    (id, dl, tf per term) — the text payload is dropped immediately and the
    stats table is materialized once (5 int64 columns, tiny at any corpus
    scale). Corpus scalars (N, Σdl, df per term) fold from per-batch
    partials on the driver; scoring is a vectorized double pass over the
    candidate rows (any tf>0) with idf/avgdl CLOSED OVER (broadcast), then
    a distributed sort + limit BEFORE collection.

    Numerics contract (same discipline as stats.grouped_moments): tf/dl/df
    are exact ints; every double expression below is written in the same
    shape as the SQL oracle — avgdl = float(Σdl)/N, per-term score
    idf*((tf*(k1+1))/(tf + k1*(1−b + b*(dl/avgdl)))), summed over terms in
    FIXED term order — so engine≡oracle equality is exact up to libm ln
    (shared by DuckDB and CPython here; psi_drift set the precedent).

    Returns a Ray Dataset of (id_col, score) — the top_k rows."""
    import math

    import polars as pl

    terms = terms or ["join", "vector", "window"]
    tcols = [f"tf{i}" for i in range(len(terms))]

    def per_doc(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(pa.table({id_col: batch[id_col],
                                     "t": batch[text_col]}))
        df = df.with_columns(pl.col("t").fill_null("")
                             .str.extract_all(r"\S+").alias("toks"))
        exprs = [pl.col("toks").list.len().cast(pl.Int64).alias("dl")]
        exprs += [pl.col("toks").list.count_matches(term)
                  .cast(pl.Int64).alias(c) for c, term in zip(tcols, terms)]
        return df.select(id_col, *exprs).to_arrow()

    stats = ds.map_batches(per_doc, batch_format="pyarrow",
                           batch_size=config.TEXT_BATCH_SIZE).materialize()

    def partial_sums(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        row = {"n": [df.height], "sum_dl": [int(df["dl"].sum() or 0)]}
        for c in tcols:
            row[f"df_{c}"] = [int((df[c] > 0).sum())]
        return pa.table({k: pa.array(v, type=pa.int64())
                         for k, v in row.items()})

    import pyarrow as _pa
    folds = stats.map_batches(partial_sums, batch_format="pyarrow").take_all()
    n_docs = sum(r["n"] for r in folds)
    sum_dl = sum(r["sum_dl"] for r in folds)
    dfs = [sum(r[f"df_{c}"] for r in folds) for c in tcols]
    if n_docs == 0 or all(d == 0 for d in dfs):
        import ray.data as rd
        return rd.from_arrow(pa.table(
            {id_col: pa.array([], type=pa.int64()),
             "score": pa.array([], type=pa.float64())}))
    avgdl = float(sum_dl) / n_docs
    idfs = [math.log((n_docs - d + 0.5) / (d + 0.5) + 1.0) if d else 0.0
            for d in dfs]

    def score(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).filter(
            sum((pl.col(c) > 0).cast(pl.Int64) for c in tcols) > 0)
        dl = df["dl"].to_numpy().astype(np.float64)
        den = k1 * (1.0 - b + b * (dl / avgdl))
        sc = np.zeros(df.height, dtype=np.float64)
        for c, idf in zip(tcols, idfs):  # fixed term order — parity contract
            tf = df[c].to_numpy().astype(np.float64)
            s = idf * ((tf * (k1 + 1.0)) / (tf + den))
            sc = sc + np.where(tf > 0, s, 0.0)
        return pa.table({id_col: df[id_col].to_arrow(), "score": sc})

    return (stats.map_batches(score, batch_format="pyarrow")
            .sort(["score", id_col], descending=[True, False]).limit(top_k))


def token_entropy(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document Shannon entropy (bits) of the token distribution — the
    repetition/diversity quality signal (a low-entropy doc is boilerplate
    or looped text). Same ``\\S+`` tokenizer as the other corpus queries;
    restated by DuckDB's ``entropy()`` aggregate (log2) over unnested
    tokens. One vectorized pass per batch: explode → (doc, token) counts →
    window-sum per doc → −Σ p·log2 p; each doc is one input row, so the
    computation never crosses batches and there is NO shuffle. Docs with
    zero tokens emit nothing (SQL inner-unnest parity). Entropy is rounded
    to 6 dp on both sides — the oracle's per-doc summation order is
    unspecified, and the rounding absorbs that last-ulp drift."""
    import polars as pl

    def f(batch: pa.Table) -> pa.Table:
        df = (pl.from_arrow(pa.table({id_col: batch[id_col],
                                      "t": batch[text_col]}))
              .with_columns(pl.col("t").fill_null("")
                            .str.extract_all(r"\S+").alias("tok"))
              .select(id_col, "tok").explode("tok").drop_nulls("tok"))
        if df.height == 0:
            return pa.table({id_col: pa.array([], batch[id_col].type),
                             "h": pa.array([], pa.float64())})
        out = (df.group_by(id_col, "tok").agg(pl.len().alias("c"))
               .with_columns(n=pl.col("c").sum().over(id_col))
               .with_columns(p=pl.col("c") / pl.col("n"))
               .group_by(id_col)
               .agg(h=(-(pl.col("p") * pl.col("p").log(2)).sum())
                    .round(6))
               .sort(id_col))
        return out.to_arrow()

    return ds.map_batches(f, batch_format="pyarrow",
                          batch_size=config.TEXT_BATCH_SIZE)


def document_filter(ds, id_col: str = "doc_id", text_col: str = "text", *,
                    min_tokens: int = 12, max_chars: int = 500,
                    min_diversity_pct: int = 45):
    """Document-level keep/drop quality filter — the TEXT analogue of the
    flagship audio pipeline, fully SQL-restatable so the whole decision
    table oracles exactly. Rules in FIXED precedence (first failure is the
    ``drop_reason``):

      too_short      n_tokens < min_tokens           (``\\S+`` tokenizer)
      too_long       n_chars  > max_chars            (codepoint length)
      low_diversity  n_distinct·100 < pct·n_tokens   (INTEGER cross-
                     multiplication — no float threshold boundary for the
                     oracle compare to trip on)
      dup            not the min-id member of an identical-text group
                     (vectorized 128-bit content hash engine-side; the SQL
                     oracle groups by the text itself — the same partition
                     up to a 2⁻¹²⁸ collision, the dedup_exact convention)

    Stats are one vectorized pass (no shuffle); the dup rule reuses the
    exact-dedup winner pattern (``keyed_dup_groups`` — only (hash, min_id,
    cnt) partials cross the wire, broadcast↔join switched). Returns a
    Dataset of (id, keep, drop_reason) with drop_reason '' for kept rows."""
    import polars as pl
    import ray

    from data_quality_framework_ray.functions import hashing as H
    from data_quality_framework_ray.pipelines.dedup import keyed_dup_groups

    def with_stats(t: pa.Table) -> pa.Table:
        h1, h2 = H.content_hash_128(t[text_col])
        df = (pl.from_arrow(pa.table({id_col: t[id_col],
                                      "t": t[text_col]}))
              .with_columns(pl.col("t").fill_null(""))
              .with_columns(
                  n_chars=pl.col("t").str.len_chars().cast(pl.Int64),
                  toks=pl.col("t").str.extract_all(r"\S+"))
              .with_columns(
                  n_tokens=pl.col("toks").list.len().cast(pl.Int64),
                  n_distinct=pl.col("toks").list.n_unique().cast(pl.Int64))
              .drop("t", "toks"))
        return (df.to_arrow()
                .append_column("h1", pa.array(h1.astype("int64")))
                .append_column("h2", pa.array(h2.astype("int64"))))

    stats = ds.map_batches(with_stats, batch_format="pyarrow",
                           batch_size=config.TEXT_BATCH_SIZE).materialize()
    dups = keyed_dup_groups(stats, ["h1", "h2"], id_col)
    # losers = dup-group members that are not their group's min id
    losers = {r[id_col] for r in dups.take_all()
              if r[id_col] != r["cluster_rep"]}
    ref = ray.put(losers)

    def decide(t: pa.Table) -> pa.Table:
        ls = ray.get(ref) if not isinstance(ref, (set, frozenset)) else ref
        df = pl.from_arrow(t)
        is_dup = pl.col(id_col).is_in(list(ls)) if ls else pl.lit(False)
        reason = (pl.when(pl.col("n_tokens") < min_tokens)
                  .then(pl.lit("too_short"))
                  .when(pl.col("n_chars") > max_chars)
                  .then(pl.lit("too_long"))
                  .when(pl.col("n_distinct") * 100
                        < min_diversity_pct * pl.col("n_tokens"))
                  .then(pl.lit("low_diversity"))
                  .when(is_dup).then(pl.lit("dup"))
                  .otherwise(pl.lit("")))
        out = df.with_columns(drop_reason=reason).with_columns(
            keep=pl.col("drop_reason") == "")
        return (out.select([id_col, "keep", "drop_reason"]).to_arrow())

    return stats.map_batches(decide, batch_format="pyarrow",
                             batch_size=config.TEXT_BATCH_SIZE)
