"""Distributed model TRAINING operators — the training-side counterparts of
the scoring stages (`stages/scorers.py` consumes models; these produce
them). Same iterative-algorithm shape as ``similarity.kmeans_lloyd``:
parameters broadcast per iteration via ``ray.put``, per-batch partials fold
to O(params) numbers on the driver, data rows never shuffle.

The reference (a single-process validation framework) trains nothing; these
exist for the 100-TB training-data pipeline mandate (quality-classifier
training, tokenizer training) and are verified against serial replays of
the identical RNG-free algorithm.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from data_quality_framework_ray import config


def doc_features(batch_text, labels_lang) -> tuple[np.ndarray, np.ndarray]:
    """Feature matrix for the quality classifier: [1, n_tokens/100,
    distinct_ratio, symbol_ratio, stopword_ratio, alpha_ratio] per doc
    (float64), label = 1.0 where lang == 'en'. One vectorized
    ``quality_stats`` pass; shared by the distributed trainer and the
    harness's serial replay so the gate isolates the TRAINING math."""
    from data_quality_framework_ray.functions.textstats import quality_stats

    st = quality_stats(batch_text)
    n = len(st["n_tokens"])
    x = np.column_stack([
        np.ones(n), st["n_tokens"].astype(np.float64) / 100.0,
        st["distinct_ratio"], st["symbol_ratio"], st["stopword_ratio"],
        st["alpha_ratio"]])
    y = np.asarray([1.0 if v == "en" else 0.0 for v in labels_lang])
    return x, y


FEATURE_NAMES = ("bias", "tokens_100", "distinct_ratio", "symbol_ratio",
                 "stopword_ratio", "alpha_ratio")


def logreg_train(ds, text_col: str = "text", lang_col: str = "lang",
                 iters: int = 30, lr: float = 0.5) -> pa.Table:
    """Full-batch gradient-descent logistic regression (is-English quality
    classifier) trained DISTRIBUTED: per iteration the weight vector is
    broadcast, each batch emits one (grad·n, n) partial row (d+1 floats),
    and the driver folds O(d) numbers — gradient
    ``w ← w − lr · (1/N) Σ (σ(xw) − y)·x``, w₀ = 0, RNG-free, so a serial
    numpy replay reproduces it to float tolerance. Returns (feature,
    weight) rows plus a train_accuracy row."""
    import ray

    d = len(FEATURE_NAMES)

    # featurize ONCE (the regex-heavy pass), train over the materialized
    # numeric table — iterations then stream d+1 float columns, not text
    # (10.3 s -> ~3 s at sf0.1; also the right 100-TB order: featurize is
    # the expensive pass, the trainer should never re-run it)
    def featurize(t: pa.Table) -> pa.Table:
        x, y = doc_features(t[text_col], t[lang_col].to_pylist())
        cols = {f"f{i}": pa.array(x[:, i], pa.float64())
                for i in range(d)}
        cols["y"] = pa.array(y, pa.float64())
        return pa.table(cols)

    feats = ds.map_batches(featurize, batch_format="pyarrow",
                           batch_size=config.TEXT_BATCH_SIZE).materialize()

    def partials(w_ref, final: bool):
        def f(t: pa.Table) -> pa.Table:
            w = ray.get(w_ref) if not isinstance(w_ref, np.ndarray) \
                else w_ref
            if t.num_rows == 0:
                return pa.table({"g": pa.array([], pa.list_(pa.float64())),
                                 "n": pa.array([], pa.int64())})
            x = np.column_stack([t[f"f{i}"].to_numpy(zero_copy_only=False)
                                 for i in range(d)])
            y = t["y"].to_numpy(zero_copy_only=False)
            z = x @ w
            p = 1.0 / (1.0 + np.exp(-z))
            if final:
                row = [float(((p >= 0.5) == (y >= 0.5)).sum())]
            else:
                row = (x.T @ (p - y)).tolist()
            return pa.table({"g": pa.array([row], pa.list_(pa.float64())),
                             "n": pa.array([t.num_rows], pa.int64())})
        return f

    def fold(rows):
        g = None
        n = 0
        for r in sorted(rows, key=lambda r: (r["n"], tuple(r["g"]))):
            v = np.asarray(r["g"], dtype=np.float64)
            g = v if g is None else g + v
            n += int(r["n"])
        return g, n

    w = np.zeros(d, dtype=np.float64)
    for _ in range(iters):
        ref = ray.put(w)
        g, n = fold(feats.map_batches(partials(ref, final=False),
                                   batch_format="pyarrow",
                                   batch_size=config.TEXT_BATCH_SIZE)
                    .take_all())
        if not n:
            break
        w = w - lr * (g / n)

    ref = ray.put(w)
    acc_g, acc_n = fold(feats.map_batches(partials(ref, final=True),
                                       batch_format="pyarrow",
                                       batch_size=config.TEXT_BATCH_SIZE)
                        .take_all())
    acc = float(acc_g[0]) / acc_n if acc_n else float("nan")
    return pa.table({
        "feature": pa.array(list(FEATURE_NAMES) + ["train_accuracy"],
                            pa.string()),
        "value": pa.array(list(w) + [acc], pa.float64())})


def pca_power(ds, emb_col: str = "embedding", iters: int = 8) -> pa.Table:
    """Top principal component of the embedding column by DISTRIBUTED
    power iteration — covariance-free: per iteration each batch emits the
    d-float partial ``Xcᵀ(Xc·v)`` (Xc = X − μ, centered on the fly), the
    driver folds O(d) numbers and renormalizes. Mean μ comes from one
    prior (n, Σvec) pass. RNG-free init v₀ = e₀, so a serial numpy replay
    reproduces the run to float tolerance. Returns (component i, v_i)
    rows plus an ``eigenvalue`` row (Rayleigh quotient of the final
    iterate, per-row covariance scale 1/N)."""
    import ray

    def mean_partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.list_(pa.float64()))})
        x = np.stack(t[emb_col].to_pandas().to_numpy()).astype(np.float64)
        return pa.table({"n": pa.array([t.num_rows], pa.int64()),
                         "s": pa.array([x.sum(axis=0).tolist()],
                                       pa.list_(pa.float64()))})

    rows = ds.map_batches(mean_partials, batch_format="pyarrow",
                          batch_size=config.TEXT_BATCH_SIZE).take_all()
    n_total = sum(int(r["n"]) for r in rows)
    if n_total == 0:
        return pa.table({"component": pa.array([], pa.int64()),
                         "value": pa.array([], pa.float64())})
    s = None
    for r in sorted(rows, key=lambda r: (r["n"], tuple(r["s"]))):
        v = np.asarray(r["s"], dtype=np.float64)
        s = v if s is None else s + v
    mu = s / n_total
    d = len(mu)

    def iter_partials(ref):
        def f(t: pa.Table) -> pa.Table:
            mu_, v_ = ray.get(ref) if not isinstance(ref, tuple) else ref
            if t.num_rows == 0:
                return pa.table({"n": pa.array([], pa.int64()),
                                 "s": pa.array([], pa.list_(pa.float64()))})
            x = np.stack(t[emb_col].to_pandas().to_numpy()).astype(
                np.float64) - mu_
            out = x.T @ (x @ v_)
            return pa.table({"n": pa.array([t.num_rows], pa.int64()),
                             "s": pa.array([out.tolist()],
                                           pa.list_(pa.float64()))})
        return f

    v = np.zeros(d)
    v[0] = 1.0
    ray_quot = 0.0
    for _ in range(iters):
        ref = ray.put((mu, v))
        rows = ds.map_batches(iter_partials(ref), batch_format="pyarrow",
                              batch_size=config.TEXT_BATCH_SIZE).take_all()
        s = None
        for r in sorted(rows, key=lambda r: (r["n"], tuple(r["s"]))):
            g = np.asarray(r["s"], dtype=np.float64)
            s = g if s is None else s + g
        ray_quot = float(v @ s) / n_total
        nrm = float(np.linalg.norm(s))
        if nrm == 0.0:
            break
        v = s / nrm

    return pa.table({
        "component": pa.array(list(range(d)) + [-1], pa.int64()),
        "value": pa.array(list(v) + [ray_quot], pa.float64())})


def bpe_train(ds, text_col: str = "text", n_merges: int = 20) -> pa.Table:
    """BPE tokenizer TRAINING: learn the first ``n_merges`` byte-pair
    merges from corpus word frequencies. The distributed stage is the word
    count (per-batch partial counts → one groupby-sum — the only pass over
    the corpus); the merge loop then runs on the driver over the bounded
    word-frequency vocabulary (standard BPE practice: the vocab is orders
    of magnitude smaller than the corpus at any scale). Deterministic
    tie-break: highest pair count, then lexicographic (a, b) — a serial
    replay must reproduce the EXACT merge sequence. Words are the same
    ``\\S+`` tokens as every other corpus query, lowercased."""
    import polars as pl
    from ray.data.aggregate import Sum

    def wc_partial(t: pa.Table) -> pa.Table:
        s = pl.from_arrow(pa.table({"t": t[text_col]}))["t"].fill_null("")
        df = (pl.DataFrame({"w": s.str.to_lowercase()
                            .str.extract_all(r"\S+")})
              .explode("w").drop_nulls("w")
              .group_by("w").agg(pl.len().cast(pl.Int64).alias("n")))
        return df.to_arrow().cast(pa.schema([("w", pa.string()),
                                             ("n", pa.int64())]))

    vocab_rows = (ds.map_batches(wc_partial, batch_format="pyarrow",
                                 batch_size=config.TEXT_BATCH_SIZE)
                  .groupby("w").aggregate(Sum("n", alias_name="n"))
                  .take_all())
    vocab = {r["w"]: int(r["n"]) for r in vocab_rows}
    merges = bpe_merges_from_vocab(vocab, n_merges)
    return pa.table({
        "rank": pa.array(range(len(merges)), pa.int64()),
        "left": pa.array([a for a, _, _ in merges], pa.string()),
        "right": pa.array([b for _, b, _ in merges], pa.string()),
        "pair_count": pa.array([c for _, _, c in merges], pa.int64())})


def bpe_merges_from_vocab(vocab: dict[str, int],
                          n_merges: int) -> list[tuple[str, str, int]]:
    """Driver-side merge loop (shared with the harness replay): greedy
    highest-count pair, ties by lexicographic pair."""
    words = {w: tuple(w) for w in vocab}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, sym in words.items():
            c = vocab[w]
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        merges.append((a, b, cnt))
        ab = a + b
        new_words = {}
        for w, sym in words.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_words[w] = tuple(out)
        words = new_words
    return merges
