"""Seeded randomized sweep for incremental cross-corpus dedup
(pipelines/incremental.py) against a DuckDB NOT-EXISTS + window oracle:
random corpus/new splits with varying overlap rate, within-new dup rate,
multi-call index appends and partitioning, on BOTH anti-filter paths."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pyarrow as pa


def _rd():
    import ray.data as rd
    return rd


def test_near_dedup_embedding_randomized_vs_numpy(ray_session, tmp_path,
                                                  monkeypatch):
    """Random corpora with planted scaled/noised copies vs an exact
    all-pairs numpy cosine oracle, both engine paths. Near-threshold pairs
    are avoided by construction (LSH recall is probabilistic only near the
    threshold; planted copies sit at cos ≥ 0.999, noise vectors far below —
    the same separation regime the oracled query relies on)."""
    import numpy as np

    from data_quality_framework_ray import config
    from data_quality_framework_ray.pipelines.incremental import (
        build_embedding_index,
        near_dedup_embedding_against_index,
    )

    rng = np.random.default_rng(77)
    for trial in range(4):
        if trial % 2 == 1:
            monkeypatch.setattr(config, "MEMBERSHIP_BROADCAST_LIMIT", 0)
            monkeypatch.setattr(config, "DRIVER_PAIR_LIMIT", 0)
        else:
            monkeypatch.setattr(config, "MEMBERSHIP_BROADCAST_LIMIT",
                                5_000_000)
            monkeypatch.setattr(config, "DRIVER_PAIR_LIMIT", 2_000_000)
        n_c, n_new, dim = [(30, 15, 8), (100, 40, 32),
                           (5, 10, 16), (60, 25, 64)][trial]
        corpus_v = rng.standard_normal((n_c, dim)).astype(np.float32)
        picks = rng.integers(0, n_c, size=n_new)
        is_dup = rng.random(n_new) < 0.5
        new_v = np.where(
            is_dup[:, None],
            corpus_v[picks] * rng.uniform(0.5, 2.0, (n_new, 1)).astype(
                np.float32),
            rng.standard_normal((n_new, dim)).astype(np.float32))
        lt = pa.list_(pa.float32())
        corpus = pa.table({"vec_id": pa.array(range(n_c), pa.int64()),
                           "embedding": pa.array([list(v) for v in corpus_v],
                                                 type=lt)})
        new = pa.table(
            {"vec_id": pa.array(range(1000, 1000 + n_new), pa.int64()),
             "embedding": pa.array([list(v) for v in new_v], type=lt)})
        idx = str(tmp_path / f"emb{trial}")
        build_embedding_index(
            _rd().from_arrow(corpus).repartition(int(rng.integers(1, 4))),
            "embedding", "vec_id", idx)
        got = sorted(r["vec_id"] for r in near_dedup_embedding_against_index(
            _rd().from_arrow(new).repartition(int(rng.integers(1, 3))),
            "embedding", "vec_id", idx).take_all())
        # exact oracle
        cn = corpus_v.astype(np.float64)
        nn = new_v.astype(np.float64)
        cn /= np.linalg.norm(cn, axis=1, keepdims=True)
        nn /= np.linalg.norm(nn, axis=1, keepdims=True)
        hit = (nn @ cn.T >= 0.98).any(axis=1)
        # guard the construction: non-dups must sit far from the threshold
        sims = (nn @ cn.T).max(axis=1)
        assert not ((sims > 0.9) & (sims < 0.999)).any(), trial
        want = sorted(int(1000 + i) for i in range(n_new) if not hit[i])
        assert got == want, (trial, got, want)


def test_dedup_against_index_randomized_vs_duckdb(ray_session, tmp_path,
                                                  monkeypatch):
    from data_quality_framework_ray import config
    from data_quality_framework_ray.pipelines.incremental import (
        build_content_index,
        dedup_against_index,
    )

    rng = random.Random(57)
    for trial in range(5):
        force_join = trial % 2 == 1
        monkeypatch.setattr(config, "BROADCAST_DUP_LIMIT",
                            0 if force_join else 100_000)
        vocab = [f"text {i}" for i in range(rng.choice([5, 40, 200]))]
        n_corpus, n_new = rng.choice([(0, 20), (50, 50), (150, 30)])
        corpus_txt = [rng.choice(vocab) for _ in range(n_corpus)]
        # draw new texts from the SAME vocab → random overlap + within-dups
        new_txt = [rng.choice(vocab) for _ in range(n_new)]
        corpus = pa.table({"doc_id": pa.array(range(n_corpus), pa.int64()),
                           "text": pa.array(corpus_txt)})
        new = pa.table(
            {"doc_id": pa.array(range(1000, 1000 + n_new), pa.int64()),
             "text": pa.array(new_txt)})

        idx = str(tmp_path / f"idx{trial}")
        n_appends = rng.choice([1, 2])  # split the corpus across 1-2 builds
        cds = _rd().from_arrow(corpus).repartition(rng.choice([1, 4]))
        if n_appends == 2 and n_corpus:
            half = n_corpus // 2
            build_content_index(
                _rd().from_arrow(corpus.slice(0, half)), ["text"], idx)
            build_content_index(
                _rd().from_arrow(corpus.slice(half)), ["text"], idx)
        else:
            build_content_index(cds, ["text"], idx)

        out = dedup_against_index(
            _rd().from_arrow(new).repartition(rng.choice([1, 3])),
            ["text"], "doc_id", idx)
        got = sorted(r["doc_id"] for r in out.take_all())

        want = duckdb.sql("""
            SELECT doc_id FROM (
              SELECT doc_id, text,
                     min(doc_id) OVER (PARTITION BY text) AS m FROM new) n
            WHERE doc_id = m AND NOT EXISTS
              (SELECT 1 FROM corpus c WHERE c.text = n.text)
            ORDER BY doc_id""").df()["doc_id"].tolist()
        assert got == want, (trial, force_join, got, want)
