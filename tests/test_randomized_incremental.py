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
