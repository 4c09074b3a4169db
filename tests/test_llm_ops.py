"""Decontamination, repetition signals, and sequence packing."""

import numpy as np
import pandas as pd
import ray.data as rd

from data_quality_framework_ray.pipelines.decontam import (
    benchmark_snippets,
    flag_contaminated,
    repetition_stats,
)
from data_quality_framework_ray.pipelines.packing import pack_chunks


def test_flag_contaminated(ray_session):
    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["the quick brown fox", "slow red fox", "quick brown", ""],
    })
    out = (flag_contaminated(rd.from_pandas(df), ["quick brown", "zebra"])
           .to_pandas().sort_values("doc_id"))
    assert out["contaminated"].tolist() == [True, False, True, False]


def test_flag_contaminated_empty_snippets(ray_session):
    df = pd.DataFrame({"doc_id": [0], "text": ["anything"]})
    out = flag_contaminated(rd.from_pandas(df), ["", ""]).to_pandas()
    assert out["contaminated"].tolist() == [False]


def test_benchmark_snippets_deterministic(ray_session):
    df = pd.DataFrame({"doc_id": range(200),
                       "text": [f"doc number {i} content" for i in range(200)]})
    s1 = benchmark_snippets(rd.from_pandas(df), mod=50, length=10)
    s2 = benchmark_snippets(rd.from_pandas(df), mod=50, length=10)
    assert s1 == s2 == sorted({f"doc number {i} content"[:10]
                               for i in range(0, 200, 50)})


def test_repetition_stats_hand_example(ray_session):
    # "a b a b a" -> 5 words, 2 unique, top word 'a' x3, top bigram x2 of 4
    df = pd.DataFrame({"doc_id": [7, 8],
                       "text": ["a b a b a", "x"]})
    out = (repetition_stats(rd.from_pandas(df)).to_pandas()
           .set_index("doc_id"))
    r = out.loc[7]
    assert r["n_words"] == 5 and r["n_unique_words"] == 2
    assert r["dup_word_frac"] == round(1 - 2 / 5, 6)
    assert r["top_word_frac"] == round(3 / 5, 6)
    assert r["top_bigram_frac"] == round(2 / 4, 6)
    single = out.loc[8]
    assert single["n_words"] == 1 and single["top_bigram_frac"] == 0.0


def test_pack_chunks_matches_naive_and_bucket_invariant(ray_session):
    rng = np.random.default_rng(11)
    n = 2_000
    w = rng.integers(10, 400, n).astype(np.int64)
    ids = np.arange(n)
    df = pd.DataFrame({"doc_id": ids, "w": w})
    budget = 4096

    want = np.concatenate(([0], np.cumsum(w)[:-1])) // budget

    for bucket_size in (50, 1_000, 10_000_000):
        out = (pack_chunks(rd.from_pandas(df).repartition(7), weight_col="w",
                           id_col="doc_id", budget=budget,
                           bucket_size=bucket_size)
               .to_pandas().sort_values("doc_id"))
        assert (out["pack_id"].to_numpy() == want).all(), bucket_size
        assert len(out) == n

    # packing property: every pack's weight ≤ budget + (straddler - 1),
    # i.e. strictly less than budget + max doc weight
    sums = pd.DataFrame({"p": want, "w": w}).groupby("p")["w"].sum()
    assert (sums.to_numpy() < budget + w.max()).all()
