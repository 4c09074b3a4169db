"""Seeded randomized sweeps for the continuation-session stream/window
operators (debounce chains, EWMA, Markov transitions, per-key top-k)
against independent DuckDB / pandas oracles — ties, duplicate timestamps,
single-event keys and partition counts that the fixed tables rarely hit."""

from __future__ import annotations

import random

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import polars as pl
import pytest


def _rd():
    import ray.data as rd
    return rd


def _events(rng, n, n_users, ts_domain):
    return pa.table({
        "user_id": pa.array([rng.randrange(n_users) for _ in range(n)],
                            pa.int64()),
        "event_id": pa.array(list(range(n)), pa.int64()),
        "ts": pa.array([rng.randrange(ts_domain) * 1_000_000
                        for _ in range(n)], pa.timestamp("us")),
        "event_type": pa.array([rng.choice("abc") for _ in range(n)]),
        "value": pa.array([round(rng.uniform(-5, 5), 2)
                           for _ in range(n)], pa.float64())})


def _part_kernel_over(t, kernel, out_schema, parts=4):
    """Mimic the entry queries' exchange: hash-partition by user, run the
    polars kernel per partition."""
    import pyarrow.compute as pc

    ds = _rd().from_arrow(t).repartition(3)

    def add_part(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        return b.append_column("__part",
                               pa.array((uid % parts).astype("int64")))

    out = (ds.map_batches(add_part, batch_format="pyarrow")
           .groupby("__part")
           .map_groups(lambda g: kernel(g.drop_columns(["__part"]))
                       .cast(out_schema), batch_format="pyarrow"))
    return out.take_all()


def test_debounce_chain_randomized_vs_duckdb(ray_session):
    rng = random.Random(41)
    for _ in range(4):
        n = rng.choice([1, 5, 120])
        t = _events(rng, n, n_users=3, ts_domain=4 * 3600)  # dense ties

        def kernel(part: pa.Table) -> pa.Table:
            df = (pl.from_arrow(part)
                  .sort(["user_id", "event_type", "ts", "event_id"])
                  .with_columns(d=pl.col("ts").diff()
                                .over(["user_id", "event_type"])))
            kept = df.filter(pl.col("d").is_null()
                             | (pl.col("d") > pl.duration(hours=1)))
            return kept.select(["event_id"]).to_arrow()

        got = sorted(r["event_id"] for r in _part_kernel_over(
            t, kernel, pa.schema([("event_id", pa.int64())])))
        want = [r[0] for r in duckdb.sql("""
            SELECT event_id FROM (
              SELECT event_id, ts - lag(ts) OVER (
                PARTITION BY user_id, event_type
                ORDER BY ts, event_id) AS d FROM t)
            WHERE d IS NULL OR d > INTERVAL 1 HOUR ORDER BY event_id
        """).fetchall()]
        assert got == want


def test_ewma_randomized_vs_pandas(ray_session):
    rng = random.Random(42)
    for _ in range(4):
        n = rng.choice([1, 7, 200])
        t = _events(rng, n, n_users=4, ts_domain=1000)

        def kernel(part: pa.Table) -> pa.Table:
            df = (pl.from_arrow(part).sort(["user_id", "ts", "event_id"])
                  .with_columns(pl.col("value")
                                .ewm_mean(alpha=0.3, adjust=False)
                                .over("user_id").alias("ewma")))
            return df.select(["event_id", "ewma"]).to_arrow()

        got = {r["event_id"]: r["ewma"] for r in _part_kernel_over(
            t, kernel, pa.schema([("event_id", pa.int64()),
                                  ("ewma", pa.float64())]))}
        df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
        df["want"] = (df.groupby("user_id")["value"]
                      .transform(lambda s: s.ewm(alpha=0.3,
                                                 adjust=False).mean()))
        for _, r in df.iterrows():
            assert abs(got[r["event_id"]] - r["want"]) <= 1e-12 * max(
                1.0, abs(r["want"]))


def test_markov_transitions_randomized_vs_duckdb(ray_session):
    rng = random.Random(43)
    for _ in range(4):
        n = rng.choice([1, 2, 150])
        t = _events(rng, n, n_users=3, ts_domain=50)  # many ts ties

        def kernel(part: pa.Table) -> pa.Table:
            df = (pl.from_arrow(part)
                  .sort(["user_id", "ts", "event_id"])
                  .with_columns(prev=pl.col("event_type").shift(1)
                                .over("user_id"))
                  .drop_nulls("prev")
                  .group_by(["prev", "event_type"])
                  .agg(pl.len().cast(pl.Int64).alias("n"))
                  .rename({"event_type": "cur"}))
            return df.to_arrow()

        parts = _part_kernel_over(
            t, kernel, pa.schema([("prev", pa.string()),
                                  ("cur", pa.string()),
                                  ("n", pa.int64())]))
        agg: dict[tuple, int] = {}
        for r in parts:
            k = (r["prev"], r["cur"])
            agg[k] = agg.get(k, 0) + r["n"]
        want = {(a, b): c for a, b, c in duckdb.sql("""
            WITH seq AS (SELECT event_type AS cur,
              lag(event_type) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS prev FROM t)
            SELECT prev, cur, count(*) FROM seq
            WHERE prev IS NOT NULL GROUP BY 1, 2
        """).fetchall()}
        assert agg == want


def test_topk_per_group_randomized_vs_duckdb(ray_session):
    rng = random.Random(44)
    for _ in range(4):
        n = rng.choice([1, 4, 200])
        t = _events(rng, n, n_users=5, ts_domain=100)
        # duplicate VALUES on purpose: 2-decimal rounding collides often

        def kernel(part: pa.Table) -> pa.Table:
            df = (pl.from_arrow(part)
                  .sort(["user_id", "value", "event_id"],
                        descending=[False, True, False])
                  .with_columns(rnk=pl.int_range(1, pl.len() + 1)
                                .over("user_id"))
                  .filter(pl.col("rnk") <= 3))
            return df.select(["user_id", "rnk", "event_id"]).to_arrow()

        got = sorted((r["user_id"], r["rnk"], r["event_id"])
                     for r in _part_kernel_over(
                         t, kernel,
                         pa.schema([("user_id", pa.int64()),
                                    ("rnk", pa.int64()),
                                    ("event_id", pa.int64())])))
        want = sorted(map(tuple, duckdb.sql("""
            SELECT user_id, rnk, event_id FROM (
              SELECT user_id, event_id, row_number() OVER (
                PARTITION BY user_id ORDER BY value DESC, event_id
              )::BIGINT AS rnk FROM t)
            WHERE rnk <= 3
        """).fetchall()))
        assert got == want


def test_corpus_prep_randomized_vs_duckdb(ray_session):
    """The END-TO-END corpus pipeline vs the chained-CTE oracle on random
    corpora: random dup groups, sub-threshold docs, snippet carriers and
    multi-source budget cuts."""
    rng = random.Random(45)
    from data_quality_framework_ray.pipelines.text_analysis import \
        prepare_corpus

    for _ in range(3):
        n = rng.choice([3, 40, 120])
        rows = []
        for i in range(n):
            kind = rng.random()
            if kind < 0.15:
                text = "dup group " + " ".join(
                    f"d{rng.randrange(3)}w{j}" for j in range(15))
            elif kind < 0.3:
                text = "tiny"
            else:
                text = " ".join(f"w{rng.randrange(400)}"
                                for _ in range(rng.randrange(5, 60)))
            rows.append({"doc_id": i, "text": text,
                         "source": rng.choice("xy")})
        t = pa.table({
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "text": pa.array([r["text"] for r in rows]),
            "source": pa.array([r["source"] for r in rows])})
        got = sorted(
            (r["doc_id"], r["source"], r["n_tokens"])
            for r in prepare_corpus(_rd().from_arrow(t).repartition(3),
                                    token_budget=300).take_all())
        want = sorted(map(tuple, duckdb.sql("""
            WITH s AS (SELECT doc_id, text, source,
              length(text) AS n_chars,
              len(regexp_extract_all(text, '\\S+')) AS n_tokens,
              (SELECT count(DISTINCT x) FROM
               unnest(regexp_extract_all(text, '\\S+')) AS u(x))
               AS n_distinct,
              min(doc_id) OVER (PARTITION BY text) AS rep FROM t),
            kept AS (SELECT doc_id, text, source, n_tokens FROM s
             WHERE NOT (n_tokens < 12 OR n_chars > 500
              OR n_distinct * 100 < 45 * n_tokens OR doc_id <> rep)),
            snips AS (SELECT substr(text, 1, 40) AS snip FROM t
             WHERE doc_id % 50 = 0 AND substr(text, 1, 40) <> ''),
            clean AS (SELECT doc_id, source, n_tokens FROM kept k
             WHERE NOT EXISTS (SELECT 1 FROM snips b
              WHERE contains(k.text, b.snip)))
            SELECT doc_id, source, n_tokens FROM clean
            QUALIFY sum(n_tokens) OVER (PARTITION BY source
              ORDER BY doc_id ROWS UNBOUNDED PRECEDING) <= 300
        """).fetchall()))
        assert got == want
