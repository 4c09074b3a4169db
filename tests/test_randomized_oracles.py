"""Seeded randomized sweeps of library operators against independent
oracles (DuckDB correlated subqueries / inequality joins, numpy, plain
Python counters). The driver's correctness harness checks each operator on
ONE fixed table per tier; these sweeps vary shape, ties, nulls, empty
matches and partitioning — the corners fixed fixtures rarely hit."""

from __future__ import annotations

import collections
import math
import random

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _rd():
    import ray.data as rd
    return rd


def test_asof_join_prev_randomized_vs_duckdb(ray_session):
    from data_quality_framework_ray.pipelines.joins import asof_join_prev

    rng = random.Random(7)
    for trial in range(6):
        n = rng.choice([1, 2, 30, 300])
        keys = [f"k{rng.randrange(max(1, n // 4))}" for _ in range(n)]
        ts = [rng.randrange(0, max(2, n // 2)) for _ in range(n)]  # ties
        val = [rng.random() for _ in range(n)]
        t = pa.table({"k": pa.array(keys), "ts": pa.array(ts, pa.int64()),
                      "v": pa.array(val, pa.float64())})
        ds = _rd().from_arrow(t).repartition(rng.choice([1, 4]))
        got = asof_join_prev(ds, "k", "ts", value_cols=["v"]).take_all()
        got_df = (pd.DataFrame(got, columns=["k", "ts", "v", "prev_ts"])
                  .sort_values(["k", "ts", "v"]).reset_index(drop=True))
        want = duckdb.sql("""
            WITH w AS (
              SELECT k, ts, v,
                     (SELECT max(t2.ts) FROM t t2
                      WHERE t2.k = t.k AND t2.ts < t.ts) AS prev_ts
              FROM t)
            SELECT * FROM w WHERE prev_ts IS NOT NULL
            ORDER BY k, ts, v
        """).df().reset_index(drop=True)
        pd.testing.assert_frame_equal(got_df, want, check_dtype=False)


def test_range_join_broadcast_randomized_vs_duckdb(ray_session):
    from data_quality_framework_ray.pipelines.joins import range_join_broadcast

    rng = random.Random(8)
    for trial in range(6):
        n = rng.choice([1, 50, 300])
        m = rng.choice([1, 5, 30])
        ts = [rng.randrange(0, 100) for _ in range(n)]
        t = pa.table({"rid": pa.array(range(n), pa.int64()),
                      "ts": pa.array(ts, pa.int64())})
        starts = [rng.randrange(0, 100) for _ in range(m)]
        iv = pd.DataFrame({"iv_id": range(m), "start": starts,
                           "end": [s + rng.randrange(0, 20) for s in starts]})
        ds = _rd().from_arrow(t).repartition(rng.choice([1, 4]))
        got = range_join_broadcast(ds, iv, "ts", "start", "end").take_all()
        cols = ["rid", "ts", "iv_id", "start", "end"]
        got_df = (pd.DataFrame(got, columns=cols) if got
                  else pd.DataFrame(columns=cols))
        got_df = got_df.sort_values(["rid", "iv_id"]).reset_index(drop=True)
        want = duckdb.sql("""
            SELECT t.rid, t.ts, iv.iv_id, iv.start, iv."end"
            FROM t JOIN iv ON t.ts >= iv.start AND t.ts < iv."end"
            ORDER BY t.rid, iv.iv_id
        """).df().reset_index(drop=True)
        pd.testing.assert_frame_equal(got_df, want, check_dtype=False)


def test_quantiles_randomized_vs_numpy(ray_session):
    from data_quality_framework_ray.pipelines.stats import (exact_quantiles,
                                                            grouped_quantiles)

    rng = random.Random(99)
    for trial in range(5):
        n = rng.choice([1, 2, 37, 300])
        keys = [f"g{rng.randrange(max(1, n // 8))}" for _ in range(n)]
        vals = [rng.choice([0.0, -1.5, 3.25, rng.random() * 100])
                for _ in range(n)]
        t = pa.table({"k": pa.array(keys), "v": pa.array(vals, pa.float64())})
        ds = _rd().from_arrow(t).repartition(rng.choice([1, 4]))
        ps = sorted(rng.sample([0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0], 3))

        got = exact_quantiles(ds, "v", ps)
        # contract: DuckDB quantile_disc — value at 1-based pos ceil(p*n)
        sv = sorted(vals)
        for p, gv in got:
            wv = sv[max(1, math.ceil(p * len(sv))) - 1]
            assert math.isclose(gv, wv, rel_tol=1e-9, abs_tol=1e-12), (p, gv, wv)

        gq = grouped_quantiles(ds, "k", "v", ps)
        gq = gq.to_pandas() if isinstance(gq, pa.Table) else pd.DataFrame(
            gq.take_all() if hasattr(gq, "take_all") else gq)
        pdf = pd.DataFrame({"k": keys, "v": vals})
        for _, row in gq.iterrows():
            grp = sorted(pdf[pdf["k"] == row["k"]]["v"])
            for p in ps:
                col = f"p{int(p * 100)}"
                if col in row.index:
                    wv = grp[max(1, math.ceil(p * len(grp))) - 1]
                    assert math.isclose(float(row[col]), wv, rel_tol=1e-9,
                                        abs_tol=1e-9), (row["k"], p)


def test_grouped_correlation_randomized_vs_duckdb(ray_session):
    from data_quality_framework_ray.pipelines.stats import grouped_correlation

    rng = random.Random(5)
    for trial in range(5):
        n = rng.choice([2, 40, 300])
        keys = [f"g{rng.randrange(max(1, n // 10))}" for _ in range(n)]
        xs = [rng.random() * 10 for _ in range(n)]
        ys = [x * 2 + rng.random() for x in xs]
        t = pa.table({"k": pa.array(keys), "x": pa.array(xs),
                      "y": pa.array(ys)})
        ds = _rd().from_arrow(t).repartition(rng.choice([1, 4]))
        gc = grouped_correlation(ds, "k", "x", "y")  # list of dicts
        gc = pd.DataFrame(gc)
        gc = gc.sort_values("k").reset_index(drop=True)
        want = duckdb.sql(
            "SELECT k, corr(x, y) AS c FROM t GROUP BY k ORDER BY k").df()
        cname = [c for c in gc.columns if c != "k"][0]
        for g, w in zip(gc[cname], want["c"]):
            if pd.isna(g) and pd.isna(w):
                continue
            assert math.isclose(float(g), float(w), rel_tol=1e-6,
                                abs_tol=1e-9), (g, w)


def test_histogram_fixed_randomized_vs_counter(ray_session):
    from data_quality_framework_ray.pipelines.stats import histogram_fixed

    rng = random.Random(99)
    for trial in range(8):
        n = rng.choice([1, 60, 300])
        vals = [rng.random() * 40 - 10 for _ in range(n)]
        width = rng.choice([1.0, 2.5, 7.0])
        origin = rng.choice([0.0, -3.0])
        t = pa.table({"v": pa.array(vals, pa.float64())})
        h = histogram_fixed(_rd().from_arrow(t).repartition(
            rng.choice([1, 4])), "v", width, origin)
        got = dict(zip(h["bin"].to_pylist(), h["n"].to_pylist()))
        want = dict(collections.Counter(
            math.floor((v - origin) / width) for v in vals))
        assert got == want, (trial, width, origin)
