"""Seeded randomized sweeps for the join family, CDC snapshot_diff,
Aho-Corasick decontamination and Misra-Gries heavy hitters — the operators
whose driver-oracle rows run on ONE fixed table per tier. These vary key
skew, null keys, dup keys, empty overlap, snippet overlap and partitioning,
and exercise BOTH execution paths (broadcast and distributed) where the
library auto-switches on cardinality."""

from __future__ import annotations

import collections
import random

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa


def _rd():
    import ray.data as rd
    return rd


def _df(rows, cols):
    d = (pd.DataFrame(rows, columns=cols) if rows
         else pd.DataFrame(columns=cols))
    return d.sort_values(cols).reset_index(drop=True)


def test_hash_join_randomized_vs_duckdb(ray_session):
    from data_quality_framework_ray.pipelines.joins import hash_join

    rng = random.Random(41)
    for trial in range(5):
        n, m = rng.choice([(1, 1), (40, 7), (200, 300), (50, 0)])
        lkeys = [rng.randrange(0, 12) if rng.random() > 0.1 else None
                 for _ in range(n)]
        rkeys = [rng.randrange(0, 12) if rng.random() > 0.1 else None
                 for _ in range(m)]
        l = pa.table({"k": pa.array(lkeys, pa.int64()),
                      "v": pa.array(range(n), pa.int64())})
        r = pa.table({"k": pa.array(rkeys, pa.int64()),
                      "w": pa.array(range(m), pa.int64())})
        lds = _rd().from_arrow(l).repartition(rng.choice([1, 3]))
        rds = (_rd().from_arrow(r).repartition(rng.choice([1, 3]))
               if m else _rd().from_arrow(r))
        got = hash_join(lds, rds, "k",
                        num_partitions=rng.choice([2, 4])).take_all()
        got_df = _df([(x["k"], x["v"], x["w"]) for x in got],
                     ["k", "v", "w"])
        want = duckdb.sql(
            "SELECT l.k, l.v, r.w FROM l JOIN r ON l.k = r.k").df()
        want = _df(list(want.itertuples(index=False)), ["k", "v", "w"])
        pd.testing.assert_frame_equal(got_df, want, check_dtype=False)


def test_semi_anti_join_randomized_vs_duckdb(ray_session, monkeypatch):
    """EXISTS / NOT EXISTS parity incl. null-key rows, on BOTH the
    broadcast-key-set path and the Dataset.join fallback."""
    from data_quality_framework_ray import config
    from data_quality_framework_ray.pipelines.joins import semi_join

    rng = random.Random(42)
    for trial in range(6):
        force_join = trial % 2 == 1
        monkeypatch.setattr(config, "BROADCAST_DUP_LIMIT",
                            0 if force_join else 100_000)
        n, m = rng.choice([(30, 5), (120, 40), (25, 0)])
        lkeys = [rng.randrange(0, 15) if rng.random() > 0.15 else None
                 for _ in range(n)]
        rkeys = [rng.randrange(0, 15) if rng.random() > 0.15 else None
                 for _ in range(m)]
        l = pa.table({"k": pa.array(lkeys, pa.int64()),
                      "v": pa.array(range(n), pa.int64())})
        r = pa.table({"k": pa.array(rkeys, pa.int64()),
                      "p": pa.array(range(m), pa.int64())})
        lds = _rd().from_arrow(l).repartition(rng.choice([1, 4]))
        rds = _rd().from_arrow(r)
        for anti in (False, True):
            got = semi_join(lds, rds, "k", anti=anti).take_all()
            got_df = _df([(x["k"], x["v"]) for x in got], ["k", "v"])
            op = "NOT EXISTS" if anti else "EXISTS"
            want = duckdb.sql(f"""
                SELECT l.k, l.v FROM l WHERE {op}
                  (SELECT 1 FROM r WHERE r.k = l.k)
                ORDER BY k, v""").df()
            want = _df(list(want.itertuples(index=False)), ["k", "v"])
            pd.testing.assert_frame_equal(got_df, want, check_dtype=False,
                                          obj=f"anti={anti} join={force_join}")


def test_snapshot_diff_randomized_vs_duckdb(ray_session, monkeypatch):
    """CDC classify (added/removed/changed, IS DISTINCT FROM null compare)
    on random unique-key snapshots with null values, both paths."""
    from data_quality_framework_ray import config
    from data_quality_framework_ray.pipelines.joins import snapshot_diff

    rng = random.Random(43)
    for trial in range(6):
        force_join = trial % 2 == 1
        monkeypatch.setattr(config, "BROADCAST_DUP_LIMIT",
                            0 if force_join else 100_000)
        universe = list(range(40))
        okeys = rng.sample(universe, rng.choice([0, 10, 30]))
        nkeys = rng.sample(universe, rng.choice([1, 15, 30]))

        def vals(keys):
            return [rng.randrange(0, 4) if rng.random() > 0.2 else None
                    for _ in keys]

        old = pa.table({"k": pa.array(okeys, pa.int64()),
                        "a": pa.array(vals(okeys), pa.int64()),
                        "b": pa.array(vals(okeys), pa.int64())})
        new = pa.table({"k": pa.array(nkeys, pa.int64()),
                        "a": pa.array(vals(nkeys), pa.int64()),
                        "b": pa.array(vals(nkeys), pa.int64())})
        ods = _rd().from_arrow(old).repartition(rng.choice([1, 3]))
        nds = _rd().from_arrow(new).repartition(rng.choice([1, 3]))
        got = snapshot_diff(ods, nds, "k", ["a", "b"]).take_all()
        got_df = _df([(x["k"], x["change"]) for x in got], ["k", "change"])
        want = duckdb.sql("""
            WITH j AS (
              SELECT COALESCE(o.k, n.k) AS k,
                CASE WHEN o.k IS NULL THEN 'added'
                     WHEN n.k IS NULL THEN 'removed'
                     WHEN (o.a IS DISTINCT FROM n.a)
                       OR (o.b IS DISTINCT FROM n.b) THEN 'changed'
                END AS change
              FROM old o FULL OUTER JOIN new n ON o.k = n.k)
            SELECT k, change FROM j WHERE change IS NOT NULL
            ORDER BY k, change""").df()
        want = _df(list(want.itertuples(index=False)), ["k", "change"])
        pd.testing.assert_frame_equal(got_df, want, check_dtype=False,
                                      obj=f"trial={trial} join={force_join}")


def test_flag_contaminated_randomized_vs_naive(ray_session):
    """Multi-pattern substring flagging vs a plain `any(s in t)` oracle —
    overlapping snippets, snippets that are prefixes of each other, unicode,
    null texts."""
    from data_quality_framework_ray.pipelines.decontam import flag_contaminated

    rng = random.Random(44)
    alphabet = "abcé漢 "
    for trial in range(5):
        snips = list({("".join(rng.choice(alphabet)
                               for _ in range(rng.randrange(1, 6))))
                      for _ in range(rng.randrange(1, 10))})
        # force prefix-of-each-other pairs (Aho-Corasick suffix links)
        if snips:
            snips.append(snips[0] + "x")
        n = rng.choice([1, 50, 400])
        texts = ["".join(rng.choice(alphabet)
                         for _ in range(rng.randrange(0, 40)))
                 if rng.random() > 0.05 else None for _ in range(n)]
        t = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                      "text": pa.array(texts, pa.string())})
        ds = _rd().from_arrow(t).repartition(rng.choice([1, 4]))
        got = {x["doc_id"]: x["contaminated"]
               for x in flag_contaminated(ds, snips).take_all()}
        for i, tx in enumerate(texts):
            want = bool(tx) and any(s in tx for s in snips if s)
            assert got[i] == want, (trial, i, tx, snips)


def test_heavy_hitters_randomized_zipf_vs_counter(ray_session):
    """Exact top-k equality vs a Counter oracle on zipf-ish draws, under
    capacity pressure (capacity far below distinct count) — the MG guarantee
    is exercised, not just the easy wide-margin regime."""
    from data_quality_framework_ray.functions.sketches import heavy_hitters

    rng = random.Random(45)
    for trial in range(4):
        n = rng.choice([500, 3000])
        a = rng.choice([1.3, 1.8])
        draws = np.random.default_rng(trial).zipf(a, size=n)
        vals = [f"tok{int(v) % 997}" for v in draws]
        t = pa.table({"tok": pa.array(vals, pa.string())})
        ds = _rd().from_arrow(t).repartition(rng.choice([1, 4]))
        k = rng.choice([3, 10])
        out = heavy_hitters(ds, "tok", k, capacity=64)
        got = list(zip(out["value"].to_pylist(), out["n"].to_pylist()))
        cnt = collections.Counter(vals)
        want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:len(got)]
        # result is (n desc, value asc); compare count multiset of the top-k
        # prefix (value ties at the k-th count are resolved by value asc on
        # both sides, so exact tuple equality holds)
        assert got == want, (trial, got[:5], want[:5])


def test_left_outer_broadcast_vs_hash_join_randomized(ray_session):
    """The two left-outer paths (broadcast polars lookup vs Ray's
    partitioned hash join) must agree row-for-row, including unmatched
    left rows (null payload) and duplicate right keys (fan-out)."""
    import ray.data as rd

    from data_quality_framework_ray.pipelines.joins import (
        broadcast_hash_join, hash_join)

    rng = random.Random(31)
    for trial in range(4):
        nl = rng.choice([1, 20, 200])
        nr = rng.choice([0, 5, 50])
        lt = pa.table({"k": pa.array([rng.randrange(12) for _ in range(nl)],
                                     pa.int64()),
                       "lv": pa.array(range(nl), pa.int64())})
        rt = pa.table({"rk": pa.array([rng.randrange(12) for _ in range(nr)],
                                      pa.int64()),
                       "rv": pa.array(range(nr), pa.int64())})
        left = rd.from_arrow(lt).repartition(rng.choice([1, 3]))
        got_b = broadcast_hash_join(left, rt, "k", "rk", how="left").take_all()
        got_h = hash_join(rd.from_arrow(lt), rd.from_arrow(rt),
                          on="k", right_on="rk",
                          join_type="left_outer").take_all()

        def norm(rows):
            return sorted((r["k"], r["lv"], r.get("rv")) for r in rows)

        assert norm(got_b) == norm(got_h)
        want = duckdb.sql(
            "SELECT k, lv, rv FROM lt LEFT JOIN rt ON k = rk"
        ).fetchall()
        assert norm(got_b) == sorted(want)


def test_flag_contaminated_embeddings_randomized(ray_session):
    """Planted scaled copies flag; orthogonal/negated vectors don't; empty
    bench flags nothing."""
    import ray.data as rd

    from data_quality_framework_ray.pipelines.decontam import \
        flag_contaminated_embeddings

    rng = np.random.default_rng(91)
    for trial in range(3):
        n, d = [(5, 4), (80, 16), (200, 8)][trial]
        x = rng.normal(size=(n, d))
        rows = [{"vec_id": i, "embedding": x[i].astype(np.float32).tolist()}
                for i in range(n)]
        planted = [i for i in range(n) if i % 5 == 0]
        bench = np.concatenate([x[planted] * 3.0,          # cos == 1
                                -x[[i for i in range(n) if i % 5 == 1]]])
        out = flag_contaminated_embeddings(
            rd.from_items(rows).repartition(2), bench).take_all()
        got = {r["vec_id"] for r in out if r["contaminated"]}
        # scaled copies must flag; exact expected set needs the full cosine
        # check for coincidental near-matches of the random vectors
        xe = np.stack([np.asarray(r["embedding"], dtype=np.float64)
                       for r in rows])
        xe /= np.linalg.norm(xe, axis=1, keepdims=True)
        be = bench / np.linalg.norm(bench, axis=1, keepdims=True)
        want = {i for i in range(n) if (xe[i] @ be.T).max() >= 0.98}
        assert set(planted) <= got == want

    e = flag_contaminated_embeddings(
        rd.from_items(rows), np.empty((0, d))).take_all()
    assert not any(r["contaminated"] for r in e)
