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


def test_pack_chunks_randomized_vs_serial_oracle(ray_session):
    from data_quality_framework_ray.pipelines.packing import pack_chunks

    rng = random.Random(17)
    for trial in range(6):
        n = rng.choice([1, 2, 100, 1500])
        budget = rng.choice([5, 64, 1000])
        step = rng.choice([1, 7])
        ids = [i * step for i in range(n)]
        rng.shuffle(ids)
        w = [rng.randrange(1, min(budget, 50) + 1) for _ in range(n)]
        t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "tok": pa.array(w, pa.int64())})
        ds = _rd().from_arrow(t).repartition(rng.choice([1, 4]))
        got = pack_chunks(ds, weight_col="tok", id_col="doc_id",
                          budget=budget,
                          bucket_size=rng.choice([8, 100000]))
        gd = {r["doc_id"]: r["pack_id"] for r in got.take_all()}
        prefix = 0
        want = {}
        for i in np.argsort(ids, kind="stable"):
            want[ids[i]] = prefix // budget
            prefix += w[i]
        assert gd == want, (trial, n, budget)


def test_minhash_randomized_planted_clusters(ray_session):
    """Random corpora with planted near-identical clusters: every planted
    pair must co-cluster (exact verify), and no cluster may join docs whose
    true 3-gram Jaccard is below 0.5 (false-merge guard)."""
    import itertools

    from data_quality_framework_ray.pipelines.dedup import \
        minhash_lsh_dup_groups

    rng = random.Random(31)
    vocab = [f"w{i}" for i in range(500)]

    def jac(a, b, k=3):
        sa = {a[i:i + k] for i in range(max(1, len(a) - k + 1))}
        sb = {b[i:i + k] for i in range(max(1, len(b) - k + 1))}
        return len(sa & sb) / max(1, len(sa | sb))

    for trial in range(3):
        docs, planted = {}, []
        for i in range(rng.choice([20, 120])):
            docs[f"b{i:04d}"] = " ".join(rng.choice(vocab) for _ in range(40))
        for c in range(rng.choice([2, 6])):
            base = " ".join(rng.choice(vocab) for _ in range(60))
            members = [f"p{c:02d}_0"]
            docs[members[0]] = base
            for j in range(1, rng.choice([2, 4])):
                m = f"p{c:02d}_{j}"
                docs[m] = base + " zz"
                members.append(m)
            planted.append(members)
        ids = sorted(docs)
        t = pa.table({"doc_id": pa.array(ids),
                      "text": pa.array([docs[i] for i in ids])})
        comp = minhash_lsh_dup_groups(
            _rd().from_arrow(t).repartition(rng.choice([1, 4])),
            "text", "doc_id", threshold=0.8, verify="exact")
        for members in planted:
            reps = {comp.get(m) for m in members}
            assert len(reps) == 1 and None not in reps, (trial, members)
        by_rep: dict = {}
        for d, r in comp.items():
            by_rep.setdefault(r, []).append(d)
        for mem in by_rep.values():
            for a, b in itertools.combinations(mem, 2):
                assert jac(docs[a], docs[b]) >= 0.5, (trial, a, b)


def test_simhash_randomized_contract_aware(ray_session):
    """SimHash clusters exactly the pairs within hamming_max of each other —
    planted one-token edits are asserted co-clustered ONLY when their true
    fingerprint hamming distance is within the contract (a 60-token doc's
    one-token edit legitimately flips >3 bits ~25% of the time)."""
    from data_quality_framework_ray.functions import hashing as H
    from data_quality_framework_ray.pipelines.dedup import simhash_dup_groups

    rng = random.Random(41)
    vocab = [f"w{i}" for i in range(500)]
    for trial in range(3):
        docs, planted = {}, []
        for i in range(rng.choice([20, 100])):
            docs[f"b{i:04d}"] = " ".join(rng.choice(vocab) for _ in range(40))
        for c in range(6):
            base = " ".join(rng.choice(vocab) for _ in range(60))
            docs[f"p{c:02d}_0"] = base
            docs[f"p{c:02d}_1"] = base + " zz"
            planted.append((f"p{c:02d}_0", f"p{c:02d}_1"))
        ids = sorted(docs)
        t = pa.table({"doc_id": pa.array(ids),
                      "text": pa.array([docs[i] for i in ids])})
        comp = simhash_dup_groups(
            _rd().from_arrow(t).repartition(rng.choice([1, 4])),
            "text", "doc_id", hamming_max=3)
        th, off = H.token_hashes(pa.array([docs[i] for i in ids]))
        s = H.simhash64(th, off)
        fp = dict(zip(ids, s))
        n_checked = 0
        for a, b in planted:
            d = bin(int(fp[a]) ^ int(fp[b])).count("1")
            if d <= 3:
                n_checked += 1
                assert comp.get(a) == comp.get(b) is not None, (trial, a, b, d)
        assert n_checked > 0  # the sweep exercises the contract each trial


def test_embedding_dedup_randomized_planted(ray_session):
    from data_quality_framework_ray.pipelines.dedup import embedding_dup_groups

    rng = random.Random(13)
    for trial in range(3):
        nrng = np.random.default_rng(trial)
        base = nrng.normal(size=(rng.choice([30, 120]), 32))
        ids = [f"v{i:04d}" for i in range(len(base))]
        embs = list(base)
        planted = []
        for c in range(rng.choice([2, 6])):
            i = rng.randrange(len(base))
            ids.append(f"dup{c:02d}")
            embs.append(base[i] * 1.001)  # cosine exactly 1.0
            planted.append((ids[i], f"dup{c:02d}"))
        t = pa.table({"vec_id": pa.array(ids),
                      "emb": pa.array([list(map(float, e)) for e in embs],
                                      type=pa.list_(pa.float32()))})
        comp = embedding_dup_groups(
            _rd().from_arrow(t).repartition(rng.choice([1, 4])),
            "emb", "vec_id", threshold=0.98)
        for a, b in planted:
            assert comp.get(a) == comp.get(b) is not None, (trial, a, b)


def test_empty_input_totality(ray_session):
    """Schema-less EMPTY inputs (e.g. a repartition of zero rows reports
    schema None at this Ray version) must yield empty results, never
    AttributeError/TypeError — the empty-side hazard class found by these
    sweeps (snapshot_diff join path, distinct_set_ops key type,
    Dataset.sum() returning None)."""
    from data_quality_framework_ray.pipelines import stats as ST
    from data_quality_framework_ray.pipelines.dedup import (
        exact_dedup, keyed_dup_groups, minhash_lsh_dup_groups)
    from data_quality_framework_ray.pipelines.expectations import check_nulls
    from data_quality_framework_ray.pipelines.sampling import token_budget_cap

    def empty(schema_cols):
        t = pa.table({c: pa.array([], type=ty) for c, ty in schema_cols})
        return _rd().from_arrow(t).repartition(2)

    assert keyed_dup_groups(
        empty([("k", pa.uint64()), ("id", pa.string())]),
        ["k"], "id").take_all() == []
    assert exact_dedup(
        empty([("text", pa.string()), ("id", pa.string())]),
        ["text"], "id").take_all() == []
    assert minhash_lsh_dup_groups(
        empty([("text", pa.string()), ("id", pa.string())]),
        "text", "id") == {}
    assert token_budget_cap(
        empty([("k", pa.string()), ("id", pa.int64()),
               ("tok", pa.int64())]), "k", "id", "tok",
        budget=10).take_all() == []
    assert ST.exact_quantiles(
        empty([("v", pa.float64())]), "v", [0.5])[0][1] != 0  # nan
    assert ST.grouped_outlier_counts(
        empty([("k", pa.string()), ("v", pa.float64())]),
        "k", "v").num_rows == 0
    assert check_nulls(empty([("a", pa.string())])) == []


def test_ann_randomized_vs_exact(ray_session):
    """Brute-force top-k must match the numpy exact oracle on random shapes
    (k > n, single row, odd dims); IVF probing ALL cells is exact; PQ at
    production settings (nbits=6, refine) reaches recall 1.0. assign_cells /
    pq_encode are idempotent on re-application."""
    from data_quality_framework_ray.pipelines.similarity import (
        assign_cells, brute_force_topk, ivf_topk, pq_topk, train_codebook,
        train_pq)

    rng = random.Random(9)

    def mk(n, d, seed):
        nr = np.random.default_rng(seed)
        emb = nr.normal(size=(n, d))
        t = pa.table({"vec_id": pa.array([f"v{i:05d}" for i in range(n)]),
                      "embedding": pa.array(
                          [list(map(float, e)) for e in emb],
                          type=pa.list_(pa.float32()))})
        return emb, t

    def exact(emb, q, k):
        en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        return [set(np.argsort(-(qn @ en.T)[i])[:min(k, len(emb))])
                for i in range(len(q))]

    for trial in range(4):
        n, d, k = rng.choice([1, 5, 600]), rng.choice([4, 17]), rng.choice(
            [1, 5, 50])
        emb, t = mk(n, d, trial)
        q = np.random.default_rng(trial + 100).normal(size=(2, d))
        got = brute_force_topk(_rd().from_arrow(t).repartition(2), q,
                               "embedding", id_col="vec_id", k=k)
        rows = got.to_pylist() if isinstance(got, pa.Table) else got.take_all()
        by_q: dict = {}
        for r in rows:
            by_q.setdefault(r["query_id"], set()).add(int(r["id"][1:]))
        for qi, w in enumerate(exact(emb, q, k)):
            # float32 storage may flip near-tie ranks at the k boundary
            assert len(by_q.get(qi, set()) ^ w) <= 2, (trial, qi)

    emb, t = mk(800, 16, 7)
    q = np.random.default_rng(11).normal(size=(3, 16))
    ds = _rd().from_arrow(t).repartition(2)
    want = exact(emb, q, 5)
    cb = train_codebook(ds, "embedding", n_cells=8)
    cells2 = assign_cells(assign_cells(ds, cb), cb)  # idempotent
    assert cells2.take(1)[0].keys() >= {"vec_id", "ivf_cell"}
    got = ivf_topk(ds, q, cb, id_col="vec_id", k=5, nprobe=8)
    rows = got.to_pylist() if isinstance(got, pa.Table) else got.take_all()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], set()).add(int(r["id"][1:]))
    rec = np.mean([len(by_q[i] & want[i]) / 5 for i in range(3)])
    assert rec >= 0.99  # all cells probed → exact

    cbs = train_pq(ds, "embedding", m=4, nbits=6)
    got = pq_topk(ds, q, cbs, id_col="vec_id", k=5)
    rows = got.to_pylist() if isinstance(got, pa.Table) else got.take_all()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], set()).add(int(r["id"][1:]))
    rec = np.mean([len(by_q[i] & want[i]) / 5 for i in range(3)])
    assert rec >= 0.9


def test_components_distributed_shuffled_chain(ray_session):
    """A chain whose ids are NOT monotone along the chain is the adversarial
    shape for min-label propagation: without per-round edge contraction a
    200-node shuffled chain exceeded max_iter and returned a SPLIT component
    (round-5 randomized sweep). Contraction converges in O(log n) rounds —
    no RuntimeWarning, exact union-find agreement, single rep."""
    import warnings

    from data_quality_framework_ray.pipelines.dedup import \
        components_distributed

    rng = random.Random(5)
    ids = [f"n{i:05d}" for i in range(400)]
    rng.shuffle(ids)
    edges = list(zip(ids, ids[1:]))
    t = pa.table({"a": pa.array([e[0] for e in edges]),
                  "b": pa.array([e[1] for e in edges])})
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = {r["id"]: r["rep"] for r in components_distributed(
            _rd().from_arrow(t).repartition(4)).take_all()}
    assert not [x for x in w if "components_distributed" in str(x.message)]
    assert len(got) == 400
    assert set(got.values()) == {min(ids)}


def test_profile_null_typed_column_block(ray_session):
    """An all-None column infers a null-typed Arrow array; utf8_length has
    no null kernel — profile must treat it as all-null, not crash."""
    from data_quality_framework_ray.pipelines.profile import profile_columns

    t = pa.table({"x": pa.array([None], pa.float64()),
                  "s": pa.array([None])})  # s infers pa.null()
    out = profile_columns(_rd().from_arrow(t), ["x"], ["s"])
    rows = out.to_pylist() if isinstance(out, pa.Table) else out.take_all()
    prof = {r["column_name"]: r for r in rows}
    assert prof["s"]["n_nulls"] == 1 and prof["s"]["n_values"] == 0
    assert prof["x"]["n_nulls"] == 1


def test_grouped_mode_randomized_vs_duckdb(ray_session):
    from data_quality_framework_ray.pipelines.stats import grouped_mode

    rng = random.Random(21)
    for trial in range(6):
        n = rng.choice([1, 2, 40, 400])
        t = pa.table({
            "g": pa.array([f"g{rng.randrange(3)}" for _ in range(n)]),
            "v": pa.array([rng.randrange(6) for _ in range(n)], pa.int64())})
        ds = _rd().from_arrow(t).repartition(rng.choice([1, 4]))
        got = grouped_mode(ds, "g", "v").to_pylist()
        want = duckdb.sql("""
            WITH c AS (SELECT g, v, count(*) AS n FROM t GROUP BY 1, 2)
            SELECT g, v AS mode_value, n FROM c
            QUALIFY row_number() OVER (PARTITION BY g
              ORDER BY n DESC, v ASC) = 1
            ORDER BY g
        """).fetchall()
        assert [(r["g"], r["mode_value"], r["n"]) for r in got] == want


def test_grouped_moments_randomized_vs_duckdb_hugeint(ray_session):
    """Engine doubles must equal DuckDB's bit-for-bit (no tolerance): both
    sides compute from identical exact integer sums with the same
    expression shape."""
    from data_quality_framework_ray.pipelines.stats import grouped_moments

    rng = random.Random(22)
    for trial in range(5):
        n = rng.choice([2, 3, 50, 500])
        t = pa.table({
            "g": pa.array([f"g{rng.randrange(2)}" for _ in range(n)]),
            "v": pa.array([rng.randrange(1, 51) for _ in range(n)],
                          pa.int64())})
        ds = _rd().from_arrow(t).repartition(rng.choice([1, 4]))
        got = {r["g"]: r for r in grouped_moments(ds, "g", "v").to_pylist()}
        want = duckdb.sql("""
            WITH s AS (SELECT g, count(v) AS n,
              CAST(sum(v) AS DOUBLE) AS s1,
              CAST(sum(v*v) AS DOUBLE) AS s2,
              CAST(sum(v*v*v) AS DOUBLE) AS s3,
              CAST(sum(v*v*v*v) AS DOUBLE) AS s4
              FROM t GROUP BY 1),
            m AS (SELECT g, n, s1/n AS mean, s2/n AS q2, s3/n AS q3,
              s4/n AS q4 FROM s),
            c AS (SELECT g, n, q2 - mean*mean AS m2,
              q3 - 3.0*mean*q2 + 2.0*mean*mean*mean AS m3,
              q4 - 4.0*mean*q3 + 6.0*(mean*mean)*q2
               - 3.0*(mean*mean*mean*mean) AS m4 FROM m)
            SELECT g, n,
              CASE WHEN m2 > 0 THEN m3/(m2*sqrt(m2)) END AS skew,
              CASE WHEN m2 > 0 THEN m4/(m2*m2) - 3.0 END AS kurt
            FROM c ORDER BY g
        """).fetchall()
        for g, wn, wskew, wkurt in want:
            r = got[g]
            assert r["n"] == wn
            if wskew is None:
                assert math.isnan(r["skew"]) and math.isnan(r["kurt"])
            else:
                assert r["skew"] == wskew, (trial, g)  # bit-exact
                assert r["kurt"] == wkurt, (trial, g)


def test_grouped_mad_randomized_vs_duckdb(ray_session):
    from data_quality_framework_ray.pipelines.stats import grouped_mad

    rng = random.Random(23)
    for trial in range(5):
        n = rng.choice([1, 2, 41, 401])
        t = pa.table({
            "g": pa.array([f"g{rng.randrange(3)}" for _ in range(n)]),
            "v": pa.array([round(rng.uniform(0, 100), 2) for _ in range(n)],
                          pa.float64())})
        ds = _rd().from_arrow(t).repartition(rng.choice([1, 4]))
        got = {r["g"]: r["mad"] for r in grouped_mad(ds, "g", "v").to_pylist()}
        want = duckdb.sql("""
            WITH med AS (SELECT g AS k, quantile_disc(v, 0.5) AS m
              FROM t GROUP BY 1)
            SELECT k, quantile_disc(abs(v - m), 0.5) AS mad
            FROM t JOIN med ON g = k GROUP BY k ORDER BY k
        """).fetchall()
        assert got == {k: m for k, m in want}


def test_bigram_counts_randomized_vs_python(ray_session):
    from data_quality_framework_ray.pipelines.text_analysis import \
        bigram_top_counts

    rng = random.Random(24)
    words = ["aa", "bb", "cc", "dd"]
    for trial in range(5):
        docs = []
        for _ in range(rng.choice([1, 10, 80])):
            k = rng.randrange(0, 6)
            docs.append(" ".join(rng.choice(words) for _ in range(k)))
        want = collections.Counter()
        for d in docs:
            toks = d.split()
            want.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
        ds = _rd().from_items([{"text": d} for d in docs]).repartition(
            rng.choice([1, 4]))
        got = bigram_top_counts(ds, "text", top_k=10_000).take_all()
        assert {r["bg"]: r["n"] for r in got} == dict(want)


def test_bm25_topk_randomized_vs_python(ray_session):
    from data_quality_framework_ray.pipelines.text_analysis import bm25_topk

    rng = random.Random(25)
    vocab = ["join", "vector", "window", "filler", "pad"]
    for trial in range(4):
        docs = []
        for _ in range(rng.choice([1, 20, 120])):
            k = rng.randrange(0, 12)
            docs.append(" ".join(rng.choice(vocab) for _ in range(k)))
        terms = ["join", "vector", "window"]
        # independent plain-Python BM25 (k1=1.2, b=0.75, Lucene idf)
        toks = [d.split() for d in docs]
        nd = len(docs)
        sdl = sum(len(t) for t in toks)
        avgdl = sdl / nd if nd else 0.0
        dfs = [sum(1 for t in toks if term in t) for term in terms]
        idfs = [math.log((nd - d + 0.5) / (d + 0.5) + 1.0) if d else 0.0
                for d in dfs]
        want = {}
        for i, t in enumerate(toks):
            s = 0.0
            for term, idf in zip(terms, idfs):
                tf = t.count(term)
                if tf:
                    s += idf * (tf * 2.2) / (
                        tf + 1.2 * (0.25 + 0.75 * (len(t) / avgdl)))
            if s > 0.0:
                want[i] = s
        ds = _rd().from_items(
            [{"doc_id": i, "text": d} for i, d in enumerate(docs)]
        ).repartition(rng.choice([1, 4]))
        got = bm25_topk(ds, "text", "doc_id", terms,
                        top_k=10_000).take_all()
        got_m = {r["doc_id"]: r["score"] for r in got}
        assert set(got_m) == set(want)
        for i, s in want.items():
            assert got_m[i] == pytest.approx(s, rel=1e-12)

    # empty corpus / no matching terms -> typed empty result
    e = bm25_topk(_rd().from_items([{"doc_id": 1, "text": "pad pad"}]),
                  "text", "doc_id", ["join"]).take_all()
    assert e == []


def test_grouped_approx_distinct_paths_and_accuracy(ray_session):
    """Driver fold and distributed map_groups merge must produce IDENTICAL
    estimates (register max is associative/commutative); estimates within
    the HLL error bound of exact."""
    from data_quality_framework_ray import config
    from data_quality_framework_ray.functions.sketches import \
        grouped_approx_distinct

    rng = random.Random(33)
    rows = [{"g": f"g{rng.randrange(3)}", "v": rng.randrange(5000)}
            for _ in range(20_000)]
    ds = _rd().from_items(rows).repartition(4)
    a = grouped_approx_distinct(ds, "g", "v").to_pylist()
    old = config.PARTIAL_FOLD_LIMIT
    config.PARTIAL_FOLD_LIMIT = 0  # force the distributed merge path
    try:
        b = grouped_approx_distinct(
            _rd().from_items(rows).repartition(4), "g", "v").to_pylist()
    finally:
        config.PARTIAL_FOLD_LIMIT = old
    assert a == b  # bit-identical merged registers -> identical estimates
    exact = collections.defaultdict(set)
    for r in rows:
        exact[r["g"]].add(r["v"])
    for r in a:
        ex = len(exact[r["g"]])
        assert abs(r["approx"] - ex) / ex < 0.05

    # empty input -> typed empty
    e = grouped_approx_distinct(
        _rd().from_items([{"g": "x", "v": 1}]).filter(lambda r: False),
        "g", "v")
    assert e.num_rows == 0 and e.column_names == ["g", "approx"]


def test_iqr_outliers_randomized_vs_duckdb(ray_session):
    from data_quality_framework_ray.pipelines.stats import grouped_iqr_outliers

    rng = random.Random(41)
    for trial in range(5):
        n = rng.choice([1, 4, 80, 400])
        t = pa.table({
            "g": pa.array([f"g{rng.randrange(3)}" for _ in range(n)]),
            "v": pa.array([round(rng.uniform(0, 50), 2)
                           if rng.random() > 0.2 else rng.uniform(200, 900)
                           for _ in range(n)], pa.float64())})
        ds = _rd().from_arrow(t).repartition(rng.choice([1, 4]))
        got = grouped_iqr_outliers(ds, "g", "v").to_pylist()
        want = duckdb.sql("""
            WITH q AS (SELECT g AS k, quantile_disc(v, 0.25) AS q1,
                quantile_disc(v, 0.75) AS q3 FROM t GROUP BY 1)
            SELECT k, count(*) FILTER (v < q1 - 1.5*(q3-q1)
                OR v > q3 + 1.5*(q3-q1)) AS n_outliers, count(*) AS n
            FROM t JOIN q ON g = k GROUP BY k ORDER BY k
        """).fetchall()
        assert [(r["g"], r["n_outliers"], r["n"]) for r in got] == want


def test_weighted_avg_randomized_vs_duckdb(ray_session):
    from data_quality_framework_ray.pipelines.stats import grouped_weighted_avg

    rng = random.Random(42)
    for trial in range(5):
        n = rng.choice([1, 3, 70, 350])
        t = pa.table({
            "g": pa.array([f"g{rng.randrange(3)}" for _ in range(n)]),
            "price": pa.array([round(rng.uniform(1, 9000), 2)
                               for _ in range(n)], pa.float64()),
            "w": pa.array([rng.randrange(1, 51) for _ in range(n)],
                          pa.float64())})
        ds = _rd().from_arrow(t).repartition(rng.choice([1, 4]))
        got = {r["g"]: r["wavg"] for r in
               grouped_weighted_avg(ds, "g", "price", "w").to_pylist()}
        want = duckdb.sql("""
            WITH s AS (SELECT g, sum(CAST(round(price*100) AS BIGINT)
                * CAST(w AS BIGINT)) AS cw, sum(CAST(w AS BIGINT)) AS sw
              FROM t GROUP BY 1)
            SELECT g, CAST(cw AS DOUBLE)/100.0/sw FROM s ORDER BY g
        """).fetchall()
        for g, w in want:
            assert got[g] == w  # bit-exact


def test_funnel_stages_randomized_vs_duckdb(ray_session):
    """Funnel over random event sequences (incl. users who click BEFORE
    their first view — must not count) vs the DuckDB correlated oracle."""
    import __ray_entry__ as m

    rng = random.Random(51)
    import datetime as dt
    import os
    import tempfile

    import pyarrow.parquet as pq

    for trial in range(3):
        rows = []
        eid = 0
        for _ in range(rng.choice([1, 30, 120])):
            uid = rng.randrange(25)
            for _ in range(rng.randrange(1, 8)):
                rows.append({
                    "event_id": eid,
                    "ts": dt.datetime(2024, 1, 1) + dt.timedelta(
                        seconds=rng.randrange(100_000)),
                    "user_id": uid,
                    "event_type": rng.choice(
                        ["view", "click", "purchase", "error", "signup"]),
                    "value": 1.0, "props": "{}"})
                eid += 1
        t = pa.Table.from_pylist(rows)
        with tempfile.TemporaryDirectory() as d:
            pq.write_table(t, os.path.join(d, "events.parquet"))
            got = m._q_funnel_stages(d).to_pylist()
        want = duckdb.sql("""
            WITH v AS (SELECT user_id, min(ts) AS t0 FROM t
              WHERE event_type = 'view' GROUP BY 1),
            c AS (SELECT e.user_id, min(e.ts) AS t1 FROM t e
              JOIN v USING (user_id)
              WHERE e.event_type = 'click' AND e.ts > v.t0
              GROUP BY e.user_id),
            p AS (SELECT e.user_id, min(e.ts) AS t2 FROM t e
              JOIN c USING (user_id)
              WHERE e.event_type = 'purchase' AND e.ts > c.t1
              GROUP BY e.user_id)
            SELECT * FROM (
              SELECT '1_view' AS stage, count(*) AS n FROM v
              UNION ALL SELECT '2_click', count(*) FROM c
              UNION ALL SELECT '3_purchase', count(*) FROM p)
            ORDER BY stage
        """).fetchall()
        assert [(r["stage"], r["n_users"]) for r in got] == want


def test_cohort_retention_randomized_vs_duckdb(ray_session):
    import __ray_entry__ as m

    rng = random.Random(52)
    import datetime as dt
    import os
    import tempfile

    import pyarrow.parquet as pq

    for trial in range(3):
        rows = []
        for eid in range(rng.choice([1, 60, 300])):
            rows.append({
                "event_id": eid,
                "ts": dt.datetime(2024, 1, 1) + dt.timedelta(
                    seconds=rng.randrange(20 * 86_400)),
                "user_id": rng.randrange(20),
                "event_type": "view", "value": 1.0, "props": "{}"})
        t = pa.Table.from_pylist(rows)
        with tempfile.TemporaryDirectory() as d:
            pq.write_table(t, os.path.join(d, "events.parquet"))
            got = m._q_cohort_retention(d).to_pylist()
        want = duckdb.sql("""
            WITH f AS (SELECT user_id,
               CAST(date_trunc('day', min(ts)) AS DATE) AS cohort
              FROM t GROUP BY 1),
            a AS (SELECT DISTINCT e.user_id, f.cohort,
               date_diff('day', f.cohort,
                CAST(date_trunc('day', e.ts) AS DATE)) AS off_days
              FROM t e JOIN f USING (user_id))
            SELECT cohort, off_days, count(*) AS n FROM a
            WHERE off_days <= 7 GROUP BY 1, 2 ORDER BY 1, 2
        """).fetchall()
        assert [(r["cohort"], r["off_days"], r["n_users"]) for r in got] \
            == want


def test_kmeans_lloyd_randomized_vs_numpy(ray_session):
    """Distributed Lloyd's vs a whole-table numpy replay: identical
    RNG-free init and tie-break -> exact per-cluster counts; inertia within
    accumulation-order tolerance; repartitioning must not change results
    (the sorted-partial fold pins the accumulation order)."""
    from data_quality_framework_ray.pipelines.similarity import kmeans_lloyd

    rng = np.random.default_rng(61)
    for trial in range(3):
        n, d, k = [(20, 4, 3), (300, 8, 5), (64, 16, 8)][trial]
        x = rng.normal(size=(n, d))
        rows = [{"vec_id": i, "embedding": x[i].astype(np.float32).tolist()}
                for i in range(n)]
        x64 = np.stack([np.asarray(r["embedding"], dtype=np.float64)
                        for r in rows])
        got = kmeans_lloyd(_rd().from_items(rows).repartition(4),
                           "embedding", "vec_id", k=k, iters=4).to_pylist()
        got2 = kmeans_lloyd(_rd().from_items(rows).repartition(2),
                            "embedding", "vec_id", k=k, iters=4).to_pylist()
        assert got == got2  # partition-count invariant
        cent = x64[:k].copy()
        for _ in range(4):
            sc = x64 @ cent.T - 0.5 * np.einsum("ij,ij->i", cent, cent)
            a = np.argmax(sc, axis=1)
            for ci in range(k):
                m = a == ci
                if m.any():
                    cent[ci] = x64[m].mean(axis=0)
        sc = x64 @ cent.T - 0.5 * np.einsum("ij,ij->i", cent, cent)
        a = np.argmax(sc, axis=1)
        diff = x64 - cent[a]
        per = np.einsum("ij,ij->i", diff, diff)
        want = {ci: (int((a == ci).sum()), float(per[a == ci].sum()))
                for ci in range(k) if (a == ci).any()}
        assert {r["cluster"] for r in got} == set(want)
        for r in got:
            wn, wi = want[r["cluster"]]
            assert r["n"] == wn
            assert r["inertia"] == pytest.approx(wi, rel=1e-8)
