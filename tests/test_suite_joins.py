"""Quality-suite lifecycle + join operators vs DuckDB."""

from __future__ import annotations

import datetime as dt
import glob
import json
import os

import duckdb
import pandas as pd
import pyarrow as pa

from data_quality_framework_ray.datagen import fixtures

SF = "/root/testdata/sf0.001"


def test_run_quality_suite_and_report(ray_session, tmp_path):
    import ray.data as rd

    from data_quality_framework_ray.pipelines.suite import (
        compare_environments, run_quality_suite, write_run_report)

    ds = rd.from_arrow(fixtures.personnes_table())
    out = run_quality_suite(
        ds, table="personnes",
        expected_schema=fixtures.PERSONNES_EXPECTED_SCHEMA,
        freshness_column="date_insertion", as_of=dt.date(2026, 1, 15),
        integer_columns=["age"])
    assert out["score"]["n_checks"] == len(out["results"])
    by = {(r["check"], r["column"]): r for r in out["results"]}
    assert by[("schema", None)]["passed"]
    assert not by[("nulls", "prenom")]["passed"]     # planted all-NULL col
    assert not by[("duplicates", None)]["passed"]    # planted dup rows
    assert by[("freshness", None)]["passed"]
    assert by[("integer_valued", "age")]["passed"]
    assert out["score"]["urgency"] in ("CRITICAL", "HIGH", "MEDIUM", "LOW")

    # disabled checks don't run (reference settings flags)
    out2 = run_quality_suite(ds, table="personnes", enabled=("duplicates",))
    assert {r["check"] for r in out2["results"]} == {"duplicates"}

    comp = compare_environments({"t1": 5, "t2": 10}, {"t1": 5, "t2": 9})
    assert comp[0]["passed"] and not comp[1]["passed"]

    path = write_run_report(str(tmp_path), {"personnes": out})
    doc = json.load(open(path))
    assert doc["tables"]["personnes"]["score"]["n_checks"] == out["score"]["n_checks"]


def _con():
    con = duckdb.connect()
    for t in ("orders", "customer", "events"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con


def test_broadcast_join_vs_duckdb(ray_session):
    import ray.data as rd

    from data_quality_framework_ray.pipelines.joins import broadcast_hash_join

    cust = pd.read_parquet(f"{SF}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    orders = rd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    joined = broadcast_hash_join(orders, cust, "o_custkey", "c_custkey")
    got = joined.to_pandas().sort_values("o_orderkey").reset_index(drop=True)
    want = _con().execute(
        "SELECT o_orderkey, o_custkey, c_mktsegment FROM orders "
        "JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey").fetchdf()
    assert len(got) == len(want)
    assert (got["c_mktsegment"].values == want["c_mktsegment"].values).all()


def test_asof_join_vs_duckdb(ray_session):
    import ray.data as rd

    from data_quality_framework_ray.pipelines.joins import asof_join_prev

    orders = rd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_custkey", "o_orderdate", "o_orderkey"])
    got = asof_join_prev(orders, "o_custkey", "o_orderdate",
                         value_cols=["o_orderkey"]).to_pandas()
    want = _con().execute(
        "SELECT o1.o_orderkey, o2.o_orderdate AS prev_o_orderdate "
        "FROM orders o1 ASOF JOIN orders o2 ON o1.o_custkey = o2.o_custkey "
        "AND o2.o_orderdate < o1.o_orderdate").fetchdf()
    g = got[["o_orderkey", "prev_o_orderdate"]].sort_values("o_orderkey").reset_index(drop=True)
    w = want.sort_values("o_orderkey").reset_index(drop=True)
    assert len(g) == len(w)
    assert (g["o_orderkey"].values == w["o_orderkey"].values).all()
    assert (pd.to_datetime(g["prev_o_orderdate"]).values
            == pd.to_datetime(w["prev_o_orderdate"]).values).all()


def test_hash_join_vs_duckdb(ray_session):
    import ray.data as rd

    from data_quality_framework_ray.pipelines.joins import hash_join

    j = hash_join(rd.read_parquet(f"{SF}/orders.parquet",
                                  columns=["o_orderkey", "o_custkey"]),
                  rd.read_parquet(f"{SF}/customer.parquet",
                                  columns=["c_custkey", "c_mktsegment"]),
                  on="o_custkey", right_on="c_custkey", num_partitions=4)
    got = j.to_pandas().sort_values("o_orderkey").reset_index(drop=True)
    want = _con().execute(
        "SELECT o_orderkey, c_mktsegment FROM orders JOIN customer "
        "ON o_custkey = c_custkey ORDER BY o_orderkey").fetchdf()
    assert len(got) == len(want)
    assert (got["c_mktsegment"].values == want["c_mktsegment"].values).all()


def test_schema_registry_and_urgency_overrides(ray_session):
    import ray.data as rd

    from data_quality_framework_ray.pipelines import expectations as E
    from data_quality_framework_ray.pipelines.suite import run_quality_suite

    E.register_schema("personnes", fixtures.PERSONNES_EXPECTED_SCHEMA)
    assert E.get_schema("PERSONNES") == fixtures.PERSONNES_EXPECTED_SCHEMA

    ds = rd.from_arrow(fixtures.personnes_table())
    # expected_schema omitted → pulled from the registry; strict per-table
    # urgency (anything below 95 is CRITICAL)
    out = run_quality_suite(ds, table="personnes",
                            enabled=("schema", "duplicates"),
                            urgency_buckets=((95.0, "CRITICAL"), (100.0, "LOW")))
    assert any(r["check"] == "schema" for r in out["results"])
    assert out["score"]["urgency"] == "CRITICAL"  # dup check fails → 50.0


def test_distinct_set_ops_both_combines(ray_session):
    import ray.data as rd

    from data_quality_framework_ray.pipelines.joins import distinct_set_ops

    left = rd.from_items([{"s": v} for v in ["a", "a", "b", "c", "c", "c"]])
    right = rd.from_items([{"s": v} for v in ["b", "c", "d", "d"]])

    def norm(rows):
        return sorted((r["value"], bool(r["in_left"]), bool(r["in_right"]))
                      for r in rows)

    want = [("a", True, False), ("b", True, True),
            ("c", True, True), ("d", False, True)]
    shuffled = distinct_set_ops(left, "s", right, "s")
    assert norm(shuffled.take_all()) == want
    driver = distinct_set_ops(left, "s", right, "s", combine="driver")
    assert norm(driver.to_pylist()) == want


def test_snapshot_diff_null_semantics(ray_session):
    """IS DISTINCT FROM value compare: NULL↔NULL unchanged, NULL↔value
    changed; added/removed classified by presence markers, unchanged rows
    dropped."""
    import ray.data as rd

    from data_quality_framework_ray.pipelines.joins import snapshot_diff

    old = rd.from_items([
        {"k": 1, "v": 1.0}, {"k": 2, "v": None}, {"k": 3, "v": 3.0},
        {"k": 4, "v": None}, {"k": 5, "v": 5.0}])
    new = rd.from_items([
        {"k": 1, "v": 1.0},          # unchanged → dropped
        {"k": 2, "v": None},         # NULL == NULL → unchanged → dropped
        {"k": 3, "v": None},         # value → NULL → changed
        {"k": 4, "v": 4.0},          # NULL → value → changed
        {"k": 6, "v": 6.0}])         # added; k=5 removed
    got = sorted((r["k"], r["change"]) for r in
                 snapshot_diff(old, new, "k", ["v"],
                               num_partitions=2).take_all())
    assert got == [(3, "changed"), (4, "changed"), (5, "removed"),
                   (6, "added")]


def test_bloom_filter_properties_and_semi_join_path(ray_session, monkeypatch):
    """Bloom: zero false negatives (hard guarantee), fpp within ~3x target;
    semi_join's join path (forced via BROADCAST_DUP_LIMIT=0, which now runs
    the bloom pre-filter) returns exactly the broadcast-path rows."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from data_quality_framework_ray import config
    from data_quality_framework_ray.functions.sketches import (bloom_contains,
                                                               bloom_params,
                                                               bloom_partial)
    from data_quality_framework_ray.pipelines.joins import semi_join

    keys = pa.array([f"k{i}" for i in range(2000)])
    m, k = bloom_params(2000, fpp=0.01)
    bits = bloom_partial(keys, m, k)
    assert bloom_contains(keys, bits, k).all()  # no false negatives
    absent = pa.array([f"x{i}" for i in range(5000)])
    fpp = bloom_contains(absent, bits, k).mean()
    assert fpp < 0.03

    left = rd.from_items([{"k": f"k{i}", "v": i} for i in range(0, 3000, 3)])
    right = rd.from_items([{"k": f"k{i}"} for i in range(2000)])
    want = sorted(r["v"] for r in semi_join(left, right, "k").take_all())
    monkeypatch.setattr(config, "BROADCAST_DUP_LIMIT", 0)
    got = sorted(r["v"] for r in semi_join(left, right, "k").take_all())
    assert got == want and len(want) == 667


def test_snapshot_diff_join_path_matches_broadcast(ray_session, monkeypatch):
    """The large-large full-outer join path (forced via BROADCAST_DUP_LIMIT=0)
    must classify identically to the broadcast probe path."""
    import ray.data as rd

    from data_quality_framework_ray import config
    from data_quality_framework_ray.pipelines.joins import snapshot_diff

    old = rd.from_items([{"k": i, "v": float(i % 7)} for i in range(200)])
    new = rd.from_items([{"k": i, "v": float(i % 5)} for i in range(50, 250)])
    want = sorted((r["k"], r["change"]) for r in
                  snapshot_diff(old, new, "k", ["v"]).take_all())
    monkeypatch.setattr(config, "BROADCAST_DUP_LIMIT", 0)
    got = sorted((r["k"], r["change"]) for r in
                 snapshot_diff(old, new, "k", ["v"],
                               num_partitions=4).take_all())
    assert got == want
    assert ("added", ) != ()  # sanity: classes present
    labels = {c for _, c in got}
    assert labels == {"added", "removed", "changed"}


def test_snapshot_diff_join_path_empty_sides(ray_session, monkeypatch):
    """Initial-CDC-run shapes on the JOIN path (forced via
    BROADCAST_DUP_LIMIT=0): an empty old side must classify every new row
    'added' instead of crashing Ray's hash join on key-field resolution
    (no typed left blocks); empty new and both-empty stay total."""
    import pyarrow as pa
    import ray.data as rd

    from data_quality_framework_ray import config
    from data_quality_framework_ray.pipelines.joins import snapshot_diff

    monkeypatch.setattr(config, "BROADCAST_DUP_LIMIT", 0)

    def tbl(n, v):
        return rd.from_arrow(pa.table(
            {"k": pa.array(list(range(n)), pa.int64()),
             "v": pa.array([v] * n, pa.string())}))

    got = sorted((r["k"], r["change"]) for r in
                 snapshot_diff(tbl(0, "a"), tbl(3, "b"), "k", ["v"])
                 .take_all())
    assert got == [(0, "added"), (1, "added"), (2, "added")]

    got = sorted((r["k"], r["change"]) for r in
                 snapshot_diff(tbl(3, "a"), tbl(0, "b"), "k", ["v"])
                 .take_all())
    assert got == [(0, "removed"), (1, "removed"), (2, "removed")]

    assert snapshot_diff(tbl(0, "a"), tbl(0, "b"), "k", ["v"]).take_all() == []


def test_set_ops_empty_sides(ray_session):
    """An empty side (schema None after repartition) must not crash the
    key-type derivation; results fall back to the other side's schema."""
    import pyarrow as pa
    import ray.data as rd

    from data_quality_framework_ray.pipelines.joins import (
        distinct_intersect, distinct_set_ops)

    empty = rd.from_arrow(pa.table({"s": pa.array([], pa.string())})) \
        .repartition(2)
    full = rd.from_arrow(pa.table({"s": pa.array(["a", "b", "a"])})) \
        .repartition(2)

    rows = distinct_set_ops(empty, "s", full, "s").take_all()
    got = sorted((r["value"], r["in_left"], r["in_right"]) for r in rows)
    assert got == [("a", False, True), ("b", False, True)]

    t = distinct_set_ops(empty, "s", full, "s", combine="driver")
    assert sorted(zip(t["value"].to_pylist(), t["in_left"].to_pylist(),
                      t["in_right"].to_pylist())) == got

    assert distinct_intersect(empty, "s", full, "s").take_all() == []
    assert distinct_set_ops(empty, "s", empty, "s").take_all() == []


def test_skew_join_matches_plain_hash_join(ray_session):
    """skew_join's hot/cold split must be invisible: row multiset equals a
    plain hash join across threshold settings (all-hot, mixed, all-cold),
    including keys present on only one side."""
    import random

    import pandas as pd
    import pyarrow as pa

    from data_quality_framework_ray.pipelines.joins import (hash_join,
                                                            skew_join)
    import ray.data as rd

    rng = random.Random(31)
    # key 7 is the heavy hitter (60%); keys 100+ exist only on the left,
    # key 999 only on the right
    lk = [7 if rng.random() < 0.6 else rng.randrange(0, 20) for _ in range(400)]
    lk += [100 + i for i in range(5)]
    left = rd.from_arrow(pa.table({
        "k": pa.array(lk, pa.int64()),
        "v": pa.array(range(len(lk)), pa.int64())})).repartition(4)
    rk = list(range(0, 20)) + [999]
    right = rd.from_arrow(pa.table({
        "rk": pa.array(rk, pa.int64()),
        "w": pa.array([k * 10 for k in rk], pa.int64())})).repartition(3)

    def key_of(rows):
        return sorted((r["k"], r["v"], r["w"]) for r in rows)

    want = key_of(hash_join(left, right, "k", "rk").take_all())
    for thr in (1, 50, 10_000):  # all keys hot / only key 7 hot / none hot
        got = key_of(skew_join(left, right, "k", right_on="rk",
                               hot_count_threshold=thr).take_all())
        assert got == want, thr
