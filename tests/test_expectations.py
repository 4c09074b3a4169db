"""Expectation suite vs DuckDB oracle on the personnes fixture + testdata
tables (the reference's six checks, SURVEY.md §2 / FIXTURES.md §4)."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from data_quality_framework_ray.datagen import fixtures
from data_quality_framework_ray.pipelines import expectations as E
from data_quality_framework_ray.state.history import dynamic_row_count_threshold

AS_OF = dt.date(2026, 1, 15)


@pytest.fixture(scope="module")
def personnes_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(fixtures.personnes_table())


def test_schema_check_pass_and_fail():
    t = fixtures.personnes_table()
    r = E.check_schema(t.schema, fixtures.PERSONNES_EXPECTED_SCHEMA, "personnes")
    assert r["passed"]

    t2 = fixtures.personnes_table(drop_column="profession", extra_column=True)
    r2 = E.check_schema(t2.schema, fixtures.PERSONNES_EXPECTED_SCHEMA, "personnes")
    assert not r2["passed"]
    assert r2["details"]["missing"] == ["profession"]
    assert r2["details"]["extra"] == ["unexpected"]

    t3 = fixtures.personnes_table(age_as_float_with_fraction=True)
    r3 = E.check_schema(t3.schema, fixtures.PERSONNES_EXPECTED_SCHEMA, "personnes")
    assert not r3["passed"]
    assert "age" in r3["details"]["mismatched"]


def test_null_check_vs_duckdb(personnes_ds):
    t = fixtures.personnes_table()
    con = duckdb.connect()
    con.register("p", t)
    results = {r["column"]: r for r in E.check_nulls(personnes_ds, table="personnes")}
    for col in t.column_names:
        want_nulls = con.execute(f'select count(*) - count("{col}") from p').fetchone()[0]
        assert results[col]["details"]["nulls"] == want_nulls, col
    assert not results["prenom"]["passed"]          # all-NULL planted column
    assert results["nom"]["passed"]
    # empty-string detector (reference :465-467): planted on profession
    want_empty = con.execute(
        "select count(*) from p where profession is not null and trim(profession) = ''"
    ).fetchone()[0]
    assert results["profession"]["details"]["empty_strings"] == want_empty


def test_duplicates_vs_duckdb(personnes_ds, ray_session):
    import ray.data as rd

    t = fixtures.personnes_table()
    con = duckdb.connect()
    con.register("p", t)
    want = con.execute("select count(*) - count(distinct columns(*)::varchar) from p").fetchone()[0]
    # duckdb distinct over all cols:
    want = con.execute("select count(*) - (select count(*) from (select distinct * from p)) from p").fetchone()[0]
    r = E.check_duplicates(personnes_ds, "personnes")
    assert r["details"]["duplicate_rows"] == want
    assert not r["passed"]
    clean = rd.from_arrow(fixtures.personnes_table(dup_rows=0))
    assert E.check_duplicates(clean, "personnes")["passed"]


def test_freshness(personnes_ds, ray_session):
    import ray.data as rd

    assert E.check_freshness(personnes_ds, "date_insertion", as_of=AS_OF)["passed"]
    stale = rd.from_arrow(fixtures.personnes_table(fresh=False))
    assert not E.check_freshness(stale, "date_insertion", as_of=AS_OF)["passed"]


def test_integer_valued(personnes_ds, ray_session):
    import ray.data as rd

    assert E.check_integer_valued(personnes_ds, "age")["passed"]
    floaty = rd.from_arrow(fixtures.personnes_table(age_as_float_with_fraction=True))
    assert not E.check_integer_valued(floaty, "age")["passed"]


def test_row_count_dynamic_threshold():
    # reference semantics: <2 history → static fallback of 2
    # (/root/reference/core/quality_checks.py:565-572)
    r = E.check_row_count(5, history_desc=[])
    assert r["passed"] and r["details"]["method"] == "static_fallback"
    assert not E.check_row_count(1, history_desc=[100])["passed"]

    # increment trend: history 1000,1100,1200,1300 (asc) → avg inc 100,
    # range = 1300 + [80, 120]
    hist = fixtures.seeded_history(1000, 100, 4)
    thr = dynamic_row_count_threshold(hist)
    assert thr["lo"] == 1380 and thr["hi"] == 1420
    assert E.check_row_count(1400, history_desc=hist)["passed"]
    assert not E.check_row_count(1350, history_desc=hist)["passed"]
    assert not E.check_row_count(1450, history_desc=hist)["passed"]

    # negative trend swaps the bounds
    thr2 = dynamic_row_count_threshold([800, 900, 1000])
    assert thr2["lo"] < thr2["hi"]


def test_env_comparison():
    assert E.check_env_comparison(90, 100)["passed"]
    assert E.check_env_comparison(100, 100)["passed"]
    assert not E.check_env_comparison(110, 100)["passed"]


def test_scoring_and_urgency():
    results = [
        {"passed": True, "dimension": "validity"},
        {"passed": False, "dimension": "validity"},
        {"passed": True, "dimension": "completeness"},
        {"passed": True, "dimension": "uniqueness"},
    ]
    s = E.score_results(results)
    assert s["overall_score"] == 75.0
    assert s["dimension_scores"]["validity"] == 50.0
    assert s["urgency"] == "LOW"  # 75 → LOW bucket [75, 100)
    assert E.score_results([{"passed": True, "dimension": "x"}])["urgency"] == "PASS"
    assert E.score_results([{"passed": False, "dimension": "x"}])["urgency"] == "CRITICAL"


def test_hashable_column_list_injective(ray_session):
    """Regression (round-2 review): the list<string> dup-hash encoding must
    keep distinct values distinct — [] vs [""], ["a\\x1fb"] vs ["a","b"],
    and null-bearing lists all collided under a plain binary_join."""
    import pyarrow as pa

    from data_quality_framework_ray.pipelines.expectations import _hashable_column

    col = pa.array([[], [""], ["a\x1fb"], ["a", "b"], ["a"], ["b"]],
                   type=pa.list_(pa.string()))
    enc = _hashable_column(col).to_pylist()
    assert len(set(enc)) == len(enc), enc

    with_nulls = pa.array([["x", None], ["y", None], None, ["x"]],
                          type=pa.list_(pa.string()))
    enc2 = _hashable_column(with_nulls).to_pylist()
    assert len(set(map(str, enc2))) == len(enc2), enc2


def test_fingerprint_uint64_roundtrip(ray_session):
    """Regression (latent for ngram/base overrides): list<uint64> columns
    with values >= 2^63 must survive Dataset collection via Arrow blocks —
    take_all + from_pylist re-infers list<int64> and raises OverflowError
    (the conversion _q_fingerprints previously used)."""
    import pyarrow as pa
    import pytest as _pytest
    import ray
    import ray.data as rd

    big = 2**63 + 5
    t_in = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                     "fingerprint": pa.array([[big, 7], [11]],
                                             type=pa.list_(pa.uint64()))})
    ds = rd.from_arrow(t_in)
    # the safe path: keep Arrow blocks
    t = pa.concat_tables(ray.get(ds.to_arrow_refs()))
    assert t["fingerprint"].type == pa.list_(pa.uint64())
    assert max(max(fp) for fp in t["fingerprint"].to_pylist()) == big
    # the hazardous path this guards against
    with _pytest.raises((OverflowError, pa.lib.ArrowInvalid)):
        pa.Table.from_pylist(ds.take_all())


def test_hashable_column_fuzz_injective(ray_session):
    """Property fuzz: distinct list<string> column values must encode to
    distinct strings (fast and JSON paths both)."""
    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from data_quality_framework_ray.pipelines.expectations import _hashable_column

    elem = st.one_of(st.none(), st.text(alphabet="ab\x1f:", max_size=3))
    val = st.one_of(st.none(), st.lists(elem, max_size=3))

    @settings(max_examples=80, deadline=None)
    @given(st.lists(val, min_size=2, max_size=12))
    def run(vals):
        col = pa.array(vals, type=pa.list_(pa.string()))
        enc = [str(x) for x in _hashable_column(col).to_pylist()]
        canon = [None if v is None else tuple(v) for v in vals]
        for i in range(len(vals)):
            for j in range(i + 1, len(vals)):
                if canon[i] != canon[j]:
                    assert enc[i] != enc[j], (vals[i], vals[j], enc[i])
                else:
                    assert enc[i] == enc[j]

    run()
