"""Unit tests for the round-3 sampling / stats / fuzzy-match operators."""

import numpy as np
import pyarrow as pa
import pytest


def test_resample_weighted_edges_and_determinism(ray_session):
    import ray.data as rd

    from data_quality_framework_ray.pipelines.sampling import resample_weighted

    rows = [{"id": i, "g": g} for i in range(200)
            for g in (["a"] if i % 2 else ["b"])]
    ds = rd.from_items(rows)
    out = resample_weighted(ds, "g", "id", {"a": 1.0, "b": 0.0}).take_all()
    got = sorted(r["id"] for r in out)
    assert got == [i for i in range(200) if i % 2]  # all of a, none of b

    # default rate applies to unseen keys; deterministic across runs
    half = resample_weighted(ds, "g", "id", {}, default=0.5)
    a = sorted(r["id"] for r in half.take_all())
    b = sorted(r["id"] for r in
               resample_weighted(ds, "g", "id", {}, default=0.5).take_all())
    assert a == b
    assert 0 < len(a) < 200


def test_token_budget_cap_boundary(ray_session):
    import ray.data as rd

    from data_quality_framework_ray.pipelines.sampling import token_budget_cap

    rows = [{"id": i, "g": "x", "tok": 10} for i in range(10)]
    rows += [{"id": i, "g": "y", "tok": 7} for i in range(10)]
    ds = rd.from_items(rows)
    out = token_budget_cap(ds, "g", "id", "tok", budget=30, nparts=3).take_all()
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], []).append(r["id"])
    # inclusive running sum ≤ 30: x keeps ids 0,1,2 (sum 30); y keeps
    # 0,1,2,3 (sum 28; the 5th would hit 35)
    assert sorted(by_g["x"]) == [0, 1, 2]
    assert sorted(by_g["y"]) == [0, 1, 2, 3]


def test_grouped_outlier_counts_vs_numpy(ray_session):
    import ray.data as rd

    from data_quality_framework_ray.pipelines.stats import grouped_outlier_counts

    rng = np.random.default_rng(7)
    xs = np.concatenate([rng.normal(0, 1, 500), [25.0, -25.0]])
    rows = ([{"g": "n", "x": float(v)} for v in xs]
            + [{"g": "const", "x": 5.0} for _ in range(10)]
            + [{"g": "single", "x": 1.0}])
    out = grouped_outlier_counts(rd.from_items(rows), "g", "x", z=2.0)
    got = {r["g"]: r["n_outliers"] for r in out.to_pylist()}
    mean, sd = xs.mean(), xs.std(ddof=1)
    want = int(np.sum(np.abs(xs - mean) > 2 * sd))
    assert got["n"] == want and want >= 2
    assert got["const"] == 0  # zero variance → no outliers
    assert got["single"] == 0  # n < 2 → no stddev_samp


def test_histogram_fixed_negative_bins(ray_session):
    import ray.data as rd

    from data_quality_framework_ray.pipelines.stats import histogram_fixed

    vals = [-10.0, -0.1, 0.0, 4.9, 5.0, 14.9, float("nan")]
    out = histogram_fixed(rd.from_items([{"x": v} for v in vals]), "x",
                          width=5.0)
    got = {r["bin"]: r["n"] for r in out.to_pylist()}
    assert got == {-2: 1, -1: 1, 0: 2, 1: 1, 2: 1}  # NaN dropped


def test_fuzzy_value_pairs_planted(ray_session):
    import ray.data as rd

    from data_quality_framework_ray.pipelines.dedup import fuzzy_value_pairs

    vocab = ["cat", "cart", "bat", "dog", "dig", "elephant", "cat"]
    ds = rd.from_items([{"v": v} for v in vocab])
    out = fuzzy_value_pairs(ds, "v", max_dist=1)
    pairs = set(zip(out["a"].to_pylist(), out["b"].to_pylist()))
    # insert (cat/cart), substitute (cat/bat, dog/dig); no transposition-only
    # or distance-2 pairs; duplicates in the input collapse to one vocab entry
    assert pairs == {("cart", "cat"), ("bat", "cat"), ("dig", "dog")}

    with pytest.raises(AssertionError):
        fuzzy_value_pairs(ds, "v", max_dist=2)


def test_normalize_text_unicode(ray_session):
    import ray.data as rd

    from data_quality_framework_ray.pipelines.text_analysis import normalize_text

    # input "Cafe" + combining acute (NFD): NFC must fold it to the
    # precomposed U+00E9 before lowering
    rows = [{"t": "Cafe\u0301  \t Bar "}, {"t": "A\nB"}]
    out = normalize_text(rd.from_items(rows), "t", out_col="n").take_all()
    assert sorted(r["n"] for r in out) == ["a b", "caf\u00e9 bar"]


def test_heavy_hitters_exact_topk_and_capacity_pressure(ray_session):
    import ray.data as rd

    from data_quality_framework_ray.functions.sketches import heavy_hitters

    # Zipf-ish planted counts + uniform noise; tiny capacity forces real
    # MG decrements inside every batch
    rows = []
    for i, cnt in enumerate([400, 300, 200, 100, 50]):
        rows += [{"v": f"hot{i}"}] * cnt
    rows += [{"v": f"noise{i}"} for i in range(500)]
    rng = np.random.default_rng(3)
    rng.shuffle(rows)
    out = heavy_hitters(rd.from_items(rows).repartition(8), "v",
                        k=5, capacity=32)
    got = list(zip(out["value"].to_pylist(), out["n"].to_pylist()))
    assert got == [("hot0", 400), ("hot1", 300), ("hot2", 200),
                   ("hot3", 100), ("hot4", 50)]


def test_psi_binned_vs_numpy(ray_session):
    import ray.data as rd

    from data_quality_framework_ray.pipelines.stats import psi_binned

    rng = np.random.default_rng(11)
    base = rng.normal(50, 10, 400)
    cur = rng.normal(60, 15, 300)
    rows = ([{"g": "b", "x": float(v)} for v in base]
            + [{"g": "c", "x": float(v)} for v in cur]
            + [{"g": "other", "x": 0.0}] * 5)  # ignored cohort
    out = psi_binned(rd.from_items(rows), "x", "g", "b", "c", width=10.0)
    got_bins = out["bin"].to_pylist()
    allb = np.floor(base / 10).astype(int)
    allc = np.floor(cur / 10).astype(int)
    want_bins = sorted(set(allb) | set(allc))
    assert got_bins == want_bins
    eps = 1e-6
    total = 0.0
    for b, p, q, c in zip(got_bins, out["p_base"].to_pylist(),
                          out["p_cur"].to_pylist(),
                          out["contrib"].to_pylist()):
        pw = max((allb == b).sum() / len(allb), eps)
        qw = max((allc == b).sum() / len(allc), eps)
        assert abs(p - pw) < 1e-12 and abs(q - qw) < 1e-12
        assert abs(c - (pw - qw) * np.log(pw / qw)) < 1e-12
        total += c
    assert total > 0.1  # the planted shift is a real drift


def test_review_fix_regressions(ray_session, tmp_path):
    """Round-3 self-review fixes: pruned read with a full-table schema,
    NULLs in outlier stats, literal NaNs in the quantile sketch, int keys
    through distinct_set_ops, NULL text through decontamination."""
    import pyarrow as pa
    import ray.data as rd

    # read_table: columns= subset of expected_schema must not KeyError
    from pyarrow import csv as pacsv

    from data_quality_framework_ray.sources.tabular import read_table

    t = pa.table({"a": [1, 2], "b": ["x", "y"]})
    p = str(tmp_path / "t.csv")
    pacsv.write_csv(t, p)
    schema = pa.schema([("a", pa.int64()), ("b", pa.string())])
    got = read_table(p, fmt="csv", columns=["a"], expected_schema=schema)
    assert got.to_pandas()["a"].tolist() == [1, 2]

    # grouped_outlier_counts: NULL values excluded from n (stddev_samp parity)
    from data_quality_framework_ray.pipelines.stats import grouped_outlier_counts

    rows = ([{"g": "k", "x": float(v)} for v in
             [0.0, 0.0, 0.0, 0.0, 10.0]] + [{"g": "k", "x": None}] * 20)
    out = grouped_outlier_counts(rd.from_items(rows), "g", "x", z=1.5)
    xs = np.array([0.0, 0.0, 0.0, 0.0, 10.0])
    want = int((np.abs(xs - xs.mean()) > 1.5 * xs.std(ddof=1)).sum())
    assert out.to_pylist() == [{"g": "k", "n_outliers": want}]

    # approx_quantiles: literal float NaNs (no Arrow nulls) must be dropped
    from data_quality_framework_ray.functions.sketches import approx_quantiles

    vals = [float(i) for i in range(50)] + [float("nan")] * 10
    ds = rd.from_items([{"id": i, "x": v} for i, v in enumerate(vals)])
    res = dict(approx_quantiles(ds, "x", ["id"], [0.99], k=64))
    assert not np.isnan(res[0.99]) and res[0.99] <= 49.0

    # distinct_set_ops over int64 keys (typed empty blocks, no mixed schemas)
    from data_quality_framework_ray.pipelines.joins import distinct_set_ops

    l = rd.from_items([{"k": v} for v in [1, 1, 2, 3]])
    r = rd.from_items([{"k": v} for v in [3, 4]])
    flags = sorted((row["value"], bool(row["in_left"]), bool(row["in_right"]))
                   for row in distinct_set_ops(l, "k", r, "k").take_all())
    assert flags == [(1, True, False), (2, True, False),
                     (3, True, True), (4, False, True)]

    # flag_contaminated: NULL text → False, not null
    from data_quality_framework_ray.pipelines.decontam import flag_contaminated

    docs = rd.from_items([{"text": "has needle inside"}, {"text": None}])
    got = flag_contaminated(docs, ["needle"]).take_all()
    assert sorted((r["contaminated"] is not None, bool(r["contaminated"]))
                  for r in got) == [(True, False), (True, True)]


def test_q3_fallback_path_matches_driver_combine(ray_session, monkeypatch):
    """Force the q3 hash-join fallback (TOPK_MERGE_LIMIT=0 and broadcast
    limit 0) and assert it returns exactly the driver-combine result —
    including the l_orderkey tie-break on equal revenues."""
    import __ray_entry__ as entrymod
    from data_quality_framework_ray import config

    sf = "/root/testdata/sf0.001"
    want = entrymod.queries()["q3_shipping"](sf)
    monkeypatch.setattr(config, "TOPK_MERGE_LIMIT", 0)
    monkeypatch.setattr(config, "BROADCAST_DUP_LIMIT", 0)
    got = entrymod.queries()["q3_shipping"](sf)
    assert got.equals(want)


def test_repeated_passages_planted(ray_session, monkeypatch):
    import ray.data as rd

    from data_quality_framework_ray.pipelines.dedup import repeated_passages

    shared = "A" * 40                      # window-aligned cross-doc repeat
    inner = "b" * 40
    rows = [
        {"doc_id": 1, "text": shared + "x" * 30},        # window @1 repeats
        {"doc_id": 2, "text": shared + "y" * 45},        # window @1 repeats
        {"doc_id": 3, "text": inner + inner},            # @1 and @41 repeat
        {"doc_id": 4, "text": "unique " * 20},           # no repeats
        {"doc_id": 5, "text": "short"},                  # < win chars
        {"doc_id": 6, "text": None},                     # null text
        {"doc_id": 7, "text": "é" * 40 + "z" * 40},      # unicode chars
        {"doc_id": 8, "text": "q" * 39 + "é" * 41},      # é-window @41
    ]
    got = sorted((r["id"], r["pos"]) for r in
                 repeated_passages(rd.from_items(rows), "doc_id", "text",
                                   win=40, stride=40).take_all())
    # doc7 window @41 is "z"*40 (unique); doc7 @1 = é*40; doc8 @41 = é*40 →
    # the two é windows repeat ACROSS docs at different positions
    want = [(1, 1), (2, 1), (3, 1), (3, 41), (7, 1), (8, 41)]
    assert got == want

    # distributed fallback (groupby + semi_join) must select the same
    # rows; broadcast_limit=0 forces only the outer branch — semi_join keeps
    # its own cardinality choice (its join path on a 3-key set would hit the
    # documented Ray 2.49 empty-hash-partition ArrowInvalid)
    got2 = sorted((r["id"], r["pos"]) for r in
                  repeated_passages(rd.from_items(rows), "doc_id", "text",
                                    win=40, stride=40,
                                    broadcast_limit=0).take_all())
    assert got2 == want


def test_repeated_passages_empty_corpus(ray_session):
    import ray.data as rd

    from data_quality_framework_ray.pipelines.dedup import repeated_passages

    rows = [{"doc_id": 1, "text": "tiny"}, {"doc_id": 2, "text": None}]
    out = repeated_passages(rd.from_items(rows), "doc_id", "text",
                            win=40, stride=40)
    assert out.count() == 0


def test_heavy_hitters_distributed_fallback(ray_session, monkeypatch):
    import ray.data as rd

    from data_quality_framework_ray import config
    from data_quality_framework_ray.functions.sketches import heavy_hitters

    rows = [{"v": f"hot{i}"} for i in range(3) for _ in range(100 - 10 * i)]
    rows += [{"v": f"n{i}"} for i in range(50)]
    want = heavy_hitters(rd.from_items(rows).repartition(6), "v", k=3)
    monkeypatch.setattr(config, "BROADCAST_DUP_LIMIT", 0)
    got = heavy_hitters(rd.from_items(rows).repartition(6), "v", k=3)
    assert got.to_pylist() == want.to_pylist() == [
        {"value": "hot0", "n": 100}, {"value": "hot1", "n": 90},
        {"value": "hot2", "n": 80}]


def test_fuzzy_distributed_fallback_matches_broadcast(ray_session, monkeypatch):
    import ray.data as rd

    from data_quality_framework_ray import config
    from data_quality_framework_ray.pipelines.dedup import fuzzy_value_pairs

    vocab = ["cat", "cart", "bat", "dog", "dig", "elephant"] * 3
    ds = rd.from_items([{"v": v} for v in vocab]).repartition(4)
    want = fuzzy_value_pairs(ds, "v").to_pylist()
    monkeypatch.setattr(config, "BROADCAST_DUP_LIMIT", 0)
    got = fuzzy_value_pairs(ds, "v").to_pylist()
    assert got == want and len(want) == 3


def test_fuzzy_distributed_hot_bucket_bounded(ray_session, monkeypatch):
    """A skewed variant key — 5k distinct 2-char strings 'aX' all sharing
    deletion variant 'a' — must complete within BOUNDED pairs (round-3
    verdict #3: the old uncapped per-bucket O(k^2) loop enumerated all
    12.5M candidate pairs in one task). Above MAX_PAIRS_PER_BUCKET the
    bucket degrades to star+chain (2k-3 candidates); every emitted pair
    must still be a genuine edit-distance-1 match."""
    import ray.data as rd

    from data_quality_framework_ray import config
    from data_quality_framework_ray.pipelines.dedup import _lev1, fuzzy_value_pairs

    n = 5000
    vocab = ["a" + chr(0x4E00 + i) for i in range(n)]
    ds = rd.from_items([{"v": v} for v in vocab]).repartition(8)
    monkeypatch.setattr(config, "BROADCAST_DUP_LIMIT", 0)  # force distributed
    monkeypatch.setattr(config, "MAX_PAIRS_PER_BUCKET", 1000)
    out = fuzzy_value_pairs(ds, "v")
    # star+chain caps the candidate set at 2k-3 per bucket; three buckets
    # can go hot here ('a' via 2nd-char deletion, plus nothing else shared),
    # so the verified output must be ~O(k), nowhere near C(5000,2)
    assert 0 < out.num_rows <= 2 * n
    for a, b in zip(out["a"].to_pylist(), out["b"].to_pylist()):
        assert a < b and _lev1(a, b)


def test_stats_folds_distributed_path_same_results(ray_session, monkeypatch):
    """Forcing PARTIAL_FOLD_LIMIT to 0 must route the stats driver folds
    through the distributed groupby Sum path with identical results
    (round-4 verdict #6; mirrors test_phase_b_join's forced-limit pattern)."""
    import numpy as np
    import ray.data as rd

    from data_quality_framework_ray import config
    from data_quality_framework_ray.pipelines.stats import (
        grouped_outlier_counts, histogram_fixed, psi_binned)

    rng = np.random.default_rng(7)
    rows = [{"g": ["a", "b", "c"][i % 3], "x": float(v), "coh": "F" if i % 2 else "O"}
            for i, v in enumerate(rng.normal(50, 10, 900))]
    rows[5]["x"] = 500.0  # planted outlier in group 'c'
    ds = rd.from_items(rows).repartition(4).materialize()

    want_o = grouped_outlier_counts(ds, "g", "x", z=2.0).to_pylist()
    want_h = histogram_fixed(ds, "x", width=10.0).to_pylist()
    want_p = psi_binned(ds, "x", "coh", "F", "O", width=10.0).to_pylist()
    assert sum(r["n_outliers"] for r in want_o) >= 1
    assert sum(r["n"] for r in want_h) == 900

    from data_quality_framework_ray.pipelines.stats import grouped_quantiles

    def _gq():
        out = grouped_quantiles(ds, "g", "x", [0.5, 0.9], method="counts")
        return sorted(((r["g"], r["p"], r["value"])
                       for r in out.take_all()))

    want_q = _gq()
    assert len(want_q) == 6  # 3 groups × 2 quantiles

    monkeypatch.setattr(config, "PARTIAL_FOLD_LIMIT", 0)
    assert grouped_outlier_counts(ds, "g", "x", z=2.0).to_pylist() == want_o
    assert histogram_fixed(ds, "x", width=10.0).to_pylist() == want_h
    got_p = psi_binned(ds, "x", "coh", "F", "O", width=10.0).to_pylist()
    assert [r["bin"] for r in got_p] == [r["bin"] for r in want_p]
    for a, b in zip(got_p, want_p):
        assert abs(a["contrib"] - b["contrib"]) < 1e-12
    # counts-method quantiles: forced limit routes through part_shuffle
    assert _gq() == want_q


def test_stats_folds_distributed_empty_input(ray_session, monkeypatch):
    import ray.data as rd

    from data_quality_framework_ray import config
    from data_quality_framework_ray.pipelines.stats import (
        grouped_outlier_counts, histogram_fixed)

    monkeypatch.setattr(config, "PARTIAL_FOLD_LIMIT", 0)
    t = pa.table({"g": pa.array([], type=pa.string()),
                  "x": pa.array([], type=pa.float64())})
    ds = rd.from_arrow(t).materialize()
    assert grouped_outlier_counts(ds, "g", "x").to_pylist() == []
    assert histogram_fixed(ds, "x", width=1.0).to_pylist() == []


def test_grouped_mode_tie_break_and_distributed_fold(ray_session):
    import ray.data as rd

    from data_quality_framework_ray.pipelines.stats import grouped_mode

    # group "a": 5 appears 3x, 9 appears 3x -> tie, smallest value wins
    rows = ([{"g": "a", "v": 5}] * 3 + [{"g": "a", "v": 9}] * 3
            + [{"g": "a", "v": 1}]
            + [{"g": "b", "v": 2}] * 2 + [{"g": "b", "v": 7}])
    ds = rd.from_items(rows)
    t = grouped_mode(ds, "g", "v")
    got = {r["g"]: (r["mode_value"], r["n"]) for r in t.to_pylist()}
    assert got == {"a": (5, 3), "b": (2, 2)}

    # forced distributed fold (limit 0 -> groupby path) must agree
    from data_quality_framework_ray import config
    old = config.PARTIAL_FOLD_LIMIT
    config.PARTIAL_FOLD_LIMIT = 0
    try:
        t2 = grouped_mode(rd.from_items(rows), "g", "v")
    finally:
        config.PARTIAL_FOLD_LIMIT = old
    assert t2.to_pylist() == t.to_pylist()


def test_grouped_moments_vs_numpy_and_empty(ray_session):
    import ray.data as rd

    from data_quality_framework_ray.pipelines.stats import grouped_moments

    rng = np.random.default_rng(7)
    xs = rng.integers(1, 51, size=500)
    gs = rng.choice(["p", "q"], size=500)
    rows = [{"g": str(g), "v": int(x)} for g, x in zip(gs, xs)]
    t = grouped_moments(rd.from_items(rows), "g", "v")
    got = {r["g"]: r for r in t.to_pylist()}
    for g in ("p", "q"):
        x = xs[gs == g].astype(np.float64)
        m = x.mean()
        m2 = ((x - m) ** 2).mean()
        m3 = ((x - m) ** 3).mean()
        m4 = ((x - m) ** 4).mean()
        assert got[g]["n"] == len(x)
        assert got[g]["skew"] == pytest.approx(m3 / m2 ** 1.5, rel=1e-9)
        assert got[g]["kurt"] == pytest.approx(m4 / m2 ** 2 - 3.0, rel=1e-9)

    # constant column -> zero variance -> NaN; empty -> typed empty table
    c = grouped_moments(rd.from_items([{"g": "z", "v": 4}] * 5), "g", "v")
    assert np.isnan(c.to_pylist()[0]["skew"])
    e = grouped_moments(
        rd.from_items([{"g": "z", "v": 4}]).filter(lambda r: False), "g", "v")
    assert e.num_rows == 0 and e.column_names == ["g", "n", "skew", "kurt"]


def test_grouped_mad_vs_numpy(ray_session):
    import ray.data as rd

    from data_quality_framework_ray.pipelines.stats import grouped_mad

    rng = np.random.default_rng(11)
    rows = [{"g": ["u", "w"][i % 2], "v": float(rng.normal(100, 25))}
            for i in range(401)]
    t = grouped_mad(rd.from_items(rows), "g", "v")
    got = {r["g"]: r["mad"] for r in t.to_pylist()}

    def disc_median(a):
        a = np.sort(a)
        return a[max(1, int(np.ceil(0.5 * len(a)))) - 1]

    for g in ("u", "w"):
        x = np.asarray([r["v"] for r in rows if r["g"] == g])
        assert got[g] == disc_median(np.abs(x - disc_median(x)))


def test_mad_iqr_distributed_fold_path(ray_session):
    """PARTIAL_FOLD_LIMIT=0 forces the distributed combine under
    _grouped_value_counts; results must equal the driver-fold path."""
    import ray.data as rd

    from data_quality_framework_ray import config
    from data_quality_framework_ray.pipelines.stats import (
        grouped_iqr_outliers, grouped_mad)

    rng = np.random.default_rng(71)
    rows = [{"g": ["a", "b"][i % 2], "v": float(rng.normal(50, 9))}
            for i in range(500)]
    ds = rd.from_items(rows).repartition(4)
    want_mad = grouped_mad(ds, "g", "v").to_pylist()
    want_iqr = grouped_iqr_outliers(rd.from_items(rows), "g", "v").to_pylist()
    old = config.PARTIAL_FOLD_LIMIT
    config.PARTIAL_FOLD_LIMIT = 0
    try:
        got_mad = grouped_mad(rd.from_items(rows).repartition(4),
                              "g", "v").to_pylist()
        got_iqr = grouped_iqr_outliers(rd.from_items(rows).repartition(4),
                                       "g", "v").to_pylist()
    finally:
        config.PARTIAL_FOLD_LIMIT = old
    assert got_mad == want_mad
    assert got_iqr == want_iqr
