"""Vectorized kernels vs plain-Python re/split references on adversarial
strings (engine polars/numpy vs stdlib semantics)."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from data_quality_framework_ray.functions import hashing as H
from data_quality_framework_ray.functions import scrub as S
from data_quality_framework_ray.functions import textstats as T

TRICKY = [
    "hello world hello world hello",
    None,
    "",
    "   ",
    "a",
    "la la la la la la la",
    "über die brücke, naïve café — ¡hola!",
    "x " * 100,
    "mail a@b.co or c.d+e@f-g.org now",
    "!!!###$$$",
    "word",
    "tabs\tand\nnewlines  double  spaces",
]


def test_text_stats_match_python():
    from tests.oracle import n_symbols

    st = T.text_stats(pa.array(TRICKY, type=pa.string()))
    for i, t in enumerate(TRICKY):
        blank = t is None or t.strip() == ""
        assert bool(st["is_null_or_blank"][i]) == blank
        if t is None:
            continue
        toks = t.split()
        assert st["nchars"][i] == len(t)
        assert st["ntok"][i] == len(toks)
        assert st["ndistinct"][i] == len(set(toks))
        assert st["nsym"][i] == n_symbols(t), t


def test_scrub_matches_re_sub():
    from tests.oracle import scrub_one

    cases = [
        "email a@b.com and phone +33 612 345 678 end",
        "card 4111 1111 1111 1111 ssn 123-45-6789",
        "+1 23 45 67 89 mixed 4111-1111-1111-1111",
        "no pii at all",
        "edge a@b.c a@b.co +1 2 3",
    ]
    out = S.scrub(pa.array(cases, type=pa.string()))
    got = out["scrubbed"].to_pylist() if hasattr(out["scrubbed"], "to_pylist") else list(out["scrubbed"])
    for i, c in enumerate(cases):
        want, n = scrub_one(c)
        assert got[i] == want, (c, got[i], want)
        assert out["n_pii"][i] == n


def test_char_ngram_hash_formula():
    """Engine hashing == SPEC polynomial formula computed naively."""
    texts = ["abc", "héllo", ""]
    h, off = H.char_ngram_hashes(pa.array(texts, type=pa.string()), 2)
    M = (1 << 61) - 1
    for i, t in enumerate(texts):
        grams = [t[j:j + 2] for j in range(len(t) - 1)]
        want = [(ord(g[0]) * 31 + ord(g[1])) % M for g in grams]
        assert list(h[off[i]:off[i + 1]]) == want


def test_minhash_jaccard_estimate():
    rng = np.random.default_rng(5)
    base = [f"tok{i}" for i in range(200)]
    a = " ".join(base)
    b = " ".join(base[:100] + [f"other{i}" for i in range(100)])  # J ≈ 1/3 on 3-shingles
    sh, off = H.shingle_hashes(pa.array([a, b], type=pa.string()), 3)
    sig = H.minhash_signatures(sh, off, num_perm=256)
    est = float(np.mean(sig[0] == sig[1]))
    # true shingle jaccard
    s1 = set(zip(base, base[1:], base[2:]))
    toks_b = b.split()
    s2 = set(zip(toks_b, toks_b[1:], toks_b[2:]))
    true_j = len(s1 & s2) / len(s1 | s2)
    assert abs(est - true_j) < 0.12


def test_simhash_similarity():
    a = "the quick brown fox jumps over the lazy dog " * 5
    b = a.replace("lazy", "sleepy")
    c = "completely different text about data pipelines and shuffles " * 5
    th, off = H.token_hashes(pa.array([a, b, c], type=pa.string()))
    s = H.simhash64(th, off)
    d_ab = H.hamming64(s[0:1], s[1:2])[0]
    d_ac = H.hamming64(s[0:1], s[2:3])[0]
    assert d_ab < d_ac
    assert d_ab <= 16


def test_content_hash_null_handling():
    h1a, _ = H.content_hash_128(pa.array([None], type=pa.string()),
                                pa.array([None], type=pa.binary()))
    h1b, _ = H.content_hash_128(pa.array([""], type=pa.string()),
                                pa.array([b""], type=pa.binary()))
    assert h1a[0] == h1b[0]  # SPEC: NULLs key as empty


def test_exact_quantiles_matches_numpy(ray_session):
    """exact_quantiles == value at 1-based position ceil(p*n) of the sorted
    column (DuckDB quantile_disc convention), including ties and nulls."""
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from data_quality_framework_ray.pipelines.stats import exact_quantiles

    rng = np.random.default_rng(8)
    vals = np.round(rng.uniform(0, 1000, size=5000), 2)
    vals[:100] = 42.0  # ties
    rows = [{"x": float(v)} for v in vals] + [{"x": None}] * 25
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    ps = [0.01, 0.25, 0.5, 0.9, 0.99, 1.0]
    got = dict(exact_quantiles(ds, "x", ps))
    s = np.sort(vals)
    for p in ps:
        want = float(s[max(1, math.ceil(p * len(s))) - 1])
        assert got[p] == want, (p, got[p], want)


def test_hll_approx_distinct(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from data_quality_framework_ray.functions.sketches import (approx_distinct,
                                                               hll_estimate,
                                                               hll_merge,
                                                               hll_partial)

    # merge property: partials over splits == single-pass registers
    vals = pa.array([f"k{i % 3000}" for i in range(10000)], type=pa.string())
    whole = hll_partial(vals)
    parts = [hll_partial(vals.slice(i * 2500, 2500)) for i in range(4)]
    np.testing.assert_array_equal(hll_merge(parts), whole)
    assert abs(hll_estimate(whole) - 3000) / 3000 < 0.05

    rows = [{"k": f"key_{i % 1200}"} for i in range(6000)] + [{"k": None}] * 10
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    est = approx_distinct(ds, "k")
    assert abs(est - 1200) / 1200 < 0.05


def test_grouped_correlation_matches_numpy(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from data_quality_framework_ray.pipelines.stats import grouped_correlation

    rng = np.random.default_rng(9)
    rows = []
    for g, slope in (("a", 2.0), ("b", -0.5)):
        x = rng.uniform(0, 100, size=400)
        y = slope * x + rng.normal(0, 5, size=400)
        rows += [{"g": g, "x": float(a), "y": float(b)} for a, b in zip(x, y)]
    rows += [{"g": "const", "x": 1.0, "y": float(v)} for v in rng.uniform(0, 1, 50)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    got = {r["g"]: r["corr"] for r in grouped_correlation(ds, "g", "x", "y")}
    import pandas as pd

    df = pd.DataFrame(rows)
    for g in ("a", "b"):
        want = df[df.g == g][["x", "y"]].corr().iloc[0, 1]
        assert abs(got[g] - want) < 1e-9, g
    assert got["const"] != got["const"]  # zero x-variance -> NaN


def test_grouped_quantiles_counts_10k_keys(ray_session):
    """Round-2 verdict #6: the counts method must handle 10^4 tiny groups
    with values matching a per-key numpy reference exactly (ceil(p*n)
    convention) — and it never sorts raw rows per group by construction
    (one partition-wide sort over distinct (key, value) counts)."""
    import math

    import ray.data as rd

    from data_quality_framework_ray.pipelines.stats import grouped_quantiles

    rng = np.random.default_rng(33)
    n_keys = 10_000
    keys = rng.integers(0, n_keys, size=60_000)
    # small discrete value domain → real duplicate counts per (key, value)
    vals = rng.integers(0, 50, size=60_000).astype(np.float64)
    ds = rd.from_arrow(pa.table({"k": keys, "v": vals})).repartition(8)
    got = grouped_quantiles(ds, "k", "v", [0.5, 0.9], method="counts").take_all()
    got_map = {(r["k"], r["p"]): r["value"] for r in got}

    order = np.lexsort((vals, keys))
    ks, vs = keys[order], vals[order]
    starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
    bounds = np.r_[starts, len(ks)]
    miss = 0
    for i, s in enumerate(starts):
        e = bounds[i + 1]
        grp = vs[s:e]
        for p in (0.5, 0.9):
            want = grp[max(1, math.ceil(p * len(grp))) - 1]
            if got_map[(ks[s], p)] != want:
                miss += 1
    assert miss == 0
    assert len(got) == len(starts) * 2


def test_approx_quantiles_sketch(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from data_quality_framework_ray.functions.sketches import approx_quantiles

    rng = np.random.default_rng(3)
    n = 50_000
    df = pd.DataFrame({"k": np.arange(n), "v": rng.lognormal(3.0, 1.0, n)})
    res = approx_quantiles(rd.from_pandas(df).repartition(9), "v", ["k"],
                           [0.1, 0.5, 0.9], k=4096)
    vs = np.sort(df["v"].to_numpy())
    for p, est in res:
        rank = np.searchsorted(vs, est, side="right") / n
        assert abs(rank - p) < 0.03, (p, est, rank)
    # deterministic
    assert res == approx_quantiles(rd.from_pandas(df).repartition(4), "v",
                                   ["k"], [0.1, 0.5, 0.9], k=4096)


def test_approx_quantiles_empty(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from data_quality_framework_ray.functions.sketches import approx_quantiles

    df = pd.DataFrame({"k": [1, 2], "v": [np.nan, np.nan]})
    res = approx_quantiles(rd.from_pandas(df), "v", ["k"], [0.5])
    assert len(res) == 1 and res[0][1] != res[0][1]  # NaN


def _shingle_hashes_rowloop(text, k=3):
    """Pre-round-4 per-row-loop implementation, kept as the reference the
    vectorized shingle_hashes must reproduce bit-for-bit."""
    th, off = H.token_hashes(text)
    lens = np.diff(off)
    out_lens = np.maximum(lens - k + 1, 0)
    short = (lens > 0) & (lens < k)
    row_offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(out_lens + short, out=row_offsets[1:])
    out = np.zeros(int(row_offsets[-1]), dtype=np.uint64)
    P = np.uint64(0x9E3779B97F4A7C15)
    np_err = np.seterr(over="ignore")
    for i in range(len(lens)):
        a, b = off[i], off[i + 1]
        if lens[i] == 0:
            continue
        toks = th[a:b]
        o = row_offsets[i]
        if lens[i] < k:
            acc = np.uint64(0)
            for t in toks:
                acc = acc * P + t
            out[o] = acc
        else:
            w = np.lib.stride_tricks.sliding_window_view(toks, k)
            acc = np.zeros(len(w), dtype=np.uint64)
            for j in range(k):
                acc = acc * P + w[:, j]
            out[o:o + len(w)] = acc
    np.seterr(**np_err)
    return out, row_offsets


def test_shingle_hashes_vectorized_equals_rowloop():
    rng = np.random.default_rng(42)
    words = [f"w{i}" for i in range(50)]
    rows = list(TRICKY)
    for n_tok in [0, 1, 2, 3, 4, 5, 7, 50, 200]:
        for _ in range(3):
            rows.append(" ".join(rng.choice(words, size=n_tok)))
    arr = pa.array(rows, type=pa.string())
    for k in (2, 3, 5):
        got_h, got_off = H.shingle_hashes(arr, k)
        want_h, want_off = _shingle_hashes_rowloop(arr, k)
        np.testing.assert_array_equal(got_off, want_off)
        np.testing.assert_array_equal(got_h, want_h)
    # all-empty batch
    got_h, got_off = H.shingle_hashes(pa.array([None, "", "  "], type=pa.string()), 3)
    assert len(got_h) == 0 and got_off[-1] == 0


def test_deletion_variant_hashes_equal_string_reference():
    """The prefix-sum deletion-variant hashes must equal direct polynomial
    hashes of the MATERIALIZED variant strings (identity first, then
    deletions row by row), including empty/null/unicode rows."""
    P = 0x9E3779B97F4A7C15

    def direct(s: str) -> int:
        h = 0
        for t, ch in enumerate(s):
            h = (h + ord(ch) * pow(P, t, 1 << 64)) % (1 << 64)
        return h

    vals = ["abc", "", "a", "hello", "héllo", None, "ab", "aa", "ünïcødé"]
    hs, vi = H.deletion_variant_hashes(pa.array(vals, type=pa.string()))
    want = [(direct(v or ""), i) for i, v in enumerate(vals)]
    for i, v in enumerate(vals):
        v = v or ""
        for j in range(len(v)):
            want.append((direct(v[:j] + v[j + 1:]), i))
    assert list(zip(hs.tolist(), vi.tolist())) == want
    # equal variant strings => equal hashes (the exact-recall property)
    hs2, vi2 = H.deletion_variant_hashes(
        pa.array(["cat", "cart"], type=pa.string()))
    by_val = {}
    srcs = ["cat", "cart"]
    pos = 0
    variants = [s for s in srcs] + [
        s[:j] + s[j + 1:] for s in srcs for j in range(len(s))]
    for h, s in zip(hs2.tolist(), variants):
        by_val.setdefault(s, set()).add(h)
    assert all(len(v) == 1 for v in by_val.values())
    assert "cat" in by_val and by_val["cat"] == {hs2[0]}


def test_token_hashes_md5_matches_duckdb():
    """Engine md5 token hashes must be bit-identical to DuckDB's
    md5_number_lower over the same explicit-ASCII-class tokenization — the
    property the dedup_simhash SQL oracle rests on."""
    import duckdb

    texts = ["hello world", "a  b\tc", "", None, "héllo wörld", "x"]
    th, off = H.token_hashes_md5(pa.array(texts, type=pa.string()))
    con = duckdb.connect()
    want = []
    for t in texts:
        toks = con.execute(
            "SELECT regexp_extract_all(coalesce(?, ''),"
            " '[^\\t\\n\\f\\r \\x1c-\\x1f]+')", [t]).fetchone()[0]
        want.extend(int(con.execute(
            "SELECT md5_number_lower(?)", [tok]).fetchone()[0])
            for tok in toks)
    assert th.tolist() == want
    assert off[-1] == len(want)


def test_running_total_randomized_vs_cumsum(ray_session):
    """Distributed prefix sum vs a plain sorted cumsum: random id gaps,
    negative values, partition counts, and tiny bucket sizes (many bucket
    boundaries)."""
    import random

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from data_quality_framework_ray.pipelines.packing import running_total

    rng = random.Random(101)
    for trial in range(4):
        n = rng.choice([1, 7, 200])
        ids = rng.sample(range(10_000), n)
        vals = [rng.randrange(-50, 200) for _ in range(n)]
        rows = [{"i": i, "v": v} for i, v in zip(ids, vals)]
        out = running_total(
            rd.from_items(rows).repartition(rng.choice([1, 4])),
            id_col="i", value_col="v",
            bucket_size=rng.choice([3, 100, 100_000])).take_all()
        got = {r["i"]: r["running"] for r in out}
        order = np.argsort(ids)
        cs = np.cumsum(np.asarray(vals)[order])
        want = dict(zip(np.asarray(ids)[order].tolist(), cs.tolist()))
        assert got == want


def test_running_max_exclusive_randomized_vs_numpy(ray_session):
    """Distributed exclusive prefix max (watermark primitive) vs a plain
    sorted shifted cummax: random id gaps, duplicate values, partition
    counts, tiny bucket sizes, NULL for the global first row."""
    import random

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from data_quality_framework_ray.pipelines.packing import \
        running_max_exclusive

    rng = random.Random(202)
    for trial in range(4):
        n = rng.choice([1, 7, 200])
        ids = rng.sample(range(10_000), n)
        vals = [rng.randrange(-50, 200) for _ in range(n)]
        rows = [{"i": i, "v": v} for i, v in zip(ids, vals)]
        out = running_max_exclusive(
            rd.from_items(rows).repartition(rng.choice([1, 4])),
            id_col="i", value_col="v",
            bucket_size=rng.choice([3, 100, 100_000])).take_all()
        got = {r["i"]: (r["v"], r["prev_max"]) for r in out}
        order = np.argsort(ids)
        sv = np.asarray(vals)[order]
        prev = np.empty(len(sv), dtype=object)
        prev[0] = None
        if len(sv) > 1:
            prev[1:] = np.maximum.accumulate(sv)[:-1].tolist()
        want = {int(i): (int(v), p) for i, v, p in
                zip(np.asarray(ids)[order], sv, prev)}
        assert got == want
