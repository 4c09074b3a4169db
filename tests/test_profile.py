"""One-pass column profiler: stats vs straightforward pandas recomputation.

Reference parity: /root/reference/core/quality_checks.py computes null /
min-max / mean metrics one full-table scan per metric; `profile_columns`
fuses them into a single map_batches pass + tiny groupby combine.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from data_quality_framework_ray.pipelines.profile import (
    _round_half_away,
    profile_columns,
)


def _make_ds():
    rng = np.random.default_rng(7)
    n = 5_000
    vals = rng.normal(100.0, 15.0, n)
    vals[rng.random(n) < 0.1] = np.nan
    ints = rng.integers(-50, 50, n).astype(np.float64)
    words = np.array(["a", "bb", "ccc", "dddd", None], dtype=object)[
        rng.integers(0, 5, n)]
    df = pd.DataFrame({"v": vals, "i": ints, "s": words})
    return rd.from_pandas(df).repartition(8), df


def test_profile_matches_pandas():
    ds, df = _make_ds()
    out = profile_columns(ds, ["v", "i"], ["s"]).to_pandas().set_index(
        "column_name")
    assert list(out.index) == ["i", "s", "v"]  # sorted

    v = df["v"].dropna()
    assert out.loc["v", "n_values"] == len(v)
    assert out.loc["v", "n_nulls"] == df["v"].isna().sum()
    assert out.loc["v", "min_value"] == v.min()
    assert out.loc["v", "max_value"] == v.max()
    assert abs(out.loc["v", "mean_value"] - v.mean()) < 1e-3

    assert out.loc["i", "n_nulls"] == 0
    assert out.loc["i", "min_value"] == df["i"].min()

    ln = df["s"].dropna().str.len()
    assert out.loc["s", "n_values"] == len(ln)
    assert out.loc["s", "n_nulls"] == df["s"].isna().sum()
    assert out.loc["s", "min_value"] == 1.0
    assert out.loc["s", "max_value"] == 4.0
    assert abs(out.loc["s", "mean_value"] - ln.mean()) < 1e-3


def test_profile_all_null_column():
    df = pd.DataFrame({"x": [np.nan, np.nan, np.nan],
                       "y": [1.0, 2.0, 3.0]})
    out = profile_columns(rd.from_pandas(df), ["x", "y"]).to_pandas()
    row = out.set_index("column_name").loc["x"]
    assert row["n_values"] == 0 and row["n_nulls"] == 3
    assert row[["min_value", "max_value", "mean_value"]].isna().all()


def test_round_half_away_matches_duckdb():
    import duckdb

    con = duckdb.connect()
    for x in (25.40225, -25.40225, 0.12345, 1.0 / 3, 38273.129749999,
              -0.00005, 123456.78915):
        want = con.execute(
            "SELECT ROUND(CAST(? AS DOUBLE), 4)", [x]).fetchone()[0]
        assert _round_half_away(x, 4) == want, x


def test_profile_output_is_arrow():
    ds, _ = _make_ds()
    out = profile_columns(ds, ["v"])
    assert isinstance(out, pa.Table)
    assert out.num_rows == 1
