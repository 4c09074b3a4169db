"""One-pass per-column table profiling.

The reference computes its column statistics one full-table query per metric
(/root/reference/core/quality_checks.py null/distinct/min-max helpers each
re-scan the table through pandas). Here the whole profile is ONE streaming
pass: a `map_batches` stage emits long-format partials — one tiny row per
(column, batch) with count / null / min / max / sum — and a small
`groupby("column_name")` combine merges them. The shuffle moves
O(#batches × #columns) rows regardless of data size, so the operator is
100 TB-safe by construction.

String columns are profiled over `utf8_length` (min/max/mean length) —
length stats are what a quality pipeline gates on, and they keep the output
schema uniformly numeric (no cross-type min/max).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _round_half_away(x: float, decimals: int) -> float:
    """Round like DuckDB's ROUND(DOUBLE, n): half-away-from-zero on the
    scaled value (floor(|x|*10^n + 0.5)). Python's round() is decimal-correct
    half-even, which disagrees on exact ties (e.g. avg of integer quantities
    landing on .xxxx5), so the oracle compare needs this variant."""
    s = 10.0 ** decimals
    return math.copysign(math.floor(abs(x) * s + 0.5) / s, x)

_OUT_SCHEMA = pa.schema([
    ("column_name", pa.string()),
    ("n_values", pa.int64()),
    ("n_nulls", pa.int64()),
    ("min_value", pa.float64()),
    ("max_value", pa.float64()),
    ("sum_value", pa.float64()),
])


def _partials(batch: pa.Table, numeric_cols: list[str],
              string_cols: list[str]) -> pa.Table:
    names, ns, nulls, mins, maxs, sums = [], [], [], [], [], []
    for c in numeric_cols + string_cols:
        arr = batch[c]
        if c in string_cols:
            # an all-null block can carry a null-typed column (e.g. inferred
            # from all-None values); utf8_length has no null kernel
            arr = (pa.nulls(len(arr), pa.int32())
                   if pa.types.is_null(arr.type) else pc.utf8_length(arr))
        elif pa.types.is_null(arr.type):
            arr = pa.nulls(len(arr), pa.float64())
        n_null = arr.null_count
        n = len(arr) - n_null
        if n:
            mm = pc.min_max(arr)
            mn = float(mm["min"].as_py())
            mx = float(mm["max"].as_py())
            sm = float(pc.sum(arr).as_py())
        else:
            mn, mx, sm = np.inf, -np.inf, 0.0
        names.append(c)
        ns.append(n)
        nulls.append(n_null)
        mins.append(mn)
        maxs.append(mx)
        sums.append(sm)
    return pa.table({"column_name": pa.array(names, type=pa.string()),
                     "n_values": pa.array(ns, type=pa.int64()),
                     "n_nulls": pa.array(nulls, type=pa.int64()),
                     "min_value": pa.array(mins, type=pa.float64()),
                     "max_value": pa.array(maxs, type=pa.float64()),
                     "sum_value": pa.array(sums, type=pa.float64())},
                    schema=_OUT_SCHEMA)


def profile_columns(ds, numeric_cols: list[str],
                    string_cols: list[str] | None = None,
                    mean_decimals: int = 4) -> pa.Table:
    """Profile ``numeric_cols`` (value stats) and ``string_cols`` (length
    stats) in one pass. Returns one row per column:
    ``column_name, n_values, n_nulls, min_value, max_value, mean_value``.

    ``mean_value`` is rounded to ``mean_decimals`` so the result is robust to
    float summation order (the partial sums combine in shuffle-arrival
    order, which is non-deterministic).
    """
    from ray.data.aggregate import Max, Min, Sum

    string_cols = string_cols or []
    cols = numeric_cols + string_cols
    g = (ds.map_batches(lambda b: _partials(b, numeric_cols, string_cols),
                        batch_format="pyarrow")
         .groupby("column_name")
         .aggregate(Sum("n_values", alias_name="n_values"),
                    Sum("n_nulls", alias_name="n_nulls"),
                    Min("min_value", alias_name="min_value"),
                    Max("max_value", alias_name="max_value"),
                    Sum("sum_value", alias_name="sum_value")))
    rows = {r["column_name"]: r for r in g.take_all()}
    out = []
    for c in sorted(cols):
        r = rows[c]
        n = int(r["n_values"])
        out.append({
            "column_name": c,
            "n_values": n,
            "n_nulls": int(r["n_nulls"]),
            "min_value": float(r["min_value"]) if n else None,
            "max_value": float(r["max_value"]) if n else None,
            "mean_value": _round_half_away(float(r["sum_value"]) / n,
                                           mean_decimals) if n else None,
        })
    return pa.Table.from_pylist(out, schema=pa.schema([
        ("column_name", pa.string()),
        ("n_values", pa.int64()),
        ("n_nulls", pa.int64()),
        ("min_value", pa.float64()),
        ("max_value", pa.float64()),
        ("mean_value", pa.float64()),
    ]))
