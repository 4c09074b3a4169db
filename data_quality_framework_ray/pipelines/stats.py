"""Distributed statistics operators beyond plain aggregates.

Not in the reference (its only aggregates are count/max/null-count,
/root/reference/core/quality_checks.py); exact quantiles are a standard
data-pipeline need (thresholding, outlier gates).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from data_quality_framework_ray import config


def exact_quantiles(ds, col: str, ps: list[float]) -> list[tuple[float, float]]:
    """EXACT discrete quantiles of a numeric column: the value at 1-based
    position ceil(p·n) of the sorted column (DuckDB ``quantile_disc``
    convention).

    Execution: per-batch value-count partials (map-side combine) → ONE
    distributed sort by value → streaming cumulative scan on the driver
    that early-exits once the largest requested position is passed. No
    groupby is needed: duplicate (value, count) rows from different batches
    sort adjacent and the cumulative scan sums them naturally. The shuffle
    carries one row per distinct value per batch — for fixed-precision
    business values the distinct count is bounded regardless of row count.
    The sorted count table is materialized (it is small) so the total-count
    pass and the scan don't re-execute the pipeline."""
    import polars as pl

    def partial(batch: pa.Table) -> pa.Table:
        return (pl.from_arrow(batch.select([col]))
                .group_by(col).agg(pl.len().alias("c"))
                .drop_nulls(col).to_arrow())

    counts = (ds.map_batches(partial, batch_format="pyarrow",
                             batch_size=config.TEXT_BATCH_SIZE)
              .sort(col).materialize())
    n = int(counts.sum("c"))
    if n == 0:
        return [(p, float("nan")) for p in ps]
    targets = sorted((max(1, math.ceil(p * n)), p) for p in ps)
    out: dict[float, float] = {}
    cum = 0
    it = counts.iter_batches(batch_size=4096, batch_format="pyarrow")
    ti = 0
    for b in it:
        vals = np.asarray(b[col])
        cs = np.cumsum(np.asarray(b["c"])) + cum
        while ti < len(targets) and targets[ti][0] <= cs[-1]:
            pos, p = targets[ti]
            out[p] = float(vals[np.searchsorted(cs, pos, side="left")])
            ti += 1
        cum = int(cs[-1])
        if ti >= len(targets):
            break  # early exit: rest of the sorted stream never consumed
    return [(p, out[p]) for p in ps]


def grouped_correlation(ds, key: str, x: str, y: str):
    """Pearson correlation of (x, y) per group via ALGEBRAIC partials:
    each batch contributes (n, Σx, Σy, Σxy, Σx², Σy²) per key — six numbers,
    exactly combinable — then one tiny groupby-sum and a closed-form driver
    finish. The shuffle never carries data rows (the textbook distributed
    second-moment pattern).

    Numerics: the naive ΣxΣy/Σx² form loses precision when |mean| ≫ stddev;
    for such columns pre-center per batch (subtract a first-pass approximate
    mean) or switch to combinable Welford moments."""
    import polars as pl
    from ray.data.aggregate import Sum

    def partials(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([key, x, y])).drop_nulls()
        return (df.group_by(key)
                .agg(n=pl.len().cast(pl.Int64),
                     sx=pl.col(x).sum(), sy=pl.col(y).sum(),
                     sxy=(pl.col(x) * pl.col(y)).sum(),
                     sxx=(pl.col(x) ** 2).sum(),
                     syy=(pl.col(y) ** 2).sum())
                .to_arrow())

    g = (ds.map_batches(partials, batch_format="pyarrow",
                        batch_size=config.TEXT_BATCH_SIZE)
         .groupby(key).aggregate(*[Sum(c, alias_name=c)
                                   for c in ("n", "sx", "sy", "sxy", "sxx", "syy")]))
    rows = []
    for r in g.take_all():
        n = r["n"]
        cov = r["sxy"] - r["sx"] * r["sy"] / n
        vx = r["sxx"] - r["sx"] ** 2 / n
        vy = r["syy"] - r["sy"] ** 2 / n
        denom = math.sqrt(vx * vy)
        rows.append({key: r[key],
                     "corr": (cov / denom) if denom > 0 else float("nan")})
    return rows


def grouped_quantiles(ds, key: str, col: str, ps: list[float]):
    """Per-group exact discrete quantiles (same ceil(p·n) convention):
    groupby(key) shuffle, then one numpy sort per group. Appropriate for a
    MODERATE number of groups (each group's values fit one worker); for
    millions of tiny groups pre-aggregate value counts per (key, value)
    first and reuse the exact_quantiles scan per key."""
    import math as _math

    def per_group(g: pa.Table) -> pa.Table:
        vals = np.asarray(g[col].to_pandas(), dtype=np.float64)
        vals = np.sort(vals[~np.isnan(vals)])
        n = len(vals)
        kv = g[key][0].as_py()
        out = {key: [kv] * len(ps),
               "p": np.asarray(ps, dtype=np.float64),
               "value": np.asarray(
                   [vals[max(1, _math.ceil(p * n)) - 1] if n else float("nan")
                    for p in ps], dtype=np.float64)}
        return pa.table(out)

    return ds.groupby(key).map_groups(per_group, batch_format="pyarrow")
