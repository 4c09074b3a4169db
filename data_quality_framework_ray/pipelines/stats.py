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
    n = int(counts.sum("c") or 0)  # sum of zero rows is None, not 0
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


def grouped_quantiles(ds, key: str, col: str, ps: list[float],
                      method: str = "groups"):
    """Per-group exact discrete quantiles (same ceil(p·n) convention).

    ``method="groups"`` (default): groupby(key) shuffle, one numpy sort per
    group — fine for a MODERATE number of groups, each fitting one worker.

    ``method="counts"`` — the millions-of-tiny-groups scale path (round-2
    verdict #6): per-batch (key, value, count) partials, ONE hash-partitioned
    combine, then a single sort + global-cumsum searchsorted per partition.
    No per-group Python call, no per-group sort of raw rows — cost is one
    O(m log m) sort per partition over the DISTINCT (key, value) pairs it
    owns, and the shuffle carries count partials, not data rows.
    """
    if method == "counts":
        return grouped_quantiles_counts(ds, key, col, ps)
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


def grouped_quantiles_counts(ds, key: str, col: str, ps: list[float]):
    """Scale path for per-group quantiles: each hash partition owns complete
    key groups (partitioned on ``key``), sorts its (key, value) count rows
    ONCE, and answers every (key, p) with a vectorized searchsorted into the
    partition-wide cumulative counts — the per-key target position is offset
    by the key segment's base, so one global cumsum serves all keys."""
    import polars as pl

    from data_quality_framework_ray.pipelines.exchange import (join_partitions,
                                                               part_shuffle)

    from data_quality_framework_ray.pipelines.exchange import schema_map
    key_type = schema_map(ds).get(key, pa.null())
    out_schema = pa.schema([(key, key_type), ("p", pa.float64()),
                            ("value", pa.float64())])

    def partial(t: pa.Table) -> pa.Table:
        return (pl.from_arrow(t.select([key, col])).drop_nulls()
                .group_by(key, col).agg(pl.len().alias("c")).to_arrow())

    def finish(part: pa.Table) -> pa.Table:
        df = (pl.from_arrow(part).group_by(key, col)
              .agg(pl.col("c").sum()).sort([key, col]))
        if df.height == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        k = df[key].to_numpy()
        v = df[col].to_numpy().astype(np.float64)
        cs = np.cumsum(df["c"].to_numpy().astype(np.int64))
        new = np.ones(len(k), dtype=bool)
        new[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(new)
        base = np.where(starts > 0, cs[starts - 1], 0)
        ends = np.append(cs[starts[1:] - 1], cs[-1])
        totals = ends - base  # rows per key
        keys_u = k[starts]
        chunks_k, chunks_p, chunks_v = [], [], []
        for p in ps:  # loop over the handful of requested quantiles only
            pos = np.maximum(1, np.ceil(p * totals).astype(np.int64))
            idx = np.searchsorted(cs, base + pos, side="left")
            chunks_k.append(keys_u)
            chunks_p.append(np.full(len(starts), p, dtype=np.float64))
            chunks_v.append(v[idx])
        return pa.table({key: pa.array(np.concatenate(chunks_k)),
                         "p": np.concatenate(chunks_p),
                         "value": np.concatenate(chunks_v)}).cast(out_schema)

    from data_quality_framework_ray.pipelines.exchange import schema_map
    col_type = schema_map(ds).get(col, pa.null())
    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=config.TEXT_BATCH_SIZE).materialize()
    if parts.count() <= config.PARTIAL_FOLD_LIMIT:
        # bounded driver fold: the partials are distinct (key, value) count
        # rows; under the limit, `finish` runs once on the driver over the
        # whole table (it already handles many keys in one sorted pass) —
        # skipping the hash shuffle whose exchange constants dominate at
        # these cardinalities. Above the limit (high-cardinality value
        # columns at scale) the partitioned path below is unchanged.
        import ray.data as rd

        from data_quality_framework_ray.pipelines.exchange import \
            collect_partials

        t = collect_partials(parts, "c", pa.schema(
            [(key, key_type), (col, col_type), ("c", pa.int64())]))
        return rd.from_arrow(finish(t))
    return part_shuffle(parts, key, finish, out_schema, join_partitions())


def _fold_partials(parts, key_cols: list[str], sum_cols: list[str],
                   limit: int | None = None):
    """Fold a (key…, partial…) Dataset into per-key sums, bounded: while the
    partial-row count (distinct keys × batches) stays under
    ``PARTIAL_FOLD_LIMIT`` the fold is one zero-copy driver pass (measured
    faster than a second Ray aggregate for enum-keyed partials, round-4
    BASELINE); above it — unbounded group/bin cardinality — a distributed
    ``groupby().aggregate(Sum…)`` runs first and only the true per-key rows
    reach the driver (round-4 verdict #6: these folds previously had no
    guard). Returns a polars DataFrame with columns key_cols + sum_cols."""
    import polars as pl

    from data_quality_framework_ray.pipelines.exchange import (
        collect_partials, empty_safe)

    lim = config.PARTIAL_FOLD_LIMIT if limit is None else limit
    parts = parts.materialize()
    s_ = parts.schema()
    if s_ is None:  # fully-empty Dataset: schema() is None; callers branch
        # on height==0 (int64 placeholder types never reach a result)
        types = {c: pa.int64() for c in key_cols + sum_cols}
    else:
        types = dict(zip(s_.names, s_.types))
    empty = pa.Table.from_pylist([], schema=pa.schema(
        [(c, types[c]) for c in key_cols + sum_cols]))
    if parts.count() <= lim:
        t = collect_partials(parts, sum_cols[0], empty.schema)
        if not t.num_rows:
            return pl.from_arrow(empty)
        return (pl.from_arrow(t).group_by(key_cols)
                .agg(pl.col(c).sum() for c in sum_cols))

    from ray.data.aggregate import Sum

    agg_schema = pa.schema(
        [(c, types[c]) for c in key_cols]
        + [(f"sum({c})", types[c]) for c in sum_cols])
    agg = (parts.groupby(key_cols).aggregate(*[Sum(c) for c in sum_cols])
           .map_batches(lambda t: empty_safe(
               t, f"sum({sum_cols[0]})", agg_schema),
               batch_format="pyarrow"))
    t = collect_partials(agg, f"sum({sum_cols[0]})", agg_schema)
    return pl.from_arrow(t).rename({f"sum({c})": c for c in sum_cols})


def grouped_outlier_counts(ds, key: str, col: str, z: float = 2.0):
    """Per-group z-score outlier counts in TWO streaming passes, no shuffle:
    pass 1 folds algebraic partials (n, Σx, Σx²) per batch and combines the
    per-group triples on the driver (one tiny row per group); pass 2 counts
    rows with |x − mean| > z·stddev_samp against the broadcast thresholds.
    SQL parity: stddev_samp (n−1 denominator), groups with n < 2 or zero
    variance report 0 outliers.

    Returns a pyarrow Table (key, n_outliers) sorted by key."""
    import polars as pl

    def partials(t: pa.Table) -> pa.Table:
        x = pl.from_arrow(t.select([key, col])).rename({col: "x"})
        # count() (non-null), not len(): SQL avg/stddev_samp ignore NULLs,
        # and the sums above already skip them — a len() n would mix bases
        return (x.group_by(key)
                .agg(n=pl.col("x").count().cast(pl.Int64),
                     s=pl.col("x").cast(pl.Float64).sum(),
                     ss=(pl.col("x").cast(pl.Float64) ** 2).sum())
                .to_arrow())

    agg = _fold_partials(
        ds.map_batches(partials, batch_format="pyarrow",
                       batch_size=config.TEXT_BATCH_SIZE),
        [key], ["n", "s", "ss"])
    if agg.height == 0:  # empty/all-null input (ADVICE.md round 3)
        from data_quality_framework_ray.pipelines.exchange import schema_map
        return pa.table({key: pa.array([], type=schema_map(ds).get(key, pa.null())),
                         "n_outliers": pa.array([], type=pa.int64())})
    n = agg["n"].to_numpy().astype(np.float64)
    mean = agg["s"].to_numpy() / np.maximum(n, 1)
    var = np.where(n > 1, (agg["ss"].to_numpy() - n * mean * mean)
                   / np.maximum(n - 1, 1), 0.0)
    sd = np.sqrt(np.maximum(var, 0.0))
    bounds = {k: (m - z * s, m + z * s) if s > 0 else None
              for k, m, s in zip(agg[key].to_list(), mean, sd)}

    import ray

    ref = ray.put(bounds)

    def count_out(t: pa.Table) -> pa.Table:
        b = ray.get(ref) if not isinstance(ref, dict) else ref
        keys = t[key].to_numpy(zero_copy_only=False)
        x = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        lo = np.full(len(x), -np.inf)
        hi = np.full(len(x), np.inf)
        for i, kv in enumerate(keys):
            bb = b.get(kv)
            if bb is not None:
                lo[i], hi[i] = bb
        out = (x < lo) | (x > hi)
        return (pl.from_arrow(pa.table({key: keys, "o": out}))
                .group_by(key).agg(pl.col("o").sum().cast(pl.Int64)
                                   .alias("n_outliers")).to_arrow())

    out = _fold_partials(
        ds.map_batches(count_out, batch_format="pyarrow",
                       batch_size=config.TEXT_BATCH_SIZE),
        [key], ["n_outliers"]).sort(key)
    return out.to_arrow()


def grouped_mode(ds, key: str, col: str):
    """Per-group mode with a DETERMINISTIC tie-break (highest count, then
    smallest value — SQL restatement: row_number() OVER (PARTITION BY key
    ORDER BY n DESC, value ASC) = 1): per-batch (key, value) count partials
    → bounded fold (driver under PARTIAL_FOLD_LIMIT, distributed groupby
    above it) → one vectorized sorted pick per key. The shuffle carries
    distinct (key, value) count rows, never data rows, so cost is bounded
    by group×value cardinality regardless of row count. Returns a pyarrow
    Table (key, mode_value, n) sorted by key."""
    import polars as pl

    def partials(t: pa.Table) -> pa.Table:
        return (pl.from_arrow(t.select([key, col])).drop_nulls()
                .group_by(key, col).agg(pl.len().cast(pl.Int64).alias("n"))
                .to_arrow())

    folded = _fold_partials(
        ds.map_batches(partials, batch_format="pyarrow",
                       batch_size=config.TEXT_BATCH_SIZE),
        [key, col], ["n"])
    if folded.height == 0:  # empty/all-null input: typed empty result
        from data_quality_framework_ray.pipelines.exchange import schema_map
        sm = schema_map(ds)
        return pa.table({key: pa.array([], type=sm.get(key, pa.null())),
                         "mode_value": pa.array([], type=sm.get(col, pa.null())),
                         "n": pa.array([], type=pa.int64())})
    out = (folded.sort([key, "n", col], descending=[False, True, False])
           .group_by(key, maintain_order=True)
           .agg(pl.col(col).first().alias("mode_value"),
                pl.col("n").first())
           .sort(key))
    return out.to_arrow()


def grouped_moments(ds, key: str, col: str):
    """Per-group population skewness and excess kurtosis from EXACT integer
    power sums. The column must be integer-valued and bounded so that the
    dataset-wide Σx⁴ fits int64 (|x| ≤ 50 supports ~1.4e12 rows; larger
    magnitudes need the partials widened to decimal128/Python ints). Each
    batch emits one (key, n, s1..s4) int64 row; the bounded fold combines
    them exactly (integer addition — no float accumulation-order drift, the
    failure mode that forced the int64-cents rework in round 4); skew/kurt
    are then closed-form doubles computed ONCE per key from the exact sums.

    Numerics contract: the finishing expressions below are written in the
    SAME shape as the SQL oracle (convert each exact sum to double FIRST,
    then s/n, then the left-associative central-moment expansion, sqrt not
    pow) so engine≡oracle equality is bit-exact with NO rounding slack —
    +,-,*,/ and sqrt are IEEE-determined given identical operand order.
    Returns a pyarrow Table (key, n, skew, kurt) sorted by key; groups with
    zero variance or n=0 report NaN."""
    import polars as pl

    def partials(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([key, col])).drop_nulls()
        x = pl.col(col).cast(pl.Int64)
        return (df.group_by(key)
                .agg(n=pl.col(col).count().cast(pl.Int64),
                     s1=x.sum(), s2=(x * x).sum(),
                     s3=(x * x * x).sum(), s4=(x * x * x * x).sum())
                .to_arrow())

    folded = _fold_partials(
        ds.map_batches(partials, batch_format="pyarrow",
                       batch_size=config.TEXT_BATCH_SIZE),
        [key], ["n", "s1", "s2", "s3", "s4"])
    rows = []
    for r in sorted(folded.iter_rows(named=True), key=lambda r: r[key]):
        n = int(r["n"])
        if n == 0:
            rows.append({key: r[key], "n": 0,
                         "skew": float("nan"), "kurt": float("nan")})
            continue
        # float() FIRST, then /n — matches SQL CAST(s AS DOUBLE)/n (Python's
        # big-int / would round the exact rational instead, a different op)
        s1, s2 = float(r["s1"]), float(r["s2"])
        s3, s4 = float(r["s3"]), float(r["s4"])
        mean, q2, q3, q4 = s1 / n, s2 / n, s3 / n, s4 / n
        m2 = q2 - mean * mean
        m3 = q3 - 3.0 * mean * q2 + 2.0 * mean * mean * mean
        m4 = (q4 - 4.0 * mean * q3 + 6.0 * (mean * mean) * q2
              - 3.0 * (mean * mean * mean * mean))
        if m2 > 0:
            skew = m3 / (m2 * math.sqrt(m2))
            kurt = m4 / (m2 * m2) - 3.0
        else:
            skew = kurt = float("nan")
        rows.append({key: r[key], "n": n, "skew": skew, "kurt": kurt})
    if not rows:
        from data_quality_framework_ray.pipelines.exchange import schema_map
        f64 = pa.array([], type=pa.float64())
        return pa.table({key: pa.array([], type=schema_map(ds).get(key, pa.null())),
                         "n": pa.array([], type=pa.int64()),
                         "skew": f64, "kurt": f64})
    return pa.Table.from_pylist(rows)


def _grouped_value_counts(ds, key: str, col: str):
    """ONE data pass → folded distinct (key, value, c) polars frame (driver
    fold under PARTIAL_FOLD_LIMIT, distributed combine above). The distinct
    value-count table is a sufficient statistic for every order-statistic
    finish (quantiles, MAD, IQR fences + outlier counts), so operators built
    on it never need a second scan of the data."""
    import polars as pl

    def partial(t: pa.Table) -> pa.Table:
        return (pl.from_arrow(t.select([key, col])).drop_nulls()
                .group_by(key, col).agg(pl.len().alias("c").cast(pl.Int64))
                .to_arrow())

    return _fold_partials(
        ds.map_batches(partial, batch_format="pyarrow",
                       batch_size=config.TEXT_BATCH_SIZE),
        [key, col], ["c"])


def _disc_quantile_segments(folded, key: str, col: str, ps: list[float]):
    """Vectorized per-key discrete quantiles (ceil(p·n) convention) over a
    sorted distinct-count frame — one global cumsum serves all keys (same
    kernel as grouped_quantiles_counts.finish). Returns (keys_u, {p: values},
    starts, cs, k, v) so callers can run further passes over the segments."""
    df = folded.sort([key, col])
    k = df[key].to_numpy()
    v = df[col].to_numpy().astype(np.float64)
    cs = np.cumsum(df["c"].to_numpy().astype(np.int64))
    new = np.ones(len(k), dtype=bool)
    new[1:] = k[1:] != k[:-1]
    starts = np.flatnonzero(new)
    base = np.where(starts > 0, cs[starts - 1], 0)
    ends = np.append(cs[starts[1:] - 1], cs[-1])
    totals = ends - base
    out = {}
    for p in ps:
        pos = np.maximum(1, np.ceil(p * totals).astype(np.int64))
        out[p] = v[np.searchsorted(cs, base + pos, side="left")]
    return k[starts], out, starts, cs, k, v


def grouped_mad(ds, key: str, col: str):
    """Per-group median absolute deviation, discrete-quantile convention
    throughout (value at position ceil(0.5·n) — DuckDB ``quantile_disc``)
    in ONE data pass: the folded distinct (key, value, count) table is a
    sufficient statistic, so the per-key median AND the deviation median
    both finish on that small table (map |v−med| keeping counts, re-sort
    the few distinct rows, cumsum again) — the raw rows are scanned once
    and only count partials cross the wire. Returns a pyarrow Table
    (key, mad) sorted by key."""
    import polars as pl

    folded = _grouped_value_counts(ds, key, col)
    if folded.height == 0:
        from data_quality_framework_ray.pipelines.exchange import schema_map
        return pa.table({key: pa.array([], type=schema_map(ds).get(key, pa.null())),
                         "mad": pa.array([], type=pa.float64())})
    keys_u, q, *_ = _disc_quantile_segments(folded, key, col, [0.5])
    med_map = dict(zip(keys_u, q[0.5]))
    dev = (folded.with_columns(
        (pl.col(col).cast(pl.Float64)
         - pl.col(key).replace_strict(med_map, return_dtype=pl.Float64))
        .abs().alias("__dev"))
        .group_by(key, "__dev").agg(pl.col("c").sum()))
    keys_d, qd, *_ = _disc_quantile_segments(dev, key, "__dev", [0.5])
    rows = sorted(({key: kv, "mad": float(m)}
                   for kv, m in zip(keys_d, qd[0.5])),
                  key=lambda r: r[key])
    return pa.Table.from_pylist(rows)


def grouped_iqr_outliers(ds, key: str, col: str, k: float = 1.5):
    """Per-group Tukey-fence outlier counts in ONE data pass: q1/q3 come
    from the folded distinct (key, value, count) table (discrete quantiles —
    SQL ``quantile_disc`` parity), fences lo = q1 − k·(q3−q1) /
    hi = q3 + k·(q3−q1) are computed in the same double expression shape as
    the SQL oracle, and the outlier count is the sum of counts outside the
    fences over that SAME small table — the raw rows are never scanned a
    second time; only count partials cross the wire. Returns a pyarrow
    Table (key, n_outliers, n) sorted by key."""
    import polars as pl

    folded = _grouped_value_counts(ds, key, col)
    if folded.height == 0:
        from data_quality_framework_ray.pipelines.exchange import schema_map
        i64 = pa.array([], type=pa.int64())
        return pa.table({key: pa.array([], type=schema_map(ds).get(key, pa.null())),
                         "n_outliers": i64, "n": i64})
    keys_u, q, starts, cs, karr, v = _disc_quantile_segments(
        folded, key, col, [0.25, 0.75])
    lo_map, hi_map, n_map = {}, {}, {}
    base = np.where(starts > 0, cs[starts - 1], 0)
    ends = np.append(cs[starts[1:] - 1], cs[-1])
    for kv, q1, q3, n in zip(keys_u, q[0.25], q[0.75], ends - base):
        lo_map[kv] = q1 - k * (q3 - q1)
        hi_map[kv] = q3 + k * (q3 - q1)
        n_map[kv] = int(n)
    out = (folded.with_columns(
        lo=pl.col(key).replace_strict(lo_map, return_dtype=pl.Float64),
        hi=pl.col(key).replace_strict(hi_map, return_dtype=pl.Float64),
        x=pl.col(col).cast(pl.Float64))
        .group_by(key)
        .agg(n_outliers=(pl.col("c")
                         .filter((pl.col("x") < pl.col("lo"))
                                 | (pl.col("x") > pl.col("hi")))
                         .sum().fill_null(0).cast(pl.Int64)))
        .sort(key))
    return (out.with_columns(
        n=pl.col(key).replace_strict(n_map, return_dtype=pl.Int64))
        .to_arrow())


def grouped_weighted_avg(ds, key: str, col: str, weight_col: str):
    """Per-group weighted average of a 2-decimal money column weighted by an
    integer column, EXACT: per-batch int64 partials Σ(cents·w) and Σw (cents
    via half-away-from-zero rounding — the same convention every money query
    and oracle uses), bounded fold, then ONE double division per group in
    the oracle's expression shape (double(Σcw)/100.0/double(Σw)). int64
    bound: max cents·w ≈ 5e8/row → exact to ~1.8e10 rows per fold cell;
    widen to Python-int folding beyond. Returns (key, wavg) sorted by key."""
    import polars as pl

    def partials(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([key, col, weight_col])).drop_nulls()
        cents = ((pl.col(col) * 100).round(0, mode="half_away_from_zero")
                 .cast(pl.Int64))
        w = pl.col(weight_col).cast(pl.Int64)
        return (df.group_by(key)
                .agg(cw=(cents * w).sum(), sw=w.sum())
                .to_arrow())

    folded = _fold_partials(
        ds.map_batches(partials, batch_format="pyarrow",
                       batch_size=config.TEXT_BATCH_SIZE),
        [key], ["cw", "sw"])
    rows = [{key: r[key],
             "wavg": float(r["cw"]) / 100.0 / float(r["sw"])
             if r["sw"] else float("nan")}
            for r in sorted(folded.iter_rows(named=True),
                            key=lambda r: r[key])]
    if not rows:
        from data_quality_framework_ray.pipelines.exchange import schema_map
        return pa.table({key: pa.array([], type=schema_map(ds).get(key, pa.null())),
                         "wavg": pa.array([], type=pa.float64())})
    return pa.Table.from_pylist(rows)


def histogram_fixed(ds, col: str, width: float, origin: float = 0.0):
    """Fixed-width histogram: bin = floor((x − origin) / width), per-batch
    partial counts folded on the driver (bin cardinality ≈ range/width, tiny
    by construction). Returns a pyarrow Table (bin, n) sorted by bin."""
    import polars as pl

    def partials(t: pa.Table) -> pa.Table:
        x = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        x = x[~np.isnan(x)]
        bins = np.floor((x - origin) / width).astype(np.int64)
        u, c = np.unique(bins, return_counts=True)
        return pa.table({"bin": u, "n": c.astype(np.int64)})

    out = _fold_partials(
        ds.map_batches(partials, batch_format="pyarrow",
                       batch_size=config.TEXT_BATCH_SIZE),
        ["bin"], ["n"]).sort("bin")
    return out.to_arrow()


def psi_binned(ds, col: str, group_col: str, base_key, cur_key,
               width: float, origin: float = 0.0, eps: float = 1e-6):
    """Population Stability Index between two cohorts of one table
    (distribution drift, the dataflow analogue of the reference's DEV↔PROD
    row-count comparison, /root/reference/main.py:226-253): fixed-width bin
    counts for both cohorts fold from ONE streaming pass of per-batch
    partials; proportions are smoothed with ``eps`` before the log ratio so
    empty bins stay finite. Returns (bin, p_base, p_cur, contrib) sorted by
    bin; total PSI = sum(contrib)."""
    import polars as pl

    def partials(t: pa.Table) -> pa.Table:
        g = t[group_col].to_numpy(zero_copy_only=False)
        x = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        out_b, out_g, out_n = [], [], []
        for key, tag in ((base_key, 0), (cur_key, 1)):
            sel = x[g == key]
            sel = sel[~np.isnan(sel)]
            bins = np.floor((sel - origin) / width).astype(np.int64)
            u, c = np.unique(bins, return_counts=True)
            out_b.append(u)
            out_g.append(np.full(len(u), tag, dtype=np.int8))
            out_n.append(c.astype(np.int64))
        return pa.table({"bin": np.concatenate(out_b),
                         "g": np.concatenate(out_g),
                         "n": np.concatenate(out_n)})

    folded = _fold_partials(
        ds.map_batches(partials, batch_format="pyarrow",
                       batch_size=config.TEXT_BATCH_SIZE),
        ["bin", "g"], ["n"])
    if folded.height == 0:  # empty input (ADVICE.md round 3)
        f64 = pa.array([], type=pa.float64())
        return pa.table({"bin": pa.array([], type=pa.int64()),
                         "p_base": f64, "p_cur": f64, "contrib": f64})
    df = (folded.with_columns(pl.col("g").cast(pl.String))
          .pivot(values="n", index="bin", on="g")
          .sort("bin"))
    nb = df["0"].fill_null(0).to_numpy().astype(np.float64) \
        if "0" in df.columns else np.zeros(df.height)
    nc = df["1"].fill_null(0).to_numpy().astype(np.float64) \
        if "1" in df.columns else np.zeros(df.height)
    p = np.maximum(nb / max(nb.sum(), 1.0), eps)
    q = np.maximum(nc / max(nc.sum(), 1.0), eps)
    contrib = (p - q) * np.log(p / q)
    return pa.table({"bin": df["bin"].to_arrow(),
                     "p_base": p, "p_cur": q, "contrib": contrib})
