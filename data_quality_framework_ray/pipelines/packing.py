"""Sequence packing for training-data pipelines: concat-then-chunk.

Assigns every document a ``pack_id`` such that documents are packed in id
order into fixed token-budget chunks — the GPT-style "concatenate the corpus,
cut every ``budget`` tokens" layout, expressed at document granularity:
``pack_id = exclusive_prefix_sum(tokens) // budget``. A pack may overflow by
at most one document (the straddler), which is the standard concat-and-chunk
semantics and makes the operator an exact window-function SQL equivalent.

Distributed shape (no driver materialization of data rows):

1. Range-bucket by the (orderable, unique) id: ``bucket = id // bucket_size``
   — bucket k's ids all precede bucket k+1's, so per-bucket sums compose into
   a global prefix.
2. Per-batch partial bucket sums (combiner) → tiny ``groupby(bucket)`` — the
   shuffle moves O(#batches × #buckets-touched) rows, not the corpus.
3. Driver turns the per-bucket sums (one small row per bucket) into exclusive
   prefix bases, broadcast via ``ray.put``.
4. ``groupby(bucket).map_groups``: sort the group by id, local exclusive
   cumsum + bucket base, integer-divide by the budget.

At 100 TB, ``bucket_size`` controls group size (a bucket must fit one worker;
pick buckets of ~1e6 docs); the driver holds one int per bucket.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def pack_chunks(ds, *, weight_col: str, id_col: str, budget: int,
                bucket_size: int = 100_000):
    """Append ``pack_id`` (int64) per row; returns a Dataset with
    ``(id_col, weight_col, pack_id)``. ``id_col`` must be unique integer-like
    and orderable; packing order is ascending id."""
    import ray
    import ray.data  # noqa: F401  (groupby)
    from ray.data.aggregate import Sum

    def bucket_partials(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        w = b[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bk = ids // bucket_size
        ub, inv = np.unique(bk, return_inverse=True)
        sums = np.zeros(len(ub), dtype=np.int64)
        np.add.at(sums, inv, w)
        return pa.table({"__bucket": pa.array(ub, type=pa.int64()),
                         "__wsum": pa.array(sums, type=pa.int64())})

    bucket_sums = (ds.map_batches(bucket_partials, batch_format="pyarrow")
                   .groupby("__bucket")
                   .aggregate(Sum("__wsum", alias_name="__wsum"))
                   .take_all())  # one tiny row per bucket
    bucket_sums.sort(key=lambda r: r["__bucket"])
    bases: dict[int, int] = {}
    acc = 0
    for r in bucket_sums:
        bases[int(r["__bucket"])] = acc
        acc += int(r["__wsum"])
    bases_ref = ray.put(bases)

    def add_bucket(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        return b.append_column("__bucket",
                               pa.array(ids // bucket_size, type=pa.int64()))

    def pack_group(g: pa.Table) -> pa.Table:
        base_map = ray.get(bases_ref)
        order = np.argsort(g[id_col].to_numpy(zero_copy_only=False),
                           kind="stable")
        g = g.take(pa.array(order))
        w = g[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bk = int(g["__bucket"][0].as_py())
        prefix = base_map[bk] + np.concatenate(([0], np.cumsum(w)[:-1]))
        pack = prefix // budget
        return pa.table({
            id_col: g[id_col],
            weight_col: g[weight_col],
            "pack_id": pa.array(pack, type=pa.int64()),
        })

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(pack_group, batch_format="pyarrow"))


def running_max_exclusive(ds, *, id_col: str, value_col: str,
                          bucket_size: int = 100_000):
    """Global EXCLUSIVE prefix maximum of an int64 column ordered by a
    unique integer id — the streaming-watermark primitive (max event-time
    seen STRICTLY BEFORE each row in arrival order). Same two-level
    pattern as ``running_total``: per-batch bucket max partials → tiny
    groupby → driver derives per-bucket exclusive bases (one int per
    bucket) → per-bucket sort + local shifted cummax. Rows never shuffle;
    only per-bucket maxima do. The global first row has no predecessor and
    emits NULL. Returns a Dataset of (id_col, value_col, "prev_max") rows
    — the value rides along so callers compare row vs watermark without a
    join."""
    import ray
    from ray.data.aggregate import Max

    I64_MIN = np.iinfo(np.int64).min

    def bucket_partials(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        w = b[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bk = ids // bucket_size
        ub, inv = np.unique(bk, return_inverse=True)
        mx = np.full(len(ub), I64_MIN, dtype=np.int64)
        np.maximum.at(mx, inv, w)
        return pa.table({"__bucket": pa.array(ub, type=pa.int64()),
                         "__wmax": pa.array(mx, type=pa.int64())})

    bucket_max = (ds.map_batches(bucket_partials, batch_format="pyarrow")
                  .groupby("__bucket")
                  .aggregate(Max("__wmax", alias_name="__wmax"))
                  .take_all())
    bucket_max.sort(key=lambda r: r["__bucket"])
    bases: dict[int, int] = {}
    acc = I64_MIN
    for r in bucket_max:
        bases[int(r["__bucket"])] = acc
        acc = max(acc, int(r["__wmax"]))
    bases_ref = ray.put(bases)

    def tag_bucket(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        return (b.select([id_col, value_col])
                .append_column("__bucket",
                               pa.array(ids // bucket_size, pa.int64())))

    def per_bucket(g: pa.Table) -> pa.Table:
        bases_ = ray.get(bases_ref) if not isinstance(bases_ref, dict) \
            else bases_ref
        ids = g[id_col].to_numpy(zero_copy_only=False)
        w = g[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        cm = np.maximum.accumulate(w[order])
        prev = np.empty_like(cm)
        prev[0] = I64_MIN
        prev[1:] = cm[:-1]
        base = bases_[int(ids[0] // bucket_size)]
        out = np.maximum(prev, base)
        return pa.table({id_col: pa.array(ids[order]),
                         value_col: pa.array(w[order]),
                         "prev_max": pa.array(out, mask=out == I64_MIN)})

    return (ds.map_batches(tag_bucket, batch_format="pyarrow")
            .groupby("__bucket").map_groups(per_bucket,
                                            batch_format="pyarrow"))


def running_total(ds, *, id_col: str, value_col: str,
                  bucket_size: int = 100_000):
    """Global INCLUSIVE prefix sum of an int64 column ordered by a unique
    integer id — the distributed running-total, same two-level pattern as
    pack_chunks: per-batch bucket partials → tiny groupby → driver turns
    per-bucket sums into exclusive bases (one int per bucket) → per-bucket
    sort + local cumsum + base. The base pass's shuffle moves per-bucket
    sums, never rows; callers pre-scale money columns to exact integer
    cents so the accumulation has no float-order drift. The lazy input
    lineage executes twice (base pass + assignment pass) — deliberately
    NOT materialized: the input is two pruned columns (16 B/row, a cheap
    re-read at any scale) while materializing would pin/spill the whole
    table in the object store. Returns a Dataset of (id_col, "running")
    int64 rows."""
    import ray
    from ray.data.aggregate import Sum

    def bucket_partials(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        w = b[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bk = ids // bucket_size
        ub, inv = np.unique(bk, return_inverse=True)
        sums = np.zeros(len(ub), dtype=np.int64)
        np.add.at(sums, inv, w)
        return pa.table({"__bucket": pa.array(ub, type=pa.int64()),
                         "__wsum": pa.array(sums, type=pa.int64())})

    bucket_sums = (ds.map_batches(bucket_partials, batch_format="pyarrow")
                   .groupby("__bucket")
                   .aggregate(Sum("__wsum", alias_name="__wsum"))
                   .take_all())
    bucket_sums.sort(key=lambda r: r["__bucket"])
    bases: dict[int, int] = {}
    acc = 0
    for r in bucket_sums:
        bases[int(r["__bucket"])] = acc
        acc += int(r["__wsum"])
    bases_ref = ray.put(bases)

    def tag_bucket(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        return (b.select([id_col, value_col])
                .append_column("__bucket",
                               pa.array(ids // bucket_size, pa.int64())))

    def per_bucket(g: pa.Table) -> pa.Table:
        bases_ = ray.get(bases_ref) if not isinstance(bases_ref, dict) \
            else bases_ref
        ids = g[id_col].to_numpy(zero_copy_only=False)
        w = g[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        run = np.cumsum(w[order]) + bases_[int(ids[0] // bucket_size)]
        return pa.table({id_col: pa.array(ids[order]),
                         "running": pa.array(run, pa.int64())})

    return (ds.map_batches(tag_bucket, batch_format="pyarrow")
            .groupby("__bucket").map_groups(per_bucket,
                                            batch_format="pyarrow"))
