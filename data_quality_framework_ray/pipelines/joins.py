"""Join / lookup operators.

The reference has NO dataflow join (SURVEY.md §2.4 — its only analogue is the
driver-dict DEV↔PROD comparison, /root/reference/main.py:226-253), but a
complete engine needs them. Three shapes, picked by side sizes and semantics:

- **broadcast_hash_join** — small side shipped once via ``ray.put``, looked up
  with a vectorized pandas merge per batch. No shuffle; the default whenever
  one side fits in worker memory (dimension tables, winner maps, vocab).
- **hash_join** — both sides large: ``Dataset.join`` (hash-partitioned on the
  key, ``num_partitions`` sized to cluster CPUs). All-to-all exchange; salt
  hot keys upstream if skewed.
- **asof_join_prev** — per-key "most recent earlier" semantics: hash-partition
  by key (one synthetic ``__part`` column), then ONE polars call per
  partition (sort + distinct-shift + join back, all Rust) — NOT one Python
  call per key (round-1 design; at 10⁸ keys that was 10⁸ interpreter
  round-trips, VERDICT.md item 4). A single key's history must fit in a
  worker (salt by time-range for pathological keys).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from data_quality_framework_ray import config
from data_quality_framework_ray.functions import hashing as H
# importing exchange applies patch_join_empty_side_schema_broadcast (Ray
# 2.49.2 Dataset.join crash on a globally-empty side) to every join below
from data_quality_framework_ray.pipelines import exchange as _exchange  # noqa: F401


def broadcast_hash_join(ds, small_df: pd.DataFrame, left_on: str, right_on: str,
                        how: str = "inner"):
    """Join a Dataset against a small table (broadcast once as Arrow).

    The per-batch join is polars (Arrow-native both sides) — no
    Arrow→pandas→Arrow round-trip per batch (VERDICT.md item 10)."""
    import polars as pl
    import ray

    small_tbl = (pa.Table.from_pandas(small_df, preserve_index=False)
                 if isinstance(small_df, pd.DataFrame) else small_df)
    ref = ray.put(small_tbl)

    def lookup(batch: pa.Table) -> pa.Table:
        small = ray.get(ref) if not isinstance(ref, pa.Table) else ref
        out = pl.from_arrow(batch).join(pl.from_arrow(small), how=how,
                                        left_on=left_on, right_on=right_on,
                                        coalesce=True)
        return out.to_arrow()

    return ds.map_batches(lookup, batch_format="pyarrow",
                          batch_size=config.TEXT_BATCH_SIZE)


def hash_join(left, right, on: str | tuple[str, ...],
              right_on: str | tuple[str, ...] | None = None, *,
              join_type: str = "inner", num_partitions: int | None = None):
    """Large-large equi-join via Ray Data's hash-partitioned join.

    ``num_partitions=None`` sizes partitions to the DATA, not the cluster:
    one partition per ~64 MB of combined input (estimated from read
    metadata), clamped to [2, cluster CPUs]. Each Join partition spins up a
    hash-aggregator actor (~0.2-0.3 s spawn here), so a small join must not
    pay for 32 actors; a 100 TB join hits the CPU cap and each actor streams
    its shard."""
    import ray

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        try:
            nbytes = (left.size_bytes() or 0) + (right.size_bytes() or 0)
        except Exception:
            nbytes = 0
        by_data = max(2, nbytes // (64 << 20)) if nbytes else cpus
        num_partitions = int(max(2, min(cpus, by_data)))
    on_t = (on,) if isinstance(on, str) else tuple(on)
    r_t = None if right_on is None else (
        (right_on,) if isinstance(right_on, str) else tuple(right_on))
    return left.join(right, join_type=join_type, num_partitions=num_partitions,
                     on=on_t, right_on=r_t)


def skew_join(left, right, on: str, right_on: str | None = None, *,
              hot_count_threshold: int = 100_000,
              max_hot_keys: int = 10_000):
    """Skew-aware inner equi-join: the module docstring's "salt hot keys
    upstream" advice as an operator. A hash join places ALL rows of a key
    on one partition, so a heavy-hitter key turns the exchange into a
    straggler; here the hot keys' rows skip the shuffle entirely.

    1. Exact probe-side key counts on the PRUNED key column (one narrow
       groupby — at 100 TB swap in a sampled count; the split only needs
       hot/cold, not exact numbers). Keys with count > threshold are HOT,
       capped at ``max_hot_keys`` (take the heaviest).
    2. HOT left rows join against the hot slice of ``right`` broadcast
       once (the hot slice is small when ``right`` is dimension-shaped —
       few rows per key; asserted against BROADCAST_DUP_LIMIT).
    3. COLD rows take the normal hash-partitioned ``Dataset.join`` —
       no hot key reaches it, so partitions stay balanced.
    4. Union. Row set identical to a plain inner join (pinned by the
       equivalence test and the SQL oracle of the query that uses this).
    """
    import pyarrow.compute as pc
    import ray

    from data_quality_framework_ray.pipelines.stats import _fold_partials

    r_on = right_on or on

    def count_partial(t: pa.Table) -> pa.Table:
        return (t.select([on]).group_by(on).aggregate([([], "count_all")])
                .rename_columns([on, "__n"]))

    import polars as pl

    counts = _fold_partials(
        left.map_batches(count_partial, batch_format="pyarrow"),
        [on], ["__n"])
    hot_df = (counts.filter(pl.col("__n") > hot_count_threshold)
              .sort("__n", descending=True).head(max_hot_keys))
    hot_keys = hot_df[on].to_list()
    if not hot_keys:
        return hash_join(left, right, on, r_on)
    key_t = _key_type_or_fallback(left, on, right, r_on)
    hot_arr = pa.array(hot_keys, type=key_t)
    hot_ref = ray.put(hot_arr)

    def split(keep_hot: bool):
        def f(t: pa.Table, col: str) -> pa.Table:
            ha = ray.get(hot_ref) if not isinstance(hot_ref, pa.Array) \
                else hot_ref
            m = pc.is_in(t[col], ha)
            return t.filter(m if keep_hot else pc.invert(m))
        return f

    # collect_blocks, not to_arrow_refs: the latter re-probes schema with a
    # limit=1 re-run of the lineage at this Ray version (see exchange)
    right_hot_tabs, _ = _exchange.collect_blocks(
        right.map_batches(lambda t: split(True)(t, r_on),
                          batch_format="pyarrow"))
    right_hot_tabs = [t for t in right_hot_tabs if t.num_rows]
    right_hot = (pa.concat_tables(right_hot_tabs) if right_hot_tabs
                 else None)
    cold = hash_join(
        left.map_batches(lambda t: split(False)(t, on),
                         batch_format="pyarrow"),
        right.map_batches(lambda t: split(False)(t, r_on),
                          batch_format="pyarrow"), on, r_on)
    if right_hot is None or right_hot.num_rows == 0:
        return cold
    assert right_hot.num_rows <= config.BROADCAST_DUP_LIMIT, \
        "hot slice of right side too large to broadcast — raise the " \
        "threshold or pre-aggregate the right side"
    hot_joined = broadcast_hash_join(
        left.map_batches(lambda t: split(True)(t, on),
                         batch_format="pyarrow"),
        right_hot, on, r_on)
    return cold.union(hot_joined)


def semi_join(left, right, on: str, right_on: str | None = None, *,
              anti: bool = False, num_partitions: int | None = None):
    """Keep left rows whose key exists (semi) / does not exist (anti) in
    ``right``. The right side is reduced to DISTINCT keys first (per-batch
    unique partial + one distributed groupby), so nothing downstream ever
    sees right-side payloads.

    Null-key semantics are SQL EXISTS / NOT EXISTS parity (round-2 advice):
    a NULL left key never matches anything, so semi DROPS null-keyed left
    rows and anti KEEPS them — enforced identically on both paths (null
    right keys are discarded from the key set; left-null match status is
    forced false before the keep/invert step).

    Two execution paths picked by distinct-key cardinality:
    - keys fit the broadcast limit → ``ray.put`` the key set once, vectorized
      ``pc.is_in`` per left batch. No join, no second shuffle. This is ALSO
      the correctness workaround for a Ray 2.49.2 bug: ``Dataset.join``
      raises ArrowInvalid when a right hash partition is EMPTY (inevitable
      when distinct keys < num_partitions — reproduced at 2 keys / 3
      partitions).
    - keys too large to broadcast → left-outer ``Dataset.join`` against the
      (key, marker) table; at that cardinality every partition is non-empty
      with probability ~1, away from the bug."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from data_quality_framework_ray import config
    from data_quality_framework_ray.pipelines.dedup import _join_partitions

    right_on = right_on or on
    keys = (right.select_columns([right_on])
            .map_batches(lambda t: t.filter(pc.is_valid(t[right_on]))
                         .group_by(right_on).aggregate([]),
                         batch_format="pyarrow")
            .groupby(right_on).aggregate(Count(alias_name="__m"))
            .materialize())

    if keys.count() <= config.BROADCAST_DUP_LIMIT:
        import ray

        # skip the SCHEMA-LESS empty blocks Ray's aggregate emits for empty
        # hash partitions (keys << partitions)
        tabs = [t.select([right_on]) for t in ray.get(keys.to_arrow_refs())
                if t.num_rows and right_on in t.column_names]
        if tabs:
            key_arr = pa.concat_tables(tabs)[right_on].combine_chunks()
        else:
            rs = right.schema()
            key_arr = pa.array([], type=dict(zip(rs.names, rs.types))[right_on])
        ref = ray.put(key_arr)

        def bfilter(batch: pa.Table) -> pa.Table:
            ks = ray.get(ref) if not isinstance(ref, pa.Array) else ref
            # null left key → never matches: semi drops it, anti keeps it
            present = pc.fill_null(pc.is_in(batch[on], value_set=ks), False)
            keep = pc.invert(present) if anti else present
            return batch.filter(keep)

        return left.map_batches(bfilter, batch_format="pyarrow",
                                batch_size=config.TEXT_BATCH_SIZE)

    if not anti:
        # Bloom pre-filter before the exchange: a 1%-fpp filter over even
        # 5M keys is ~6 MB (broadcastable when the key SET is not), and
        # bloom-absent left rows are DEFINITELY non-matching — dropping them
        # here shrinks the join's all-to-all by the left miss rate with zero
        # correctness risk (the exact join confirms the maybes). Anti keeps
        # every row until the exact join, so no pre-filter there.
        import ray

        from data_quality_framework_ray.functions.sketches import (
            bloom_contains, build_bloom)

        bits, kh = build_bloom(keys.select_columns([right_on]), right_on,
                               n_keys_hint=keys.count())
        bref = ray.put(bits)

        # content_hash_128 is integer-WIDTH-sensitive (int32 ≠ int64 hashes):
        # an int32 left key probed against an int64-built Bloom yields false
        # NEGATIVES — silently dropped matching rows. Cast the left key to the
        # right key's (dictionary-decoded) type before probing; an unsafe cast
        # raises loudly rather than mis-hashing. (ADVICE.md round 3.)
        ks_ = keys.schema()
        key_t = dict(zip(ks_.names, ks_.types))[right_on]
        if pa.types.is_dictionary(key_t):
            key_t = key_t.value_type

        def prefilter(batch: pa.Table) -> pa.Table:
            bb = ray.get(bref) if not isinstance(bref, np.ndarray) else bref
            col = batch[on]
            if pa.types.is_dictionary(col.type):
                col = col.cast(col.type.value_type)
            if col.type != key_t:
                col = col.cast(key_t)
            return batch.filter(pa.array(bloom_contains(col, bb, kh)))

        left = left.map_batches(prefilter, batch_format="pyarrow",
                                batch_size=config.TEXT_BATCH_SIZE)

    joined = left.join(keys, "left_outer", _join_partitions(num_partitions),
                       on=(on,), right_on=(right_on,))

    def f(batch: pa.Table) -> pa.Table:
        # force null left keys to non-matching regardless of how the join
        # engine treated them (SQL parity; see docstring)
        present = pc.and_(pc.is_valid(batch["__m"]), pc.is_valid(batch[on]))
        keep = pc.invert(present) if anti else present
        return batch.filter(keep).drop_columns(["__m"])

    return joined.map_batches(f, batch_format="pyarrow")


def _key_type_or_fallback(left, left_col: str, right, right_col: str):
    """Key arrow type for empty-block construction: prefer the left side's
    schema, fall back to the right (an EMPTY side — e.g. after repartition —
    reports schema None and must not crash; both sides share the value
    domain). Both empty+schemaless → pa.null() (the result is empty)."""
    ls = left.schema()
    if ls is not None and left_col in ls.names:
        return dict(zip(ls.names, ls.types))[left_col]
    rs = right.schema()
    if rs is not None and right_col in rs.names:
        return dict(zip(rs.names, rs.types))[right_col]
    return pa.null()


def distinct_intersect(left, left_col: str, right, right_col: str, *,
                       except_: bool = False, num_partitions: int | None = None):
    """DISTINCT left values ∩ right values (or ∖ when ``except_``): both
    sides reduce to distinct keys per batch, then one hash join."""
    out = semi_join(
        left.select_columns([left_col])
        .map_batches(lambda t: t.group_by(left_col).aggregate([]),
                     batch_format="pyarrow"),
        right, on=left_col, right_on=right_col, anti=except_,
        num_partitions=num_partitions)
    from ray.data.aggregate import Count

    key_type = _key_type_or_fallback(left, left_col, right, right_col)

    def sel(t: pa.Table) -> pa.Table:
        if left_col not in t.column_names:  # Ray schema-less empty block
            return pa.table({left_col: pa.array([], type=key_type)})
        return t.select([left_col])

    return (out.groupby(left_col).aggregate(Count(alias_name="__c"))
            .map_batches(sel, batch_format="pyarrow"))


def distinct_set_ops(left, left_col: str, right, right_col: str, *,
                     combine: str = "shuffle"):
    """INTERSECT + EXCEPT in ONE pass / ONE shuffle: tag each side, reduce
    per batch to distinct (value, side) rows, union, then a single tiny
    groupby(value) with Min/Max over the side tag — ``in_left`` ⇔ min==0,
    ``in_right`` ⇔ max==1. Replaces two back-to-back ``distinct_intersect``
    pipelines (4 table scans + 2 shuffles → 2 scans + 1 shuffle of distinct
    partials; at 100 TB only the per-batch distinct values ever move).

    ``combine="driver"`` skips the shuffle and folds the per-batch distinct
    partials in one polars pass on the driver — correct ONLY when the caller
    knows the column is low-cardinality (status/enum columns: partials are
    ≤ distinct_values × blocks rows). Default stays the shuffle, which is
    safe at any cardinality.

    Returns a Dataset with columns (``value``, ``in_left``, ``in_right``)
    (``combine="driver"`` returns a pyarrow Table of the same shape).
    """
    from ray.data.aggregate import Max, Min

    def tagger(col: str, side: int):
        def tag(t: pa.Table) -> pa.Table:
            d = t.select([col]).group_by(col).aggregate([])
            return pa.table({
                "value": d[col],
                "side": np.full(d.num_rows, side, dtype=np.int8),
            })
        return tag

    l = left.select_columns([left_col]).map_batches(
        tagger(left_col, 0), batch_format="pyarrow")
    r = right.select_columns([right_col]).map_batches(
        tagger(right_col, 1), batch_format="pyarrow")

    key_type = _key_type_or_fallback(left, left_col, right, right_col)

    if combine == "driver":
        import polars as pl

        parts = l.union(r).take_all()
        if not parts:  # both sides empty: pl.DataFrame([]) has no columns
            # to group_by (ADVICE.md round 3)
            return pa.table({"value": pa.array([], type=key_type),
                             "in_left": pa.array([], type=pa.bool_()),
                             "in_right": pa.array([], type=pa.bool_())})
        df = (pl.DataFrame(parts).group_by("value")
              .agg(pl.col("side").min().alias("__mn"),
                   pl.col("side").max().alias("__mx")))
        return pa.table({"value": df["value"].to_arrow(),
                         "in_left": (df["__mn"] == 0).to_arrow(),
                         "in_right": (df["__mx"] == 1).to_arrow()})

    agg = (l.union(r).groupby("value")
           .aggregate(Min("side", alias_name="__mn"),
                      Max("side", alias_name="__mx")))

    def classify(t: pa.Table) -> pa.Table:
        if "value" not in t.column_names:  # Ray schema-less empty block —
            # typed from the LEFT key column, not hardcoded string, so int
            # keys don't produce mixed block schemas
            return pa.table({"value": pa.array([], type=key_type),
                             "in_left": pa.array([], type=pa.bool_()),
                             "in_right": pa.array([], type=pa.bool_())})
        mn = t["__mn"].to_numpy(zero_copy_only=False)
        mx = t["__mx"].to_numpy(zero_copy_only=False)
        return pa.table({"value": t["value"],
                         "in_left": pa.array(mn == 0),
                         "in_right": pa.array(mx == 1)})

    return agg.map_batches(classify, batch_format="pyarrow")


def range_join_broadcast(ds, intervals: pd.DataFrame | pa.Table, ts_col: str,
                         start_col: str, end_col: str):
    """Interval join: each left row matched to every (small-side) interval
    with ``start <= ts < end`` — overlapping intervals emit multiple rows.

    The interval table is broadcast once via ``ray.put`` (same pattern as
    broadcast_hash_join); the per-batch match is ONE polars ``join_where``
    (Rust inequality join) — no shuffle, no per-row Python. For a LARGE
    interval side, pre-bucket both sides by coarse time range and use
    ``Dataset.join`` on the bucket key instead."""
    import polars as pl
    import ray

    tbl = (pa.Table.from_pandas(intervals, preserve_index=False)
           if isinstance(intervals, pd.DataFrame) else intervals)
    ref = ray.put(tbl)

    def match(batch: pa.Table) -> pa.Table:
        right = pl.from_arrow(ray.get(ref) if not isinstance(ref, pa.Table) else ref)
        left = pl.from_arrow(batch)
        out = left.join_where(right,
                              pl.col(ts_col) >= pl.col(start_col),
                              pl.col(ts_col) < pl.col(end_col))
        return out.to_arrow()

    return ds.map_batches(match, batch_format="pyarrow",
                          batch_size=config.TEXT_BATCH_SIZE)


def asof_join_prev(ds, key: str, ts: str, value_cols: list[str] | None = None,
                   num_partitions: int | None = None):
    """For every row, attach ``prev_<ts>`` = the greatest ts of an EARLIER row
    with the same key (strictly less; rows with no earlier row are dropped —
    inner as-of semantics). Deterministic under ts ties because only the ts
    value (not an arbitrary tie row) is emitted.

    Execution: hash-partition on the key (stable FNV-based hash, not a
    per-process hash), then one vectorized polars program per PARTITION:
    distinct (key, ts) → sort → shift-within-key gives each distinct ts its
    strictly-previous distinct ts; a left join fans the answer back out to
    tied rows. Python is invoked O(num_partitions) times total."""
    import polars as pl
    import ray

    P = num_partitions or max(4, int(ray.cluster_resources().get("CPU", 8)) * 2)
    cols = [key, ts] + (value_cols or [])
    prev_name = f"prev_{ts}"

    def add_part(batch: pa.Table) -> pa.Table:
        h1, _ = H.content_hash_128(batch[key])
        return batch.append_column("__part",
                                   pa.array((h1 % np.uint64(P)).astype(np.int64)))

    def per_part(part: pa.Table) -> pa.Table:
        df = pl.from_arrow(part).select(cols)
        uq = (df.select([key, ts]).unique().sort([key, ts])
              .with_columns(pl.col(ts).shift(1).over(key).alias(prev_name)))
        out = (df.join(uq, on=[key, ts], how="left")
               .filter(pl.col(prev_name).is_not_null())
               .select(cols + [prev_name]))
        return out.to_arrow()

    return (ds.map_batches(add_part, batch_format="pyarrow",
                           batch_size=config.TEXT_BATCH_SIZE)
            .groupby("__part").map_groups(per_part, batch_format="pyarrow"))


def snapshot_diff(old, new, key: str, compare_cols: list[str],
                  num_partitions: int | None = None):
    """CDC-style diff of two table versions keyed on ``key``: one
    hash-partitioned FULL OUTER join with presence markers, then a
    vectorized per-batch classify into ``added`` / ``removed`` /
    ``changed`` (unchanged rows are dropped — the diff is small even when
    the tables are not). NULL-safe value compare (NULL vs NULL is
    unchanged, NULL vs value is changed — SQL IS DISTINCT FROM semantics).

    Returns a Dataset with (key, change).

    Two paths by the NEW side's size (keys assumed unique per snapshot —
    CDC semantics):
    - new fits ``config.BROADCAST_DUP_LIMIT`` → broadcast it once and stream
      ONE map_batches pass over old: removed/changed classify per batch plus
      a per-batch matched-key emission (total ≤ |new| rows since old's keys
      are unique), then ``added = new − matched`` on the driver. No Join
      actors, no all-to-all — the old side streams once.
    - otherwise → hash-partitioned FULL OUTER ``Dataset.join`` (both sides
      large; the exchange is the operator's lower bound)."""
    import pyarrow.compute as pc

    # Key type from the NEW side's MATERIALIZED schema (metadata-only): a
    # .schema() on the lazy old lineage would launch a limit=1 probe re-run
    # of its whole upstream plan at this Ray version (and the probe's task
    # cancellation can trip Ray's fatal TaskManager race — see
    # exchange.collect_blocks). Both snapshots key the same entity, so the
    # types agree; the lazy probe remains only as the empty-new fallback.
    new_mat = new.select_columns([key] + compare_cols).materialize()
    nm_schema = new_mat.schema()
    nm_schema = getattr(nm_schema, "base_schema", nm_schema)
    if nm_schema is not None and key in nm_schema.names:
        key_type = dict(zip(nm_schema.names, nm_schema.types))[key]
    else:
        os_schema = old.schema()
        if os_schema is None:
            # both snapshots empty AND schemaless: the diff is empty; no key
            # type is recoverable, so emit a typed-null empty result rather
            # than crash on .names
            import ray.data as rd
            return rd.from_arrow(pa.table(
                {key: pa.array([], type=pa.null()),
                 "change": pa.array([], type=pa.string())}))
        key_type = dict(zip(os_schema.names, os_schema.types))[key]
    out_schema = pa.schema([(key, key_type), ("change", pa.string())])
    if new_mat.count() <= config.BROADCAST_DUP_LIMIT:
        import polars as pl
        import ray
        import ray.data as rd

        tabs = [t for t in ray.get(new_mat.to_arrow_refs())
                if t.num_rows and key in t.column_names]
        if not tabs:
            # new side empty: every old row is 'removed'
            def all_removed(t: pa.Table) -> pa.Table:
                if key not in t.column_names:
                    return pa.Table.from_pylist([], schema=out_schema)
                return pa.table({key: t[key],
                                 "change": pa.array(["removed"] * t.num_rows,
                                                    type=pa.string())}) \
                    .cast(out_schema)
            return old.map_batches(all_removed, batch_format="pyarrow")
        # unify block schemas: from_items-style blocks type an all-null
        # column as null, which concat rejects against a typed sibling
        ns = new_mat.schema()
        target = pa.schema(list(zip(ns.names, ns.types)))
        new_tbl = pa.concat_tables([t.cast(target) for t in tabs])
        rename = {c: f"{c}__new" for c in compare_cols}
        new_tbl = new_tbl.rename_columns(
            [rename.get(c, c) for c in new_tbl.column_names])
        new_tbl = new_tbl.append_column(
            "__r", pa.array(np.ones(new_tbl.num_rows, dtype=np.int8)))
        ref = ray.put(new_tbl)

        def probe(t: pa.Table) -> pa.Table:
            if key not in t.column_names or t.num_rows == 0:
                return pa.Table.from_pylist([], schema=out_schema)
            nt = ray.get(ref) if not isinstance(ref, pa.Table) else ref
            m = pl.from_arrow(t.select([key] + compare_cols)).join(
                pl.from_arrow(nt), on=key, how="left",
                maintain_order="left").to_arrow()
            in_r = pc.is_valid(m["__r"]).to_numpy(zero_copy_only=False)
            changed = np.zeros(m.num_rows, dtype=bool)
            for c in compare_cols:
                a, b = m[c], m[f"{c}__new"]
                neq = pc.or_kleene(pc.not_equal(a, b),
                                   pc.xor(pc.is_null(a), pc.is_null(b)))
                changed |= pc.fill_null(neq, False).to_numpy(
                    zero_copy_only=False) & in_r
            lab = np.where(~in_r, "removed",
                           np.where(changed, "changed", "__m"))
            return pa.table({key: m[key],
                             "change": pa.array(lab, type=pa.string())}) \
                .cast(out_schema)

        classified = old.map_batches(
            probe, batch_format="pyarrow",
            batch_size=config.TEXT_BATCH_SIZE).materialize()
        # matched keys (changed AND unchanged — both present in new) stream
        # back ≤ |new| rows (old keys unique per CDC)
        seen = [t.filter(pc.not_equal(t["change"], "removed")).select([key])
                for t in ray.get(classified.to_arrow_refs())
                if t.num_rows and key in t.column_names]
        matched = (pa.concat_tables(seen)[key].combine_chunks()
                   if seen else pa.array([], type=key_type))
        added_keys = new_tbl[key].filter(
            pc.invert(pc.is_in(new_tbl[key], value_set=matched))) \
            .combine_chunks()
        added = pa.table({key: added_keys,
                          "change": pa.array(["added"] * len(added_keys),
                                             type=pa.string())}).cast(out_schema)
        diff = classified.map_batches(
            lambda t: (t.filter(pc.not_equal(t["change"], "__m"))
                       if "change" in t.column_names else
                       pa.Table.from_pylist([], schema=out_schema)),
            batch_format="pyarrow")
        return diff.union(rd.from_arrow(added))

    lcols = {c: f"{c}__old" for c in compare_cols}
    rcols = {c: f"{c}__new" for c in compare_cols}

    def mark(rename: dict, flag: str):
        def f(t: pa.Table) -> pa.Table:
            t = t.rename_columns([rename.get(c, c) for c in t.column_names])
            return t.append_column(flag, pa.array(
                np.ones(t.num_rows, dtype=np.int8)))
        return f

    # Materialized like new_mat (symmetric CDC sides; projection only, blocks
    # spillable; the join's shuffle reads the pinned blocks, no re-execution)
    # so emptiness is a metadata-only count — an EMPTY old side (initial CDC
    # run) yields no typed left blocks and Ray's hash join dies resolving the
    # key field ("No match or multiple matches for key field reference …").
    # A typed-empty-block union instead of this materialize is NOT safe: the
    # hash-shuffle aggregator races on which union branch's schema it sees
    # first and fails nondeterministically.
    l = old.select_columns([key] + compare_cols).map_batches(
        mark(lcols, "__l"), batch_format="pyarrow").materialize()
    if l.count() == 0:
        import ray.data as rd

        def all_added(t: pa.Table) -> pa.Table:
            if key not in t.column_names:
                return pa.Table.from_pylist([], schema=out_schema)
            return pa.table({key: t[key],
                             "change": pa.array(["added"] * t.num_rows,
                                                type=pa.string())}) \
                .cast(out_schema)
        return new_mat.map_batches(all_added, batch_format="pyarrow")
    # reuse the already-materialized selection — rebuilding from `new` would
    # re-execute its upstream pipeline and waste the pinned blocks
    r = new_mat.map_batches(mark(rcols, "__r"), batch_format="pyarrow")
    j = hash_join(l, r, on=key, join_type="full_outer",
                  num_partitions=num_partitions)

    # Empty/schema-less hash-join partitions (Ray emits them whenever distinct
    # keys < partitions) must produce blocks whose key type matches the data
    # blocks — key_type derived from old's schema above, never hardcoded (a
    # string key with a hardcoded int64 empty block fails the downstream
    # union/take_all; same class of bug as distinct_set_ops' classify).
    def classify(t: pa.Table) -> pa.Table:
        if key not in t.column_names or t.num_rows == 0:
            return pa.table({key: pa.array([], type=key_type),
                             "change": pa.array([], type=pa.string())})
        in_l = pc.is_valid(t["__l"]).to_numpy(zero_copy_only=False)
        in_r = pc.is_valid(t["__r"]).to_numpy(zero_copy_only=False)
        changed = np.zeros(t.num_rows, dtype=bool)
        both = in_l & in_r
        for c in compare_cols:
            a, b = t[f"{c}__old"], t[f"{c}__new"]
            neq = pc.or_kleene(
                pc.not_equal(a, b),
                pc.xor(pc.is_null(a), pc.is_null(b)))
            changed |= pc.fill_null(neq, False).to_numpy(
                zero_copy_only=False) & both
        lab = np.where(~in_l, "added", np.where(~in_r, "removed",
                                                np.where(changed, "changed",
                                                         "")))
        keep = lab != ""
        return pa.table({key: t[key].filter(pa.array(keep)),
                         "change": pa.array(lab[keep], type=pa.string())})

    return j.map_batches(classify, batch_format="pyarrow")
