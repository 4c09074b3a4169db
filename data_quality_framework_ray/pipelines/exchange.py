"""Shared shuffle/exchange primitives.

`part_shuffle` is the repo's join-free exchange: hash-partition a Dataset on
one key column and run a vectorized kernel once per PARTITION. It exists
because, at this Ray version, (a) the sort-based `groupby().aggregate()` on
string keys measured 14–22 s where the partitioned combine takes ~1 s, and
(b) `Dataset.join` flakes on the schema-less empty blocks Ray emits for hash
partitions that happen to receive no rows. Used by dedup's connected
components, the grouped-quantile scale path, and the phase-B winner join
fallback.
"""

from __future__ import annotations

import pyarrow as pa


def schema_map(ds) -> "dict[str, pa.DataType]":
    """{name: type} for a Dataset's schema — {} when the dataset is EMPTY
    and reports schema None (e.g. a repartition of zero rows). Callers use
    ``.get(col, pa.null())`` so empty inputs yield empty TYPED results
    instead of AttributeError on ``.names`` (empty-side hazard found by the
    randomized oracle sweeps)."""
    s = ds.schema()
    s = getattr(s, "base_schema", s)
    if s is None:
        return {}
    return dict(zip(s.names, s.types))


def collect_blocks(ds, required: str | None = None):
    """All of a Dataset's blocks as Arrow tables plus the stream's schema,
    WITHOUT ``Dataset.to_arrow_refs()``. At this Ray version (2.49)
    ``to_arrow_refs()`` calls ``schema(fetch_if_missing=True)`` AFTER the
    consuming execution; on a lazy lineage the plan's schema cache is gone
    by then, so every collect launches a fresh ``limit=1`` re-run of the
    WHOLE upstream pipeline (measured 0.2–0.9 s of pure waste per query at
    sf0.1) — and the probe's early-termination task cancellation can trip
    Ray's FATAL TaskManager check (``task_manager.cc:930 'Tried to complete
    task that was not pending'``), which killed a full sf0.1 query sweep
    mid-run by aborting the driver process. Iterating the internal ref
    bundles executes exactly once and carries the schema in-band.

    Empty blocks are dropped; with ``required`` set, Ray's SCHEMA-LESS empty
    aggregate blocks (see ``empty_safe``) are dropped too. Returns
    ``(tables, pa.Schema | None)`` — the schema is the widest one observed
    on the stream (empty hash partitions report a zero-column schema)."""
    import ray
    from ray.data.block import BlockAccessor

    refs: list = []
    schema = None
    for bundle in ds.iter_internal_ref_bundles():
        refs.extend(bundle.block_refs)
        bs = getattr(bundle.schema, "base_schema", bundle.schema)
        if isinstance(bs, pa.Schema) and (schema is None
                                          or len(bs.names) > len(schema.names)):
            schema = bs
    tabs = []
    for b in ray.get(refs):
        if not isinstance(b, pa.Table):
            b = BlockAccessor.for_block(b).to_arrow()
        if b.num_rows and (required is None or required in b.column_names):
            tabs.append(b)
    return tabs, schema


def collect_partials(parts, required: str,
                     empty_schema: pa.Schema) -> pa.Table:
    """One driver-local Arrow table from a partials Dataset: zero-copy block
    refs via ``collect_blocks`` (no ``to_arrow_refs`` schema re-probe),
    schema-less empty blocks dropped (``required`` column must be present —
    see ``empty_safe``), typed empty fallback. The shared front half of every
    bounded driver fold (``stats._fold_partials``, ``dedup._fold_dup_partials``,
    ``stats.grouped_quantiles_counts``)."""
    tabs, _ = collect_blocks(parts, required=required)
    if not tabs:
        return pa.Table.from_pylist([], schema=empty_schema)
    return pa.concat_tables(tabs, promote_options="default")


def empty_safe(t: pa.Table, required: str, schema: pa.Schema) -> pa.Table:
    """Ray's hash aggregate emits SCHEMA-LESS empty blocks for hash
    partitions that received no rows (distinct keys < partitions); any
    downstream column access raises KeyError and Acero joins reject the
    block. Normalize such blocks to the expected schema."""
    if required not in t.column_names:
        return pa.Table.from_pylist([], schema=schema)
    return t


def join_partitions(requested: int | None = None) -> int:
    """Join/shuffle partition count sized to the cluster: the Join operator
    spins up one hash-aggregator actor per partition, and asking for more
    actors than CPUs deadlocks a small cluster (measured: 64 partitions hang
    a 4-CPU test session). One partition per CPU, capped at 64 — raise the
    cap per-call for >64-core clusters with skewed keys."""
    if requested:
        return requested
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(2, min(64, cpus))


def part_shuffle(ds, key_col: str, kernel, out_schema: pa.Schema,
                 nparts: int):
    """Hash-partition on ``key_col`` (stable polars hash — works for string
    and int keys alike), run the vectorized ``kernel`` once per PARTITION
    via groupby(__part).map_groups, and normalize the schema-less empty
    blocks Ray emits for empty partitions."""
    import polars as pl

    def part_col(t: pa.Table) -> pa.Table:
        part = (pl.from_arrow(t[key_col]).rename("k").hash(seed=7)
                % nparts).cast(pl.Int64)
        return t.append_column("__part", part.to_arrow())

    def run(part: pa.Table) -> pa.Table:
        return kernel(part.drop_columns(["__part"]))

    return (ds.map_batches(part_col, batch_format="pyarrow")
            .groupby("__part").map_groups(run, batch_format="pyarrow")
            .map_batches(lambda t: empty_safe(
                t, out_schema.names[-1], out_schema), batch_format="pyarrow"))


def data_partitions(ds, requested: int | None = None) -> int:
    """Partition count sized to the DATA like hash_join's rule: one per
    ~64 MB of input (read metadata estimate), clamped to [2, cluster CPUs].
    Small inputs must not pay per-partition actor/task spawn for partitions
    they don't need; huge inputs hit the CPU cap and stream."""
    if requested:
        return requested
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    try:
        nbytes = ds.size_bytes() or 0
    except Exception:
        nbytes = 0
    by_data = max(2, nbytes // (64 << 20)) if nbytes else cpus
    return int(max(2, min(cpus, by_data)))


def patch_join_empty_side_schema_broadcast():
    """Fix Ray 2.49.2's ``Dataset.join`` crash when one side is GLOBALLY
    empty (``ArrowInvalid: No match ... for key field reference ... on
    right side of the join`` from ``HashShuffleAggregator.finalize``).

    Root cause (ray/data/_internal/execution/operators/hash_shuffle.py:223):
    ``_shuffle_block`` early-returns on a zero-row block BEFORE the
    ``send_empty_blocks`` schema-broadcast fan-out, while the operator still
    marks the input sequence's schema as broadcast — so when a side's only
    block(s) are empty, every aggregator builds that side as a zero-COLUMN
    table and pyarrow's join cannot resolve the key field. (Sparse
    partitions are fine: any non-empty block fans out typed empty shards to
    the partitions it misses.) Same latent bug when the FIRST block of a
    side is empty and key cardinality < num_partitions.

    The patch wraps ``_shuffle_block``: a zero-row block with
    ``send_empty_blocks=True`` broadcasts typed empty shards to ALL
    partitions (exactly what the flag is documented to do); every other
    call delegates to the original. Applied once at import of this module —
    all Dataset.join paths (hash_join, semi_join fallback, snapshot_diff
    large-large, dedup winner join) inherit it. Pinned by
    tests/test_exchange.py::test_join_empty_side_all_join_types."""
    import ray
    from ray.data._internal.execution.operators import hash_shuffle as _hs

    if getattr(_hs._shuffle_block, "__dqfr_empty_side_patch__", False):
        return
    _orig = _hs._shuffle_block._function

    def _shuffle_block_schemaful(block, input_index, key_columns, pool,
                                 block_transformer=None,
                                 send_empty_blocks=False,
                                 override_partition_id=None):
        if send_empty_blocks:
            b = block
            if block_transformer is not None:
                b = block_transformer(b)
            b = _hs.TableBlockAccessor.try_convert_block_type(
                b, block_type=_hs.BlockType.ARROW)
            if b.num_rows == 0:
                stats = _hs.BlockExecStats.builder()
                shard = _hs._create_empty_table(b.schema)
                waits = []
                for pid in range(pool.num_partitions):
                    agg = pool.get_aggregator_for_partition(pid)
                    ref = ray.put(shard)
                    waits.append(agg.submit.remote(input_index, pid, ref))
                # same barrier as the original: the task completes only
                # once every aggregator accepted its shard
                ray.wait(waits, num_returns=len(waits))
                meta = _hs.BlockAccessor.for_block(b).get_metadata(
                    exec_stats=stats.build())
                return meta, {}
        return _orig(block, input_index, key_columns, pool,
                     block_transformer=block_transformer,
                     send_empty_blocks=send_empty_blocks,
                     override_partition_id=override_partition_id)

    remote_fn = ray.remote(_shuffle_block_schemaful)
    remote_fn.__dqfr_empty_side_patch__ = True
    _hs._shuffle_block = remote_fn


patch_join_empty_side_schema_broadcast()
