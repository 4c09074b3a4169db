"""Pin exchange.collect_blocks: the probe-free replacement for
Dataset.to_arrow_refs() (which at this Ray version re-fetches schema with a
limit=1 re-run of the whole lazy lineage AFTER execution — wasted work per
collect, plus the fatal TaskManager cancel race documented on the helper)."""

from __future__ import annotations

import pyarrow as pa


def _probe_counter():
    """Patch Dataset.schema to count fetch-if-missing probes; returns
    (list, restore_fn)."""
    import ray.data.dataset as dmod

    orig = dmod.Dataset.schema
    probes: list[int] = []

    def traced(self, fetch_if_missing: bool = True):
        if (self._plan.schema(fetch_if_missing=False) is None
                and fetch_if_missing):
            probes.append(1)
        return orig(self, fetch_if_missing)

    dmod.Dataset.schema = traced
    return probes, lambda: setattr(dmod.Dataset, "schema", orig)


def test_collect_blocks_no_schema_probe_and_matches_data(ray_session):
    import ray.data as rd

    from data_quality_framework_ray.pipelines.exchange import collect_blocks

    base = rd.from_arrow(pa.table({"k": list(range(100)),
                                   "s": [str(i) for i in range(100)]}))
    # lazy MapBatches lineage: exactly the shape whose to_arrow_refs()
    # schema re-probe launched a limit=1 re-run
    lazy = base.map_batches(
        lambda t: t.append_column("k2", pa.compute.add(t["k"], 1)),
        batch_format="pyarrow")

    probes, restore = _probe_counter()
    try:
        tabs, schema = collect_blocks(lazy)
    finally:
        restore()
    assert not probes, "collect_blocks must not trigger a schema probe"
    got = pa.concat_tables(tabs).sort_by("k")
    assert got.num_rows == 100
    assert got.column_names == ["k", "s", "k2"]
    assert got["k2"].to_pylist() == list(range(1, 101))
    assert isinstance(schema, pa.Schema) and set(schema.names) == {"k", "s", "k2"}


def test_collect_blocks_required_drops_schemaless_empty_blocks(ray_session):
    """Ray's hash aggregate emits SCHEMA-LESS empty blocks for hash
    partitions with no rows (distinct keys < partitions); ``required``
    must drop them like collect_partials always did."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from data_quality_framework_ray.pipelines.exchange import collect_blocks

    ds = rd.from_arrow(pa.table({"k": ["a", "a", "b"]})) \
        .groupby("k").aggregate(Count(alias_name="n"))
    tabs, schema = collect_blocks(ds, required="k")
    got = pa.concat_tables(tabs).sort_by("k")
    assert got["k"].to_pylist() == ["a", "b"]
    assert got["n"].to_pylist() == [2, 1]
    # the widest observed schema carries the real columns even when some
    # bundles were zero-column empties
    assert schema is not None and "k" in schema.names


def test_collect_blocks_empty_dataset(ray_session):
    import ray.data as rd

    from data_quality_framework_ray.pipelines.exchange import collect_blocks

    ds = rd.from_arrow(pa.table({"k": pa.array([], type=pa.int64())}))
    tabs, schema = collect_blocks(ds)
    assert tabs == []
    # schema may be None (no non-empty bundle) or the typed empty schema;
    # both are handled by callers' typed-empty fallbacks
    if schema is not None:
        assert schema.field("k").type == pa.int64()


def test_join_empty_side_all_join_types(ray_session):
    """Pin patch_join_empty_side_schema_broadcast: Ray 2.49.2's
    Dataset.join crashes (ArrowInvalid, zero-column side) when one side is
    globally empty, because _shuffle_block early-returns on empty blocks
    BEFORE the send_empty_blocks schema fan-out. The patch must restore SQL
    semantics for every join type on empty sides."""
    import ray.data as rd

    left = pa.table({"k": pa.array([1, 2], pa.int64()),
                     "v": pa.array([10, 20], pa.int64())})
    empty = pa.table({"k": pa.array([], pa.int64()),
                      "w": pa.array([], pa.int64())})

    def run(l_tbl, r_tbl, jt):
        l = rd.from_arrow(l_tbl)
        r = rd.from_arrow(r_tbl)
        return l.join(r, jt, 4, on=("k",)).take_all()

    assert run(left, empty, "inner") == []
    lo = sorted(run(left, empty, "left_outer"), key=lambda x: x["k"])
    assert [(x["k"], x["v"], x["w"]) for x in lo] == [(1, 10, None),
                                                      (2, 20, None)]
    assert run(left, empty, "right_outer") == []
    fo = sorted(run(left, empty, "full_outer"), key=lambda x: x["k"])
    assert [(x["k"], x["v"], x["w"]) for x in fo] == [(1, 10, None),
                                                      (2, 20, None)]
    # symmetric: empty LEFT side
    ro = sorted(run(empty.rename_columns(["k", "v"]),
                    left.rename_columns(["k", "w"]), "right_outer"),
                key=lambda x: x["k"])
    assert [(x["k"], x["v"], x["w"]) for x in ro] == [(1, None, 10),
                                                      (2, None, 20)]
    # both sides empty
    assert run(empty, empty.rename_columns(["k", "z"]), "inner") == []
