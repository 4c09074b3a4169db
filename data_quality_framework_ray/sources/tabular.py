"""Format-agnostic tabular source: parquet / CSV / JSONL behind one call.

The reference reads Hive-backed tables only (/root/reference/core/
data_fetcher.py); a complete engine meets users at whatever format the data
landed in. ``read_table`` fronts Ray Data's native readers with a uniform
(columns, expected_schema) contract:

- parquet: pruned at the read (``columns=``) — bytes never leave storage;
- CSV: Arrow CSV reader with explicit per-column types (no type sniffing —
  sniffed schemas drift between files at scale) + include_columns pruning;
- JSONL: Arrow JSON reader with an explicit schema;
- ORC: Ray Data has no native reader, so files fan out as one map task per
  file (the repo's per-fragment pattern) and each task reads via
  ``pyarrow.orc`` with ``columns=`` pruning — stripes for unselected
  columns never leave storage, and per-file tasks keep the read
  distributed and resumable at any file count.

All four return a streaming ``ray.data.Dataset`` whose schema is cast to
``expected_schema`` column order/types, so downstream stages are
format-blind.
"""

from __future__ import annotations

import pyarrow as pa


def read_table(path: str, *, fmt: str = "parquet",
               columns: list[str] | None = None,
               expected_schema: pa.Schema | None = None):
    import ray.data as rd

    if fmt == "parquet":
        ds = rd.read_parquet(path, columns=columns)
    elif fmt == "csv":
        from pyarrow import csv as pacsv

        # Arrow's CSV writer renders null as an unquoted empty field and a
        # real empty string as a quoted one; mirror that on the way back in
        # so null round-trips (strings_can_be_null + quoted exemption).
        convert = pacsv.ConvertOptions(
            strings_can_be_null=True,
            quoted_strings_can_be_null=False,
        )
        if expected_schema is not None:
            convert.column_types = {f.name: f.type for f in expected_schema}
            if columns:
                convert.include_columns = columns
        elif columns:
            convert.include_columns = columns
        ds = rd.read_csv(path, convert_options=convert)
    elif fmt == "jsonl":
        from pyarrow import json as pajson

        parse = None
        if expected_schema is not None:
            parse = pajson.ParseOptions(explicit_schema=expected_schema)
        ds = rd.read_json(path, parse_options=parse)
        if columns:
            ds = ds.select_columns(columns)
    elif fmt == "orc":
        import glob as _glob
        import os as _os

        paths = (sorted(_glob.glob(_os.path.join(path, "*.orc")))
                 if _os.path.isdir(path) else [path])
        if not paths:
            raise ValueError(f"no .orc files under: {path}")
        want = columns

        def _read_orc(b: pa.Table) -> pa.Table:
            from pyarrow import orc as paorc

            return pa.concat_tables(
                [paorc.read_table(p, columns=want)
                 for p in b["path"].to_pylist()])

        ds = rd.from_items([{"path": p} for p in paths],
                           override_num_blocks=len(paths)) \
               .map_batches(_read_orc, batch_format="pyarrow",
                            batch_size=None)
    else:
        raise ValueError(f"unknown format: {fmt}")

    if expected_schema is not None:
        # conform to the PRUNED projection when columns= was also given —
        # the schema describes the full table, the read only carries a subset
        names = [f.name for f in expected_schema
                 if columns is None or f.name in columns]

        def conform(b: pa.Table) -> pa.Table:
            return b.select(names).cast(
                pa.schema([expected_schema.field(n) for n in names]))

        ds = ds.map_batches(conform, batch_format="pyarrow")
    return ds
