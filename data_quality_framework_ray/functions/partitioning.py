"""Skew handling: salted aggregation and key-salted repartitioning.

North-rule mandate (BASELINE.json): the clip table is deliberately skewed by
codec/language (~70 % pcm16, ~60 % en — FIXTURES.md §1). A bare
``groupby(codec)`` would serialize the hot key into one reducer. The salted
pattern splits every hot key across ``n_salts`` sub-keys for the wide partial
stage, then combines the (tiny) per-salt partials.

Note which shuffles in this engine actually need it: the dedup exchanges key
on uniform 64-bit content hashes (inherently unskewed), and the metric
groupbys run over bounded-cardinality PARTIALS — so the flagship needs no
salting today. This utility exists for aggregations whose key is a skewed
*data* attribute (codec, lang, customer…) at full-row cardinality.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def add_salt(ds, key_cols: list[str], n_salts: int = 16, *,
             salt_col: str = "_salt", id_col: str | None = None):
    """Append a deterministic salt in [0, n_salts): hash of the row id when
    given (stable across retries/resume), else a per-batch row index mod."""

    def f(batch: pa.Table) -> pa.Table:
        if id_col is not None:
            import polars as pl

            s = pl.from_arrow(pa.table({"i": batch[id_col]}))["i"]
            salt = (s.hash(seed=99) % n_salts).to_numpy().astype(np.int32)
        else:
            salt = (np.arange(batch.num_rows) % n_salts).astype(np.int32)
        return batch.append_column(salt_col, pa.array(salt))

    return ds.map_batches(f, batch_format="pyarrow")


def salted_aggregate(ds, key_cols: list[str], aggs: dict[str, str],
                     n_salts: int = 16, id_col: str | None = None):
    """Skew-safe grouped aggregation: groupby (key, salt) → combine per-salt
    partials with a second tiny groupby on key alone.

    ``aggs`` maps column → 'sum' | 'count' | 'min' | 'max'. Returns a Dataset
    of one row per key combination. The first shuffle spreads each hot key
    over n_salts reducers; the second shuffle moves only
    |keys| × n_salts partial rows.
    """
    from ray.data.aggregate import Count, Max, Min, Sum

    def make(stage2: bool):
        out = []
        for col, kind in aggs.items():
            name = f"{kind}_{col}" if kind != "count" else "count"
            src = name if stage2 else col
            if kind == "sum" or (stage2 and kind == "count"):
                out.append(Sum(src, alias_name=name))
            elif kind == "count":
                out.append(Count(alias_name=name))
            elif kind == "min":
                out.append(Min(src, alias_name=name))
            elif kind == "max":
                out.append(Max(src, alias_name=name))
            else:
                raise ValueError(kind)
        return out

    salted = add_salt(ds, key_cols, n_salts, id_col=id_col)
    stage1 = salted.groupby(key_cols + ["_salt"]).aggregate(*make(False))
    stage2 = stage1.groupby(key_cols).aggregate(*make(True))

    def strip(batch: pa.Table) -> pa.Table:
        # second-stage Sum over an aliased column yields sum(<alias>) — rename
        renames = {}
        for c in batch.column_names:
            if c.startswith("sum(") and c.endswith(")"):
                renames[c] = c[4:-1]
        return batch.rename_columns([renames.get(c, c) for c in batch.column_names])

    return stage2.map_batches(strip, batch_format="pyarrow")


def repartition_salted(ds, key_cols: list[str], n_salts: int = 16,
                       id_col: str | None = None):
    """Co-locate by (key, salt) without serializing hot keys into one block
    (the pre-heavy-stage layout step from SURVEY §4.2.2)."""
    salted = add_salt(ds, key_cols, n_salts, id_col=id_col)
    return salted.repartition(n_salts * max(len(key_cols), 1) * 4, shuffle=True)
