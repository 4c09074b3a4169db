"""Deterministic sampling / rebalancing operators for training-data mixes.

The reference samples nothing (it validates whole tables); a 100 TB corpus
pipeline constantly re-weights domains and caps per-source contributions.
Both operators here are DETERMINISTIC (pure functions of the row's id), so a
resumed or retried run keeps exactly the same rows — the same property the
repo's hash-mod sampler (`_q_sample_mod`) and dedup winners guarantee.

- :func:`resample_weighted` — per-group keep rates via a Lehmer-hash
  uniformizer on the id column. One streaming ``map_batches`` filter, no
  shuffle: the rates map is a plain broadcast constant closed over the fn.
- :func:`token_budget_cap` — keep each group's rows (in a deterministic
  id order) until the group's running token sum exceeds a budget. One hash
  exchange on the group key, then one vectorized cumsum per partition.
  A group's rows must fit in a worker (same documented limit as
  ``joins.asof_join_prev``); salt pathological groups upstream.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# Lehmer / Park-Miller multiplier: (id * 48271) % 100000 is expressible in
# ANSI SQL (the oracle restates it verbatim) and uniform enough for rate
# sampling; ids must stay < 2^63 / 48271 ≈ 1.9e14 to avoid overflow —
# asserted below so a bigger id space fails loudly instead of silently
# diverging from the SQL oracle.
_LEHMER_A = 48271
_LEHMER_MOD = 100_000


def resample_weighted(ds, key_col: str, id_col: str,
                      rates: dict[str, float], default: float = 0.0):
    """Keep each row with probability ``rates[key]`` (deterministic in
    ``id_col``): row survives iff ``(id*48271) % 100000 < rate*100000``."""
    cuts = {k: int(round(r * _LEHMER_MOD)) for k, r in rates.items()}
    default_cut = int(round(default * _LEHMER_MOD))

    def f(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        assert ids.size == 0 or int(ids.max()) < (1 << 63) // _LEHMER_A, \
            "id space too large for overflow-free Lehmer hash"
        u = (ids * _LEHMER_A) % _LEHMER_MOD
        keys = t[key_col].to_numpy(zero_copy_only=False)
        cut = np.fromiter((cuts.get(k, default_cut) for k in keys),
                          dtype=np.int64, count=len(keys))
        return t.filter(pa.array(u < cut))

    return ds.map_batches(f, batch_format="pyarrow")


def token_budget_cap(ds, key_col: str, id_col: str, tokens_col: str,
                     budget: int, nparts: int = 16):
    """Cap each group's total ``tokens_col`` at ``budget``: order the group
    by ``id_col`` ascending and keep rows while the running (inclusive)
    token sum stays ≤ budget. SQL parity: ``QUALIFY sum(tokens) OVER
    (PARTITION BY key ORDER BY id) <= budget``."""
    from data_quality_framework_ray.pipelines.exchange import (part_shuffle,
                                                               schema_map)

    smap = schema_map(ds)
    if not smap:  # empty, schemaless input: the cap of nothing is nothing
        return ds
    out_schema = pa.schema(list(smap.items()))

    def kernel(part: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(part).sort([key_col, id_col])
        run = (df.select(pl.col(tokens_col).cum_sum().over(key_col)
                         .alias("__run"))["__run"].to_numpy())
        # cast back: polars round-trips promote string→large_string, which
        # would mix block schemas with empty_safe's normalized empty blocks
        return df.to_arrow().filter(pa.array(run <= budget)).cast(out_schema)

    return part_shuffle(ds, key_col, kernel, out_schema, nparts)
