"""Reference-schema validation fixtures (FIXTURES.md §3/§4).

A ``personnes``-style table matching the reference's simplest declared schema
(/root/reference/config/schemas.py:72-79) with planted violations for every
expectation, plus seeded metrics history for the dynamic-threshold path.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pyarrow as pa

PERSONNES_EXPECTED_SCHEMA = {
    "date_insertion": "datetime",
    "nom": "string",
    "prenom": "string",
    "date_de_naissance": "datetime",
    "age": "int",
    "profession": "string",
}


def personnes_table(n: int = 500, seed: int = 42, *,
                    as_of: dt.date | None = None,
                    fresh: bool = True,
                    all_null_col: bool = True,
                    empty_str_col: bool = True,
                    dup_rows: int = 5,
                    age_as_float_with_fraction: bool = False,
                    drop_column: str | None = None,
                    extra_column: bool = False) -> pa.Table:
    rng = np.random.default_rng(seed)
    as_of = as_of or dt.date(2026, 1, 15)
    yesterday = as_of - dt.timedelta(days=1)
    base_day = dt.datetime.combine(yesterday if fresh else as_of - dt.timedelta(days=7),
                                   dt.time(12, 0))
    ins = [base_day - dt.timedelta(days=int(d))
           for d in rng.integers(0, 30, size=n)]
    ins[0] = base_day  # ensure max() lands exactly on the target day
    noms = [f"nom_{i}" for i in range(n)]
    prenoms = [None] * n if all_null_col else [f"p_{i}" for i in range(n)]
    prof = ["  "] * n if empty_str_col else [f"job_{i % 7}" for i in range(n)]
    naiss = [dt.datetime(1950 + int(rng.integers(0, 60)), 1 + int(rng.integers(0, 12)), 1)
             for _ in range(n)]
    if age_as_float_with_fraction:
        age = pa.array(rng.uniform(18, 90, size=n).round(2), type=pa.float64())
    else:
        age = pa.array(rng.integers(18, 90, size=n), type=pa.int32())

    cols = {"date_insertion": pa.array(ins, type=pa.timestamp("us")),
            "nom": pa.array(noms, type=pa.string()),
            "prenom": pa.array(prenoms, type=pa.string()),
            "date_de_naissance": pa.array(naiss, type=pa.timestamp("us")),
            "age": age,
            "profession": pa.array(prof, type=pa.string())}
    if drop_column:
        cols.pop(drop_column)
    if extra_column:
        cols["unexpected"] = pa.array([0] * n, type=pa.int64())
    t = pa.table(cols)
    if dup_rows > 0:
        t = pa.concat_tables([t, t.slice(1, dup_rows)])
    return t


def seeded_history(base: int = 1000, increment: int = 100, n_runs: int = 4,
                   jitter: int = 0) -> list[int]:
    """Row-count history, newest first (the dynamic-threshold input shape)."""
    counts = [base + i * increment + (0 if not jitter else (-1) ** i * jitter)
              for i in range(n_runs)]
    return list(reversed(counts))
