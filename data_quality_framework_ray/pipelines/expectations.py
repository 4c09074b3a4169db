"""The reference's quality checks re-expressed as Ray Data expectations.

Check-for-check parity with /root/reference/core/quality_checks.py:1156-1227
(schema, types, nulls, row count incl. dynamic threshold, freshness,
duplicates) plus the DEV≤PROD comparison (/root/reference/main.py:214-268).
Great Expectations is replaced by plain Arrow/Dataset computation; results
keep the reference's result-dict shape ({check, table, passed, details,
dimension}, e.g. /root/reference/core/quality_checks.py:222-235) so scoring
(metrics-side) is semantics-identical.

Execution discipline: every data-touching check is a ``map_batches`` partial
followed by a tiny global reduce — a check never materializes the table and
never shuffles more than per-batch counters (the duplicate check ships two
int64 hashes per row, the worst case).
"""

from __future__ import annotations

import datetime as dt
from typing import Any

import numpy as np
import pyarrow as pa

from data_quality_framework_ray import config
from data_quality_framework_ray.state.history import dynamic_row_count_threshold


def _result(check: str, table: str, passed: bool, dimension: str,
            details: dict[str, Any], column: str | None = None) -> dict:
    return {"check": check, "table": table, "column": column,
            "passed": bool(passed), "dimension": dimension, "details": details}


# ---------------- schema / types (metadata-only, no scan) ----------------

_TYPE_PREDICATES = {
    "int": pa.types.is_integer,
    "float": pa.types.is_floating,
    "string": pa.types.is_string,
    "datetime": lambda t: pa.types.is_timestamp(t) or pa.types.is_date(t),
    "bool": pa.types.is_boolean,
    "binary": pa.types.is_binary,
    "decimal": pa.types.is_decimal,
    "array": pa.types.is_list,
    "map": pa.types.is_map,
    "struct": pa.types.is_struct,
}


def check_schema(schema: pa.Schema, expected: dict[str, str], table: str = "") -> dict:
    """Missing/extra columns + canonical-type match, case-insensitive names
    (reference normalize_hive_type + set math,
    /root/reference/core/quality_checks.py:113-212). ``expected`` maps column
    → canonical type name (keys of _TYPE_PREDICATES)."""
    actual = {n.lower(): schema.field(n).type for n in schema.names}
    exp = {k.lower(): v for k, v in expected.items()}
    missing = sorted(set(exp) - set(actual))
    extra = sorted(set(actual) - set(exp))
    mismatched = {}
    for col in set(exp) & set(actual):
        pred = _TYPE_PREDICATES.get(exp[col])
        if pred is None or not pred(actual[col]):
            mismatched[col] = {"expected": exp[col], "actual": str(actual[col])}
    passed = not missing and not extra and not mismatched
    return _result("schema", table, passed, "validity",
                   {"missing": missing, "extra": extra, "mismatched": mismatched})


# ---------------- nulls / empties ----------------

def _null_partials(batch: pa.Table, columns: list[str]) -> pa.Table:
    import pyarrow.compute as pc

    out = {"rows": [batch.num_rows]}
    for c in columns:
        col = batch[c]
        out[f"{c}__nulls"] = [col.null_count]
        if pa.types.is_string(col.type):
            trimmed = pc.utf8_trim_whitespace(col.combine_chunks().fill_null("x"))
            out[f"{c}__empty"] = [int(pc.sum(pc.equal(pc.utf8_length(trimmed), 0)).as_py() or 0)]
        else:
            out[f"{c}__empty"] = [0]
    return pa.table(out)


def check_nulls(ds, columns: list[str] | None = None, table: str = "",
                max_null_fraction: float = config.NULL_FRACTION_MAX) -> list[dict]:
    """Per-column null + empty-string fractions; pass iff
    nulls/rows <= max_null_fraction (reference mostly-semantics,
    /root/reference/core/quality_checks.py:448-486; empty-string detector
    :465-467). One streaming pass for ALL columns."""
    from functools import partial

    from data_quality_framework_ray.pipelines.exchange import schema_map
    columns = columns or list(schema_map(ds))
    partials = ds.map_batches(partial(_null_partials, columns=columns),
                              batch_format="pyarrow")
    totals = partials.sum(["rows"] + [f"{c}__{k}" for c in columns for k in ("nulls", "empty")])
    if totals is None:  # zero input rows: Dataset.sum returns None, not 0s
        totals = {f"sum({c}__{k})": 0 for c in columns
                  for k in ("nulls", "empty")} | {"sum(rows)": 0}
    rows = max(totals["sum(rows)"], 1)
    out = []
    for c in columns:
        nulls = totals[f"sum({c}__nulls)"]
        empty = totals[f"sum({c}__empty)"]
        frac = nulls / rows
        out.append(_result("nulls", table, frac <= max_null_fraction, "completeness",
                           {"rows": rows, "nulls": int(nulls), "null_fraction": frac,
                            "empty_strings": int(empty)}, column=c))
    return out


# ---------------- row count (static + dynamic threshold) ----------------

def check_row_count(count: int, table: str = "", min_rows: int | None = None,
                    history_desc: list[int] | None = None) -> dict:
    """Static bound when ``min_rows`` given; else dynamic increment-trend
    threshold from history (reference
    /root/reference/core/quality_checks.py:516-700)."""
    if min_rows is not None:
        return _result("row_count", table, count >= min_rows, "completeness",
                       {"count": count, "min_rows": min_rows, "method": "static"})
    thr = dynamic_row_count_threshold(history_desc or [])
    lo, hi = thr["lo"], thr.get("hi")
    passed = count >= lo and (hi is None or count <= hi)
    return _result("row_count", table, passed, "completeness", {"count": count, **thr})


# ---------------- freshness ----------------

def check_freshness(ds, column: str, table: str = "",
                    as_of: dt.date | None = None) -> dict:
    """max(column) must fall on yesterday relative to ``as_of``
    (reference expect_column_max_to_be_between(yesterday, yesterday),
    /root/reference/core/quality_checks.py:756-783).

    String-typed date columns are accepted and parsed (the reference's
    type-check tolerates dateutil-parseable strings,
    /root/reference/core/quality_checks.py:354-365): for ISO-like formats
    lexicographic max == chronological max, so ``ds.max`` stays a cheap
    distributed aggregate and only the single max value is parsed."""
    as_of = as_of or dt.date.today()
    target = as_of - dt.timedelta(days=1)
    mx = ds.max(column)
    if isinstance(mx, str):
        import pandas as pd

        try:
            mx_date = pd.to_datetime(mx).date()
        except (ValueError, TypeError):
            return _result("freshness", table, False, "timeliness",
                           {"max": mx, "expected_date": str(target),
                            "error": "unparseable date string"})
    elif isinstance(mx, (int, float)):
        # epoch-encoded numeric columns are ambiguous (s vs ms vs µs) —
        # refuse loudly instead of failing forever indistinguishably from
        # genuinely stale data; callers should cast to timestamp first
        return _result("freshness", table, False, "timeliness",
                       {"max": str(mx), "expected_date": str(target),
                        "error": "numeric column: cast epoch values to a "
                                 "timestamp type before check_freshness"})
    else:
        mx_date = mx.date() if hasattr(mx, "date") else mx
    return _result("freshness", table, mx_date == target, "timeliness",
                   {"max": str(mx), "expected_date": str(target)})


# ---------------- duplicates ----------------

def _hashable_column(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """Any column → a string/binary column with equal-value ⟺ equal-string
    semantics, for full-row content hashing.

    list<string> uses a vectorized injective encoding — ``len:`` prefix +
    "\\x1f"-joined elements — ONLY when provably safe (no null lists, no
    null elements, no element containing the separator; the length prefix
    disambiguates [] vs [""] and nesting). Everything else falls back to a
    JSON stringification (slow path — exotic schemas only); a plain
    binary_join would collapse null-bearing lists together and alias
    ["a\\x1fb"] with ["a","b"]."""
    import pyarrow.compute as pc

    t = col.type
    if pa.types.is_string(t) or pa.types.is_binary(t):
        return col

    def _json_fallback() -> pa.Array:
        import json as _json

        return pa.array([_json.dumps(x, default=str, sort_keys=True)
                         for x in col.to_pylist()], type=pa.string())

    if pa.types.is_list(t) and pa.types.is_string(t.value_type):
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        vals = arr.values
        safe = (arr.null_count == 0 and vals.null_count == 0
                and not pc.any(pc.match_substring(vals, "\x1f")).as_py())
        if not safe:
            return _json_fallback()
        joined = pc.binary_join(arr, "\x1f")
        lens = pc.cast(pc.list_value_length(arr), pa.string())
        return pc.binary_join_element_wise(lens, joined, ":")
    try:
        return col.cast(pa.string())
    except (pa.lib.ArrowNotImplementedError, pa.lib.ArrowInvalid):
        return _json_fallback()


def _dup_partials(batch: pa.Table) -> pa.Table:
    import polars as pl

    from data_quality_framework_ray.functions.hashing import content_hash_128

    cols = [_hashable_column(batch[c]) for c in batch.column_names]
    h1, h2 = content_hash_128(*cols)
    df = pl.DataFrame({"h1": h1, "h2": h2})
    return df.group_by(["h1", "h2"]).agg(pl.len().alias("cnt")).to_arrow()


def check_duplicates(ds, table: str = "") -> dict:
    """dup_rows = count(*) − count(distinct full row); pass iff 0 (reference
    /root/reference/core/quality_checks.py:861-883). Full-row identity via
    128-bit content hash; shuffle carries (h1, h2, cnt) partials only."""
    from ray.data.aggregate import Sum

    partials = ds.map_batches(_dup_partials, batch_format="pyarrow")
    groups = partials.groupby(["h1", "h2"]).aggregate(Sum("cnt", alias_name="cnt"))

    def fold(t: pa.Table) -> pa.Table:
        # hash partitions with no keys emit SCHEMA-LESS empty blocks (the
        # `exchange.empty_safe` hazard) — normalize before touching "cnt"
        if "cnt" not in t.column_names:
            return pa.table({"dups": [0], "distinct": [0]})
        return pa.table(
            {"dups": [int(np.maximum(np.asarray(t["cnt"]) - 1, 0).sum())],
             "distinct": [t.num_rows]})

    agg = groups.map_batches(fold, batch_format="pyarrow") \
        .sum(["dups", "distinct"])
    dups = int(agg["sum(dups)"])
    return _result("duplicates", table, dups == 0, "uniqueness",
                   {"duplicate_rows": dups, "distinct_rows": int(agg["sum(distinct)"])})


# ---------------- cross-environment comparison ----------------

def check_env_comparison(dev_count: int, prod_count: int, table: str = "") -> dict:
    """DEV row count must not exceed PROD (reference rule
    /root/reference/main.py:240, config /root/reference/config/settings.py:157-161)."""
    return _result("dev_prod_comparison", table, dev_count <= prod_count, "consistency",
                   {"dev_count": dev_count, "prod_count": prod_count})


# ---------------- whole-number int test ----------------

def check_integer_valued(ds, column: str, table: str = "") -> dict:
    """A numeric column expected to be integer-typed passes when every value
    is whole (reference /root/reference/core/quality_checks.py:289-300)."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[column]
        if pa.types.is_integer(col.type):
            bad = 0
        else:
            arr = col.combine_chunks().cast(pa.float64())
            bad = int(pc.sum(pc.invert(pc.equal(arr, pc.floor(arr)))).as_py() or 0)
        return pa.table({"bad": [bad]})

    bad = int(ds.map_batches(partial, batch_format="pyarrow").sum("bad"))
    return _result("integer_valued", table, bad == 0, "validity",
                   {"non_integer_values": bad}, column=column)


# ---------------- scoring (reference A5/A6/A8) ----------------

def score_results(results: list[dict],
                  urgency_buckets: tuple[tuple[float, str], ...] | None = None) -> dict:
    """Pass-rate scores overall and per dimension + urgency bucket
    (reference /root/reference/storage/postgres_storage.py:236-400, :518-538).
    ``urgency_buckets`` overrides the default thresholds — the reference's
    per-table urgency overrides (/root/reference/config/settings.py:174-218)."""
    def score(rs):
        return 100.0 * sum(r["passed"] for r in rs) / max(len(rs), 1)

    dims = {}
    for r in results:
        dims.setdefault(r["dimension"], []).append(r)
    dim_scores = {d: score(rs) for d, rs in dims.items()}
    overall = score(results)
    urgency = "PASS"
    for bound, label in (urgency_buckets or config.URGENCY_BUCKETS):
        if overall < bound:
            urgency = label
            break
    return {"overall_score": overall, "dimension_scores": dim_scores,
            "urgency": urgency, "n_checks": len(results),
            "n_passed": sum(r["passed"] for r in results)}


# ---------------- schema registry (reference config/schemas.py:91-120) ----------------

SCHEMA_REGISTRY: dict[str, dict[str, str]] = {}


def register_schema(table: str, expected: dict[str, str]) -> None:
    """Runtime-extensible expected-schema registry (reference ``add_schema``,
    /root/reference/config/schemas.py:112-120)."""
    SCHEMA_REGISTRY[table.lower()] = dict(expected)


def get_schema(table: str) -> dict[str, str] | None:
    """(reference ``get_schema``, /root/reference/config/schemas.py:91-101)."""
    return SCHEMA_REGISTRY.get(table.lower())
