"""Full quality-check suite: the reference's per-table lifecycle
(/root/reference/main.py:117-212 process_single_table +
core/quality_checks.py:1156-1227 run_all_checks) as one composable call, plus
the DEV↔PROD comparison and the run report the reference printed/emailed
(console reporter /root/reference/reporting/console_reporter.py:17-83, JSON
sink /root/reference/utils/helpers.py:13-46).

Checks are enable/disable-able per the reference's settings flags
(/root/reference/config/settings.py:119-154).
"""

from __future__ import annotations

import datetime as dt
import json
import os
import time

from data_quality_framework_ray.pipelines import expectations as E
from data_quality_framework_ray.state.history import MetricsHistory

ALL_CHECKS = ("schema", "nulls", "row_count", "freshness", "duplicates",
              "integer_valued")


def run_quality_suite(ds, *, table: str, expected_schema: dict[str, str] | None = None,
                      freshness_column: str | None = None,
                      as_of: dt.date | None = None,
                      integer_columns: list[str] | None = None,
                      history: MetricsHistory | None = None,
                      min_rows: int | None = None,
                      enabled: tuple[str, ...] = ALL_CHECKS,
                      urgency_buckets: tuple[tuple[float, str], ...] | None = None) -> dict:
    """Run every enabled check against a Dataset; returns
    {results: [check dicts], score: {...}} (reference result-dict shape).
    ``expected_schema`` falls back to the runtime schema registry
    (expectations.register_schema); ``urgency_buckets`` = per-table override."""
    if expected_schema is None:
        expected_schema = E.get_schema(table)
    results: list[dict] = []
    schema = ds.schema().base_schema if hasattr(ds.schema(), "base_schema") else None
    if schema is None:
        import pyarrow as pa

        names = ds.schema().names
        types = ds.schema().types
        schema = pa.schema(list(zip(names, types)))

    if "schema" in enabled and expected_schema:
        results.append(E.check_schema(schema, expected_schema, table))
    if "nulls" in enabled:
        results.extend(E.check_nulls(ds, table=table))
    if "row_count" in enabled:
        hist = None
        if history is not None:
            hist = history.recent_counts(table)
        results.append(E.check_row_count(ds.count(), table, min_rows=min_rows,
                                         history_desc=hist))
    if "freshness" in enabled and freshness_column:
        results.append(E.check_freshness(ds, freshness_column, table, as_of=as_of))
    if "duplicates" in enabled:
        results.append(E.check_duplicates(ds, table))
    if "integer_valued" in enabled:
        for col in integer_columns or []:
            results.append(E.check_integer_valued(ds, col, table))

    return {"results": results,
            "score": E.score_results(results, urgency_buckets=urgency_buckets)}


def compare_environments(dev_counts: dict[str, int], prod_counts: dict[str, int]) -> list[dict]:
    """DEV ≤ PROD per table (reference /root/reference/main.py:214-268)."""
    return [E.check_env_comparison(dev_counts.get(t, 0), prod_counts.get(t, 0), t)
            for t in sorted(set(dev_counts) | set(prod_counts))]


def write_run_report(out_dir: str, suite_outputs: dict[str, dict],
                     run_id: str | None = None,
                     email_config: dict | None = None,
                     metadata_config: dict | None = None) -> str:
    """JSON run report + console summary + markdown report; optionally an
    email notification (the reference's JSON/PDF/email sink trio —
    reporting.py holds the markdown/email implementations)."""
    run_id = run_id or time.strftime("run_%Y%m%d_%H%M%S")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"quality_report_{run_id}.json")
    doc = {"run_id": run_id, "generated_at": time.time(),
           "tables": {t: {"score": s["score"],
                          "results": s["results"]} for t, s in suite_outputs.items()}}
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f, indent=1, default=str)
    os.replace(tmp, path)
    for t, s in suite_outputs.items():
        sc = s["score"]
        print(f"[{run_id}] {t}: {sc['n_passed']}/{sc['n_checks']} checks passed, "
              f"score {sc['overall_score']:.1f} → {sc['urgency']}")

    from data_quality_framework_ray.pipelines import reporting

    all_results = [r for s in suite_outputs.values() for r in s["results"]]
    if email_config:
        # send_report writes the markdown report itself (once) and attaches it
        reporting.EmailNotifier(email_config).send_report(
            all_results, run_id, report_dir=out_dir)
    else:
        reporting.write_report(out_dir, all_results, run_id)
    if metadata_config:
        # external catalog push (no-op transport + JSONL transcript by
        # default — the reference ships its own integration disabled)
        reporting.MetadataPush({"outbox_dir": out_dir, **metadata_config}) \
            .push(all_results, run_id)
    return path
