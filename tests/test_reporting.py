"""Markdown report + email notifier (reference parity: pdf_generator /
email_notifier content semantics) and the string-date freshness fallback."""

from __future__ import annotations

import datetime as dt
import email
import os

import pyarrow as pa


def _sample_results():
    return [
        {"check": "nulls", "table": "t1", "column": "a", "passed": True,
         "dimension": "completeness", "details": {"nulls": 0}},
        {"check": "nulls", "table": "t1", "column": "b", "passed": False,
         "dimension": "completeness", "details": {"nulls": 10}},
        {"check": "duplicates", "table": "t1", "column": None, "passed": True,
         "dimension": "uniqueness", "details": {}},
        {"check": "freshness", "table": "t2", "column": None, "passed": True,
         "dimension": "timeliness", "details": {}},
    ]


def test_statistics_and_status_tiers():
    from data_quality_framework_ray.pipelines import reporting as R

    stats = R.report_statistics(_sample_results())
    assert stats["total_checks"] == 4 and stats["passed_checks"] == 3
    assert stats["dimensions"]["completeness"] == {"passed": 1, "total": 2}
    assert len(stats["failed_details"]) == 1
    assert stats["failed_details"][0]["column"] == "b"

    # tiers at 100 / 90 / 70 (reference email_notifier.py:96-110)
    assert R.overall_status({"total_checks": 10, "passed_checks": 10})[0] == "EXCELLENT"
    assert R.overall_status({"total_checks": 10, "passed_checks": 9})[0] == "WARNING"
    assert R.overall_status({"total_checks": 10, "passed_checks": 7})[0] == "NEEDS ATTENTION"
    assert R.overall_status({"total_checks": 10, "passed_checks": 6})[0] == "CRITICAL"
    assert R.overall_status({"total_checks": 0, "passed_checks": 0})[0] == "CRITICAL"


def test_markdown_report_content(tmp_path):
    from data_quality_framework_ray.pipelines import reporting as R

    path = R.write_report(str(tmp_path), _sample_results(), run_id="r1")
    text = open(path).read()
    assert "# Data Quality Report — r1" in text
    assert "| completeness | 1 | 2 |" in text
    assert "FAIL nulls [b]" in text
    assert "PASS duplicates" in text


def test_email_notifier_file_outbox(tmp_path):
    from data_quality_framework_ray.pipelines import reporting as R

    n = R.EmailNotifier({"sender": "dq@example.test",
                         "recipients": ["team@example.test"],
                         "outbox_dir": str(tmp_path / "outbox")})
    out = n.send_report(_sample_results(), run_id="r2",
                        report_dir=str(tmp_path / "reports"))
    assert os.path.exists(out["receipt"]) and os.path.exists(out["report"])
    msg = email.message_from_file(open(out["receipt"]))
    assert msg["From"] == "dq@example.test"
    assert "NEEDS ATTENTION" in msg["Subject"]  # 3/4 = 75%
    parts = list(msg.walk())
    names = [p.get_filename() for p in parts if p.get_filename()]
    assert any(n and n.startswith("report_") for n in names)  # attached


def test_freshness_accepts_string_dates(ray_session):
    import ray.data as rd

    from data_quality_framework_ray.pipelines.expectations import check_freshness

    rows = [{"d": "2026-01-10"}, {"d": "2026-01-14"}, {"d": "2026-01-02"}]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    r = check_freshness(ds, "d", as_of=dt.date(2026, 1, 15))
    assert r["passed"] is True
    r2 = check_freshness(ds, "d", as_of=dt.date(2026, 1, 20))
    assert r2["passed"] is False
    bad = rd.from_arrow(pa.Table.from_pylist([{"d": "not-a-date"}]))
    r3 = check_freshness(bad, "d", as_of=dt.date(2026, 1, 15))
    assert r3["passed"] is False and "error" in r3["details"]


def test_pdf_report_structurally_valid(tmp_path):
    """The dependency-free PDF sink: header/EOF markers, xref offsets that
    actually point at their objects, one page per 46 lines, report content
    present in the (uncompressed) streams, parens/backslashes escaped."""
    from data_quality_framework_ray.functions.pdfmin import (LINES_PER_PAGE,
                                                             write_pdf)
    from data_quality_framework_ray.pipelines import reporting as R

    path = R.write_pdf_report(str(tmp_path), _sample_results(), run_id="r9")
    raw = open(path, "rb").read()
    assert raw.startswith(b"%PDF-1.4")
    assert raw.rstrip().endswith(b"%%EOF")
    assert b"(Data Quality Report" in raw
    assert b"FAIL nulls [b]" in raw

    # verify every xref offset lands exactly on "N 0 obj"
    import re

    xref_at = int(raw[raw.rindex(b"startxref"):].split()[1])
    table = raw[xref_at:].split(b"trailer")[0].splitlines()
    n = int(table[1].split()[1])
    for i, line in enumerate(table[2:2 + n]):
        off, _, kind = line.split()
        if kind == b"f":
            continue
        at = int(off)
        assert re.match(rb"%d 0 obj" % i, raw[at:at + 20]), i

    # pagination: 200 lines -> ceil(200/46) pages
    many = [f"line ({i}) with \\ specials" for i in range(200)]
    p2 = write_pdf(str(tmp_path / "many.pdf"), many)
    raw2 = open(p2, "rb").read()
    import math
    want_pages = math.ceil(200 / LINES_PER_PAGE)
    assert raw2.count(b"/Type /Page ") == want_pages
    assert b"/Count %d" % want_pages in raw2
    assert rb"line \(0\) with \\ specials" in raw2


def test_metadata_push_payload_shape(tmp_path):
    """Config-driven catalog push (round-4 verdict #8): payload mirrors the
    reference's test-case shape, transcript JSONL is written, disabled
    config is a true no-op."""
    import json

    from data_quality_framework_ray.pipelines.reporting import MetadataPush

    results = [
        {"check": "row_count", "table": "orders", "column": None,
         "passed": True, "dimension": "completeness",
         "details": {"row_count": 42, "min_rows": 1}},
        {"check": "nulls", "table": "orders", "column": "o_totalprice",
         "passed": False, "dimension": "completeness",
         "details": {"null_count": 3, "nested": {"x": 1}}},
    ]
    mp = MetadataPush({"enabled": True, "outbox_dir": str(tmp_path),
                       "service": "svc", "database": "db1"})
    receipt = mp.push(results, run_id="r1")
    assert receipt["transport"] == "file" and receipt["n"] == 2
    lines = [json.loads(ln) for ln in
             open(receipt["outbox"]).read().splitlines()]
    assert lines[0]["name"] == "svc.default.db1.orders.all.row_count"
    assert lines[0]["testDefinition"] == "tableRowCountToBeBetween"
    assert lines[0]["result"]["testCaseStatus"] == "Success"
    assert {"name": "row_count", "value": 42} in lines[0]["parameterValues"]
    assert lines[1]["name"].endswith("orders.o_totalprice.nulls")
    assert lines[1]["result"]["testCaseStatus"] == "Failed"
    # non-scalar detail values are dropped, not serialized
    assert all(p["name"] != "nested" for p in lines[1]["parameterValues"])
    assert "entityLink" in lines[0]

    off = MetadataPush({"enabled": False, "outbox_dir": str(tmp_path / "x")})
    assert off.push(results) == {"transport": "disabled", "n": 0}
    assert not (tmp_path / "x").exists()
