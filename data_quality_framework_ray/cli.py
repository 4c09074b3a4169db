"""Command-line entry point — the reference's ``python main.py`` analogue
(/root/reference/main.py:305-360: argparse over table/partition/env flags).

Subcommands:
  run    — flagship clip quality-filter over a fragment directory
  suite  — the reference's check suite over any parquet table
  report — render the markdown report from a run's JSON output

Owns its Ray session (guarded init) per the driver contract — the library
itself never calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kw = {"num_cpus": num_cpus} if num_cpus else {}
        ray.init(address="local", include_dashboard=False, **kw)


def cmd_run(args) -> int:
    from data_quality_framework_ray.pipelines import quality_filter as qf

    _ensure_ray(args.num_cpus)
    summary = qf.run(args.input, args.output, models_dir=args.models,
                     disabled_rules=tuple(args.disable or ()))
    print(json.dumps(summary))
    return 0


def cmd_suite(args) -> int:
    import ray.data as rd

    from data_quality_framework_ray.pipelines import suite as S

    _ensure_ray(args.num_cpus)
    ds = rd.read_parquet(args.table)
    out = S.run_quality_suite(
        ds, table=args.name,
        freshness_column=args.freshness_column,
        integer_columns=args.integer_columns or [],
        min_rows=args.min_rows)
    email_cfg = None
    if args.email_outbox:
        email_cfg = {"sender": "data-quality@localhost",
                     "recipients": ["ops@localhost"],
                     "outbox_dir": args.email_outbox}
    S.write_run_report(args.output, {args.name: out}, email_config=email_cfg)
    sc = out["score"]
    return 0 if sc["n_passed"] == sc["n_checks"] else 1


def cmd_report(args) -> int:
    from data_quality_framework_ray.pipelines import reporting

    with open(args.run_json) as f:
        doc = json.load(f)
    results = [r for t in doc.get("tables", {}).values()
               for r in t.get("results", [])]
    path = reporting.write_report(args.output, results,
                                  run_id=doc.get("run_id", "run"))
    print(path)
    if args.pdf:
        print(reporting.write_pdf_report(args.output, results,
                                         run_id=doc.get("run_id", "run")))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="data_quality_framework_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("run", help="flagship clip quality-filter")
    pr.add_argument("--input", required=True, help="fragment dir (manifest.json)")
    pr.add_argument("--output", required=True)
    pr.add_argument("--models", default=None)
    pr.add_argument("--disable", action="append", help="rule name to disable")
    pr.set_defaults(fn=cmd_run)

    ps = sub.add_parser("suite", help="quality-check suite over a parquet table")
    ps.add_argument("--table", required=True, help="parquet path")
    ps.add_argument("--name", required=True)
    ps.add_argument("--output", required=True)
    ps.add_argument("--freshness-column", default=None)
    ps.add_argument("--integer-columns", nargs="*", default=None)
    ps.add_argument("--min-rows", type=int, default=None)
    ps.add_argument("--email-outbox", default=None)
    ps.set_defaults(fn=cmd_suite)

    pp = sub.add_parser("report", help="markdown report from a run JSON")
    pp.add_argument("--run-json", required=True)
    pp.add_argument("--output", required=True)
    pp.add_argument("--pdf", action="store_true",
                    help="also render the PDF report (functions/pdfmin.py)")
    pp.set_defaults(fn=cmd_report)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":  # pragma: no cover - exercised via __main__
    sys.exit(main())
