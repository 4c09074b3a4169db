"""__ray_entry__ conformance: the exact calls the external driver makes."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod


def test_oracle_keys_subset_of_queries():
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert o <= q, o - q
    # meaningful coverage: most queries carry a SQL oracle
    assert len(o) >= 20


def test_entry_smoke(ray_session):
    ds = entrymod.entry()
    n = ds.count() if hasattr(ds, "count") and not hasattr(ds, "num_rows") else len(ds)
    assert n >= 1000
    names = set(ds.schema().names)
    for col in ("clip_id", "keep", "drop_reasons", "lang", "ppl",
                "scrubbed_transcript", "n_pii", "frag_id"):
        assert col in names, col


def test_queries_at_smallest_tier(ray_session):
    """Every callable runs at sf0.001 (the driver uses sf0.01; tier must not
    be hardcoded anywhere)."""
    sf = "/root/testdata/sf0.001"
    skip_slow = {"clips_decisions"}  # exercised by test_entry_smoke already
    for name, fn in entrymod.queries().items():
        if name in skip_slow:
            continue
        res = fn(sf)
        n = res.count() if hasattr(res, "count") and not hasattr(res, "num_rows") \
            else res.num_rows
        assert n >= 0, name


def test_queries_ordered_oracled_first():
    """DuckDB-oracled entries must precede gated ones in queries() iteration
    order — a driver that checks a time-bounded prefix then records the hard
    rows+schema+values MATCHes first (round-3 verdict #1)."""
    q = list(entrymod.queries())
    o = set(entrymod.oracle_sql())
    flags = [name in o for name in q]
    first_gated = flags.index(False) if False in flags else len(flags)
    assert all(not f for f in flags[first_gated:]), \
        "oracled query found after a gated one"


def test_steal_monitor_reports_shape():
    """bench.py's steal monitor must never break the bench: fields present,
    numeric-or-None, and the monitor survives a start/finish cycle with no
    samples (sub-interval run)."""
    import importlib.util, os, sys
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(os.path.dirname(__file__), os.pardir,
                                  "bench.py"))
    bench_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench_mod)
    m = bench_mod._StealMonitor(interval=0.2)
    import time
    time.sleep(0.5)
    out = m.finish()
    assert set(out) == {"host_steal_pct", "host_steal_peak_pct"}
    for v in out.values():
        assert v is None or (isinstance(v, float) and 0.0 <= v <= 100.0)
    # immediate finish (no sample window) must not raise
    out2 = bench_mod._StealMonitor(interval=5.0).finish()
    assert out2["host_steal_pct"] is None or out2["host_steal_pct"] >= 0.0


def test_steal_monitor_unmeasured_is_null_not_clean():
    """Measurement-integrity invariant (round-5 review): a window the monitor
    could NOT measure must surface as None — never as a silent 0.0 that
    bench_when_clean would accept as verified-clean."""
    import importlib.util, os, threading
    root = os.path.join(os.path.dirname(__file__), os.pardir)
    spec = importlib.util.spec_from_file_location(
        "bench_mod2", os.path.join(root, "bench.py"))
    bench_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench_mod)

    # lost mid-run sample → failed flag → null steal (peak from what was seen)
    m = bench_mod._StealMonitor(interval=0.05)
    m._failed = True
    assert m.finish()["host_steal_pct"] is None

    # /proc/stat unreadable at start → both fields null, no thread started
    m2 = bench_mod._StealMonitor.__new__(bench_mod._StealMonitor)
    m2._start = None
    m2._stop = threading.Event()
    assert m2.finish() == {"host_steal_pct": None,
                           "host_steal_peak_pct": None}

    spec2 = importlib.util.spec_from_file_location(
        "bwc_mod", os.path.join(root, "scripts", "bench_when_clean.py"))
    bwc = importlib.util.module_from_spec(spec2)
    spec2.loader.exec_module(bwc)
    inf = float("inf")
    # null → inf: never accepted as clean, never preferred over a measured run
    assert bwc.run_steal({"host_steal_pct": None}, scaling=False) == inf
    assert bwc.run_steal({}, scaling=True) == inf
    assert bwc.run_steal({"host_steal_pct_2": 1.0,
                          "host_steal_pct_8": None}, scaling=True) == inf
    assert bwc.run_steal({"host_steal_pct": 3.2}, scaling=False) == 3.2
    assert bwc.run_steal({"host_steal_pct_2": 1.0,
                          "host_steal_pct_8": 2.5}, scaling=True) == 2.5
