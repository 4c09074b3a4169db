"""Local replica of the driver's queries-vs-oracle compare (run before every
commit that touches __ray_entry__): executes each queries() entry at sf0.01,
runs the matching oracle_sql() in DuckDB over the same parquet views, and
compares row count + column names + order-insensitive values."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import duckdb
import numpy as np
import pandas as pd

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda x: str(x))
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = sys.argv[1:] or list(qs)
    n_fail = 0
    for name in only:
        t0 = time.time()
        try:
            got = canon(to_pandas(qs[name](SF_DIR)))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        el = time.time() - t0
        if name == "ann_ivf":
            # approximate op: assert recall vs the exact brute-force top-k
            # (same queries, same k) instead of a SQL oracle
            exact = canon(to_pandas(qs["ann_topk"](SF_DIR)))
            want_pairs = set(map(tuple, exact[["id", "query_id"]].values))
            got_pairs = set(map(tuple, got[["id", "query_id"]].values))
            recall = len(got_pairs & want_pairs) / max(len(want_pairs), 1)
            if recall < 0.6:
                print(f"FAIL {name}: IVF recall {recall:.2f} < 0.6 vs ann_topk")
                n_fail += 1
            else:
                print(f"ok   {name}: rows={len(got)} recall={recall:.2f} "
                      f"vs exact top-k [{el:.1f}s]")
            continue
        if name == "fingerprints":
            # property gate (no SQL oracle — the rolling hash is engine-
            # defined): deterministic across runs; full-fingerprint collision
            # rate < 5 %; every colliding pair is a textual NEAR-DUPLICATE
            # (word-3-gram Jaccard >= 0.5) — the sketch's defining property.
            again = canon(to_pandas(qs[name](SF_DIR)))
            det = got.equals(again)
            n_rows = len(got)
            rate = (n_rows - got["fingerprint"].nunique()) / max(n_rows, 1)
            texts = dict(con.execute(
                "SELECT doc_id, text FROM documents").fetchall())

            def sh(t):
                w = t.split()
                return set(zip(*[w[j:] for j in range(3)])) or {tuple(w)}

            bad_pairs = 0
            for _, grp in got.groupby("fingerprint"):
                ids = [int(x) for x in grp["doc_id"]]
                for i in range(1, len(ids)):
                    a, b = sh(texts[ids[0]]), sh(texts[ids[i]])
                    if len(a & b) / max(len(a | b), 1) < 0.5:
                        bad_pairs += 1
            if not det or rate > 0.05 or bad_pairs:
                print(f"FAIL {name}: deterministic={det} "
                      f"collision_rate={rate:.4f} non_neardup_collisions={bad_pairs}")
                n_fail += 1
            else:
                print(f"ok   {name}: rows={n_rows} deterministic, "
                      f"collisions only between near-dups "
                      f"(rate={rate:.4f}) [{el:.1f}s]")
            continue
        if name == "approx_distinct":
            exact = con.execute(
                "SELECT count(DISTINCT l_orderkey) FROM lineitem").fetchone()[0]
            approx = float(got["approx"].iloc[0])
            rel = abs(approx - exact) / max(exact, 1)
            if rel > 0.05:
                print(f"FAIL {name}: HLL rel error {rel:.3f} > 0.05 "
                      f"(approx={approx:.0f}, exact={exact})")
                n_fail += 1
            else:
                print(f"ok   {name}: approx={approx:.0f} exact={exact} "
                      f"rel_err={rel:.3f} [{el:.1f}s]")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={len(got)} (rows-only, no oracle) [{el:.1f}s]")
            continue
        want = canon(con.execute(oracles[name]).fetchdf())
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        eq = got.astype(str).values == want.astype(str).values
        if not eq.all():
            bad = np.nonzero(~eq.all(axis=1))[0][:3]
            print(f"FAIL {name}: {int((~eq.all(axis=1)).sum())} mismatched rows; "
                  f"e.g.\n{got.iloc[bad]}\nvs\n{want.iloc[bad]}")
            n_fail += 1
            continue
        print(f"ok   {name}: rows={len(got)} MATCH [{el:.1f}s]")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
