"""Salted aggregation equals plain aggregation on skewed keys."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def test_salted_aggregate_matches_plain(ray_session):
    import ray.data as rd

    from data_quality_framework_ray.functions.partitioning import salted_aggregate

    rng = np.random.default_rng(1)
    # heavy skew: 90% of rows share one key
    keys = np.where(rng.random(20_000) < 0.9, "hot", "cold")
    vals = rng.integers(0, 100, size=20_000)
    ids = np.arange(20_000)
    ds = rd.from_arrow(pa.table({"k": keys, "v": vals, "id": ids}))

    got = {r["k"]: r for r in salted_aggregate(
        ds, ["k"], {"v": "sum", "id": "count"}, n_salts=8, id_col="id").take_all()}
    import pandas as pd

    want = pd.DataFrame({"k": keys, "v": vals}).groupby("k")["v"].agg(["sum", "size"])
    for k in ("hot", "cold"):
        assert got[k]["sum_v"] == want.loc[k, "sum"], k
        assert got[k]["count"] == want.loc[k, "size"], k


def test_near_dedup_filter(ray_session):
    import ray.data as rd

    from data_quality_framework_ray.pipelines.dedup import (
        minhash_lsh_dup_groups, near_dedup_filter)

    rows = [{"doc_id": f"a{i}", "text": f"unique document number {i} with words "
             + " ".join(f"t{j}" for j in range(i, i + 20))} for i in range(50)]
    rows += [{"doc_id": f"b{i}", "text": rows[i]["text"]} for i in range(5)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    comp = minhash_lsh_dup_groups(ds, "text", "doc_id", threshold=0.8)
    out = near_dedup_filter(ds, "doc_id", comp).take_all()
    ids = {r["doc_id"] for r in out}
    assert len(ids) == 50
    assert all(f"a{i}" in ids for i in range(50))
    assert all(f"b{i}" not in ids for i in range(5))


def test_read_table_formats(ray_session, tmp_path):
    import json

    import pyarrow as pa
    from pyarrow import csv as pacsv

    from data_quality_framework_ray.sources.tabular import read_table

    t = pa.table({"a": pa.array([1, 2, 3], type=pa.int64()),
                  "b": pa.array(["x", "y", None], type=pa.string()),
                  "c": pa.array([1.5, None, 3.0], type=pa.float64())})
    csv_p = str(tmp_path / "t.csv")
    jsonl_p = str(tmp_path / "t.jsonl")
    pacsv.write_csv(t, csv_p)
    with open(jsonl_p, "w") as f:
        for row in t.to_pylist():
            f.write(json.dumps(row) + "\n")

    from pyarrow import orc as paorc

    orc_p = str(tmp_path / "t.orc")
    paorc.write_table(t, orc_p)

    schema = pa.schema([("a", pa.int64()), ("b", pa.string()),
                        ("c", pa.float64())])
    for fmt, path in (("csv", csv_p), ("jsonl", jsonl_p), ("orc", orc_p)):
        got = (read_table(path, fmt=fmt, expected_schema=schema)
               .to_pandas().sort_values("a").reset_index(drop=True))
        assert got["a"].tolist() == [1, 2, 3], fmt
        assert got["b"].tolist()[:2] == ["x", "y"] and got["b"].isna()[2], fmt
        assert got["c"].isna()[1], fmt

    # column pruning without a schema (csv include_columns path)
    pruned = read_table(csv_p, fmt="csv", columns=["a"]).to_pandas()
    assert list(pruned.columns) == ["a"]

    # orc: column pruning at the stripe read + directory-of-files input
    pruned_orc = read_table(orc_p, fmt="orc", columns=["a"]).to_pandas()
    assert list(pruned_orc.columns) == ["a"]
    orc_dir = tmp_path / "orcs"
    orc_dir.mkdir()
    paorc.write_table(t, str(orc_dir / "p0.orc"))
    paorc.write_table(t, str(orc_dir / "p1.orc"))
    both = read_table(str(orc_dir), fmt="orc", expected_schema=schema)
    assert both.count() == 6

    import pytest as _pytest
    with _pytest.raises(ValueError):
        read_table(csv_p, fmt="xml")
