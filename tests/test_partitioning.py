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
