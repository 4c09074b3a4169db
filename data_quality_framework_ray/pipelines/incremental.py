"""Incremental / cross-corpus dedup against PERSISTED fingerprint indexes.

The reference dedups only within one run; a training-data pipeline ingesting
100 TB in daily batches needs the other shape too: "drop everything we have
EVER ingested" without re-reading (or re-shipping) the historical corpus.
Three index families share the layout conventions (hive-sharded parquet,
appends are new files never rewrites, failed builds resume per shard) and —
for the two LSH families — one verification engine
(:func:`_near_dedup_generic`):

- EXACT: 128-bit content fingerprints, 16 B/row (~0.2 % of a 10 kB/doc
  corpus) — :func:`build_content_index` / :func:`dedup_against_index`.
- NEAR (text): MinHash LSH band buckets + signature blobs —
  :func:`build_minhash_index` / :func:`near_dedup_against_index`.
- NEAR (vectors): hyperplane-LSH buckets + float32 vector blobs, EXACT
  cosine verification — :func:`build_embedding_index` /
  :func:`near_dedup_embedding_against_index`.

Scale shape of the anti-filter (mirrors ``dedup.exact_dedup``'s two paths):
below ``config.BROADCAST_DUP_LIMIT`` index entries, the (h1, h2) table is
put in the object store ONCE and every batch anti-merges against it — no
shuffle, the new data streams. Above it, the hash-only tables join
distributed on ONE combined 64-bit key (``pair_key_u64``) with post-join
verification of the full 128 bits (a combine collision only ships an extra
candidate row — the verify filter drops it, never a wrong match), producing
the small DROP-id set; the payload itself is then anti-semi-joined by id
(``joins.semi_join``, which has its own broadcast/distributed switch). The
new data's payload columns are never shuffled on either path.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np
import pyarrow as pa

from data_quality_framework_ray import config
from data_quality_framework_ray.functions import hashing as H

INDEX_SHARDS = 64  # hive partition count; power of two (masked from h1)


def _hash_batch(batch: pa.Table, key_cols: list[str]) -> pa.Table:
    h1, h2 = H.content_hash_128(*[batch[c] for c in key_cols])
    shard = (h1.view(np.uint64) & np.uint64(INDEX_SHARDS - 1)).astype(np.int32)
    return pa.table({"h1": pa.array(h1), "h2": pa.array(h2),
                     "shard": pa.array(shard)})


def _distinct_hashes(t: pa.Table) -> pa.Table:
    # per-PARTITION dedupe (runs after the shard exchange, so repeats of a
    # fingerprint across input blocks collapse); repeats across separate
    # build_content_index calls remain — harmless for membership (they cost
    # index bytes, not correctness)
    return t.group_by(["h1", "h2", "shard"]).aggregate([])


def build_content_index(ds, key_cols: list[str], index_dir: str) -> str:
    """Write (or extend) a content-fingerprint index for ``ds`` under
    ``index_dir``: hive-partitioned parquet of (h1, h2) int64 pairs sharded
    by the low bits of h1. Appending a second corpus is the SAME call —
    parquet writes add files, never rewrite (resumable ingest).

    The 16 B/row hash stream is exchanged on ``shard`` BEFORE the write:
    without it every input block fans one file into every hive partition it
    touches (files = blocks × shards — measured 128 tiny files for a
    16-block sf0.1 build; a 100 TB corpus would emit millions), with it each
    shard's rows are written by one task, so files-per-build is bounded by
    the shard count. Returns ``index_dir``."""
    from data_quality_framework_ray.pipelines.exchange import (data_partitions,
                                                               part_shuffle)

    hashes = ds.map_batches(partial(_hash_batch, key_cols=key_cols),
                            batch_format="pyarrow",
                            batch_size=config.TEXT_BATCH_SIZE)
    schema = pa.schema([("h1", pa.int64()), ("h2", pa.int64()),
                        ("shard", pa.int32())])
    nparts = min(INDEX_SHARDS, data_partitions(hashes))
    sharded = part_shuffle(hashes, "shard", _distinct_hashes, schema, nparts)
    os.makedirs(index_dir, exist_ok=True)  # an EMPTY corpus writes no files
    sharded.write_parquet(index_dir, partition_cols=["shard"])
    return index_dir


def index_size(index_dir: str) -> int:
    """Row count from parquet METADATA only (no column scan). A missing or
    file-less index dir reads as 0 (an index built from an empty corpus)."""
    import pyarrow.dataset as pads

    if not os.path.isdir(index_dir):
        return 0
    return pads.dataset(index_dir, format="parquet",
                        partitioning="hive").count_rows()


def dedup_against_index(ds, key_cols: list[str], id_col: str,
                        index_dir: str, *, within: bool = True):
    """Rows of ``ds`` whose content (the row-wise ``key_cols`` tuple) does
    NOT appear in the index; with ``within=True`` (default) the min-``id_col``
    winner of each within-``ds`` duplicate group is kept first, so the output
    is exactly-deduped against (index ∪ ds). Matching is on the 128-bit
    content hash — the same fingerprint the index was built with, so corpus
    text never needs to be re-read."""
    from data_quality_framework_ray.pipelines.dedup import exact_dedup

    if within:
        ds = exact_dedup(ds, key_cols, id_col)
    n_idx = index_size(index_dir)
    if n_idx == 0:  # empty index (first-ever ingest): nothing to drop, and
        return ds   # read_parquet on a file-less dir would raise
    if n_idx <= config.BROADCAST_DUP_LIMIT:
        return _anti_index_broadcast(ds, key_cols, index_dir)
    return _anti_index_join(ds, key_cols, id_col, index_dir)


def _read_index(index_dir: str):
    import ray.data as rd

    return rd.read_parquet(index_dir, columns=["h1", "h2"])


def _anti_index_broadcast(ds, key_cols: list[str], index_dir: str):
    """Index fits the broadcast limit: one object-store put of the (h1, h2)
    frame, vectorized per-batch anti-merge. No shuffle."""
    import pandas as pd
    import ray

    from data_quality_framework_ray.pipelines.exchange import collect_blocks

    tabs, _ = collect_blocks(_read_index(index_dir))
    idx_pd = (pa.concat_tables(tabs, promote_options="default").to_pandas()
              if tabs else pd.DataFrame(columns=["h1", "h2"]))
    # fingerprints repeat across append builds (build_content_index dedupes
    # only within one call); a duplicated merge key would fan the left side
    # out and break the row-aligned filter mask — found by the randomized
    # multi-append sweep
    idx_pd = idx_pd.drop_duplicates(ignore_index=True)
    idx_pd["__hit"] = np.int8(1)
    ref = ray.put(idx_pd)

    def keep_new(batch: pa.Table) -> pa.Table:
        import pandas as pd

        right = ray.get(ref)
        if not len(right):
            return batch
        h1, h2 = H.content_hash_128(*[batch[c] for c in key_cols])
        left = pd.DataFrame({"h1": h1, "h2": h2})
        m = left.merge(right, on=["h1", "h2"], how="left")
        return batch.filter(pa.array(m["__hit"].isna().to_numpy()))

    return ds.map_batches(keep_new, batch_format="pyarrow",
                          batch_size=config.TEXT_BATCH_SIZE)


def _anti_index_join(ds, key_cols: list[str], id_col: str, index_dir: str):
    """Index too large to broadcast: distributed hash-only join. Ships only
    (id, ck) vs (ck, h1, h2) through the exchange — never the payload — then
    anti-semi-joins the payload by the (small) dropped-id set."""
    import pyarrow.compute as pc

    from data_quality_framework_ray.pipelines.joins import semi_join
    from data_quality_framework_ray.pipelines.exchange import data_partitions

    def tag_new(batch: pa.Table) -> pa.Table:
        h1, h2 = H.content_hash_128(*[batch[c] for c in key_cols])
        return pa.table({id_col: batch[id_col].combine_chunks(),
                         "ck": pa.array(H.pair_key_u64(h1, h2).view(np.int64)),
                         "nh1": pa.array(h1), "nh2": pa.array(h2)})

    def tag_idx(batch: pa.Table) -> pa.Table:
        h1 = batch["h1"].to_numpy(zero_copy_only=False)
        h2 = batch["h2"].to_numpy(zero_copy_only=False)
        return pa.table({"ck": pa.array(H.pair_key_u64(h1, h2).view(np.int64)),
                         "h1": batch["h1"].combine_chunks(),
                         "h2": batch["h2"].combine_chunks()})

    new_keys = ds.map_batches(tag_new, batch_format="pyarrow",
                              batch_size=config.TEXT_BATCH_SIZE)
    idx_keys = _read_index(index_dir).map_batches(tag_idx,
                                                  batch_format="pyarrow")
    nparts = data_partitions(new_keys)
    joined = new_keys.join(idx_keys, "inner", nparts, on=("ck",))

    def verified(batch: pa.Table) -> pa.Table:
        ok = pc.and_(pc.equal(batch["nh1"], batch["h1"]),
                     pc.equal(batch["nh2"], batch["h2"]))
        return batch.filter(pc.fill_null(ok, False)).select([id_col])

    dropped = joined.map_batches(verified, batch_format="pyarrow")
    return semi_join(ds, dropped, id_col, anti=True,
                     num_partitions=nparts)


# ---------------- incremental NEAR-dup (MinHash index) ----------------

def _sig_band_batch(batch: pa.Table, text_col: str, id_col: str,
                    num_perm: int, bands: int, shingle_k: int) -> pa.Table:
    """Compact per-doc MinHash rows: (id, sig fixed_size_list<uint64>,
    bh fixed_size_list<int64>[bands]). One expensive pass — band rows and
    the signature table are both cheap derivations of this. Zero-shingle
    docs (empty/whitespace text) are DROPPED: they have no content to be
    near-duplicated and a fill-value signature would spuriously match other
    empties (the SQL exact-Jaccard restatement excludes them the same way)."""
    sh, off = H.shingle_hashes(batch[text_col], shingle_k)
    sig = H.minhash_signatures(sh, off, num_perm=num_perm)
    r = num_perm // bands
    band_views = sig.reshape(len(sig), bands, r)
    np_err = np.seterr(over="ignore")
    bh = np.zeros((len(sig), bands), dtype=np.uint64)
    P = np.uint64(1099511628211)
    for j in range(r):
        bh = bh * P + band_views[:, :, j]
    np.seterr(**np_err)
    nonempty = np.diff(off) > 0
    n = batch.num_rows
    # signatures travel as FIXED-WIDTH binary blobs (8·num_perm B,
    # little-endian uint64): pyarrow's hash join rejects fixed_size_list
    # payload columns but carries binary fine, and np.frombuffer
    # reconstitutes the matrix zero-copy at verify time
    sig_bytes = sig.astype("<u8").tobytes()
    w = 8 * num_perm
    sig_col = pa.BinaryArray.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(np.arange(0, (n + 1) * w, w,
                                      dtype=np.int32).tobytes()),
         pa.py_buffer(sig_bytes)])
    t = pa.table({
        id_col: batch[id_col].combine_chunks(),
        "sig": sig_col,
        "bh": pa.FixedSizeListArray.from_arrays(
            pa.array(bh.reshape(-1).view(np.int64)), bands),
    })
    return t.filter(pa.array(nonempty))


def _explode_bands(t: pa.Table, id_col: str, bands: int) -> pa.Table:
    ids = t[id_col].combine_chunks()
    bh_flat = t["bh"].combine_chunks().flatten()
    n = t.num_rows
    return pa.table({
        "band": pa.array(np.tile(np.arange(bands, dtype=np.int64), n)),
        "bh": bh_flat,
        id_col: pa.array(np.repeat(np.asarray(ids), bands)),
    })


def build_minhash_index(ds, text_col: str, id_col: str, index_dir: str, *,
                        num_perm: int = 128, bands: int = 32,
                        shingle_k: int = 3) -> str:
    """Persist the corpus's MinHash LSH state for later incremental
    near-dedup: ``buckets/`` = exploded (band, bh, id) rows hive-sharded by
    the bucket key (one shard exchange bounds files-per-build, same as
    :func:`build_content_index`), ``sigs/`` = (id, sig) fixed-size-list
    rows, ``meta.json`` = the parameters every later ingest must reuse
    (signatures from different num_perm/seed/shingle_k are incomparable).
    Appending a second corpus slice is the same call on the same dir."""
    import json

    from data_quality_framework_ray.pipelines.exchange import (data_partitions,
                                                               part_shuffle)

    meta_path = os.path.join(index_dir, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if (meta["num_perm"], meta["bands"], meta["shingle_k"]) != \
                (num_perm, bands, shingle_k):
            raise ValueError(
                f"index at {index_dir} was built with {meta}; appending "
                f"with different MinHash parameters would corrupt it")

    compact = ds.map_batches(
        partial(_sig_band_batch, text_col=text_col, id_col=id_col,
                num_perm=num_perm, bands=bands, shingle_k=shingle_k),
        batch_format="pyarrow",
        batch_size=config.TEXT_BATCH_SIZE).materialize()

    os.makedirs(index_dir, exist_ok=True)
    compact.drop_columns(["bh"]).write_parquet(
        os.path.join(index_dir, "sigs"))

    def shard_rows(t: pa.Table) -> pa.Table:
        e = _explode_bands(t, id_col, bands)
        ck = H.pair_key_u64(e["band"].to_numpy(zero_copy_only=False),
                            e["bh"].to_numpy(zero_copy_only=False))
        shard = (ck & np.uint64(INDEX_SHARDS - 1)).astype(np.int32)
        return e.append_column("shard", pa.array(shard))

    bucket_schema = pa.schema([("band", pa.int64()), ("bh", pa.int64()),
                               (id_col, compact.schema().base_schema
                                .field(id_col).type),
                               ("shard", pa.int32())])
    rows = compact.map_batches(shard_rows, batch_format="pyarrow")
    nparts = min(INDEX_SHARDS, data_partitions(rows))
    sharded = part_shuffle(rows, "shard", lambda t: t, bucket_schema, nparts)
    os.makedirs(os.path.join(index_dir, "buckets"), exist_ok=True)
    sharded.write_parquet(os.path.join(index_dir, "buckets"),
                          partition_cols=["shard"])
    if not os.path.exists(meta_path):
        with open(meta_path, "w") as f:
            json.dump({"num_perm": num_perm, "bands": bands,
                       "shingle_k": shingle_k, "id_col": id_col}, f)
    return index_dir


def near_dedup_against_index(ds, text_col: str, id_col: str, index_dir: str,
                             *, threshold: float = 0.8):
    """Rows of ``ds`` that are NOT near-duplicates (signature-estimated
    Jaccard ≥ ``threshold``) of any document fingerprinted in the MinHash
    index — incremental near-dedup of an ingest batch against the all-time
    corpus without re-reading corpus text.

    Scale shape (shared engine :func:`_near_dedup_generic`): candidates come
    from a bucket join of the new batch's band rows against the index's
    ``buckets/`` table (hash-only rows; broadcast merge below
    MEMBERSHIP_BROADCAST_LIMIT); verification fetches 8·num_perm B per
    CANDIDATE row only (driver-side under DRIVER_PAIR_LIMIT, else a
    pair→signature join chain) and is a vectorized equality-mean estimate.
    Flagged ids anti-filter the payload. Neither the corpus nor the new
    batch's text is ever shuffled."""
    import json

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    num_perm, bands = int(meta["num_perm"]), int(meta["bands"])
    shingle_k = int(meta["shingle_k"])

    compact = ds.map_batches(
        partial(_sig_band_batch, text_col=text_col, id_col=id_col,
                num_perm=num_perm, bands=bands, shingle_k=shingle_k),
        batch_format="pyarrow",
        batch_size=config.TEXT_BATCH_SIZE).materialize()

    def decode(col) -> np.ndarray:
        return _blob_matrix(col, "<u8", num_perm)

    def decide(nmat: np.ndarray, cmat: np.ndarray) -> np.ndarray:
        return (nmat == cmat).mean(axis=1) >= threshold

    return _near_dedup_generic(ds, id_col, index_dir, meta, compact,
                               payload_dir="sigs", payload_col="sig",
                               bands=bands, units_per_row=num_perm,
                               decode=decode, decide=decide)


def _emb_band_batch(batch: pa.Table, emb_col: str, id_col: str,
                    n_planes: int, n_bands: int, seed: int) -> pa.Table:
    """Compact per-row embedding LSH rows: (id, emb fixed-width binary blob
    of float32, bh fixed_size_list<int64>[n_bands]) — the embedding analogue
    of :func:`_sig_band_batch`. Hyperplanes are derived from (seed, band) +
    dim exactly like ``dedup.embedding_dup_groups`` so index and ingest
    bucket identically. Zero-norm vectors are DROPPED (cosine undefined; a
    sign-of-zero bucket would spuriously co-bucket them)."""
    emb = np.stack(batch[emb_col].to_pandas().to_numpy()).astype(np.float32) \
        if batch.num_rows else np.zeros((0, 1), dtype=np.float32)
    n, dim = emb.shape
    norm = np.linalg.norm(emb.astype(np.float64), axis=1)
    codes = np.empty((n, n_bands), dtype=np.uint64)
    for b in range(n_bands):
        rng = np.random.default_rng([seed, b])
        planes = rng.standard_normal((dim, n_planes))
        bits = (emb.astype(np.float64) @ planes > 0).astype(np.uint64)
        codes[:, b] = (bits << np.arange(n_planes,
                                         dtype=np.uint64)[None, :]).sum(axis=1)
    w = 4 * dim
    blob = pa.BinaryArray.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(np.arange(0, (n + 1) * w, w,
                                      dtype=np.int32).tobytes()),
         pa.py_buffer(emb.astype("<f4").tobytes())])
    t = pa.table({
        id_col: batch[id_col].combine_chunks(),
        "emb": blob,
        "bh": pa.FixedSizeListArray.from_arrays(
            pa.array(codes.reshape(-1).view(np.int64)), n_bands),
    })
    return t.filter(pa.array(norm > 0))


def build_embedding_index(ds, emb_col: str, id_col: str, index_dir: str, *,
                          n_planes: int = 12, n_bands: int = 4,
                          seed: int = 3) -> str:
    """Persist the corpus's hyperplane-LSH state for incremental embedding
    near-dedup: ``buckets/`` = exploded (band, bh, id) rows hive-sharded by
    bucket key, ``vecs/`` = (id, emb float32 blob), ``meta.json`` = the
    plane parameters + dim every later ingest must reuse. Same layout and
    append semantics as :func:`build_minhash_index`."""
    import json

    from data_quality_framework_ray.pipelines.exchange import (data_partitions,
                                                               part_shuffle,
                                                               schema_map)

    dim = None
    try:
        vt = schema_map(ds).get(emb_col)
        if vt is not None and pa.types.is_fixed_size_list(vt):
            dim = vt.list_size
    except Exception:
        pass

    meta_path = os.path.join(index_dir, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if (meta["n_planes"], meta["n_bands"], meta["seed"]) != \
                (n_planes, n_bands, seed):
            raise ValueError(
                f"index at {index_dir} was built with {meta}; appending "
                f"with different LSH parameters would corrupt it")

    compact = ds.map_batches(
        partial(_emb_band_batch, emb_col=emb_col, id_col=id_col,
                n_planes=n_planes, n_bands=n_bands, seed=seed),
        batch_format="pyarrow",
        batch_size=config.TEXT_BATCH_SIZE).materialize()

    os.makedirs(index_dir, exist_ok=True)
    compact.drop_columns(["bh"]).write_parquet(
        os.path.join(index_dir, "vecs"))
    if dim is None:  # variable list<float> schema hides the width — peek
        first = compact.take(1)
        if first:
            dim = len(first[0]["emb"]) // 4

    def shard_rows(t: pa.Table) -> pa.Table:
        e = _explode_bands(t, id_col, n_bands)
        ck = H.pair_key_u64(e["band"].to_numpy(zero_copy_only=False),
                            e["bh"].to_numpy(zero_copy_only=False))
        shard = (ck & np.uint64(INDEX_SHARDS - 1)).astype(np.int32)
        return e.append_column("shard", pa.array(shard))

    id_type = schema_map(compact)[id_col]
    bucket_schema = pa.schema([("band", pa.int64()), ("bh", pa.int64()),
                               (id_col, id_type), ("shard", pa.int32())])
    rows = compact.map_batches(shard_rows, batch_format="pyarrow")
    nparts = min(INDEX_SHARDS, data_partitions(rows))
    sharded = part_shuffle(rows, "shard", lambda t: t, bucket_schema, nparts)
    os.makedirs(os.path.join(index_dir, "buckets"), exist_ok=True)
    sharded.write_parquet(os.path.join(index_dir, "buckets"),
                          partition_cols=["shard"])
    if not os.path.exists(meta_path):
        with open(meta_path, "w") as f:
            json.dump({"n_planes": n_planes, "n_bands": n_bands,
                       "seed": seed, "id_col": id_col, "dim": dim}, f)
    return index_dir


def near_dedup_embedding_against_index(ds, emb_col: str, id_col: str,
                                       index_dir: str, *,
                                       threshold: float = 0.98):
    """Rows of ``ds`` whose embedding has EXACT cosine similarity below
    ``threshold`` against every vector in the index — incremental embedding
    near-dedup (the vector analogue of :func:`near_dedup_against_index`;
    verification here is exact cosine on the stored float32 vectors, not an
    estimate). Same shared engine, same broadcast↔distributed switches."""
    import json

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    n_planes, n_bands = int(meta["n_planes"]), int(meta["n_bands"])
    seed = int(meta["seed"])

    compact = ds.map_batches(
        partial(_emb_band_batch, emb_col=emb_col, id_col=id_col,
                n_planes=n_planes, n_bands=n_bands, seed=seed),
        batch_format="pyarrow",
        batch_size=config.TEXT_BATCH_SIZE).materialize()

    def decode(col) -> np.ndarray:
        a = col.combine_chunks()
        dim = len(a[0].as_py()) // 4 if len(a) else 1
        return _blob_matrix(col, "<f4", dim).astype(np.float64)

    def decide(nmat: np.ndarray, cmat: np.ndarray) -> np.ndarray:
        nn = np.linalg.norm(nmat, axis=1)
        cn = np.linalg.norm(cmat, axis=1)
        denom = nn * cn
        dots = np.einsum("ij,ij->i", nmat, cmat)
        with np.errstate(invalid="ignore", divide="ignore"):
            cos = np.where(denom > 0, dots / denom, -1.0)
        return cos >= threshold

    return _near_dedup_generic(ds, id_col, index_dir, meta, compact,
                               payload_dir="vecs", payload_col="emb",
                               bands=n_bands,
                               units_per_row=int(meta.get("dim") or 64),
                               decode=decode, decide=decide)


def _blob_matrix(col, dtype: str, per_row: int) -> np.ndarray:
    """Fixed-width binary blob column → (rows × per_row) matrix. Rows of a
    binary array are contiguous in offset order, so data[off[0]:off[-1]] is
    the row-major matrix; tobytes() re-aligns for the typed view."""
    a = col.combine_chunks()
    if a.type == pa.large_binary():
        a = a.cast(pa.binary())
    off = np.frombuffer(a.buffers()[1], dtype=np.int32)[
        a.offset: a.offset + len(a) + 1]
    data = np.frombuffer(a.buffers()[2], dtype=np.uint8)[off[0]:off[-1]]
    return np.frombuffer(data.tobytes(), dtype=dtype).reshape(len(a),
                                                              per_row)


def _near_dedup_generic(ds, id_col: str, index_dir: str, meta: dict,
                        compact, *, payload_dir: str, payload_col: str,
                        bands: int, units_per_row: int, decode, decide):
    """Shared incremental near-dedup engine: bucket candidates →
    payload-blob verification → anti-filter. ``compact`` holds one row per
    (non-degenerate) input row with columns (id_col, payload_col = binary
    blob, bh = fixed_size_list[bands]); ``decode`` turns a blob column into
    a matrix, ``decide(nmat, cmat) -> bool[n]`` accepts pairs. All three
    stages switch broadcast↔distributed on the library's config limits."""
    import pyarrow.compute as pc
    import ray.data as rd

    from data_quality_framework_ray.pipelines.exchange import data_partitions
    from data_quality_framework_ray.pipelines.joins import semi_join

    def new_band_rows(t: pa.Table) -> pa.Table:
        e = _explode_bands(t, id_col, bands)
        return e.rename_columns(["band", "bh", "nid"])

    def idx_bucket_rows(t: pa.Table) -> pa.Table:
        return pa.table({"band": t["band"].combine_chunks(),
                         "bh": t["bh"].combine_chunks(),
                         "cid": t[meta["id_col"]].combine_chunks()})

    nb = compact.map_batches(new_band_rows, batch_format="pyarrow")
    nparts = data_partitions(nb)
    bucket_dir = os.path.join(index_dir, "buckets")
    import pyarrow.dataset as pads

    n_buckets = pads.dataset(bucket_dir, format="parquet",
                             partitioning="hive").count_rows()
    if n_buckets <= config.MEMBERSHIP_BROADCAST_LIMIT:
        # broadcast the (band, bh, cid) table once; candidates come from a
        # vectorized per-batch merge — no shuffle of the band rows
        import pandas as pd
        import ray

        from data_quality_framework_ray.pipelines.exchange import collect_blocks

        tabs, _ = collect_blocks(
            rd.read_parquet(bucket_dir,
                            columns=["band", "bh", meta["id_col"]])
            .map_batches(idx_bucket_rows, batch_format="pyarrow"))
        ib_pd = (pa.concat_tables(tabs, promote_options="default")
                 .to_pandas().drop_duplicates(ignore_index=True)
                 if tabs else pd.DataFrame(columns=["band", "bh", "cid"]))
        ib_ref = ray.put(ib_pd)

        def merge_pairs(t: pa.Table) -> pa.Table:
            import pandas as pd

            right = ray.get(ib_ref)
            if not len(right):
                return pa.table({"nid": pa.array([], t["nid"].type),
                                 "cid": pa.array([], t["nid"].type)})
            left = t.select(["band", "bh", "nid"]).to_pandas()
            mm = left.merge(right, on=["band", "bh"], how="inner")
            mm = mm[["nid", "cid"]].drop_duplicates(ignore_index=True)
            return pa.Table.from_pandas(mm, preserve_index=False)

        pairs = nb.map_batches(merge_pairs, batch_format="pyarrow")
    else:
        ib = rd.read_parquet(bucket_dir,
                             columns=["band", "bh", meta["id_col"]]) \
            .map_batches(idx_bucket_rows, batch_format="pyarrow")
        cand = nb.join(ib, "inner", nparts, on=("band", "bh"))

        def distinct_pairs(t: pa.Table) -> pa.Table:
            return t.select(["nid", "cid"]).group_by(["nid", "cid"]) \
                .aggregate([])

        # distinct within each joined block; cross-block repeats of a pair
        # only re-verify it (idempotent), never change the verdict
        pairs = cand.map_batches(distinct_pairs, batch_format="pyarrow")

    # pairs are consumed once but their COUNT picks the verify route —
    # materialize so the route probe doesn't re-run the candidate stage
    pairs = pairs.materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return ds

    sig_budget = config.BROADCAST_DUP_LIMIT // max(units_per_row, 1)
    if (n_pairs <= config.DRIVER_PAIR_LIMIT
            and n_pairs * 2 <= sig_budget):
        # driver verify (the _verify_text_pairs shape): fetch ONLY the
        # candidates' signatures from each side, one vectorized
        # equality-mean over all pairs, broadcast the flagged-id set
        import pyarrow.compute as pc
        import ray

        from data_quality_framework_ray.pipelines.exchange import collect_blocks

        ptabs, _ = collect_blocks(pairs)
        pt = pa.concat_tables(ptabs, promote_options="default")
        import polars as pl

        pdf = pl.from_arrow(pt).unique()
        nid_arr = pdf["nid"].to_arrow()
        cid_arr = pdf["cid"].to_arrow()
        nid_set = pc.unique(nid_arr)
        cid_set = pc.unique(cid_arr)

        def fetch_sigs(src, idname, want):
            ref = ray.put(want)

            def f(t: pa.Table) -> pa.Table:
                ks = ray.get(ref) if not isinstance(ref, pa.Array) else ref
                keep = pc.fill_null(pc.is_in(t[idname], value_set=ks), False)
                return t.filter(keep).select([idname, payload_col])

            tabs, _ = collect_blocks(
                src.map_batches(f, batch_format="pyarrow"))
            return (pa.concat_tables(tabs, promote_options="default")
                    if tabs else None)

        nsig_t = fetch_sigs(compact.drop_columns(["bh"]), id_col, nid_set)
        csig_src = rd.read_parquet(os.path.join(index_dir, payload_dir)) \
            .map_batches(lambda t: t.rename_columns(
                [id_col if c == meta["id_col"] else c
                 for c in t.column_names]), batch_format="pyarrow")
        csig_t = fetch_sigs(csig_src, id_col, cid_set)
        flagged_ids = pa.array([], type=nid_arr.type)
        if nsig_t is not None and csig_t is not None and nsig_t.num_rows \
                and csig_t.num_rows:
            import pandas as pd

            nmat = decode(nsig_t[payload_col])
            cmat = decode(csig_t[payload_col])
            n_idx = pd.Index(nsig_t[id_col].to_pandas())
            c_idx = pd.Index(csig_t[id_col].to_pandas())
            ia = n_idx.get_indexer(pd.Index(nid_arr.to_pandas()))
            ib = c_idx.get_indexer(pd.Index(cid_arr.to_pandas()))
            ok = (ia >= 0) & (ib >= 0)  # sides with dropped degenerate rows
            acc = np.zeros(len(ia), dtype=bool)
            if ok.any():
                acc[ok] = decide(nmat[ia[ok]], cmat[ib[ok]])
            flagged_ids = pc.unique(nid_arr.filter(pa.array(acc)))
        if len(flagged_ids) == 0:
            return ds
        fref = ray.put(flagged_ids)

        def anti(t: pa.Table) -> pa.Table:
            ks = ray.get(fref) if not isinstance(fref, pa.Array) else fref
            hit = pc.fill_null(pc.is_in(t[id_col], value_set=ks), False)
            return t.filter(pc.invert(hit))

        return ds.map_batches(anti, batch_format="pyarrow",
                              batch_size=config.TEXT_BATCH_SIZE)

    # distributed verify: join each pair to its two payload blobs (blob
    # bytes per CANDIDATE row only), vectorized decide, anti semi-join by id
    sig_name = {id_col: "nid"}
    new_sigs = compact.drop_columns(["bh"]).map_batches(
        lambda t: t.rename_columns(
            [sig_name.get(c, c) for c in t.column_names]),
        batch_format="pyarrow")
    idx_sigs = rd.read_parquet(os.path.join(index_dir, payload_dir)) \
        .map_batches(lambda t: pa.table(
            {"cid": t[meta["id_col"]].combine_chunks(),
             "cblob": t[payload_col].combine_chunks()}),
        batch_format="pyarrow")

    both = (pairs.join(new_sigs, "inner", nparts, on=("nid",))
            .join(idx_sigs, "inner", nparts, on=("cid",)))

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or payload_col not in t.column_names:
            return pa.table({id_col: pa.array([], type=pa.int64())})
        acc = decide(decode(t[payload_col]), decode(t["cblob"]))
        flagged = t.select(["nid"]).filter(pa.array(acc))
        return flagged.rename_columns([id_col])

    flagged = both.map_batches(verify, batch_format="pyarrow")
    return semi_join(ds, flagged, id_col, anti=True, num_partitions=nparts)
