"""Lance-style fragment store over parquet + JSON manifest (IO seam).

The real target layout is a Lance table whose fragments are the unit of
lineage and resume (SURVEY.md §1.3); ``lance`` is not installable in this
sandbox, so the store emulates fragments as one parquet file each plus a
manifest. Swap ``read()`` for ``ray.data.read_lance`` where lance exists —
nothing else changes (the ``frag_id`` column plays the fragment-id role).

Replaces the reference's Hive reader + partition lister
(/root/reference/core/data_fetcher.py:23-121): projection via ``columns=``,
partition pruning via the fragment list, schema introspection via parquet
metadata — no driver-side materialization anywhere.
"""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq


class FragmentStore:
    def __init__(self, root: str):
        self.root = root
        with open(os.path.join(root, "manifest.json")) as f:
            self.manifest = json.load(f)

    @property
    def fragments(self) -> list[dict]:
        return self.manifest["fragments"]

    def frag_ids(self) -> list[int]:
        return [fr["frag_id"] for fr in self.fragments]

    def num_rows(self, frag_id: int | None = None) -> int:
        if frag_id is None:
            return sum(fr["num_rows"] for fr in self.fragments)
        return next(fr["num_rows"] for fr in self.fragments if fr["frag_id"] == frag_id)

    def paths(self, frag_ids: list[int] | None = None) -> list[str]:
        want = None if frag_ids is None else set(frag_ids)
        return [os.path.join(self.root, fr["path"]) for fr in self.fragments
                if want is None or fr["frag_id"] in want]

    def schema(self):
        """Metadata-only schema introspection (reference's DESCRIBE FORMATTED,
        /root/reference/core/data_fetcher.py:123-174, without a scan)."""
        return pq.read_schema(self.paths()[0])

    def read(self, frag_ids: list[int] | None = None, columns: list[str] | None = None,
             **read_kwargs):
        """ray.data.Dataset over the (selected) fragments; prune at the read."""
        import ray.data as rd

        paths = self.paths(frag_ids)
        if not paths:
            return rd.from_items([])
        return rd.read_parquet(paths, columns=columns, **read_kwargs)
