"""Per-fragment lineage records + resume filter (SURVEY.md §4.2.4).

Replaces the reference's nothing (its only durability is whole-run Airflow
retries + Postgres history, /root/reference/airflow_dag.py:27-28): each
fragment that finishes phase A gets an atomically-renamed
``lineage/frag_{id}.json`` with status DONE, rows in/out and the run id. On
restart the driver lists lineage, clears partial output of not-DONE
fragments, and processes only the remainder — "resumes mid-table" per
BASELINE.json north_rule.
"""

from __future__ import annotations

import json
import os
import shutil
import time


class LineageLog:
    def __init__(self, out_dir: str):
        self.dir = os.path.join(out_dir, "lineage")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, frag_id: int) -> str:
        return os.path.join(self.dir, f"frag_{frag_id:05d}.json")

    def done_frag_ids(self) -> set[int]:
        out = set()
        for name in os.listdir(self.dir):
            if not name.endswith(".json"):
                continue
            try:
                with open(os.path.join(self.dir, name)) as f:
                    rec = json.load(f)
                if rec.get("status") == "DONE":
                    out.add(int(rec["frag_id"]))
            except (json.JSONDecodeError, KeyError, ValueError):
                continue  # torn write → treat as not done
        return out

    def mark_done(self, frag_id: int, record: dict) -> None:
        rec = {"frag_id": frag_id, "status": "DONE", "ts": time.time(), **record}
        tmp = self._path(frag_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, self._path(frag_id))  # atomic on POSIX

    def read(self, frag_id: int) -> dict | None:
        try:
            with open(self._path(frag_id)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None


def clear_partial_outputs(stage_dir: str, not_done: set[int]) -> None:
    """Remove partition dirs of fragments that did not complete."""
    if not os.path.isdir(stage_dir):
        return
    for name in os.listdir(stage_dir):
        if not name.startswith("frag-"):
            continue
        try:
            fid = int(name.split("-", 1)[1])
        except ValueError:
            continue
        if fid in not_done:
            shutil.rmtree(os.path.join(stage_dir, name), ignore_errors=True)
