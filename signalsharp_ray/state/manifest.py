"""Per-stage checkpoint manifest: resumability + lineage + metrics.

Ray Data gives task-level retry; JOB-level resume is ours (north_rule):
each pipeline stage writes its parquet output to `<root>/<stage>/` and then
records a manifest entry with the input fingerprint, row count, byte count,
and upstream lineage. On restart, a stage whose manifest entry matches the
current fingerprint is skipped and its parquet output is reused.

Writes are atomic: output goes to `<stage>.tmp-<pid>` and is renamed into
place before the manifest entry is committed, so a killed run never leaves a
half-written stage that the manifest claims is complete.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import time
from dataclasses import asdict, dataclass, field


@dataclass
class StageRecord:
    stage: str
    fingerprint: str
    rows: int
    bytes: int
    wall_s: float
    lineage: list[str] = field(default_factory=list)
    completed_at: float = 0.0
    # per-partition lineage: hive partition dir -> {rows, bytes}; lets an
    # operator audit exactly which key ranges a stage produced and a
    # downstream consumer skip finished partitions by name (north rule:
    # per-partition lineage + row-count/byte metrics)
    partitions: dict = field(default_factory=dict)


class PipelineManifest:
    FILENAME = "MANIFEST.json"

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._path = os.path.join(root, self.FILENAME)
        self._records: dict[str, dict] = {}
        self._lock = threading.Lock()  # stages may complete concurrently
        if os.path.exists(self._path):
            with open(self._path) as f:
                self._records = json.load(f)

    def stage_dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def is_complete(self, stage: str, fingerprint: str) -> bool:
        rec = self._records.get(stage)
        return (
            rec is not None
            and rec.get("fingerprint") == fingerprint
            and os.path.isdir(self.stage_dir(stage))
        )

    def record(self, rec: StageRecord) -> None:
        rec.completed_at = time.time()
        with self._lock:
            self._records[rec.stage] = asdict(rec)
            tmp = f"{self._path}.tmp-{threading.get_ident()}"
            with open(tmp, "w") as f:
                json.dump(self._records, f, indent=2)
            os.replace(tmp, self._path)

    def records(self) -> dict[str, dict]:
        return dict(self._records)

    def run_stage(self, stage: str, fingerprint: str, lineage: list[str], write_fn):
        """Execute `write_fn(out_dir)` (which must write parquet into out_dir)
        unless the stage is already complete for this fingerprint.

        Returns (stage_dir, skipped: bool).
        """
        out_dir = self.stage_dir(stage)
        if self.is_complete(stage, fingerprint):
            return out_dir, True
        tmp_dir = f"{out_dir}.tmp-{os.getpid()}"
        if os.path.isdir(tmp_dir):
            shutil.rmtree(tmp_dir)
        os.makedirs(tmp_dir, exist_ok=True)
        t0 = time.time()
        write_fn(tmp_dir)
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)
        os.replace(tmp_dir, out_dir)
        parts = _partition_stats(out_dir)  # one footer walk; totals derive
        self.record(
            StageRecord(
                stage=stage,
                fingerprint=fingerprint,
                rows=sum(p["rows"] for p in parts.values()),
                bytes=sum(p["bytes"] for p in parts.values()),
                wall_s=time.time() - t0,
                lineage=lineage,
                partitions=parts,
            )
        )
        return out_dir, False


def _partition_stats(directory: str) -> dict:
    """Per-hive-partition (first-level `key=value` dir) rows/bytes from the
    parquet footers — the per-partition lineage record. Flat outputs (no
    hive dirs) record a single '.' partition."""
    import pyarrow.parquet as pq

    out: dict[str, dict] = {}
    for dirpath, _, files in os.walk(directory):
        pq_files = [f for f in files if f.endswith(".parquet")]
        if not pq_files:
            continue
        rel = os.path.relpath(dirpath, directory)
        part = "." if rel == "." else rel.split(os.sep)[0]
        slot = out.setdefault(part, {"rows": 0, "bytes": 0})
        for fn in pq_files:
            p = os.path.join(dirpath, fn)
            slot["rows"] += pq.ParquetFile(p).metadata.num_rows
            slot["bytes"] += os.path.getsize(p)
    return out
