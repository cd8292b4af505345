"""Per-stage checkpoint manifest: resumability + lineage + metrics.

Ray Data gives task-level retry; JOB-level resume is ours (north_rule):
each pipeline stage writes its parquet output to `<root>/<stage>/` and then
records a manifest entry with the input fingerprint, row count, byte count,
and upstream lineage. On restart, a stage whose manifest entry matches the
current fingerprint is skipped and its parquet output is reused.

The root may be a plain local path or a URI (s3://, file://, any fsspec
scheme): all filesystem access goes through pyarrow.fs via common.fsio.

Commit protocol by filesystem:
- LOCAL: output goes to `<stage>.tmp-<pid>` and is renamed into place
  before the manifest entry is committed, so a killed run never leaves a
  half-written stage that the manifest claims is complete.
- OBJECT STORES (no atomic directory rename exists there): the stage
  writes directly into `<stage>/` — any pre-existing incomplete dir is
  deleted first — and the MANIFEST entry is the commit point (a
  single-object PUT is atomic). A killed run may leave partial parquet in
  the stage dir, but resume ignores it: the fingerprint check fails and
  the stage re-runs from scratch, deleting the partial output first.
"""

from __future__ import annotations

import json
import threading
import time
from dataclasses import asdict, dataclass, field

import pyarrow.fs as pafs

from ..common import fsio


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
        self.root = str(root).rstrip("/")
        self._fs, self._root_path = fsio.resolve_fs(self.root)
        self._local = isinstance(self._fs, pafs.LocalFileSystem)
        fsio.makedirs(self._fs, self._root_path)
        self._path = fsio.join(self._root_path, self.FILENAME)
        self._records: dict[str, dict] = {}
        self._lock = threading.Lock()  # stages may complete concurrently
        if fsio.exists(self._fs, self._path):
            self._records = json.loads(fsio.read_text(self._fs, self._path))

    def stage_dir(self, stage: str) -> str:
        """URI-form stage directory (what write_parquet and the partition
        mappers consume)."""
        return fsio.join(self.root, stage)

    def _stage_path(self, stage: str) -> str:
        """Filesystem-relative stage path (what self._fs operates on)."""
        return fsio.join(self._root_path, stage)

    def is_complete(self, stage: str, fingerprint: str) -> bool:
        rec = self._records.get(stage)
        return (
            rec is not None
            and rec.get("fingerprint") == fingerprint
            and fsio.is_dir(self._fs, self._stage_path(stage))
        )

    def record(self, rec: StageRecord) -> None:
        rec.completed_at = time.time()
        with self._lock:
            self._records[rec.stage] = asdict(rec)
            fsio.write_text_atomic(
                self._fs,
                self._path,
                json.dumps(self._records, indent=2),
                tmp_suffix=f".tmp-{threading.get_ident()}",
            )

    def records(self) -> dict[str, dict]:
        return dict(self._records)

    def run_stage(self, stage: str, fingerprint: str, lineage: list[str], write_fn):
        """Execute `write_fn(out_dir)` (which must write parquet into out_dir)
        unless the stage is already complete for this fingerprint.

        Returns (stage_dir, skipped: bool).
        """
        out_dir = self.stage_dir(stage)
        out_path = self._stage_path(stage)
        if self.is_complete(stage, fingerprint):
            return out_dir, True
        t0 = time.time()
        if self._local:
            import os

            # clear stale tmp dirs a KILLED prior run left behind (their
            # pid differs, so the per-pid cleanup below won't match them)
            sel = pafs.FileSelector(self._root_path, allow_not_found=True)
            for info in self._fs.get_file_info(sel):
                if (
                    info.type == pafs.FileType.Directory
                    and info.base_name.startswith(f"{stage}.tmp-")
                ):
                    fsio.rmtree(self._fs, info.path)
            tmp_path = f"{out_path}.tmp-{os.getpid()}"
            fsio.rmtree(self._fs, tmp_path)
            fsio.makedirs(self._fs, tmp_path)
            write_fn(fsio.join(self.root, f"{stage}.tmp-{os.getpid()}"))
            fsio.rmtree(self._fs, out_path)
            os.replace(tmp_path, out_path)
        else:
            # no atomic dir rename on object stores: write in place, commit
            # via the manifest entry below (see module docstring)
            fsio.rmtree(self._fs, out_path)
            fsio.makedirs(self._fs, out_path)
            write_fn(out_dir)
        parts = _partition_stats(self._fs, out_path)  # one footer walk
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


def _partition_stats(fs: pafs.FileSystem, directory: str) -> dict:
    """Per-hive-partition (first-level `key=value` dir) rows/bytes from the
    parquet footers — the per-partition lineage record. Flat outputs (no
    hive dirs) record a single '.' partition."""
    import pyarrow.parquet as pq

    sel = pafs.FileSelector(directory, recursive=True, allow_not_found=True)
    out: dict[str, dict] = {}
    base = directory.rstrip("/") + "/"
    for info in fs.get_file_info(sel):
        if info.type != pafs.FileType.File or not info.path.endswith(".parquet"):
            continue
        rel = info.path[len(base):] if info.path.startswith(base) else info.path
        part = rel.split("/")[0] if "/" in rel else "."
        slot = out.setdefault(part, {"rows": 0, "bytes": 0})
        with fs.open_input_file(info.path) as f:
            slot["rows"] += pq.ParquetFile(f).metadata.num_rows
        slot["bytes"] += info.size or 0
    return out
