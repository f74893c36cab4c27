"""Per-partition checkpoint manifest — the resumable-build layer.

Analog of the reference's isContinue/tail-carry protocol
(/root/reference/src/stft_algorithm.c:41,50-51,536-586): bounded state that
makes a long computation restartable without redoing completed work, with
identical results to a one-shot run. Spark gives task-level retry; cross-RUN
resume needs this explicit lineage: each build partition records its input
fingerprint + metrics, and a re-run recomputes only partitions whose
fingerprint is missing or stale.

Manifest row: (partition_id, input_fingerprint, status, terms, postings,
bytes, skew_ratio, output_path) — FIXTURES.md F5.
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import asdict, dataclass, field


@dataclass
class PartitionEntry:
    partition_id: int
    input_fingerprint: str
    status: str = "done"
    # dense docID base this partition's postings/docstore were ENCODED with.
    # Offsets are a prefix-sum of partition counts, so an earlier partition's
    # count changing on a resumed build shifts every later offset — a "done"
    # partition whose recorded offset no longer matches must be rebuilt, or
    # its stored docIDs collide with the new layout. -1 = legacy manifest
    # (pre-offset tracking): always treated as stale.
    doc_offset: int = -1
    terms: int = 0
    postings: int = 0
    bytes: int = 0
    skew_ratio: float = 0.0
    output_path: str = ""


@dataclass
class Manifest:
    version: int = 1
    entries: dict[int, PartitionEntry] = field(default_factory=dict)

    def completed_for(self, fingerprints: dict[int, str]) -> set[int]:
        """Partitions already built against the SAME input bytes."""
        return {
            pid
            for pid, fp in fingerprints.items()
            if pid in self.entries
            and self.entries[pid].status == "done"
            and self.entries[pid].input_fingerprint == fp
        }


def manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, "manifest.json")


def load_manifest(index_dir: str) -> Manifest:
    path = manifest_path(index_dir)
    if not os.path.exists(path):
        return Manifest()
    with open(path) as f:
        raw = json.load(f)
    return Manifest(
        version=raw.get("version", 1),
        entries={
            int(pid): PartitionEntry(**e) for pid, e in raw.get("entries", {}).items()
        },
    )


def save_manifest(index_dir: str, manifest: Manifest) -> None:
    """Atomic write (tmp + rename) so a crash never half-writes lineage."""
    os.makedirs(index_dir, exist_ok=True)
    payload = {
        "version": manifest.version,
        "entries": {str(p): asdict(e) for p, e in manifest.entries.items()},
    }
    fd, tmp = tempfile.mkstemp(dir=index_dir, suffix=".manifest.tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
        os.replace(tmp, manifest_path(index_dir))
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
