"""File-arrival change detection (SURVEY.md §2.12 R6).

The reference's ``FileSystemChangeSensor`` polls a directory for new or
modified files by mtime/size, with glob filtering and a minimum-age
guard against in-flight writes (reference: src/orchestration/
sensors.py:226-353 — age check 309-313, glob 343-353). This is the
batch/driver-side form; the streaming path replaces it wholesale with
Spark's file source (streaming/ingest.py:file_stream — checkpointed
file tracking makes the min-age guard unnecessary there).

Control plane only: the snapshot dict is a few bytes per file; the
detected files are handed to a FileSource scan for the data path.
"""

from __future__ import annotations

import fnmatch
import os
import time
from dataclasses import dataclass, field
from datetime import datetime
from typing import Callable

from .cdc import ChangeType
from .detection import ChangeEvent


@dataclass
class FileSnapshot:
    """Last-seen (mtime, size) per path."""

    files: dict[str, tuple[float, int]] = field(default_factory=dict)


class FileSystemChangeSensor:
    """Detect new / modified / deleted files under a directory.

    ``glob`` filters filenames; files younger than
    ``min_file_age_seconds`` are ignored (probably still being written —
    the reference's in-flight guard)."""

    def __init__(
        self,
        directory: str,
        glob: str = "*",
        min_file_age_seconds: float = 0.0,
        clock: Callable[[], float] = time.time,
    ) -> None:
        self.directory = directory
        self.glob = glob
        self.min_file_age_seconds = min_file_age_seconds
        self.clock = clock
        self.snapshot = FileSnapshot()

    def _scan(self) -> dict[str, tuple[float, int]]:
        now = self.clock()
        out: dict[str, tuple[float, int]] = {}
        for root, _dirs, names in os.walk(self.directory):
            for name in names:
                if not fnmatch.fnmatch(name, self.glob):
                    continue
                path = os.path.join(root, name)
                try:
                    st = os.stat(path)
                except FileNotFoundError:
                    continue  # raced with a delete
                if now - st.st_mtime < self.min_file_age_seconds:
                    # Too fresh — possibly mid-write. The file still EXISTS,
                    # so a tracked path must not vanish from the snapshot
                    # (that would emit a spurious DELETE now and a wrong
                    # INSERT once it ages). Carry the last-seen entry
                    # forward; the UPDATE fires when the write settles.
                    if path in self.snapshot.files:
                        out[path] = self.snapshot.files[path]
                    continue
                out[path] = (st.st_mtime, st.st_size)
        return out

    def detect_changes(self, source_id: str = "fs") -> list[ChangeEvent]:
        """Compare against the previous snapshot; emit one event per
        changed file and advance the snapshot (like the reference's
        poke-then-remember loop)."""
        current = self._scan()
        prev = self.snapshot.files
        events: list[ChangeEvent] = []

        def _ev(path: str, kind: ChangeType, meta: dict) -> ChangeEvent:
            return ChangeEvent(
                source_id,
                path,
                kind,
                datetime.now().astimezone(),
                1,
                {"detection_method": "filesystem", **meta},
            )

        for path, (mtime, size) in current.items():
            if path not in prev:
                events.append(_ev(path, ChangeType.INSERT, {"size": size}))
            elif prev[path] != (mtime, size):
                events.append(
                    _ev(path, ChangeType.UPDATE,
                        {"size": size, "prev_size": prev[path][1]})
                )
        for path in prev.keys() - current.keys():
            events.append(_ev(path, ChangeType.DELETE, {}))
        self.snapshot = FileSnapshot(current)
        return events
