"""Per-source checkpoint state (atomic JSON KV store).

Parity with the reference's ``CheckpointManager`` (reference
``ingestion/common.py:38-75``): one JSON file per source under a
phase-scoped root (``ingestion-download`` / ``ingestion-parse``,
``runner.py:405-407``), written atomically via temp-file + rename, with a
``completed`` flag that short-circuits finished sources on restart
(``common.py:220-222``).

In our engine batch jobs are idempotent at file granularity (Spark sink
semantics), so the checkpoint's job is coarse run-state: skip-completed and
run bookkeeping. Streaming jobs use Structured Streaming's own
``checkpointLocation`` instead (see streaming/).
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import asdict, dataclass, field
from pathlib import Path


@dataclass
class Checkpoint:
    cursor: dict = field(default_factory=dict)
    batch_index: int = 0
    completed: bool = False


class CheckpointManager:
    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def _path(self, source: str) -> Path:
        return self.root / f"{source}.json"

    def load(self, source: str) -> Checkpoint | None:
        path = self._path(source)
        if not path.exists():
            return None
        data = json.loads(path.read_text(encoding="utf-8"))
        return Checkpoint(**data)

    def store(self, source: str, checkpoint: Checkpoint) -> None:
        path = self._path(source)
        fd, tmp = tempfile.mkstemp(dir=self.root, prefix=f".{source}.", suffix=".tmp")
        try:
            with os.fdopen(fd, "w", encoding="utf-8") as fh:
                json.dump(asdict(checkpoint), fh)
            os.replace(tmp, path)  # atomic on POSIX, same as the reference
        finally:
            if os.path.exists(tmp):  # pragma: no cover - only on failure
                os.unlink(tmp)

    def is_completed(self, source: str) -> bool:
        cp = self.load(source)
        return bool(cp and cp.completed)
