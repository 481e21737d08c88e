"""Object-store abstraction for engine file access.

The reference goes through DataFusion's ``object_store`` for footer and
payload reads (/root/reference/src/df_vector/index_exec.rs:93-143) so indexed
files can live on remote storage. We keep the same seam: the engine only does
``head`` / ``get_range`` / ``get_tail`` through this interface; a remote
implementation can be slotted in without touching the operators.
"""

from __future__ import annotations

import os

from ..errors import ExecutionError


class ObjectStore:
    def head(self, path: str) -> int:
        """File size in bytes."""
        raise NotImplementedError

    def get_range(self, path: str, start: int, end: int) -> bytes:
        """Bytes [start, end)."""
        raise NotImplementedError

    def get_tail(self, path: str, length: int) -> bytes:
        size = self.head(path)
        return self.get_range(path, max(0, size - length), size)


class MemoryStore(ObjectStore):
    """In-memory store (tests and the remote-file seam contract)."""

    def __init__(self, files: dict[str, bytes] | None = None):
        self._files: dict[str, bytes] = dict(files or {})

    def put(self, path: str, data: bytes) -> None:
        self._files[path] = data

    def head(self, path: str) -> int:
        if path not in self._files:
            raise ExecutionError(f"Failed to stat '{path}': not found")
        return len(self._files[path])

    def get_range(self, path: str, start: int, end: int) -> bytes:
        if path not in self._files:
            raise ExecutionError(f"Failed to read '{path}': not found")
        return self._files[path][start:end]


class LocalStore(ObjectStore):
    """Local filesystem store."""

    def head(self, path: str) -> int:
        try:
            return os.path.getsize(path)
        except OSError as exc:
            raise ExecutionError(f"Failed to stat '{path}': {exc}") from exc

    def get_range(self, path: str, start: int, end: int) -> bytes:
        try:
            with open(path, "rb") as f:
                f.seek(start)
                return f.read(end - start)
        except OSError as exc:
            raise ExecutionError(f"Failed to read '{path}': {exc}") from exc


DEFAULT_STORE = LocalStore()
