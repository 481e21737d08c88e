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

    def open_input(self, path: str):
        """Something ``pyarrow.parquet.ParquetFile`` accepts for this path:
        a file-like whose reads go through :meth:`get_range` (so remote
        stores keep range-read semantics, like the reference's
        store-integrated parquet source, index_exec.rs:96-143). LocalStore
        returns the plain path so pyarrow keeps its fast local I/O."""
        return StoreFile(self, path)

    def is_local(self) -> bool:
        """True when ``path`` names a real local file (enables fd-based
        fast paths like preadv span reads)."""
        return False


class StoreFile:
    """Minimal seekable read-only file over ``ObjectStore.get_range``."""

    def __init__(self, store: "ObjectStore", path: str):
        self._store = store
        self._path = path
        self._size = store.head(path)
        self._pos = 0
        self.closed = False

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            n = self._size - self._pos
        end = min(self._size, self._pos + n)
        data = (
            self._store.get_range(self._path, self._pos, end)
            if end > self._pos
            else b""
        )
        self._pos += len(data)
        return data

    def seek(self, offset: int, whence: int = 0) -> int:
        if whence == 0:
            self._pos = offset
        elif whence == 1:
            self._pos += offset
        elif whence == 2:
            self._pos = self._size + offset
        else:
            raise ValueError(f"invalid whence {whence}")
        return self._pos

    def tell(self) -> int:
        return self._pos

    def size(self) -> int:
        return self._size

    def seekable(self) -> bool:
        return True

    def readable(self) -> bool:
        return True

    def writable(self) -> bool:
        return False

    def flush(self) -> None:
        pass

    def close(self) -> None:
        self.closed = True


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

    def open_input(self, path: str):
        return path

    def is_local(self) -> bool:
        return True

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
