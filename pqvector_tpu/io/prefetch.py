"""Background byte-range prefetch for sequential row-group decode.

The native chunk decoder runs at ~1 GB/s single-core while the local disk
sustains ~150 MB/s cold, so a serialized read-then-decode loop over row
groups is I/O-bound with the CPU idle during every read (and vice versa
warm). Both the file read and the native decode release the GIL, so one
background reader thread overlaps the next row group's I/O with the
current decode, taking the full-column load from read+decode summed to
max(read, decode).

The reference loads the whole file through Arrow's reader in one call
(/root/reference/src/ivf/parquet.rs:216-233), inheriting parquet-rs's
internal readahead; this module is the explicit TPU-host equivalent for
the native decode path.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Callable, Iterable, Iterator, Sequence, Tuple, TypeVar

T = TypeVar("T")

_DONE = object()


def iter_prefetched(
    path: str | os.PathLike,
    items: Sequence[T] | Iterable[T],
    span: Callable[[T], Tuple[int, int]],
    depth: int = 2,
) -> Iterator[Tuple[T, bytes]]:
    """Yield ``(item, bytes)`` for each item, reading ahead in a thread.

    ``span(item)`` returns the ``(offset, length)`` byte range to read.
    At most ``depth`` buffers are in flight, bounding host memory at
    ``depth`` row-group chunks. Reads use ``os.pread`` on a dedicated fd
    (no seek state shared with the consumer). Reader exceptions re-raise
    in the consumer at the failing item's position; closing the generator
    early (e.g. a sampling pass that has seen enough rows) stops the
    reader promptly without draining the file.
    """
    if depth < 1:
        raise ValueError("prefetch depth must be >= 1")
    out: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()
    fd = os.open(os.fspath(path), os.O_RDONLY)

    def _put(payload) -> bool:
        # Bounded put that stays responsive to consumer shutdown: a plain
        # blocking put would deadlock the reader (and leak the thread) if
        # the consumer exits while the queue is full.
        while not stop.is_set():
            try:
                out.put(payload, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _reader() -> None:
        try:
            for item in items:
                if stop.is_set():
                    return
                offset, length = span(item)
                buf = os.pread(fd, length, offset)
                if len(buf) != length:
                    raise OSError(
                        f"short read at {offset}: got {len(buf)} of {length}"
                    )
                if not _put((item, buf)):
                    return
            _put(_DONE)
        except BaseException as exc:  # re-raised at the consumer
            _put(exc)
        finally:
            os.close(fd)

    thread = threading.Thread(
        target=_reader, name="pqvector-prefetch", daemon=True
    )
    thread.start()
    try:
        while True:
            got = out.get()
            if got is _DONE:
                return
            if isinstance(got, BaseException):
                raise got
            yield got
    finally:
        stop.set()
        # Unblock a reader waiting on a full queue so the thread exits.
        while True:
            try:
                out.get_nowait()
            except queue.Empty:
                break
        thread.join(timeout=5.0)
