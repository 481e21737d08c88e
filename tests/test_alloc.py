"""utils/alloc: fault-aware host allocation (mmap-backed matrices +
MADV_POPULATE_WRITE batch-faulting). Behavior contract only — the
throughput claims live in docs/ROUND5.md §6 and are machine-specific."""
import os
import subprocess
import sys

import numpy as np

from pqvector_tpu.utils import alloc
from pqvector_tpu.utils.alloc import alloc_matrix, populate


def test_alloc_matrix_shape_dtype_contiguity():
    a = alloc_matrix((7, 13), np.float32)
    assert a.shape == (7, 13) and a.dtype == np.float32
    assert a.flags.c_contiguous and a.flags.writeable
    a[:] = 3.5
    assert (a == 3.5).all()


def test_alloc_matrix_large_is_mmap_backed_and_writable():
    # Above _MIN_BYTES: the mmap path (when POSIX + not disabled).
    n = alloc._MIN_BYTES // 4 + 1024
    a = alloc_matrix((n,), np.float32)
    assert a.nbytes >= alloc._MIN_BYTES
    a[::100000] = 1.0
    assert a[0] == 1.0


def test_populate_preserves_written_contents():
    n = alloc._MIN_BYTES // 4 + 1024
    a = alloc_matrix((n,), np.float32)
    a[:128] = np.arange(128, dtype=np.float32)
    a[-1] = 7.0
    populate(a)  # True or False per kernel support; contents must hold
    assert (a[:128] == np.arange(128, dtype=np.float32)).all()
    assert a[-1] == 7.0


def test_populate_noop_on_small_and_non_mmap():
    assert populate(np.empty(8, np.float32)) is False
    # Large np.empty: not page-aligned mmap we own — madvise may EINVAL;
    # either way the call must not raise and contents stay intact.
    b = np.full(alloc._MIN_BYTES // 8 + 7, 2.0, np.float64)
    populate(b)
    assert (b == 2.0).all()


def test_env_disable_falls_back_to_np_empty():
    code = (
        "import os; os.environ['PQVECTOR_TPU_NO_MMAP_ALLOC']='1';\n"
        "import numpy as np\n"
        "from pqvector_tpu.utils.alloc import alloc_matrix, populate\n"
        "a = alloc_matrix((1 << 22,), np.float64)\n"
        "assert a.shape == (1 << 22,)\n"
        "a[:] = 1.0\n"
        "assert populate(a) in (True, False)\n"
        "print('ok')\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env=env, timeout=120,
    )
    assert out.returncode == 0 and "ok" in out.stdout, out.stderr
