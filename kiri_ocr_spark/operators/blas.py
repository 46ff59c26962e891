"""Per-worker BLAS thread pinning for the numpy model paths.

The vendored OpenBLAS inside this numpy build defaults to 32 threads
(openblas_get_num_threads reads 32 at import). Every heavy Spark stage
here runs the numpy forwards inside 32 parallel python workers, so the
default multiplies to ~1024 runnable BLAS threads on a 32-core host —
and OpenBLAS's spin-wait thread sync makes SMALL GEMMs (the [T,144] x
[144,32]-shape conv/attention matmuls of this model) pathologically
slow under that contention: the measured stem forward at batch 8 reads
85-95 ms single-threaded vs 240-1200 ms with default threading on a
loaded host. One BLAS thread per worker is the correct setting whenever
the parallelism already lives at the partition level (the same reason
Spark docs recommend OPENBLAS_NUM_THREADS=1 for MLlib executors — and
at 100 TB on a real cluster each executor core runs one worker, where
a 32-thread BLAS would oversubscribe identically).

Env vars (OPENBLAS_NUM_THREADS) only work if set before numpy's first
import in the worker process, which a forked pyspark daemon does not
guarantee — so this pins at RUNTIME through OpenBLAS's own control
symbol, found on the already-loaded vendored library. Idempotent,
fail-open (a numpy build with a different BLAS just no-ops).
"""

from __future__ import annotations

import ctypes
import glob
import os

_PINNED: int | None = None


def pin_blas_threads(n: int = 1) -> bool:
    """Set the OpenBLAS thread count for this process; True if applied."""
    global _PINNED
    if _PINNED == n:
        return True
    try:
        import numpy as np

        libs_dir = os.path.join(os.path.dirname(np.__file__), "..", "numpy.libs")
        for path in glob.glob(os.path.join(libs_dir, "libopenblas*")):
            dll = ctypes.CDLL(path)  # already loaded -> same handle, no re-map
            for sym in (
                "openblas_set_num_threads64_",
                "openblas_set_num_threads",
                "goto_set_num_threads",
            ):
                fn = getattr(dll, sym, None)
                if fn is not None:
                    fn(ctypes.c_int(n))
                    _PINNED = n
                    return True
    except Exception:
        pass
    return False
