#!/usr/bin/env python
"""Hardware envelope for the trained-decode scaling gate: the identical
numpy kernel (trained-weights encode + CTC greedy, fp32, BLAS pinned to
1 thread) in plain multiprocessing pools — no Spark — at N and 4N procs.

This is the calibration BENCH/BASELINE.md's round-5 neural-gate section
cites: it bounds what ANY framework can deliver on this shared,
frequency-scaling host (measured 3.25x at 2 -> 8 procs), so the Spark
stage's speedup is graded against hardware reality, not against an
assumed-linear ideal. Same role as scripts/scaling.py's built-in
calibration burn for the template kernel.

Usage: python scripts/hw_trained_envelope.py [N=2]
"""
from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_CROPS = 512


def _init():
    from kiri_ocr_spark.operators import blas

    blas.pin_blas_threads(1)


def _work(args):
    lo, hi = args
    import numpy as np

    from kiri_ocr_spark.operators import train as T
    from kiri_ocr_spark.operators.model import get_model

    model = get_model(path=os.path.join(REPO, "models", "trained_full.npz"))
    crops = [T.render_crop(f"hello spark {i}", model.tok)[1]
             for i in range(lo, min(lo + 8, hi))]
    n = hi - lo
    batch = np.stack([crops[i % len(crops)] for i in range(n)]).astype(
        np.float32
    )
    out = 0
    for s in range(0, n, 8):
        mem = model.encode(batch[s : s + 8], fp32=True)
        out += len(model.ctc_greedy(mem))
    return out


def run(procs: int):
    chunk = N_CROPS // procs
    spans = [(i * chunk, (i + 1) * chunk) for i in range(procs)]
    with mp.Pool(procs, initializer=_init) as pool:
        pool.map(_work, [(0, 8)] * procs)  # warm: model load + render
        t0 = time.time()
        total = sum(pool.map(_work, spans))
        dt = time.time() - t0
    return total, dt


def measure_envelope(n: int, repeats: int = 2) -> float:
    """The N -> 4N throughput ratio of the bare kernel on this host —
    the ceiling any framework's stage speedup is graded against."""
    rates = {}
    for procs in (n, 4 * n):
        best = None
        for _ in range(repeats):
            total, dt = run(procs)
            if best is None or dt < best[1]:
                best = (total, dt)
        rates[procs] = best[0] / best[1]
        print(f"procs={procs}: {best[0]} crops in {best[1]:.2f}s "
              f"= {rates[procs]:.1f} crops/s")
    return rates[4 * n] / rates[n]


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    env = measure_envelope(n)
    print(f"hardware envelope {n}->{4*n}: {env:.2f}x "
          f"(nominal ceiling {env/4:.3f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
