#!/usr/bin/env python
"""CTC-fusion alpha sweep for the trained recognizer's beam path.

Reproduces the table in BENCH/BASELINE.md's round-5 section: beam CER on
held-out full-charset coverage lines and held-out corpus lines at each
fusion weight. The shipped trained_full meta carries the swept optimum
(CTC_FUSION_ALPHA=0.4); this script is how that number was chosen and
how to re-choose it after retraining.

Usage: python scripts/beam_alpha_sweep.py [alphas...] (default sweep)
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    alphas = [float(a) for a in sys.argv[1:]] or [0.0, 0.2, 0.4, 0.7, 1.0]

    from kiri_ocr_spark.operators import train as T
    from kiri_ocr_spark.operators.model import load_model

    model = load_model(os.path.join(REPO, "models", "trained_full"))
    _, cov_held = T.charset_coverage_crops(model.tok, n_train=0,
                                           n_heldout=64)
    _, cor_held = T.fixture_line_crops("/root/testdata/sf0.001",
                                       tok=model.tok)
    for alpha in alphas:
        model.cfg.CTC_FUSION_ALPHA = alpha
        t0 = time.time()
        cov = T.evaluate_cer(model, cov_held, "beam", limit=64)
        cor = T.evaluate_cer(model, cor_held, "beam", limit=48)
        print(f"alpha={alpha}: beam_cer coverage={cov:.4f} "
              f"corpus={cor:.4f} ({time.time() - t0:.0f}s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
