#!/usr/bin/env python
"""Train the full-size numpy recognizer on fixture-rendered line crops
and save the artifact through the S3 loader (save_model), closing the
"trained weights are the one external input" gap with weights trained
IN-sandbox (reference training loop: training.py:758-860 — CTC +
teacher-forced CE; this is the same objective via numpy backprop).

Usage: python scripts/train_model.py [sf_dir] [out_prefix]
Defaults: /root/testdata/sf0.001, models/trained_small

Deterministic end to end: seed init (model SEED), seeded shuffle, no
dropout — rerunning reproduces the artifact bit-for-bit.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "models/trained_small"

    from kiri_ocr_spark.operators import train as T
    from kiri_ocr_spark.operators.model import CFG, NumpyKiriModel, save_model

    t0 = time.monotonic()
    train_set, heldout = T.fixture_line_crops(sf_dir)
    print(f"crops: train={len(train_set)} heldout={len(heldout)}")

    model = NumpyKiriModel(CFG())
    report = {"sf_dir": sf_dir, "train": len(train_set), "heldout": len(heldout)}
    for method in ("ctc", "decoder", "beam"):
        lim = 64 if method != "ctc" else None
        report[f"seed_cer_{method}"] = round(
            T.evaluate_cer(model, heldout, method=method, limit=lim), 4
        )
    print("seed CER:", {k: v for k, v in report.items() if k.startswith("seed")})

    # schedule: forced-alignment warmup (the renderer's known geometry)
    # breaks CTC's blank-collapse saddle — measured: plain CTC from random
    # init drives the encoder frame-CONSTANT (frame-to-frame logit var
    # 1e-6) and never recovers; then plain CTC + decoder CE fine-tune.
    # The conv stem trains too (its seed content signal is ~7x below the
    # positional encoding).
    hist = T.train(model, train_set, epochs=44, batch_size=16, lr=3e-3,
                   train_stem=True, align_epochs=30, lr_decay_at=(0.75, 0.92))
    report["loss_history"] = [[round(a, 4), round(b, 4)] for a, b in hist]

    for method in ("ctc", "decoder", "beam"):
        lim = 64 if method != "ctc" else None
        report[f"trained_cer_{method}"] = round(
            T.evaluate_cer(model, heldout, method=method, limit=lim), 4
        )
    report["train_sec"] = round(time.monotonic() - t0, 1)
    print("trained CER:", {k: v for k, v in report.items() if k.startswith("trained")})

    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    save_model(model, out)
    with open(out + "_train_report.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
