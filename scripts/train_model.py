#!/usr/bin/env python
"""Train the full-size numpy recognizer on fixture-rendered line crops
and save the artifact through the S3 loader (save_model), closing the
"trained weights are the one external input" gap with weights trained
IN-sandbox (reference training loop: training.py:758-860 — CTC +
teacher-forced CE; this is the same objective via numpy backprop).

Usage: python scripts/train_model.py [sf_dirs_comma_sep] [out_prefix]
Defaults: /root/testdata/sf0.001,/root/testdata/sf0.01  models/trained_small
(two corpora double the glyph x-phase coverage — a single-sf run left a
one-char generalization miss at sf0.1; held-out docs are excluded from
BOTH)

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
    sf_dirs = (
        sys.argv[1] if len(sys.argv) > 1
        else "/root/testdata/sf0.001,/root/testdata/sf0.01"
    ).split(",")
    sf_dir = sf_dirs[0]  # held-out CER is reported on the first corpus
    out = sys.argv[2] if len(sys.argv) > 2 else "models/trained_small"

    from kiri_ocr_spark.operators import train as T
    from kiri_ocr_spark.operators.model import CFG, NumpyKiriModel, save_model

    t0 = time.monotonic()
    # space-augmented charset: the glyph set has no space glyph, so the
    # base tokenizer can only map ' ' to unk (dropped at decode). Adding
    # ' ' to the model vocab lets the forced-alignment warmup label the
    # SPACE_GAP frames and the CTC head emit real spaces — without it the
    # best reachable CER is the space-deletion floor (~0.1 on this corpus).
    from kiri_ocr_spark.imaging.glyphs import CHARSET

    cfg = CFG()
    cfg.charset = list(CHARSET) + [" "]
    model = NumpyKiriModel(cfg)
    train_set, heldout = [], []
    for d in sf_dirs:
        tr, he = T.fixture_line_crops(d, tok=model.tok)
        train_set += tr
        heldout += he if d == sf_dir else []
    # supplemental short-token crops: 'a a'-style lines (two 1-2 char
    # words) are the rarest layout in the corpora — sparse enough that a
    # larger-sf line decoded without its space — so cover every short
    # token pair explicitly, plain and tinted
    short = sorted({w for line, *_ in train_set for w in line.split()
                    if len(w) <= 2})
    for t in short:
        for u in short:
            train_set.append(T.render_crop(f"{t} {u}", model.tok))
            train_set.append(T.render_crop(f"{t} {u}", model.tok, tinted=True))
    print(f"crops: train={len(train_set)} heldout={len(heldout)} "
          f"(short tokens: {short})")
    report = {"sf_dir": sf_dir, "train": len(train_set), "heldout": len(heldout),
              "train_stem": True, "short_tokens": short}
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
    val_history: list = []
    hist = T.train(model, train_set, epochs=28, batch_size=16, lr=3e-3,
                   train_stem=True, align_epochs=18, lr_decay_at=(0.93,),
                   val_samples=heldout, val_every=4, val_history=val_history)
    report["loss_history"] = [[round(a, 4), round(b, 4)] for a, b in hist]
    report["val_history"] = val_history  # A13: (epoch, ctc_cer, exact_rate)

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
