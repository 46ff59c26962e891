#!/usr/bin/env python
"""Charset-coverage fine-tune: teach the trained recognizer its FULL
glyph system.

The fixture corpora cover only 24/146 charset glyphs (lowercase a-w +
y), so the corpus-trained artifact cannot classify digits, punctuation,
uppercase or any of the Khmer block — while the reference's model is a
production Khmer+Latin recognizer over exactly this charset
(/root/reference/kiri_ocr/model.py vocab). This stage fine-tunes the
shipped artifact on the corpus train splits PLUS seeded synthetic lines
that cover every glyph ~uniformly (train.charset_coverage_crops), then
reports held-out CER on BOTH distributions — corpus exactness must
survive, coverage CER must drop from ~1.0 (unseen glyphs) to ~0.

Writes to a SEPARATE prefix by default so the shipped artifact is only
replaced after the full oracle sweep validates the candidate.

Usage: python scripts/charset_finetune.py [out_prefix] [epochs]
       [in_prefix] [n_cov_train] [corpus_keep] [lr] [n_pattern] [n_adj]
       [n_interior]
Four documented stages reproduce the shipped artifact (the first
teaches the glyph classes from the corpus-converged artifact, the
second — coverage-heavy, corpus keep-alive subset — drives coverage
toward exactness, the third — full corpus + doubled coverage lines
at half lr — repairs the residual corpus/adjacency confusions the
second stage left at CER ~2e-4/3e-3, the fourth adds oracle-pattern
FAMILY lines (train.charset_pattern_lines; the oracle's own % 17 == 0
ids are excluded by construction) to repair the residual adjacency
bigrams uniform coverage under-samples — 'E<sym>' CTC-doubling and
'#41' digit-run insertions):
    python scripts/charset_finetune.py models/trained_full 5
    python scripts/charset_finetune.py models/trained_full 8 \
        models/trained_full 4000 2000
    python scripts/charset_finetune.py models/trained_full 6 \
        models/trained_full 8000 0 1e-4
    python scripts/charset_finetune.py models/trained_full 3 \
        models/trained_full 4000 0 5e-5 3000
The fifth stage (round 6) adds the symbol-adjacency bigram family
(train.charset_adjacency_lines — every ordered bigram with a symbol or
digit on either side, deck-exhaustive) to repair the stage-4 artifact's
4/200 residual coverage misses, all under-sampled symbol adjacencies:
    python scripts/charset_finetune.py models/trained_full_s5 3 \
        models/trained_full 4000 2000 5e-5 2000 4000
The sixth stage (5b) continues from the stage-5 candidate with the
interior-deletion family added; the seventh (5c) continues from 5b
with the wide-flank trigram family (train.charset_trigram_lines — the
5b residuals were both thin glyphs mis-segmented behind a wide Khmer
flank) at a gentler lr:
    python scripts/charset_finetune.py models/trained_full_s5b 2 \
        models/trained_full_s5 3000 2000 3e-5 1000 4000 4000
    python scripts/charset_finetune.py models/trained_full_s5c 2 \
        models/trained_full_s5b 3000 2000 2e-5 1000 2000 4000 4000
The chain continues past hand-designed families with HARD-EXAMPLE
MINING (scripts/stage5e_mine.py + scripts/stage5e_finetune.py): 5d
(thinpair family, lr 2e-5) was gate-REJECTED for wobbling corpus
exactness (models/trained_full_s5d_gate_result.json); 5e trained on
the 49 misses mined from 30k seeded lines (coverage 4/200 -> 0/200,
every deck 0.0); 5f repeats the loop on the shipped artifact's 124
misses from a 121k-line sweep. Every candidate passes
scripts/stage5_gate.py's zero-miss sweep before replacing the shipped
artifact.
Deterministic: fixed artifact input, seeded coverage lines, seeded
shuffle, no dropout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> int:
    out_prefix = sys.argv[1] if len(sys.argv) > 1 else "models/trained_full"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    in_prefix = sys.argv[3] if len(sys.argv) > 3 else "models/trained_small"
    n_cov_train = int(sys.argv[4]) if len(sys.argv) > 4 else 2000
    corpus_keep = int(sys.argv[5]) if len(sys.argv) > 5 else 0  # 0 = all
    lr = float(sys.argv[6]) if len(sys.argv) > 6 else 2e-4
    n_pattern = int(sys.argv[7]) if len(sys.argv) > 7 else 0
    n_adj = int(sys.argv[8]) if len(sys.argv) > 8 else 0
    n_interior = int(sys.argv[9]) if len(sys.argv) > 9 else 0
    n_trigram = int(sys.argv[10]) if len(sys.argv) > 10 else 0
    n_thinpair = int(sys.argv[11]) if len(sys.argv) > 11 else 0

    from kiri_ocr_spark.operators import train as T
    from kiri_ocr_spark.operators.model import load_model, save_model

    t0 = time.monotonic()
    model = load_model(in_prefix)
    # Candidate chains can start from artifacts predating shipped decode
    # knobs (stage-5e's meta carried CTC_RESCORE_GAMMA=0.0, so its beam
    # deck numbers measured the weaker gamma-0 selection — BASELINE.md
    # round-6 stage-5e note). Lift the SHIPPED deployment decode config
    # so reported beam CERs are deployment numbers.
    try:
        _shipped = json.load(open("models/trained_full_meta.json"))["config"]
        for _k in ("CTC_FUSION_ALPHA", "CTC_RESCORE_GAMMA"):
            if _k in _shipped:
                setattr(model.cfg, _k, _shipped[_k])
    except (FileNotFoundError, KeyError, ValueError):
        pass
    corpus_train, corpus_held = [], []
    for d in SF_DIRS:
        tr, he = T.fixture_line_crops(d, tok=model.tok)
        corpus_train += tr
        corpus_held += he
    if corpus_keep:
        # deterministic keep-alive subset: corpus glyphs are already
        # converged; a stride sample keeps them from being forgotten
        # while coverage crops dominate the batches
        stride = max(1, len(corpus_train) // corpus_keep)
        corpus_train = corpus_train[::stride]
    cov_train, cov_held = T.charset_coverage_crops(model.tok,
                                                   n_train=n_cov_train)
    pat_train, pat_held = (
        T.charset_pattern_crops(model.tok, n_train=n_pattern)
        if n_pattern else ([], [])
    )
    adj_train, adj_held = (
        T.charset_adjacency_crops(model.tok, n_train=n_adj)
        if n_adj else ([], [])
    )
    int_train, int_held = (
        T.charset_interior_crops(model.tok, n_train=n_interior)
        if n_interior else ([], [])
    )
    tri_train, tri_held = (
        T.charset_trigram_crops(model.tok, n_train=n_trigram)
        if n_trigram else ([], [])
    )
    thp_train, thp_held = (
        T.charset_thinpair_crops(model.tok, n_train=n_thinpair)
        if n_thinpair else ([], [])
    )
    print(
        f"crops: corpus {len(corpus_train)}/{len(corpus_held)} "
        f"coverage {len(cov_train)}/{len(cov_held)} "
        f"pattern {len(pat_train)}/{len(pat_held)} "
        f"adjacency {len(adj_train)}/{len(adj_held)} "
        f"interior {len(int_train)}/{len(int_held)} "
        f"trigram {len(tri_train)}/{len(tri_held)} "
        f"thinpair {len(thp_train)}/{len(thp_held)}"
    )

    report = {
        "corpus_train": len(corpus_train), "corpus_heldout": len(corpus_held),
        "coverage_train": len(cov_train), "coverage_heldout": len(cov_held),
        "pattern_train": len(pat_train), "pattern_heldout": len(pat_held),
        "adjacency_train": len(adj_train), "adjacency_heldout": len(adj_held),
        "interior_train": len(int_train), "interior_heldout": len(int_held),
        "trigram_train": len(tri_train), "trigram_heldout": len(tri_held),
        "thinpair_train": len(thp_train), "thinpair_heldout": len(thp_held),
        "epochs": epochs, "lr": lr, "in_prefix": in_prefix,
    }
    evals = [("corpus", corpus_held), ("coverage", cov_held)]
    if n_pattern:
        evals.append(("pattern", pat_held))
    if n_adj:
        evals.append(("adjacency", adj_held))
    if n_interior:
        evals.append(("interior", int_held))
    if n_trigram:
        evals.append(("trigram", tri_held))
    if n_thinpair:
        evals.append(("thinpair", thp_held))
    for name, held in evals:
        report[f"pre_cer_ctc_{name}"] = round(
            T.evaluate_cer(model, held, method="ctc"), 5
        )
    print("pre:", {k: v for k, v in report.items() if k.startswith("pre")})

    # converged artifact + gentle lr: no alignment warmup needed (the
    # blank-collapse saddle threatens random inits; here the encoder
    # already aligns frames, CTC just learns the new glyph classes)
    hist = T.train(model,
                   corpus_train + cov_train + pat_train + adj_train
                   + int_train + tri_train + thp_train,
                   epochs=epochs, batch_size=16, lr=lr, train_stem=True,
                   align_epochs=0, lr_decay_at=(0.6,),
                   val_samples=corpus_held + cov_held + pat_held + adj_held
                   + int_held + tri_held + thp_held,
                   val_every=2)
    report["loss_history"] = [[round(a, 5), round(b, 5)] for a, b in hist]
    for name, held in evals:
        report[f"post_cer_ctc_{name}"] = round(
            T.evaluate_cer(model, held, method="ctc"), 5
        )
        report[f"post_cer_beam_{name}"] = round(
            T.evaluate_cer(model, held, method="beam", limit=48), 5
        )
    report["finetune_sec"] = round(time.monotonic() - t0, 1)
    save_model(model, out_prefix)
    with open(out_prefix + "_charset_report.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
