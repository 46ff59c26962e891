"""Laws for the stage-5e hard-negative mining tooling
(scripts/stage5e_mine.py, scripts/stage5e_finetune.py).

The mining loop trains the recognizer on its OWN decode failures, so
the one invariant that keeps the zero-miss artifact gate honest is:
no line any gate evaluation holds out may ever enter the training set.
`heldout_exclusions()` encodes the gate families' held-out seeds; these
tests pin that encoding to the families' ACTUAL defaults so a seed
change in operators/train.py cannot silently decouple the two.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from scripts.stage5e_mine import gen_lines, heldout_exclusions
from scripts.stage5e_finetune import mined_probe_lines, prefix_variants


@pytest.fixture(scope="module")
def exclusions():
    return heldout_exclusions()


def test_exclusions_cover_every_gate_familys_heldout_lines(exclusions):
    """The exclusion set must contain the exact line texts the gate's
    held-out evaluations use — generated here through the SAME crop
    functions the gate calls, at their default seeds (train sets kept
    tiny; held-out size is fixed inside each crops function)."""
    from kiri_ocr_spark.operators import train as T
    from kiri_ocr_spark.operators.model import load_model

    tok = load_model("models/trained_full").tok
    heldouts = {
        "coverage": T.charset_coverage_crops(tok, n_train=2)[1],
        "adjacency": T.charset_adjacency_crops(tok, n_train=2)[1],
        "interior": T.charset_interior_crops(tok, n_train=2)[1],
        "trigram": T.charset_trigram_crops(tok, n_train=2)[1],
        "thinpair": T.charset_thinpair_crops(tok, n_train=2)[1],
    }
    for fam, crops in heldouts.items():
        texts = {s[0] for s in crops}
        leaked = texts - exclusions
        assert not leaked, f"{fam}: {len(leaked)} held-out lines not excluded"


def test_exclusions_cover_pattern_family_full_draw(exclusions):
    """Pattern held-out is a SLICE of one seed-71 draw whose split point
    (n_train) varies per stage invocation — the exclusion must cover the
    whole draw up to the largest split any stage used (1000) plus the
    100-line held-out tail."""
    from kiri_ocr_spark.operators import train as T

    draw = T.charset_pattern_lines(1100, 71)
    assert set(draw) <= exclusions


def test_mining_generators_never_emit_excluded_lines(exclusions):
    """End-to-end: nothing the miner generates collides with a gate
    held-out line even BEFORE the explicit filter (seeds are disjoint);
    the filter is belt-and-braces, not load-bearing."""
    lines = gen_lines(600, seed=3001)
    assert not set(lines) & exclusions
    probe = mined_probe_lines(300, seed=4001)
    assert not set(probe) & exclusions


def test_prefix_variants_keep_the_failing_tail_and_vary_context():
    """Oversampling a mined miss must preserve the failing cluster (the
    final word) verbatim while actually varying the prefix."""
    line = "EKឌ? 9+eឍ_X ណi("
    vs = prefix_variants(line, 20, seed=5000)
    assert vs[0] == line  # the mined line itself is kept
    assert all(v.split(" ")[-1] == "ណi(" for v in vs)
    assert len(set(vs)) >= 18  # redraws genuinely vary
    # deterministic for a fixed seed (artifact reproducibility)
    assert vs == prefix_variants(line, 20, seed=5000)
