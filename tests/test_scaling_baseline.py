"""BENCH/BASELINE.md curation contract: scripts/scaling.py regenerates
only its own §1-4 run report; everything below the HISTORY marker
(failing readings, cross-run variance tables, prior-round evidence) must
survive a rewrite. Regression for the round-5 incident where a fresh
scaling run wholesale-rewrote the file and dropped four rounds of
recorded history."""

import importlib.util
import os

import pytest

_SCALING = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts",
    "scaling.py",
)


@pytest.fixture(scope="module")
def scaling():
    spec = importlib.util.spec_from_file_location("scaling", _SCALING)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_history_preserved_from_marker(scaling):
    prev = (
        "# BENCH/BASELINE — two-cluster-size scaling evidence\n"
        "## 1. The gate\nfresh numbers here\n\n"
        f"{scaling.HISTORY_MARKER}\n\n"
        "## Cross-run variance (recorded, not hidden)\n"
        "| run | nominal |\n|---|---|\n| 1 | 0.913 PASS |\n"
    )
    kept = scaling.preserved_history(prev)
    assert kept.startswith(scaling.HISTORY_MARKER)
    assert "Cross-run variance" in kept
    assert "0.913 PASS" in kept
    assert "fresh numbers" not in kept


def test_no_marker_means_nothing_preserved(scaling):
    assert scaling.preserved_history("## 1. The gate\nonly a run report\n") == ""


def test_repo_baseline_carries_the_marker_and_history(scaling):
    """The checked-in BASELINE.md must actually use the mechanism."""
    path = os.path.join(os.path.dirname(_SCALING), "..", "BENCH", "BASELINE.md")
    text = open(path).read()
    kept = scaling.preserved_history(text)
    assert scaling.HISTORY_MARKER in text
    assert "Cross-run variance" in kept
