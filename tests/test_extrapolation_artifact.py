"""Committed DeepThinking-extrapolation artifacts stay honest: the sweep
JSON saved by testing preset 2 must show the trained solo-scout policy
extrapolating its 2-iteration strategy across test-time iteration counts
(ref the reference's Plots/_graph_data curves)."""

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(run):
    path = os.path.join(REPO, "runs", run, "plots", "iteration_sweep.json")
    if not os.path.exists(path):
        pytest.skip(f"no committed sweep data for {run}")
    with open(path) as f:
        return {r["iterations"]: r["p1_wr"] for r in json.load(f)["results"]}


def test_solo_extrapolation_alpha0():
    wr = _load("scs_solo_r3")
    # Trained at 2 iterations: perfect through at least 4x the training
    # count...
    for it in (2, 4, 6, 8):
        assert wr[it] >= 0.9, (it, wr)
    # ...and the alpha=0 overthinking collapse appears by 20 iterations
    # (the regression the progressive loss exists to fix).
    assert min(wr[18], wr[20]) <= 0.5, wr


def test_solo_extrapolation_progressive_loss_fixes_overthinking():
    """alpha=0.5 progressive loss (trained at 6 iterations) removes the
    overthinking collapse entirely — the reference's core DeepThinking
    claim (ref AlphaZero.py:941-955 + the reduce_prog curve data)."""
    wr = _load("scs_solo_prog_r3")
    for it, v in wr.items():
        assert v >= 0.9, (it, wr)
