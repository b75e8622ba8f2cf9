"""Committed board-size-transfer artifact stays honest (ref the
reference's ``Plots/sizes`` experiments + ``Plots/PlotMaker.py:20-35``:
nets trained on small maps evaluated on larger ones).

``runs/scs_solo_rvp_r4/plots/size_sweep.json`` is written by testing
preset 3: a 5x5-trained solo-scout net (trained with PER-GAME VP
randomization — without it the scout memorizes one route and transfers
nothing, see SCSGame.randomize_vp) evaluated UNCHANGED on 5..15 boards
(turn limit scaled ceil(7*size/5), VPs randomized per game) at several
test-time recurrent-iteration counts.

Reproduce:
    python run.py --training-preset 3 --train-config scs_small_prog.yaml \
        --name scs_solo_rvp_r5
    python run.py --testing-preset 3 --name scs_solo_rvp_r5
"""

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


_CANDIDATES = ("scs_solo_rvp_r5", "scs_solo_rvp_r4")


def _curves(run=None):
    if run is None:
        run = next(
            (
                n
                for n in _CANDIDATES
                if os.path.exists(
                    os.path.join(REPO, "runs", n, "plots", "size_sweep.json")
                )
            ),
            _CANDIDATES[0],
        )
    path = os.path.join(REPO, "runs", run, "plots", "size_sweep.json")
    if not os.path.exists(path):
        pytest.skip(f"no committed size-sweep data for {run}")
    with open(path) as f:
        data = json.load(f)
    return {
        label: {r["board_size"]: r["p1_wr"] for r in results}
        for label, results in data["curves"].items()
    }


def test_size_sweep_has_expected_grid():
    curves = _curves()
    assert len(curves) >= 2  # several iteration counts
    for label, wr in curves.items():
        assert set(wr) == {5, 7, 9, 11, 13, 15}, (label, wr)


def test_trained_size_is_solved():
    curves = _curves()
    # On the training size the best iteration count wins outright
    # (committed r5 curve: 1.00 at 2 and 6 iterations; 24 iterations
    # shows the overthinking collapse — 0.47 even at 5x5 — which is
    # exactly the DeepThinking regression the iteration sweep exists to
    # expose, so it is pinned as a property, not averaged away).
    assert max(wr[5] for wr in curves.values()) >= 0.95, curves
    solved = [wr for wr in curves.values() if wr[5] >= 0.95]
    assert len(solved) >= 2, curves


def test_transfer_to_larger_boards():
    """The headline claim: the 5x5-trained strategy transfers to larger
    boards — only when trained with per-game VP randomization (the
    round-4 fixed-VP control won 100% at 5x5 and 0% everywhere else).
    Committed r5 curve (best over iteration counts): 0.83 at 7x7,
    0.72 at 9x9, 0.48-0.56 at 11-15 — a degradation profile like the
    reference's Plots/sizes curves, with stronger far transfer than the
    round-4 run (0.22 at 11-15)."""
    curves = _curves()
    best_per_size = {
        s: max(wr[s] for wr in curves.values())
        for s in (5, 7, 9, 11, 13, 15)
    }
    # Strong at 1.4x the training size, majority at ~2x...
    assert best_per_size[7] >= 0.75, best_per_size
    assert best_per_size[9] >= 0.6, best_per_size
    # ...and real far transfer (the honest degradation beyond that
    # lives in the JSON — the curve IS the artifact).
    assert best_per_size[15] >= 0.3, best_per_size
