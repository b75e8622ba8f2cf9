"""Committed contested-map SCS learning artifact stays honest.

The reference ships trained two-sided SCS models (``Games/SCS/models/``,
mirrored/randomized presets ``Run.py:137-156``) but no learning curves;
``runs/scs_contested256_r5`` commits the journal of a contested
open_field_5 run at the reference's FLAGSHIP model scale (256-filter hex
trunk, ref Run.py:148, bf16 compute) — training preset 2 +
configs/training/scs_contested.yaml — whose in-loop eval tracks strength
vs random AND vs the scripted GoalRush baseline on both seats
(Testing.goal_rush_opponent).

Reproduce:
    python run.py --training-preset 2 --train-config scs_contested.yaml \
        --filters 256 --net-dtype bfloat16 --name scs_contested256_r5
"""

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CANDIDATES = ("scs_contested256_r5", "scs_contested_r4")
RUN = next(
    (
        os.path.join(REPO, "runs", n)
        for n in _CANDIDATES
        if os.path.exists(os.path.join(REPO, "runs", n, "journal.jsonl"))
    ),
    os.path.join(REPO, "runs", _CANDIDATES[0]),
)


def _records():
    path = os.path.join(RUN, "journal.jsonl")
    if not os.path.exists(path):
        pytest.skip("no committed contested-run journal")
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def test_contested_learning_vs_goal_rush():
    recs = _records()
    gr = [r for r in recs if "wr/policy_vs_gr_as_p0" in r]
    assert gr, "journal has no GoalRush eval records"
    # Untrained baseline (step 0): the raw policy LOSES to GoalRush.
    base = gr[0]
    assert base["step"] == 0
    assert base["nonloss/policy_vs_gr_as_p1"] <= 0.30, base
    # Trained: the RAW policy stops losing to GoalRush on BOTH seats
    # (committed 256f curve: 1.00/0.97 at step 150, 0.97/0.95 at 200 —
    # the flagship net converts most games to draws on the draw-heavy
    # open-field map; outright wins appear as P1).
    strong = [
        r
        for r in gr
        if r.get("nonloss/policy_vs_gr_as_p0", 0) >= 0.95
        and r.get("nonloss/policy_vs_gr_as_p1", 0) >= 0.95
    ]
    assert strong, "policy never reached 95%/95% non-loss vs GoalRush"
    # Outright wins are learned too (some eval wins >= 10% of games on a
    # seat; committed curve: 0.19 as P1 at 175, MCTS 0.25 at 200).
    wins = [
        r
        for r in gr
        for tag in ("policy", "mcts")
        if max(
            r.get(f"wr/{tag}_vs_gr_as_p0", 0),
            r.get(f"wr/{tag}_vs_gr_as_p1", 0),
        )
        >= 0.10
    ]
    assert wins, "no eval ever won >=10% of games vs GoalRush"


def test_contested_learning_vs_random():
    recs = _records()
    rnd = [r for r in recs if "nonloss/policy_as_p0" in r and r["step"] > 0]
    assert rnd
    best = max(
        min(r["nonloss/policy_as_p0"], r["nonloss/policy_as_p1"]) for r in rnd
    )
    assert best >= 0.95, best


def test_contested_loss_decreases():
    recs = _records()
    losses = [r["loss/combined"] for r in recs if "loss/combined" in r]
    assert len(losses) >= 50
    early = sum(losses[:10]) / 10
    late = sum(losses[-10:]) / 10
    assert late < 0.7 * early, (early, late)
