"""Learning-milestone regression (BASELINE.md bar): a TTT agent reaches
>=95% non-loss vs random within a fixed step budget using the reference's
best recipe (ref Games/Tic_Tac_Toe/models/best_ttt_config: 100 sims, SGD
lr 0.1, window 5000, 4x1024 samples/step).

Slow (minutes of self-play + training): run with NUZERO_SLOW=1, e.g.
    NUZERO_SLOW=1 python -m pytest tests/test_learning_milestone.py -q
The committed run artifact runs/ttt_best_r2/ (journal + plots) is the
standing evidence; this test reproduces it end-to-end.
"""

import os

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("NUZERO_SLOW"),
    reason="slow learning run; set NUZERO_SLOW=1 to enable",
)


def test_ttt_reaches_95_percent_nonloss(tmp_path):
    import jax

    from nuzero_tpu.config import load_search_config, load_training_config
    from nuzero_tpu.envs import TicTacToe
    from nuzero_tpu.networks import MLPNetwork, NetworkManager
    from nuzero_tpu.training import AlphaZero

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_training_config(
        os.path.join(repo, "configs", "training", "ttt_default.yaml")
    )
    search = load_search_config(
        os.path.join(repo, "configs", "search", "ttt_search.yaml")
    )
    env = TicTacToe()
    mgr = NetworkManager(MLPNetwork(out_features=9), env.observation_shape)
    az = AlphaZero(env, mgr, cfg, search, run_dir=str(tmp_path))
    az.run(seed=0)

    records = az.journal.load()
    # The milestone: MCTS agent >=95% non-loss on both seats at some eval
    # point within the budget (BASELINE.md).
    hits = [
        r
        for r in records
        if r.get("nonloss/mcts_as_p0", 0) >= 0.95
        and r.get("nonloss/mcts_as_p1", 0) >= 0.95
    ]
    assert hits, "MCTS agent never reached 95% non-loss on both seats"
    # And the raw policy network itself must have LEARNED: policy loss
    # drops well below uniform (ln 9 / ln 9 = 1.0 normalized) and the
    # second-seat non-loss rate improves over the untrained baseline.
    losses = [r["loss/policy"] for r in records if "loss/policy" in r]
    assert losses[-1] < 0.5 * losses[0]
    p1_curve = [
        r["nonloss/policy_as_p1"]
        for r in records
        if "nonloss/policy_as_p1" in r
    ]
    assert max(p1_curve[-3:]) > p1_curve[0] + 0.05
