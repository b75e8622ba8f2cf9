from nuzero_tpu.training.replay import ReplayBuffer, FinishedGames
from nuzero_tpu.training.selfplay import SelfplayState, make_selfplay_step
from nuzero_tpu.training.learner import Learner, LearnerConfig, TrainState
from nuzero_tpu.training.pipeline import AlphaZero

__all__ = [
    "AlphaZero",
    "FinishedGames",
    "Learner",
    "LearnerConfig",
    "ReplayBuffer",
    "SelfplayState",
    "TrainState",
    "make_selfplay_step",
]
