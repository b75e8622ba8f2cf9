from nuzero_tpu.evaluation.agents import (
    Agent,
    GoalRushAgent,
    MctsAgent,
    PolicyAgent,
    RandomAgent,
)
from nuzero_tpu.evaluation.arena import MatchStats, play_matches
from nuzero_tpu.evaluation.manager import TestManager

__all__ = [
    "Agent",
    "GoalRushAgent",
    "MatchStats",
    "MctsAgent",
    "PolicyAgent",
    "RandomAgent",
    "TestManager",
    "play_matches",
]
