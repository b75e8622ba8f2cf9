from nuzero_tpu.envs.base import Env
from nuzero_tpu.envs.tictactoe import TicTacToe, TTTState

__all__ = ["Env", "TicTacToe", "TTTState"]
