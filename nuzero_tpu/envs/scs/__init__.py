from nuzero_tpu.envs.scs.scenario import Scenario, load_scenario
from nuzero_tpu.envs.scs.game import SCSGame, SCSState

__all__ = ["SCSGame", "SCSState", "Scenario", "load_scenario"]
