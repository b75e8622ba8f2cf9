"""Driver benchmark: MCTS-backed self-play throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures the lockstep self-play engine (batched MCTS + batched NN
inference) on Tic-Tac-Toe — the reference's equivalent hot path is the
Gamer/Explorer loop with batch-1 torch inference per leaf
(ref Training/Gamer.py:39-97, Search/Explorer.py:40-67).
vs_baseline compares against the BASELINE.md target of 100k MCTS-backed
env-steps/s per host (each MCTS simulation advances at least one env step
on a scratch state, so sims/s lower-bounds in-search env-steps/s).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

from nuzero_tpu.envs import TicTacToe
from nuzero_tpu.networks import MLPNetwork, NetworkManager
from nuzero_tpu.search import SearchParams
from nuzero_tpu.training.selfplay import init_selfplay, make_selfplay_step


def main():
    batch = int(os.environ.get("BENCH_BATCH", 1024))
    sims = int(os.environ.get("BENCH_SIMS", 100))
    reps = int(os.environ.get("BENCH_REPS", 5))

    env = TicTacToe()
    mgr = NetworkManager(MLPNetwork(out_features=9), env.observation_shape)
    variables = mgr.init(jax.random.key(0))

    def net(v, obs):
        p, val, _ = mgr.apply(v, obs)
        return p, val

    params = SearchParams(num_simulations=sims)
    step = jax.jit(
        make_selfplay_step(env, net, params),
        donate_argnums=(1,),
    )
    sp = init_selfplay(env, batch, jax.random.key(1), search_params=params)

    # Warmup/compile.
    sp, _, stats = step(variables, sp)
    jax.block_until_ready(stats["finished"])

    t0 = time.perf_counter()
    for _ in range(reps):
        sp, _, stats = step(variables, sp)
    jax.block_until_ready(stats["finished"])
    dt = (time.perf_counter() - t0) / reps

    sims_per_s = batch * sims / dt
    print(
        json.dumps(
            {
                "metric": "mcts_backed_env_steps_per_s_per_chip",
                "value": round(sims_per_s, 1),
                "unit": "env-steps/s (MCTS simulations/s, TTT B=%d sims=%d)"
                % (batch, sims),
                "vs_baseline": round(sims_per_s / 100_000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
