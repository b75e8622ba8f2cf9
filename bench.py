"""Driver benchmark: MCTS-backed self-play throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "secondary": {...}}

Two measurements, matching BASELINE.md's benchmark configs:
- PRIMARY — SCS 5x5 map + hex-conv DeepThinking RecurrentNet (BASELINE
  config 3, the throughput bar's named workload: ">=100k MCTS-backed
  env-steps/s per host on small SCS maps").
- secondary — TTT + MLP (BASELINE config 2's batched-MCTS case; also the
  round-1 primary, kept for continuity).

The reference's equivalent hot path is the Gamer/Explorer loop with batch-1
torch inference per leaf (ref Training/Gamer.py:39-97,
Search/Explorer.py:40-67).  Each MCTS simulation advances at least one env
step on a scratch state, so sims/s lower-bounds in-search env-steps/s.

Env knobs: BENCH_BATCH/BENCH_SIMS/BENCH_REPS (TTT),
BENCH_SCS_BATCH/BENCH_SCS_SIMS (SCS), BENCH_TRACE_DIR (jax.profiler trace),
BENCH_SKIP_SCS=1 to skip the SCS leg.
"""

import contextlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax


def measure_selfplay(env, net, variables, batch, sims, reps):
    from nuzero_tpu.search import SearchParams
    from nuzero_tpu.training.selfplay import init_selfplay, make_selfplay_step

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
    return batch * sims / dt


def bench_ttt():
    from nuzero_tpu.envs import TicTacToe
    from nuzero_tpu.networks import MLPNetwork, NetworkManager

    batch = int(os.environ.get("BENCH_BATCH", 1024))
    sims = int(os.environ.get("BENCH_SIMS", 100))
    reps = int(os.environ.get("BENCH_REPS", 5))

    env = TicTacToe()
    mgr = NetworkManager(MLPNetwork(out_features=9), env.observation_shape)
    variables = mgr.init(jax.random.key(0))

    def net(v, obs):
        p, val, _ = mgr.apply(v, obs)
        return p, val

    return measure_selfplay(env, net, variables, batch, sims, reps), batch, sims


def bench_scs():
    from nuzero_tpu.envs.scs import SCSGame, load_scenario
    from nuzero_tpu.networks import NetworkManager, RecurrentNet

    batch = int(os.environ.get("BENCH_SCS_BATCH", 256))
    sims = int(os.environ.get("BENCH_SCS_SIMS", 30))
    reps = int(os.environ.get("BENCH_REPS", 5))

    scenario = load_scenario(
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "configs", "scenarios", "open_field_5.yml",
        ),
        seed=42,
    )
    env = SCSGame(scenario)
    net_mod = RecurrentNet(
        policy_channels=env.action_space_shape[0],
        num_filters=64,
        num_blocks=2,
        hex=True,
    )
    mgr = NetworkManager(net_mod, env.observation_shape)
    variables = mgr.init(jax.random.key(0))

    def net(v, obs):
        p, val, _ = mgr.apply(v, obs, iters_to_do=2)
        return p, val

    return measure_selfplay(env, net, variables, batch, sims, reps), batch, sims


def main():
    trace_dir = os.environ.get("BENCH_TRACE_DIR")
    ctx = contextlib.nullcontext()
    if trace_dir:
        from nuzero_tpu.utils.profiling import trace_capture

        ctx = trace_capture(trace_dir)

    with ctx:
        ttt_rate, ttt_b, ttt_s = bench_ttt()
        if os.environ.get("BENCH_SKIP_SCS"):
            scs_rate, scs_b, scs_s = 0.0, 0, 0
        else:
            scs_rate, scs_b, scs_s = bench_scs()

    secondary = {
        "metric": "ttt_mcts_env_steps_per_s_per_chip",
        "value": round(ttt_rate, 1),
        "unit": "env-steps/s (MCTS sims/s, TTT+MLP B=%d sims=%d)"
        % (ttt_b, ttt_s),
        "vs_baseline": round(ttt_rate / 100_000.0, 3),
    }
    if scs_rate:
        print(
            json.dumps(
                {
                    "metric": "scs_mcts_env_steps_per_s_per_chip",
                    "value": round(scs_rate, 1),
                    "unit": "env-steps/s (MCTS sims/s, SCS 5x5 hex-RecurrentNet "
                    "B=%d sims=%d)" % (scs_b, scs_s),
                    "vs_baseline": round(scs_rate / 100_000.0, 3),
                    "secondary": secondary,
                }
            )
        )
    else:
        print(json.dumps(secondary))


if __name__ == "__main__":
    main()
