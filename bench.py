"""Driver benchmark: MCTS-backed self-play throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "mfu_pct": ..., "trials": [...], "secondary": {...}}

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

Methodology (hardened after BENCH_r02's 1500x secondary-leg flake):
- N timed trials (default 4), each of ``reps`` full move-batches with
  ``jax.block_until_ready`` on the ENTIRE carried self-play state per
  trial — nothing can be timed while still in flight.
- The reported value is the MEDIAN trial rate; min/max/spread ship in the
  JSON so a flaky trial is visible instead of silently reported.
- Plausibility invariants — violations mark the output
  ``"suspect": true`` (and say why) rather than printing a wrong number
  as fact:
  * trial spread (max/min) must be < 2x,
  * measured rate must be positive/finite and below an analytic
    speed-of-light bound (network FLOPs alone at the chip's peak),
  * the self-play state must actually advance (total_moves grows by
    exactly batch * reps per trial).
- MFU: model FLOPs (XLA cost analysis of one batched network apply) x
  evals/s / chip peak.  Search/env overhead EXCLUDED — this is utilization
  on useful network math, the number to drive up.

Legs: PRIMARY scs (64f f32), secondary ttt4096 (BASELINE config 2's 4096
parallel games — the stable TTT number), ttt1024 (auxiliary; B=1024 TTT,
noisy on the shared tunnel), scs256 (the reference's flagship 256-filter
trunk, ref Run.py:148, in bf16 compute), scs256_b1024 (flagship batch-
scaling check: B=1024 must hold >= B=512).

Env knobs: BENCH_BATCH/BENCH_SIMS (TTT), BENCH_BATCH4096,
BENCH_SCS_BATCH/BENCH_SCS_SIMS/BENCH_SCS_FILTERS/BENCH_SCS_DTYPE,
BENCH_REPS/BENCH_TRIALS, BENCH_TRACE_DIR (jax.profiler trace),
BENCH_SKIP_{TTT,TTT4096,SCS,SCS256,SCS256B1024}=1 to skip a leg.
"""

import contextlib
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Persistent XLA compile cache: the tunnel TPU backend compiles the big
# self-play program in minutes; identical re-runs then hit this cache.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

import jax

# bf16 peak of the bench chip.  TPU v5e: 197 TFLOP/s bf16 / 394 int8
# (public spec); fall back to a v5e-like figure for unknown kinds so the
# MFU figure stays conservative rather than absent.
_PEAK_FLOPS = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
}


def chip_peak_flops() -> float:
    kind = jax.devices()[0].device_kind
    for k, v in _PEAK_FLOPS.items():
        if kind.startswith(k):
            return v
    return 197e12


def net_flops_per_apply(apply_fn, variables, obs) -> float:
    """Model FLOPs of ONE batched network apply via XLA cost analysis."""
    try:
        compiled = jax.jit(apply_fn).lower(variables, obs).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


#: Suspect gate on trial spread (max/min).  BENCH_r03's secondary leg sat
#: at 1.499 — wide enough to hide a 30% regression — so the gate is now
#: 1.25 with automatic extended warm-up: extra trials run (oldest dropped)
#: until the reported window is consistent or the retry budget is spent.
SPREAD_GATE = 1.25
MAX_EXTRA_TRIALS = 4


def measure_selfplay(env, net, variables, batch, sims, reps, trials,
                     max_trajectory_length=0):
    from nuzero_tpu.search import SearchParams
    from nuzero_tpu.training.selfplay import init_selfplay, make_selfplay_step

    params = SearchParams(num_simulations=sims)
    step = jax.jit(
        make_selfplay_step(env, net, params),
        donate_argnums=(1,),
    )
    sp = init_selfplay(
        env, batch, jax.random.key(1),
        trajectory_capacity=max_trajectory_length,
        search_params=params,
    )

    # Warmup/compile (2 steps: the second runs the steady-state program).
    for _ in range(2):
        sp, _, stats = step(variables, sp)
    sp = jax.block_until_ready(sp)

    rates, problems = [], []
    for _t in range(trials + MAX_EXTRA_TRIALS):
        moves_before = int(sp.total_moves)
        t0 = time.perf_counter()
        for _ in range(reps):
            sp, _, stats = step(variables, sp)
        sp = jax.block_until_ready(sp)  # full state, not one scalar
        dt = (time.perf_counter() - t0) / reps
        rates.append(batch * sims / dt)
        advanced = int(sp.total_moves) - moves_before
        if advanced != batch * reps:
            problems.append(
                f"state did not advance as expected ({advanced} moves, "
                f"wanted {batch * reps})"
            )
        # Report the LAST `trials` measurements: if they are already
        # consistent, stop; otherwise earlier trials become extended
        # warm-up and another trial runs (VERDICT r3 weak #6).
        window = rates[-trials:]
        if len(rates) >= trials and max(window) / min(window) <= SPREAD_GATE:
            break
    window = rates[-trials:]

    median = statistics.median(window)
    lo, hi = min(window), max(window)
    if lo <= 0 or not all(map(lambda r: r == r and r != float("inf"), window)):
        problems.append("non-finite or non-positive trial rate")
    elif hi / lo > SPREAD_GATE:
        problems.append(
            f"trial spread {hi / lo:.2f}x exceeds {SPREAD_GATE}x "
            f"after {len(rates)} trials"
        )

    # Speed-of-light cross-check: sims/s cannot exceed what the chip could
    # do running ONLY the network math at peak.
    obs = jax.vmap(env.observe)(sp.games)
    f_apply = net_flops_per_apply(net, variables, obs)
    peak = chip_peak_flops()
    if f_apply > 0:
        sol_rate = peak / (f_apply / batch)  # evals/s at peak = sims/s bound
        if median > sol_rate:
            problems.append(
                f"rate {median:.3g}/s exceeds the speed-of-light bound "
                f"{sol_rate:.3g}/s (net {f_apply / batch:.3g} FLOP/eval at "
                f"{peak:.3g} FLOP/s peak)"
            )
    # Each simulation evaluates the network once (one batched call per sim).
    mfu_pct = 100.0 * median * (f_apply / batch) / peak if f_apply else None
    return {
        "rate": median,
        "trials": [round(r, 1) for r in window],
        "spread": round(hi / max(lo, 1e-9), 3),
        "mfu_pct": round(mfu_pct, 3) if mfu_pct is not None else None,
        "net_flops_per_eval": round(f_apply / batch, 1) if f_apply else None,
        "problems": problems,
    }


def bench_ttt():
    from nuzero_tpu.envs import TicTacToe
    from nuzero_tpu.networks import MLPNetwork, NetworkManager

    batch = int(os.environ.get("BENCH_BATCH", 1024))
    sims = int(os.environ.get("BENCH_SIMS", 100))
    reps = int(os.environ.get("BENCH_REPS", 3))
    trials = int(os.environ.get("BENCH_TRIALS", 4))

    env = TicTacToe()
    mgr = NetworkManager(MLPNetwork(out_features=9), env.observation_shape)
    variables = mgr.init(jax.random.key(0))

    def net(v, obs):
        p, val, _ = mgr.apply(v, obs)
        return p, val

    # The TTT move-batch is sub-second; at 3 reps/trial the remote-tunnel
    # dispatch jitter dominated (BENCH_r03 spread 1.50, r4 first cut
    # 1.61).  Longer trials average it out.
    reps = max(reps, 10)
    return measure_selfplay(env, net, variables, batch, sims, reps, trials), batch, sims


def bench_ttt_4096():
    """BASELINE config 2: TTT batched MCTS at 4096 parallel games."""
    from nuzero_tpu.envs import TicTacToe
    from nuzero_tpu.networks import MLPNetwork, NetworkManager

    batch = int(os.environ.get("BENCH_BATCH4096", 4096))
    sims = int(os.environ.get("BENCH_SIMS", 100))
    reps = int(os.environ.get("BENCH_REPS", 3))
    trials = int(os.environ.get("BENCH_TRIALS", 4))

    env = TicTacToe()
    mgr = NetworkManager(MLPNetwork(out_features=9), env.observation_shape)
    variables = mgr.init(jax.random.key(0))

    def net(v, obs):
        p, val, _ = mgr.apply(v, obs)
        return p, val

    return measure_selfplay(env, net, variables, batch, sims, reps, trials), batch, sims


def bench_scs(filters=None, dtype=None, batch=None):
    import jax.numpy as jnp

    from nuzero_tpu.envs.scs import SCSGame, load_scenario
    from nuzero_tpu.networks import NetworkManager, RecurrentNet

    filters = filters or int(os.environ.get("BENCH_SCS_FILTERS", 64))
    batch = batch or int(os.environ.get("BENCH_SCS_BATCH", 512))
    sims = int(os.environ.get("BENCH_SCS_SIMS", 30))
    reps = int(os.environ.get("BENCH_REPS", 3))
    trials = int(os.environ.get("BENCH_TRIALS", 4))
    dtype = dtype or os.environ.get("BENCH_SCS_DTYPE", "float32")

    scenario = load_scenario(
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "configs", "scenarios", "open_field_5.yml",
        ),
        seed=42,
    )
    env = SCSGame(scenario)
    if filters <= 64:
        # The 64f program is dispatch-dominated (many small kernels, ~106
        # ms/batch): short trials ride the tunnel's multi-second latency
        # swings (a 3-rep run measured spread 1.36 in a noisy window;
        # 12-rep trials measured 1.03 minutes later).  The 256f leg's
        # fatter kernels are stable at 3 reps.
        reps = max(reps, 12)
    net_mod = RecurrentNet(
        policy_channels=env.action_space_shape[0],
        num_filters=filters,
        num_blocks=2,
        hex=True,
        dtype=jnp.dtype(dtype),
    )
    mgr = NetworkManager(net_mod, env.observation_shape)
    variables = mgr.init(jax.random.key(0))

    def net(v, obs):
        p, val, _ = mgr.apply(v, obs, iters_to_do=2)
        return p, val

    return measure_selfplay(env, net, variables, batch, sims, reps, trials), batch, sims


def _leg_json(metric, res, batch, sims, tag):
    out = {
        "metric": metric,
        "value": round(res["rate"], 1),
        "unit": "env-steps/s (MCTS sims/s, %s B=%d sims=%d)" % (tag, batch, sims),
        "vs_baseline": round(res["rate"] / 100_000.0, 3),
        "trials": res["trials"],
        "spread": res["spread"],
        "mfu_pct": res["mfu_pct"],
    }
    if res["problems"]:
        out["suspect"] = True
        out["why_suspect"] = res["problems"]
    return out


def main():
    trace_dir = os.environ.get("BENCH_TRACE_DIR")
    ctx = contextlib.nullcontext()
    if trace_dir:
        from nuzero_tpu.utils.profiling import trace_capture

        ctx = trace_capture(trace_dir)

    with ctx:
        if os.environ.get("BENCH_SKIP_TTT"):
            ttt = None
        else:
            ttt_res, ttt_b, ttt_s = bench_ttt()
            ttt = _leg_json(
                "ttt_mcts_env_steps_per_s_per_chip", ttt_res, ttt_b, ttt_s,
                "TTT+MLP",
            )
        if os.environ.get("BENCH_SKIP_TTT4096"):
            ttt4096 = None
        else:
            # BASELINE config 2's 4096 parallel games (r3 verdict #3).
            t4_res, t4_b, t4_s = bench_ttt_4096()
            ttt4096 = _leg_json(
                "ttt4096_mcts_env_steps_per_s_per_chip", t4_res, t4_b, t4_s,
                "TTT+MLP",
            )
        if os.environ.get("BENCH_SKIP_SCS"):
            scs = None
        else:
            scs_res, scs_b, scs_s = bench_scs()
            scs = _leg_json(
                "scs_mcts_env_steps_per_s_per_chip", scs_res, scs_b, scs_s,
                "SCS 5x5 hex-RecurrentNet",
            )
        if os.environ.get("BENCH_SKIP_SCS256"):
            scs256 = None
        else:
            # The reference's FLAGSHIP model scale: 256-filter hex trunk
            # (ref Run.py:148,172,249), bf16 compute (r3 verdict #2).
            # B=768 is the measured best operating point for this leg
            # (r5: 104.4k vs 96.1k at 512 and 83.9k at 1024); the batch
            # is in the unit string and the b1024 leg below keeps the
            # batch-scaling behavior visible.
            s256_res, s256_b, s256_s = bench_scs(
                filters=256, dtype="bfloat16",
                batch=int(os.environ.get("BENCH_SCS256_BATCH", 768)),
            )
            scs256 = _leg_json(
                "scs256_mcts_env_steps_per_s_per_chip", s256_res, s256_b,
                s256_s, "SCS 5x5 hex-RecurrentNet 256f bf16",
            )
        if os.environ.get("BENCH_SKIP_SCS256B1024"):
            scs256b1024 = None
        else:
            # Batch-scaling check on the flagship leg: B=1024 must not
            # regress below B=512 (the round-4 edge-table superlinearity
            # dropped it to 0.65x; r4 verdict #1).
            sb_res, sb_b, sb_s = bench_scs(
                filters=256, dtype="bfloat16", batch=1024
            )
            scs256b1024 = _leg_json(
                "scs256_b1024_mcts_env_steps_per_s_per_chip", sb_res, sb_b,
                sb_s, "SCS 5x5 hex-RecurrentNet 256f bf16",
            )

    # Primary = the SCS leg (BASELINE's named workload); if skipped, the
    # first available leg is promoted so a filtered run still prints its
    # one JSON line.  The driver-parsed `secondary` slot carries the
    # STABLE ttt4096 leg (BASELINE config 2's 4096 parallel games); the
    # B=1024 TTT leg — whose sub-second move-batches ride the shared
    # tunnel's multi-second throughput swings no matter how many reps it
    # gets (PERF_NOTES r4) — stays as the auxiliary `ttt1024` key for
    # round-over-round continuity.
    legs = [("scs", scs), ("secondary", ttt4096), ("ttt1024", ttt),
            ("scs256", scs256), ("scs256_b1024", scs256b1024)]
    primary = next((leg for _, leg in legs if leg is not None), None)
    if primary is not None:
        for key, leg in legs:
            if leg is not None and leg is not primary:
                primary[key] = leg
        print(json.dumps(primary))


if __name__ == "__main__":
    main()
