"""Lockstep batched self-play engine.

Behavioral target: the reference's ``Gamer`` Ray actors — each plays one
game at a time with per-move MCTS, storing (state, policy-target) pairs and
shipping the finished game to the replay buffer
(ref ``Training/Gamer.py:39-97``).

TPU-native design: ONE device program steps B games in lockstep.  Every
move runs the fully-batched MCTS (all games' leaf evaluations fused into
single network calls), records the position into per-game trajectory
buffers, steps the envs, and — where games finished — emits them as a
``FinishedGames`` batch and auto-resets those slots with fresh PRNG keys.
The "actor count" knob becomes the batch dimension; process-level Ray
parallelism becomes array parallelism.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct

from nuzero_tpu.search.mcts import SearchParams, make_search_fn
from nuzero_tpu.training.replay import FinishedGames


@struct.dataclass
class SelfplayState:
    games: Any  # EnvState batch [B]
    obs_buf: jax.Array  # f32[B, L, C*H*W] positions so far (flattened:
    # trailing (H, W) dims would tile-pad ~50x on TPU for small boards)
    policy_buf: jax.Array  # f32[B, L, A] search policy targets
    move_count: jax.Array  # i32[B] moves played in current game
    rng: jax.Array
    total_moves: jax.Array  # i32 stats: lockstep move-steps taken
    total_games: jax.Array  # i32 stats: games completed since init


def init_selfplay(
    env, batch_size: int, rng: jax.Array, trajectory_capacity: int = 0
) -> SelfplayState:
    """``trajectory_capacity`` bounds stored moves per game (0 = the env's
    hard ``max_game_length``); games that overrun are discarded and reset
    (the bound formula is deliberately loose — a tight capacity saves the
    dominant trajectory-buffer memory)."""
    rng, sub = jax.random.split(rng)
    games = jax.vmap(env.init)(jax.random.split(sub, batch_size))
    L = trajectory_capacity or env.max_game_length
    obs_flat = 1
    for d in env.observation_shape:
        obs_flat *= d
    return SelfplayState(
        games=games,
        obs_buf=jnp.zeros((batch_size, L, obs_flat), jnp.float32),
        policy_buf=jnp.zeros((batch_size, L, env.num_actions), jnp.float32),
        move_count=jnp.zeros(batch_size, jnp.int32),
        rng=rng,
        total_moves=jnp.int32(0),
        total_games=jnp.int32(0),
    )


def make_selfplay_step(
    env,
    apply_fn: Callable,
    search_params: SearchParams,
    training: bool = True,
):
    """Build ``step(variables, sp) -> (sp, FinishedGames, stats)``.

    One call = one move in every live game.  Jit at the call site.
    """
    search = make_search_fn(env, apply_fn, search_params, training)

    def step(variables, sp: SelfplayState):
        B = sp.move_count.shape[0]
        rng, k_search, k_reset = jax.random.split(sp.rng, 3)

        res = search(variables, sp.games, sp.move_count, k_search)

        # Record the pre-move position + its search policy
        # (ref Gamer.py:65-66,74-77 store_state/store_search_statistics).
        obs = jax.vmap(env.observe)(sp.games).reshape(B, -1)
        bidx = jnp.arange(B)
        obs_buf = sp.obs_buf.at[bidx, sp.move_count].set(obs)
        policy_buf = sp.policy_buf.at[bidx, sp.move_count].set(
            res.policy_target
        )

        stepped = jax.vmap(env.step)(sp.games, res.action)
        done = jax.vmap(env.terminal)(stepped)
        L = sp.obs_buf.shape[1]
        overflow = (~done) & (sp.move_count + 1 >= L)

        finished = FinishedGames(
            obs=obs_buf,
            policy=policy_buf,
            final_value=jax.vmap(env.terminal_value)(stepped),
            length=sp.move_count + 1,
            game_type=jnp.zeros(B, jnp.int32),
            mask=done,
        )

        # Auto-reset finished games (and discard trajectory-overflow
        # games) with fresh keys.
        recycle = done | overflow
        fresh = jax.vmap(env.init)(jax.random.split(k_reset, B))

        def select(f, s):
            cond = recycle.reshape((B,) + (1,) * (s.ndim - 1))
            return jnp.where(cond, f, s)

        games = jax.tree.map(select, fresh, stepped)
        move_count = jnp.where(recycle, 0, sp.move_count + 1)

        stats = {
            "finished": done.sum(),
            "root_value_mean": res.root_value.mean(),
            "tree_nodes_mean": res.tree_nodes.mean(),
            "exploration_bias_mean": res.exploration_bias.mean(),
        }
        new_sp = SelfplayState(
            games=games,
            obs_buf=obs_buf,
            policy_buf=policy_buf,
            move_count=move_count,
            rng=rng,
            total_moves=sp.total_moves + B,
            total_games=sp.total_games + done.sum().astype(jnp.int32),
        )
        return new_sp, finished, stats

    return step
