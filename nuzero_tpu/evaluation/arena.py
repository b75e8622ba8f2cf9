"""Batched agent-vs-agent match runner (ref ``Testing/Tester.py``).

The reference plays one game per Ray-pooled Tester process, validating each
agent move against the env mask (``Tester.py:46-121``).  Here B games run
in lockstep in one jitted move-batch: both seats' policies are evaluated,
the mover's action is selected per game, finished games freeze, and the
host loops until all B games are terminal.  Network parameters are jit
*arguments* (not closure constants), so checkpoint sweeps and in-training
evaluation reuse one compiled program.

Seat mapping is by player id: ``p0_agent`` plays player 0.  (The
reference's seat-mapping bug for SCS — ``Tester.py:74-79`` maps
``player == 1`` to p1_agent, swapping seats for {0,1}-labelled games — is
deliberately not reproduced; SURVEY §2.6.)
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class MatchStats:
    num_games: int
    p0_wins: int
    p1_wins: int
    draws: int
    avg_length: float
    # Games that hit max_moves without terminating.  They count as draws
    # (like the reference's move-capped Tester games) but are reported so
    # long-game envs (SCS) can't silently bias win-rate stats.
    truncated: int = 0

    @property
    def p0_win_rate(self) -> float:
        return self.p0_wins / max(self.num_games, 1)

    @property
    def p1_win_rate(self) -> float:
        return self.p1_wins / max(self.num_games, 1)

    @property
    def draw_rate(self) -> float:
        return self.draws / max(self.num_games, 1)


class Arena:
    """Compiled two-seat match engine; build once, play many."""

    def __init__(self, env, p0_policy: Callable, p1_policy: Callable):
        self.env = env

        def move(states, lengths, done, p0_vars, p1_vars, rng):
            k0, k1, k_next = jax.random.split(rng, 3)
            player = jax.vmap(env.current_player)(states)
            # Only evaluate a seat's policy if some LIVE game has it on
            # move.  For strictly-alternating games the lockstep batch
            # shares move parity, so exactly one branch runs per move —
            # halving eval cost for expensive (MCTS) seats vs computing
            # both and selecting.  lax.cond under jit (not vmap) executes
            # a single branch at runtime.
            B = lengths.shape[0]
            zeros = jnp.zeros(B, jnp.int32)
            a0 = jax.lax.cond(
                jnp.any((player == 0) & ~done),
                lambda: p0_policy(p0_vars, states, lengths, k0).astype(jnp.int32),
                lambda: zeros,
            )
            a1 = jax.lax.cond(
                jnp.any((player == 1) & ~done),
                lambda: p1_policy(p1_vars, states, lengths, k1).astype(jnp.int32),
                lambda: zeros,
            )
            action = jnp.where(player == 0, a0, a1)
            stepped = jax.vmap(env.step)(states, action)

            def select(new, old):
                cond = done.reshape((-1,) + (1,) * (old.ndim - 1))
                return jnp.where(cond, old, new)

            states = jax.tree.map(select, stepped, states)
            lengths = jnp.where(done, lengths, lengths + 1)
            done = jax.vmap(env.terminal)(states)
            return states, lengths, done, k_next

        self._move = jax.jit(move)

    def play(
        self,
        num_games: int,
        p0_variables,
        p1_variables,
        rng: jax.Array,
        max_moves: Optional[int] = None,
    ) -> MatchStats:
        env = self.env
        max_moves = max_moves or env.max_game_length
        rng, k_init = jax.random.split(rng)
        states = jax.vmap(env.init)(jax.random.split(k_init, num_games))
        lengths = jnp.zeros(num_games, jnp.int32)
        done = jax.vmap(env.terminal)(states)
        moves = 0
        while not bool(done.all()) and moves < max_moves:
            states, lengths, done, rng = self._move(
                states, lengths, done, p0_variables, p1_variables, rng
            )
            moves += 1

        values = np.asarray(jax.vmap(env.terminal_value)(states))
        finished = np.asarray(done)
        p0_wins = int(((values > 0) & finished).sum())
        p1_wins = int(((values < 0) & finished).sum())
        truncated = int((~finished).sum())
        draws = int(((values == 0) & finished).sum()) + truncated
        return MatchStats(
            num_games=num_games,
            p0_wins=p0_wins,
            p1_wins=p1_wins,
            draws=draws,
            avg_length=float(np.asarray(lengths).mean()),
            truncated=truncated,
        )


def play_matches(
    env,
    p0_policy: Callable,
    p0_variables,
    p1_policy: Callable,
    p1_variables,
    num_games: int,
    rng: jax.Array,
    max_moves: Optional[int] = None,
) -> MatchStats:
    return Arena(env, p0_policy, p1_policy).play(
        num_games, p0_variables, p1_variables, rng, max_moves
    )
