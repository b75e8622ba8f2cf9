"""Host-side ASCII rendering (ref ``SCS_Game.string_representation``,
``SCS_Game.py:1836-1932``; the pygame renderer is out of the hot path and
replaced by this + the journal plots)."""

from __future__ import annotations

import numpy as np


def render_scs_ascii(env, state) -> str:
    """Hex board as offset-column ASCII.  Each cell shows
    ``<owner><attack><defense>`` of the top unit (``...`` empty), ``*`` for
    victory-point tiles, and the terrain cost as a trailing digit."""
    board = np.asarray(state.board)  # [R, C, K]
    cost = np.asarray(env.t_cost)
    vp = np.asarray(env.vp)
    S = env.S
    attack = np.asarray(env.u_attack)
    defense = np.asarray(env.u_defense)

    lines = []
    header = "    " + "".join(f"{c:^8}" for c in range(env.C))
    lines.append(header)
    for r in range(env.R):
        cells_hi = []  # even columns on one text row
        cells_lo = []  # odd columns on a half-shifted row
        for c in range(env.C):
            top = -1
            for k in range(env.K - 1, -1, -1):
                if board[r, c, k] >= 0:
                    top = board[r, c, k]
                    break
            if top >= 0:
                p = top // S
                cell = f"P{p}{int(attack[top])}{int(defense[top])}"
            else:
                cell = "...."
            mark = "*" if vp[0, r, c] or vp[1, r, c] else " "
            cell = f"{mark}{cell}t{int(cost[r, c])}"
            (cells_hi if c % 2 == 0 else cells_lo).append((c, cell))
        row_hi = [" " * 8] * env.C
        row_lo = [" " * 8] * env.C
        for c, cell in cells_hi:
            row_hi[c] = f"{cell:^8}"
        for c, cell in cells_lo:
            row_lo[c] = f"{cell:^8}"
        lines.append(f"{r:>3} " + "".join(row_hi))
        lines.append("    " + "".join(row_lo))
    lines.append(
        f"turn {int(state.turn)}  stage {int(state.stage)}  "
        f"player {int(env.current_player(state))}  "
        f"terminal {bool(state.terminal)}"
    )
    return "\n".join(lines)


def replay_actions(env, actions) -> list:
    """Deterministically replay an action history (the analysis-mode core
    of the reference's renderer, ref ``SCS_Renderer.analyse``,
    ``SCS_Renderer.py:105-219``); returns the list of states."""
    import jax.numpy as jnp

    state = env.init(None)
    states = [state]
    for a in actions:
        state = env.step(state, jnp.int32(int(a)))
        states.append(state)
    return states
