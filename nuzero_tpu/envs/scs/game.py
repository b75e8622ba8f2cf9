"""SCS hex-grid wargame as a pure-JAX state machine.

Behavioral target: ``Games/SCS/SCS_Game.py`` — the flagship env: config-
driven scenarios, the 10-stage auto-advancing turn structure (turn-0
placement, then per-player Movement(reinforce, move) and Fighting(choose
target, choose attackers) phases), per-sub-phase action legality, hex
movement with terrain costs, stacking, combat with strongest-unit losses,
reinforcement schedules, and VP-capture termination.

TPU-native design decisions:

- The object model (Unit/Tile lists, ref ``Unit.py``/``Tile.py``) becomes
  fixed-capacity arrays: every unit that can ever exist comes from the
  reinforcement schedule, so units live in a flat table indexed by
  ``player * S + schedule_slot``; the board is an ``[R, C, K]`` table of
  unit ids maintaining stacking order (level 0 = bottom).
- ``update_game_env``'s Python while loop (ref ``SCS_Game.py:687-831``)
  becomes a bounded ``lax.while_loop`` whose body switches on the stage.
- Legality (ref ``possible_actions``, ``SCS_Game.py:395-484``) is computed
  for all four sub-phases as dense plane tensors via precomputed neighbor
  tables (no per-unit Python loops) and selected by the current sub-phase.
- ``step`` decodes the flat action into (act, r, c, stacking, direction)
  arithmetically (ref ``parse_action``, ``SCS_Game.py:486-567``) and
  dispatches through ``lax.switch`` over seven total action appliers.
- Strongest-unit combat losses use vectorized lexicographic argmax with
  the reference's first-in-list tie-breaks
  (ref ``SCS_Game.py:1253-1285``).

Deliberate deviation: the framework's static value convention already uses
players {0,1} (the reference's check_termination semantics are unchanged:
+1 = player-0 victory, ref ``SCS_Game.py:857-894``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from nuzero_tpu.envs.base import Env
from nuzero_tpu.envs.scs.hexgrid import neighbor_tables
from nuzero_tpu.envs.scs.scenario import Scenario

N_STATS = 3  # attack, defense, movement (ref SCS_Game.py:76)
N_STATUSES = 3  # available, moved, attacked (ref SCS_Game.py:75)
N_REINF_SHOWN = 3  # reinforcements represented in the state (ref :202)
SUB_PHASES = 4


@struct.dataclass
class SCSState:
    board: jax.Array  # i32[R, C, K] unit ids, -1 empty, level 0 = bottom
    alive: jax.Array  # bool[2S]
    placed: jax.Array  # bool[2S]
    row: jax.Array  # i32[2S]
    col: jax.Array  # i32[2S]
    mov: jax.Array  # f32[2S] movement points left
    status: jax.Array  # i32[2S] 0 avail / 1 moved / 2 attacked
    reinf_next: jax.Array  # i32[2] next schedule slot per player
    turn: jax.Array  # i32
    stage: jax.Array  # i32 in [-2, 7]
    length: jax.Array  # i32
    terminal: jax.Array  # bool
    terminal_value: jax.Array  # f32
    has_target: jax.Array  # bool
    target_row: jax.Array  # i32
    target_col: jax.Array  # i32
    is_attacker: jax.Array  # bool[2S]
    attacker_seq: jax.Array  # i32[2S] selection order, big when unset
    n_attackers: jax.Array  # i32


def _stage_player(stage: jax.Array) -> jax.Array:
    """{-2,0,1,2,3} -> 0; {-1,4,5,6,7} -> 1 (ref SCS_Game.py:783-789)."""
    return jnp.where(
        (stage == -1) | (stage >= 4), jnp.int32(1), jnp.int32(0)
    )


def _stage_sub_phase(stage: jax.Array) -> jax.Array:
    """(ref SCS_Game.py:833-843)."""
    return jnp.where(
        (stage == -2) | (stage == -1) | (stage == 0) | (stage == 4),
        0,
        jnp.where(
            (stage == 1) | (stage == 5),
            1,
            jnp.where((stage == 2) | (stage == 6), 2, 3),
        ),
    ).astype(jnp.int32)


class SCSGame(Env):
    """One instance binds one (scenario, seed) pair, like the reference's
    ``SCS_Game(config_path, seed)`` constructor."""

    def __init__(self, scenario: Scenario):
        self.scenario = scenario
        R, C, K = scenario.rows, scenario.cols, scenario.stacking_limit
        self.R, self.C, self.K = R, C, K
        self.S = scenario.units_per_player
        self.U = 2 * self.S  # flat unit table size

        # Action planes (ref SCS_Game.py:147-180).
        self.placement_planes = 1
        self.movement_planes = 6 * K
        self.choose_target_planes = 1
        self.choose_attackers_planes = K
        self.confirm_attack_planes = 1
        self.no_move_planes = K
        self.no_fight_planes = K
        total = (
            self.placement_planes
            + self.movement_planes
            + self.choose_target_planes
            + self.choose_attackers_planes
            + self.confirm_attack_planes
            + self.no_move_planes
            + self.no_fight_planes
        )
        self.placement_limit = self.placement_planes
        self.movement_limit = self.placement_limit + self.movement_planes
        self.target_limit = self.movement_limit + self.choose_target_planes
        self.attackers_limit = self.target_limit + self.choose_attackers_planes
        self.confirm_limit = self.attackers_limit + self.confirm_attack_planes
        self.no_move_limit = self.confirm_limit + self.no_move_planes
        self.no_fight_limit = self.no_move_limit + self.no_fight_planes

        self.num_actions = total * R * C
        self.action_space_shape = (total, R, C)

        # Observation channels (ref SCS_Game.py:186-239).
        self.n_unit_channels = N_STATS * K * N_STATUSES
        self.n_reinf_channels_pp = N_REINF_SHOWN * N_STATS * 2
        channels = (
            3  # terrain
            + 2  # victory points
            + 2 * self.n_reinf_channels_pp
            + 2 * self.n_unit_channels
            + 1  # target tile
            + K  # attackers
            + SUB_PHASES
            + 1  # turn
            + 1  # player
        )
        self.observation_shape = (channels, R, C)
        self.max_game_length = scenario.max_game_length

        # Static device constants.
        self.t_attack = jnp.asarray(scenario.terrain_attack)
        self.t_defense = jnp.asarray(scenario.terrain_defense)
        self.t_cost = jnp.asarray(scenario.terrain_cost)
        self.vp = jnp.asarray(scenario.vp)
        self.n_vp = jnp.asarray(scenario.n_vp, jnp.float32)
        # Flat unit stats [2S].
        self.u_attack = jnp.asarray(scenario.reinf_stats[:, :, 0].reshape(-1))
        self.u_defense = jnp.asarray(scenario.reinf_stats[:, :, 1].reshape(-1))
        self.u_allowance = jnp.asarray(scenario.reinf_stats[:, :, 2].reshape(-1))
        self.u_player = jnp.asarray(
            np.repeat(np.arange(2, dtype=np.int32), self.S)
        )
        self.reinf_turn = jnp.asarray(scenario.reinf_turn)  # [2, S]
        self.reinf_arrival = jnp.asarray(scenario.reinf_arrival)  # [2,S,R,C]
        self.reinf_count = jnp.asarray(scenario.reinf_count)  # [2]
        dst_r, dst_c, valid = neighbor_tables(R, C)
        self.nbr_r = jnp.asarray(dst_r)  # [6, R, C]
        self.nbr_c = jnp.asarray(dst_c)
        self.nbr_ok = jnp.asarray(valid)

    # ------------------------------------------------------------------ #
    # helpers                                                            #
    # ------------------------------------------------------------------ #

    def _stack_count(self, board):
        return (board >= 0).sum(-1).astype(jnp.int32)  # [R, C]

    def _tile_owner(self, board):
        """-1 empty else owning player (all of a tile's units share one
        owner; ref Tile.place_unit/remove_unit)."""
        bottom = board[:, :, 0]
        return jnp.where(bottom >= 0, bottom // self.S, -1).astype(jnp.int32)

    def _unit_gather(self, arr, uid):
        """arr[uid] with -1-safe gather."""
        return arr[jnp.maximum(uid, 0)]

    def _adjacent_any(self, mask):
        """bool[R,C]: tile has any hex neighbor where ``mask`` is True."""
        return (mask[self.nbr_r, self.nbr_c] & self.nbr_ok).any(0)

    def _unit_pos_mask(self, state, cond):
        """bool[R,C]: any unit with cond[uid] True sits on the tile."""
        on = cond & state.placed & state.alive
        m = jnp.zeros((self.R, self.C), jnp.int32)
        m = m.at[state.row, state.col].add(on.astype(jnp.int32))
        return m > 0

    def _ended_reinforcements(self, state, p):
        """(ref player_ended_reinforcements, SCS_Game.py:908-911)."""
        nxt = state.reinf_next[p]
        exhausted = nxt >= self.reinf_count[p]
        slot = jnp.minimum(nxt, self.S - 1)
        return exhausted | (self.reinf_turn[p, slot] != state.turn)

    def _no_units_with_status(self, state, p, status):
        mine = (self.u_player == p) & state.placed & state.alive
        return ~jnp.any(mine & (state.status == status))

    # ------------------------------------------------------------------ #
    # Env API                                                            #
    # ------------------------------------------------------------------ #

    def init(self, key=None) -> SCSState:
        del key  # scenario randomness is bound at load time (ref: the
        # reference randomizes the map in __init__, not reset)
        U = self.U
        state = SCSState(
            board=jnp.full((self.R, self.C, self.K), -1, jnp.int32),
            alive=jnp.zeros(U, bool),
            placed=jnp.zeros(U, bool),
            row=jnp.zeros(U, jnp.int32),
            col=jnp.zeros(U, jnp.int32),
            mov=jnp.zeros(U, jnp.float32),
            status=jnp.zeros(U, jnp.int32),
            reinf_next=jnp.zeros(2, jnp.int32),
            turn=jnp.int32(0),
            stage=jnp.int32(-2),
            length=jnp.int32(0),
            terminal=jnp.bool_(False),
            terminal_value=jnp.float32(0.0),
            has_target=jnp.bool_(False),
            target_row=jnp.int32(0),
            target_col=jnp.int32(0),
            is_attacker=jnp.zeros(U, bool),
            attacker_seq=jnp.full(U, 10**6, jnp.int32),
            n_attackers=jnp.int32(0),
        )
        return self._update_env(state)

    def current_player(self, state: SCSState) -> jax.Array:
        return _stage_player(state.stage)

    def terminal(self, state: SCSState) -> jax.Array:
        return state.terminal

    def terminal_value(self, state: SCSState) -> jax.Array:
        return state.terminal_value

    # -- legality ------------------------------------------------------- #

    def legal_mask(self, state: SCSState) -> jax.Array:
        R, C, K, S = self.R, self.C, self.K, self.S
        p = self.current_player(state)
        opp = 1 - p
        sub = _stage_sub_phase(state.stage)
        board = state.board
        count = self._stack_count(board)
        owner = self._tile_owner(board)
        status_of = state.status

        # ---- sub-phase 0: placement (ref SCS_Game.py:411-420)
        nxt = state.reinf_next[p]
        have_next = (nxt < self.reinf_count[p]) & (
            self.reinf_turn[p, jnp.minimum(nxt, S - 1)] == state.turn
        )
        arrival = self.reinf_arrival[p, jnp.minimum(nxt, S - 1)]
        placement = (
            arrival & ~(owner == opp) & (count < K) & have_next
        )[None]  # [1, R, C]

        # ---- per-level unit info
        lvl_uid = board  # [R, C, K]
        lvl_present = lvl_uid >= 0
        safe = jnp.maximum(lvl_uid, 0)
        lvl_player = safe // S
        lvl_status = status_of[safe]
        lvl_mov = state.mov[safe]
        lvl_mine = lvl_present & (lvl_player == p)

        # ---- sub-phase 1: movement + no_move (ref :423-441)
        # All 6 directions x K levels in one stacked computation (the
        # per-direction Python loop was dispatch-bound).
        avail = lvl_mine & (lvl_status == 0)  # [R, C, K]
        dcost = self.t_cost[self.nbr_r, self.nbr_c]  # [6, R, C]
        dcount = count[self.nbr_r, self.nbr_c]
        downer = owner[self.nbr_r, self.nbr_c]
        ok = self.nbr_ok & (dcount < K) & (downer != opp)  # [6, R, C]
        can = (
            avail[None]  # [1, R, C, K]
            & ok[:, :, :, None]
            & (lvl_mov[None] - dcost[:, :, :, None] >= 0)
        )  # [6, R, C, K]
        movement = jnp.moveaxis(can, 3, 1).reshape(6 * K, R, C)
        no_move = jnp.moveaxis(avail, -1, 0)  # [K, R, C]

        # ---- sub-phase 2: choose target + no_fight (ref :447-458)
        moved_lvl = lvl_mine & (lvl_status == 1)
        moved_mask = moved_lvl.any(-1)
        enemy_occ = owner == opp
        choose_target = (enemy_occ & self._adjacent_any(moved_mask))[None]
        no_fight = jnp.moveaxis(moved_lvl, -1, 0)  # [K, R, C]

        # ---- sub-phase 3: choose attackers + confirm (ref :463-477)
        target_onehot = (
            jnp.zeros((R, C), bool)
            .at[state.target_row, state.target_col]
            .set(state.has_target)
        )
        adj_target = self._adjacent_any(target_onehot)
        lvl_attacker = state.is_attacker[safe] & lvl_present
        selectable = (
            lvl_mine
            & (lvl_status != 2)
            & ~lvl_attacker
            & adj_target[:, :, None]
        )
        choose_attackers = jnp.moveaxis(selectable, -1, 0)  # [K, R, C]
        confirm = (target_onehot & (state.n_attackers > 0))[None]

        zeros1 = jnp.zeros((1, R, C), bool)
        zerosK = jnp.zeros((K, R, C), bool)
        zeros6K = jnp.zeros((6 * K, R, C), bool)

        def pick(sub_idx, planes, zeros):
            return jnp.where(sub == sub_idx, planes, zeros)

        mask = jnp.concatenate(
            [
                pick(0, placement, zeros1),
                pick(1, movement, zeros6K),
                pick(2, choose_target, zeros1),
                pick(3, choose_attackers, zerosK),
                pick(3, confirm, zeros1),
                pick(1, no_move, zerosK),
                pick(2, no_fight, zerosK),
            ]
        )
        return (mask & ~state.terminal).reshape(-1)

    # -- stepping -------------------------------------------------------- #

    def step(self, state: SCSState, action: jax.Array) -> SCSState:
        R, C, K = self.R, self.C, self.K
        plane = action // (R * C)
        rc = action % (R * C)
        r, c = rc // C, rc % C

        # Decode (ref parse_action, SCS_Game.py:486-567).
        in_move = (plane >= self.placement_limit) & (plane < self.movement_limit)
        mv_index = jnp.clip(plane - self.placement_limit, 0, 6 * K - 1)
        act = jnp.where(
            plane < self.placement_limit,
            0,
            jnp.where(
                in_move,
                1,
                jnp.where(
                    plane < self.target_limit,
                    2,
                    jnp.where(
                        plane < self.attackers_limit,
                        3,
                        jnp.where(
                            plane < self.confirm_limit,
                            4,
                            jnp.where(plane < self.no_move_limit, 5, 6),
                        ),
                    ),
                ),
            ),
        ).astype(jnp.int32)
        s_lvl = jnp.where(
            in_move,
            mv_index % K,
            jnp.where(
                plane < self.confirm_limit,
                jnp.clip(plane - self.target_limit, 0, K - 1),
                jnp.where(
                    plane < self.no_move_limit,
                    jnp.clip(plane - self.confirm_limit, 0, K - 1),
                    jnp.clip(plane - self.no_move_limit, 0, K - 1),
                ),
            ),
        ).astype(jnp.int32)
        direction = (mv_index // K).astype(jnp.int32)

        operands = (state, r.astype(jnp.int32), c.astype(jnp.int32), s_lvl, direction)
        state = jax.lax.switch(
            act,
            [
                self._act_place,
                self._act_move,
                self._act_choose_target,
                self._act_choose_attacker,
                self._act_confirm,
                self._act_no_move,
                self._act_no_fight,
            ],
            *operands,
        )
        state = state.replace(length=state.length + 1)
        return self._update_env(state)

    # -- action appliers -------------------------------------------------- #

    def _board_push(self, board, r, c, uid):
        level = self._stack_count(board)[r, c]
        return board.at[r, c, jnp.minimum(level, self.K - 1)].set(
            jnp.where(level < self.K, uid, board[r, c, jnp.minimum(level, self.K - 1)])
        )

    def _board_remove(self, board, r, c, uid):
        """list.remove semantics: drop uid, shift higher levels down."""
        stack = board[r, c]  # [K]
        keep = stack != uid
        key = jnp.where(keep, 0, 1)
        order = jnp.argsort(key, stable=True)
        sorted_stack = stack[order]
        sorted_keep = keep[order]
        new_stack = jnp.where(sorted_keep, sorted_stack, -1)
        return board.at[r, c].set(new_stack)

    def _end_movement(self, state, uid):
        """status -> moved; isolated units also end fighting
        (ref end_movement, SCS_Game.py:927-940)."""
        p = self._unit_gather(self.u_player, uid)
        enemy_occ = self._tile_owner(state.board) == (1 - p)
        ur, uc = state.row[uid], state.col[uid]
        any_adj_enemy = jnp.zeros((), bool)
        for d in range(6):
            nr = self.nbr_r[d, ur, uc]
            nc = self.nbr_c[d, ur, uc]
            any_adj_enemy = any_adj_enemy | (
                enemy_occ[nr, nc] & self.nbr_ok[d, ur, uc]
            )
        new_status = jnp.where(any_adj_enemy, 1, 2)
        return state.replace(status=state.status.at[uid].set(new_status))

    def _act_place(self, state, r, c, s_lvl, direction):
        """(ref play_action act 0, SCS_Game.py:572-580)."""
        del s_lvl, direction
        p = self.current_player(state)
        slot = state.reinf_next[p]
        uid = p * self.S + jnp.minimum(slot, self.S - 1)
        board = self._board_push(state.board, r, c, uid)
        return state.replace(
            board=board,
            alive=state.alive.at[uid].set(True),
            placed=state.placed.at[uid].set(True),
            row=state.row.at[uid].set(r),
            col=state.col.at[uid].set(c),
            mov=state.mov.at[uid].set(self.u_allowance[uid]),
            status=state.status.at[uid].set(0),
            reinf_next=state.reinf_next.at[p].add(1),
        )

    def _act_move(self, state, r, c, s_lvl, direction):
        """(ref play_action act 1, SCS_Game.py:582-600)."""
        uid = state.board[r, c, s_lvl]
        uid = jnp.maximum(uid, 0)
        dr = self.nbr_r[direction, r, c]
        dc = self.nbr_c[direction, r, c]
        cost = self.t_cost[dr, dc]
        board = self._board_remove(state.board, r, c, uid)
        board = self._board_push(board, dr, dc, uid)
        new_mov = state.mov[uid] - cost
        state = state.replace(
            board=board,
            row=state.row.at[uid].set(dr),
            col=state.col.at[uid].set(dc),
            mov=state.mov.at[uid].set(new_mov),
        )
        # Auto-end movement when no tile is affordable anymore
        # (consider_other_units=False; ref SCS_Game.py:596-600).
        can_move = jnp.zeros((), bool)
        for d in range(6):
            ncost = self.t_cost[self.nbr_r[d, dr, dc], self.nbr_c[d, dr, dc]]
            can_move = can_move | (
                self.nbr_ok[d, dr, dc] & (new_mov - ncost >= 0)
            )
        return jax.lax.cond(
            can_move, lambda s: s, lambda s: self._end_movement(s, uid), state
        )

    def _act_choose_target(self, state, r, c, s_lvl, direction):
        del s_lvl, direction
        return state.replace(
            has_target=jnp.bool_(True), target_row=r, target_col=c
        )

    def _act_choose_attacker(self, state, r, c, s_lvl, direction):
        del direction
        uid = jnp.maximum(state.board[r, c, s_lvl], 0)
        return state.replace(
            is_attacker=state.is_attacker.at[uid].set(True),
            attacker_seq=state.attacker_seq.at[uid].set(state.n_attackers),
            n_attackers=state.n_attackers + 1,
        )

    def _act_no_move(self, state, r, c, s_lvl, direction):
        del direction
        uid = jnp.maximum(state.board[r, c, s_lvl], 0)
        state = state.replace(status=state.status.at[uid].set(1))
        # _end_movement re-derives moved/attacked from adjacency:
        return self._end_movement(state, uid)

    def _act_no_fight(self, state, r, c, s_lvl, direction):
        del direction
        uid = jnp.maximum(state.board[r, c, s_lvl], 0)
        return state.replace(status=state.status.at[uid].set(2))

    @staticmethod
    def _lexi_pick(cand, k1, k2, k3, order):
        """Reference strongest-unit selection: strict-inequality chain over
        list order => max (k1, then k2, then k3), first-in-order ties
        (ref SCS_Game.py:1253-1285)."""
        NEG = jnp.float32(-1e9)
        m1 = cand & (k1 == jnp.where(cand, k1, NEG).max())
        m2 = m1 & (k2 == jnp.where(m1, k2, NEG).max())
        m3 = m2 & (k3 == jnp.where(m2, k3, NEG).max())
        return jnp.argmin(jnp.where(m3, order, 10**8)).astype(jnp.int32)

    def _destroy(self, state, uid, do):
        """(ref destroy_unit, SCS_Game.py:982-995)."""
        board = jax.lax.cond(
            do,
            lambda: self._board_remove(
                state.board, state.row[uid], state.col[uid], uid
            ),
            lambda: state.board,
        )
        return state.replace(
            board=board, alive=state.alive.at[uid].set(~do & state.alive[uid])
        )

    def _act_confirm(self, state, r, c, s_lvl, direction):
        """(ref resolve_combat, SCS_Game.py:997-1027)."""
        del r, c, s_lvl, direction
        tr, tc = state.target_row, state.target_col

        # Defense: sum of defenders' defense x target terrain modifier.
        stack = state.board[tr, tc]  # [K]
        present = stack >= 0
        sdef = jnp.where(
            present, self._unit_gather(self.u_defense, stack), 0.0
        ).sum()
        total_def = sdef * self.t_defense[tr, tc]

        # Attack: each attacker's attack x its own tile's modifier.
        att = state.is_attacker & state.alive
        atk_mod = self.t_attack[state.row, state.col]
        total_att = jnp.where(att, self.u_attack * atk_mod, 0.0).sum()

        # All attackers end fighting BEFORE losses (ref :1016).
        status = jnp.where(att, 2, state.status)
        state = state.replace(status=status)

        defender_losses = total_att >= total_def
        attacker_losses = total_att <= total_def

        # Strongest attacker: (attack, defense, allowance), first-chosen
        # wins ties (selection order).
        a_uid = self._lexi_pick(
            att,
            self.u_attack,
            self.u_defense,
            self.u_allowance,
            state.attacker_seq,
        )
        state = self._destroy(state, a_uid, attacker_losses)

        # Strongest defender: (defense, attack, allowance), stack order.
        # Re-read the stack (attacker destruction can't touch the target
        # tile: attackers are adjacent, not on it).
        stack = state.board[tr, tc]
        present = stack >= 0
        U = self.U
        d_cand = (
            jnp.zeros(U, bool).at[jnp.maximum(stack, 0)].max(present)
            & state.alive
        )
        stack_order = jnp.full(U, 10**6, jnp.int32)
        stack_order = stack_order.at[jnp.maximum(stack, 0)].min(
            jnp.where(present, jnp.arange(self.K), 10**6), mode="drop"
        )
        d_uid = self._lexi_pick(
            d_cand,
            self.u_defense,
            self.u_attack,
            self.u_allowance,
            stack_order,
        )
        state = self._destroy(state, d_uid, defender_losses)

        # Clear target + attackers (ref play_action act 4, :615-618).
        return state.replace(
            has_target=jnp.bool_(False),
            is_attacker=jnp.zeros(U, bool),
            attacker_seq=jnp.full(U, 10**6, jnp.int32),
            n_attackers=jnp.int32(0),
        )

    # -- stage machine ----------------------------------------------------- #

    def _new_turn(self, state):
        """(ref new_turn, SCS_Game.py:845-855)."""
        on = state.placed & state.alive
        return state.replace(
            status=jnp.where(on, 0, state.status),
            mov=jnp.where(on, self.u_allowance, state.mov),
        )

    def _termination_value(self, state):
        """(ref check_termination, SCS_Game.py:857-894)."""
        owner = self._tile_owner(state.board)
        # victory_points[p] are player p's OWN locations; captured when the
        # opponent's units sit on them at game end.
        p2_captured = (self.vp[0] & (owner == 1)).sum().astype(jnp.float32)
        p1_captured = (self.vp[1] & (owner == 0)).sum().astype(jnp.float32)
        p1_pct = p1_captured / jnp.maximum(self.n_vp[1], 1.0)
        p2_pct = p2_captured / jnp.maximum(self.n_vp[0], 1.0)
        return jnp.where(
            p1_pct > p2_pct, 1.0, jnp.where(p1_pct < p2_pct, -1.0, 0.0)
        ).astype(jnp.float32)

    def _update_env(self, state: SCSState) -> SCSState:
        """Bounded functional version of the reference's stage-advance loop
        (ref update_game_env, SCS_Game.py:687-831).

        Each iteration computes the seven stage predicates ONCE and derives
        the transition with scalar selects (a lax.switch of per-stage
        closures evaluates every branch under vmap — measured ~10x the op
        count of this form)."""

        def advance(carry):
            s, _ = carry
            stage = s.stage
            er0 = self._ended_reinforcements(s, 0)
            er1 = self._ended_reinforcements(s, 1)
            nm0 = self._no_units_with_status(s, 0, 0)
            nm1 = self._no_units_with_status(s, 1, 0)
            na0 = self._no_units_with_status(s, 0, 1)
            na1 = self._no_units_with_status(s, 1, 1)
            ht = s.has_target

            def at(v):
                return stage == v

            game_over = at(6) & na1 & (s.turn + 1 > self.scenario.turns)
            next_turn = at(6) & na1 & ~game_over

            new_stage = stage
            for cond, tgt in (
                (at(-2) & er0, -1),
                (at(-1) & er1, 0),
                (at(0) & er0, 1),
                (at(1) & nm0, 2),
                (at(2) & na0, 4),
                (at(2) & ~na0 & ht, 3),
                (at(3) & ~ht, 2),
                (at(4) & er1, 5),
                (at(5) & nm1, 6),
                (next_turn, 0),
                (at(6) & ~na1 & ht, 7),
                (at(7) & ~ht, 6),
            ):
                new_stage = jnp.where(cond, tgt, new_stage)
            inc_turn = (at(-1) & er1) | next_turn

            advanced = (new_stage != stage) | inc_turn
            # game_over BREAKS the loop with terminal set (ref :764-766).
            advanced = advanced & ~s.terminal & ~game_over

            s = s.replace(
                stage=new_stage.astype(jnp.int32),
                turn=s.turn + inc_turn.astype(jnp.int32),
            )
            # new_turn reset on turn rollover (ref new_turn, :845-855).
            on = s.placed & s.alive & next_turn
            s = s.replace(
                status=jnp.where(on, 0, s.status),
                mov=jnp.where(on, self.u_allowance, s.mov),
            )
            # Termination value (ref check_termination, :857-894).
            fire = game_over & ~s.terminal
            s = s.replace(
                terminal=s.terminal | game_over,
                terminal_value=jnp.where(
                    fire, self._termination_value(s), s.terminal_value
                ),
            )
            return s, advanced

        state, cont = advance((state, jnp.bool_(True)))
        state, _ = jax.lax.while_loop(
            lambda carry: carry[1], advance, (state, cont)
        )
        return state

    # -- observation ------------------------------------------------------- #

    def observe(self, state: SCSState) -> jax.Array:
        """(ref generate_state, SCS_Game.py:1348-1505); channel order:
        terrain(3), p1_vp, p2_vp, p1_reinf(18), p2_reinf(18), p1_units,
        p2_units, target(1), attackers(K), sub_phase(4), turn(1),
        player(1)."""
        R, C, K, S = self.R, self.C, self.K, self.S
        f = jnp.float32
        chans = [
            self.t_attack[None],
            self.t_defense[None],
            self.t_cost[None],
            self.vp[0][None].astype(f),
            self.vp[1][None].astype(f),
        ]

        # Reinforcements: next N_REINF_SHOWN unplaced units per player,
        # assembled as stacked tensors (per-channel Python loops are
        # dispatch-bound).
        turns_total = jnp.float32(self.scenario.turns + 1)
        for p in range(2):
            idx = state.reinf_next[p] + jnp.arange(N_REINF_SHOWN)
            ok = (idx < self.reinf_count[p]).astype(f)  # [3]
            slot = jnp.minimum(idx, S - 1)
            uid = p * S + slot
            arrival = self.reinf_arrival[p, slot].astype(f) * ok[:, None, None]
            stats = jnp.stack(
                [self.u_attack[uid], self.u_defense[uid], self.u_allowance[uid]],
                axis=1,
            )  # [3, 3stats]
            stats_planes = (
                arrival[:, None] * stats[:, :, None, None]
            )  # [3, 3, R, C]
            turns_left = self.reinf_turn[p, slot].astype(f) - state.turn.astype(f)
            importance = (turns_total - turns_left) / turns_total * ok  # [3]
            dur = jnp.broadcast_to(
                importance[:, None, None, None], (N_REINF_SHOWN, 3, R, C)
            )
            per_unit = jnp.concatenate([stats_planes, dur], axis=1)
            chans.append(per_unit.reshape(N_REINF_SHOWN * 6, R, C))

        # Units by (player, status, stacking level) — one broadcasted
        # one-hot product instead of 2x3xK channel loops.
        lvl_uid = state.board
        present = lvl_uid >= 0
        safe = jnp.maximum(lvl_uid, 0)
        lvl_player = safe // S
        lvl_status = state.status[safe]
        lvl_stats = jnp.stack(
            [self.u_attack[safe], self.u_defense[safe], state.mov[safe]]
        )  # [3stat, R, C, K]
        pm = lvl_player[None] == jnp.arange(2)[:, None, None, None]  # [2,R,C,K]
        sm = lvl_status[None] == jnp.arange(N_STATUSES)[:, None, None, None]
        m = (present[None, None] & pm[:, None] & sm[None]).astype(f)
        # [2, status, stat, R, C, K] -> [2, status, K, stat, R, C]
        units = m[:, :, None] * lvl_stats[None, None]
        units = jnp.transpose(units, (0, 1, 5, 2, 3, 4))
        chans.append(units.reshape(2 * N_STATUSES * K * N_STATS, R, C))

        target = (
            jnp.zeros((R, C), f)
            .at[state.target_row, state.target_col]
            .set(state.has_target.astype(f))
        )
        chans.append(target[None])

        lvl_att = state.is_attacker[safe] & present
        chans.append(jnp.moveaxis(lvl_att, -1, 0).astype(f))

        sub = _stage_sub_phase(state.stage)
        sub_planes = (jnp.arange(SUB_PHASES)[:, None, None] == sub).astype(f)
        chans.append(jnp.broadcast_to(sub_planes, (SUB_PHASES, R, C)))

        turn_plane = jnp.full(
            (1, R, C), state.turn.astype(f) / jnp.float32(self.scenario.turns), f
        )
        chans.append(turn_plane)

        player_plane = jnp.full(
            (1, R, C),
            jnp.where(self.current_player(state) == 1, -1.0, 1.0),
            f,
        )
        chans.append(player_plane)

        return jnp.concatenate(chans, axis=0)

    # -- artificial probe states ------------------------------------------- #

    def simple_state(self, turn: int, placements) -> SCSState:
        """Build an artificial mid-game state for value probing
        (ref ``set_simple_game_state``, SCS_Game.py:948-978).

        ``placements``: iterable of ``(player, row, col)`` with player in
        {0, 1}.  Each player's units reuse that player's earliest
        reinforcement slots (the reference instead instantiates fresh units
        of a given type id; shipped scenarios use one unit type, so slot
        stats coincide).  All reinforcement-schedule entries arriving at or
        before ``turn`` are cleared, mirroring the reference's
        ``current_reinforcements[...][0..turn].clear()``.  The state is left
        at stage 0 of ``turn`` and auto-advanced, so probes sit at player
        0's movement sub-phase with every placed unit available.

        Host-side constructor — probe sets are built once at startup, so
        this is not jitted.
        """
        placements = list(placements)
        R, C, K, S = self.R, self.C, self.K, self.S
        n_per = [0, 0]
        board = np.full((R, C, K), -1, np.int32)
        row = np.zeros(2 * S, np.int32)
        col = np.zeros(2 * S, np.int32)
        alive = np.zeros(2 * S, bool)
        for p, r, c in placements:
            if p not in (0, 1):
                raise ValueError(f"player must be 0 or 1, got {p}")
            if n_per[p] >= S:
                raise ValueError(
                    f"scenario only has {S} unit slots for player {p}"
                )
            uid = p * S + n_per[p]
            n_per[p] += 1
            lvl = int((board[r, c] >= 0).sum())
            if lvl >= K:
                raise ValueError(f"stacking limit {K} exceeded at ({r},{c})")
            board[r, c, lvl] = uid
            row[uid], col[uid] = r, c
            alive[uid] = True

        reinf_turn = np.asarray(self.reinf_turn)
        reinf_count = np.asarray(self.reinf_count)
        reinf_next = np.zeros(2, np.int32)
        for p in range(2):
            cleared = int(
                ((reinf_turn[p, : reinf_count[p]] <= turn)).sum()
            )
            reinf_next[p] = max(cleared, n_per[p])

        alive_j = jnp.asarray(alive)
        state = SCSState(
            board=jnp.asarray(board),
            alive=alive_j,
            placed=alive_j,
            row=jnp.asarray(row),
            col=jnp.asarray(col),
            mov=jnp.where(alive_j, self.u_allowance, 0.0),
            status=jnp.zeros(2 * S, jnp.int32),
            reinf_next=jnp.asarray(reinf_next),
            turn=jnp.int32(turn),
            stage=jnp.int32(0),
            length=jnp.int32(0),
            terminal=jnp.bool_(False),
            terminal_value=jnp.float32(0.0),
            has_target=jnp.bool_(False),
            target_row=jnp.int32(0),
            target_col=jnp.int32(0),
            is_attacker=jnp.zeros(2 * S, bool),
            attacker_seq=jnp.full(2 * S, 10**6, jnp.int32),
            n_attackers=jnp.int32(0),
        )
        return self._update_env(state)
