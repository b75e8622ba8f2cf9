"""AlphaZero coordinator: self-play -> replay -> SGD orchestration.

Behavioral target: ``Training/AlphaZero.py`` ``run()`` (ref ``:215-501``) —
early buffer fill with softened exploration, sequential
(play-N-games -> train -> repeat) and asynchronous (interleaved) running
modes, samples/epochs learning methods, periodic checkpoints and in-loop
evaluation.

TPU-native design: the Ray actor topology (Gamer pool + ReplayBuffer actor +
RemoteStorage) collapses into an on-device actor-learner.  Self-play,
replay and SGD all operate on device-resident arrays; the host loop only
sequences jitted calls and does IO (journal, checkpoints).  "Asynchronous"
mode becomes strict interleaving of one self-play lockstep move-batch with
each training update — the actor/learner ratio is controlled by batch
sizes rather than wall-clock update_delay.  Weights never leave the device
between checkpoint saves (the reference ships pickled CPU copies through
Ray's object store per game — ``AlphaZero.py:291-294``, ``Gamer.py:40``).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nuzero_tpu.config.schemas import TrainingConfig
from nuzero_tpu.networks.manager import NetworkManager
from nuzero_tpu.search.mcts import SearchParams
from nuzero_tpu.training.learner import Learner, LearnerConfig, TrainState
from nuzero_tpu.training import replay as replay_lib
from nuzero_tpu.training.selfplay import init_selfplay, make_selfplay_step
from nuzero_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint
from nuzero_tpu.utils.metrics import MetricsJournal


def learner_config_from_training(cfg: TrainingConfig) -> LearnerConfig:
    return LearnerConfig(
        policy_loss=cfg.learning.policy_loss,
        value_loss=cfg.learning.value_loss,
        normalize_policy=cfg.learning.normalize_cel,
        optimizer=cfg.optimizer.optimizer_choice,
        learning_rate=cfg.optimizer.starting_lr,
        scheduler_boundaries=cfg.optimizer.scheduler_boundaries,
        scheduler_gamma=cfg.optimizer.scheduler_gamma,
        weight_decay=cfg.optimizer.weight_decay,
        momentum=cfg.optimizer.momentum,
        nesterov=cfg.optimizer.nesterov,
        train_iterations=cfg.recurrent.train_iterations[0],
        prog_alpha=cfg.recurrent.alpha,
    )


class AlphaZero:
    """Training coordinator (ref class ``AlphaZero``, ``AlphaZero.py:54``)."""

    def __init__(
        self,
        env,
        manager: NetworkManager,
        train_config: TrainingConfig,
        search_params: SearchParams,
        run_dir: Optional[str] = None,
        test_hook: Optional[Callable] = None,
        state_set: Optional[jax.Array] = None,
    ):
        self.env = env
        self.manager = manager
        self.cfg = train_config
        self.search_params = search_params
        self.run_dir = run_dir
        self.test_hook = test_hook  # called (state, step) -> dict of metrics
        # Fixed probe positions whose value-head outputs are tracked per
        # plot step (ref AlphaZero.state_set + update_state_set_data,
        # AlphaZero.py:1175-1179; sets built in Run.py:427-579).
        self.state_set = state_set
        self.journal = MetricsJournal(
            os.path.join(run_dir, "journal.jsonl") if run_dir else None
        )

        self.learner = Learner(manager, learner_config_from_training(train_config))

        pred_iters = train_config.recurrent.pred_iterations[0]

        def net(variables, obs):
            p, v, _ = manager.apply(variables, obs, iters_to_do=pred_iters)
            return p, v

        self._net = net
        # donate the carried self-play state: its trajectory buffers are
        # the largest live arrays and must not be double-buffered.
        self.sp_step = jax.jit(
            make_selfplay_step(env, net, search_params, training=True),
            donate_argnums=(1,),
        )
        # Early-fill exploration overrides (ref AlphaZero.py:385-387,503-517
        # + Running config early_* keys).
        early_params = dataclasses.replace(
            search_params,
            number_of_softmax_moves=train_config.running.early_softmax_moves,
            epsilon_softmax_exploration=train_config.running.early_softmax_exploration,
            epsilon_random_exploration=train_config.running.early_random_exploration,
        )
        self.sp_step_early = jax.jit(
            make_selfplay_step(env, net, early_params, training=True),
            donate_argnums=(1,),
        )
        self.tr_step = jax.jit(self.learner.train_step, donate_argnums=(0,))

        def probe_values(params, obs):
            _, v = net(params, obs)
            return v

        self._probe_values = jax.jit(probe_values)
        self.add_games = jax.jit(replay_lib.add_games, donate_argnums=(0,))
        self.trajectory_length = (
            train_config.running.max_trajectory_length or env.max_game_length
        )

        # In-loop evaluation vs RandomAgent, policy/mcts x both seats
        # (ref AlphaZero.run_tests, AlphaZero.py:596-645).
        from nuzero_tpu.evaluation import (
            MctsAgent,
            PolicyAgent,
            RandomAgent,
            TestManager,
        )

        self.test_manager = TestManager(env, train_config.testing.testing_actors)
        self._random_agent = RandomAgent()
        self._policy_agent = PolicyAgent(manager, None, pred_iters)
        self._mcts_agent = MctsAgent(
            manager, None, search_params, pred_iters
        )
        self.buffer = replay_lib.create_buffer(
            train_config.learning.replay_window_size,
            self.trajectory_length,
            env.observation_shape,
            env.num_actions,
        )

    # -- phases --------------------------------------------------------------

    def _selfplay_until(self, state, sp, step_fn, target_games: int):
        """Run lockstep move-batches until ``target_games`` finish."""
        done = 0
        stats = {}
        while done < target_games:
            sp, finished, stats = step_fn(state.params, sp)
            self.buffer = self.add_games(self.buffer, finished)
            done += int(stats["finished"])
        return sp, done, stats

    def _train_once(self, state: TrainState, rng):
        cfg = self.cfg.learning
        metrics = {}
        if cfg.learning_method == "samples":
            for _ in range(cfg.num_samples):
                rng, k_s, k_t = jax.random.split(rng, 3)
                batch = replay_lib.sample(
                    self.buffer,
                    k_s,
                    cfg.batch_size,
                    late_heavy=cfg.late_heavy,
                    with_replacement=cfg.with_replacement,
                )
                state, metrics = self.tr_step(state, batch, k_t)
        elif cfg.learning_method == "epochs":
            n_positions = int(self.buffer.num_positions)
            if cfg.epochs_batch_size > n_positions:
                raise ValueError(
                    "Batch size too large; use early_fill to pre-fill the "
                    "replay buffer (ref AlphaZero.py:690-693)"
                )
            n_batches = n_positions // cfg.epochs_batch_size
            for _e in range(cfg.learning_epochs):
                for _b in range(n_batches):
                    rng, k_s, k_t = jax.random.split(rng, 3)
                    # Sampling w/o replacement within the epoch approximates
                    # the reference's shuffle-and-slice sweep on device.
                    batch = replay_lib.sample(
                        self.buffer,
                        k_s,
                        cfg.epochs_batch_size,
                        with_replacement=False,
                    )
                    state, metrics = self.tr_step(state, batch, k_t)
        else:
            raise ValueError(f"bad learning_method {cfg.learning_method!r}")
        return state, rng, metrics

    def _run_inloop_tests(self, state: TrainState, step: int) -> dict:
        """Policy/MCTS agents vs RandomAgent on both seats
        (ref AlphaZero.py:596-645: test types p1_policy/p2_policy/
        p1_mcts/p2_mcts)."""
        cfg = self.cfg.testing
        out = {}

        def run(agent, n_games, tag, seed):
            agent.set_network(state.params)
            s_p0 = self.test_manager.run_test_batch(
                n_games, agent, self._random_agent,
                jax.random.key(seed), show_results=False,
            )
            s_p1 = self.test_manager.run_test_batch(
                n_games, self._random_agent, agent,
                jax.random.key(seed + 1), show_results=False,
            )
            out[f"wr/{tag}_as_p0"] = s_p0.p0_win_rate
            out[f"wr/{tag}_as_p1"] = s_p1.p1_win_rate
            out[f"nonloss/{tag}_as_p0"] = 1.0 - s_p0.p1_win_rate
            out[f"nonloss/{tag}_as_p1"] = 1.0 - s_p1.p0_win_rate

        if cfg.policy_test_frequency and step % cfg.policy_test_frequency == 0:
            run(self._policy_agent, cfg.num_policy_test_games, "policy", 2 * step)
        if cfg.mcts_test_frequency and step % cfg.mcts_test_frequency == 0:
            run(self._mcts_agent, cfg.num_mcts_test_games, "mcts", 2 * step + 1)
        return out

    # -- main loop -----------------------------------------------------------

    def run(
        self,
        seed: int = 0,
        initial_state: Optional[TrainState] = None,
        starting_step: int = 0,
    ) -> TrainState:
        cfg = self.cfg
        rng = jax.random.key(seed)
        rng, k_init, k_sp = jax.random.split(rng, 3)
        state = initial_state or self.learner.init_state(k_init)
        sp = init_selfplay(
            self.env,
            cfg.running.num_actors,
            k_sp,
            self.trajectory_length,
            search_params=self.search_params,
        )

        if cfg.running.early_fill_per_type > 0 and starting_step == 0:
            t0 = time.time()
            sp, n, _ = self._selfplay_until(
                state, sp, self.sp_step_early, cfg.running.early_fill_per_type
            )
            print(
                f"early fill: {n} games in {time.time() - t0:.1f}s "
                f"({int(self.buffer.num_positions)} positions)"
            )

        sequential = cfg.running.running_mode == "sequential"
        for step in range(starting_step + 1, cfg.running.training_steps + 1):
            t0 = time.time()
            if sequential:
                sp, games, sp_stats = self._selfplay_until(
                    state,
                    sp,
                    self.sp_step,
                    cfg.running.num_games_per_type_per_step,
                )
            else:
                # Asynchronous mode: one lockstep move-batch per train step
                # (actor and learner interleave on-device).
                sp, finished, sp_stats = self.sp_step(state.params, sp)
                self.buffer = self.add_games(self.buffer, finished)
                games = int(sp_stats["finished"])

            rng, k_t = jax.random.split(rng)
            state, rng, tr_metrics = self._train_once(state, k_t)

            record = {
                "step": step,
                "games": games,
                "buffer_games": int(self.buffer.num_games),
                "buffer_positions": int(self.buffer.num_positions),
                "updates": int(state.step),
                "loss/combined": float(tr_metrics.get("loss/combined", np.nan)),
                "loss/policy": float(tr_metrics.get("loss/policy", np.nan)),
                "loss/value": float(tr_metrics.get("loss/value", np.nan)),
                "selfplay/root_value": float(sp_stats["root_value_mean"]),
                "step_time_s": time.time() - t0,
            }

            if self.test_hook is not None:
                if step % cfg.testing.policy_test_frequency == 0:
                    record.update(self.test_hook(state, step) or {})
            else:
                record.update(self._run_inloop_tests(state, step))

            if (
                self.state_set is not None
                and step % cfg.plotting.plot_frequency == 0
            ):
                values = np.asarray(
                    self._probe_values(state.params, self.state_set)
                ).reshape(-1)
                record.update(
                    {f"value_probe/{i}": float(v) for i, v in enumerate(values)}
                )

            self.journal.append(record)

            if self.run_dir and step % cfg.saving.save_frequency == 0:
                tree = {
                    "params": state.params,
                    "opt_state": state.opt_state,
                    "step": state.step,
                    "rng": jax.random.key_data(rng),
                }
                if cfg.saving.save_buffer:
                    tree["buffer"] = self.buffer
                save_checkpoint(
                    os.path.join(self.run_dir, "checkpoints"), step, tree
                )

        return state

    # -- resume --------------------------------------------------------------

    def load(self, step: int | str = "auto") -> tuple[TrainState, int]:
        """Restore params/opt/buffer from this run's checkpoints
        (ref ``AlphaZero.py:110-146`` + ``ReplayBuffer.py:80-104``)."""
        assert self.run_dir is not None
        template_state = self.learner.init_state(jax.random.key(0))
        template = {
            "params": template_state.params,
            "opt_state": template_state.opt_state,
            "step": template_state.step,
            "rng": jax.random.key_data(jax.random.key(0)),
        }
        if self.cfg.saving.save_buffer and self.cfg.checkpoint.load_buffer:
            template["buffer"] = self.buffer
        tree, step = restore_checkpoint(
            os.path.join(self.run_dir, "checkpoints"), step, template
        )
        if "buffer" in tree and tree["buffer"] is not None:
            self.buffer = tree["buffer"]
        ckpt = self.cfg.checkpoint
        opt_state = (
            tree["opt_state"]
            if ckpt.keep_optimizer
            else self.learner.tx.init(tree["params"])
        )
        state = TrainState(
            params=tree["params"],
            opt_state=opt_state,
            step=jnp.int32(0) if ckpt.fresh_start else tree["step"],
        )
        if ckpt.fresh_start:
            step = 0
        if ckpt.new_plots:
            self.journal.truncate_to_step(0)
        else:
            self.journal.truncate_to_step(step)
        return state, step
