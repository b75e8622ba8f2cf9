"""DeepThinking-style recurrent network (ref ``Architectures/RecurrentNet.py``).

The recurrent block is applied ``iters_to_do`` times with *shared* weights;
with ``recall=True`` the raw input is concatenated onto the thought tensor
before every iteration (ref ``RecurrentNet.py:82-99``).  Iteration count is
a *test-time* knob: networks trained at k iterations are evaluated at m >> k
to extrapolate (SURVEY §5.7).

TPU-native design: the iteration loop is a ``flax.linen.scan`` (lowers to
``lax.scan``) with parameters broadcast across iterations — constant compile
time regardless of iteration count, no Python-loop unrolling.  The interim
thought is threaded in and out so the progressive (n/k split) loss can resume
from a detached interim state (ref ``Training/AlphaZero.py:941-955``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from nuzero_tpu.networks.blocks import (
    BasicBlock,
    Conv,
    DenseValueHead,
    ReducePolicyHead,
    ReduceValueHead,
)


class _RecurCell(nn.Module):
    num_filters: int
    num_blocks: int
    recall: bool
    hex: bool
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, carry, _):
        thought, x = carry
        h = thought
        if self.recall:
            h = jnp.concatenate([h, x], axis=-1)  # NHWC channel concat
            h = Conv(self.num_filters, hex=self.hex, dtype=self.dtype)(h)
        for _b in range(self.num_blocks):
            h = BasicBlock(self.num_filters, hex=self.hex, dtype=self.dtype)(h)
        return (h, x), None


class RecurrentNet(nn.Module):
    policy_channels: int
    num_filters: int = 256
    num_blocks: int = 2
    recall: bool = True
    policy_head: str = "conv"
    value_head: str = "reduce"  # "reduce" | "dense"
    value_activation: str = "tanh"
    hex: bool = True
    dtype: jnp.dtype = jnp.float32

    recurrent: bool = True

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        iters_to_do: int = 2,
        interim_thought: Optional[jax.Array] = None,
        train: bool = False,
    ):
        # (B, C, H, W) -> NHWC.
        x = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)
        initial_thought = nn.relu(
            Conv(self.num_filters, hex=self.hex, dtype=self.dtype)(x)
        )
        thought = initial_thought if interim_thought is None else interim_thought

        scan = nn.scan(
            _RecurCell,
            variable_broadcast="params",
            split_rngs={"params": False},
            length=int(iters_to_do),
        )(
            self.num_filters,
            self.num_blocks,
            self.recall,
            self.hex,
            self.dtype,
        )
        (thought, _), _ = scan((thought, x), None)

        if self.policy_head != "conv":
            raise ValueError(f"policy head {self.policy_head!r} unavailable")
        p = ReducePolicyHead(
            self.num_filters, self.policy_channels, hex=self.hex, dtype=self.dtype
        )(thought, train)

        if self.value_head == "reduce":
            v = ReduceValueHead(
                self.num_filters,
                activation=self.value_activation,
                hex=self.hex,
                dtype=self.dtype,
            )(thought, train)
        elif self.value_head == "dense":
            v = DenseValueHead(self.num_filters, hex=self.hex, dtype=self.dtype)(
                thought, train
            )
        else:
            raise ValueError(f"value head {self.value_head!r} unavailable")

        return (p, v), thought
