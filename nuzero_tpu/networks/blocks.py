"""Shared network building blocks (Flax).

Behavioral targets: ``Neural_Networks/Architectures/blocks.py`` in the
reference, re-expressed as Flax modules over NHWC activations (channel-minor
is the layout the TPU MXU/VPU want; the reference's torch code is NCHW).

All convolutions are bias-free, matching the reference
(``blocks.py:20,28,63,151``).  ``hex=True`` selects the HexagDLy-semantics
hexagonal convolution (one hex ring); ``hex=False`` a 3x3 'same' ortho conv.
Filter-count ramps reproduce the reference's ``int(width + k*step)``
arithmetic exactly so checkpoint shapes line up.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from nuzero_tpu.ops.hexconv import hex_conv


def _ramp(start: int, end: int, num_layers: int) -> Sequence[int]:
    """Reference filter-ramp arithmetic (ref ``blocks.py:56-61``)."""
    step = (end - start) / num_layers
    sizes = []
    prev = float(start)
    for _ in range(num_layers):
        prev = prev + step
        sizes.append(int(prev))
    return sizes


class HexConv(nn.Module):
    """Hexagonal convolution layer (ref ``hexagdly.Conv2d(kernel_size=1)``).

    Input/output NHWC.  7 taps: [c, n, ne, se, s, sw, nw], independent
    weights per direction, zero edge padding, no bias.
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        # Same fan-in/out variance scaling torch uses for convs (kaiming
        # uniform over 7-tap receptive field).
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (7, in_features, self.features),
            self.dtype,
        )
        return hex_conv(
            x.astype(self.dtype), w, data_format="NHWC", precision=None
        )


class Conv(nn.Module):
    """Hex-or-ortho conv selector used by every stack in the zoo."""

    features: int
    hex: bool = True
    kernel_size: int = 3  # ortho only; hex is always one ring
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.hex:
            return HexConv(self.features, dtype=self.dtype)(x)
        return nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
        )(x)


class BasicBlock(nn.Module):
    """Residual block: conv -> (BN) -> relu -> conv, + identity, relu
    (ref ``blocks.py:12-41``)."""

    channels: int
    batch_norm: bool = False
    hex: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        out = Conv(self.channels, hex=self.hex, dtype=self.dtype)(x)
        if self.batch_norm:
            out = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(out)
        out = nn.relu(out)
        out = Conv(self.channels, hex=self.hex, dtype=self.dtype)(out)
        return nn.relu(out + x)


class ReduceValueHead(nn.Module):
    """Conv filter-ramp down to 1 channel, then a global mean over channels
    *and* space, then tanh (ref ``blocks.py:46-92``; the reference's
    ``AdaptiveAvgPool3d(1)`` pools over (C, H, W) — with the final conv at 1
    channel this is a spatial global mean, reproduced as such)."""

    width: int
    num_reduce_layers: int = 4
    activation: str = "tanh"
    batch_norm: bool = False
    hex: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        act = {"tanh": nn.tanh, "relu": nn.relu}[self.activation]
        sizes = _ramp(self.width, 1, self.num_reduce_layers)
        for i, features in enumerate(sizes):
            x = Conv(features, hex=self.hex, dtype=self.dtype)(x)
            if i != len(sizes) - 1:
                if self.batch_norm:
                    x = nn.BatchNorm(
                        use_running_average=not train, dtype=self.dtype
                    )(x)
                x = act(x)
        # Global mean over (H, W, C); final channel count is 1.
        v = jnp.mean(x, axis=(1, 2, 3))
        return nn.tanh(v)  # [batch]


class DenseValueHead(nn.Module):
    """conv -> flatten -> relu -> dense -> relu -> dense(1) -> tanh
    (ref ``blocks.py:97-125``; all layers bias-free)."""

    width: int
    dense_layer_neurons: int = 256
    conv_layer_channels: int = 32
    batch_norm: bool = False
    hex: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = Conv(self.conv_layer_channels, hex=self.hex, dtype=self.dtype)(x)
        if self.batch_norm:
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(x)
        x = nn.Dense(self.dense_layer_neurons, use_bias=False, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dense(1, use_bias=False, dtype=self.dtype)(x)
        return nn.tanh(x)[:, 0]  # [batch]


class ReducePolicyHead(nn.Module):
    """Conv filter-ramp from trunk width down to the action-plane count
    (ref ``blocks.py:130-170``).  Returns flat logits [batch, num_actions]
    in (plane, row, col) C-order, matching the flat action index
    convention (ref ``Games/Game.py:96-102``)."""

    width: int
    policy_channels: int
    num_reduce_layers: int = 2
    batch_norm: bool = False
    hex: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        sizes = _ramp(self.width, self.policy_channels, self.num_reduce_layers)
        for i, features in enumerate(sizes):
            x = Conv(features, hex=self.hex, dtype=self.dtype)(x)
            if i != len(sizes) - 1:
                if self.batch_norm:
                    x = nn.BatchNorm(
                        use_running_average=not train, dtype=self.dtype
                    )(x)
                x = nn.relu(x)
        # NHWC -> NCHW -> flat, so logits ravel as (plane, row, col).
        x = jnp.transpose(x, (0, 3, 1, 2))
        return x.reshape(x.shape[0], -1)
