"""Fused Pallas TPU kernel for hexagonal convolution.

The XLA path (``nuzero_tpu/ops/hexconv.py``) lowers the 7-tap hex kernel to
TWO dense 3x3 convolutions (18 MACs/pixel) selected by column parity.  This
kernel computes the exact same function in one pass:

1. gather the 7 parity-correct neighbor taps into a ``[H*W, 7*Cin]`` tile in
   VMEM (static shifts + column-parity select — pure VPU work), then
2. one ``[H*W, 7*Cin] x [7*Cin, Cout]`` matmul on the MXU
   (7 MACs/pixel — a ~2.6x FLOP reduction over the dual-conv lowering, and
   one MXU launch instead of two convolutions).

Boards are small (<= 30x30), so a whole board plus its tap stack fits VMEM
comfortably; the grid is over the batch dimension.

Tap order and geometry follow ``nuzero_tpu/ops/hexconv.py`` exactly
(offset-coordinate neighborhoods, ref ``Games/SCS/SCS_Game.py:26-65``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nuzero_tpu.ops.hexconv import hex_neighbor_offsets


def _shift2d(x, dr: int, dc: int):
    """x[h, w, c] -> value at (h+dr, w+dc), zero at borders.  Static
    shifts via concat-of-slices (Mosaic-lowerable; jnp.roll produces
    zero-size slices it rejects)."""
    H, W, C = x.shape
    if dr == -1:
        x = jnp.concatenate(
            [jnp.zeros((1, W, C), x.dtype), x[: H - 1]], axis=0
        )
    elif dr == 1:
        x = jnp.concatenate(
            [x[1:], jnp.zeros((1, W, C), x.dtype)], axis=0
        )
    if dc == -1:
        x = jnp.concatenate(
            [jnp.zeros((H, 1, C), x.dtype), x[:, : W - 1]], axis=1
        )
    elif dc == 1:
        x = jnp.concatenate(
            [x[:, 1:], jnp.zeros((H, 1, C), x.dtype)], axis=1
        )
    return x


def _kernel(x_ref, w_ref, out_ref):
    # x_ref: [BB, H, W, Cin]; w_ref: [7*Cin, Cout]; out: [BB, H, W, Cout]
    BB, H, W, Cin = x_ref.shape
    Cout = out_ref.shape[-1]
    offs_even = hex_neighbor_offsets(0)
    offs_odd = hex_neighbor_offsets(1)
    col_is_odd = (
        jax.lax.broadcasted_iota(jnp.int32, (H, W, 1), 1) % 2
    ).astype(bool)

    x = x_ref[:]  # [BB, H, W, Cin]
    taps = []
    for t in range(7):
        dre, dce = int(offs_even[t, 0]), int(offs_even[t, 1])
        dro, dco = int(offs_odd[t, 0]), int(offs_odd[t, 1])

        def shift(img, dr=0, dc=0):
            return _shift2d(img, dr, dc)

        even = jax.vmap(functools.partial(shift, dr=dre, dc=dce))(x)
        if (dro, dco) == (dre, dce):
            tap = even
        else:
            odd = jax.vmap(functools.partial(shift, dr=dro, dc=dco))(x)
            tap = jnp.where(col_is_odd[None], odd, even)
        taps.append(tap)
    g = jnp.concatenate(taps, axis=-1)  # [BB, H, W, 7*Cin]
    y = jnp.dot(
        g.reshape(BB * H * W, 7 * Cin),
        w_ref[:],
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = y.reshape(BB, H, W, Cout).astype(out_ref.dtype)


def hex_conv_pallas(
    x: jax.Array,
    weights: jax.Array,
    *,
    batch_block: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Hex convolution, NHWC.

    Args:
      x: f32/bf16[B, H, W, Cin]; B must be divisible by ``batch_block``.
      weights: f32/bf16[7, Cin, Cout] (same tap order as ``hex_conv``).

    bf16 note: Mosaic can only relayout a bf16 row-merging reshape (the
    kernel's ``[BB, H, W, C] -> [BB*H*W, C]`` flatten) when the lane
    dimension is a multiple of 128 — measured on v5e: C=448 fails, 384
    works.  bf16 inputs therefore get their channel dims zero-padded up
    to 128 multiples here (weights rows match, extra output channels are
    sliced off); the MXU runs 128-wide tiles anyway, so the padding
    mostly formalizes what the hardware would do.
    """
    B, H, W, Cin = x.shape
    Cout = weights.shape[-1]
    cout_pad = 0
    if x.dtype == jnp.bfloat16:
        cin_pad = (-Cin) % 128
        cout_pad = (-Cout) % 128
        if cin_pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cin_pad)))
            weights = jnp.pad(weights, ((0, 0), (0, cin_pad), (0, 0)))
        if cout_pad:
            weights = jnp.pad(weights, ((0, 0), (0, 0), (0, cout_pad)))
        Cin += cin_pad
        Cout += cout_pad
    if B % batch_block != 0:
        batch_block = 1
    w2d = weights.reshape(7 * Cin, Cout)

    y = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        grid=(B // batch_block,),
        in_specs=[
            pl.BlockSpec(
                (batch_block, H, W, Cin),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (batch_block, H, W, Cout),
            lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(x, w2d)
    if cout_pad:
        y = y[..., : Cout - cout_pad]
    return y
