"""Hexagonal convolution on offset-coordinate hex grids (HexagDLy semantics).

The reference stores hex boards as rectangular tensors in *offset
coordinates*: columns are vertical, and the vertical placement of a column's
neighbors depends on the column's parity (ref ``Games/SCS/SCS_Game.py:26-65``,
neighbor rules at ``SCS_Game.py:1199-1243``):

    n  = (r-1, c)            s  = (r+1, c)
    even column c:  ne=(r-1,c+1)  se=(r,c+1)   sw=(r,c-1)   nw=(r-1,c-1)
    odd  column c:  ne=(r,c+1)    se=(r+1,c+1) sw=(r+1,c-1) nw=(r,c-1)

A size-1 hexagonal kernel covers the center + its 6 hex neighbors, with one
independent weight per hex direction (shared across column parities), zero
padding at the board edge — the behavior of ``hexagdly.Conv2d(kernel_size=1)``
used throughout the reference's model zoo (ref
``Neural_Networks/Architectures/blocks.py:20``).

TPU-native design: instead of gather-based neighbor indexing (VPU-bound), we
embed the 7 direction weights into two dense 3x3 kernels — one laid out for
even output columns, one for odd — run both as ordinary XLA convolutions
(which tile onto the MXU), and select per output column parity.  The two
convolutions share 3 of 7 taps (n, s, center); XLA fuses the select into the
conv epilogue.  This keeps all FLOPs on the systolic array and needs no
custom scatter/gather.  A fused single-pass Pallas kernel lives in
``nuzero_tpu/ops/pallas/hexconv_kernel.py`` for the hot path.

Direction order everywhere: [center, n, ne, se, s, sw, nw] (the reference's
clockwise order ``SCS_Game.py:1245-1247`` with center prepended).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

#: tap -> (row_offset, col_offset) per column parity
HEX_DIRECTIONS = ("c", "n", "ne", "se", "s", "sw", "nw")

_OFFSETS_EVEN = {
    "c": (0, 0),
    "n": (-1, 0),
    "ne": (-1, 1),
    "se": (0, 1),
    "s": (1, 0),
    "sw": (0, -1),
    "nw": (-1, -1),
}
_OFFSETS_ODD = {
    "c": (0, 0),
    "n": (-1, 0),
    "ne": (0, 1),
    "se": (1, 1),
    "s": (1, 0),
    "sw": (1, -1),
    "nw": (0, -1),
}


def hex_neighbor_offsets(parity: int):
    """(7, 2) int array of (dr, dc) offsets for a column of given parity."""
    table = _OFFSETS_ODD if parity % 2 else _OFFSETS_EVEN
    return np.array([table[d] for d in HEX_DIRECTIONS], dtype=np.int32)


@functools.lru_cache(maxsize=None)
def _placement(parity: int):
    """Indices placing the 7 taps into a 3x3 window for this parity."""
    offs = hex_neighbor_offsets(parity)
    rows = offs[:, 0] + 1
    cols = offs[:, 1] + 1
    return rows, cols


def hex_conv(
    x: jax.Array,
    weights: jax.Array,
    *,
    data_format: str = "NCHW",
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Hexagonal convolution.

    Args:
      x: f32[batch, in_channels, rows, cols] when ``data_format == "NCHW"``
        (the framework's (C, H, W) observation convention) or
        f32[batch, rows, cols, in_channels] when ``"NHWC"`` (the layout the
        network stacks use internally — channel-minor is what the TPU
        vector units and MXU want).
      weights: f32[7, in_channels, out_channels], tap order
        [c, n, ne, se, s, sw, nw].

    Returns:
      Output with the same layout as ``x``; zero padding at the edges.
    """
    if data_format == "NCHW":
        dense_layout = "OIHW"
        col_axis = 3
    elif data_format == "NHWC":
        dense_layout = "HWIO"
        col_axis = 2
    else:
        raise ValueError(f"bad data_format {data_format!r}")

    kernels = []
    for parity in (0, 1):
        rows, cols = _placement(parity)
        k = jnp.zeros((3, 3) + weights.shape[1:], weights.dtype)
        k = k.at[rows, cols].set(weights)  # [3, 3, in, out] == HWIO
        if dense_layout == "OIHW":
            k = jnp.transpose(k, (3, 2, 0, 1))
        kernels.append(k)
    k_even, k_odd = kernels

    dn = jax.lax.conv_dimension_numbers(
        x.shape, k_even.shape, (data_format, dense_layout, data_format)
    )
    # preferred_element_type=f32 with bf16 operands breaks the conv
    # TRANSPOSE rule (the f32 cotangent meets the bf16 kernel inside
    # the gradient conv).  On TPU bf16 convs accumulate in f32 on the MXU
    # regardless, so bf16 operands go through as-is there; on other
    # backends (CPU meshes in tests, GPU debugging) XLA may accumulate
    # bf16 convs in bf16, so inputs are upcast and the f32 result cast
    # back — same documented "bf16 storage, f32 accumulation" semantics
    # on every platform.
    out_dtype = x.dtype
    if x.dtype == jnp.bfloat16 and jax.default_backend() != "tpu":
        x = x.astype(jnp.float32)
        k_even = k_even.astype(jnp.float32)
        k_odd = k_odd.astype(jnp.float32)
    conv = functools.partial(
        jax.lax.conv_general_dilated,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=dn,
        precision=precision,
        preferred_element_type=(
            jnp.float32 if x.dtype == jnp.float32 else None
        ),
    )
    y_even = conv(x, k_even)
    y_odd = conv(x, k_odd)
    col_is_odd = (jnp.arange(x.shape[col_axis]) % 2).astype(bool)
    shape = [1, 1, 1, 1]
    shape[col_axis] = -1
    return jnp.where(col_is_odd.reshape(shape), y_odd, y_even).astype(out_dtype)


#: Active backend for the model-zoo hex convolutions ("xla" = parity-masked
#: dual 3x3 conv below; "pallas" = the fused single-pass kernel in
#: ops/pallas/hexconv_kernel.py; "auto" = pick per shape).  Measured on the
#: TPU v5e bench chip (benchmarks/hexconv_bench.py, 2026-08-20, 50-rep
#: steady state):
#:   B256  5x5   64f: xla 615us  pallas 721us  -> xla
#:   B1024 5x5   64f: xla 643us  pallas 677us  -> xla
#:   B256  10x10 64f: xla 1004us pallas 701us  -> pallas (1.43x)
#:   B256  10x10 96f: xla 789us  pallas 653us  -> pallas (1.21x)
#:   B64   30x30 64f: xla 1320us pallas 925us  -> pallas (1.43x)
#: The fused kernel's 2.6x FLOP cut wins once the board has enough pixels
#: to amortize its per-board tap gather; at 5x5 XLA's dual conv (epilogue-
#: fused parity select) is already dispatch-bound.  "auto" (default)
#: applies that crossover: pallas on TPU when H*W >= 100, else xla.
#: Override with NUZERO_HEXCONV_BACKEND or set_hexconv_backend().
import os as _os

_HEXCONV_BACKEND = _os.environ.get("NUZERO_HEXCONV_BACKEND", "auto")
_PALLAS_MIN_PIXELS = 100  # measured crossover (see table above)


def set_hexconv_backend(name: str) -> None:
    global _HEXCONV_BACKEND
    if name not in ("xla", "pallas", "auto"):
        raise ValueError(f"unknown hexconv backend {name!r}")
    _HEXCONV_BACKEND = name


def get_hexconv_backend() -> str:
    return _HEXCONV_BACKEND


def _hex_conv_xla_nhwc(x: jax.Array, weights: jax.Array) -> jax.Array:
    return hex_conv(x, weights, data_format="NHWC", precision=None)


@jax.custom_vjp
def _hex_conv_pallas_ad(x: jax.Array, weights: jax.Array) -> jax.Array:
    """Pallas forward with XLA-derived gradients.

    The fused kernel has no native reverse-mode rule; both backends
    compute the SAME function, so the backward pass runs through the
    dual-conv XLA formulation's VJP.  Without this, training any model on
    a board past the Pallas crossover (H*W >= 100 — exactly the 10x10+
    maps the reference's experiments use) failed to differentiate."""
    from nuzero_tpu.ops.pallas.hexconv_kernel import hex_conv_pallas

    return hex_conv_pallas(x, weights)


def _hex_conv_pallas_fwd(x, weights):
    return _hex_conv_pallas_ad(x, weights), (x, weights)


def _hex_conv_pallas_bwd(res, g):
    x, weights = res
    _, vjp = jax.vjp(_hex_conv_xla_nhwc, x, weights)
    return vjp(g)


_hex_conv_pallas_ad.defvjp(_hex_conv_pallas_fwd, _hex_conv_pallas_bwd)


def hex_conv_dispatch(x: jax.Array, weights: jax.Array) -> jax.Array:
    """NHWC hex conv through the active backend (HexConv's entry point).

    The Pallas kernel only lowers on TPU; other platforms always take the
    XLA path so tests and CPU meshes behave identically.
    """
    backend = _HEXCONV_BACKEND
    if backend == "auto":
        H, W = x.shape[1], x.shape[2]
        backend = "pallas" if H * W >= _PALLAS_MIN_PIXELS else "xla"
    if backend == "pallas" and jax.default_backend() == "tpu":
        # bf16 lowers via the kernel's 128-multiple channel padding (see
        # hex_conv_pallas docstring); the same H*W crossover as f32
        # applies — measured in-program on the 256f bf16 flagship leg,
        # forcing Pallas at 5x5 ran 0.56x the dual conv (the per-conv
        # grid of small programs is dispatch-bound at 25 pixels), while
        # 10x10+ boards profit from the 2.6x FLOP cut on either dtype.
        return _hex_conv_pallas_ad(x, weights)
    return _hex_conv_xla_nhwc(x, weights)


def hex_conv_depthwise(
    x: jax.Array,
    weights: jax.Array,
    *,
    data_format: str = "NHWC",
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Per-channel (depthwise) hexagonal convolution.

    The reference hand-rolls this as a Python loop of C independent
    ``hexagdly.Conv2d(1, 1)`` layers concatenated back together
    (ref ``Neural_Networks/Architectures/depthwise_conv.py:10-38``).  Here
    it is one grouped XLA convolution per column parity
    (``feature_group_count = C``), same dual-kernel parity trick as
    :func:`hex_conv`.

    Args:
      x: activations, NHWC or NCHW.
      weights: f32[7, channels] — one weight per (tap, channel).

    Returns:
      Same shape/layout as ``x``.
    """
    if data_format == "NCHW":
        col_axis = 3
        channels = x.shape[1]
    elif data_format == "NHWC":
        col_axis = 2
        channels = x.shape[-1]
    else:
        raise ValueError(f"bad data_format {data_format!r}")
    if weights.shape != (7, channels):
        raise ValueError(f"weights {weights.shape} != (7, {channels})")

    kernels = []
    for parity in (0, 1):
        rows, cols = _placement(parity)
        # HWIO with I = in/groups = 1, O = channels.
        k = jnp.zeros((3, 3, 1, channels), weights.dtype)
        k = k.at[rows, cols, 0].set(weights)
        if data_format == "NCHW":
            k = jnp.transpose(k, (3, 2, 0, 1))
        kernels.append(k)
    k_even, k_odd = kernels

    dense_layout = "OIHW" if data_format == "NCHW" else "HWIO"
    dn = jax.lax.conv_dimension_numbers(
        x.shape, k_even.shape, (data_format, dense_layout, data_format)
    )
    # See hex_conv: bf16 operands keep f32 accumulation on TPU natively;
    # on other backends upcast so the accumulation dtype matches the
    # documented semantics everywhere.
    out_dtype = x.dtype
    if x.dtype == jnp.bfloat16 and jax.default_backend() != "tpu":
        x = x.astype(jnp.float32)
        k_even = k_even.astype(jnp.float32)
        k_odd = k_odd.astype(jnp.float32)
    conv = functools.partial(
        jax.lax.conv_general_dilated,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=dn,
        feature_group_count=channels,
        precision=precision,
        preferred_element_type=(
            jnp.float32 if x.dtype == jnp.float32 else None
        ),
    )
    y_even = conv(x, k_even)
    y_odd = conv(x, k_odd)
    col_is_odd = (jnp.arange(x.shape[col_axis]) % 2).astype(bool)
    shape = [1, 1, 1, 1]
    shape[col_axis] = -1
    return jnp.where(col_is_odd.reshape(shape), y_odd, y_even).astype(out_dtype)


def hex_conv_depthwise_reference(
    x: np.ndarray, weights: np.ndarray
) -> np.ndarray:
    """NumPy oracle for the depthwise hex conv (NCHW).  Test-only."""
    batch, cin, rows, cols = x.shape
    out = np.zeros_like(x, dtype=np.float32)
    for c in range(cols):
        offs = hex_neighbor_offsets(c % 2)
        for r in range(rows):
            acc = np.zeros((batch, cin), dtype=np.float32)
            for t, (dr, dc) in enumerate(offs):
                rr, cc = r + dr, c + dc
                if 0 <= rr < rows and 0 <= cc < cols:
                    acc += x[:, :, rr, cc] * weights[t][None, :]
            out[:, :, r, c] = acc
    return out


def hex_conv_reference(x: np.ndarray, weights: np.ndarray) -> np.ndarray:
    """Pure-NumPy oracle: explicit neighbor gathering.  Test-only."""
    batch, cin, rows, cols = x.shape
    _, _, cout = weights.shape
    out = np.zeros((batch, cout, rows, cols), dtype=np.float32)
    for c in range(cols):
        offs = hex_neighbor_offsets(c % 2)
        for r in range(rows):
            acc = np.zeros((batch, cout), dtype=np.float32)
            for t, (dr, dc) in enumerate(offs):
                rr, cc = r + dr, c + dc
                if 0 <= rr < rows and 0 <= cc < cols:
                    acc += x[:, :, rr, cc] @ weights[t]
            out[:, :, r, c] = acc
    return out
