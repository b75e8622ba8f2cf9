"""Hex-conv backend shootout: XLA dual-conv lowering vs fused Pallas kernel.

Measures both backends at SCS-relevant shapes on the current default JAX
backend and prints per-shape timings + the winner.  The result is recorded
in ``nuzero_tpu/ops/hexconv.py``'s backend docnote and sets the default
used by ``networks.blocks.HexConv``.

    python benchmarks/hexconv_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from nuzero_tpu.ops.hexconv import hex_conv
from nuzero_tpu.ops.pallas.hexconv_kernel import hex_conv_pallas

SHAPES = [
    # (B, H, W, Cin, Cout, dtype) — SCS net shapes: obs stem + residual
    # trunk, f32 and the flagship bf16 trunk/recall shapes.
    (256, 5, 5, 32, 32, "float32"),
    (256, 5, 5, 64, 64, "float32"),
    (256, 10, 10, 64, 64, "float32"),
    (1024, 5, 5, 64, 64, "float32"),
    (256, 10, 10, 96, 96, "float32"),
    (64, 30, 30, 64, 64, "float32"),
    (512, 5, 5, 342, 256, "bfloat16"),  # flagship recall conv shape
    (512, 5, 5, 256, 256, "bfloat16"),
    (256, 10, 10, 256, 256, "bfloat16"),
    (64, 15, 15, 256, 256, "bfloat16"),
]


def timeit(fn, *args, reps=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    print("backend:", jax.default_backend())
    xla = jax.jit(lambda x, w: hex_conv(x, w, data_format="NHWC"))
    pallas = jax.jit(hex_conv_pallas)
    for (B, H, W, Cin, Cout, dtype) in SHAPES:
        dt = jnp.dtype(dtype)
        kx = jax.random.key(0)
        x = jax.random.normal(kx, (B, H, W, Cin), dt)
        w = jax.random.normal(jax.random.key(1), (7, Cin, Cout), dt)
        try:
            err = float(
                jnp.abs(
                    xla(x, w).astype(jnp.float32)
                    - pallas(x, w).astype(jnp.float32)
                ).max()
            )
        except Exception as e:  # pallas may not lower off-TPU
            print(f"B{B} {H}x{W} {Cin}->{Cout} {dtype}: pallas failed: {e}")
            continue
        t_xla = timeit(xla, x, w)
        t_pal = timeit(pallas, x, w)
        win = "pallas" if t_pal < t_xla else "xla"
        print(
            f"B{B} {H}x{W} {Cin}->{Cout} {dtype}: xla {t_xla*1e6:8.1f}us  "
            f"pallas {t_pal*1e6:8.1f}us  -> {win}  (maxerr {err:.2e})"
        )


if __name__ == "__main__":
    main()
