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
    # (B, H, W, Cin, Cout) — SCS net shapes: obs stem + residual trunk
    (256, 5, 5, 32, 32),
    (256, 5, 5, 64, 64),
    (256, 10, 10, 64, 64),
    (1024, 5, 5, 64, 64),
    (256, 10, 10, 96, 96),
    (64, 30, 30, 64, 64),
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
    for (B, H, W, Cin, Cout) in SHAPES:
        kx = jax.random.key(0)
        x = jax.random.normal(kx, (B, H, W, Cin), jnp.float32)
        w = jax.random.normal(jax.random.key(1), (7, Cin, Cout), jnp.float32)
        try:
            err = float(
                jnp.abs(xla(x, w) - pallas(x, w)).max()
            )
        except Exception as e:  # pallas may not lower off-TPU
            print(f"B{B} {H}x{W} {Cin}->{Cout}: pallas failed: {e}")
            continue
        t_xla = timeit(xla, x, w)
        t_pal = timeit(pallas, x, w)
        win = "pallas" if t_pal < t_xla else "xla"
        print(
            f"B{B} {H}x{W} {Cin}->{Cout}: xla {t_xla*1e6:8.1f}us  "
            f"pallas {t_pal*1e6:8.1f}us  -> {win}  (maxerr {err:.2e})"
        )


if __name__ == "__main__":
    main()
