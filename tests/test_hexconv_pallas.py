"""Pallas hex-conv kernel vs the NumPy oracle (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nuzero_tpu.ops.hexconv import hex_conv_reference
from nuzero_tpu.ops.pallas import hex_conv_pallas


@pytest.mark.parametrize("rows,cols,cin,cout", [(5, 5, 3, 4), (8, 6, 2, 2)])
def test_pallas_matches_oracle(rows, cols, cin, cout):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, rows, cols, cin)).astype(np.float32)
    w = rng.standard_normal((7, cin, cout)).astype(np.float32)
    got = np.asarray(
        hex_conv_pallas(jnp.asarray(x), jnp.asarray(w), interpret=True)
    )
    # oracle is NCHW
    want = hex_conv_reference(
        np.transpose(x, (0, 3, 1, 2)), w
    ).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_ad_gradients_match_xla():
    """Training through the Pallas backend must differentiate: the
    custom VJP routes the backward pass through the XLA dual-conv
    formulation (both compute the same function).  Regression for the
    10x10+ training crash (pallas_call has no native reverse-mode)."""
    import jax

    from nuzero_tpu.ops import hexconv as hc

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 10, 10, 3)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((7, 3, 4)).astype(np.float32))

    # Use interpret-mode pallas forward so the test runs on CPU.
    def fwd_pallas(x, w):
        from nuzero_tpu.ops.pallas import hex_conv_pallas

        return hex_conv_pallas(x, w, interpret=True)

    ad = jax.custom_vjp(fwd_pallas)
    ad.defvjp(
        lambda x, w: (fwd_pallas(x, w), (x, w)),
        hc._hex_conv_pallas_bwd,
    )

    def loss_ad(x, w):
        return (ad(x, w) ** 2).sum()

    def loss_xla(x, w):
        return (hc._hex_conv_xla_nhwc(x, w) ** 2).sum()

    gx_ad, gw_ad = jax.grad(loss_ad, argnums=(0, 1))(x, w)
    gx, gw = jax.grad(loss_xla, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_ad), np.asarray(gx), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_ad), np.asarray(gw), rtol=1e-3, atol=1e-3)
