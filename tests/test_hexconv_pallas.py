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
