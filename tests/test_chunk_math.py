"""Scan/reduction helpers used inside the blend kernels."""

import jax.numpy as jnp
import numpy as np

from frosting_tpu.raster import chunk_math


def test_scans_match_numpy():
    rng = np.random.default_rng(0)
    for k in (1, 2, 32, 64, 128, 100):  # incl. non-power-of-two
        x = rng.uniform(0.2, 1.0, size=(7, k)).astype(np.float32)
        xe = np.asarray(chunk_math.cumprod_excl(jnp.asarray(x)))
        ref = np.cumprod(x, axis=1) / x  # exclusive
        ref[:, 0] = 1.0
        np.testing.assert_allclose(xe, ref, rtol=2e-5)

        cs = np.asarray(chunk_math.cumsum_incl(jnp.asarray(x)))
        np.testing.assert_allclose(cs, np.cumsum(x, axis=1), rtol=2e-5)

        tp = np.asarray(chunk_math.tree_prod(jnp.asarray(x)))
        np.testing.assert_allclose(
            tp, np.prod(x, axis=1, keepdims=True), rtol=3e-5
        )
