import jax.numpy as jnp
import numpy as np

from frosting_tpu.ops import sh as sh_ops


def _random_dirs(n, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    return d / np.linalg.norm(d, axis=-1, keepdims=True)


def test_orthonormality_monte_carlo():
    """Real SH bases are orthonormal on the sphere: 4*pi*E[Y_i Y_j] = delta."""
    n = 200_000
    dirs = _random_dirs(n, seed=1)
    basis = np.asarray(sh_ops.eval_sh_bases(4, jnp.asarray(dirs, jnp.float32)))
    gram = 4.0 * np.pi * (basis.T @ basis) / n
    np.testing.assert_allclose(gram, np.eye(25), atol=0.08)


def test_dc_only_constant():
    dirs = _random_dirs(16)
    sh = np.zeros((16, 25, 3), np.float32)
    sh[:, 0, :] = 2.0
    out = sh_ops.eval_sh(4, jnp.asarray(sh), jnp.asarray(dirs, jnp.float32))
    np.testing.assert_allclose(out, 2.0 * sh_ops.C0, rtol=1e-6)


def test_rgb_sh_roundtrip():
    rgb = jnp.asarray(np.random.default_rng(2).uniform(size=(10, 3)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(sh_ops.sh_to_rgb(sh_ops.rgb_to_sh(rgb))), np.asarray(rgb),
        rtol=1e-5,
    )


def test_degree1_matches_reference_signs():
    """Reference CUDA: result = C0*sh0 - C1*y*sh1 + C1*z*sh2 - C1*x*sh3
    (forward.cu:36-38)."""
    d = np.array([[0.3, -0.5, 0.8]], np.float32)
    d /= np.linalg.norm(d)
    sh = np.zeros((1, 4, 1), np.float32)
    for k in range(4):
        sh[:] = 0
        sh[0, k, 0] = 1.0
        out = float(
            sh_ops.eval_sh(1, jnp.asarray(sh), jnp.asarray(d))[0, 0]
        )
        x, y, z = d[0]
        expected = [
            sh_ops.C0,
            -sh_ops.C1 * y,
            sh_ops.C1 * z,
            -sh_ops.C1 * x,
        ][k]
        np.testing.assert_allclose(out, expected, rtol=1e-5)
