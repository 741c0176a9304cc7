import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from frosting_tpu.ops import cov as cov_ops
from frosting_tpu.ops import quat as quat_ops


def _rand_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_to_matrix_vs_scipy():
    q = _rand_quats(32, 1)
    ours = np.asarray(quat_ops.to_matrix(jnp.asarray(q, jnp.float32)))
    # scipy uses xyzw ordering
    theirs = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_from_matrix_roundtrip():
    q = _rand_quats(64, 2)
    m = quat_ops.to_matrix(jnp.asarray(q, jnp.float32))
    q2 = np.asarray(quat_ops.from_matrix(m))
    # q and -q are the same rotation
    sign = np.sign(np.sum(q2 * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=1e-4)


def test_multiply_apply_consistent():
    q = _rand_quats(16, 3)
    v = np.random.default_rng(4).normal(size=(16, 3))
    qj = jnp.asarray(q, jnp.float32)
    vj = jnp.asarray(v, jnp.float32)
    rotated = np.asarray(quat_ops.apply(qj, vj))
    via_matrix = np.einsum("nij,nj->ni", np.asarray(quat_ops.to_matrix(qj)), v)
    np.testing.assert_allclose(rotated, via_matrix, atol=1e-5)


def test_cov3d_explicit():
    q = _rand_quats(8, 5)
    s = np.abs(np.random.default_rng(6).normal(size=(8, 3))) + 0.1
    cov6 = np.asarray(
        cov_ops.cov3d_from_scale_quat(jnp.asarray(s, jnp.float32), jnp.asarray(q, jnp.float32))
    )
    R = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    M = R * s[:, None, :]
    sigma = M @ M.transpose(0, 2, 1)
    full = np.asarray(cov_ops.unpack_cov3d(jnp.asarray(cov6)))
    np.testing.assert_allclose(full, sigma, rtol=2e-4, atol=1e-5)


def test_ewa_matches_numerical_jacobian():
    """Sigma2D (minus low-pass) == J_num Sigma J_num^T where J_num is the
    finite-difference Jacobian of world->pixel projection (unclamped region)."""
    from frosting_tpu.cameras import look_at_camera, ndc_to_pix

    W = H = 128
    cam = look_at_camera(eye=[0.1, -0.2, -3.0], target=[0.0, 0.0, 0.0])
    fx = W / (2 * float(cam.tan_fov_x))
    fy = H / (2 * float(cam.tan_fov_y))

    mean = np.array([0.15, -0.1, 0.2], np.float64)
    q = _rand_quats(1, 7)
    s = np.array([[0.05, 0.08, 0.03]])
    cov6 = cov_ops.cov3d_from_scale_quat(
        jnp.asarray(s, jnp.float32), jnp.asarray(q, jnp.float32)
    )

    wv = np.asarray(cam.world_view, np.float64)
    fp = np.asarray(cam.full_proj, np.float64)

    def project(p):
        ph = np.concatenate([p, [1.0]]) @ fp
        ndc = ph[:2] / (ph[3] + 1e-7)
        return np.array(
            [
                ((ndc[0] + 1) * W - 1) * 0.5,
                ((ndc[1] + 1) * H - 1) * 0.5,
            ]
        )

    eps = 1e-5
    J = np.zeros((2, 3))
    for i in range(3):
        dp = np.zeros(3)
        dp[i] = eps
        J[:, i] = (project(mean + dp) - project(mean - dp)) / (2 * eps)

    sigma3 = np.asarray(cov_ops.unpack_cov3d(cov6))[0]
    expected = J @ sigma3 @ J.T

    got = np.asarray(
        cov_ops.ewa_project(
            jnp.asarray(mean[None], jnp.float32),
            cov6,
            cam.world_view,
            fx,
            fy,
            cam.tan_fov_x,
            cam.tan_fov_y,
        )
    )[0]
    got_mat = np.array([[got[0] - 0.3, got[1]], [got[1], got[2] - 0.3]])
    np.testing.assert_allclose(got_mat, expected, rtol=2e-2, atol=1e-4)
