"""Mesh-bound SuGaR representation: geometry invariants + trainability."""

import jax
import jax.numpy as jnp
import numpy as np

from frosting_tpu.cameras import look_at_camera
from frosting_tpu.models import mesh_bound
from frosting_tpu.ops import mesh as mesh_ops
from frosting_tpu.ops import quat as quat_ops
from frosting_tpu.raster import RasterConfig, render
from tests.test_mesh import icosphere

CFG = RasterConfig(width=64, height=64, chunk=32, max_instances=16384, backend="jax")
CAM = look_at_camera(eye=[0, 0, -3.0], target=[0, 0, 0])


def test_frames_and_patterns():
    v, f = icosphere(1)
    for npt in (1, 3, 4, 6):
        params, meta = mesh_bound.init_mesh_bound(v, f, n_per_triangle=npt)
        m, s, q, o, sh = mesh_bound.activate_mesh_bound(params, meta)
        assert m.shape[0] == len(f) * npt
        # gaussian axis 0 == face normal
        R = quat_ops.to_matrix(q)
        fn = np.asarray(
            mesh_ops.face_normals(jnp.asarray(v, jnp.float32), meta.faces)
        )
        ax0 = np.asarray(R[:, :, 0]).reshape(len(f), npt, 3)
        assert np.abs(ax0 - fn[:, None]).max() < 1e-4
        # centers lie on their face planes
        centers = np.asarray(m).reshape(len(f), npt, 3)
        tri0 = v[f[:, 0]]
        d = np.abs(np.sum((centers - tri0[:, None]) * fn[:, None], -1))
        assert d.max() < 1e-5
        # thin normal axis
        assert float(s[:, 0].max()) < float(s[:, 1:].min())


def test_optimizes_toward_target():
    v, f = icosphere(2)
    params, meta = mesh_bound.init_mesh_bound(
        v, f, n_per_triangle=3, vertex_colors=np.zeros_like(v) + 0.2
    )
    target = jnp.zeros((3, 64, 64), jnp.float32)

    def loss(p):
        m, s, q, o, sh = mesh_bound.activate_mesh_bound(p, meta)
        return jnp.mean(
            (render(m, s, q, o, sh, CAM, CFG).image - target) ** 2
        )

    l0 = float(loss(params))
    import optax

    tx = optax.adam(1e-2)
    st = tx.init(params)
    p = params
    for _ in range(25):
        g = jax.grad(loss)(p)
        upd, st = tx.update(g, st, p)
        p = optax.apply_updates(p, upd)
    l1 = float(loss(p))
    assert l1 < l0 * 0.5, (l0, l1)
