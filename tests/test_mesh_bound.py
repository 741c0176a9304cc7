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


def test_refined_sugar_trainer_reconstructs():
    """The refined-SuGaR stage (mesh-bound Gaussians optimized against
    renders, sugar refine analogue) must reconstruct a textured sphere to
    high quality from a flat init — wiring the representation into the
    pipeline as a trainable export path."""
    from frosting_tpu.scene import synthetic
    from frosting_tpu.train import refined_sugar

    rng = np.random.default_rng(0)
    n = 1200
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    gt = (
        jnp.asarray(d, jnp.float32),
        jnp.full((n, 3), 0.07, jnp.float32),
        jnp.asarray(
            np.concatenate([np.ones((n, 1)), np.zeros((n, 3))], 1), jnp.float32
        ),
        jnp.full((n,), 0.9, jnp.float32),
        jnp.asarray(
            np.concatenate(
                [((d + 1.5) / 3.0)[:, None], np.zeros((n, 15, 3))], 1
            ),
            jnp.float32,
        ),
    )
    cams = synthetic.camera_ring(n_cams=6, radius=3.0)
    gt_imgs = synthetic.render_gt_images(gt, cams, CFG, jnp.zeros((3,)))

    v, f = icosphere(3)
    # color transfer at init, as the reference does (vertex colors from the
    # scene); geometry-derived here since gt colors are (p + 1.5) / 3
    vcols = (v + 1.5) / 3.0
    params, meta = mesh_bound.init_mesh_bound(
        v, f, n_per_triangle=3, vertex_colors=vcols
    )
    p2, hist = refined_sugar.train(
        params, meta, 3.0, cams, gt_imgs, CFG,
        refined_sugar.MeshBoundTrainConfig(
            iterations=300, lr_max_steps=300, log_every=100
        ),
        log_fn=None,
    )
    # the reference's refined stage runs 2k-15k iterations; 300 CPU iters
    # only demonstrate healthy optimization, not final quality
    assert hist[-1]["psnr"] > 16.0, hist
    assert hist[-1]["psnr"] > hist[0]["psnr"] + 2.5, hist
    # gaussians stayed glued to the mesh (positions are a pure function of
    # the unchanged verts)
    m0, *_ = mesh_bound.activate_mesh_bound(params, meta)
    m1, *_ = mesh_bound.activate_mesh_bound(p2, meta)
    np.testing.assert_allclose(np.asarray(m0), np.asarray(m1), atol=1e-6)
