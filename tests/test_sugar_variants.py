"""SDF-mode and DN-consistency trainer variants: losses finite, maps
geometrically sane."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from frosting_tpu.cameras import look_at_camera
from frosting_tpu.models import sugar as sugar_lib
from frosting_tpu.ops import knn as knn_lib
from frosting_tpu.raster import RasterConfig
from frosting_tpu.scene import synthetic
from frosting_tpu.train import gs_trainer, sugar_trainer

CFG = RasterConfig(width=64, height=64, chunk=32, max_instances=8192, backend="jax")
CAM = look_at_camera(eye=[0, 0, -3.0], target=[0, 0, 0])


def _sphere(n=1200, seed=0):
    """Surfel-like sphere: each Gaussian is a thin disk whose smallest axis
    (= its normal) points radially."""
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    # frame with third column = radial direction
    up = np.where(np.abs(d[:, 2:3]) < 0.9, [[0, 0, 1.0]], [[1.0, 0, 0]])
    t1 = np.cross(up, d)
    t1 /= np.linalg.norm(t1, axis=1, keepdims=True)
    t2 = np.cross(d, t1)
    R = np.stack([t1, t2, d], axis=-1)  # columns
    from frosting_tpu.ops import quat as quat_ops

    quats = np.asarray(quat_ops.from_matrix(jnp.asarray(R, jnp.float32)))
    scales = np.tile([[0.06, 0.06, 0.012]], (n, 1))
    return (
        jnp.asarray(d, jnp.float32),
        jnp.asarray(scales, jnp.float32),
        jnp.asarray(quats, jnp.float32),
        jnp.full((n,), 0.9, jnp.float32),
    )


def test_depth_normal_maps_geometry():
    means, scales, quats, opac = _sphere()
    depth, normal, acc = sugar_lib.render_depth_normal_maps(
        means, scales, quats, opac, CAM, CFG
    )
    cov = np.asarray(acc) > 0.5
    assert cov.mean() > 0.05
    d = np.asarray(depth)[cov]
    assert 1.5 < d.mean() < 3.0  # sphere r=1, cam at 3
    # depth-derived normals averaged over the central patch should face the
    # camera (single pixels are noisy on a bumpy gaussian surface)
    nd = np.asarray(sugar_lib.normal_from_depth(depth, CAM, CFG))
    patch = nd[:, 28:37, 28:37].reshape(3, -1)
    pcov = cov[28:37, 28:37].reshape(-1)
    n_mean = patch[:, pcov].mean(axis=1)
    n_mean /= np.linalg.norm(n_mean) + 1e-9
    to_cam = np.asarray(CAM.cam_center) - np.array([0, 0, -1.0])
    cos = np.dot(n_mean, to_cam / np.linalg.norm(to_cam))
    assert abs(cos) > 0.7, (n_mean, cos)


def test_dn_consistency_loss_prefers_smooth():
    means, scales, quats, opac = _sphere()
    depth, normal, acc = sugar_lib.render_depth_normal_maps(
        means, scales, quats, opac, CAM, CFG
    )
    l_real = float(sugar_lib.dn_consistency_loss(depth, normal, acc, CAM, CFG))
    # random normals must be worse
    rng = np.random.default_rng(1)
    bad = jnp.asarray(rng.normal(size=normal.shape), jnp.float32)
    l_bad = float(sugar_lib.dn_consistency_loss(depth, bad, acc, CAM, CFG))
    assert np.isfinite(l_real) and 0 <= l_real < l_bad


def test_sdf_mode_step_runs():
    means, scales, quats, opac = _sphere()
    knn_idx, _ = knn_lib.knn(means, k=8)
    inp = sugar_lib.sample_sdf_points(
        jax.random.key(0), means, scales, quats, knn_idx,
        jnp.ones(means.shape[0], bool), 1024,
    )
    depth, _n, _a = sugar_lib.render_depth_normal_maps(
        means, scales, quats, opac, CAM, CFG
    )
    loss = sugar_lib.sdf_estimation_sdf_mode_loss(
        inp, means, scales, quats, opac, depth, CAM, CFG, 3.5
    )
    assert np.isfinite(float(loss))
    g = jax.grad(
        lambda s: sugar_lib.sdf_estimation_sdf_mode_loss(
            inp, means, s, quats, opac, depth, CAM, CFG, 3.5
        )
    )(scales)
    assert np.isfinite(np.asarray(g)).all()


def test_trainer_variant_phases():
    gt = synthetic.gaussian_blob_scene(n=250, seed=3)
    cams = synthetic.camera_ring(n_cams=4, radius=3.0)
    gt_imgs = synthetic.render_gt_images(gt, cams, CFG, jnp.zeros(3))
    pts, cols = synthetic.degraded_init(gt, keep=0.8, jitter=0.02)
    state, _ = gs_trainer.train(
        cams, gt_imgs, pts, cols, 3.3, CFG,
        gs_trainer.GSTrainConfig(
            iterations=40, capacity=512, densify_from=10_000,
            opacity_reset_interval=10_000, sh_increase_interval=20,
            log_every=20,
        ),
        log_fn=None,
    )
    for method in ["sdf", "dn_consistency"]:
        scfg = sugar_trainer.SugarTrainConfig(
            method=method, spatial_extent=3.3,
            start_iteration=41, iterations=70, entropy_from=40,
            entropy_until=50, sdf_from=50, hard_prune_at=55,
            hard_prune_threshold=0.1, n_sdf_samples=512,
            reset_neighbors_every=20, knn_k=8, log_every=20,
        )
        params, hist = sugar_trainer.train(
            state.params, 3.3, cams, gt_imgs, CFG, scfg, log_fn=None
        )
        assert all(np.isfinite(h["loss"]) for h in hist), (method, hist)
        assert any(h["phase"] == "sdf" for h in hist)
