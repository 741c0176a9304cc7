"""Rasterizer correctness: binned pure-JAX path vs the naive per-pixel
oracle, forward and gradients (the BASELINE.json config-1 style check)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frosting_tpu.cameras import look_at_camera
from frosting_tpu.ops import quat as quat_ops
from frosting_tpu.raster import RasterConfig, render
from frosting_tpu.raster.preprocess import preprocess
from frosting_tpu.raster.reference import render_naive


def make_scene(n=300, seed=0, opaque_wall=False):
    rng = np.random.default_rng(seed)
    means = rng.uniform(-0.8, 0.8, size=(n, 3))
    scales = np.exp(rng.uniform(np.log(0.02), np.log(0.12), size=(n, 3)))
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = rng.uniform(0.05, 0.995, size=(n,))
    if opaque_wall:
        opac[: n // 3] = 0.99
    sh = rng.normal(size=(n, 16, 3)) * 0.3
    sh[:, 0, :] += 1.0
    return (
        jnp.asarray(means, jnp.float32),
        jnp.asarray(scales, jnp.float32),
        jnp.asarray(quats, jnp.float32),
        jnp.asarray(opac, jnp.float32),
        jnp.asarray(sh, jnp.float32),
    )


# bwd_sort_bf16=False: the oracle-parity tests check the EXACT analytic
# backward; the bf16-packed default is covered by
# test_bwd_sort_bf16_grads_close against this pinned f32 path.
CFG = RasterConfig(
    width=64, height=64, tile_w=32, tile_h=32, chunk=32,
    max_instances=8192, backend="jax", bwd_sort_bf16=False,
)
CAM = look_at_camera(eye=[0.2, -0.3, -2.8], target=[0.0, 0.0, 0.0])
BG = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)


@pytest.mark.parametrize("opaque_wall", [False, True])
def test_forward_matches_naive(opaque_wall):
    gs = make_scene(opaque_wall=opaque_wall)
    out = render(*gs, CAM, CFG, bg=BG)
    proj = preprocess(*gs, CAM, CFG)
    img_ref, t_ref = render_naive(proj, BG, CFG)
    assert not bool(out.overflow)
    assert int(out.num_instances) > 0
    np.testing.assert_allclose(
        np.asarray(out.image), np.asarray(img_ref), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.t_final), np.asarray(t_ref), atol=2e-5, rtol=1e-4
    )


def test_gradients_match_naive_oracle():
    gs = make_scene(n=200, seed=3)
    target = jnp.asarray(
        np.random.default_rng(9).uniform(size=(3, 64, 64)), jnp.float32
    )

    def loss_binned(means, scales, quats, opac, sh):
        out = render(means, scales, quats, opac, sh, CAM, CFG, bg=BG)
        return jnp.mean((out.image - target) ** 2) + 0.1 * jnp.mean(
            out.t_final
        )

    def loss_naive(means, scales, quats, opac, sh):
        proj = preprocess(means, scales, quats, opac, sh, CAM, CFG)
        img, t = render_naive(proj, BG, CFG)
        return jnp.mean((img - target) ** 2) + 0.1 * jnp.mean(t)

    l1 = float(loss_binned(*gs))
    l2 = float(loss_naive(*gs))
    np.testing.assert_allclose(l1, l2, rtol=1e-5)

    g1 = jax.grad(loss_binned, argnums=(0, 1, 2, 3, 4))(*gs)
    g2 = jax.grad(loss_naive, argnums=(0, 1, 2, 3, 4))(*gs)
    names = ["means", "scales", "quats", "opacities", "sh"]
    for name, a, b in zip(names, g1, g2):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(
            a / scale, b / scale, atol=5e-4, err_msg=f"grad mismatch: {name}"
        )


def test_behind_camera_culled():
    gs = make_scene(n=50, seed=5)
    means = np.array(gs[0])
    means[:25, 2] = -10.0  # far behind the camera (camera looks from z=-2.8)
    gs = (jnp.asarray(means),) + gs[1:]
    out = render(*gs, CAM, CFG, bg=BG)
    radii = np.asarray(out.radii)
    assert (radii[:25] == 0).all()
    assert np.isfinite(np.asarray(out.image)).all()


def test_overflow_flag():
    cfg_small = dataclasses.replace(CFG, max_instances=64)
    gs = make_scene(n=300)
    out = render(*gs, CAM, cfg_small, bg=BG)
    assert bool(out.overflow)


def test_means2d_probe_gradients():
    gs = make_scene(n=100, seed=7)
    probe = jnp.zeros((100, 2), jnp.float32)

    def loss(p):
        out = render(*gs, CAM, CFG, bg=BG, means2d_probe=p)
        return jnp.sum(out.image)

    g = np.asarray(jax.grad(loss)(probe))
    assert np.isfinite(g).all()
    assert (np.abs(g).sum(axis=1) > 0).any()


def test_principal_point_shift():
    """Off-center principal point must shift projections by exactly the
    pixel delta (reference carries cx/cy through conversions,
    frosting_scene/cameras.py:295-310; previously parsed-then-dropped)."""
    from frosting_tpu.cameras import look_at_camera

    gs = make_scene(n=50)
    centered = look_at_camera(eye=[0.0, 0.0, -2.8], target=[0, 0, 0])
    shifted = look_at_camera(
        eye=[0.0, 0.0, -2.8], target=[0, 0, 0], pp_x=0.6, pp_y=0.45
    )
    p0 = preprocess(*gs, centered, CFG)
    p1 = preprocess(*gs, shifted, CFG)
    # pp moves by (0.1*W, -0.05*H) pixels, uniformly for all gaussians
    dx = np.asarray(p1.means2d[:, 0] - p0.means2d[:, 0])
    dy = np.asarray(p1.means2d[:, 1] - p0.means2d[:, 1])
    np.testing.assert_allclose(dx, 0.1 * CFG.width, atol=1e-3)
    np.testing.assert_allclose(dy, -0.05 * CFG.height, atol=1e-3)


def test_opacity_aware_rect_shrink_is_exact():
    """The rect is shrunk to the {raw >= ALPHA_CUTOFF} ellipse for
    low-opacity gaussians (preprocess.py t_cut). Outside it alpha is
    zeroed by chunk_math anyway, so a DENSE evaluation (every gaussian
    against every pixel, no rect mask) must match bit-for-bit whenever
    all cutoff ellipses fit inside 3 sigma (opac < e^{4.5}/255 ~ 0.353)."""
    rng = np.random.default_rng(11)
    n = 150
    means = rng.uniform(-0.8, 0.8, size=(n, 3))
    scales = np.exp(rng.uniform(np.log(0.05), np.log(0.3), size=(n, 3)))
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = rng.uniform(0.006, 0.34, size=(n,))
    opac[:5] = 0.0030  # below 1/255: culled entirely, contributes nothing
    sh = rng.normal(size=(n, 16, 3)) * 0.3
    gs = tuple(
        jnp.asarray(a, jnp.float32) for a in (means, scales, quats, opac, sh)
    )

    proj = preprocess(*gs, CAM, CFG)
    # sub-cutoff gaussians must be culled outright
    assert not np.asarray(proj.valid[:5]).any()

    img_rect, t_rect = render_naive(proj, BG, CFG)
    full = jnp.tile(
        jnp.asarray([[0, 0, CFG.tiles_x, CFG.tiles_y]], jnp.int32), (n, 1)
    )
    dense = proj._replace(
        rect=full, valid=jnp.ones((n,), bool) & (proj.depths > CFG.near)
    )
    img_dense, t_dense = render_naive(dense, BG, CFG)
    np.testing.assert_array_equal(np.asarray(img_rect), np.asarray(img_dense))
    np.testing.assert_array_equal(np.asarray(t_rect), np.asarray(t_dense))

    # and the real binned path agrees with the oracle on this scene
    out = render(*gs, CAM, CFG, bg=BG)
    np.testing.assert_allclose(
        np.asarray(out.image), np.asarray(img_rect), atol=2e-5, rtol=1e-4
    )


def test_bwd_sort_bf16_grads_close():
    """bwd_sort_bf16 packs per-INSTANCE gradient rows as bf16 pairs before
    the payload sort (render.py::_pack_bf16_pairs). Quantization is per
    instance, pre segment-sum, so gradients must stay close (direction
    preserved, relative error ~bf16 epsilon-scale) to the exact f32 path."""
    gs = make_scene(n=200, seed=3)
    target = jnp.asarray(
        np.random.default_rng(9).uniform(size=(3, 64, 64)), jnp.float32
    )
    cfg16 = dataclasses.replace(CFG, bwd_sort_bf16=True)

    def loss(cfg):
        def f(means, scales, quats, opac, sh):
            out = render(means, scales, quats, opac, sh, CAM, cfg, bg=BG)
            return jnp.mean((out.image - target) ** 2)

        return f

    g32 = jax.grad(loss(CFG), argnums=(0, 3))(*gs)
    g16 = jax.grad(loss(cfg16), argnums=(0, 3))(*gs)
    for a, b in zip(g32, g16):
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        assert cos > 0.9999, cos
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-2)
