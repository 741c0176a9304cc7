"""Pallas kernel parity vs the pure-JAX blend, run in interpreter mode on CPU
(the compiled TPU path is exercised by bench.py / __graft_entry__ on chip)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from frosting_tpu.cameras import look_at_camera
from frosting_tpu.raster import RasterConfig, render

from tests.test_raster import make_scene

CAM = look_at_camera(eye=[0.2, -0.3, -2.8], target=[0.0, 0.0, 0.0])
BG = jnp.asarray([0.3, 0.1, 0.2], jnp.float32)
CFG_JAX = RasterConfig(
    width=64, height=64, tile_w=32, tile_h=32, chunk=32,
    max_instances=8192, backend="jax",
)
CFG_PALLAS = dataclasses.replace(CFG_JAX, backend="pallas", pallas_interpret=True)


def test_pallas_forward_matches_jax():
    gs = make_scene(n=250, seed=11, opaque_wall=True)
    out_j = render(*gs, CAM, CFG_JAX, bg=BG)
    out_p = render(*gs, CAM, CFG_PALLAS, bg=BG)
    np.testing.assert_allclose(
        np.asarray(out_p.image), np.asarray(out_j.image), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_p.t_final), np.asarray(out_j.t_final), atol=1e-5
    )


def test_pallas_gradients_match_jax():
    gs = make_scene(n=150, seed=12)
    target = jnp.asarray(
        np.random.default_rng(13).uniform(size=(3, 64, 64)), jnp.float32
    )

    def make_loss(cfg):
        def loss(means, scales, quats, opac, sh):
            out = render(means, scales, quats, opac, sh, CAM, cfg, bg=BG)
            return jnp.mean((out.image - target) ** 2) + 0.05 * jnp.mean(
                out.t_final
            )

        return loss

    g_j = jax.grad(make_loss(CFG_JAX), argnums=(0, 1, 2, 3, 4))(*gs)
    g_p = jax.grad(make_loss(CFG_PALLAS), argnums=(0, 1, 2, 3, 4))(*gs)
    for name, a, b in zip(["means", "scales", "quats", "opac", "sh"], g_p, g_j):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-8
        # atol 5e-5 (normalized): the basis-matmul form of power/moments
        # (chunk_math.tile_basis) reassociates the quadratic terms, so the
        # two backends can differ by a few ULP-amplification steps on
        # far-from-tile-center gaussians (max observed 2.3e-5).
        np.testing.assert_allclose(
            a / scale, b / scale, atol=5e-5, err_msg=f"grad mismatch: {name}"
        )


def test_tiles_per_program_parity():
    """Grouped-tile kernels (tiles_per_program > 1) must match tpp=1 and
    the JAX twin exactly: same math, different grid batching."""
    gs = make_scene(n=200, seed=21)
    out_ref = render(*gs, CAM, CFG_JAX, bg=BG)
    for tpp in (1, 2, 4):
        cfg = dataclasses.replace(CFG_PALLAS, tiles_per_program=tpp)
        out = render(*gs, CAM, cfg, bg=BG)
        np.testing.assert_allclose(
            np.asarray(out.image), np.asarray(out_ref.image),
            atol=1e-5, rtol=1e-5, err_msg=f"tpp={tpp}",
        )


def test_pallas_bwd_sort_bf16_grads_close():
    """The pallas-branch bf16-packed payload sort (render.py::
    _sorted_payload) must produce near-identical per-gaussian gradients to
    the exact f32 sort (interpret mode exercises the same reduction code
    the TPU path runs)."""
    gs = make_scene(n=250, seed=11)
    # bf16 packing is the DEFAULT; pin the exact f32 sort as the baseline
    cfg32 = dataclasses.replace(CFG_PALLAS, bwd_sort_bf16=False)

    def loss(cfg):
        def f(*g):
            out = render(*g, CAM, cfg, bg=BG)
            return jnp.mean(out.image ** 2)

        return f

    g32 = jax.grad(loss(cfg32), argnums=(0, 3))(*gs)
    g16 = jax.grad(loss(CFG_PALLAS), argnums=(0, 3))(*gs)
    for a, b in zip(g32, g16):
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        assert cos > 0.9999, cos
