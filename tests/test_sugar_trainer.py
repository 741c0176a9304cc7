"""Coarse SuGaR stage smoke: continue from a briefly-trained 3DGS state
through photo -> entropy -> sdf phases without degrading reconstruction."""

import jax.numpy as jnp
import numpy as np

from frosting_tpu.raster import RasterConfig
from frosting_tpu.scene import synthetic
from frosting_tpu.train import gs_trainer, sugar_trainer


def test_sugar_stage_runs_and_holds_psnr():
    rcfg = RasterConfig(
        width=64, height=64, chunk=32, max_instances=8192, backend="jax"
    )
    gt = synthetic.gaussian_blob_scene(n=300, seed=4)
    cams = synthetic.camera_ring(n_cams=8, radius=3.0)
    bg = jnp.zeros((3,), jnp.float32)
    gt_imgs = synthetic.render_gt_images(gt, cams, rcfg, bg)
    pts, cols = synthetic.degraded_init(gt, keep=0.6, jitter=0.05)

    gcfg = gs_trainer.GSTrainConfig(
        iterations=120, capacity=1024, densify_from=10_000,
        opacity_reset_interval=10_000, sh_increase_interval=40,
        log_every=60,
    )
    state, _ = gs_trainer.train(
        cams, gt_imgs, pts, cols, 3.3, rcfg, gcfg, log_fn=None
    )
    psnr_before = gs_trainer.evaluate(state, cams, gt_imgs, rcfg, gcfg)["psnr"]

    scfg = sugar_trainer.SugarTrainConfig(
        start_iteration=121,
        iterations=240,
        entropy_from=120,
        entropy_until=160,
        sdf_from=160,
        hard_prune_at=165,
        hard_prune_threshold=0.1,
        n_sdf_samples=2048,
        reset_neighbors_every=50,
        knn_k=8,
        log_every=60,
    )
    params, history = sugar_trainer.train(
        state.params, 3.3, cams, gt_imgs, rcfg, scfg, log_fn=None
    )
    assert all(np.isfinite(h["loss"]) for h in history)
    phases = {h["phase"] for h in history}
    assert "sdf" in phases
    final_state = state._replace(params=params)
    psnr_after = gs_trainer.evaluate(
        final_state, cams, gt_imgs, rcfg, gcfg
    )["psnr"]
    # surface regularization trades a little PSNR for geometry; don't collapse
    assert psnr_after > psnr_before - 3.0, (psnr_before, psnr_after)


def test_entropy_sdf_transition_solid_object():
    """Regression for the full-budget coarse-SuGaR collapse (46 -> 12 dB at
    the [entropy] -> [sdf] transition on a SOLID object scene, white bg):
    the root cause was a NaN entropy gradient at f32-saturated opacities
    that silently culled gaussians each step and left the hard prune to
    destroy the image. With the logit-space entropy the transition — the
    entropy window, the sdf losses, AND the opacity<0.5 hard prune — must
    keep every parameter finite and hold PSNR within ~2 dB."""
    import jax

    from frosting_tpu.scene.gaussians import activate
    from frosting_tpu.raster import render

    # solid object: surface ring + interior fill, saturated opacities
    rng = np.random.default_rng(3)
    n_s, n_i = 700, 300
    t = rng.uniform(0, 2 * np.pi, n_s)
    c = np.stack([np.cos(t), np.sin(t), 0.15 * np.sin(3 * t)], 1) * 0.9
    d = rng.normal(size=(n_s, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    surf = c + 0.18 * d
    inter = rng.normal(size=(n_i, 3)) * 0.35
    means = np.concatenate([surf, inter]).astype(np.float32)
    n = n_s + n_i
    gt = (
        jnp.asarray(means),
        jnp.full((n, 3), 0.05, jnp.float32),
        jnp.asarray(
            np.concatenate([np.ones((n, 1)), np.zeros((n, 3))], 1), jnp.float32
        ),
        jnp.full((n,), 0.95, jnp.float32),
        jnp.asarray(
            np.concatenate(
                [((means + 1.5) / 3.0)[:, None], np.zeros((n, 15, 3))], 1
            ),
            jnp.float32,
        ),
    )
    rcfg = RasterConfig(
        width=64, height=64, chunk=32, max_instances=16384, backend="jax"
    )
    cams = synthetic.camera_ring(n_cams=8, radius=3.0)
    white = jnp.ones((3,), jnp.float32)
    gt_imgs = synthetic.render_gt_images(gt, cams, rcfg, white)
    pts, cols = synthetic.degraded_init(gt, keep=0.7, jitter=0.02)

    gcfg = gs_trainer.GSTrainConfig(
        iterations=150, capacity=2048, densify_from=10_000,
        opacity_reset_interval=10_000, white_background=True, log_every=100,
    )
    state, _ = gs_trainer.train(
        cams, gt_imgs, pts, cols, 2.0, rcfg, gcfg, log_fn=None
    )
    # drive some opacities into f32 sigmoid saturation (logit > 16.6), the
    # regime that triggered the NaN cascade on the real run
    import dataclasses as dc

    raw = np.array(state.params.opacities_raw)
    live = np.asarray(state.params.mask) > 0.5
    hot = np.where(live)[0][:40]
    raw[hot] = 18.0
    params0 = dc.replace(
        state.params, opacities_raw=jnp.asarray(raw)
    )

    scfg = sugar_trainer.SugarTrainConfig(
        start_iteration=151, iterations=300, entropy_from=150,
        entropy_until=220, regularize_from=150, sdf_from=220,
        hard_prune_at=230, hard_prune_threshold=0.5,
        n_sdf_samples=2048, reset_neighbors_every=50, knn_k=8,
        white_background=True, log_every=25,
    )
    params, history = sugar_trainer.train(
        params0, 2.0, cams, gt_imgs, rcfg, scfg, log_fn=None
    )
    # every loss finite (the NaN cascade made most entropy losses NaN)
    assert all(np.isfinite(h["loss"]) for h in history), history
    # every parameter finite after the full transition
    for f in dc.fields(type(params)):
        if f.name == "bg":
            continue
        assert np.isfinite(np.asarray(getattr(params, f.name))).all(), f.name
    # PSNR across the entropy->sdf->prune transition holds to ~2 dB
    ent_psnr = max(
        h["psnr"] for h in history if h["phase"] in ("photo", "entropy")
    )
    sdf_psnrs = [h["psnr"] for h in history if h["phase"] == "sdf"]
    assert sdf_psnrs, history
    assert sdf_psnrs[-1] > ent_psnr - 2.0, (ent_psnr, sdf_psnrs)
