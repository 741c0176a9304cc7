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
