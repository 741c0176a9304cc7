"""End-to-end vanilla 3DGS training on a synthetic scene (CPU, small):
PSNR must climb substantially from the degraded init."""

import jax.numpy as jnp
import numpy as np

from frosting_tpu.raster import RasterConfig
from frosting_tpu.scene import synthetic
from frosting_tpu.train import gs_trainer


def test_train_recovers_synthetic_scene():
    rcfg = RasterConfig(
        width=64, height=64, chunk=32, max_instances=8192, backend="jax"
    )
    gt = synthetic.gaussian_blob_scene(n=400, seed=0)
    cams = synthetic.camera_ring(n_cams=10, radius=3.0)
    bg = jnp.zeros((3,), jnp.float32)
    gt_imgs = synthetic.render_gt_images(gt, cams, rcfg, bg)

    pts, cols = synthetic.degraded_init(gt, keep=0.5, jitter=0.08)
    cfg = gs_trainer.GSTrainConfig(
        iterations=150,
        capacity=2048,
        densify_from=100,
        densification_interval=100,
        opacity_reset_interval=10_000,
        sh_increase_interval=100,
        log_every=100,
    )
    state, history = gs_trainer.train(
        cams, gt_imgs, pts, cols, 3.3, rcfg, cfg, log_fn=None
    )
    metrics = gs_trainer.evaluate(state, cams, gt_imgs, rcfg, cfg)
    # history[0] is logged at iter 100, already part-trained; require clear
    # further improvement and a good absolute reconstruction.
    first_psnr = history[0]["psnr"]
    assert metrics["psnr"] > 24.0, (first_psnr, metrics)
    assert metrics["psnr"] > first_psnr + 1.0
    assert not history[-1]["overflow"]
