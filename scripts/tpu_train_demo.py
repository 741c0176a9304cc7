"""Real-TPU training demonstration: vanilla 3DGS stage on a synthetic scene.

Renders ground truth with the renderer itself, trains from a degraded
init with the full trainer (densification included), and reports PSNR +
sustained it/s. Run: python scripts/tpu_train_demo.py [iters]
"""

import sys
import time

import numpy as np


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 1500

    import jax
    import jax.numpy as jnp

    from frosting_tpu.raster import RasterConfig
    from frosting_tpu.scene import synthetic
    from frosting_tpu.train import gs_trainer

    print("devices:", jax.devices(), flush=True)
    rcfg = RasterConfig(
        width=512, height=512, chunk=128, max_instances=1 << 20,
        backend="auto",
    )
    gt = synthetic.gaussian_blob_scene(n=60_000, seed=0)
    cams = synthetic.camera_ring(n_cams=24, radius=3.0)
    bg = jnp.zeros((3,), jnp.float32)
    t0 = time.time()
    gt_imgs = synthetic.render_gt_images(gt, cams, rcfg, bg)
    print(f"GT rendered in {time.time()-t0:.1f}s", flush=True)

    pts, cols = synthetic.degraded_init(gt, keep=0.4, jitter=0.05)
    cfg = gs_trainer.GSTrainConfig(
        iterations=iters,
        capacity=1 << 17,
        densify_from=300,
        densify_until=iters,
        densification_interval=150,
        opacity_reset_interval=10_000,
        sh_increase_interval=400,
        log_every=100,
    )
    t0 = time.time()
    state, history = gs_trainer.train(
        cams, gt_imgs, pts, cols, 3.3, rcfg, cfg, log_fn=print
    )
    dt = time.time() - t0
    metrics = gs_trainer.evaluate(state, cams[:4], gt_imgs[:4], rcfg, cfg)
    print(
        f"\n=== {iters} iters in {dt:.1f}s = {iters/dt:.1f} it/s | "
        f"eval PSNR {metrics['psnr']:.2f} dB SSIM {metrics['ssim']:.3f} | "
        f"{int(np.asarray(state.params.num_active()))} gaussians ===",
        flush=True,
    )


if __name__ == "__main__":
    main()
