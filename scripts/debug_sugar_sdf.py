"""Repro: density-method SuGaR PSNR collapse when the sdf-estimation
phase starts (seen in the full-budget Shelly benchmark: 46 dB -> 12 dB at
the [entropy]->[sdf] transition).

Runs a compressed schedule on the synthetic blob scene on CPU and ablates
the two sdf-phase terms.

  python scripts/debug_sugar_sdf.py [--case both|est|bn|none]
"""

import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="both")
    ap.add_argument("--gs-iters", type=int, default=800)
    ap.add_argument("--sugar-iters", type=int, default=800)
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from frosting_tpu.raster import RasterConfig
    from frosting_tpu.scene import synthetic
    from frosting_tpu.train import gs_trainer, sugar_trainer

    rcfg = RasterConfig(
        width=args.res, height=args.res, tile_w=32, tile_h=16,
        chunk=128 if args.tpu else 32,
        max_instances=1 << 17, backend="auto",
    )
    gt = synthetic.gaussian_blob_scene(n=2048, seed=0)
    cams = synthetic.camera_ring(n_cams=8, radius=3.0)
    white = jnp.ones((3,), jnp.float32)
    gt_imgs = synthetic.render_gt_images(gt, cams, rcfg, white)

    pts, cols = synthetic.degraded_init(gt, keep=0.7, jitter=0.02)
    gcfg = gs_trainer.GSTrainConfig(
        iterations=args.gs_iters, capacity=4096, white_background=True,
        densify_until=int(args.gs_iters * 0.8), log_every=100,
    )
    state, hist = gs_trainer.train(
        cams, np.asarray(gt_imgs), pts, cols, 3.0, rcfg, gcfg
    )

    est = 0.2 if args.case in ("both", "est") else 0.0
    bn = 0.2 if args.case in ("both", "bn") else 0.0
    scfg = sugar_trainer.SugarTrainConfig(
        iterations=args.gs_iters + args.sugar_iters,
        start_iteration=args.gs_iters,
        method="density",
        entropy_from=args.gs_iters,
        entropy_until=args.gs_iters + int(args.sugar_iters * 0.45),
        regularize_from=args.gs_iters,
        sdf_from=args.gs_iters + int(args.sugar_iters * 0.45),
        hard_prune_at=-1,
        white_background=True,
        sdf_estimation_factor=est,
        sdf_better_normal_factor=bn,
        n_sdf_samples=20_000,
        log_every=25,
        knn_k=8,
    )
    print(f"case={args.case} est={est} bn={bn}", flush=True)
    state2, hist2 = sugar_trainer.train(
        state.params, 3.0, cams, np.asarray(gt_imgs), rcfg, scfg
    )
    for h in hist2:
        print(h, flush=True)


if __name__ == "__main__":
    main()
