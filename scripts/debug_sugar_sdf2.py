"""Repro #2: the Shelly-style SOLID object scene (surface + interior,
white bg) where the full-budget benchmark collapsed at the sdf phase
(46 -> 12 dB). Mirrors benchmark_shelly's exact sugar schedule at reduced
budget.

  PYTHONPATH=. python -u scripts/debug_sugar_sdf2.py [--case both|est|bn|none]
"""

import argparse
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))

from benchmark_shelly import make_object_scene  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="both")
    ap.add_argument("--gs-iters", type=int, default=1200)
    ap.add_argument("--sugar-iters", type=int, default=1000)
    ap.add_argument("--res", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from frosting_tpu.cameras import look_at_camera
    from frosting_tpu.raster import RasterConfig
    from frosting_tpu.scene import synthetic
    from frosting_tpu.train import gs_trainer, sugar_trainer

    rcfg = RasterConfig(
        width=args.res, height=args.res, chunk=128,
        max_instances=1 << 19, backend="auto",
    )
    gt_gs = make_object_scene(n_surface=8000, n_interior=3000)
    cams = []
    for ring, (radius, height) in enumerate(((2.7, 0.9), (2.3, 1.8))):
        for i in range(8):
            a = 2 * math.pi * (i + 0.33 * ring) / 8
            cams.append(
                look_at_camera(
                    eye=[radius * math.cos(a), radius * math.sin(a), height],
                    target=[0.0, 0.0, 0.0], up=(0, 0, 1),
                    fov_x=math.radians(50),
                )
            )
    white = jnp.ones((3,), jnp.float32)
    gt_imgs = synthetic.render_gt_images(gt_gs, cams, rcfg, white)

    rng = np.random.default_rng(1)
    n_pts = 3000
    sub = rng.choice(len(gt_gs[0]), n_pts, replace=False)
    points = np.asarray(gt_gs[0])[sub] + rng.normal(scale=0.01, size=(n_pts, 3))
    colors = np.full((n_pts, 3), 0.5, np.float32)

    gcfg = gs_trainer.GSTrainConfig(
        iterations=args.gs_iters, white_background=True, capacity=1 << 15,
        densify_until=int(args.gs_iters * 0.85), opacity_reset_interval=1500,
        log_every=200,
    )
    state, _ = gs_trainer.train(
        cams, np.asarray(gt_imgs), points, colors, 2.0, rcfg, gcfg
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
        hard_prune_at=args.gs_iters + int(args.sugar_iters * 0.5),
        white_background=True,
        sdf_estimation_factor=est,
        sdf_better_normal_factor=bn,
        n_sdf_samples=50_000,
        log_every=50,
    )
    print(f"case={args.case} est={est} bn={bn}", flush=True)
    state2, hist2 = sugar_trainer.train(
        state.params, 2.0, cams, np.asarray(gt_imgs), rcfg, scfg
    )
    for h in hist2:
        print(h, flush=True)


if __name__ == "__main__":
    main()
