"""BASELINE config-2 stand-in: full 3DGS 7k-iteration training with PSNR
on a held-out split, run end-to-end on the real TPU chip.

PROTOCOL (documented per VERDICT round-1 item 6 — no MipNeRF-360 data
ships in this air-gapped environment, so the scene is a high-complexity
synthetic stand-in rendered by the same rasterizer):
  * GT scene: 30k-Gaussian composite (torus-knot blob + ground plane +
    clutter spheres) with per-Gaussian SH colors, anisotropic scales and
    random rotations — rendered at 512x512 from 48 cameras on two rings.
  * Split: every 8th view held out for eval (the reference's llffhold=8,
    gs_model.py:140-150); 42 train / 6 eval.
  * Training: the full 3DGS recipe — Adam groups + expon position LR,
    L1 + 0.2 D-SSIM, SH warmup, densify/clone/split/prune + opacity
    resets — for 7,000 iterations (train_full_pipeline.py:160).
  * Metric: eval-split PSNR/SSIM -> PSNR_BENCH.json.

Run:  python scripts/benchmark_psnr.py [--iterations 7000] [--res 512]
"""

import argparse
import json
import math
import time

import numpy as np


def make_scene(seed=0):
    """30k-gaussian composite scene (activated arrays)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    parts = []

    # torus knot
    n1 = 14_000
    t = rng.uniform(0, 2 * np.pi, n1)
    p, q = 2, 3
    r = 0.55 + 0.22 * np.cos(q * t)
    x = r * np.cos(p * t)
    y = r * np.sin(p * t)
    z = -0.18 * np.sin(q * t) + 0.25
    m1 = np.stack([x, y, z], 1) + rng.normal(scale=0.035, size=(n1, 3))
    c1 = np.stack(
        [0.5 + 0.5 * np.cos(t), 0.5 + 0.5 * np.sin(2 * t), 0.3 + 0.3 * np.cos(3 * t)], 1
    )
    parts.append((m1, c1, (0.008, 0.045)))

    # ground plane with checker coloring
    n2 = 10_000
    gx = rng.uniform(-1.6, 1.6, n2)
    gy = rng.uniform(-1.6, 1.6, n2)
    m2 = np.stack([gx, gy, np.full(n2, -0.45) + rng.normal(scale=0.01, size=n2)], 1)
    checker = ((np.floor(gx * 3) + np.floor(gy * 3)) % 2)
    c2 = np.stack(
        [0.2 + 0.6 * checker, 0.35 + 0.3 * checker, 0.55 - 0.3 * checker], 1
    )
    parts.append((m2, c2, (0.015, 0.06)))

    # clutter spheres
    n3 = 6_000
    centers = rng.uniform(-1.1, 1.1, (8, 3)) * np.array([1, 1, 0.3])
    which = rng.integers(0, 8, n3)
    d = rng.normal(size=(n3, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    m3 = centers[which] + d * rng.uniform(0.1, 0.16, (n3, 1))
    c3 = rng.uniform(0.15, 0.95, (8, 3))[which]
    parts.append((m3, c3, (0.01, 0.04)))

    means = np.concatenate([p[0] for p in parts]).astype(np.float32)
    cols = np.concatenate([p[1] for p in parts]).astype(np.float32)
    n = len(means)
    scales = np.exp(
        rng.uniform(np.log(0.006), np.log(0.022), (n, 3))
    ).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.55, 0.98, n).astype(np.float32)
    from frosting_tpu.ops import sh as sh_ops

    sh = np.zeros((n, 16, 3), np.float32)
    sh[:, 0] = np.asarray(sh_ops.rgb_to_sh(jnp.asarray(cols)))
    sh[:, 1:4] = rng.normal(scale=0.07, size=(n, 3, 3))
    return tuple(
        jnp.asarray(a, jnp.float32) for a in (means, scales, quats, opac, sh)
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iterations", type=int, default=7000)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--out", default="PSNR_BENCH.json")
    ap.add_argument("--llffhold", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from frosting_tpu.cameras import look_at_camera
    from frosting_tpu.raster import RasterConfig
    from frosting_tpu.scene import synthetic
    from frosting_tpu.train import gs_trainer

    rcfg = RasterConfig(
        width=args.res, height=args.res, chunk=128, max_instances=1 << 20,
        backend="auto",
    )
    gt = make_scene()

    cams = []
    for ring, (radius, height) in enumerate(((3.1, 1.1), (2.6, 2.0))):
        for i in range(24):
            a = 2 * math.pi * (i + 0.5 * ring) / 24
            cams.append(
                look_at_camera(
                    eye=[radius * math.cos(a), radius * math.sin(a), height],
                    target=[0.0, 0.0, 0.0],
                    up=(0, 0, 1),
                    fov_x=math.radians(55),
                )
            )
    print(f"rendering {len(cams)} GT views at {args.res}^2 ...", flush=True)
    gt_imgs = synthetic.render_gt_images(gt, cams, rcfg, jnp.zeros((3,)))

    train_idx = [i for i in range(len(cams)) if i % args.llffhold != 0]
    eval_idx = [i for i in range(len(cams)) if i % args.llffhold == 0]
    train_cams = [cams[i] for i in train_idx]
    eval_cams = [cams[i] for i in eval_idx]

    pts, cols = synthetic.degraded_init(gt, keep=0.25, jitter=0.03)
    cfg = gs_trainer.GSTrainConfig(
        iterations=args.iterations, capacity=1 << 18, log_every=500
    )
    t0 = time.time()
    state, hist = gs_trainer.train(
        train_cams, gt_imgs[train_idx], pts, cols, 3.4, rcfg, cfg
    )
    wall = time.time() - t0
    res = gs_trainer.evaluate(state, eval_cams, gt_imgs[eval_idx], rcfg, cfg)
    train_res = gs_trainer.evaluate(
        state, train_cams[::6], gt_imgs[train_idx][::6], rcfg, cfg
    )
    out = {
        "protocol": "synthetic stand-in for MipNeRF360 garden 7k "
        "(no real datasets in env); 48 cams, llffhold 8, full 3DGS recipe",
        "resolution": args.res,
        "iterations": args.iterations,
        "n_train_views": len(train_cams),
        "n_eval_views": len(eval_cams),
        "eval_psnr": res["psnr"],
        "eval_ssim": res["ssim"],
        "train_psnr": train_res["psnr"],
        "final_gaussians": int(np.asarray(state.params.num_active())),
        "wall_clock_s": round(wall, 1),
        "iters_per_s": round(args.iterations / wall, 2),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
