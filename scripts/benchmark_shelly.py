"""BASELINE gated config (3) stand-in: SuGaR + shell extraction + frosting
on a Shelly-style OBJECT scene, end-to-end on the real TPU chip.

PROTOCOL (same rationale as scripts/benchmark_psnr.py — the air-gapped
environment ships no datasets, so the scene is a synthetic stand-in
rendered by our own rasterizer):
  * GT scene: a solid torus-knot "creature" (surface shell of Gaussians +
    filled interior) on a WHITE background — the Shelly benchmark regime
    (object-centric, no background model; configs/shelly.json).
  * Shelly config knobs (BASELINE.md / configs/shelly.json): density
    regularization, no background Gaussians, cleaning_quantile 0.0,
    vis_th 0.5, white background.
  * Pipeline: all five stages via pipeline.run_pipeline — 3DGS, coarse
    SuGaR (density), shell extraction (Poisson + QEM + visibility
    culling), frosting init, frosting refinement.
  * Split: every 8th view held out; eval PSNR/SSIM of the REFINED
    FROSTING on the held-out views -> SHELLY_BENCH.json (plus mesh stats).

Run:  python scripts/benchmark_shelly.py [--res 512] [--gs-iters 3000] ...
"""

import argparse
import dataclasses
import json
import math
import time

import numpy as np


def make_object_scene(seed=0, n_surface=16_000, n_interior=6_000):
    """Solid torus-knot object: dense surface shell + dimmer interior fill
    (activated arrays). Object-centric like Shelly's khady."""
    import jax.numpy as jnp

    from frosting_tpu.ops import sh as sh_ops

    rng = np.random.default_rng(seed)
    p, q = 2, 3

    def knot(t):
        r = 0.55 + 0.22 * np.cos(q * t)
        return np.stack(
            [r * np.cos(p * t), r * np.sin(p * t), -0.22 * np.sin(q * t)], 1
        )

    # surface: tube of radius rho around the knot curve
    t = rng.uniform(0, 2 * np.pi, n_surface)
    c = knot(t)
    d = rng.normal(size=(n_surface, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rho = 0.16
    m_surf = c + d * rho
    col_surf = np.stack(
        [
            0.55 + 0.4 * np.cos(t),
            0.45 + 0.35 * np.sin(2 * t),
            0.35 + 0.3 * np.cos(3 * t + 1.0),
        ],
        1,
    )

    # interior fill (solid object => opaque core, like a scanned figurine)
    t2 = rng.uniform(0, 2 * np.pi, n_interior)
    c2 = knot(t2)
    d2 = rng.normal(size=(n_interior, 3))
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    m_int = c2 + d2 * rho * np.cbrt(rng.uniform(0, 1, (n_interior, 1)))
    col_int = np.full((n_interior, 3), 0.45) + rng.normal(
        scale=0.05, size=(n_interior, 3)
    )

    means = np.concatenate([m_surf, m_int]).astype(np.float32)
    cols = np.clip(np.concatenate([col_surf, col_int]), 0.02, 0.98)
    n = len(means)
    scales = np.exp(
        rng.uniform(np.log(0.006), np.log(0.018), (n, 3))
    ).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = np.concatenate(
        [
            rng.uniform(0.75, 0.99, n_surface),
            rng.uniform(0.5, 0.9, n_interior),
        ]
    ).astype(np.float32)
    sh = np.zeros((n, 16, 3), np.float32)
    sh[:, 0] = np.asarray(sh_ops.rgb_to_sh(jnp.asarray(cols.astype(np.float32))))
    sh[:, 1:4] = rng.normal(scale=0.05, size=(n, 3, 3))
    return tuple(
        jnp.asarray(a, jnp.float32) for a in (means, scales, quats, opac, sh)
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--gs-iters", type=int, default=3000)
    ap.add_argument("--sugar-iters", type=int, default=2000)
    ap.add_argument("--refine-iters", type=int, default=2000)
    ap.add_argument("--n-gaussians", type=int, default=300_000)
    ap.add_argument("--target-vertices", type=int, default=200_000)
    ap.add_argument("--llffhold", type=int, default=8)
    ap.add_argument("--out", default="SHELLY_BENCH.json")
    ap.add_argument(
        "--cache-dir", default="",
        help="stage-artifact cache: completed stages are skipped on "
        "re-run (survives transient TPU worker crashes)",
    )
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--max-instances", type=int, default=1 << 20)
    ap.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (this env overrides JAX_PLATFORMS)",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from frosting_tpu import pipeline
    from frosting_tpu.cameras import look_at_camera
    from frosting_tpu.extract.shell import ShellConfig
    from frosting_tpu.models import frosting as frosting_lib
    from frosting_tpu.ops.ssim import psnr as psnr_fn, ssim
    from frosting_tpu.raster import RasterConfig, render
    from frosting_tpu.scene import synthetic
    from frosting_tpu.train import frosting_trainer, gs_trainer, sugar_trainer

    rcfg = RasterConfig(
        width=args.res, height=args.res, chunk=args.chunk,
        max_instances=args.max_instances, backend="auto",
    )
    gt_gs = make_object_scene(
        n_surface=max(2000, min(16_000, args.n_gaussians // 15)),
        n_interior=max(800, min(6_000, args.n_gaussians // 40)),
    )

    cams = []
    for ring, (radius, height) in enumerate(((2.7, 0.9), (2.3, 1.8), (2.9, -0.4))):
        for i in range(12):
            a = 2 * math.pi * (i + 0.33 * ring) / 12
            cams.append(
                look_at_camera(
                    eye=[radius * math.cos(a), radius * math.sin(a), height],
                    target=[0.0, 0.0, 0.0],
                    up=(0, 0, 1),
                    fov_x=math.radians(50),
                )
            )

    white = jnp.ones((3,), jnp.float32)
    gt_images = synthetic.render_gt_images(gt_gs, cams, rcfg, white)

    eval_idx = list(range(0, len(cams), args.llffhold))
    train_idx = [i for i in range(len(cams)) if i not in eval_idx]
    train_cams = [cams[i] for i in train_idx]
    train_imgs = gt_images[train_idx]
    eval_cams = [cams[i] for i in eval_idx]
    eval_imgs = gt_images[eval_idx]

    # SfM-like point init: subsampled noisy GT points
    rng = np.random.default_rng(1)
    n_pts = min(4000, len(gt_gs[0]) // 2)
    sub = rng.choice(len(gt_gs[0]), n_pts, replace=False)
    points = np.asarray(gt_gs[0])[sub] + rng.normal(scale=0.01, size=(n_pts, 3))
    colors = np.full((n_pts, 3), 0.5, np.float32)

    # Shelly protocol: density reg, no bg gaussians, quantile 0.0,
    # vis_th 0.5, white background (configs/shelly.json)
    cfg = pipeline.PipelineConfig(
        gs=gs_trainer.GSTrainConfig(
            iterations=args.gs_iters,
            white_background=True,
            capacity=1 << 17,
            densify_until=int(args.gs_iters * 0.85),
            opacity_reset_interval=1500,
        ),
        sugar=sugar_trainer.SugarTrainConfig(
            iterations=args.gs_iters + args.sugar_iters,
            start_iteration=args.gs_iters,
            method="density",
            entropy_from=args.gs_iters,
            entropy_until=args.gs_iters + int(args.sugar_iters * 0.45),
            regularize_from=args.gs_iters,
            sdf_from=args.gs_iters + int(args.sugar_iters * 0.45),
            # the opacity<0.5 hard prune assumes a converged coarse model;
            # at smoke budgets it would wipe the scene
            hard_prune_at=(
                args.gs_iters + int(args.sugar_iters * 0.5)
                if args.sugar_iters >= 500
                else -1
            ),
            white_background=True,
        ),
        shell=ShellConfig(
            cleaning_quantile=0.0,
            target_vertices=args.target_vertices,
            fg_split=False,
            # 512^3 for the timed benchmark run (2.0M-vert reconstruction
            # at this budget already exceeds the 200k decimation target
            # 10x); the depth-10 1024^3 route is exercised by
            # scripts/extract_fullres.py
            max_poisson_resolution=512,
        ),
        frosting=frosting_lib.FrostingConfig(
            n_gaussians=args.n_gaussians,
        ),
        refine=frosting_trainer.FrostingTrainConfig(
            iterations=args.refine_iters,
            lr_max_steps=args.refine_iters,
            white_background=True,
            use_occlusion_culling=True,
        ),
        use_background_gaussians=False,
    )

    import os

    pre_cached = (
        sorted(os.listdir(args.cache_dir))
        if args.cache_dir and os.path.isdir(args.cache_dir)
        else []
    )
    t0 = time.time()
    out = pipeline.run_pipeline(
        train_cams, train_imgs, points, colors, 2.0, rcfg, cfg, seed=0,
        cache_dir=args.cache_dir or None,
    )
    wall = time.time() - t0

    # eval the refined frosting on the held-out views
    fparams = out["frosting_params"]
    meta = out["frosting_meta"]

    def render_eval(p, m, cam):
        g = frosting_lib.activate_frosting(p, m)
        return render(*g, cam, rcfg, bg=white).image

    fn = jax.jit(render_eval)
    psnrs, ssims = [], []
    for cam, gt_img in zip(eval_cams, eval_imgs):
        img = np.clip(np.asarray(fn(fparams, meta, cam)), 0, 1)
        psnrs.append(float(psnr_fn(jnp.asarray(img), jnp.asarray(gt_img))))
        ssims.append(float(ssim(jnp.asarray(img), jnp.asarray(gt_img))))

    result = {
        "protocol": "synthetic Shelly stand-in (solid torus-knot object, white bg); density reg, no bg gaussians, cleaning_quantile 0.0, occlusion culling — configs/shelly.json knobs",
        "resolution": args.res,
        "n_train_views": len(train_cams),
        "n_eval_views": len(eval_cams),
        "gs_iters": args.gs_iters,
        "sugar_iters": args.sugar_iters,
        "refine_iters": args.refine_iters,
        "n_frosting_gaussians": args.n_gaussians,
        "shell_vertices": int(np.asarray(out["shell_verts"]).shape[0]),
        "shell_faces": int(np.asarray(out["shell_faces"]).shape[0]),
        "poisson_resolutions": [
            int(r) for r in out.get("shell_poisson_resolutions", [])
        ],
        "eval_psnr": float(np.mean(psnrs)),
        "eval_ssim": float(np.mean(ssims)),
        "wall_clock_s": round(wall, 1),
        # stages already present in --cache-dir were skipped this run;
        # wall_clock_s then covers only the resumed stages
        "resumed_from_cache": pre_cached,
    }
    print(json.dumps(result))
    with open(args.out, "w") as fp:
        json.dump(result, fp, indent=1)


if __name__ == "__main__":
    main()
