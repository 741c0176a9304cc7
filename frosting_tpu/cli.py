"""Command-line entry point: the train_full_pipeline.py analogue.

Usage:
  python -m frosting_tpu.cli -s <colmap_scene_dir> -o <output_dir> \
      [--regularization density|sdf|dn_consistency] [--gaussians 2000000] \
      [--refinement-time short|medium|long] [--low-poly] [--white-bg] \
      [--export-obj]

Runs all six stages in-process (no os.system chaining) and writes:
  output/<name>/gs.ply            vanilla 3DGS checkpoint (viewer PLY)
  output/<name>/sugar.ply         coarse SuGaR checkpoint
  output/<name>/shell.ply         extracted base mesh
  output/<name>/frosting.ply      refined frosting as viewer PLY
  output/<name>/frosting.npz      frosting params (exact resume)
  output/<name>/mesh.obj/.mtl/.png  textured mesh (--export-obj)
  output/<name>/metrics.json      eval-split PSNR/SSIM(/LPIPS)
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-s", "--scene", required=True, help="COLMAP scene dir")
    p.add_argument("-o", "--output", default="output")
    p.add_argument(
        "-r", "--regularization", default="density",
        choices=["density", "sdf", "dn_consistency"],
    )
    p.add_argument("--gaussians", type=int, default=2_000_000)
    p.add_argument(
        "--refinement-time", default="long",
        choices=["short", "medium", "long"],
    )
    p.add_argument("--low-poly", action="store_true")
    p.add_argument("--white-bg", action="store_true")
    p.add_argument("--export-obj", action="store_true")
    p.add_argument("--eval", action="store_true", help="hold out every 8th view")
    p.add_argument("--resolution-scale", type=int, default=1)
    p.add_argument("--iterations-3dgs", type=int, default=7_000)
    p.add_argument("--capacity", type=int, default=1 << 19)
    p.add_argument("--max-instances", type=int, default=1 << 21)
    p.add_argument(
        "--learn-shell", action="store_true",
        help="optimize the shell inner/outer offsets during refinement "
        "(train.py --learn_shell)",
    )
    p.add_argument(
        "--regularize-shell", action="store_true",
        help="normal-consistency regularization of the learned offset "
        "surfaces (train.py --regularize_shell; functional here, see "
        "FrostingTrainConfig.regularize_shell)",
    )
    p.add_argument(
        "-n", "--normal-consistency-factor", type=float, default=0.1,
        help="weight of the shell normal-consistency term (train.py:68)",
    )
    p.add_argument(
        "--tiny", action="store_true",
        help="minutes-scale smoke preset (tiny budgets for all stages)",
    )
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    # no-op single-process; on a pod it must run before device queries
    from frosting_tpu.parallel import multihost

    multihost.initialize()

    from frosting_tpu import metrics as metrics_lib
    from frosting_tpu import pipeline
    from frosting_tpu.extract.shell import ShellConfig
    from frosting_tpu.models import frosting as frosting_lib
    from frosting_tpu.raster import RasterConfig
    from frosting_tpu.scene import dataset, gaussians as gauss_lib
    from frosting_tpu.train import (
        checkpoint,
        frosting_trainer,
        gs_trainer,
        sugar_trainer,
    )

    scene = dataset.load_colmap_scene(
        args.scene,
        resolution_scale=args.resolution_scale,
        eval_split=args.eval,
    )
    name = os.path.basename(os.path.normpath(args.scene))
    out_dir = os.path.join(args.output, name)
    os.makedirs(out_dir, exist_ok=True)

    cams = [c.camera for c in scene.train_cameras]
    gt = np.stack([c.image() for c in scene.train_cameras])
    h, w = gt.shape[-2:]
    max_inst = 8192 if args.tiny else args.max_instances
    chunk = 32 if args.tiny else 128
    rcfg = RasterConfig(
        width=w, height=h, chunk=chunk, max_instances=max_inst
    )

    refine_iters = {"short": 2_000, "medium": 7_000, "long": 15_000}[
        args.refinement_time
    ]
    if args.tiny:
        cfg = pipeline.PipelineConfig(
            gs=gs_trainer.GSTrainConfig(
                iterations=80, capacity=min(args.capacity, 2048),
                densify_from=10_000, opacity_reset_interval=10_000,
                sh_increase_interval=30, log_every=40,
                white_background=args.white_bg,
            ),
            sugar=sugar_trainer.SugarTrainConfig(
                method=args.regularization, start_iteration=81,
                iterations=160, entropy_from=80, entropy_until=110,
                sdf_from=110, hard_prune_at=115, hard_prune_threshold=0.1,
                n_sdf_samples=2048, reset_neighbors_every=40, knn_k=8,
                spatial_extent=scene.spatial_extent, log_every=40,
                white_background=args.white_bg,
            ),
            shell=ShellConfig(
                poisson_resolution=64, target_vertices=3000, knn_k=8
            ),
            frosting=frosting_lib.FrostingConfig(
                n_gaussians=4096, knn_k=8
            ),
            refine=frosting_trainer.FrostingTrainConfig(
                iterations=120, lr_max_steps=120, log_every=40,
                white_background=args.white_bg,
                learn_shell=args.learn_shell,
                regularize_shell=args.regularize_shell,
                normal_consistency_factor=args.normal_consistency_factor,
            ),
        )
    else:
        cfg = pipeline.PipelineConfig(
            gs=gs_trainer.GSTrainConfig(
                iterations=args.iterations_3dgs,
                capacity=args.capacity,
                white_background=args.white_bg,
            ),
            sugar=sugar_trainer.SugarTrainConfig(
                method=args.regularization,
                start_iteration=args.iterations_3dgs,
                spatial_extent=scene.spatial_extent,
                white_background=args.white_bg,
            ),
            shell=ShellConfig(
                target_vertices=200_000 if args.low_poly else 1_000_000,
            ),
            frosting=frosting_lib.FrostingConfig(n_gaussians=args.gaussians),
            refine=frosting_trainer.FrostingTrainConfig(
                iterations=refine_iters,
                lr_max_steps=refine_iters,
                white_background=args.white_bg,
                learn_shell=args.learn_shell,
                regularize_shell=args.regularize_shell,
                normal_consistency_factor=args.normal_consistency_factor,
            ),
            use_background_gaussians=(args.regularization == "sdf"),
        )

    out = pipeline.run_pipeline(
        cams, gt, scene.points, scene.colors, scene.spatial_extent, rcfg, cfg
    )

    gauss_lib.save_ply(out["gs_state"].params, os.path.join(out_dir, "gs.ply"))
    gauss_lib.save_ply(out["sugar_params"], os.path.join(out_dir, "sugar.ply"))
    from frosting_tpu.utils import ply as ply_io

    ply_io.write_ply(
        os.path.join(out_dir, "shell.ply"),
        {
            "x": out["shell_verts"][:, 0],
            "y": out["shell_verts"][:, 1],
            "z": out["shell_verts"][:, 2],
        },
        faces=out["shell_faces"],
    )
    pipeline.export_frosting_ply(
        out["frosting_params"], out["frosting_meta"],
        os.path.join(out_dir, "frosting.ply"),
    )
    checkpoint.save_frosting(
        os.path.join(out_dir, "frosting.npz"),
        out["frosting_params"],
        out["frosting_meta"],
    )

    if args.export_obj:
        from frosting_tpu.extract import texture as texture_lib

        texture_lib.extract_textured_mesh(
            out["frosting_params"], out["frosting_meta"], cams, rcfg,
            os.path.join(out_dir, "mesh.obj"),
        )

    if scene.test_cameras:
        import jax
        import jax.numpy as jnp

        from frosting_tpu.models.frosting import activate_frosting
        from frosting_tpu.raster import render

        fparams, meta = out["frosting_params"], out["frosting_meta"]
        bg = jnp.full((3,), 1.0 if args.white_bg else 0.0, jnp.float32)

        @jax.jit
        def render_cam_p(fp, mt, cam, b):
            means, scales, quats, opac, sh = activate_frosting(fp, mt)
            return render(means, scales, quats, opac, sh, cam, rcfg, bg=b).image

        def render_cam(cam):
            return render_cam_p(fparams, meta, cam, bg)

        test_cams = [c.camera for c in scene.test_cameras]
        test_gt = np.stack([c.image() for c in scene.test_cameras])
        results = metrics_lib.evaluate_views(
            render_cam, test_cams, test_gt, metrics_lib.get_lpips()
        )
        metrics_lib.write_metrics(
            os.path.join(out_dir, "metrics.json"), results
        )
        print("eval:", results)
    print(f"done -> {out_dir}")


if __name__ == "__main__":
    main()
