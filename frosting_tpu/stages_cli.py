"""Modular per-stage CLIs — the analogues of the reference's scripts/*.py
(train_coarse_density / train_coarse_sdf / extract_shell /
train_frosting_layer / extract_frosting_textured_mesh) and the vanilla
gaussian_splatting/{train,render,metrics,full_eval,convert}.py entries.

Each stage reads/writes artifacts in -o/--output so stages can be run,
inspected and resumed independently (the reference chains them via file
hand-off, train_full_pipeline.py:155-208):

  python -m frosting_tpu.stages_cli train-gs       -s SCENE -o OUT [...]
  python -m frosting_tpu.stages_cli train-sugar    -s SCENE -o OUT [...]
  python -m frosting_tpu.stages_cli extract-shell  -s SCENE -o OUT [...]
  python -m frosting_tpu.stages_cli train-refined-sugar -s SCENE -o OUT [...]
  python -m frosting_tpu.stages_cli train-frosting -s SCENE -o OUT [...]
  python -m frosting_tpu.stages_cli extract-texture -s SCENE -o OUT [...]
  python -m frosting_tpu.stages_cli render         -s SCENE -o OUT [...]
  python -m frosting_tpu.stages_cli metrics        -s SCENE -o OUT [...]
  python -m frosting_tpu.stages_cli full-eval      -s SCENE -o OUT [...]
  python -m frosting_tpu.stages_cli convert        -s RAW_DIR

Artifacts in OUT: gs.ply, sugar.ply, shell.ply (mesh), refined_sugar.npz/
.ply (optional), frosting.npz, frosting.ply, mesh.obj/.mtl/.png, renders/,
metrics.json.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np


def _common(p):
    p.add_argument("-s", "--scene", required=True)
    p.add_argument("-o", "--output", default="output")
    p.add_argument("--resolution-scale", type=int, default=1)
    p.add_argument("--eval", action="store_true")
    p.add_argument("--white-bg", action="store_true")
    p.add_argument("--max-instances", type=int, default=1 << 21)
    p.add_argument("--chunk", type=int, default=128)


def _load_scene(args):
    from frosting_tpu.raster import RasterConfig
    from frosting_tpu.scene import dataset

    scene = dataset.load_colmap_scene(
        args.scene,
        resolution_scale=args.resolution_scale,
        eval_split=args.eval,
    )
    cams = [c.camera for c in scene.train_cameras]
    gt = np.stack([c.image() for c in scene.train_cameras])
    h, w = gt.shape[-2:]
    rcfg = RasterConfig(
        width=w, height=h, chunk=args.chunk, max_instances=args.max_instances
    )
    os.makedirs(args.output, exist_ok=True)
    return scene, cams, gt, rcfg


def _mesh_path(out):
    return os.path.join(out, "shell.ply")


def _save_mesh(path, verts, faces):
    from frosting_tpu.utils import ply as ply_io

    v = np.asarray(verts, np.float32)
    ply_io.write_ply(
        path,
        {"x": v[:, 0], "y": v[:, 1], "z": v[:, 2]},
        faces=np.asarray(faces, np.int32),
    )


def _load_mesh(path):
    from frosting_tpu.utils import ply as ply_io

    d = ply_io.read_ply(path)
    v = np.stack(
        [d["vertex"]["x"], d["vertex"]["y"], d["vertex"]["z"]], 1
    ).astype(np.float32)
    f = np.asarray(d["face"]["vertex_indices"], np.int64)
    return v, f


def cmd_train_gs(args):
    from frosting_tpu.scene import gaussians as gauss_lib
    from frosting_tpu.train import gs_trainer

    scene, cams, gt, rcfg = _load_scene(args)
    cfg = gs_trainer.GSTrainConfig(
        iterations=args.iterations,
        capacity=args.capacity,
        white_background=args.white_bg,
    )
    state, _h = gs_trainer.train(
        cams, gt, scene.points, scene.colors, scene.spatial_extent, rcfg, cfg
    )
    gauss_lib.save_ply(state.params, os.path.join(args.output, "gs.ply"))
    print("wrote", os.path.join(args.output, "gs.ply"))


def cmd_train_sugar(args):
    from frosting_tpu.scene import gaussians as gauss_lib
    from frosting_tpu.train import sugar_trainer

    scene, cams, gt, rcfg = _load_scene(args)
    params = gauss_lib.load_ply(
        os.path.join(args.output, "gs.ply"), capacity=args.capacity
    )
    cfg = sugar_trainer.SugarTrainConfig(
        method=args.regularization,
        start_iteration=args.start_iteration,
        iterations=args.iterations,
        spatial_extent=scene.spatial_extent,
        white_background=args.white_bg,
    )
    params, _h = sugar_trainer.train(
        params, scene.spatial_extent, cams, gt, rcfg, cfg
    )
    gauss_lib.save_ply(params, os.path.join(args.output, "sugar.ply"))
    print("wrote", os.path.join(args.output, "sugar.ply"))


def _load_live_gaussians(path):
    import jax.numpy as jnp

    from frosting_tpu.scene import gaussians as gauss_lib

    params = gauss_lib.load_ply(path)
    live = np.asarray(params.mask) > 0.5
    return type(params)(
        **{
            f.name: jnp.asarray(np.asarray(getattr(params, f.name))[live])
            for f in dataclasses.fields(params)
        }
    )


def cmd_extract_shell(args):
    from frosting_tpu.extract.shell import ShellConfig, extract_shell
    from frosting_tpu.scene.gaussians import activate

    scene, cams, _gt, rcfg = _load_scene(args)
    params = _load_live_gaussians(os.path.join(args.output, "sugar.ply"))
    means, scales, quats, opac, _sh = activate(params)
    cfg = ShellConfig(
        surface_level=args.surface_level,
        poisson_resolution=args.poisson_resolution,
        target_vertices=200_000 if args.low_poly else 1_000_000,
        target_vertices_low=200_000 if args.both_poly else None,
        cleaning_quantile=args.cleaning_quantile,
        fg_split=args.fg_split,
        method=args.method,
        marching_resolution=args.marching_resolution,
    )
    verts, faces, aux = extract_shell(
        means, scales, quats, opac, cams, rcfg, cfg, verbose=True
    )
    _save_mesh(_mesh_path(args.output), verts, faces)
    print("wrote", _mesh_path(args.output), len(verts), "verts")
    if "low_poly" in aux:
        lp = os.path.join(args.output, "shell_lowpoly.ply")
        _save_mesh(lp, *aux["low_poly"])
        print("wrote", lp, len(aux["low_poly"][0]), "verts")


def cmd_train_frosting(args):
    import jax

    from frosting_tpu.models import frosting as frosting_lib
    from frosting_tpu.pipeline import export_frosting_ply
    from frosting_tpu.scene.gaussians import activate
    from frosting_tpu.train import checkpoint, frosting_trainer

    scene, cams, gt, rcfg = _load_scene(args)
    params = _load_live_gaussians(os.path.join(args.output, "sugar.ply"))
    verts, faces = _load_mesh(_mesh_path(args.output))
    means, scales, quats, opac, _sh = activate(params)
    fcfg = frosting_lib.FrostingConfig(n_gaussians=args.gaussians)
    fparams, meta = frosting_lib.init_frosting(
        jax.random.key(0), verts, faces, means, scales, quats, opac,
        params, fcfg, scene.spatial_extent,
        use_background=args.use_background,
    )
    tcfg = frosting_trainer.FrostingTrainConfig(
        iterations=args.iterations,
        lr_max_steps=args.iterations,
        white_background=args.white_bg,
        use_occlusion_culling=args.occlusion_culling,
        learn_shell=args.learn_shell,
        regularize_shell=args.regularize_shell,
        normal_consistency_factor=args.normal_consistency_factor,
    )
    fparams, _h = frosting_trainer.train(
        fparams, meta, scene.spatial_extent, cams, gt, rcfg, tcfg
    )
    checkpoint.save_frosting(
        os.path.join(args.output, "frosting.npz"), fparams, meta
    )
    export_frosting_ply(
        fparams, meta, os.path.join(args.output, "frosting.ply")
    )
    print("wrote", os.path.join(args.output, "frosting.npz"))


def cmd_train_refined_sugar(args):
    from frosting_tpu.models.mesh_bound import activate_mesh_bound
    from frosting_tpu.pipeline import export_gaussians_ply, train_refined_sugar
    from frosting_tpu.scene.gaussians import activate
    from frosting_tpu.train import checkpoint

    scene, cams, gt, rcfg = _load_scene(args)
    params = _load_live_gaussians(os.path.join(args.output, "sugar.ply"))
    verts, faces = _load_mesh(_mesh_path(args.output))
    means, _sc, _q, _op, _sh = activate(params)
    rs_params, rs_meta, _h = train_refined_sugar(
        verts, faces, means, params, scene.spatial_extent, cams, gt, rcfg,
        iterations=args.iterations,
        n_per_triangle=args.gaussians_per_triangle,
        white_background=args.white_bg,
    )
    checkpoint.save_npz(
        os.path.join(args.output, "refined_sugar.npz"), rs_params
    )
    export_gaussians_ply(
        *activate_mesh_bound(rs_params, rs_meta),
        os.path.join(args.output, "refined_sugar.ply"),
    )
    print("wrote", os.path.join(args.output, "refined_sugar.ply"))


def cmd_extract_texture(args):
    from frosting_tpu.extract import texture as texture_lib
    from frosting_tpu.models import frosting as frosting_lib
    from frosting_tpu.train import checkpoint

    scene, cams, _gt, rcfg = _load_scene(args)
    fparams, meta = checkpoint.load_frosting(
        os.path.join(args.output, "frosting.npz")
    )
    texture_lib.extract_textured_mesh(
        fparams, meta, cams, rcfg,
        os.path.join(args.output, "mesh"),
        texture_size=args.texture_size,
    )
    print("wrote", os.path.join(args.output, "mesh.obj"))


def _render_model(args, cams):
    """Render all given cameras with the frosting model (or gs.ply if no
    frosting checkpoint exists)."""
    import jax
    import jax.numpy as jnp

    from frosting_tpu.models import frosting as frosting_lib
    from frosting_tpu.raster import RasterConfig, render
    from frosting_tpu.train import checkpoint

    npz = os.path.join(args.output, "frosting.npz")
    if os.path.exists(npz):
        fparams, meta = checkpoint.load_frosting(npz)
        arrays = frosting_lib.to_gaussians(fparams, meta)
    else:
        from frosting_tpu.scene.gaussians import activate

        params = _load_live_gaussians(os.path.join(args.output, "gs.ply"))
        arrays = activate(params)

    bg = jnp.full((3,), 1.0 if args.white_bg else 0.0, jnp.float32)

    def render_one(rcfg):
        fn = jax.jit(lambda g, cam, b: render(*g, cam, rcfg, bg=b).image)
        return lambda cam: np.asarray(fn(arrays, cam, bg))

    return render_one


def cmd_render(args):
    scene, cams, gt, rcfg = _load_scene(args)
    render_one = _render_model(args, cams)(rcfg)
    out_dir = os.path.join(args.output, "renders")
    os.makedirs(out_dir, exist_ok=True)
    from PIL import Image

    test_cams = [c.camera for c in scene.test_cameras]
    for split, cs in (("train", cams), ("test", test_cams)):
        for i, cam in enumerate(cs):
            img = np.clip(render_one(cam), 0, 1)
            Image.fromarray(
                (img.transpose(1, 2, 0) * 255).astype(np.uint8)
            ).save(os.path.join(out_dir, f"{split}_{i:05d}.png"))
    print("wrote", out_dir)


def cmd_metrics(args):
    from frosting_tpu import metrics as metrics_lib

    scene, cams, gt, rcfg = _load_scene(args)
    render_one = _render_model(args, cams)(rcfg)
    eval_cams = [c.camera for c in scene.test_cameras] or cams
    eval_gt = (
        np.stack([c.image() for c in scene.test_cameras])
        if scene.test_cameras
        else gt
    )
    res = metrics_lib.evaluate_views(
        render_one, eval_cams, eval_gt, lpips=metrics_lib.get_lpips()
    )
    path = os.path.join(args.output, "metrics.json")
    metrics_lib.write_metrics(path, res)
    print(json.dumps(res))


def cmd_full_eval(args):
    """train-gs -> train-sugar -> extract-shell -> train-frosting ->
    metrics, sequentially (full_eval.py analogue)."""
    common = ["-s", args.scene, "-o", args.output,
              "--resolution-scale", str(args.resolution_scale)]
    if args.eval:
        common.append("--eval")
    if args.white_bg:
        common.append("--white-bg")
    main(["train-gs", *common, "--iterations", str(args.iterations),
          "--capacity", str(args.capacity)])
    main(["train-sugar", *common, "-r", args.regularization,
          "--start-iteration", str(args.iterations),
          "--capacity", str(args.capacity)])
    main(["extract-shell", *common]
         + (["--low-poly"] if args.low_poly else [])
         + (["--fg-split"] if args.fg_split else []))
    main(["train-frosting", *common, "--gaussians", str(args.gaussians)]
         + (["--use-background"] if args.use_background else [])
         + (["--occlusion-culling"] if args.occlusion_culling else []))
    main(["metrics", *common])


def cmd_convert(args):
    """COLMAP driver (gaussian_splatting/convert.py analogue): runs the
    colmap binary on a raw image folder if available."""
    import shutil
    import subprocess

    if shutil.which("colmap") is None:
        sys.exit(
            "convert requires the `colmap` binary on PATH "
            "(feature extraction + mapper), which this environment "
            "does not ship. Provide a scene with sparse/0 instead."
        )
    src = args.scene
    db = os.path.join(src, "distorted", "database.db")
    os.makedirs(os.path.dirname(db), exist_ok=True)
    for cmdline in (
        ["colmap", "feature_extractor", "--database_path", db,
         "--image_path", os.path.join(src, "input"),
         "--ImageReader.camera_model", "OPENCV"],
        ["colmap", "exhaustive_matcher", "--database_path", db],
        ["colmap", "mapper", "--database_path", db,
         "--image_path", os.path.join(src, "input"),
         "--output_path", os.path.join(src, "distorted", "sparse")],
    ):
        subprocess.run(cmdline, check=True)
    print("COLMAP reconstruction complete")


def build_parser():
    p = argparse.ArgumentParser(prog="frosting_tpu.stages_cli")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("train-gs")
    _common(sp)
    sp.add_argument("--iterations", type=int, default=7_000)
    sp.add_argument("--capacity", type=int, default=1 << 19)
    sp.set_defaults(fn=cmd_train_gs)

    sp = sub.add_parser("train-sugar")
    _common(sp)
    sp.add_argument(
        "-r", "--regularization", default="density",
        choices=["density", "sdf", "dn_consistency"],
    )
    sp.add_argument("--start-iteration", type=int, default=7_000)
    sp.add_argument("--iterations", type=int, default=8_000)
    sp.add_argument("--capacity", type=int, default=1 << 19)
    sp.set_defaults(fn=cmd_train_sugar)

    sp = sub.add_parser("extract-shell")
    _common(sp)
    sp.add_argument("--surface-level", type=float, default=0.3)
    sp.add_argument("--poisson-resolution", type=int, default=0)
    sp.add_argument("--cleaning-quantile", type=float, default=0.1)
    sp.add_argument("--low-poly", action="store_true")
    # emit BOTH the 1M high-poly and a 200k low-poly mesh from one
    # reconstruction (shell.ply + shell_lowpoly.ply), coarse_shell.py:105-108
    sp.add_argument("--both-poly", action="store_true")
    sp.add_argument("--fg-split", action="store_true")
    # ablation extraction paths (reference flags use_centers_to_extract_mesh
    # / use_marching_cubes, coarse_shell.py:145-146)
    sp.add_argument(
        "--method", default="surface",
        choices=["surface", "centers", "marching"],
    )
    sp.add_argument("--marching-resolution", type=int, default=256)
    sp.set_defaults(fn=cmd_extract_shell)

    sp = sub.add_parser("train-frosting")
    _common(sp)
    sp.add_argument("--gaussians", type=int, default=2_000_000)
    sp.add_argument("--iterations", type=int, default=15_000)
    sp.add_argument("--use-background", action="store_true")
    sp.add_argument("--occlusion-culling", action="store_true")
    sp.add_argument("--learn-shell", action="store_true")
    sp.add_argument("--regularize-shell", action="store_true")
    sp.add_argument(
        "--normal-consistency-factor", type=float, default=0.1
    )
    sp.set_defaults(fn=cmd_train_frosting)

    sp = sub.add_parser("train-refined-sugar")
    _common(sp)
    sp.add_argument("--iterations", type=int, default=2_000)
    sp.add_argument(
        "--gaussians-per-triangle", type=int, default=6, choices=[1, 3, 4, 6]
    )
    sp.set_defaults(fn=cmd_train_refined_sugar)

    sp = sub.add_parser("extract-texture")
    _common(sp)
    sp.add_argument("--texture-size", type=int, default=1024)
    sp.set_defaults(fn=cmd_extract_texture)

    sp = sub.add_parser("render")
    _common(sp)
    sp.set_defaults(fn=cmd_render)

    sp = sub.add_parser("metrics")
    _common(sp)
    sp.set_defaults(fn=cmd_metrics)

    sp = sub.add_parser("full-eval")
    _common(sp)
    sp.add_argument("--iterations", type=int, default=7_000)
    sp.add_argument("--capacity", type=int, default=1 << 19)
    sp.add_argument(
        "-r", "--regularization", default="density",
        choices=["density", "sdf", "dn_consistency"],
    )
    sp.add_argument("--low-poly", action="store_true")
    sp.add_argument("--fg-split", action="store_true")
    sp.add_argument("--gaussians", type=int, default=2_000_000)
    sp.add_argument("--use-background", action="store_true")
    sp.add_argument("--occlusion-culling", action="store_true")
    sp.set_defaults(fn=cmd_full_eval)

    sp = sub.add_parser("convert")
    sp.add_argument("-s", "--scene", required=True)
    sp.set_defaults(fn=cmd_convert)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    # no-op single-process; on a pod it must run before device queries
    from frosting_tpu.parallel import multihost

    multihost.initialize()
    args.fn(args)


if __name__ == "__main__":
    main()
