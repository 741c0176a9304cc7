"""Render Blender-edited/animated scenes — the render_blender_scene.py
analogue (reference :17-156).

Usage:
  python -m frosting_tpu.blender_cli \
      --package scene_package.json \
      --checkpoints modelA.npz modelB.npz \
      --out frames/ [--width 1920 --height 1080] [--frames 0 100] \
      [--deformation-threshold 2.0]

Each checkpoint is a `save_frosting` npz whose mesh index matches the
package's mesh order. Per frame: LBS-pose each armatured mesh, rebuild the
composite shell, adapt covariances/SH through the per-cell transforms, and
render from the package camera track.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--package", required=True)
    p.add_argument("--checkpoints", nargs="+", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--width", type=int, default=0, help="0 = package camera")
    p.add_argument("--height", type=int, default=0)
    p.add_argument("--frames", type=int, nargs=2, default=None)
    p.add_argument("--deformation-threshold", type=float, default=2.0)
    # reference flags: --adaptation {simple,complex}, thickness rescaling
    # method {median,triangle,none} (render_blender_scene.py:17-156)
    p.add_argument(
        "--adaptation", choices=["simple", "complex"], default="complex"
    )
    p.add_argument(
        "--thickness-rescale",
        choices=["median", "triangle", "none"],
        default="median",
    )
    p.add_argument("--max-instances", type=int, default=1 << 21)
    # reference flags (render_blender_scene.py:42-61)
    p.add_argument("--white-background", action="store_true")
    p.add_argument("--sh-degree", type=int, default=3)
    p.add_argument(
        "--export-frame-as-ply", type=int, default=None,
        help="export this frame's edited gaussians as a viewer-compatible "
        "PLY (covariances eigendecomposed to scales/quats; SH coefficients "
        "exported unrotated, like the reference's "
        "convert_frosting_into_gaussians path)",
    )
    p.add_argument(
        "--render-background-gaussians",
        action=argparse.BooleanOptionalAction,
        default=True,
        help="composite the (world-transformed) background Gaussians of "
        "the first checkpoint that has them (reference default True)",
    )
    p.add_argument(
        "--occlusion-culling", action="store_true",
        help="render only gaussians whose shell face is visible this "
        "frame (posed-shell rasterization; compacted to one static "
        "capacity over all frames so the render compiles once)",
    )
    return p


def edited_to_gaussian_params(eg, sh_degree: int):
    """EditedGaussians -> viewer-layout GaussianParams: eigendecompose the
    transformed covariances into (scales, quats). SH coefficients are kept
    unrotated, matching the reference's PLY export fidelity
    (blender/frosting_utils.py:577-578 -> convert_frosting_into_gaussians)."""
    import jax.numpy as jnp

    from frosting_tpu.ops import quat as quat_ops
    from frosting_tpu.scene.gaussians import GaussianParams, inverse_sigmoid

    c = eg.cov6  # [N, 6] packed symmetric (xx, xy, xz, yy, yz, zz)
    m = jnp.stack(
        [
            jnp.stack([c[:, 0], c[:, 1], c[:, 2]], -1),
            jnp.stack([c[:, 1], c[:, 3], c[:, 4]], -1),
            jnp.stack([c[:, 2], c[:, 4], c[:, 5]], -1),
        ],
        -2,
    )  # [N, 3, 3]
    eigval, eigvec = jnp.linalg.eigh(m)
    scales = jnp.sqrt(jnp.maximum(eigval, 1e-14))  # [N, 3] ascending
    rot = jnp.where(
        jnp.linalg.det(eigvec)[:, None, None] < 0, -eigvec, eigvec
    )
    quats = quat_ops.from_matrix(rot)
    n = eg.means.shape[0]
    return GaussianParams(
        means3d=eg.means,
        sh_dc=eg.sh[:, :1],
        sh_rest=eg.sh[:, 1:],
        scales_log=jnp.log(scales),
        quats_raw=quats,
        opacities_raw=inverse_sigmoid(
            jnp.clip(eg.opacities, 1e-5, 1 - 1e-5)
        ),
        mask=jnp.ones((n,), jnp.float32),
    )


def package_camera(package, i_frame, width, height):
    """Build a Camera from the package's per-frame camera track
    (render_blender_scene.py camera handling)."""
    import math

    from frosting_tpu.cameras import make_camera

    cam = package["raw"]["camera"]
    lens = float(cam["lens"][i_frame % len(cam["lens"])])
    sensor = float(cam.get("sensor_width", 36.0))
    fov_x = 2.0 * math.atan(sensor / (2.0 * lens))
    m = np.asarray(cam["matrix_world"][i_frame % len(cam["matrix_world"])],
                   np.float64)
    # Blender camera looks down -Z with +Y up; convert to 3DGS convention
    flip = np.diag([1.0, -1.0, -1.0, 1.0])
    c2w = m @ flip
    w2c = np.linalg.inv(c2w)
    R = w2c[:3, :3].T
    t = w2c[:3, 3]
    aspect = height / max(width, 1)
    fov_y = 2.0 * math.atan(math.tan(fov_x / 2.0) * aspect)
    return make_camera(R, t, fov_x, fov_y)


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax.numpy as jnp
    from PIL import Image

    from frosting_tpu.models import editing
    from frosting_tpu.raster import RasterConfig
    from frosting_tpu.train.checkpoint import load_frosting

    package = editing.load_blender_package(args.package)
    models = [load_frosting(p) for p in args.checkpoints]
    scene = editing.build_composite_scene(models)

    cam_meta = package["raw"]["camera"]
    n_frames = len(cam_meta["lens"])
    f0, f1 = args.frames if args.frames else (0, n_frames)
    width = args.width or int(cam_meta.get("width", 1920))
    height = args.height or int(cam_meta.get("height", 1080))
    rcfg = RasterConfig(
        width=width, height=height, chunk=128,
        max_instances=args.max_instances,
    )

    bg = jnp.ones((3,), jnp.float32) if args.white_background else None

    def posed_verts(i_frame):
        verts = scene.params.shell_verts
        for i_mesh, mesh in enumerate(package["meshes"]):
            if mesh is None:
                continue
            posed = editing.lbs_pose_verts(
                jnp.asarray(mesh["tpose_points"]),
                jnp.asarray(mesh["weights"]),
                jnp.asarray(mesh["rest_matrices"]),
                jnp.asarray(
                    mesh["pose_matrices"][:, i_frame % n_frames]
                ),
            )
            s, e = scene.vert_ranges[i_mesh]
            verts = verts.at[s:e].set(posed)
        return verts

    def adapt(verts):
        if args.adaptation == "simple":
            return editing.adapt_frosting_simple(
                scene.params, scene.meta, verts,
                thickness_rescale=args.thickness_rescale,
            )
        # deformation-threshold opacity masking applies only to the
        # complex adaptation (blender/frosting_utils.py:532)
        return editing.adapt_frosting(
            scene.params, scene.meta, verts,
            deformation_threshold=args.deformation_threshold,
            thickness_rescale=args.thickness_rescale,
        )

    # Occlusion culling (refine.py-style, render_blender_scene.py:47-49):
    # pass 1 rasterizes the POSED shell per frame and collects visible
    # cell faces; all frames share one compacted capacity so the render
    # step compiles once (per-frame dynamic shapes would recompile every
    # frame on this runtime).
    vis_idx_by_frame = {}
    cap = None
    if args.occlusion_culling:
        from frosting_tpu.ops import mesh_raster

        cell_idx = np.asarray(scene.meta.cell_idx)
        masks = []
        for i_frame in range(f0, f1):
            frags = mesh_raster.rasterize_mesh(
                posed_verts(i_frame), scene.meta.faces,
                package_camera(package, i_frame, width, height), rcfg,
            )
            seen = np.zeros((np.asarray(scene.meta.faces).shape[0] + 1,), bool)
            pf = np.asarray(frags.pix_to_face).ravel()
            seen[pf[pf >= 0]] = True
            masks.append(seen[cell_idx])
        cap = -(-max(int(m.sum()) for m in masks) // 1024) * 1024
        n_total = len(cell_idx)
        for i_frame, m in zip(range(f0, f1), masks):
            order = np.argsort(~m, kind="stable")[:cap]
            valid = m[order]
            vis_idx_by_frame[i_frame] = (
                jnp.asarray(order.astype(np.int32)),
                jnp.asarray(valid),
            )
        print(
            f"occlusion culling: {n_total} gaussians -> capacity {cap} "
            f"({cap / max(n_total, 1):.0%})"
        )

    bg_eg = None
    if args.render_background_gaussians and scene.params.bg is not None:
        bg_eg = editing.background_to_edited(scene.params.bg)

    os.makedirs(args.out, exist_ok=True)
    for i_frame in range(f0, f1):
        eg = adapt(posed_verts(i_frame))
        cam = package_camera(package, i_frame, width, height)
        if args.export_frame_as_ply is not None and (
            i_frame == args.export_frame_as_ply
        ):
            if bg_eg is not None:
                eg = editing.concat_edited(eg, bg_eg)
            from frosting_tpu.scene.gaussians import save_ply

            path = os.path.join(args.out, f"frame_{i_frame:05d}.ply")
            save_ply(edited_to_gaussian_params(eg, args.sh_degree), path)
            print(f"frame {i_frame} exported as PLY: {path}")
            continue
        if args.occlusion_culling:
            vis_idx, valid = vis_idx_by_frame[i_frame]
            eg = editing.EditedGaussians(
                means=eg.means[vis_idx],
                cov6=eg.cov6[vis_idx],
                opacities=jnp.where(valid, eg.opacities[vis_idx], 0.0),
                sh=eg.sh[vis_idx],
                sh_rotations=eg.sh_rotations[vis_idx],
            )
        # background Gaussians composite after culling (always kept, like
        # the reference's visibility handling of bg)
        if bg_eg is not None:
            eg = editing.concat_edited(eg, bg_eg)
        img = editing.render_edited(
            eg, cam, rcfg, bg=bg, active_sh_degree=args.sh_degree
        ).image
        Image.fromarray(
            (np.clip(np.asarray(img).transpose(1, 2, 0), 0, 1) * 255).astype(
                np.uint8
            )
        ).save(os.path.join(args.out, f"frame_{i_frame:05d}.png"))
        print(f"frame {i_frame} done")


if __name__ == "__main__":
    main()
