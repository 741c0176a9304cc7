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
    return p


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

    os.makedirs(args.out, exist_ok=True)
    for i_frame in range(f0, f1):
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
        if args.adaptation == "simple":
            eg = editing.adapt_frosting_simple(
                scene.params, scene.meta, verts,
                thickness_rescale=args.thickness_rescale,
            )
        else:
            # deformation-threshold opacity masking applies only to the
            # complex adaptation (blender/frosting_utils.py:532)
            eg = editing.adapt_frosting(
                scene.params, scene.meta, verts,
                deformation_threshold=args.deformation_threshold,
                thickness_rescale=args.thickness_rescale,
            )
        cam = package_camera(package, i_frame, width, height)
        img = editing.render_edited(eg, cam, rcfg).image
        Image.fromarray(
            (np.clip(np.asarray(img).transpose(1, 2, 0), 0, 1) * 255).astype(
                np.uint8
            )
        ).save(os.path.join(args.out, f"frame_{i_frame:05d}.png"))
        print(f"frame {i_frame} done")


if __name__ == "__main__":
    main()
