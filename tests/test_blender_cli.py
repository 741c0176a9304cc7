"""Smoke test for the Blender-animation CLI (render_blender_scene.py
analogue, reference :17-156): a minimal package JSON + frosting checkpoint
render to frames, exercising the package loader, LBS posing, adaptation and
the camera-track conversion end to end."""

import json
import os

import numpy as np
from PIL import Image

from frosting_tpu import blender_cli
from frosting_tpu.train.checkpoint import save_frosting
from tests.test_editing import _make_frosting

IDENTITY4 = np.eye(4).tolist()


def _write_package(path, n_verts, tpose_points, n_frames=2):
    """One armatured mesh with a single identity bone (posing is a no-op)
    plus a 2-frame camera track orbiting nothing (static)."""
    # Blender camera at +3z looking down -Z toward the origin
    cam_mw = [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 3.0],
        [0.0, 0.0, 0.0, 1.0],
    ]
    package = {
        "camera": {
            "lens": [50.0] * n_frames,
            "sensor_width": 36.0,
            "width": 48,
            "height": 48,
            "matrix_world": [cam_mw] * n_frames,
        },
        "bones": [
            {
                "vertex": {
                    "tpose_points": tpose_points.tolist(),
                    "groups": [["Bone"]] * n_verts,
                    "weights": [[1.0]] * n_verts,
                    "matrix_world": IDENTITY4,
                },
                "armature": {
                    "rest_bones": {"Bone": IDENTITY4},
                    "pose_bones": {"Bone": [IDENTITY4] * n_frames},
                },
            }
        ],
    }
    with open(path, "w") as f:
        json.dump(package, f)


def test_blender_cli_renders_frames(tmp_path):
    params, meta = _make_frosting(n=512)
    ckpt = str(tmp_path / "model.npz")
    save_frosting(ckpt, params, meta)

    pkg = str(tmp_path / "package.json")
    _write_package(pkg, params.shell_verts.shape[0],
                   np.asarray(params.shell_verts))

    out = str(tmp_path / "frames")
    blender_cli.main([
        "--package", pkg,
        "--checkpoints", ckpt,
        "--out", out,
        "--frames", "0", "1",
        "--max-instances", "16384",
    ])

    frame = os.path.join(out, "frame_00000.png")
    assert os.path.exists(frame)
    img = np.asarray(Image.open(frame), np.float32) / 255.0
    # the identity-posed icosphere must actually appear in the render
    assert img.max() > 0.05
    assert img.shape[0] == 48 and img.shape[1] == 48


def test_blender_cli_simple_adaptation(tmp_path):
    params, meta = _make_frosting(n=512)
    ckpt = str(tmp_path / "model.npz")
    save_frosting(ckpt, params, meta)
    pkg = str(tmp_path / "package.json")
    _write_package(pkg, params.shell_verts.shape[0],
                   np.asarray(params.shell_verts), n_frames=1)
    out = str(tmp_path / "frames_simple")
    blender_cli.main([
        "--package", pkg,
        "--checkpoints", ckpt,
        "--out", out,
        "--adaptation", "simple",
        "--thickness-rescale", "none",
        "--max-instances", "16384",
    ])
    assert os.path.exists(os.path.join(out, "frame_00000.png"))


def test_blender_cli_culling_ply_white_bg(tmp_path):
    """New reference-parity flags: occlusion culling (posed-shell
    visibility, compacted capacity), white background, sh-degree, and
    frame-as-PLY export (render_blender_scene.py:42-61)."""
    params, meta = _make_frosting(n=512)
    ckpt = str(tmp_path / "model.npz")
    save_frosting(ckpt, params, meta)
    pkg = str(tmp_path / "package.json")
    _write_package(pkg, params.shell_verts.shape[0],
                   np.asarray(params.shell_verts), n_frames=2)
    out = str(tmp_path / "frames_culled")
    blender_cli.main([
        "--package", pkg,
        "--checkpoints", ckpt,
        "--out", out,
        "--frames", "0", "2",
        "--max-instances", "16384",
        "--occlusion-culling",
        "--white-background",
        "--sh-degree", "1",
        "--export-frame-as-ply", "1",
    ])
    frame = os.path.join(out, "frame_00000.png")
    assert os.path.exists(frame)
    img = np.asarray(Image.open(frame), np.float32) / 255.0
    # white background: border pixels (behind the icosphere) must be bright
    assert img[0, 0].mean() > 0.9
    assert img.max() > 0.05
    # frame 1 was exported as a PLY instead of a PNG
    ply = os.path.join(out, "frame_00001.ply")
    assert os.path.exists(ply)
    assert not os.path.exists(os.path.join(out, "frame_00001.png"))
    from frosting_tpu.scene.gaussians import load_ply

    p = load_ply(ply)
    assert p.means3d.shape[0] == 512
    assert np.isfinite(np.asarray(p.scales_log)).all()
