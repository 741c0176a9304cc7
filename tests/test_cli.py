"""CLI end-to-end on a generated COLMAP scene fixture (tiny preset)."""

import json
import os
import struct

import jax.numpy as jnp
import numpy as np
import pytest

from frosting_tpu import cli
from frosting_tpu.raster import RasterConfig
from frosting_tpu.scene import synthetic


def make_colmap_scene(d, n_cams=8, size=64):
    """Synthetic gaussian-sphere scene rendered to images + COLMAP model."""
    from PIL import Image

    rng = np.random.default_rng(0)
    n = 1200
    dd = rng.normal(size=(n, 3))
    dd /= np.linalg.norm(dd, axis=1, keepdims=True)
    means = dd * 1.0
    gt = (
        jnp.asarray(means, jnp.float32),
        jnp.full((n, 3), 0.06, jnp.float32),
        jnp.asarray(
            np.concatenate([np.ones((n, 1)), np.zeros((n, 3))], 1), jnp.float32
        ),
        jnp.full((n,), 0.9, jnp.float32),
        jnp.asarray(
            np.concatenate(
                [((means + 1.5) / 3.0)[:, None], np.zeros((n, 15, 3))], 1
            ),
            jnp.float32,
        ),
    )
    cams = synthetic.camera_ring(n_cams=n_cams, radius=3.2)
    rcfg = RasterConfig(
        width=size, height=size, chunk=32, max_instances=8192, backend="jax"
    )
    imgs = synthetic.render_gt_images(gt, cams, rcfg, jnp.zeros(3))

    os.makedirs(f"{d}/images", exist_ok=True)
    os.makedirs(f"{d}/sparse/0", exist_ok=True)
    for i, img in enumerate(imgs):
        Image.fromarray(
            (np.clip(img.transpose(1, 2, 0), 0, 1) * 255).astype(np.uint8)
        ).save(f"{d}/images/img_{i:03d}.png")

    fov = float(2 * np.arctan(np.asarray(cams[0].tan_fov_x)))
    fx = size / (2 * float(np.asarray(cams[0].tan_fov_x)))
    with open(f"{d}/sparse/0/cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, size, size))
        f.write(struct.pack("<4d", fx, fx, size / 2, size / 2))

    from frosting_tpu.ops import quat as quat_ops

    with open(f"{d}/sparse/0/images.bin", "wb") as f:
        f.write(struct.pack("<Q", n_cams))
        for i, cam in enumerate(cams):
            wv = np.asarray(cam.world_view, np.float64).T  # column-vector W2C
            R = wv[:3, :3]
            t = wv[:3, 3]
            q = np.asarray(quat_ops.from_matrix(jnp.asarray(R[None], jnp.float32)))[0]
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<4d", *q))
            f.write(struct.pack("<3d", *t))
            f.write(struct.pack("<i", 1))
            f.write(f"img_{i:03d}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 0))

    # seed point cloud: subsampled gaussian centers
    with open(f"{d}/sparse/0/points3D.bin", "wb") as f:
        idx = rng.choice(n, 400, replace=False)
        f.write(struct.pack("<Q", len(idx)))
        for j in idx:
            c = np.clip(((means[j] + 1.5) / 3.0) * 255, 0, 255).astype(int)
            f.write(
                struct.pack("<QdddBBBd", int(j), *means[j], c[0], c[1], c[2], 0.1)
            )
            f.write(struct.pack("<Q", 0))
    return d


@pytest.mark.slow
def test_cli_tiny_pipeline(tmp_path):
    scene_dir = make_colmap_scene(str(tmp_path / "scene"))
    out_dir = str(tmp_path / "out")
    cli.main(
        ["-s", scene_dir, "-o", out_dir, "--tiny", "--export-obj"]
    )
    base = os.path.join(out_dir, "scene")
    for fn in ["gs.ply", "sugar.ply", "shell.ply", "frosting.ply",
               "frosting.npz", "mesh.obj", "mesh.png"]:
        assert os.path.exists(os.path.join(base, fn)), fn
    # frosting PLY loads back with the advertised gaussian count
    from frosting_tpu.scene.gaussians import load_ply

    p = load_ply(os.path.join(base, "frosting.ply"))
    assert int(np.asarray(p.num_active())) == 4096


def test_stage_clis(tmp_path):
    """Per-stage CLI hand-off (the scripts/*.py analogues): train-gs ->
    train-sugar -> extract-shell -> train-frosting -> render + metrics,
    each a separate invocation communicating via artifacts."""
    import json
    import os

    from frosting_tpu import stages_cli

    scene_dir = str(tmp_path / "scene")
    make_colmap_scene(scene_dir)
    out = str(tmp_path / "out")
    common = [
        "-s", scene_dir, "-o", out, "--max-instances", "8192",
        "--chunk", "32",
    ]
    stages_cli.main(
        ["train-gs", *common, "--iterations", "60", "--capacity", "2048"]
    )
    assert os.path.exists(f"{out}/gs.ply")
    stages_cli.main(
        ["train-sugar", *common, "--start-iteration", "60",
         "--iterations", "120", "--capacity", "2048"]
    )
    assert os.path.exists(f"{out}/sugar.ply")
    stages_cli.main(
        ["extract-shell", *common, "--poisson-resolution", "48",
         "--low-poly"]
    )
    assert os.path.exists(f"{out}/shell.ply")
    stages_cli.main(
        ["train-refined-sugar", *common, "--iterations", "25",
         "--gaussians-per-triangle", "1"]
    )
    assert os.path.exists(f"{out}/refined_sugar.ply")
    assert os.path.exists(f"{out}/refined_sugar.npz")
    stages_cli.main(
        ["train-frosting", *common, "--gaussians", "2048",
         "--iterations", "40"]
    )
    assert os.path.exists(f"{out}/frosting.npz")
    assert os.path.exists(f"{out}/frosting.ply")
    stages_cli.main(["metrics", *common])
    res = json.load(open(f"{out}/metrics.json"))
    assert np.isfinite(res["psnr"])
    stages_cli.main(["render", *common])
    assert len(os.listdir(f"{out}/renders")) > 0
