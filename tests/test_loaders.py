"""Data-layer tests against generated fixtures: COLMAP binary model,
cameras.json, NeRF-synthetic transforms, PLY round-trip."""

import json
import os
import struct

import numpy as np

from frosting_tpu.scene import colmap as colmap_io
from frosting_tpu.scene import dataset
from frosting_tpu.utils import ply as ply_io


def _write_colmap_bin(d, n_cams=3, n_pts=50):
    rng = np.random.default_rng(0)
    os.makedirs(f"{d}/sparse/0", exist_ok=True)
    with open(f"{d}/sparse/0/cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 640, 480))  # PINHOLE
        f.write(struct.pack("<4d", 500.0, 510.0, 320.0, 240.0))
    with open(f"{d}/sparse/0/images.bin", "wb") as f:
        f.write(struct.pack("<Q", n_cams))
        for i in range(n_cams):
            f.write(struct.pack("<i", i + 1))
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            f.write(struct.pack("<4d", *q))
            f.write(struct.pack("<3d", *rng.normal(size=3)))
            f.write(struct.pack("<i", 1))
            f.write(f"img_{i:03d}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 2))  # 2 dummy 2D points
            f.write(struct.pack("<ddq", 1.0, 2.0, -1) * 1)
            f.write(struct.pack("<ddq", 3.0, 4.0, 5))
    with open(f"{d}/sparse/0/points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", n_pts))
        for i in range(n_pts):
            f.write(struct.pack("<QdddBBBd", i, *rng.normal(size=3), 10, 20, 30, 0.5))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 1, 0))
    return d


def test_colmap_binary_roundtrip(tmp_path):
    d = _write_colmap_bin(str(tmp_path))
    cams, imgs, xyz, rgb = colmap_io.read_model(f"{d}/sparse/0")
    assert len(cams) == 1 and cams[1].model == "PINHOLE"
    assert len(imgs) == 3
    assert imgs[1].name == "img_000.png"
    assert xyz.shape == (50, 3) and rgb.shape == (50, 3)
    assert (rgb[0] == [10, 20, 30]).all()
    R = imgs[1].rotation()
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-8)

    scene = dataset.load_colmap_scene(d, eval_split=True)
    assert len(scene.train_cameras) + len(scene.test_cameras) == 3
    assert scene.spatial_extent > 0


def test_cameras_json_loader(tmp_path):
    cams = [
        {
            "id": 0,
            "img_name": "a.png",
            "width": 800,
            "height": 600,
            "fx": 400.0,
            "fy": 420.0,
            "position": [1.0, 2.0, 3.0],
            "rotation": np.eye(3).tolist(),
        }
    ]
    with open(tmp_path / "cameras.json", "w") as f:
        json.dump(cams, f)
    infos = dataset.load_gs_cameras_json(str(tmp_path))
    assert len(infos) == 1
    c = infos[0].camera
    np.testing.assert_allclose(np.asarray(c.cam_center), [1, 2, 3], atol=1e-5)


def test_blender_transforms_loader(tmp_path):
    from PIL import Image

    os.makedirs(tmp_path / "train", exist_ok=True)
    frames = []
    for i in range(2):
        name = f"train/r_{i}"
        Image.new("RGBA", (64, 48), (255, 0, 0, 255)).save(
            tmp_path / f"{name}.png"
        )
        c2w = np.eye(4)
        c2w[:3, 3] = [0, 0, 3 + i]
        frames.append({"file_path": name, "transform_matrix": c2w.tolist()})
    meta = {"camera_angle_x": 0.8, "frames": frames}
    with open(tmp_path / "transforms_train.json", "w") as f:
        json.dump(meta, f)
    scene = dataset.load_blender_scene(
        str(tmp_path), n_random_points=100
    )
    assert len(scene.train_cameras) == 2
    img = scene.train_cameras[0].image(bg=(1, 1, 1))
    assert img.shape == (3, 48, 64)
    np.testing.assert_allclose(img[0], 1.0)  # red channel
    np.testing.assert_allclose(img[1], 0.0)  # alpha-composited over white? red g=0


def test_mesh_ply_roundtrip(tmp_path):
    verts = np.random.default_rng(0).normal(size=(10, 3)).astype(np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    p = str(tmp_path / "m.ply")
    ply_io.write_ply(
        p, {"x": verts[:, 0], "y": verts[:, 1], "z": verts[:, 2]}, faces=faces
    )
    data = ply_io.read_ply(p)
    np.testing.assert_allclose(data["vertex"]["x"], verts[:, 0], rtol=1e-6)
    np.testing.assert_array_equal(data["face"]["vertex_indices"], faces)
