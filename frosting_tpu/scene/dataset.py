"""Scene/dataset assembly: COLMAP or NeRF-synthetic sources -> camera list,
GT images, seed point cloud, spatial extent.

Re-creates the reference readers (gaussian_splatting/scene/
dataset_readers.py:68-259) and the GS-wrapper conventions
(frosting_scene/gs_model.py:112-150): every-8th-image eval split, white
background compositing of RGBA, NeRF++-style extent.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
from typing import List, Optional, Tuple

import numpy as np

from frosting_tpu.cameras import Camera, focal_to_fov, make_camera
from frosting_tpu.scene import colmap as colmap_io


@dataclasses.dataclass
class CameraInfo:
    camera: Camera  # single-camera pytree
    image_path: Optional[str]
    image_name: str
    width: int
    height: int
    # cached image array [3, H, W] float32 (filled lazily)
    _image: Optional[np.ndarray] = None

    def image(self, bg: Tuple[float, float, float] = (1.0, 1.0, 1.0)):
        if self._image is None:
            from PIL import Image

            im = Image.open(self.image_path)
            if (im.width, im.height) != (self.width, self.height):
                im = im.resize((self.width, self.height))
            arr = np.asarray(im).astype(np.float32) / 255.0
            if arr.ndim == 2:
                arr = arr[..., None].repeat(3, -1)
            if arr.shape[-1] == 4:
                rgb, a = arr[..., :3], arr[..., 3:]
                arr = rgb * a + np.asarray(bg) * (1.0 - a)
            self._image = arr[..., :3].transpose(2, 0, 1).copy()
        return self._image


@dataclasses.dataclass
class SceneData:
    train_cameras: List[CameraInfo]
    test_cameras: List[CameraInfo]
    points: np.ndarray  # [N, 3]
    colors: np.ndarray  # [N, 3] in [0, 1]
    spatial_extent: float  # NeRF++-style camera-extent radius


def nerfpp_extent(cam_centers: np.ndarray) -> float:
    """getNerfppNorm (dataset_readers.py): 1.1 * max distance to the average
    camera center."""
    center = cam_centers.mean(axis=0, keepdims=True)
    return float(np.linalg.norm(cam_centers - center, axis=1).max() * 1.1)


def load_colmap_scene(
    source_dir: str,
    images_dir: str = "images",
    resolution_scale: int = 1,
    eval_split: bool = True,
    llffhold: int = 8,
) -> SceneData:
    sparse = os.path.join(source_dir, "sparse", "0")
    if not os.path.isdir(sparse):
        sparse = os.path.join(source_dir, "sparse")
    cams, imgs, xyz, rgb = colmap_io.read_model(sparse)

    infos: List[CameraInfo] = []
    centers = []
    for img in sorted(imgs.values(), key=lambda im: im.name):
        cam = cams[img.camera_id]
        fx, fy, cx, cy = cam.focal_and_pp()
        w = cam.width // resolution_scale
        h = cam.height // resolution_scale
        fov_x = focal_to_fov(fx, cam.width)
        fov_y = focal_to_fov(fy, cam.height)
        R = img.rotation().T  # store cam->world rotation like the reference
        # principal point as a size fraction: invariant under downscale
        cam_pytree = make_camera(
            R, img.tvec, fov_x, fov_y,
            pp_x=cx / cam.width, pp_y=cy / cam.height,
        )
        centers.append(-img.rotation().T @ img.tvec)
        infos.append(
            CameraInfo(
                camera=cam_pytree,
                image_path=os.path.join(source_dir, images_dir, img.name),
                image_name=img.name,
                width=w,
                height=h,
            )
        )
    extent = nerfpp_extent(np.stack(centers))
    if eval_split:
        train = [c for i, c in enumerate(infos) if i % llffhold != 0]
        test = [c for i, c in enumerate(infos) if i % llffhold == 0]
    else:
        train, test = infos, []
    return SceneData(
        train_cameras=train,
        test_cameras=test,
        points=xyz.astype(np.float32),
        colors=(rgb.astype(np.float32) / 255.0),
        spatial_extent=extent,
    )


def load_gs_cameras_json(
    gs_output_path: str,
    source_dir: Optional[str] = None,
    max_img_size: int = 1920,
) -> List[CameraInfo]:
    """Load a 3DGS-training `cameras.json` (interop with upstream 3DGS
    outputs; load_gs_cameras, frosting_scene/cameras.py:15-139). Applies
    the reference's max-size downscale rule."""
    with open(os.path.join(gs_output_path, "cameras.json")) as f:
        transforms = sorted(json.load(f), key=lambda c: c["img_name"])

    infos = []
    for cam in transforms:
        w, h = int(cam["width"]), int(cam["height"])
        if max(w, h) > max_img_size:
            scale = max(w, h) / max_img_size
            w, h = int(w / scale), int(h / scale)
        fx, fy = float(cam["fx"]), float(cam["fy"])
        fov_x = focal_to_fov(fx, cam["width"])
        fov_y = focal_to_fov(fy, cam["height"])
        R = np.asarray(cam["rotation"], np.float64)  # cam->world
        pos = np.asarray(cam["position"], np.float64)
        t = -R.T @ pos
        infos.append(
            CameraInfo(
                camera=make_camera(R, t, fov_x, fov_y),
                image_path=(
                    os.path.join(source_dir, "images", cam["img_name"])
                    if source_dir
                    else None
                ),
                image_name=cam["img_name"],
                width=w,
                height=h,
            )
        )
    return infos


def load_blender_scene(
    source_dir: str,
    split: str = "train",
    white_background: bool = True,
    n_random_points: int = 100_000,
    extent: float = 1.3,
    seed: int = 0,
) -> SceneData:
    """NeRF-synthetic transforms_{split}.json loader
    (dataset_readers.py readNerfSyntheticInfo): random seed points in
    [-1.3, 1.3]^3 when no point cloud exists."""
    with open(os.path.join(source_dir, f"transforms_{split}.json")) as f:
        meta = json.load(f)
    fov_x = float(meta["camera_angle_x"])

    infos: List[CameraInfo] = []
    centers = []
    for frame in meta["frames"]:
        c2w = np.array(frame["transform_matrix"], np.float64)
        # NeRF convention: flip y, z axes to 3DGS/COLMAP convention
        c2w[:3, 1:3] *= -1
        w2c = np.linalg.inv(c2w)
        R = w2c[:3, :3].T
        t = w2c[:3, 3]
        path = os.path.join(source_dir, frame["file_path"] + ".png")
        from PIL import Image

        with Image.open(path) as im:
            width, height = im.size
        fov_y = 2.0 * math.atan(
            math.tan(fov_x / 2.0) * height / width
        )
        infos.append(
            CameraInfo(
                camera=make_camera(R, t, fov_x, fov_y),
                image_path=path,
                image_name=os.path.basename(frame["file_path"]),
                width=width,
                height=height,
            )
        )
        centers.append(c2w[:3, 3])

    rng = np.random.default_rng(seed)
    points = rng.uniform(-extent, extent, (n_random_points, 3)).astype(
        np.float32
    )
    colors = rng.uniform(0.0, 1.0, (n_random_points, 3)).astype(np.float32)
    return SceneData(
        train_cameras=infos,
        test_cameras=[],
        points=points,
        colors=colors,
        spatial_extent=nerfpp_extent(np.stack(centers)),
    )
