"""Camera model: 3DGS-convention pinhole cameras as a JAX pytree.

Re-creates the reference's GSCamera math (frosting_scene/cameras.py:142-223,
frosting_utils/graphics_utils.py:38-91) functionally: matrices are stored
ROW-VECTOR convention, i.e. p_view = [p,1] @ world_view, exactly like the
transposed tensors the reference hands the CUDA rasterizer
(cameras.py:209-211: getWorld2View2(..).transpose(0,1)).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def fov_to_focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal_to_fov(focal: float, pixels: float) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


def world_to_view(R: np.ndarray, t: np.ndarray) -> np.ndarray:
    """4x4 world->view (COLMAP R is world->cam as stored transposed; matches
    getWorld2View2, graphics_utils.py:52-63), COLUMN-vector convention."""
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = R.T
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    return Rt


def projection_matrix(
    znear: float,
    zfar: float,
    fov_x: float,
    fov_y: float,
    pp_x: float = 0.5,
    pp_y: float = 0.5,
) -> np.ndarray:
    """OpenGL-style perspective with z in [0,1] (graphics_utils.py:66-87),
    COLUMN-vector convention.

    pp_x/pp_y: principal point as a FRACTION of image width/height (0.5 =
    centered). COLMAP cameras with off-center pp must carry the shift or
    every projection is bias-shifted (reference conversion handles it at
    frosting_scene/cameras.py:295-310); the off-center terms land in column
    2 so ndc = x_clip/z picks up the constant offset."""
    tan_x = math.tan(fov_x / 2.0)
    tan_y = math.tan(fov_y / 2.0)
    P = np.zeros((4, 4), dtype=np.float64)
    P[0, 0] = 1.0 / tan_x
    P[1, 1] = 1.0 / tan_y
    P[0, 2] = 2.0 * pp_x - 1.0
    P[1, 2] = 2.0 * pp_y - 1.0
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """One (or a batch of) 3DGS camera(s). All matrices row-vector convention.

    Fields with a leading batch dim vmap/shard naturally. Static image size
    lives outside (RasterConfig) so Camera stays a pure array pytree.
    """

    world_view: jnp.ndarray  # [..., 4, 4]  p_view = [p,1] @ world_view
    full_proj: jnp.ndarray  # [..., 4, 4]  p_clip = [p,1] @ full_proj
    cam_center: jnp.ndarray  # [..., 3]
    tan_fov_x: jnp.ndarray  # [...]
    tan_fov_y: jnp.ndarray  # [...]

    @property
    def focal_x(self):
        raise AttributeError("use focal(width) — focal depends on image size")

    def focals(self, width: int, height: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return (
            width / (2.0 * self.tan_fov_x),
            height / (2.0 * self.tan_fov_y),
        )


def make_camera(
    R: np.ndarray,
    t: np.ndarray,
    fov_x: float,
    fov_y: float,
    znear: float = 0.01,
    zfar: float = 100.0,
    pp_x: float = 0.5,
    pp_y: float = 0.5,
    dtype=jnp.float32,
) -> Camera:
    """Build a Camera from COLMAP-style R (cam-to-world rotation, as in the
    reference's loaders) and translation t (world->cam). pp_x/pp_y:
    principal point as a fraction of image size (0.5 = centered)."""
    wv = world_to_view(np.asarray(R, np.float64), np.asarray(t, np.float64))
    proj = projection_matrix(znear, zfar, fov_x, fov_y, pp_x, pp_y)
    full = proj @ wv  # column-vector composition
    c2w = np.linalg.inv(wv)
    center = c2w[:3, 3]
    return Camera(
        world_view=jnp.asarray(wv.T, dtype),
        full_proj=jnp.asarray(full.T, dtype),
        cam_center=jnp.asarray(center, dtype),
        tan_fov_x=jnp.asarray(math.tan(fov_x / 2.0), dtype),
        tan_fov_y=jnp.asarray(math.tan(fov_y / 2.0), dtype),
    )


def look_at_camera(
    eye, target, up=(0.0, 1.0, 0.0), fov_x=math.radians(60), fov_y=None, **kw
) -> Camera:
    """Convenience constructor for tests/synthetic scenes: camera at `eye`
    looking at `target`, +z forward (3DGS convention), +y down-ish."""
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    up = np.asarray(up, np.float64)
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    down = np.cross(fwd, right)
    # Rows of world->cam rotation (x=right, y=down, z=forward).
    Rcw = np.stack([right, down, fwd], axis=0)
    t = -Rcw @ eye
    # make_camera takes R with R.T = world->cam rotation.
    if fov_y is None:
        fov_y = fov_x
    return make_camera(Rcw.T, t, fov_x, fov_y, **kw)


def ndc_to_pix(v: jnp.ndarray, size: int) -> jnp.ndarray:
    """NDC [-1,1] -> pixel centers, matching ndc2Pix (auxiliary.h:41-44)."""
    return ((v + 1.0) * size - 1.0) * 0.5
