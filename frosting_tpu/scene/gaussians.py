"""Vanilla 3DGS parameter store as a fixed-capacity pytree arena.

Functional re-design of the reference GaussianModel
(gaussian_splatting/scene/gaussian_model.py:24-406): parameters are raw
(pre-activation) arrays in a static-capacity arena with a validity mask, so
densify/prune keep shapes static under jit (SURVEY.md §7 "fixed-capacity
arenas with validity masks"). Activations match the reference: exp scales,
sigmoid opacity, normalized quaternions (gaussian_model.py:26-41).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from frosting_tpu.ops import quat as quat_ops
from frosting_tpu.ops import sh as sh_ops
from frosting_tpu.utils import ply as ply_io


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianParams:
    """Raw (optimizable) parameters. Leading dim = static capacity; rows with
    mask=0 are dead arena slots."""

    means3d: jnp.ndarray  # [C, 3]
    sh_dc: jnp.ndarray  # [C, 1, 3]
    sh_rest: jnp.ndarray  # [C, K-1, 3]
    scales_log: jnp.ndarray  # [C, 3]
    quats_raw: jnp.ndarray  # [C, 4]
    opacities_raw: jnp.ndarray  # [C] logit
    mask: jnp.ndarray  # [C] float32 0/1 (non-optimized)

    @property
    def capacity(self) -> int:
        return self.means3d.shape[0]

    def num_active(self) -> jnp.ndarray:
        return jnp.sum(self.mask).astype(jnp.int32)


def activate(
    p: GaussianParams,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (means3d, scales, quats, opacities, sh). Dead slots get opacity 0
    (and are additionally frustum-culled by their parked position)."""
    scales = jnp.exp(p.scales_log)
    quats = quat_ops.normalize(p.quats_raw)
    opac = jax.nn.sigmoid(p.opacities_raw) * p.mask
    sh = jnp.concatenate([p.sh_dc, p.sh_rest], axis=1)
    return p.means3d, scales, quats, opac, sh


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def mean_knn_dist_sq(points: np.ndarray, k: int = 3) -> np.ndarray:
    """Host-side mean squared distance to the k nearest neighbors — the
    scale initializer (replaces simple-knn distCUDA2, simple_knn.cu:186-222).
    Exact via cKDTree; runs once at scene creation."""
    from scipy.spatial import cKDTree

    tree = cKDTree(points)
    d, _ = tree.query(points, k=k + 1, workers=-1)
    return (d[:, 1:] ** 2).mean(axis=1)


def create_from_pcd(
    points: np.ndarray,  # [N, 3]
    colors: np.ndarray,  # [N, 3] in [0, 1]
    capacity: int,
    sh_degree: int = 3,
    init_opacity: float = 0.1,
) -> GaussianParams:
    """Reference create_from_pcd (gaussian_model.py:124-147): SH DC from RGB,
    isotropic log-scale from mean 3-NN distance, opacity logit of 0.1."""
    n = points.shape[0]
    if n > capacity:
        raise ValueError(f"point cloud ({n}) exceeds capacity ({capacity})")
    k = sh_ops.num_sh_coeffs(sh_degree)

    dist2 = np.maximum(mean_knn_dist_sq(points), 1e-7)
    scales_log = np.repeat(np.log(np.sqrt(dist2))[:, None], 3, axis=1)

    def park(a, fill=0.0):
        out = np.full((capacity,) + a.shape[1:], fill, a.dtype)
        out[:n] = a
        return jnp.asarray(out, jnp.float32)

    quats = np.zeros((n, 4), np.float32)
    quats[:, 0] = 1.0
    # park dead slots at the identity quaternion (not zero)
    quats_full = np.zeros((capacity, 4), np.float32)
    quats_full[:, 0] = 1.0
    quats_full[:n] = quats
    mask = np.zeros((capacity,), np.float32)
    mask[:n] = 1.0

    # Park dead slots far away with tiny scale so they are frustum-culled
    # cheaply even if a mask bug slips through.
    means = np.full((capacity, 3), 1e6, np.float32)
    means[:n] = points

    return GaussianParams(
        means3d=jnp.asarray(means),
        sh_dc=park(np.asarray(sh_ops.rgb_to_sh(colors))[:, None, :]),
        sh_rest=park(np.zeros((n, k - 1, 3), np.float32)),
        scales_log=park(scales_log, fill=-10.0),
        quats_raw=jnp.asarray(quats_full),
        opacities_raw=park(
            np.full((n,), float(inverse_sigmoid(jnp.asarray(init_opacity)))),
            fill=-15.0,
        ),
        mask=jnp.asarray(mask),
    )


# --- 3DGS-viewer-compatible PLY checkpoint format (gaussian_model.py:177-256)


def save_ply(p: GaussianParams, path: str) -> None:
    n_active = int(np.asarray(p.num_active()))
    live = np.asarray(p.mask) > 0.5
    means = np.asarray(p.means3d)[live]
    sh_dc = np.asarray(p.sh_dc)[live]  # [n, 1, 3]
    sh_rest = np.asarray(p.sh_rest)[live]  # [n, K-1, 3]
    props = {
        "x": means[:, 0],
        "y": means[:, 1],
        "z": means[:, 2],
        "nx": np.zeros(n_active, np.float32),
        "ny": np.zeros(n_active, np.float32),
        "nz": np.zeros(n_active, np.float32),
    }
    # f_dc: channel-major (transpose(1,2) flatten), matching the reference.
    dc = sh_dc.transpose(0, 2, 1).reshape(n_active, -1)
    for i in range(dc.shape[1]):
        props[f"f_dc_{i}"] = dc[:, i]
    rest = sh_rest.transpose(0, 2, 1).reshape(n_active, -1)
    for i in range(rest.shape[1]):
        props[f"f_rest_{i}"] = rest[:, i]
    props["opacity"] = np.asarray(p.opacities_raw)[live]
    scl = np.asarray(p.scales_log)[live]
    for i in range(3):
        props[f"scale_{i}"] = scl[:, i]
    rot = np.asarray(p.quats_raw)[live]
    for i in range(4):
        props[f"rot_{i}"] = rot[:, i]
    ply_io.write_ply(path, props)


def load_ply(
    path: str, capacity: Optional[int] = None, sh_degree: int = 3
) -> GaussianParams:
    v = ply_io.read_ply(path)["vertex"]
    n = len(v["x"])
    cap = capacity or n
    k = sh_ops.num_sh_coeffs(sh_degree)

    means = np.stack([v["x"], v["y"], v["z"]], axis=1).astype(np.float32)
    dc = np.stack([v[f"f_dc_{i}"] for i in range(3)], axis=1).astype(np.float32)
    n_rest = 3 * (k - 1)
    rest = np.stack(
        [v[f"f_rest_{i}"] for i in range(n_rest)], axis=1
    ).astype(np.float32)
    # stored channel-major: [3, K-1] per point
    rest = rest.reshape(n, 3, k - 1).transpose(0, 2, 1)
    scl = np.stack([v[f"scale_{i}"] for i in range(3)], axis=1).astype(np.float32)
    rot = np.stack([v[f"rot_{i}"] for i in range(4)], axis=1).astype(np.float32)
    opac = np.asarray(v["opacity"], np.float32)

    def park(a, fill=0.0):
        out = np.full((cap,) + a.shape[1:], fill, np.float32)
        out[:n] = a
        return jnp.asarray(out)

    mask = np.zeros((cap,), np.float32)
    mask[:n] = 1.0
    means_full = np.full((cap, 3), 1e6, np.float32)
    means_full[:n] = means
    return GaussianParams(
        means3d=jnp.asarray(means_full),
        sh_dc=park(dc.reshape(n, 1, 3)),
        sh_rest=park(rest),
        scales_log=park(scl, fill=-10.0),
        quats_raw=park(rot),
        opacities_raw=park(opac, fill=-15.0),
        mask=jnp.asarray(mask),
    )
