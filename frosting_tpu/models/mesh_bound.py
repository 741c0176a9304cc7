"""Mesh-bound Gaussian representation (refined SuGaR): flat Gaussians
pinned to triangles at fixed barycenter patterns.

Re-creates the surface-mesh binding of the SuGaR model
(frosting_scene/sugar_model.py:186-360 patterns; scaling/quaternion
composition :440-503): n in {1,3,4,6} Gaussians per face at fixed
barycentric positions, each with 2 learnable in-plane log-scales and a
learnable 2D rotation stored as a complex number; the third axis is the
face normal with a constant tiny thickness. This is both SuGaR's refined
representation and the zero-thickness precursor of the Frosting cells.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from frosting_tpu.ops import mesh as mesh_ops
from frosting_tpu.ops import quat as quat_ops
from frosting_tpu.ops import sh as sh_ops

# Fixed barycentric patterns + incircle radii (sugar_model.py:186-227)
BARY_PATTERNS = {
    1: (
        [[1 / 3, 1 / 3, 1 / 3]],
        1.0 / 2.0 / math.sqrt(3.0),
    ),
    3: (
        [[1 / 2, 1 / 4, 1 / 4], [1 / 4, 1 / 2, 1 / 4], [1 / 4, 1 / 4, 1 / 2]],
        1.0 / 2.0 / (math.sqrt(3.0) + 1.0),
    ),
    4: (
        [
            [1 / 3, 1 / 3, 1 / 3],
            [2 / 3, 1 / 6, 1 / 6],
            [1 / 6, 2 / 3, 1 / 6],
            [1 / 6, 1 / 6, 2 / 3],
        ],
        1.0 / (4.0 * math.sqrt(3.0)),
    ),
    6: (
        [
            [2 / 3, 1 / 6, 1 / 6],
            [1 / 6, 2 / 3, 1 / 6],
            [1 / 6, 1 / 6, 2 / 3],
            [1 / 6, 5 / 12, 5 / 12],
            [5 / 12, 1 / 6, 5 / 12],
            [5 / 12, 5 / 12, 1 / 6],
        ],
        1.0 / (4.0 + 2.0 * math.sqrt(3.0)),
    ),
}


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MeshBoundParams:
    """Optimizable state; faces / n-per-triangle live in MeshBoundMeta."""

    verts: jnp.ndarray  # [V, 3] (optimizable if learning positions)
    plane_scales_log: jnp.ndarray  # [N, 2]
    complex_rot: jnp.ndarray  # [N, 2] in-plane rotation (normalized on use)
    opacities_raw: jnp.ndarray  # [N]
    sh_dc: jnp.ndarray  # [N, 1, 3]
    sh_rest: jnp.ndarray  # [N, K-1, 3]


class MeshBoundMeta(NamedTuple):
    faces: jnp.ndarray  # [F, 3]
    n_per_triangle: int
    thickness: float  # constant normal-axis scale


def init_mesh_bound(
    verts: np.ndarray,
    faces: np.ndarray,
    n_per_triangle: int = 6,
    sh_degree: int = 3,
    vertex_colors: np.ndarray | None = None,
    thickness_factor: float = 1e-4,
    init_opacity: float = 0.9,
) -> Tuple[MeshBoundParams, MeshBoundMeta]:
    from frosting_tpu.scene.gaussians import inverse_sigmoid

    bary, radius = BARY_PATTERNS[n_per_triangle]
    bary = np.asarray(bary, np.float32)
    f = len(faces)
    n = f * n_per_triangle

    verts_j = jnp.asarray(verts, jnp.float32)
    faces_j = jnp.asarray(faces, jnp.int32)
    tri = np.asarray(verts)[np.asarray(faces)]  # [F, 3, 3]
    # incircle-radius scale init (sugar_model.py:~330): scale = pattern
    # radius x shortest side
    sides = np.linalg.norm(
        tri - tri[:, [1, 2, 0]], axis=-1
    )  # [F, 3]
    scale0 = radius * sides.min(axis=1)  # [F]
    plane_scales = np.repeat(scale0, n_per_triangle)[:, None].repeat(2, 1)

    if vertex_colors is not None:
        fc = np.asarray(vertex_colors)[np.asarray(faces)]  # [F, 3, 3]
        cols = np.einsum("gk,fkc->fgc", bary, fc).reshape(n, 3)
        sh_dc = np.asarray(sh_ops.rgb_to_sh(jnp.asarray(cols)))[:, None]
    else:
        sh_dc = np.zeros((n, 1, 3), np.float32)

    extent = float(np.linalg.norm(verts.max(0) - verts.min(0)))
    params = MeshBoundParams(
        verts=verts_j,
        plane_scales_log=jnp.log(
            jnp.maximum(jnp.asarray(plane_scales, jnp.float32), 1e-8)
        ),
        complex_rot=jnp.concatenate(
            [jnp.ones((n, 1)), jnp.zeros((n, 1))], axis=1
        ),
        opacities_raw=jnp.full(
            (n,), float(inverse_sigmoid(jnp.asarray(init_opacity)))
        ),
        sh_dc=jnp.asarray(sh_dc, jnp.float32),
        sh_rest=jnp.zeros((n, sh_ops.num_sh_coeffs(sh_degree) - 1, 3)),
    )
    meta = MeshBoundMeta(
        faces=faces_j,
        n_per_triangle=n_per_triangle,
        thickness=thickness_factor * extent,
    )
    return params, meta


def activate_mesh_bound(p: MeshBoundParams, meta: MeshBoundMeta):
    """-> (means, scales, quats, opacities, sh) render-ready arrays.
    Gaussian frames: axis0 = face normal (thickness), axes 1-2 = in-plane
    basis rotated by the learned complex number (sugar_model.py:469-495)."""
    bary, _ = BARY_PATTERNS[meta.n_per_triangle]
    bary_j = jnp.asarray(bary, jnp.float32)  # [G, 3]
    g = bary_j.shape[0]
    tri = p.verts[meta.faces]  # [F, 3, 3]
    f = tri.shape[0]

    means = jnp.einsum("gk,fkc->fgc", bary_j, tri).reshape(-1, 3)

    n0 = mesh_ops.face_normals(p.verts, meta.faces)  # [F, 3]
    e1 = tri[:, 0] - tri[:, 1]
    b1 = e1 / jnp.maximum(
        jnp.linalg.norm(e1, axis=-1, keepdims=True), 1e-12
    )
    b2 = jnp.cross(n0, b1)
    b2 = b2 / jnp.maximum(jnp.linalg.norm(b2, axis=-1, keepdims=True), 1e-12)

    cr = p.complex_rot
    cr = cr * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(cr * cr, axis=-1, keepdims=True), 1e-18)
    )
    cr = cr.reshape(f, g, 2)
    r1 = cr[..., 0:1] * b1[:, None] + cr[..., 1:2] * b2[:, None]
    r2 = -cr[..., 1:2] * b1[:, None] + cr[..., 0:1] * b2[:, None]
    R = jnp.stack(
        [
            jnp.broadcast_to(n0[:, None], r1.shape),
            r1,
            r2,
        ],
        axis=-1,
    ).reshape(-1, 3, 3)
    quats = quat_ops.from_matrix(R)

    plane = jnp.exp(p.plane_scales_log)
    scales = jnp.concatenate(
        [jnp.full((plane.shape[0], 1), meta.thickness), plane], axis=1
    )
    opac = jax.nn.sigmoid(p.opacities_raw)
    sh = jnp.concatenate([p.sh_dc, p.sh_rest], axis=1)
    return means, scales, quats, opac, sh
