"""Triangle-mesh operations: normals, smoothness losses, topology, edits.

XLA-native replacement for the PyTorch3D mesh ops the reference leans on
(Meshes verts/faces normals at frosting_model.py:282-286, 617-647;
mesh_normal_consistency / mesh_laplacian_smoothing at coarse_density.py:
742-746 and refine.py:515). All functions are pure and jit-able with static
mesh topology.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def face_normals(verts: jnp.ndarray, faces: jnp.ndarray, eps=1e-12):
    """[F, 3] unit normals (CCW winding)."""
    v0, v1, v2 = (verts[faces[:, i]] for i in range(3))
    n = jnp.cross(v1 - v0, v2 - v0)
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), eps)


def face_areas(verts: jnp.ndarray, faces: jnp.ndarray):
    v0, v1, v2 = (verts[faces[:, i]] for i in range(3))
    return 0.5 * jnp.linalg.norm(jnp.cross(v1 - v0, v2 - v0), axis=-1)


def vertex_normals(verts: jnp.ndarray, faces: jnp.ndarray, eps=1e-12):
    """[V, 3] area-weighted unit vertex normals (PyTorch3D convention)."""
    v0, v1, v2 = (verts[faces[:, i]] for i in range(3))
    fn = jnp.cross(v1 - v0, v2 - v0)  # area-weighted
    vn = jnp.zeros_like(verts)
    for i in range(3):
        vn = vn.at[faces[:, i]].add(fn)
    return vn / jnp.maximum(jnp.linalg.norm(vn, axis=-1, keepdims=True), eps)


def edges_from_faces(faces: np.ndarray) -> np.ndarray:
    """Unique undirected edges [E, 2] (host-side, static topology)."""
    e = np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], axis=0
    )
    e = np.sort(e, axis=1)
    return np.unique(e, axis=0)


def laplacian_smoothing_loss(
    verts: jnp.ndarray, edges: jnp.ndarray
) -> jnp.ndarray:
    """Uniform-weight Laplacian smoothing: || v - mean(neighbors) ||
    (mesh_laplacian_smoothing(method="uniform"))."""
    v = verts.shape[0]
    deg = jnp.zeros((v,), jnp.float32)
    acc = jnp.zeros_like(verts)
    for a, b in ((0, 1), (1, 0)):
        acc = acc.at[edges[:, a]].add(verts[edges[:, b]])
        deg = deg.at[edges[:, a]].add(1.0)
    mean_nb = acc / jnp.maximum(deg[:, None], 1.0)
    lap = jnp.where(deg[:, None] > 0, verts - mean_nb, 0.0)
    return jnp.mean(jnp.linalg.norm(lap, axis=-1))


def adjacent_face_pairs(faces: np.ndarray) -> np.ndarray:
    """[P, 2] indices of face pairs sharing an edge (host-side)."""
    f = np.asarray(faces)
    edges = np.concatenate(
        [f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]], axis=0
    )
    edges = np.sort(edges, axis=1)
    face_idx = np.tile(np.arange(len(f)), 3)
    order = np.lexsort((edges[:, 1], edges[:, 0]))
    es, fi = edges[order], face_idx[order]
    same = (es[1:] == es[:-1]).all(axis=1)
    return np.stack([fi[:-1][same], fi[1:][same]], axis=1)


def normal_consistency_loss(
    verts: jnp.ndarray, faces: jnp.ndarray, pairs: jnp.ndarray
) -> jnp.ndarray:
    """1 - cos between adjacent face normals (mesh_normal_consistency)."""
    fn = face_normals(verts, faces)
    n0, n1 = fn[pairs[:, 0]], fn[pairs[:, 1]]
    return jnp.mean(1.0 - jnp.sum(n0 * n1, axis=-1))


def barycentric_interpolate(
    values: jnp.ndarray,  # [V, C]
    faces: jnp.ndarray,  # [F, 3]
    face_idx: jnp.ndarray,  # [...] int
    bary: jnp.ndarray,  # [..., 3]
):
    """Interpolate per-vertex values at barycentric positions on faces."""
    tri = values[faces[face_idx]]  # [..., 3, C]
    return jnp.sum(tri * bary[..., None], axis=-2)
