"""Mesh/point cleaning: outlier removal, decimation, connected components.

Host-side replacements for the Open3D calls in the extraction stage
(remove_statistical_outlier coarse_shell.py:430, simplify_quadric_decimation
:488, cluster_connected_triangles :601, remove_triangles_by_mask :616).
Decimation uses vertex clustering (uniform grid, cluster-mean positions) —
robust and O(V); a QEM decimator can swap in later without API change.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from scipy.sparse import coo_matrix
from scipy.sparse.csgraph import connected_components
from scipy.spatial import cKDTree


def remove_statistical_outliers(
    points: np.ndarray, k: int = 20, std_ratio: float = 2.0, extra=None
):
    """Drop points whose mean k-NN distance exceeds mean + std_ratio*std.
    Returns (filtered points, keep mask); `extra` arrays are filtered too."""
    tree = cKDTree(points)
    d, _ = tree.query(points, k=k + 1, workers=-1)
    md = d[:, 1:].mean(axis=1)
    keep = md <= md.mean() + std_ratio * md.std()
    out = points[keep]
    if extra is not None:
        return out, keep, [e[keep] for e in extra]
    return out, keep


def decimate(
    verts: np.ndarray, faces: np.ndarray, target_vertices: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Quadric-error-metric decimation via the native C++ component
    (frosting_tpu/native/qem.cpp — the simplify_quadric_decimation
    replacement); falls back to vertex clustering if the native library
    cannot be built."""
    if len(verts) <= target_vertices:
        return verts, faces
    try:
        from frosting_tpu import native

        out = native.qem_decimate(verts, faces, target_vertices)
        if out is not None:
            return out[0], out[1].astype(np.int64)
    except Exception:
        pass
    return decimate_vertex_clustering(verts, faces, target_vertices)


def decimate_vertex_clustering(
    verts: np.ndarray, faces: np.ndarray, target_vertices: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Cluster vertices on a uniform grid sized to approximate
    target_vertices; collapse faces, drop degenerates."""
    if len(verts) <= target_vertices:
        return verts, faces
    lo, hi = verts.min(0), verts.max(0)
    span = np.maximum(hi - lo, 1e-12)
    # surface scaling: occupied cells ~ (res)^2 for a surface -> res from
    # sqrt; refine by iteration
    res = max(4, int(np.sqrt(target_vertices) * 1.3))
    for _ in range(8):
        cell = np.floor((verts - lo) / span * (res - 1e-6)).astype(np.int64)
        key = (cell[:, 0] * res + cell[:, 1]) * res + cell[:, 2]
        uniq, inv = np.unique(key, return_inverse=True)
        if len(uniq) <= target_vertices * 1.1:
            break
        res = int(res * 0.8)
    # cluster means
    new_verts = np.zeros((len(uniq), 3))
    cnt = np.zeros(len(uniq))
    np.add.at(new_verts, inv, verts)
    np.add.at(cnt, inv, 1.0)
    new_verts /= cnt[:, None]
    new_faces = inv[faces]
    good = (
        (new_faces[:, 0] != new_faces[:, 1])
        & (new_faces[:, 1] != new_faces[:, 2])
        & (new_faces[:, 0] != new_faces[:, 2])
    )
    new_faces = new_faces[good]
    # drop duplicate faces
    sf = np.sort(new_faces, axis=1)
    _, first = np.unique(sf, axis=0, return_index=True)
    new_faces = new_faces[np.sort(first)]
    return new_verts, new_faces


def remove_unsupported_vertices(
    verts: np.ndarray,
    faces: np.ndarray,
    support_points: np.ndarray,
    quantile: float,
) -> Tuple[np.ndarray, np.ndarray]:
    """Drop the `quantile` fraction of vertices farthest from the input
    surface cloud (the density-quantile vertex cleaning of
    coarse_shell.py:466-506 — Open3D's Poisson densities measure sample
    support per vertex; here support = inverse NN-distance to the cloud,
    which ranks hallucinated geometry identically)."""
    if quantile <= 0.0 or len(verts) == 0:
        return verts, faces
    tree = cKDTree(support_points)
    d, _ = tree.query(verts, k=1, workers=-1)
    cutoff = np.quantile(d, 1.0 - quantile)
    bad_v = d > cutoff
    keep_f = ~bad_v[faces].any(axis=1)
    return keep_faces(verts, faces, keep_f)


def project_on_points(
    verts: np.ndarray, support_points: np.ndarray, blend: float = 1.0
) -> np.ndarray:
    """Snap mesh vertices onto their nearest extracted surface point
    (coarse_shell.py:526-554 'project mesh on surface points to recover
    better details'); blend<1 moves only partway."""
    tree = cKDTree(support_points)
    _, idx = tree.query(verts, k=1, workers=-1)
    return verts * (1.0 - blend) + support_points[idx] * blend


def merge_meshes(parts) -> Tuple[np.ndarray, np.ndarray]:
    """Concatenate (verts, faces) pairs with vertex offsets."""
    parts = [p for p in parts if p is not None and len(p[0])]
    vs, fs, off = [], [], 0
    for v, f in parts:
        vs.append(v)
        fs.append(np.asarray(f) + off)
        off += len(v)
    return np.concatenate(vs), np.concatenate(fs)


def face_components(faces: np.ndarray, n_verts: int) -> np.ndarray:
    """Label connected components over shared vertices. Returns per-face
    component ids."""
    f = np.asarray(faces)
    rows = np.concatenate([f[:, 0], f[:, 1]])
    cols = np.concatenate([f[:, 1], f[:, 2]])
    graph = coo_matrix(
        (np.ones(len(rows)), (rows, cols)), shape=(n_verts, n_verts)
    )
    _, vlabels = connected_components(graph, directed=False)
    return vlabels[f[:, 0]]


def keep_faces(
    verts: np.ndarray, faces: np.ndarray, mask: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Keep masked faces and compact unused vertices."""
    f = faces[mask]
    used = np.zeros(len(verts), bool)
    used[f] = True
    remap = np.cumsum(used) - 1
    return verts[used], remap[f]


def largest_component(verts, faces):
    labels = face_components(faces, len(verts))
    vals, cnts = np.unique(labels, return_counts=True)
    best = vals[np.argmax(cnts)]
    return keep_faces(verts, faces, labels == best)


def visibility_cull_components(
    verts: np.ndarray,
    faces: np.ndarray,
    cameras,
    rcfg,
    vis_threshold: float = 0.001,
) -> Tuple[np.ndarray, np.ndarray]:
    """Drop connected components whose fraction of camera-visible faces is
    below vis_threshold (coarse_shell.py:565-617: per-camera rasterize,
    count pix_to_face hits per component)."""
    import jax.numpy as jnp

    from frosting_tpu.ops import mesh_raster

    labels = face_components(faces, len(verts))
    n_faces = len(faces)
    seen = np.zeros(n_faces, bool)
    vj = jnp.asarray(verts, jnp.float32)
    fj = jnp.asarray(faces, jnp.int32)
    for cam in cameras:
        frags = mesh_raster.rasterize_mesh(vj, fj, cam, rcfg)
        pf = np.asarray(frags.pix_to_face).ravel()
        seen[pf[pf >= 0]] = True
    keep = np.zeros(n_faces, bool)
    for comp in np.unique(labels):
        m = labels == comp
        if seen[m].mean() >= vis_threshold:
            keep |= m
    if not keep.any():  # never drop everything
        return largest_component(verts, faces)
    return keep_faces(verts, faces, keep)
