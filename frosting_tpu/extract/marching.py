"""Marching tetrahedra iso-surface extraction (vectorized numpy).

Replaces the reference's marching-cubes / Poisson mesh creation step
(PyMCubes at coarse_shell.py:775-810, Open3D Poisson meshing at
coarse_shell.py:437-466) with a table-free scheme: each grid cube splits
into 6 tetrahedra; a tetrahedron crossing the iso level yields 1 or 2
triangles whose vertices are edge interpolations. No 256-case tables, fully
vectorized, no ambiguous configurations.

Large grids (the reference's Poisson depth 10 = 1024^3, coarse_shell.py:80)
are processed in z-slabs: the flat per-tet arrays of the naive
vectorization would need hundreds of GB at 1024^3, while a slab bounds the
working set to ~(nx*ny*slab_z) tets. Corner ids and vertex positions are
computed in GLOBAL grid coordinates with identical arithmetic regardless of
slabbing, so cross-slab welding is exact (bit-identical keys AND
positions); empty slabs (no iso crossing) are skipped outright.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

# Standard decomposition of the cube (corners c0..c7, bit order x + 2y + 4z)
# into 6 tetrahedra sharing the main diagonal 0-7:
_TETS = np.array(
    [
        [0, 1, 3, 7],
        [0, 3, 2, 7],
        [0, 2, 6, 7],
        [0, 6, 4, 7],
        [0, 4, 5, 7],
        [0, 5, 1, 7],
    ],
    np.int64,
)

_CORNER_OFFSETS = np.array(
    [[x, y, z] for z in (0, 1) for y in (0, 1) for x in (0, 1)], np.int64
)  # corner index bit order: x + 2y + 4z


def _collect_slab(grid, level, origin, spacing, shape, z0):
    """Crossing triangles for the cube layers [z0, z0+slab.nz-1) of the
    GLOBAL grid. `grid` is the slab view grid[:, :, z0:z1+1]; ids,
    positions and interpolations are all in global coordinates.
    Returns (keys [m,3], pos [m,3,3], anchor ids [m], sign [m]) or None."""
    nx, ny, nz = shape
    snx, sny, snz = grid.shape
    # corner values for every cube in the slab, [ncubes, 8]
    cubes = np.stack(
        [
            grid[ox : snx - 1 + ox, oy : sny - 1 + oy, oz : snz - 1 + oz]
            for ox, oy, oz in _CORNER_OFFSETS
        ],
        axis=-1,
    ).reshape(-1, 8)
    # integer GLOBAL coordinates of cube corner 0
    cx, cy, cz = np.meshgrid(
        np.arange(snx - 1),
        np.arange(sny - 1),
        np.arange(snz - 1) + z0,
        indexing="ij",
    )
    cube_base = np.stack([cx, cy, cz], axis=-1).reshape(-1, 3)

    # global corner ids for welding: id = x + nx*(y + ny*z)
    def corner_id(base, corner):
        c = base + _CORNER_OFFSETS[corner]
        return c[:, 0] + nx * (c[:, 1] + ny * c[:, 2])

    tet_vals = cubes[:, _TETS].reshape(-1, 4)  # [ntets, 4]
    tet_corner_ids = np.stack(
        [corner_id(cube_base, c) for c in range(8)], axis=1
    )  # [ncubes, 8]
    tet_ids = tet_corner_ids[:, _TETS].reshape(-1, 4)  # [ntets, 4]

    above = tet_vals > level  # [ntets, 4]
    n_above = above.sum(axis=1)

    # Edge interpolation helper on global corner ids; values come from the
    # slab (F-order flat, offset by the slab's base id)
    grid_flat = grid.reshape(-1, order="F")
    id_off = z0 * nx * ny

    def corner_pos(ids):
        x = ids % nx
        y = (ids // nx) % ny
        z = ids // (nx * ny)
        return origin + spacing * np.stack([x, y, z], axis=-1)

    def edge_vertex(id_a, id_b):
        """Interpolated iso vertex on edge (a, b); returns (key, pos)."""
        va = grid_flat[id_a - id_off]
        vb = grid_flat[id_b - id_off]
        t = (level - va) / np.where(np.abs(vb - va) < 1e-30, 1e-30, vb - va)
        t = np.clip(t, 0.0, 1.0)
        pos = corner_pos(id_a) * (1 - t[:, None]) + corner_pos(id_b) * t[
            :, None
        ]
        key = np.where(
            id_a < id_b,
            id_a * (nx * ny * nz) + id_b,
            id_b * (nx * ny * nz) + id_a,
        )
        return key, pos

    tris_keys = []  # (keys [m,3], pos [m,3,3], anchor ids [m], sign [m])

    # Case 1 / 3: exactly one corner above (sign +1: normal away from it)
    # or exactly one below (sign -1: normal toward it).
    for side, sign in ((above, 1.0), (~above, -1.0)):
        m1 = side.sum(axis=1) == 1
        if not m1.any():
            continue
        rows = np.nonzero(m1)[0]
        iso_corner = np.argmax(side[rows], axis=1)
        ids = tet_ids[rows]
        a = ids[np.arange(len(rows)), iso_corner]
        others = np.stack(
            [
                ids[np.arange(len(rows)), (iso_corner + k) % 4]
                for k in (1, 2, 3)
            ],
            axis=1,
        )
        k0, p0 = edge_vertex(a, others[:, 0])
        k1, p1 = edge_vertex(a, others[:, 1])
        k2, p2 = edge_vertex(a, others[:, 2])
        tri = np.stack([k0, k1, k2], axis=1)
        pos = np.stack([p0, p1, p2], axis=1)
        tris_keys.append((tri, pos, a, np.full(len(rows), sign)))

    # Case 2: two above, two below -> quad (2 triangles); anchor above.
    m2 = n_above == 2
    if m2.any():
        rows = np.nonzero(m2)[0]
        ab = above[rows]
        ids = tet_ids[rows]
        order = np.argsort(~ab, axis=1, kind="stable")  # above corners first
        idx = np.take_along_axis(ids, order, axis=1)
        a0, a1, b0, b1 = idx[:, 0], idx[:, 1], idx[:, 2], idx[:, 3]
        k00, p00 = edge_vertex(a0, b0)
        k01, p01 = edge_vertex(a0, b1)
        k10, p10 = edge_vertex(a1, b0)
        k11, p11 = edge_vertex(a1, b1)
        ones = np.ones(len(rows))
        tris_keys.append(
            (np.stack([k00, k01, k11], 1), np.stack([p00, p01, p11], 1), a0, ones)
        )
        tris_keys.append(
            (np.stack([k00, k11, k10], 1), np.stack([p00, p11, p10], 1), a0, ones)
        )

    if not tris_keys:
        return None
    return tuple(
        np.concatenate([t[i] for t in tris_keys]) for i in range(4)
    )


def marching_tets(
    grid: np.ndarray,  # [Nx, Ny, Nz] scalar field
    level: float,
    origin=(0.0, 0.0, 0.0),
    spacing=(1.0, 1.0, 1.0),
    max_slab_cubes: int = 32_000_000,
) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the iso-surface {field == level}. Returns (verts [V,3],
    faces [F,3]) with vertices welded on shared tet edges. Triangles are
    oriented so normals point toward LOWER field values (outward for a
    density field). Grids whose cube count exceeds max_slab_cubes are
    processed in z-slabs (identical output, bounded memory)."""
    nx, ny, nz = grid.shape
    origin = np.asarray(origin, np.float64)
    spacing = np.asarray(spacing, np.float64)

    per_layer = max(1, (nx - 1) * (ny - 1))
    slab_layers = max(1, min(nz - 1, max_slab_cubes // per_layer))

    parts = []
    for z0 in range(0, nz - 1, slab_layers):
        z1 = min(z0 + slab_layers, nz - 1)  # cube layers [z0, z1)
        slab = grid[:, :, z0 : z1 + 1]
        # skip slabs that cannot cross the level
        if slab.min() > level or slab.max() <= level:
            continue
        out = _collect_slab(slab, level, origin, spacing, grid.shape, z0)
        if out is not None:
            parts.append(out)

    if not parts:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int64)

    all_keys = np.concatenate([p[0] for p in parts])
    all_pos = np.concatenate([p[1] for p in parts])
    all_anchor = np.concatenate([p[2] for p in parts])
    all_sign = np.concatenate([p[3] for p in parts])

    # weld vertices by edge key
    flat_keys = all_keys.reshape(-1)
    uniq, inv = np.unique(flat_keys, return_inverse=True)
    verts = np.zeros((len(uniq), 3))
    verts[inv] = all_pos.reshape(-1, 3)
    faces = inv.reshape(-1, 3)

    # orient: normal points away from the above-side anchor (toward lower
    # field values)
    def corner_pos(ids):
        x = ids % nx
        y = (ids // nx) % ny
        z = ids // (nx * ny)
        return origin + spacing * np.stack([x, y, z], axis=-1)

    v0 = verts[faces[:, 0]]
    v1 = verts[faces[:, 1]]
    v2 = verts[faces[:, 2]]
    n = np.cross(v1 - v0, v2 - v0)
    centroid = (v0 + v1 + v2) / 3.0
    anchor_pos = corner_pos(all_anchor)
    outward = all_sign * np.sum(n * (centroid - anchor_pos), axis=1) >= 0
    faces[~outward] = faces[~outward][:, [0, 2, 1]]

    return verts, faces.astype(np.int64)
