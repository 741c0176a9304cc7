"""Mesh ops + z-buffer rasterizer correctness vs a naive per-pixel
reference."""

import jax.numpy as jnp
import numpy as np

from frosting_tpu.cameras import look_at_camera
from frosting_tpu.ops import mesh as mesh_ops
from frosting_tpu.ops import mesh_raster
from frosting_tpu.raster import RasterConfig


def icosphere(subdiv=1):
    """Tiny icosphere (host-side)."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        np.float64,
    )
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        np.int32,
    )
    for _ in range(subdiv):
        mid = {}
        new_faces = []
        verts = list(map(np.array, verts))

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in mid:
                m = (verts[a] + verts[b]) / 2
                m /= np.linalg.norm(m)
                verts.append(m)
                mid[key] = len(verts) - 1
            return mid[key]

        for f in faces:
            a, b, c = int(f[0]), int(f[1]), int(f[2])
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        faces = np.array(new_faces, np.int32)
        verts = np.stack(verts)
    return verts.astype(np.float32), faces


def test_normals_unit_and_outward():
    v, f = icosphere(1)
    vn = np.asarray(mesh_ops.vertex_normals(jnp.asarray(v), jnp.asarray(f)))
    np.testing.assert_allclose(np.linalg.norm(vn, axis=1), 1.0, atol=1e-5)
    # sphere: normal ~ position
    cos = np.sum(vn * v / np.linalg.norm(v, axis=1, keepdims=True), axis=1)
    assert (np.abs(cos) > 0.99).all()
    assert (cos > 0).all() or (cos < 0).all()  # consistent orientation


def test_laplacian_and_consistency_zero_for_smooth():
    v, f = icosphere(2)
    pairs = mesh_ops.adjacent_face_pairs(f)
    edges = mesh_ops.edges_from_faces(f)
    lap = float(
        mesh_ops.laplacian_smoothing_loss(jnp.asarray(v), jnp.asarray(edges))
    )
    nc = float(
        mesh_ops.normal_consistency_loss(
            jnp.asarray(v), jnp.asarray(f), jnp.asarray(pairs)
        )
    )
    assert lap < 0.1
    assert nc < 0.05
    # a crumpled mesh must be worse
    rng = np.random.default_rng(0)
    v2 = v + rng.normal(scale=0.05, size=v.shape).astype(np.float32)
    assert (
        float(
            mesh_ops.normal_consistency_loss(
                jnp.asarray(v2), jnp.asarray(f), jnp.asarray(pairs)
            )
        )
        > nc * 3
    )


def test_rasterize_sphere_matches_naive():
    v, f = icosphere(1)
    cam = look_at_camera(eye=[0, 0, -3.0], target=[0, 0, 0])
    cfg = RasterConfig(
        width=64, height=64, chunk=32, max_instances=4096, backend="jax"
    )
    frags = mesh_raster.rasterize_mesh(
        jnp.asarray(v), jnp.asarray(f), cam, cfg
    )
    # naive reference
    xy, z = mesh_raster.project_verts(jnp.asarray(v), cam, cfg)
    xy, z = np.asarray(xy), np.asarray(z)
    zbuf = np.full((64, 64), np.inf)
    pface = np.full((64, 64), -1)
    for fi, tri in enumerate(np.asarray(f)):
        a, b, c = xy[tri]
        za, zb, zc = z[tri]
        area = (b[0]-a[0])*(c[1]-a[1]) - (c[0]-a[0])*(b[1]-a[1])
        if abs(area) < 1e-12:
            continue
        for py in range(64):
            for px in range(64):
                w0 = ((b[0]-px)*(c[1]-py) - (c[0]-px)*(b[1]-py)) / area
                w1 = ((c[0]-px)*(a[1]-py) - (a[0]-px)*(c[1]-py)) / area
                w2 = ((a[0]-px)*(b[1]-py) - (b[0]-px)*(a[1]-py)) / area
                if w0 >= 0 and w1 >= 0 and w2 >= 0:
                    zp = w0*za + w1*zb + w2*zc
                    if 0 < zp < zbuf[py, px]:
                        zbuf[py, px] = zp
                        pface[py, px] = fi
    got_z = np.asarray(frags.zbuf)
    cover_ref = np.isfinite(zbuf)
    cover_got = np.isfinite(got_z)
    assert (cover_ref == cover_got).mean() > 0.995
    both = cover_ref & cover_got
    np.testing.assert_allclose(got_z[both], zbuf[both], rtol=1e-4)
    agree = (np.asarray(frags.pix_to_face)[both] == pface[both]).mean()
    assert agree > 0.99
    # barycentrics reconstruct the pixel position
    bary = np.asarray(frags.bary)
    ys, xs = np.nonzero(both)
    fi = np.asarray(frags.pix_to_face)[ys, xs]
    tri_xy = xy[np.asarray(f)[fi]]
    recon = np.sum(tri_xy * bary[ys, xs][..., None], axis=1)
    np.testing.assert_allclose(
        recon, np.stack([xs, ys], -1).astype(np.float64), atol=1e-3
    )
