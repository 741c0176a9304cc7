"""Z-buffer triangle rasterization with pix_to_face + barycentrics.

XLA-native replacement for nvdiffrast and the PyTorch3D MeshRasterizer
(frosting_utils/nvdiffrast.py:8-58, mesh_rasterization.py:109-172), serving
the four consumers listed in SURVEY.md §7: extraction depth maps, occlusion
culling, visibility counting, and texture baking.

Design: the Gaussian rasterizer's binning machinery is reused verbatim —
triangles are binned to pixel tiles through the same capacity-bounded
expansion — but the blend is an order-free z-MIN reduction (no depth sort
needed at all), so chunks combine with `where(z < zbuf)` updates.
Barycentrics are screen-space linear (the reference's default
perspective_correct=False path).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from frosting_tpu.cameras import Camera, ndc_to_pix
from frosting_tpu.raster.binning import Binned, bin_gaussians
from frosting_tpu.raster.config import RasterConfig


class Fragments(NamedTuple):
    """Per-pixel rasterization result (PyTorch3D Fragments analogue)."""

    pix_to_face: jnp.ndarray  # [H, W] int32, -1 for background
    zbuf: jnp.ndarray  # [H, W] f32, +inf for background
    bary: jnp.ndarray  # [H, W, 3] f32


def project_verts(verts: jnp.ndarray, camera: Camera, cfg: RasterConfig):
    """-> (xy [V, 2] pixel coords, z_view [V])."""
    from frosting_tpu.ops.cov import matvec_rows

    ones = jnp.ones_like(verts[:, :1])
    homog = jnp.concatenate([verts, ones], axis=-1)
    p_view = matvec_rows(homog, camera.world_view[:, :3])
    p_hom = matvec_rows(homog, camera.full_proj)
    w = p_hom[:, 3]
    ndc = p_hom[:, :2] / (w[:, None] + 1e-9)
    x = ndc_to_pix(ndc[:, 0], cfg.projection_width)
    y = ndc_to_pix(ndc[:, 1], cfg.projection_height)
    return jnp.stack([x, y], axis=-1), p_view[:, 2]


def _face_rects(xy, z, faces, cfg: RasterConfig, near: float):
    """Conservative tile rect per face + validity."""
    tri = xy[faces]  # [F, 3, 2]
    zf = z[faces]  # [F, 3]
    mn = jnp.min(tri, axis=1)
    mx = jnp.max(tri, axis=1)
    tx0 = jnp.clip(jnp.floor(mn[:, 0] / cfg.tile_w), 0, cfg.tiles_x).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor(mn[:, 1] / cfg.tile_h), 0, cfg.tiles_y).astype(jnp.int32)
    tx1 = jnp.clip(
        jnp.floor(mx[:, 0] / cfg.tile_w) + 1, 0, cfg.tiles_x
    ).astype(jnp.int32)
    ty1 = jnp.clip(
        jnp.floor(mx[:, 1] / cfg.tile_h) + 1, 0, cfg.tiles_y
    ).astype(jnp.int32)
    valid = jnp.all(zf > near, axis=1)  # conservative near-cull
    area = (tx1 - tx0) * (ty1 - ty0)
    valid &= area > 0
    return jnp.stack([tx0, ty0, tx1, ty1], axis=-1), valid


def _chunk_zmin(tri_xy, tri_z, face_ids, px, py, zbuf, pface, bary):
    """One chunk of K triangles against P pixels: masked z-min update.

    tri_xy (K, 3, 2), tri_z (K, 3), face_ids (K,), px/py (1, P),
    zbuf (1, P), pface (1, P) int32, bary (3, P)."""
    ax, ay = tri_xy[:, 0, 0:1], tri_xy[:, 0, 1:2]  # (K, 1)
    bx, by = tri_xy[:, 1, 0:1], tri_xy[:, 1, 1:2]
    cx, cy = tri_xy[:, 2, 0:1], tri_xy[:, 2, 1:2]
    # signed edge functions at pixel centers
    w0 = (bx - px) * (cy - py) - (cx - px) * (by - py)  # opposite a... (K,P)
    w1 = (cx - px) * (ay - py) - (ax - px) * (cy - py)
    w2 = (ax - px) * (by - py) - (bx - px) * (ay - py)
    area = (bx - ax) * (cy - ay) - (cx - ax) * (by - ay)  # (K, 1)
    area_safe = jnp.where(jnp.abs(area) < 1e-12, 1.0, area)
    b0 = w0 / area_safe
    b1 = w1 / area_safe
    b2 = w2 / area_safe
    inside = (
        (b0 >= 0.0) & (b1 >= 0.0) & (b2 >= 0.0) & (jnp.abs(area) > 1e-12)
    )
    zpix = (
        b0 * tri_z[:, 0:1] + b1 * tri_z[:, 1:2] + b2 * tri_z[:, 2:3]
    )  # (K, P)
    zpix = jnp.where(inside & (zpix > 0.0), zpix, jnp.inf)
    # arg-min over the chunk
    k_best = jnp.argmin(zpix, axis=0)  # (P,)
    p_idx = jnp.arange(zpix.shape[1])
    z_best = zpix[k_best, p_idx][None]  # (1, P)
    better = z_best < zbuf
    zbuf = jnp.where(better, z_best, zbuf)
    pface = jnp.where(better, face_ids[k_best][None], pface)
    b_best = jnp.stack(
        [b0[k_best, p_idx], b1[k_best, p_idx], b2[k_best, p_idx]], axis=0
    )
    bary = jnp.where(better, b_best, bary)
    return zbuf, pface, bary


def rasterize_mesh(
    verts: jnp.ndarray,
    faces: jnp.ndarray,
    camera: Camera,
    cfg: RasterConfig,
    near: float = 0.01,
) -> Fragments:
    """Rasterize a triangle mesh to Fragments. cfg supplies image/tile
    geometry and the instance capacity (faces x tiles)."""
    xy, z = project_verts(verts, camera, cfg)
    rect, valid = _face_rects(xy, z, faces, cfg, near)
    # Order-free min-reduction: depth key unused (zeros).
    binned = bin_gaussians(
        rect, jnp.zeros((faces.shape[0],), jnp.float32), valid, cfg
    )

    k = cfg.chunk
    p = cfg.tile_pixels
    f = faces.shape[0]
    # Padded per-instance face ids; sentinel f -> degenerate tri at inf.
    face_ids = binned.padded_gauss  # [padded_rows], sentinel == f
    tri_xy_all = jnp.concatenate([xy[faces], jnp.full((1, 3, 2), -1e9)], 0)
    tri_z_all = jnp.concatenate([z[faces], jnp.full((1, 3), jnp.inf)], 0)

    def body(carry, xs):
        out_z, out_f, out_b, zbuf, pface, bary = carry
        block, meta, pxy = xs
        out_row = Binned.meta_out(meta)
        first = Binned.meta_first(meta)
        last = Binned.meta_last(meta)
        px0 = Binned.pxy_px0(pxy)
        py0 = Binned.pxy_py0(pxy)
        ids = jax.lax.dynamic_slice(face_ids, (block * k,), (k,))
        tri_xy = tri_xy_all[ids]
        tri_z = tri_z_all[ids]
        zbuf = jnp.where(first == 1, jnp.full_like(zbuf, jnp.inf), zbuf)
        pface = jnp.where(first == 1, jnp.full_like(pface, f), pface)
        bary = jnp.where(first == 1, jnp.zeros_like(bary), bary)
        lane = jnp.arange(p, dtype=jnp.int32)
        px = (px0 + lane % cfg.tile_w).astype(jnp.float32)[None]
        py = (py0 + lane // cfg.tile_w).astype(jnp.float32)[None]
        zbuf, pface, bary = _chunk_zmin(
            tri_xy, tri_z, ids, px, py, zbuf, pface, bary
        )
        do = last == 1
        row = jnp.minimum(out_row, cfg.n_tiles)
        out_z = jax.lax.dynamic_update_slice(
            out_z,
            jnp.where(
                do, zbuf, jax.lax.dynamic_slice(out_z, (row, 0, 0), (1, 1, p))[0]
            )[None],
            (row, 0, 0),
        )
        out_f = jax.lax.dynamic_update_slice(
            out_f,
            jnp.where(
                do, pface, jax.lax.dynamic_slice(out_f, (row, 0, 0), (1, 1, p))[0]
            )[None],
            (row, 0, 0),
        )
        out_b = jax.lax.dynamic_update_slice(
            out_b,
            jnp.where(
                do, bary, jax.lax.dynamic_slice(out_b, (row, 0, 0), (1, 3, p))[0]
            )[None],
            (row, 0, 0),
        )
        return (out_z, out_f, out_b, zbuf, pface, bary), None

    init = (
        jnp.full((cfg.n_tiles + 1, 1, p), jnp.inf, jnp.float32),
        jnp.full((cfg.n_tiles + 1, 1, p), f, jnp.int32),
        jnp.zeros((cfg.n_tiles + 1, 3, p), jnp.float32),
        jnp.full((1, p), jnp.inf, jnp.float32),
        jnp.full((1, p), f, jnp.int32),
        jnp.zeros((3, p), jnp.float32),
    )
    xs = (binned.work_block, binned.work_meta, binned.work_pxy)
    (out_z, out_f, out_b, _, _, _), _ = jax.lax.scan(body, init, xs)

    def untile(x, c):
        t = x[: cfg.n_tiles].reshape(
            cfg.tiles_y, cfg.tiles_x, c, cfg.tile_h, cfg.tile_w
        )
        t = t.transpose(2, 0, 3, 1, 4).reshape(
            c, cfg.tiles_y * cfg.tile_h, cfg.tiles_x * cfg.tile_w
        )
        return t[:, : cfg.height, : cfg.width]

    zbuf = untile(out_z, 1)[0]
    pface = untile(out_f, 1)[0]
    bary = untile(out_b, 3).transpose(1, 2, 0)
    pface = jnp.where(pface >= f, -1, pface)
    return Fragments(pix_to_face=pface, zbuf=zbuf, bary=bary)
