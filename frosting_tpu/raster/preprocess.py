"""Per-Gaussian preprocessing: projection, EWA covariance, SH color, tile rect.

Differentiable pure-JAX re-derivation of preprocessCUDA
(cuda_rasterizer/forward.cu:154-259). Integer outputs (radii, rects) carry no
gradients; everything else is autodiff-transparent, so the rasterizer's
backward through projection/covariance/SH is plain `jax.vjp` — no hand-written
chain rule as in backward.cu:144-398.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from frosting_tpu.cameras import Camera, ndc_to_pix
from frosting_tpu.ops import cov as cov_ops
from frosting_tpu.ops import sh as sh_ops
from frosting_tpu.raster.config import (
    ALPHA_CUTOFF,
    INSTANCE_WIDTH,
    RasterConfig,
)


class Projected(NamedTuple):
    means2d: jnp.ndarray  # [N, 2] pixel coords
    conics: jnp.ndarray  # [N, 3] inverse 2D covariance (a, b, c)
    colors: jnp.ndarray  # [N, 3] clamped RGB
    opacities: jnp.ndarray  # [N] activated opacity
    depths: jnp.ndarray  # [N] view-space z
    radii: jnp.ndarray  # [N] int32 3-sigma pixel radius (0 => culled)
    rect: jnp.ndarray  # [N, 4] int32 (tx0, ty0, tx1, ty1) tile bbox
    valid: jnp.ndarray  # [N] bool


def preprocess(
    means3d: jnp.ndarray,  # [N, 3]
    scales: jnp.ndarray,  # [N, 3] activated (positive)
    quats: jnp.ndarray,  # [N, 4] unit wxyz
    opacities: jnp.ndarray,  # [N] activated (0..1)
    sh: jnp.ndarray,  # [N, K, 3] SH coefficients
    camera: Camera,
    cfg: RasterConfig,
    active_sh_degree: int | None = None,
    colors_precomp: jnp.ndarray | None = None,
    cov3d_precomp: jnp.ndarray | None = None,
    scale_modifier: float = 1.0,
    pixel_offset=(0, 0),
) -> Projected:
    deg = cfg.sh_degree if active_sh_degree is None else active_sh_degree
    f32 = jnp.float32

    # Projection products are unrolled elementwise (exact f32 on the VPU;
    # skinny [N,4]x[4,4] matmuls both lose precision by default on the MXU
    # and trigger a pathological slow-gather runtime mode — see ops/cov.py).
    ones = jnp.ones_like(means3d[..., :1])
    homog = jnp.concatenate([means3d, ones], axis=-1)  # [N, 4]

    p_view = cov_ops.matvec_rows(homog, camera.world_view[:, :3])  # [N, 3]
    depth = p_view[..., 2]
    in_front = depth > cfg.near

    p_hom = cov_ops.matvec_rows(homog, camera.full_proj)  # [N, 4]
    p_w = 1.0 / (p_hom[..., 3] + 1e-7)
    ndc = p_hom[..., :2] * p_w[..., None]
    # Projection always uses FULL image dims; pixel_offset shifts into the
    # rendered sub-rectangle's frame (tile-axis sharding renders strips).
    mean_x = ndc_to_pix(ndc[..., 0], cfg.projection_width) - pixel_offset[0]
    mean_y = ndc_to_pix(ndc[..., 1], cfg.projection_height) - pixel_offset[1]
    means2d = jnp.stack([mean_x, mean_y], axis=-1)

    if cov3d_precomp is None:
        cov6 = cov_ops.cov3d_from_scale_quat(scales * scale_modifier, quats)
    else:
        cov6 = cov3d_precomp
    focal_x, focal_y = camera.focals(
        cfg.projection_width, cfg.projection_height
    )
    cov2d = cov_ops.ewa_project(
        means3d, cov6, camera.world_view, focal_x, focal_y,
        camera.tan_fov_x, camera.tan_fov_y,
    )
    conic, radius_f, det = cov_ops.conic_and_radius(cov2d)

    if colors_precomp is None:
        dirs = means3d - camera.cam_center
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12
        )
        colors = jnp.maximum(sh_ops.eval_sh(deg, sh, dirs) + 0.5, 0.0)
    else:
        colors = colors_precomp

    # Tile rect (getRect, auxiliary.h:46-55). Integer/bookkeeping only.
    # Per-AXIS 3-sigma extents instead of the reference's square
    # 3*sigma_max bbox: same tile-level truncation semantics, far fewer
    # duplicated instances for anisotropic splats (ops/cov.axis_extents).
    rx, ry = cov_ops.axis_extents(cov2d)
    # Opacity-aware shrink: the blend zeroes alpha below ALPHA_CUTOFF
    # (chunk_math.py:144, renderCUDA's `alpha < 1/255 -> continue`), so
    # outside the {q <= 2 ln(255 opac)} ellipse a gaussian contributes
    # EXACTLY nothing forward or backward. For opac < e^{4.5}/255 ~ 0.35
    # that ellipse is smaller than the 3-sigma one — shrink the rect to it
    # (identical output, fewer instances; opac <= 1/255 culls entirely).
    # Common during densification (opacity resets) and coarse SuGaR
    # (entropy drives opacities to ~0 before pruning).
    # +1e-2 margin in the q domain: the log path here and the exp path in
    # the blend round differently in f32; without slack, boundary pixels
    # whose alpha just clears the cutoff could fall outside the rect.
    t_cut = jnp.sqrt(
        jnp.clip(
            2.0 * jnp.log(255.0 * jnp.maximum(opacities, 1e-12)) + 1e-2,
            0.0,
            9.0,
        )
    ) * (1.0 / 3.0)
    rx = rx * t_cut
    ry = ry * t_cut
    keep = in_front & (det > 0.0)
    rx = jnp.where(keep, rx, 0.0)
    ry = jnp.where(keep, ry, 0.0)
    # Pixel samples sit at integer coordinates, so the covered pixel-index
    # range is [ceil(mean - r), floor(mean + r)] and the exclusive tile end
    # is floor(mean + r) // tile + 1. (The previous `(mean + r + tile - 1)
    # // tile` ceil under-covered one tile whenever the ellipse edge landed
    # within 1 px past a tile boundary — caught by the dense-eval test.)
    tx0 = jnp.clip(
        jnp.ceil(mean_x - rx) // cfg.tile_w, 0, cfg.tiles_x
    ).astype(jnp.int32)
    ty0 = jnp.clip(
        jnp.ceil(mean_y - ry) // cfg.tile_h, 0, cfg.tiles_y
    ).astype(jnp.int32)
    tx1 = jnp.clip(
        jnp.floor(mean_x + rx) // cfg.tile_w + 1, 0, cfg.tiles_x
    ).astype(jnp.int32)
    ty1 = jnp.clip(
        jnp.floor(mean_y + ry) // cfg.tile_h + 1, 0, cfg.tiles_y
    ).astype(jnp.int32)
    # empty coverage can yield tx1 < tx0 (e.g. r=0 at a non-integer mean):
    # clamp so rect widths are never negative downstream
    tx1 = jnp.maximum(tx1, tx0)
    ty1 = jnp.maximum(ty1, ty0)
    area = (tx1 - tx0) * (ty1 - ty0)
    # opac < ALPHA_CUTOFF => raw = opac * exp(power <= 0) < cutoff at every
    # pixel => alpha identically zero: cull outright (exact)
    valid = in_front & (det > 0.0) & (area > 0) & (opacities >= ALPHA_CUTOFF)
    rect = jnp.stack([tx0, ty0, tx1, ty1], axis=-1)
    radii = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)

    return Projected(
        means2d=means2d.astype(f32),
        conics=conic.astype(f32),
        colors=colors.astype(f32),
        opacities=opacities.astype(f32),
        depths=depth.astype(f32),
        radii=radii,
        rect=rect,
        valid=valid,
    )


def rect_for_grid(
    means2d: jnp.ndarray, radii: jnp.ndarray, cfg: RasterConfig
):
    """Tile-rect + validity of already-projected Gaussians against cfg's
    tile grid (same formula as preprocess; used when re-targeting a
    projection to a sub-rectangle)."""
    r = radii.astype(jnp.float32)
    mean_x, mean_y = means2d[..., 0], means2d[..., 1]
    tx0 = jnp.clip(
        jnp.ceil(mean_x - r) // cfg.tile_w, 0, cfg.tiles_x
    ).astype(jnp.int32)
    ty0 = jnp.clip(
        jnp.ceil(mean_y - r) // cfg.tile_h, 0, cfg.tiles_y
    ).astype(jnp.int32)
    tx1 = jnp.clip(
        jnp.floor(mean_x + r) // cfg.tile_w + 1, 0, cfg.tiles_x
    ).astype(jnp.int32)
    ty1 = jnp.clip(
        jnp.floor(mean_y + r) // cfg.tile_h + 1, 0, cfg.tiles_y
    ).astype(jnp.int32)
    tx1 = jnp.maximum(tx1, tx0)
    ty1 = jnp.maximum(ty1, ty0)
    area = (tx1 - tx0) * (ty1 - ty0)
    valid = (radii > 0) & (area > 0)
    return jnp.stack([tx0, ty0, tx1, ty1], axis=-1), valid


def shift_projected(
    proj: Projected,
    pixel_offset,
    strip_cfg: RasterConfig,
    tile_aligned: bool | None = None,
) -> Projected:
    """Re-target a full-image projection to a sub-rectangle: shift the 2D
    means into the strip's pixel frame and recompute the tile rect against
    the strip's grid. Used by the tile-sharded path AFTER all-gathering
    primitive-sharded preprocess results.

    tile_aligned: assert that pixel_offset is a multiple of the tile size
    (required for traced offsets, auto-detected for static ints). When
    aligned, the (anisotropic-tight) full-image rect is shifted exactly
    instead of re-deriving a square bbox from the isotropic radius — this
    keeps the sharded render's tile-inclusion set identical to the
    single-device one."""
    means2d = proj.means2d - jnp.asarray(
        [pixel_offset[0], pixel_offset[1]], jnp.float32
    )
    ox, oy = pixel_offset
    if tile_aligned is None:
        tile_aligned = (
            isinstance(ox, int)
            and isinstance(oy, int)
            and ox % strip_cfg.tile_w == 0
            and oy % strip_cfg.tile_h == 0
        )
    if tile_aligned:
        tox = (jnp.asarray(ox) // strip_cfg.tile_w).astype(jnp.int32)
        toy = (jnp.asarray(oy) // strip_cfg.tile_h).astype(jnp.int32)
        tx0 = jnp.clip(proj.rect[:, 0] - tox, 0, strip_cfg.tiles_x)
        ty0 = jnp.clip(proj.rect[:, 1] - toy, 0, strip_cfg.tiles_y)
        tx1 = jnp.clip(proj.rect[:, 2] - tox, 0, strip_cfg.tiles_x)
        ty1 = jnp.clip(proj.rect[:, 3] - toy, 0, strip_cfg.tiles_y)
        rect = jnp.stack([tx0, ty0, tx1, ty1], axis=-1)
        valid = proj.valid & ((tx1 - tx0) * (ty1 - ty0) > 0)
    else:
        rect, valid = rect_for_grid(means2d, proj.radii, strip_cfg)
    return proj._replace(means2d=means2d, rect=rect, valid=valid)


def pack_fields(proj: Projected) -> jnp.ndarray:
    """Pack differentiable per-Gaussian fields into [INSTANCE_WIDTH, N+1]
    float32 (gaussians on LANES — the [N+1, W] row layout would be 14x
    physically inflated by lane padding of the width-9 minor dim); the
    trailing column is the zero sentinel that padded instance slots gather
    (opacity 0 => no contribution)."""
    n = proj.means2d.shape[0]
    zeros = jnp.zeros((n,), jnp.float32)
    opac = jnp.where(proj.valid, proj.opacities, 0.0)
    cols = [
        proj.means2d[:, 0],
        proj.means2d[:, 1],
        proj.conics[:, 0],
        proj.conics[:, 1],
        proj.conics[:, 2],
        opac,
        proj.colors[:, 0],
        proj.colors[:, 1],
        proj.colors[:, 2],
    ]
    cols += [zeros] * (INSTANCE_WIDTH - len(cols))
    fields_t = jnp.stack(cols, axis=0)  # [W, N]
    return jnp.concatenate(
        [fields_t, jnp.zeros((INSTANCE_WIDTH, 1), jnp.float32)], axis=1
    )
