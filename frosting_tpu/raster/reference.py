"""Naive per-pixel compositing oracle for tests (O(N * H * W), tiny scenes).

Implements exactly the renderer semantics (same tile-rect inclusion rule,
same alpha clamps/cutoffs, same stop test as renderCUDA forward.cu:310-351)
with a sequential scan over depth-sorted Gaussians, fully differentiable.
Used to validate the binned/pallas paths and their gradients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from frosting_tpu.raster.config import (
    ALPHA_CLAMP,
    ALPHA_CUTOFF,
    TRANSMITTANCE_EPS,
    RasterConfig,
)
from frosting_tpu.raster.preprocess import Projected


def render_naive(proj: Projected, bg: jnp.ndarray, cfg: RasterConfig):
    """Returns (image (3,H,W), t_final (H,W), alpha-sorted order aux)."""
    n = proj.means2d.shape[0]
    h, w = cfg.height, cfg.width

    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    tile_x = (jnp.arange(w) // cfg.tile_w)[None, :]
    tile_y = (jnp.arange(h) // cfg.tile_h)[:, None]

    depth_key = jnp.where(proj.valid, proj.depths, jnp.inf)
    order = jnp.argsort(depth_key, stable=True)

    def body(carry, g):
        t_all, t_mask, color = carry
        mx, my = proj.means2d[g, 0], proj.means2d[g, 1]
        ca, cb, cc = proj.conics[g, 0], proj.conics[g, 1], proj.conics[g, 2]
        op = jnp.where(proj.valid[g], proj.opacities[g], 0.0)
        col = proj.colors[g]
        tx0, ty0, tx1, ty1 = (proj.rect[g, i] for i in range(4))
        in_rect = (
            (tile_x >= tx0) & (tile_x < tx1) & (tile_y >= ty0) & (tile_y < ty1)
        )
        dx = mx - xs
        dy = my - ys
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        raw = op * jnp.exp(power)
        alpha = jnp.minimum(ALPHA_CLAMP, raw)
        alpha = jnp.where(
            (power > 0.0) | (raw < ALPHA_CUTOFF) | ~in_rect, 0.0, alpha
        )
        m = t_all * (1.0 - alpha) >= TRANSMITTANCE_EPS
        wgt = jnp.where(m, alpha * t_all, 0.0)
        color = color + wgt[None] * col[:, None, None]
        t_all = t_all * (1.0 - alpha)
        t_mask = t_mask * jnp.where(m, 1.0 - alpha, 1.0)
        return (t_all, t_mask, color), None

    init = (
        jnp.ones((h, w), jnp.float32),
        jnp.ones((h, w), jnp.float32),
        jnp.zeros((3, h, w), jnp.float32),
    )
    (t_all, t_mask, color), _ = jax.lax.scan(body, init, order)
    img = color + t_mask[None] * bg[:, None, None]
    return img, t_mask
